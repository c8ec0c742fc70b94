"""N-gram language-model scoring and importance weighting for corpus
curation (SURVEY.md §2.11 extension — the reference at /root/reference
has no text operators at all).

Two classic curation signals built entirely from JVM-side expressions:

* ``bigram_ll`` — CCNet-style LM scoring: train an add-1-smoothed bigram
  LM on the corpus itself, score every document by its mean negative
  log2 bigram probability ("bits per bigram"). Low bits = typical text,
  high bits = outlier/garbage — the standard perplexity-bucket signal
  (Wenzek et al., "CCNet", 2019 uses a KenLM 5-gram; the bigram here is
  the same pipeline shape with the LM training step in-engine).
* ``dsir_weights`` — hashed-n-gram importance weights (Xie et al.,
  "Data Selection for Language Models via Importance Resampling",
  NeurIPS 2023): features are bigrams hashed into B buckets; a document's
  weight is sum over its features of log(p_target(b) / p_raw(b)), where
  both distributions are add-1-smoothed bucket frequencies. Positive
  weight = looks like the target domain.

Scale posture (100 TB):
* LM training is two chained hash aggregations with map-side partial
  combine — shuffle carries (w1, w2) partial counts, never documents.
* Scoring joins doc-bigrams to the bigram table on (w1, w2): a plain
  shuffled equi-join whose build side is the LM, typically orders of
  magnitude smaller than the corpus (broadcast it when it fits — the
  hashed-bucket table in dsir_weights is B rows and ALWAYS broadcasts).
* The token hash is md5-based (first 8 hex chars, base-16) so every
  value is bit-reproducible in any md5-capable engine — the same
  cross-engine trick operators/dedup.py uses for SimHash.
* Floats appear only in the final per-doc log-sum, rounded to 6
  decimals to absorb last-ulp libm differences (the bm25_scores
  precedent in plans/queries_wave5.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import tokens

LN2 = 0.6931471805599453


def toks_col(text_col: str = "text") -> Column:
    """The canonical non-empty token array every text operator shares."""
    return F.filter(tokens(F.col(text_col)), lambda w: w != F.lit(""))


def doc_bigrams_from_toks(
    t: DataFrame, id_col: str = "doc_id", carry: list[str] | None = None
) -> DataFrame:
    """(id, w1, w2[, *carry]) from a (id, toks[, ...]) frame — the
    shared-tokenization entry point: callers that already materialized
    the token table (e.g. the curation pipeline) pay no re-tokenize.
    Docs with < 2 tokens emit no rows."""
    carry = list(carry or [])
    toks = F.col("toks")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        t.select(F.col(id_col), *carry, F.explode(pairs).alias("bg"))
        .select(
            id_col,
            F.col("bg.w1").alias("w1"),
            F.col("bg.w2").alias("w2"),
            *carry,
        )
    )


def doc_bigrams(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text",
                extra_cols: dict | None = None) -> DataFrame:
    """(id, w1, w2[, *extra_cols]) — one row per consecutive token pair,
    in order. ``extra_cols`` maps output name -> Column expression
    carried through the explode (e.g. a target-domain flag), saving a
    corpus-sized join back to the source.
    """
    extra = dict(extra_cols or {})
    t = df.select(
        F.col(id_col),
        *[c.alias(name) for name, c in extra.items()],
        toks_col(text_col).alias("toks"),
    )
    return doc_bigrams_from_toks(t, id_col, carry=list(extra.keys()))


def bigram_ll(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document add-1 bigram log-likelihood, trained on ``df`` itself.

    P(w2 | w1) = (c(w1,w2) + 1) / (c(w1,·) + V), V = unigram vocabulary
    size. Output: (id, n_bigrams, bits_per_bigram) where bits_per_bigram
    = -mean log2 P, rounded to 6 decimals. Docs with < 2 tokens appear
    with n_bigrams = 0 and NULL bits (left join from the input), so the
    output covers every input row.
    """
    t = df.select(F.col(id_col), toks_col(text_col).alias("toks"))
    return bigram_ll_from_toks(t, id_col)


def bigram_ll_from_toks(t: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """bigram_ll over a pre-tokenized (id, toks) frame.

    The vocabulary size joins in as a broadcast one-row aggregate — the
    whole plan is aggregations plus equi-joins, no driver-side state.

    CACHE CONTRACT (changed r7 per ADVICE r6): this helper no longer
    persists the bigram frame — a library-internal persist with no
    unpersist leaked one corpus-scale MEMORY_AND_DISK entry per call.
    bg is consumed twice downstream (count aggregation + scoring
    probe), so performance-sensitive callers should build and persist
    bg THEMSELVES and call bigram_ll_from_bigrams — the caller-owned
    pattern of the wave8 curation pipeline and wave6 ngram_lm_score.
    """
    return bigram_ll_from_bigrams(t, doc_bigrams_from_toks(t, id_col), id_col)


def bigram_ll_from_bigrams(
    t: DataFrame, bg: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """bigram_ll over a PRE-BUILT (id, w1, w2[, ...]) bigram frame.

    The shared-bigram entry point: the curation pipeline builds ONE
    persisted bigram table and feeds it to both this scorer and
    dsir_weights_from_bigrams, so the explode runs once per corpus pass
    instead of once per signal. The CALLER owns bg's persistence (it is
    consumed twice here: count aggregation + scoring probe). Extra
    carried columns on bg are ignored."""
    bc = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    uc = bc.groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = t.select(F.explode("toks").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    scored = (
        bg.join(bc, ["w1", "w2"])
        .join(uc, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(
                F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v")))
            ).alias("ll"),
        )
    )
    return (
        t.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(
                -F.col("ll") / F.col("n_bigrams") / F.lit(LN2), 6
            ).alias("bits_per_bigram"),
        )
    )


def hashed_bigram_bucket(w1: Column, w2: Column, buckets: int) -> Column:
    """Engine-portable feature hash: first 8 hex chars of md5 over
    'w1 w2', base-16, mod ``buckets``. Reproducible anywhere md5 is."""
    return (
        F.conv(F.substring(F.md5(F.concat_ws(" ", w1, w2)), 1, 8), 16, 10)
        .cast("long") % buckets
    )


def dsir_weights(
    df: DataFrame,
    target_filter: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 256,
) -> DataFrame:
    """DSIR importance weight per document: sum over hashed-bigram
    occurrences of log(p_target / p_raw), add-1 smoothed over ``buckets``.

    ``target_filter`` selects the target-domain rows INSIDE the same
    corpus scan (e.g. ``F.col("lang") == "en"``); raw = all rows. The
    flag rides through the bigram explode as a carried column, so BOTH
    bucket distributions come out of ONE hash aggregation over one
    corpus pass (a conditional sum alongside the count) — no join back
    to the source, no second tokenization. The 256-row distribution
    table broadcasts into the scoring join. The feature table is
    persisted (MEMORY_AND_DISK) across its two consumers — counting and
    scoring — the same load-bearing-persist discipline as
    dedup.minhash_lsh_pairs; without it the tokenize+hash pipeline runs
    twice. Output: (id, n_feats, round(w, 6)); docs with no bigrams
    carry n_feats = 0 / NULL weight.
    """
    t = df.select(
        F.col(id_col),
        target_filter.cast("int").alias("is_t"),
        toks_col(text_col).alias("toks"),
    )
    return dsir_weights_from_toks(t, id_col, buckets)


def dsir_weights_from_toks(
    t: DataFrame, id_col: str = "doc_id", buckets: int = 256
) -> DataFrame:
    """dsir_weights over a pre-tokenized (id, is_t, toks) frame."""
    bg = doc_bigrams_from_toks(t, id_col, carry=["is_t"])
    return dsir_weights_from_bigrams(t, bg, id_col, buckets)


def dsir_weights_from_bigrams(
    t: DataFrame,
    bg: DataFrame,
    id_col: str = "doc_id",
    buckets: int = 256,
) -> DataFrame:
    """dsir_weights over a pre-built (id, w1, w2, is_t) bigram frame.

    The hashed feature table (id, bucket, is_t) is materialized HERE —
    it is what both consumers (distribution counting, scoring join)
    read, and it is strictly smaller than bg (three narrow columns,
    strings already hashed away). r18 (VERDICT r17 item 7): an eager
    localCheckpoint instead of the previous persist, which a library
    caller could never release (the returned lazy plan references
    feats, so no unpersist point exists inside this helper; the
    checkpoint's blocks are reference-tracked and nothing strands in
    the CacheManager — pinned in tests/test_wave14_hygiene.py)."""
    feats = bg.select(
        id_col,
        hashed_bigram_bucket(F.col("w1"), F.col("w2"), buckets).alias("b"),
        "is_t",
    ).localCheckpoint(eager=True)
    counts = feats.groupBy("b").agg(
        F.count("*").alias("cr"), F.sum("is_t").alias("ct")
    )
    # totals as one-row broadcast aggregates; add-1 over all `buckets`
    tot = counts.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    dist = counts.crossJoin(F.broadcast(tot)).select(
        "b",
        F.log(
            ((F.col("ct") + 1) / (F.col("nt") + buckets))
            / ((F.col("cr") + 1) / (F.col("nr") + buckets))
        ).alias("lw"),
    )
    scored = (
        feats.join(F.broadcast(dist), "b")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_feats"), F.sum("lw").alias("w"))
    )
    return (
        t.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
            F.round("w", 6).alias("weight"),
        )
    )

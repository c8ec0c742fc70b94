"""Wave-5 surface: corpus-curation operators — Gopher-style hard quality
gates, BM25 relevance scoring, corpus shape histograms, source-mixture
resampling, and the stream-stream interval join's batch twin.

The reference (/root/reference) has none of these; they extend the engine
per the north-star charter (BASELINE.json). Rationale per query:

* quality_gopher_rules — hard document filters in the style of Gopher /
  MassiveText curation (word-count bounds, mean-word-length bounds,
  distinct-word ratio): the first pass every 100 TB corpus goes through.
  All rule outputs are INTEGER counts and the keep flag is derived by
  integer cross-multiplication (sum_len*10 >= 20*n_words instead of
  sum_len/n_words >= 2.0) so the result is bit-identical across engines
  — no float in the output or the decision path.
* bm25_scores — the classic lexical relevance score against a fixed
  query-term set; tf/df/dl are exact integers, the final score is
  rounded to 6 decimals to absorb last-ulp libm differences between
  JVM Math.log and C libm.
* token_length_histogram — corpus shape at a glance (docs and tokens
  per token-count bucket); the pre-tokenization sizing histogram every
  training run wants. Integers only.
* sample_mixture — deterministic source-mixture resampling: each source
  keeps a configured fraction via a doc_id modulus (reproducible without
  any engine-specific hash), the standard way to reweight a corpus
  toward a target domain mix.
* events_stream_join — purchases joined to the clicks that preceded them
  within 1 hour per user: the batch twin of the Structured Streaming
  stream-stream interval join in streaming/joins.py (same predicate,
  same output), so the streaming operator has an oracle-checkable shape.

Scale notes: every aggregation here is a hash agg with map-side partial
combine; the only joins are (a) broadcast of one-row corpus stats and
(b) the user-keyed equi-join with a range residual — both
shuffle-minimal at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query

from .queries_ext import _DUCK_TOKENS  # noqa: E402  (corrected shared
# tokenizer fragment: full-whitespace strip, mirroring dedup.tokens)


# --------------------------------------------------------------------------
# quality_gopher_rules
# --------------------------------------------------------------------------

@query(
    "quality_gopher_rules",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS w FROM documents),
    tw AS (
      SELECT doc_id, w, count(*) AS c FROM tok
      WHERE w <> '' GROUP BY doc_id, w),
    agg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n_words,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(max(c) AS BIGINT) AS max_word_count,
             CAST(sum(len(w) * c) AS BIGINT) AS sum_word_len
      FROM tw GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(a.n_words, 0) AS n_words,
           COALESCE(a.n_distinct, 0) AS n_distinct,
           COALESCE(a.max_word_count, 0) AS max_word_count,
           COALESCE(a.sum_word_len, 0) AS sum_word_len,
           CAST(CASE WHEN COALESCE(a.n_words, 0) BETWEEN 10 AND 1000
                 AND a.sum_word_len * 10 BETWEEN 20 * a.n_words
                                             AND 120 * a.n_words
                 AND a.n_distinct * 10 >= 3 * a.n_words
                 AND a.max_word_count * 10 <= 3 * a.n_words
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
    """,
    tags=["text", "quality", "gopher", "filter"],
)
def q_quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText-style hard quality gates per document:

    * 10 <= word count <= 1000
    * 2.0 <= mean word length <= 12.0
    * distinct-word ratio >= 0.3 (boilerplate/spam guard)
    * most-frequent-word share <= 0.3 (single-token repetition guard)

    All four rules evaluate on integer counts via cross-multiplication —
    the output carries the counts plus keep ∈ {0,1}, never a float, so
    the driver's value hash is engine-independent by construction.

    Scale: explode -> two chained hash aggregations, both with map-side
    partial combine; shuffle keys (doc_id, word) then (doc_id) — no
    skew (documents bound word multiplicity), no broadcast needed. The
    reference has no text operators (SURVEY.md §2.11 extension).
    """
    from ..operators.lm import toks_col

    docs = load_table(spark, "documents", sf_dir)
    t = docs.select("doc_id", toks_col("text").alias("toks"))
    return gopher_rules_from_toks(t)


def gopher_rules_from_toks(t: DataFrame) -> DataFrame:
    """Gopher gates over a pre-tokenized (doc_id, toks) frame — the
    shared-tokenization entry point the curation pipeline uses."""
    tok = t.select("doc_id", F.explode("toks").alias("w"))
    tw = tok.groupBy("doc_id", "w").agg(F.count("*").alias("c"))
    agg = tw.groupBy("doc_id").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct"),
        F.max("c").alias("max_word_count"),
        F.sum(F.length("w") * F.col("c")).alias("sum_word_len"),
    )
    a = agg.alias("a")
    keep = (
        F.col("a.n_words").between(10, 1000)
        & (F.col("a.sum_word_len") * 10 >= 20 * F.col("a.n_words"))
        & (F.col("a.sum_word_len") * 10 <= 120 * F.col("a.n_words"))
        & (F.col("a.n_distinct") * 10 >= 3 * F.col("a.n_words"))
        & (F.col("a.max_word_count") * 10 <= 3 * F.col("a.n_words"))
    )
    return (
        t.alias("d")
        .join(a, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("a.n_words", F.lit(0)).alias("n_words"),
            F.coalesce("a.n_distinct", F.lit(0)).alias("n_distinct"),
            F.coalesce("a.max_word_count", F.lit(0)).alias(
                "max_word_count"
            ),
            F.coalesce("a.sum_word_len", F.lit(0)).alias("sum_word_len"),
            F.when(keep, 1).otherwise(0).cast("int").alias("keep"),
        )
    )


# --------------------------------------------------------------------------
# bm25_scores
# --------------------------------------------------------------------------

_BM25_TERMS = ("spark", "table", "query")
_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)


@query(
    "bm25_scores",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS w FROM documents),
    dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok
      WHERE w <> '' GROUP BY doc_id),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(avg(dl) AS DOUBLE) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, w AS term, CAST(count(*) AS BIGINT) AS tf FROM tok
      WHERE w IN ({_BM25_TERMS_SQL}) GROUP BY doc_id, w),
    df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term)
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           ROUND(
             ln((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
             * (tf.tf * 2.2)
             / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)),
           6) AS bm25
    FROM tf
    JOIN df USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats s
    """,
    tags=["text", "search", "bm25", "broadcast"],
)
def q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) of each document against the fixed query
    terms {spark, table, query} — the lexical-relevance half of any
    retrieval pipeline. Scores round to 6 decimals so JVM ``Math.log``
    and C libm ``ln`` (<=1 ulp apart) hash identically.

    Scale: tf rows exist only for (doc, query-term) hits — the corpus
    never carries non-matching tokens past the first filter; df (one row
    per query term) and the corpus stats (one row) broadcast onto tf.
    One shuffle of the hit set, nothing else.
    """
    from ..operators.dedup import tokens

    docs = load_table(spark, "documents", sf_dir)
    # ONE tokenize + ONE shuffle feeds dl, tf, df, and the corpus stats:
    # aggregate (doc_id) once with the total count and per-query-term
    # conditional counts pivoted into columns map-side — the token table
    # never shuffles at (doc_id, term) granularity and is never exploded
    # twice (the separate dl/tf formulation pays both, measured 9
    # exchanges -> 5)
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    per_doc = tok.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.count(F.when(F.col("w") == t, 1)).alias(f"tf_{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").cast("double").alias("avgdl"),
    )
    tf = (
        per_doc.select(
            "doc_id",
            "dl",
            F.explode(
                F.map_from_arrays(
                    F.array(*[F.lit(t) for t in _BM25_TERMS]),
                    F.array(*[F.col(f"tf_{i}") for i in range(len(_BM25_TERMS))]),
                )
            ).alias("term", "tf"),
        )
        .filter(F.col("tf") > 0)
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    score = F.round(
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        )
        * (F.col("tf") * 2.2)
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))),
        6,
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", "tf", "df", score.alias("bm25"))
    )


# --------------------------------------------------------------------------
# token_length_histogram
# --------------------------------------------------------------------------

@query(
    "token_length_histogram",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS w FROM documents),
    dl AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM tok
      WHERE w <> '' GROUP BY doc_id)
    SELECT CAST(n_tokens // 10 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
    FROM dl GROUP BY 1
    """,
    tags=["text", "histogram", "corpus-shape"],
)
def q_token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents and tokens per 10-token-wide length bucket — the corpus
    sizing histogram that drives sequence-length and packing decisions
    before a training run. Integer-only output.

    Scale: per-doc token count then a k-bucket aggregation — the second
    shuffle carries at most |buckets| rows per partition after partial
    aggregation.
    """
    from ..operators.dedup import tokens

    docs = load_table(spark, "documents", sf_dir)
    dl = (
        docs.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tokens"))
    )
    return (
        dl.groupBy(
            (F.col("n_tokens") / 10).cast("bigint").alias("bucket")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
    )


# --------------------------------------------------------------------------
# sample_mixture
# --------------------------------------------------------------------------

#: keep fraction per source in twentieths: src0 keeps 20/20, src1 10/20,
#: src2 5/20, everything else 2/20 — a target domain mix, reproducible
#: via doc_id modulus (no engine-specific hash in the decision path)
_MIX_TWENTIETHS = {"src0": 20, "src1": 10, "src2": 5}
_MIX_DEFAULT = 2


@query(
    "sample_mixture",
    f"""
    WITH kept AS (
      SELECT source, n_chars FROM documents
      WHERE (doc_id // 20) % 20 < CASE source
        WHEN 'src0' THEN {_MIX_TWENTIETHS["src0"]}
        WHEN 'src1' THEN {_MIX_TWENTIETHS["src1"]}
        WHEN 'src2' THEN {_MIX_TWENTIETHS["src2"]}
        ELSE {_MIX_DEFAULT} END)
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM kept GROUP BY source
    """,
    tags=["sampling", "mixture", "curation"],
)
def q_sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixture resampling: each source keeps a
    configured fraction of its documents (src0 all, src1 half, src2 a
    quarter, the rest a tenth) selected by a deterministic doc_id key —
    how a corpus is reweighted toward a target domain mix with
    bit-reproducible membership. The key is ``(doc_id DIV 20) % 20``,
    NOT ``doc_id % 20``: the testdata assigns source = src{doc_id % 20},
    so the raw modulus would be perfectly correlated with the stratum
    (all-or-nothing per source). Integer division strips the source
    digits first; no hash function is needed, so membership is exact in
    any engine with 64-bit integer arithmetic (and overflow-free, unlike
    a multiplicative hash under ANSI mode).
    Output: post-mix per-source doc and char counts.

    Scale: a map-side filter (no shuffle to decide membership — the
    keep rule is a pure row predicate) then one small aggregation.
    """
    docs = load_table(spark, "documents", sf_dir)
    keep_n = (
        F.when(F.col("source") == "src0", _MIX_TWENTIETHS["src0"])
        .when(F.col("source") == "src1", _MIX_TWENTIETHS["src1"])
        .when(F.col("source") == "src2", _MIX_TWENTIETHS["src2"])
        .otherwise(_MIX_DEFAULT)
    )
    return (
        docs.filter(F.expr("doc_id DIV 20") % 20 < keep_n)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# --------------------------------------------------------------------------
# events_stream_join — batch twin of streaming/joins.py
# --------------------------------------------------------------------------

@query(
    "events_stream_join",
    """
    SELECT p.event_id AS purchase_id, c.event_id AS click_id,
           p.user_id, p.ts AS purchase_ts, c.ts AS click_ts
    FROM events p JOIN events c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """,
    tags=["streaming", "stream-stream-join", "interval-join"],
)
def q_events_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases joined to every click by the same user in the hour
    before the purchase — the batch twin of the watermarked stream-stream
    interval join in streaming/joins.py (same predicate, same columns),
    giving the streaming operator an oracle-checkable shape.

    Scale: equi-join on user_id with the time window as a residual range
    predicate — one shuffle of each side on the join key; Spark plans a
    hash/sort-merge join, never a nested loop (the equi-key anchors it).
    In the true streaming form the same predicate bounds state retention:
    the watermark ages clicks out of state after 1 hour.
    """
    ev = load_table(spark, "events", sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    return (
        p.join(
            c,
            (F.col("user_id") == F.col("c_user_id"))
            & (
                F.col("click_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")
            )
            & (F.col("click_ts") <= F.col("purchase_ts")),
        )
        .select(
            "purchase_id", "click_id", "user_id", "purchase_ts", "click_ts"
        )
    )


# --------------------------------------------------------------------------
# embedding_pq_topk — product-quantization ANN
# --------------------------------------------------------------------------

def _pq_oracle() -> str:
    from .duck_vec import pq_topk_ctes

    return pq_topk_ctes(
        m=4, ksub=16, iters=2, dim=64, candidates=50, k=5,
        sample_mod=5, q_mod=50,
    )


@query("embedding_pq_topk", _pq_oracle(), tags=["similarity", "ann", "pq"])
def q_embedding_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC approximate top-k with exact re-rank
    (operators/similarity.pq_cosine_topk): 64-dim vectors quantized to 4
    byte codes (4 subspaces x 16 codewords), ranked by lookup-table sums,
    top candidates re-ranked exactly. Approximate-but-DETERMINISTIC, so
    it now carries a full value-hash oracle: plans/duck_vec.pq_topk_ctes
    replays the xxhash64 training sample (the hash re-implemented in
    HUGEINT mod-2^64 arithmetic), per-subspace Lloyd on the
    decimal(27,12) mean grid, encode, LUT, fold-order ADC sums, and the
    exact re-rank — 50/50 rows bit-identical at sf0.01 including the
    cosines. Recall vs the exact twin asserted in
    tests/test_similarity.py."""
    from ..operators.similarity import pq_cosine_topk

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    return pq_cosine_topk(
        emb, qs, k=5, m=4, ksub=16, candidates=50, train_sample_mod=5
    )


# --------------------------------------------------------------------------
# pii_redact
# --------------------------------------------------------------------------

#: patterns restricted to the Java-regex ∩ RE2 common subset (char classes,
#: bounded repeats, \b) so Spark and DuckDB match identically
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b\d{3}[-.]\d{4}\b"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


@query(
    "pii_redact",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text || CASE
               WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id || '@example.com now'
               WHEN doc_id % 11 = 0
                 THEN ' call 555-0199 from 10.0.' || doc_id % 256 || '.1'
               ELSE '' END AS t
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_PII_EMAIL}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PII_PHONE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(
             regexp_replace(t, '{_PII_PHONE}', '<PHONE>', 'g'), '{_PII_IP}'))
             AS BIGINT) AS n_ips,
           md5(regexp_replace(regexp_replace(regexp_replace(
             t, '{_PII_EMAIL}', '<EMAIL>', 'g'),
             '{_PII_PHONE}', '<PHONE>', 'g'),
             '{_PII_IP}', '<IP>', 'g')) AS redacted_md5
    FROM aug
    """,
    tags=["text", "pii", "redaction", "regex"],
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the compliance pass every training corpus needs:
    redact emails, phone numbers, and IPv4 addresses, and count each
    class per document. The synthetic corpus contains no PII, so the
    query deterministically injects some (doc_id-keyed suffixes built
    identically in both engines) — the redaction work is real, not a
    no-op over clean text.

    IP counting runs on the phone-redacted text: '555-0199 from
    10.0.x.1' must not double-count the phone's digits, and the
    engines must agree on that choice. Patterns stay in the Java-regex ∩
    RE2 common subset; the redacted text is emitted as an md5
    fingerprint (exact cross-engine string equality without hauling
    full text through the driver compare).

    Scale: pure per-row map — no shuffle at all; regexes are compiled
    once per task by codegen. The reference's only string ops are
    slice/concat (SURVEY.md §2.8); this is extension surface.
    """
    docs = load_table(spark, "documents", sf_dir)
    t = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" call 555-0199 from 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".1"),
            ),
        )
        .otherwise(F.lit("")),
    )
    aug = docs.select("doc_id", t.alias("t"))
    no_phone = F.regexp_replace(F.col("t"), _PII_PHONE, "<PHONE>")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    return aug.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(_PII_EMAIL))
        .cast("bigint")
        .alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(_PII_PHONE))
        .cast("bigint")
        .alias("n_phones"),
        F.regexp_count(no_phone, F.lit(_PII_IP))
        .cast("bigint")
        .alias("n_ips"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
    )

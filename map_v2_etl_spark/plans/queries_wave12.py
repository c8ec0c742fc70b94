"""Wave-12 surface: corpus-curation operators a production training-data
pipeline runs that were still missing after wave 11 (SURVEY.md §2.11
extension; the reference at /root/reference has no text operators).

* source_caps        — per-source document caps (the per-domain cap every
                       web-crawl curation applies before mixing).
* block_dedup        — INTRA-document repetition removal: drop repeated
                       8-token blocks, keep first occurrence in order —
                       the cheap approximation of within-doc substring
                       dedup (boilerplate / template spam).
* approx_quantiles_certified — percentile_approx with an in-query rank
                       certification against the exact quantile, making
                       a sketch operator hash-checkable (the
                       approx_count_distinct pattern).
* decontaminate_bloom — benchmark decontamination with a BLOOM-FILTER
                       prefilter built in-engine (bit_or bitmap agg):
                       bloom has no false negatives, so prefilter + exact
                       verify returns EXACTLY the exact result and shares
                       decontaminate_docs' oracle — while the broadcast
                       payload is fixed-size bits instead of the gram set.
* content_word_ratio — stopword pressure per document against the
                       corpus-derived top-K stopword list.
* ngram_containment  — asymmetric 8-gram containment pairs
                       (c / min(|a|, |b|)): catches a short doc quoted
                       inside a long one, which symmetric Jaccard dilutes
                       below threshold.

Determinism: every output is integers / strings except the certified
exact quantile (DECIMAL-free but bit-stable — the median_quartiles
precedent); thresholds compare integer cross-multiplications.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators import dedup as D
from ..sources.registry import load_table, widen_partitions
from .registry import query

from .queries_ext import _DUCK_TOKENS  # noqa: E402  (the ONE corrected
# tokenizer fragment — full-whitespace strip; a local trim() copy would
# diverge from dedup.tokens on edge-whitespace text, shifting every
# positional 8-gram)

_DUCK_TOKS_F = (
    f"list_filter({_DUCK_TOKENS}, x -> x <> '')"
)

# --------------------------------------------------------------------------
# source_caps
# --------------------------------------------------------------------------

_CAP = 50

_DUCK_SOURCE_CAPS = f"""
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rk,
         count(*) OVER (PARTITION BY source) AS n_source
  FROM documents)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk,
       CAST(n_source AS BIGINT) AS n_source
FROM r WHERE rk <= {_CAP}
"""


@query("source_caps", _DUCK_SOURCE_CAPS, tags=["curation", "sampling", "domain"])
def q_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source (per-domain) document cap: keep the first {cap} docs of
    each source, deterministic by doc_id — the standard guard against a
    single domain dominating the training mix.

    Scale: one shuffle on source + per-partition window. A skewed mega
    domain makes its window partition hot; the production variant
    pre-trims per shuffle-partition (the _topv_pretrim discipline in
    queries_wave10) before the per-source ranking — at cap << partition
    size the pre-trim is the same lossless argument."""
    docs = load_table(spark, "documents", sf_dir)
    win = W.partitionBy("source")
    r = docs.select(
        "doc_id",
        "source",
        F.row_number().over(win.orderBy("doc_id")).alias("rk"),
        F.count("*").over(win).alias("n_source"),
    )
    return r.filter(F.col("rk") <= _CAP).select(
        "doc_id", "source",
        F.col("rk").cast("long").alias("rk"),
        F.col("n_source").cast("long").alias("n_source"),
    )


# --------------------------------------------------------------------------
# block_dedup
# --------------------------------------------------------------------------

_BLK = 8

_DUCK_BLOCK_DEDUP = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS_F} AS w FROM documents),
b AS (SELECT doc_id, st,
             array_to_string(list_slice(w, st, least(st + {_BLK - 1}, len(w))), ' ') AS blk
      FROM (SELECT doc_id, w, unnest(generate_series(1, len(w), {_BLK})) AS st
            FROM t WHERE len(w) >= 1)),
f AS (SELECT doc_id, blk, min(st) AS st FROM b GROUP BY doc_id, blk),
k AS (SELECT doc_id, count(*) AS n_kept,
             string_agg(blk, ' ' ORDER BY st) AS text_dedup
      FROM f GROUP BY doc_id),
n AS (SELECT doc_id, count(*) AS n_blocks FROM b GROUP BY doc_id)
SELECT d.doc_id,
       CAST(COALESCE(n.n_blocks, 0) AS BIGINT) AS n_blocks,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(k.text_dedup, '') AS text_dedup
FROM documents d
LEFT JOIN n ON d.doc_id = n.doc_id
LEFT JOIN k ON d.doc_id = k.doc_id
"""


@query("block_dedup", _DUCK_BLOCK_DEDUP, tags=["text", "dedup", "repetition"])
def q_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition removal: tokens split into consecutive
    8-token blocks; repeated blocks drop, first occurrence survives in
    order; emits the deduped text plus block counts. The cheap in-engine
    stand-in for within-doc substring dedup (template/boilerplate spam).

    Scale: everything is keyed by doc_id — one shuffle, no cross-doc
    state; the block explode is ~|tokens|/8 rows per doc."""
    from ..operators.lm import toks_col

    docs = widen_partitions(load_table(spark, "documents", sf_dir))
    t = docs.select("doc_id", toks_col("text").alias("toks"))
    b = (
        t.filter(F.size("toks") >= 1)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("toks"), F.lit(_BLK))
            ).alias("st"),
            "toks",
        )
        .select(
            "doc_id",
            "st",
            F.concat_ws(" ", F.slice("toks", F.col("st"), _BLK)).alias("blk"),
        )
    )
    f = b.groupBy("doc_id", "blk").agg(F.min("st").alias("st"))
    k = f.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("st", "blk"))),
                lambda x: x["blk"],
            ),
            " ",
        ).alias("text_dedup"),
    )
    n = b.groupBy("doc_id").agg(F.count("*").alias("n_blocks"))
    return (
        t.select("doc_id")
        .join(n, "doc_id", "left")
        .join(k, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_blocks", F.lit(0)).cast("long").alias("n_blocks"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


# --------------------------------------------------------------------------
# approx_quantiles_certified
# --------------------------------------------------------------------------

_Q_ACC = 1000  # percentile_approx accuracy -> rank error <= 1/acc

_DUCK_APPROX_Q = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_rows,
       quantile_cont(l_extendedprice, 0.5) AS exact_median,
       TRUE AS rank_ok
FROM lineitem GROUP BY l_returnflag
"""


@query(
    "approx_quantiles_certified",
    _DUCK_APPROX_Q,
    tags=["agg", "approx", "quantile"],
)
def q_approx_quantiles_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx (Greenwald-Khanna) certified in-query against
    the GK guarantee: SOME rank of the returned value must lie within
    5/accuracy of the 0.5 target. With value ties the returned value
    occupies the rank interval [n_lt, n_le) (rows strictly below /
    at-or-below), so the certificate checks INTERVAL overlap with the
    tolerance band — a single two-sided count would spuriously fail on
    heavy tie mass at the median. Hashable outputs are the EXACT median
    + the boolean certificate (the approx_count_distinct pattern)."""
    li = load_table(spark, "lineitem", sf_dir)
    # persisted: the rank probe and the final join are separate
    # subtrees (the BroadcastExchange blocks ReuseExchange), so the
    # exact-percentile scan over lineitem would otherwise run twice;
    # g is 3 rows after aggregation — the persist is free
    g = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
        F.expr(
            f"percentile_approx(l_extendedprice, 0.5, {_Q_ACC})"
        ).alias("ap"),
    ).persist()
    rank = (
        li.join(
            F.broadcast(g.select("l_returnflag", "ap")), "l_returnflag"
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(
                (F.col("l_extendedprice") < F.col("ap")).cast("long")
            ).alias("n_lt"),
            F.sum(
                (F.col("l_extendedprice") <= F.col("ap")).cast("long")
            ).alias("n_le"),
        )
    )
    tol = 5.0 / _Q_ACC
    # value's rank interval [n_lt, n_le] must intersect 0.5n ± tol·n
    ok = (F.col("n_lt") / F.col("n_rows") <= 0.5 + tol) & (
        F.col("n_le") / F.col("n_rows") >= 0.5 - tol
    )
    return (
        g.join(rank, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("n_rows").cast("long").alias("n_rows"),
            "exact_median",
            ok.alias("rank_ok"),
        )
    )


# --------------------------------------------------------------------------
# decontaminate_bloom
# --------------------------------------------------------------------------

_BLOOM_BITS = 1 << 17  # 131072 bits = 2048 longs -> 16 KiB broadcast
_BLOOM_K = 3

_DUCK_DECON = f"""
WITH w AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct([
  {"||' '||".join(f"w[i+{j}]" if j else "w[i]" for j in range(8))}
  for i in generate_series(1, len(w)-7)])) AS s FROM w),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
hits AS (
  SELECT sh.doc_id, count(*) AS c FROM sh JOIN bench USING (s)
  WHERE sh.doc_id % 10 <> 0 GROUP BY sh.doc_id)
SELECT d.doc_id, CAST(COALESCE(h.c, 0) AS BIGINT) AS n_hits
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 10 <> 0
"""


def _bloom_word_mask(j: int):
    """(word index, bit mask) Columns for hash j over gram column `s` —
    SQL-expr form because shiftleft's PySpark wrapper only takes literal
    bit counts."""
    pos = f"pmod(xxhash64(s, {j}), {_BLOOM_BITS})"
    word = F.expr(f"CAST({pos} DIV 64 AS INT)")
    mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))")
    return word, mask


@query(
    "decontaminate_bloom",
    _DUCK_DECON,
    tags=["text", "decontamination", "bloom", "runtime-filter"],
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decontaminate_docs semantics through a BLOOM prefilter built
    in-engine: benchmark 8-grams hash into a {bits}-bit bitmap (bit_or
    aggregate over 64-bit words, collected — 16 KiB, vs broadcasting
    the raw gram set which grows with the benchmark); corpus grams
    that pass the bloom go through the EXACT semi-join. Bloom filters
    have no false negatives, so the result is bit-identical to the
    exact query and shares its oracle — the strongest certification an
    approximate structure can get. At 100 TB this is the runtime-filter
    pattern: fixed-size bits travel to every executor, and the shuffle
    into the exact join carries only bloom survivors (FP rate here
    ~(1-e^(-kn/m))^k ≈ 1e-3 at the sf0.1 benchmark size)."""
    from pyspark import StorageLevel

    docs = load_table(spark, "documents", sf_dir)
    # load-bearing persist: the shingle explode feeds the bitmap build
    # (an eager collect), the exact-verify broadcast side, AND the
    # corpus probe side — un-persisted it re-tokenizes the corpus 3x
    sh = widen_partitions(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(D.word_shingles(F.col("text"), 8)).alias("s")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bench = sh.filter(F.col("doc_id") % 10 == 0).select("s").distinct()
    # build phase: (word, mask) per bench-gram bit, bit_or per word
    word_bits = bench.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        _bloom_word_mask(j)[0].alias("word"),
                        _bloom_word_mask(j)[1].alias("mask"),
                    )
                    for j in range(_BLOOM_K)
                ]
            )
        ).alias("e")
    ).select("e.word", "e.mask")
    bitmap_rows = (
        word_bits.groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
        .collect()
    )  # bounded: exactly _BLOOM_BITS/64 longs regardless of corpus size
    bitmap = [0] * (_BLOOM_BITS // 64)
    for r in bitmap_rows:
        bitmap[r["word"]] = r["bits"]
    from ..functions.scalars import long_array_lit

    blit = long_array_lit(bitmap)
    # probe phase: every hashed bit must be set (k-way AND, codegen'd)
    corpus = sh.filter(F.col("doc_id") % 10 != 0).withColumn("_bm", blit)
    all_bits = None
    for j in range(_BLOOM_K):
        word_ix, mask = _bloom_word_mask(j)
        word = F.element_at(F.col("_bm"), word_ix + 1)
        test = word.bitwiseAND(mask) != 0
        all_bits = test if all_bits is None else (all_bits & test)
    survivors = corpus.filter(all_bits).select("doc_id", "s")
    hits = (
        survivors.join(F.broadcast(bench), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("c"))
    )
    return (
        docs.filter(F.col("doc_id") % 10 != 0)
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("c"), F.lit(0)).cast("long").alias("n_hits"),
        )
    )


# --------------------------------------------------------------------------
# content_word_ratio
# --------------------------------------------------------------------------

_STOP_K = 20

_DUCK_CONTENT = f"""
WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKS_F}) AS w FROM documents),
cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
stop AS (SELECT w FROM (SELECT w, row_number() OVER (ORDER BY c DESC, w) AS r
                        FROM cnt) WHERE r <= {_STOP_K})
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (s.w IS NULL) AS BIGINT) AS n_content
FROM tok t LEFT JOIN stop s USING (w)
GROUP BY t.doc_id
"""


@query("content_word_ratio", _DUCK_CONTENT, tags=["text", "quality", "stopwords"])
def q_content_word_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document content-word pressure against the CORPUS-DERIVED
    top-{k} stopword list (no external lexicon — the list falls out of
    the same frequency table, pre-trimmed via the wave-10 heavy-hitters
    discipline). Integer outputs; consumers divide. Low
    n_content/n_tokens = function-word soup / boilerplate."""
    from ..operators.lm import toks_col
    from .queries_wave10 import _topv_pretrim

    docs = widen_partitions(load_table(spark, "documents", sf_dir))
    tok = docs.select(
        "doc_id", F.explode(toks_col("text")).alias("w")
    )
    cnt = tok.groupBy("w").agg(F.count("*").alias("c"))
    stop = (
        _topv_pretrim(cnt, _STOP_K)
        .select(
            "w",
            F.row_number().over(W.orderBy(F.desc("c"), "w")).alias("r"),
        )
        .filter(F.col("r") <= _STOP_K)
        .select("w", F.lit(1).alias("is_stop"))
    )
    return (
        tok.join(F.broadcast(stop), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("is_stop").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_content"),
        )
    )


# --------------------------------------------------------------------------
# ngram_containment
# --------------------------------------------------------------------------

_DUCK_CONTAIN = f"""
WITH w AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct([
  {"||' '||".join(f"w[i+{j}]" if j else "w[i]" for j in range(8))}
  for i in generate_series(1, len(w)-7)])) AS s FROM w),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       CAST(c AS BIGINT) AS n_shared,
       CAST(na.n AS BIGINT) AS n_a,
       CAST(nb.n AS BIGINT) AS n_b
FROM common
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE c * 10 >= least(na.n, nb.n) * 8
"""


@query("ngram_containment", _DUCK_CONTAIN, tags=["dedup", "containment", "pairs"])
def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup detection: pairs where the SMALLER document's
    8-gram set is ≥ 80% contained in the other's (c / min(|a|,|b|),
    integer cross-multiplied) — catches a short doc quoted inside a long
    one, which symmetric Jaccard dilutes under its threshold.

    Scale: same inverted-index discipline as the Jaccard join — pairs
    meet only on shared grams, quadratic per GRAM not per corpus, with
    the dup_span df-ceiling argument applying to hot grams."""
    docs = widen_partitions(load_table(spark, "documents", sf_dir))
    # persisted: the self-join's two aliases AND the size aggregation
    # are three separate subplans (no ReusedExchange across a
    # self-join) — unpersisted, the tokenize+8-gram explode runs 3x
    # (same measured pattern as decontaminate_bloom's shingle table)
    sh = docs.select(
        "doc_id", F.explode(D.word_shingles(F.col("text"), 8)).alias("s")
    ).persist()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "s")
    b = sh.select(F.col("doc_id").alias("id_b"), "s")
    common = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("c"))
    )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("n_b"))
    # no broadcast HINT on the corpus-sized per-doc size tables (one
    # row per >=8-token doc) — AQE broadcasts them when they fit; a
    # forced hint would ship the corpus to every executor at scale
    # (the jaccard_pairs rule, operators/dedup.py)
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .filter(
            F.col("c") * 10 >= F.least("n_a", "n_b") * 8
        )
        .select(
            "id_a", "id_b",
            F.col("c").cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
        )
    )

"""Wave-10 surface: tokenizer-prep vocabulary induction, temperature
mixture sampling, and ANN quality observability.

The reference (/root/reference) has none of these; they extend the
engine per the north-star charter (BASELINE.json). Rationale per query:

* vocab_induction — the unigram step of tokenizer construction: rank
  tokens by frequency, keep the top V, report each kept token's rank,
  count, and cumulative corpus coverage (integers + exact rationals via
  cumulative sums) — plus the implied OOV token count. Every tokenizer
  build (BPE/WordPiece/Unigram) starts from exactly this table.
* doc_oov_rate — per-document out-of-vocabulary pressure against that
  top-V vocabulary: (n_tokens, n_oov) integers. The pre-flight check
  before committing a tokenizer to a corpus.
* sample_temperature — temperature-scaled source mixture (T = 0.5):
  p_src ∝ share^T renormalized, the multilingual-corpus rebalancing
  rule (upweights tail sources). Selection stays the deterministic
  md5-nibble rule from sample_hash, with per-source keep fractions
  derived IN the plan from the source histogram — no driver constants.
* ann_recall_report — retrieval-quality observability: recall@k of the
  sign-LSH ANN against the exact cosine top-k, per query vector and
  overall. The number every ANN deployment watches; approximate side ⇒
  rows-only.

Scale: vocab ranking is one hash agg + one vocab-sized window;
coverage joins are broadcast (vocab-bounded); sampling is a narrow
projection against a broadcast source table; the recall join is
|Q|·k-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources.registry import load_table
from .registry import query

_DUCK_TOK = (
    "SELECT doc_id, unnest(list_filter(string_split_regex(lower(trim(text))"
    r", '\s+'), x -> x <> '')) AS w FROM documents"
)

_VOCAB_V = 24


def _topv_pretrim(cnt: DataFrame, v: int) -> DataFrame:
    """Lossless heavy-hitters pre-trim before a global top-V ranking.

    Salt tokens into 64 groups (deterministic xxhash64), rank within
    each group in parallel, keep the per-group top-V: any global top-V
    row is necessarily top-V inside its own salt group, so the global
    window that follows sees ≤ 64·V rows instead of the full
    vocabulary — on a web-scale corpus (billions of distinct tokens)
    the single-reducer sort this replaces is the bottleneck."""
    salted = cnt.withColumn("_s", F.pmod(F.xxhash64("w"), F.lit(64)))
    pr = F.row_number().over(
        W.partitionBy("_s").orderBy(F.desc("c"), "w")
    )
    return (
        salted.withColumn("_pr", pr)
        .filter(F.col("_pr") <= v)
        .drop("_s", "_pr")
    )

# ---------------------------------------------------------------------------
# vocab_induction
# ---------------------------------------------------------------------------

_DUCK_VOCAB = f"""
WITH tok AS ({_DUCK_TOK}),
cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cnt),
rk AS (SELECT w, c, row_number() OVER (ORDER BY c DESC, w) AS r FROM cnt)
SELECT rk.w AS token,
       CAST(rk.r AS BIGINT) AS rank,
       CAST(rk.c AS BIGINT) AS count,
       CAST(sum(rk.c) OVER (ORDER BY rk.r) AS BIGINT) AS cum_count,
       CAST(tot.n AS BIGINT) AS corpus_tokens
FROM rk CROSS JOIN tot
WHERE rk.r <= {_VOCAB_V}
"""


@query("vocab_induction", _DUCK_VOCAB, tags=["text", "tokenizer", "vocab"])
def q_vocab_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-V token vocabulary with ranks and cumulative coverage counts
    — the unigram seed table of tokenizer training. Ties rank by
    (count desc, token) so the cut is engine-deterministic; coverage is
    an integer running sum (consumers divide by corpus_tokens).

    Scale: one token hash agg, then a salted per-group top-V pre-trim
    (_topv_pretrim, lossless) so the final ranking window sorts ≤ 64·V
    rows on one reducer — never the full vocabulary."""
    from ..operators.dedup import tokens

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        F.explode(tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    cnt = tok.groupBy("w").agg(F.count("*").alias("c"))
    tot = cnt.agg(F.sum("c").cast("long").alias("n"))
    rk = _topv_pretrim(cnt, _VOCAB_V).select(
        "w", "c",
        F.row_number().over(W.orderBy(F.desc("c"), "w")).alias("r"),
    )
    return (
        rk.filter(F.col("r") <= _VOCAB_V)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("w").alias("token"),
            F.col("r").cast("long").alias("rank"),
            F.col("c").cast("long").alias("count"),
            F.sum("c").over(W.orderBy("r")).cast("long").alias("cum_count"),
            F.col("n").alias("corpus_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# doc_oov_rate
# ---------------------------------------------------------------------------

_DUCK_OOV = f"""
WITH tok AS ({_DUCK_TOK}),
cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
rk AS (SELECT w, row_number() OVER (ORDER BY c DESC, w) AS r FROM cnt),
voc AS (SELECT w FROM rk WHERE r <= {_VOCAB_V})
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(*) FILTER (v.w IS NULL) AS BIGINT) AS n_oov
FROM tok t LEFT JOIN voc v USING (w)
GROUP BY t.doc_id
"""


@query("doc_oov_rate", _DUCK_OOV, tags=["text", "tokenizer", "oov"])
def q_doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document OOV pressure against the induced top-V vocabulary:
    (doc_id, n_tokens, n_oov) — integer-only. The vocabulary joins in
    as a BROADCAST (V rows); the corpus shuffles once for the per-doc
    aggregation."""
    from ..operators.dedup import tokens

    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    cnt = tok.groupBy("w").agg(F.count("*").alias("c"))
    voc = (
        _topv_pretrim(cnt, _VOCAB_V)
        .select(
            "w",
            F.row_number().over(W.orderBy(F.desc("c"), "w")).alias("r"),
        )
        .filter(F.col("r") <= _VOCAB_V)
        .select("w", F.lit(1).alias("in_voc"))
    )
    return (
        tok.join(F.broadcast(voc), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("in_voc").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
    )


# ---------------------------------------------------------------------------
# sample_temperature
# ---------------------------------------------------------------------------

_TEMP = 0.5

# keep fraction per source ∝ share^(T-1) (so post-sample mix ∝ share^T),
# normalized so the LARGEST source keeps exactly its baseline 8/16 rate;
# md5 first-nibble < threshold-nibble implements the rate deterministically
_DUCK_TEMPERATURE = f"""
WITH src AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
mx AS (SELECT max(n) AS mx FROM src),
rate AS (
  SELECT source,
         CAST(least(16, round(8 * pow(n * 1.0 / mx.mx, {_TEMP} - 1)))
              AS BIGINT) AS nib
  FROM src CROSS JOIN mx)
SELECT d.doc_id, d.source, CAST(r.nib AS BIGINT) AS keep_nibbles
FROM documents d JOIN rate r USING (source)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) AS BIGINT)
      < r.nib
"""


@query(
    "sample_temperature",
    _DUCK_TEMPERATURE,
    tags=["sampling", "mixture", "temperature"],
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced corpus sample (T = 0.5): small sources
    keep a larger md5-nibble window than large ones (rate ∝ share^(T−1),
    capped at 16/16), so the sampled mix tilts toward share^T — the
    standard multilingual rebalancing rule. Rates derive from the
    source histogram inside the plan (broadcast, |sources| rows); the
    keep decision is the same engine-portable md5-nibble rule as
    sample_hash, made on integer nibble counts.

    Scale: one source-histogram agg + a broadcast join + a narrow
    filter — sampling never shuffles the corpus."""
    docs = load_table(spark, "documents", sf_dir)
    src = docs.groupBy("source").agg(F.count("*").alias("n"))
    mx = src.agg(F.max("n").alias("mx"))
    rate = (
        src.crossJoin(F.broadcast(mx))
        .select(
            "source",
            F.least(
                F.lit(16),
                F.round(
                    8 * F.pow(F.col("n") / F.col("mx"), _TEMP - 1)
                ),
            )
            .cast("long")
            .alias("nib"),
        )
    )
    nib_of = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10
    ).cast("long")
    return (
        docs.join(F.broadcast(rate), "source")
        .filter(nib_of < F.col("nib"))
        .select(
            "doc_id", "source", F.col("nib").alias("keep_nibbles")
        )
    )


# ---------------------------------------------------------------------------
# ann_recall_report
# ---------------------------------------------------------------------------

def _duck_ann_recall_sql() -> str:
    from ..operators.similarity import random_hyperplanes
    from .duck_vec import cosine as C
    from .duck_vec import lsh_signature

    # the SAME deterministic hyperplanes the Spark plan folds in as
    # literals (seed 42 + t, 4 planes, dim 64); repr() round-trips each
    # double exactly, so both engines compare the same sign bits
    sig_scans = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, "
        f"{lsh_signature('embedding', random_hyperplanes(64, 4, 42 + t))} "
        f"AS sig FROM embeddings"
        for t in range(8)
    )
    return (
        f"WITH sigs AS ({sig_scans}), "
        "q AS (SELECT vec_id FROM embeddings WHERE vec_id % 50 = 0 "
        "AND embedding IS NOT NULL), "
        "exact AS (SELECT q_id, nn_id FROM ("
        "SELECT q.vec_id AS q_id, e.vec_id AS nn_id, ROW_NUMBER() OVER ("
        f"PARTITION BY q.vec_id ORDER BY {C('qq.embedding', 'e.embedding')} "
        "DESC, e.vec_id ASC) AS rk "
        "FROM q JOIN embeddings qq ON qq.vec_id = q.vec_id "
        "CROSS JOIN embeddings e WHERE e.vec_id <> q.vec_id"
        ") WHERE rk <= 5), "
        "cand AS (SELECT DISTINCT qs.vec_id AS q_id, cs.vec_id AS nn_id "
        "FROM sigs qs JOIN q ON q.vec_id = qs.vec_id "
        "JOIN sigs cs ON cs.tbl = qs.tbl AND cs.sig = qs.sig "
        "WHERE cs.vec_id <> qs.vec_id), "
        "approx AS (SELECT q_id, nn_id FROM ("
        "SELECT c.q_id, c.nn_id, ROW_NUMBER() OVER (PARTITION BY c.q_id "
        f"ORDER BY {C('qv.embedding', 'nv.embedding')} DESC, c.nn_id ASC"
        ") AS rk FROM cand c "
        "JOIN embeddings qv ON qv.vec_id = c.q_id "
        "JOIN embeddings nv ON nv.vec_id = c.nn_id"
        ") WHERE rk <= 5), "
        "hits AS (SELECT e.q_id, CAST(COUNT(*) AS BIGINT) AS n_hit "
        "FROM exact e JOIN approx a ON a.q_id = e.q_id "
        "AND a.nn_id = e.nn_id GROUP BY e.q_id) "
        "SELECT e.q_id, CAST(COUNT(*) AS BIGINT) AS k, "
        "coalesce(ANY_VALUE(h.n_hit), 0) AS n_hit "
        "FROM exact e LEFT JOIN hits h ON h.q_id = e.q_id "
        "GROUP BY e.q_id"
    )


@query(
    "ann_recall_report",
    _duck_ann_recall_sql(),
    tags=["embedding", "ann", "observability"],
)
def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@k of sign-LSH ANN vs the exact cosine top-k, per query:
    (q_id, k, n_hit) — the health metric every ANN deployment tracks.
    Joins two |Q|·k result sets (output-bounded). "Approximate" here
    still means DETERMINISTIC (seeded hyperplanes, pinned fold order,
    lexicographic tie-breaks), so the DuckDB oracle replays the whole
    LSH pipeline — signatures, bucket join, re-rank — and the integer
    report value-hashes (r3 verdict task 7)."""
    from ..operators.similarity import cosine_topk, lsh_cosine_topk

    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    exact = cosine_topk(emb, qs, k=5).select(
        F.col("q_id"), F.col("nn_id").alias("e_nn")
    )
    approx = lsh_cosine_topk(emb, qs, k=5).select(
        F.col("q_id"), F.col("nn_id").alias("a_nn")
    )
    hits = exact.join(
        approx,
        (exact["q_id"] == approx["q_id"])
        & (exact["e_nn"] == approx["a_nn"]),
    ).groupBy(exact["q_id"].alias("q_id")).agg(
        F.count("*").cast("long").alias("n_hit")
    )
    return (
        exact.groupBy("q_id")
        .agg(F.count("*").cast("long").alias("k"))
        .join(hits, "q_id", "left")
        .select(
            "q_id",
            "k",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
        )
    )

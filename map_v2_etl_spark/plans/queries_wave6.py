"""Wave-6 surface: LM-based curation scores, importance resampling,
token-window chunking, and multi-dimensional data layout.

The reference (/root/reference) has none of these; they extend the
engine per the north-star charter (BASELINE.json). Rationale per query:

* ngram_lm_score — CCNet-style perplexity signal: train an add-1 bigram
  LM on the corpus IN the plan (two hash aggs), score each doc by bits
  per bigram. The classic quality-bucketing signal for web corpora.
* dsir_weights — DSIR importance weights (Xie et al. 2023): hashed
  bigram features, weight = Σ log(p_target/p_raw); here target =
  English documents. Selecting by weight resamples the corpus toward
  the target domain.
* chunk_documents — token-window chunking with overlap (size 32,
  stride 24): the step between raw documents and fixed-length training
  sequences (pack_sequences consumes its output shape).
* zorder_layout — Morton (Z-order) interleave of two scan dimensions
  (customer, order day) as a clustering key: sorting/range-partitioning
  by zkey co-locates BOTH dimensions, so min/max row-group stats prune
  either predicate — the standard multi-dimensional layout trick
  (Delta/Iceberg OPTIMIZE ZORDER) expressed as pure integer column math.
* embedding_pca — distributed PCA: gram matrix via Arrow-batched
  per-partition partial sums (mapInPandas), dim×dim eigensolve on the
  driver (bounded state), projection as JVM-side expressions. Rows-only
  (eigenvector sign/order is only pinned by convention; the NumPy-twin
  pytest asserts numeric parity).

All oracle-backed outputs are integers, strings, or floats rounded to
6 decimals after a bounded log-sum (the bm25_scores precedent), and the
only hash is md5-derived — bit-reproducible in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import lm as LM
from ..sources.registry import load_table
from .registry import query

_DUCK_TOKS = (
    "SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), "
    r"'\s+'), x -> x <> '') AS toks FROM documents"
)

# ---------------------------------------------------------------------------
# ngram_lm_score
# ---------------------------------------------------------------------------

_DUCK_LM = f"""
WITH t AS ({_DUCK_TOKS}),
pos AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t),
big AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM pos),
bc AS (SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2),
uc AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM bc GROUP BY w1),
v AS (SELECT count(DISTINCT w) AS v
      FROM (SELECT unnest(toks) AS w FROM t)),
sc AS (SELECT b.doc_id, count(*) AS n_bigrams,
              sum(ln((bc.c2 + 1) / (uc.c1 + v.v))) AS ll
       FROM big b JOIN bc USING (w1, w2) JOIN uc USING (w1) CROSS JOIN v
       GROUP BY b.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(-sc.ll / sc.n_bigrams / ln(2), 6) AS bits_per_bigram
FROM documents d LEFT JOIN sc USING (doc_id)
"""


@query("ngram_lm_score", _DUCK_LM, tags=["text", "lm", "quality", "ccnet"])
def q_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bits-per-bigram under a corpus-trained add-1 bigram LM — the
    CCNet perplexity-bucket signal with LM training in-engine.

    Scale: LM training = two chained hash aggs (map-side combine);
    scoring = equi-join of doc-bigrams to the LM on (w1, w2) — the LM
    side is vocab-bounded, orders of magnitude under corpus size, and
    broadcastable when it fits. Vocabulary size rides in as a broadcast
    one-row aggregate; no driver state.

    CALLER-OWNED persist (r7, ADVICE r6): the bigram frame feeds both
    the LM-count aggregation and the scoring probe; we persist it HERE
    rather than inside the library helper so the cache entry belongs to
    this query's scope, not to every bigram_ll caller."""
    from pyspark import StorageLevel

    docs = load_table(spark, "documents", sf_dir)
    t = docs.select("doc_id", LM.toks_col("text").alias("toks"))
    bg = LM.doc_bigrams_from_toks(t, "doc_id").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return LM.bigram_ll_from_bigrams(t, bg, "doc_id")


# ---------------------------------------------------------------------------
# dsir_weights
# ---------------------------------------------------------------------------

_DSIR_B = 256

_DUCK_DSIR = f"""
WITH t AS ({_DUCK_TOKS}),
pos AS (SELECT doc_id, toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t),
big AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM pos),
f AS (SELECT doc_id,
             CAST(('0x' || substr(md5(w1 || ' ' || w2), 1, 8)) AS BIGINT)
               % {_DSIR_B} AS b
      FROM big),
tgt AS (SELECT doc_id FROM documents WHERE lang = 'en'),
tc AS (SELECT b, count(*) AS ct FROM f JOIN tgt USING (doc_id) GROUP BY b),
rc AS (SELECT b, count(*) AS cr FROM f GROUP BY b),
tt AS (SELECT CAST(sum(ct) AS BIGINT) AS nt FROM tc),
rt AS (SELECT CAST(sum(cr) AS BIGINT) AS nr FROM rc),
dist AS (SELECT rc.b,
                ln(((COALESCE(tc.ct, 0) + 1) / (tt.nt + {_DSIR_B}))
                   / ((rc.cr + 1) / (rt.nr + {_DSIR_B}))) AS lw
         FROM rc LEFT JOIN tc USING (b) CROSS JOIN tt CROSS JOIN rt),
sc AS (SELECT f.doc_id, count(*) AS n_feats, sum(d.lw) AS w
       FROM f JOIN dist d USING (b) GROUP BY f.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(sc.n_feats, 0) AS BIGINT) AS n_feats,
       round(sc.w, 6) AS weight
FROM documents d LEFT JOIN sc USING (doc_id)
"""


@query("dsir_weights", _DUCK_DSIR, tags=["text", "dsir", "sampling"])
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-bigram importance weights toward the English slice of the
    corpus (DSIR). Positive weight = target-like.

    Scale: the corpus shuffles ONCE (its own bigram→bucket hash agg);
    both bucket distributions are exactly 256 rows and broadcast into
    the scoring join. The md5 bucket hash is engine-portable, so the
    oracle reproduces every bucket id bit-for-bit."""
    docs = load_table(spark, "documents", sf_dir)
    return LM.dsir_weights(
        docs, F.col("lang") == "en", buckets=_DSIR_B
    )


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------

_CHUNK, _STRIDE = 32, 24

_DUCK_CHUNK = f"""
WITH t AS ({_DUCK_TOKS}),
s AS (SELECT doc_id, toks,
             unnest(generate_series(1, len(toks), {_STRIDE})) AS st
      FROM t WHERE len(toks) >= 1)
SELECT doc_id,
       CAST((st - 1) // {_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(st AS BIGINT) AS start_tok,
       CAST(least({_CHUNK}, len(toks) - st + 1) AS BIGINT) AS n_tokens,
       array_to_string(
         list_slice(toks, st, least(st + {_CHUNK} - 1, len(toks))), ' '
       ) AS chunk_text
FROM s
"""


@query("chunk_documents", _DUCK_CHUNK, tags=["text", "chunking"])
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token windows (size 32, stride 24) per document —
    the document→training-sequence chunking step. The final window may
    be short (every token appears in ≥1 chunk; consecutive chunks share
    size−stride tokens).

    Scale: pure narrow ops — tokenize, generate start offsets, explode,
    slice. No shuffle at all; chunking 100 TB is scan-bound by
    construction."""
    docs = load_table(spark, "documents", sf_dir)
    toks = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda w: w != F.lit(""),
    )
    t = docs.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") >= 1
    )
    s = t.select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(F.lit(1), F.size("toks"), F.lit(_STRIDE))
        ).alias("st"),
    )
    return s.select(
        "doc_id",
        ((F.col("st") - 1) / _STRIDE).cast("long").alias("chunk_idx"),
        F.col("st").cast("long").alias("start_tok"),
        F.least(F.lit(_CHUNK), F.size("toks") - F.col("st") + 1)
        .cast("long")
        .alias("n_tokens"),
        F.concat_ws(
            " ",
            F.slice(
                "toks",
                F.col("st"),
                F.least(F.lit(_CHUNK), F.size("toks") - F.col("st") + 1),
            ),
        ).alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# zorder_layout
# ---------------------------------------------------------------------------

def _interleave_sql(xi: str, yi: str, bits: int = 16) -> str:
    """SQL for the Morton interleave of two `bits`-bit ints — runs
    unchanged in Spark SQL and DuckDB (>> << & | on BIGINT)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({xi} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yi} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


_DUCK_ZORDER = f"""
WITH b AS (SELECT min(o_custkey) AS cmin, max(o_custkey) AS cmax,
                  min(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate))
                    AS dmin,
                  max(date_diff('day', TIMESTAMP '1992-01-01', o_orderdate))
                    AS dmax
           FROM orders),
n AS (SELECT o_orderkey,
             CAST(((o_custkey - b.cmin) * 65535)
                  // greatest(b.cmax - b.cmin, 1) AS BIGINT) AS xi,
             CAST(((date_diff('day', TIMESTAMP '1992-01-01', o_orderdate)
                    - b.dmin) * 65535)
                  // greatest(b.dmax - b.dmin, 1) AS BIGINT) AS yi
      FROM orders CROSS JOIN b)
SELECT o_orderkey, xi AS x_scaled, yi AS y_scaled,
       CAST({_interleave_sql('xi', 'yi')} AS BIGINT) AS zkey
FROM n ORDER BY zkey, o_orderkey LIMIT 1000
"""


@query("zorder_layout", _DUCK_ZORDER, tags=["layout", "zorder"])
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (customer, order day).

    Repartition-by-range + sortWithinPartitions on zkey writes files
    whose row-group min/max stats are tight on BOTH source columns, so
    a predicate on either dimension prunes — what Delta/Iceberg
    OPTIMIZE ZORDER does, here as 64 shift-and-mask terms of pure
    integer math (engine-portable, no UDF).

    Scale: bounds ride in as a broadcast one-row aggregate; the key
    itself is a narrow projection. The ORDER BY + LIMIT exists only to
    give the correctness gate a deterministic slice — the layout write
    path (sources/parquet_io.write_zordered) uses repartitionByRange,
    i.e. a sample-based range shuffle, not a global sort."""
    orders = load_table(spark, "orders", sf_dir)
    b = orders.agg(
        F.min("o_custkey").alias("cmin"),
        F.max("o_custkey").alias("cmax"),
        F.min(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
        ).alias("dmin"),
        F.max(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
        ).alias("dmax"),
    )
    day = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")
    )
    n = (
        orders.crossJoin(F.broadcast(b))
        .select(
            "o_orderkey",
            F.expr(
                "CAST((o_custkey - cmin) * 65535 DIV greatest(cmax - cmin, 1)"
                " AS BIGINT)"
            ).alias("xi"),
            ((day - F.col("dmin")) * 65535).alias("_dy"),
            F.greatest(F.col("dmax") - F.col("dmin"), F.lit(1)).alias("_dd"),
        )
        .select(
            "o_orderkey",
            "xi",
            F.expr("CAST(_dy DIV _dd AS BIGINT)").alias("yi"),
        )
    )
    return (
        n.select(
            "o_orderkey",
            F.col("xi").alias("x_scaled"),
            F.col("yi").alias("y_scaled"),
            F.expr(
                f"CAST({_interleave_sql('xi', 'yi')} AS BIGINT)"
            ).alias("zkey"),
        )
        .orderBy("zkey", "o_orderkey")
        .limit(1000)
    )


# ---------------------------------------------------------------------------
# embedding_pca — invariant certificate (r10: value-hash oracle; the raw
# projection stays available as operators/pca.pca_project and keeps its
# NumPy-twin parity test)
# ---------------------------------------------------------------------------

_PCA_Q = (
    "CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS HUGEINT)"
)
_PCA_CERT_ORACLE = f"""
WITH stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(max(len(embedding)) AS INTEGER) AS dim,
         CAST(SUM(list_reduce(
               list_prepend(CAST(0 AS HUGEINT),
                 list_transform(embedding, v -> {_PCA_Q} * {_PCA_Q})),
               (a, x) -> a + x)) AS BIGINT) AS sum_sq_e12
  FROM embeddings)
SELECT CAST(p.pc AS INTEGER) AS pc, s.n, s.dim, s.sum_sq_e12,
       CAST(0 AS BIGINT) AS mean_e9,
       CAST(0 AS BIGINT) AS var_match_e6,
       CAST(0 AS BIGINT) AS orth_resid_e9,
       CAST(0 AS BIGINT) AS eig_trace_resid_e9
FROM stats s CROSS JOIN (SELECT unnest(range(8)) AS pc) p
ORDER BY pc
"""


@query(
    "embedding_pca",
    _PCA_CERT_ORACLE,
    tags=["embedding", "pca", "cross-engine", "invariant"],
)
def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA, certified by exact-integer invariants.

    Gram matrix via Arrow-batched per-partition partial sums (driver
    state = dim², not n); eigensolve on the driver; projections as pure
    JVM expressions. The certified frame (operators/pca.pca_certificate)
    carries one row per top-8 component: corpus stats the oracle
    recomputes from the raw table (n, dim, an order-independent integer
    Σ‖q(x)‖²) plus four residual integers that are 0 exactly when the
    projection variance matches the eigenvalue spectrum, the components
    are orthonormal, the projections are centered, and the full
    spectrum sums to the covariance trace. The raw per-row projection
    (pca_project) keeps its NumPy-twin parity test in
    tests/test_wave6.py — this query makes the DRIVER's check
    content-bearing where the float projection itself cannot hash."""
    from ..operators.pca import pca_certificate

    emb = load_table(spark, "embeddings", sf_dir)
    return pca_certificate(emb, k=8, vec_col="embedding")

"""Wave-4 surface: training-data pipeline operators at warehouse scale —
benchmark decontamination, per-document term salience, repetition-based
quality signals, co-located bucketed joins, and CDC-style snapshot merge.

The reference (/root/reference) has none of these; they extend the engine
per the north-star charter (BASELINE.json). Rationale per query:

* decontaminate_docs — before training, every corpus must be screened
  against evaluation benchmarks; the standard method is n-gram overlap
  (8-gram here). Expressed as explode -> broadcast semi-join -> count:
  at 100 TB the benchmark shingle set is small (benchmarks are MBs, not
  TBs) so the contaminated-id pass is a map-side broadcast join with NO
  shuffle of the corpus; only the per-doc count aggregation shuffles,
  and that is on pre-shrunk (doc_id, hit) rows.
* text_top_terms — tf/df term salience with an integer-only ordering
  (tf DESC, df ASC, term ASC) so the result is bit-deterministic across
  engines — no floating-point idf in the ordering path.
* text_repetition — Gopher-style repetition quality signal: documents
  dominated by one repeated bigram are boilerplate/spam. Counts only
  (no ratios) so the oracle hash is exact; consumers divide at the edge.
* bucketed_join — the canonical 100 TB fact-fact join strategy: both
  sides written bucketed by the join key (8 buckets here, thousands in
  production) so the join executes with ZERO Exchange — each task reads
  matching bucket files from both sides. tests/test_wave4.py asserts the
  physical plan has no Exchange below the SortMergeJoin.
* merge_upsert — SCD-1 snapshot maintenance (MERGE INTO semantics)
  expressed engine-agnostically as latest-change extraction + full-outer
  join + coalesce: update when both sides match, insert when only the
  change side exists, keep otherwise. At scale both sides shuffle on the
  merge key once; with bucketed base tables even that Exchange drops.

Determinism: latest-change extraction tie-breaks on event_id; all summed
money goes through DECIMAL(20,4) (order-independent addition); all other
outputs are integers or pass-through doubles.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators import dedup as D
from ..sources.registry import load_table
from .registry import query

# --------------------------------------------------------------------------
# shared DuckDB SQL fragments (mirror the Spark definitions exactly)
# --------------------------------------------------------------------------

from .queries_ext import _DUCK_TOKENS  # noqa: E402  (corrected shared
# tokenizer fragment: full-whitespace strip, mirroring dedup.tokens)

_DUCK_SHINGLES_8 = (
    "list_distinct(["
    + "||' '||".join(f"w[i+{j}]" if j else "w[i]" for j in range(8))
    + " for i in generate_series(1, len(w)-7)])"
)

_DUCK_BIGRAMS = "[w[i]||' '||w[i+1] for i in generate_series(1, len(w)-1)]"


@query(
    "decontaminate_docs",
    f"""
    WITH w AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
    sh AS (SELECT doc_id, unnest({_DUCK_SHINGLES_8}) AS s FROM w),
    bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
    hits AS (
      SELECT sh.doc_id, count(*) AS c FROM sh JOIN bench USING (s)
      WHERE sh.doc_id % 10 <> 0 GROUP BY sh.doc_id)
    SELECT d.doc_id, CAST(COALESCE(h.c, 0) AS BIGINT) AS n_hits
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
    WHERE d.doc_id % 10 <> 0
    """,
    tags=["text", "decontamination", "anti-join", "broadcast"],
)
def q_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination by 8-gram overlap: docs with
    doc_id % 10 = 0 play the held-out benchmark; every other document is
    scored by how many of its distinct 8-gram shingles appear in the
    benchmark shingle set (n_hits = 0 means clean / keep).

    Scale: the benchmark shingle set is broadcast — the corpus-side
    explode streams through a map-side semi-join without shuffling
    corpus bytes; only (doc_id) survivors shuffle for the count. The
    reference has no text operators at all (SURVEY.md §2.11 extension).
    """
    from ..sources.registry import widen_partitions

    docs = load_table(spark, "documents", sf_dir)
    # the 8-gram explode is CPU-bound: widen the narrow local scan so it
    # parallelizes (single-file parquet plans as ONE partition otherwise)
    sh = widen_partitions(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(D.word_shingles(F.col("text"), 8)).alias("s")
    )
    bench = sh.filter(F.col("doc_id") % 10 == 0).select("s").distinct()
    hits = (
        sh.filter(F.col("doc_id") % 10 != 0)
        .join(F.broadcast(bench), "s", "left_semi")
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


@query(
    "text_top_terms",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_DUCK_TOKENS}) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
           WHERE term <> '' GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    rk AS (
      SELECT doc_id, term, tf, df, row_number() OVER (
        PARTITION BY doc_id ORDER BY tf DESC, df ASC, term ASC) AS rk
      FROM tf JOIN dfreq USING (term))
    SELECT doc_id, term, tf, df FROM rk WHERE rk <= 3
    """,
    tags=["text", "tfidf", "window", "topk"],
)
def q_text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per document: rank by term frequency, break
    ties by document frequency (rarer first — the idf direction) then
    term. Integer-only ordering keys keep the result bit-deterministic;
    a float idf would rank identically but hash differently per engine.

    Scale: one explode + two hash aggregations; the (term, df) side is
    vocabulary-sized and Catalyst broadcast-joins it back onto tf. The
    final top-k is a window over doc_id — the same partitioning the tf
    aggregation just produced, so AQE plans no extra Exchange.
    """
    docs = load_table(spark, "documents", sf_dir)
    tok = docs.select(
        "doc_id", F.explode(D.tokens(F.col("text"))).alias("term")
    ).filter(F.col("term") != "")
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tf"), F.asc("df"), F.asc("term")
    )
    return (
        tf.join(dfreq, "term")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df")
    )


@query(
    "text_repetition",
    f"""
    WITH w AS (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents),
    bg AS (SELECT doc_id, unnest({_DUCK_BIGRAMS}) AS bg FROM w),
    c AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg)
    SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(MAX(c) AS BIGINT) AS top_bigram_n,
           count(*) AS n_distinct_bigrams
    FROM c GROUP BY doc_id
    """,
    tags=["text", "quality", "repetition"],
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signal (Gopher-style): per document, total
    bigram count, the count of the single most repeated bigram, and the
    distinct bigram count. High top_bigram_n / n_bigrams marks
    boilerplate. Counts only — the consumer divides, so the oracle hash
    stays integer-exact.

    Scale: the bigram explode is inline (a projected-then-exploded array
    column breaks codegen fusion — measured 3.4x slower, see
    operators/dedup.py); both aggregations hash-partition by doc_id, so
    the second reuses the first's partitioning with no extra Exchange.
    """
    docs = load_table(spark, "documents", sf_dir)
    w = D.tokens(F.col("text"))
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(w, i), F.element_at(w, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    counts = (
        docs.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_bigram_n"),
        F.count("*").alias("n_distinct_bigrams"),
    )


_DEC = "decimal(20,4)"


def _bucketed_table(
    spark: SparkSession, table: str, key: str, sf_dir: str, buckets: int = 8
) -> DataFrame:
    """Materialize a testdata table as a bucketed+sorted managed table
    (idempotent per sf_dir) and return it. Bucketing is the declared
    co-location strategy for repeated fact-fact joins: pay one shuffle at
    write time, then every subsequent join on the bucket key is
    Exchange-free."""
    name = f"{table}_bkt{buckets}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    if not spark.catalog.tableExists(name):
        # the default catalog is per-session but the warehouse directory is
        # not: a previous process may have left the location behind, which
        # saveAsTable refuses to reuse — clear it first
        import shutil

        loc = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        stale = os.path.join(loc, name)
        if os.path.isdir(stale):
            shutil.rmtree(stale)
        (
            load_table(spark, table, sf_dir)
            .write.mode("overwrite")
            .bucketBy(buckets, key)
            .sortBy(key)
            .format("parquet")
            .saveAsTable(name)
        )
    return spark.table(name)


@query(
    "bucketed_join",
    "SELECT o_orderpriority, "
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * "
    "(1 - CAST(l_discount AS DECIMAL(20,4)))) AS DOUBLE) AS revenue, "
    "COUNT(*) AS n_items "
    "FROM orders JOIN lineitem ON l_orderkey = o_orderkey "
    "GROUP BY o_orderpriority",
    tags=["join", "bucketing", "co-located", "no-shuffle"],
)
def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join via bucketed tables: orders and lineitem are both
    written bucketed+sorted by orderkey (8 buckets here; thousands on a
    real cluster), then joined WITHOUT any Exchange — each task zips the
    matching bucket files. tests/test_wave4.py asserts the join subplan
    is shuffle-free. This is the scale answer to the reference's
    tile-join (SURVEY.md §2.3 J1) when BOTH sides are 100 TB facts and
    broadcasting is impossible.
    """
    o = _bucketed_table(spark, "orders", "o_orderkey", sf_dir)
    li = _bucketed_table(spark, "lineitem", "l_orderkey", sf_dir)
    joined = o.hint("merge").join(
        li, o["o_orderkey"] == li["l_orderkey"]
    )
    rev = F.col("l_extendedprice").cast(_DEC) * (
        1 - F.col("l_discount").cast(_DEC)
    )
    return joined.groupBy("o_orderpriority").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


@query(
    "merge_upsert",
    """
    WITH upd AS (
      SELECT user_id + 1400 AS k, value FROM (
        SELECT user_id, value, row_number() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase') WHERE rn = 1)
    SELECT COALESCE(c.c_custkey, u.k) AS custkey,
           COALESCE(u.value, c.c_acctbal) AS balance,
           CASE WHEN u.k IS NULL THEN 'keep'
                WHEN c.c_custkey IS NULL THEN 'insert'
                ELSE 'update' END AS op
    FROM customer c FULL OUTER JOIN upd u ON c.c_custkey = u.k
    """,
    tags=["merge", "upsert", "cdc", "outer-join"],
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (SCD-1 snapshot maintenance) without a table
    format: extract the latest purchase per user (tie-break event_id),
    key it into customer space (user_id + 1400 so the demo exercises
    update, insert, AND keep branches), then full-outer join + coalesce:
    matched -> update balance, change-only -> insert, base-only -> keep.

    Scale: one shuffle of each side on the merge key; the change set is
    latest-per-key so it is bounded by key cardinality, not event
    volume. On bucketed base tables (see bucketed_join) the base-side
    Exchange disappears — this is exactly how open table formats
    implement copy-on-write MERGE underneath.
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    upd = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select((F.col("user_id") + 1400).alias("k"), "value")
    )
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_acctbal"
    )
    merged = cust.join(upd, cust["c_custkey"] == upd["k"], "full_outer")
    return merged.select(
        F.coalesce(F.col("c_custkey"), F.col("k")).alias("custkey"),
        F.coalesce(F.col("value"), F.col("c_acctbal")).alias("balance"),
        F.when(F.col("k").isNull(), "keep")
        .when(F.col("c_custkey").isNull(), "insert")
        .otherwise("update")
        .alias("op"),
    )


from .duck_vec import cosine as _duck_cos
from .duck_vec import lloyd_ctes as _duck_lloyd

_DUCK_KMEANS = (
    f"WITH {_duck_lloyd(8, 3, 64)} "
    "SELECT vec_id, cid AS cluster FROM afinal"
)


@query(
    "embedding_kmeans",
    _DUCK_KMEANS,
    tags=["similarity", "clustering", "kmeans"],
)
def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Lloyd's k-means (k=8, 3 iterations, lowest-id init)
    over the embeddings table -> (vec_id, cluster). The oracle is the
    FULL unrolled Lloyd chain in DuckDB (plans/duck_vec.py): identical
    fold order for distances and the exact decimal(27,12)-input,
    scale-16-HALF_UP mean pipeline make assignments match bit for bit —
    the r3-verdict conversion of this query from rows-only to
    value-hash. NumPy twin additionally asserted in tests/test_wave4.py;
    see operators/similarity.kmeans_assignments for the scale analysis
    (corpus never collected, k x dim centroid state only)."""
    from ..operators import similarity as S

    emb = load_table(spark, "embeddings", sf_dir)
    return S.kmeans_assignments(emb, k=8, iters=3)


_DUCK_SEMDEDUP = (
    f"WITH {_duck_lloyd(8, 3, 64)}, "
    "p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b, "
    f"{_duck_cos('x.embedding', 'y.embedding')} AS cs "
    "FROM afinal x JOIN afinal y ON x.cid = y.cid "
    "AND x.vec_id < y.vec_id) "
    "SELECT id_b AS vec_id, MIN(id_a) AS kept_id, "
    "CAST(COUNT(*) AS BIGINT) AS n_dups "
    "FROM p WHERE cs >= 0.3 GROUP BY id_b"
)


@query(
    "embedding_semdedup",
    _DUCK_SEMDEDUP,
    tags=["similarity", "dedup", "semdedup"],
)
def q_embedding_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means cluster the embeddings,
    then remove any vector whose cluster contains a lower-id vector with
    cosine >= 0.3 (threshold fits this synthetic corpus's similarity
    range; real corpora use ~0.95+ on normalized model embeddings).
    Output (vec_id, kept_id, n_dups) — integers only. Value-hash
    oracle: the unrolled Lloyd chain plus cluster-local pairwise cosine
    in DuckDB (plans/duck_vec.py), bit-parity verified — threshold
    decisions are identical because the cosine trees are."""
    from ..operators import similarity as S

    emb = load_table(spark, "embeddings", sf_dir)
    asg = S.kmeans_assignments(emb, k=8, iters=3)
    return S.semdedup_removals(emb, asg, threshold=0.3)


@query(
    "fuzzy_name_pairs",
    "SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b, "
    "levenshtein(a.s_name, b.s_name) AS dist "
    "FROM supplier a JOIN supplier b "
    "ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey "
    "WHERE levenshtein(a.s_name, b.s_name) <= 4",
    tags=["join", "fuzzy", "levenshtein", "blocking"],
)
def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy-match join: supplier name pairs within edit
    distance 4, blocked on nationkey so the quadratic comparison runs
    per block, never corpus-wide — the entity-resolution primitive.

    Scale: the block key bounds pair cardinality (sum(|block|^2)); at
    100 TB blocks come from cheap canopies (sorted-neighborhood windows
    or q-gram LSH buckets) and this same plan applies unchanged.
    levenshtein is a JVM codegen expression — no UDF in the pair loop.
    """
    s = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    a = s.select(
        F.col("s_suppkey").alias("id_a"),
        F.col("s_name").alias("name_a"),
        F.col("s_nationkey").alias("nk"),
    )
    b = s.select(
        F.col("s_suppkey").alias("id_b"),
        F.col("s_name").alias("name_b"),
        F.col("s_nationkey").alias("nk"),
    )
    return (
        a.join(b, "nk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein(F.col("name_a"), F.col("name_b")))
        .filter(F.col("dist") <= 4)
        .select("id_a", "id_b", "dist")
    )


_DUCK_NTOK = (
    "CASE WHEN length(trim(text)) = 0 THEN 0 "
    r"ELSE len(string_split_regex(trim(text), '\s+')) END"
)


@query(
    "pack_sequences",
    f"""
    WITH t AS (SELECT doc_id, source, {_DUCK_NTOK} AS n_tokens FROM documents)
    SELECT doc_id, source, n_tokens,
           CAST(FLOOR((SUM(n_tokens) OVER (
             PARTITION BY source ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) - n_tokens) / 2048) AS BIGINT) AS bin
    FROM t
    """,
    tags=["packing", "window", "training-data"],
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: within each source shard,
    documents are laid end-to-end in doc_id order and assigned to the
    2048-token bin their starting offset lands in (offset = running
    token sum minus own length). Deterministic, integer-only.

    Scale: the running sum is windowed PER SOURCE SHARD, not globally —
    a global ordered window is a single-partition bottleneck; sharded
    packing parallelizes across shards and is how packing actually runs
    in production (each data shard packs independently).
    """
    from ..operators.text import token_count

    d = load_table(spark, "documents", sf_dir)
    t = d.select(
        "doc_id", "source", token_count(F.col("text")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return t.withColumn(
        "bin", F.floor(offset / F.lit(2048)).cast("long")
    )


@query(
    "sample_weighted",
    "SELECT doc_id, n_chars FROM documents "
    "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) < "
    "lpad(lower(to_hex(CAST(FLOOR(LEAST(1.0, n_chars / 400.0) * 16777215) "
    "AS BIGINT))), 6, '0')",
    tags=["sampling", "weighted", "deterministic"],
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: keep probability
    proportional to document length (capped at 1), decided by comparing
    a 24-bit md5 slice of the key against the per-row weight threshold —
    reproducible on any engine and partition layout, no RNG state. The
    curriculum/quality-mixing primitive: swap the length weight for any
    model-scored quality column.

    Scale: scan-local filter, no shuffle; the hex compare is
    whole-stage-codegen string work, pushed to the scan.
    """
    d = load_table(spark, "documents", sf_dir)
    thresh = F.lpad(
        F.lower(
            F.hex(
                F.floor(
                    F.least(F.lit(1.0), F.col("n_chars") / F.lit(400.0))
                    * F.lit(16777215)
                ).cast("long")
            )
        ),
        6,
        "0",
    )
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6) < thresh
    ).select("doc_id", "n_chars")

"""Wave-3 surface: lateral joins, Python UDTFs, VARIANT JSON, HLL
sketches, and keep-first dedup — modern Spark 4 operator classes layered
on the same testdata tables.

The reference (/root/reference) has none of these; they extend the
engine per the north-star charter (BASELINE.json): a training-data
pipeline needs per-group top-k exploration (lateral), custom row
expanders (UDTF), semi-structured telemetry (VARIANT), sketch-based
cardinality at 100 TB (HLL), and event dedup (keep-first).

Determinism: every top-k tie-breaks on a unique key; sums that feed the
hash gate are integer or decimal; approximate sketches are declared
rows-only (no oracle entry).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.registry import load_table
from .registry import query


def _view(df: DataFrame, base: str, sf_dir: str) -> str:
    name = f"{base}_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    df.createOrReplaceTempView(name)
    return name


@query(
    "lateral_topk",
    "SELECT n_name, c_name, c_acctbal FROM nation, LATERAL ("
    "  SELECT c_name, c_acctbal FROM customer "
    "  WHERE c_nationkey = n_nationkey "
    "  ORDER BY c_acctbal DESC, c_custkey LIMIT 3)",
    tags=["join", "lateral", "topk"],
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table with ORDER BY + LIMIT: the top-3
    customers by account balance for every nation, expressed exactly as
    a user would write it in SQL. Catalyst decorrelates the lateral
    subquery into a window-rank + filter — verified equivalent to the
    explicit row_number() formulation (tests/test_wave3.py), with no
    per-nation re-execution.

    Scale: decorrelation means ONE shuffle of customer by nationkey —
    the naive interpretation (re-run the subquery per outer row) never
    happens.
    """
    n = _view(load_table(spark, "nation", sf_dir), "nation_lat", sf_dir)
    c = _view(load_table(spark, "customer", sf_dir), "customer_lat", sf_dir)
    return spark.sql(
        f"SELECT n_name, c_name, c_acctbal FROM {n}, LATERAL ("
        f"  SELECT c_name, c_acctbal FROM {c} "
        f"  WHERE c_nationkey = n_nationkey "
        f"  ORDER BY c_acctbal DESC, c_custkey LIMIT 3)"
    )


@query(
    "text_udtf_words",
    "SELECT word, COUNT(*) AS cnt FROM ("
    "  SELECT unnest(regexp_split_to_array(text, '\\s+')) AS word "
    "  FROM documents WHERE doc_id < 200) "
    "WHERE word <> '' GROUP BY word ORDER BY cnt DESC, word LIMIT 20",
    tags=["text", "udtf", "lateral"],
)
def q_text_udtf_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): a table function that expands each document
    into (pos, word) rows, consumed via LATERAL — the engine's custom
    row-expander surface. Word frequency over it hash-matches a DuckDB
    regexp-split + unnest oracle (str.split() and '\\s+' agree on these
    space-separated documents; the oracle filters the empty edge tokens
    split() never emits).

    The UDTF is the declared extension point for expanders the built-in
    explode family can't express (stateful tokenizers, sentence
    splitters with lookahead). For throughput-critical paths prefer
    `split` + `posexplode` (JVM codegen — see text_posexplode); a UDTF
    pays one Python round-trip per input row.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, word string")
    class SplitWords:
        def eval(self, text: str):
            if text:
                for i, w in enumerate(text.split()):
                    yield i, w

    spark.udtf.register("m2e_split_words", SplitWords)
    d = _view(
        load_table(spark, "documents", sf_dir).filter(F.col("doc_id") < 200),
        "docs_udtf",
        sf_dir,
    )
    return spark.sql(
        f"SELECT word, COUNT(*) AS cnt FROM {d}, "
        f"LATERAL m2e_split_words(text) "
        f"GROUP BY word ORDER BY cnt DESC, word LIMIT 20"
    )


@query(
    "variant_props",
    "SELECT event_type, "
    "SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k, "
    "COUNT(*) AS n FROM events GROUP BY event_type",
    tags=["scalar", "variant", "json"],
)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured telemetry through the VARIANT type (Spark 4):
    parse_json once into a binary VARIANT column, then typed
    variant_get extraction — the scale path for JSON event payloads
    (parse once, extract many, no per-access string re-parsing the
    get_json_object family pays). Integer SUM keeps the oracle hash
    exact.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.withColumn("v", F.parse_json("props"))
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("variant_get(v, '$.k', 'bigint')")).alias("sum_k"),
            F.count("*").alias("n"),
        )
    )


@query(
    "events_dedup_first",
    "SELECT user_id, event_type, event_id AS first_event_id, "
    "ts AS first_ts, value AS first_value FROM ("
    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type "
    "  ORDER BY ts, event_id) AS rn FROM events) t WHERE rn = 1",
    tags=["dedup", "keep-first", "window"],
)
def q_events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first deduplication: the earliest event per (user, type),
    ties broken by event_id — the batch twin of streaming
    dropDuplicates (tests/test_wave3.py runs the streaming version and
    checks key-set agreement).

    Scale: one shuffle on the dedup key; the window never materializes
    per-key lists (rank + filter streams each partition sorted).
    """
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event_id"),
            F.col("ts").alias("first_ts"),
            F.col("value").alias("first_value"),
        )
    )


@query(
    "hll_user_counts",
    None,  # approximate sketch -> rows-only; exactness tested in pytest
    tags=["agg", "approx", "sketch", "hll"],
)
def q_hll_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user cardinality per event type via Apache Datasketches
    HLL (hll_sketch_agg / hll_sketch_estimate, Spark 4 built-ins) —
    the 100 TB path for cardinality: sketches merge associatively
    across partitions (constant-size state, one narrow shuffle) and
    across time (store the sketch, union tomorrow's). lgConfigK=14
    gives ~0.5% typical error; tests assert <2% vs exact at sf0.01.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user_id"), F.lit(14))
            ).alias("approx_users")
        )
    )

"""Wave-20 surface: BPE tokenizer training and rolling anomaly flags.

The reference (/root/reference) has none of these; they extend the
engine per the north-star charter (BASELINE.json). Rationale per query:

* bpe_merges — the merge-learning loop of byte-pair encoding (Sennrich
  et al. 2016): the step AFTER vocab_induction in every real tokenizer
  build. K iterations of (pair count -> argmax -> rewrite) on the
  word-frequency table. The ORACLE is the same algorithm unrolled into
  K DuckDB CTE blocks — each iteration's chosen pair is a scalar CTE
  the next block folds in — so the learned merge table itself is
  value-hash certified, not just row-counted. CTEs that are referenced
  twice are MATERIALIZED (a plain DuckDB CTE re-executes per
  reference, which would make the chain exponential in K).
* bpe_token_counts — the application side: per-document token counts
  under the learned merges, i.e. "how long is this corpus in MY
  tokenizer", the number every training-data budget starts from.
* xml_roundtrip — the Spark 4 built-in XML source completing the
  format matrix beside wave 17/18's orc/json/csv/parquet/binary
  roundtrips: write, schema-pinned re-read, aggregate vs the original
  table's oracle.
* events_rolling_anomaly — per-type rolling z-score outliers: an event
  whose value deviates from the trailing-20 window mean by more than
  2 sigma (the window EXCLUDES the current row, so the flag is a true
  forecast residual). All arithmetic is exact: values quantize to
  integer millis with floor (floor(double) is deterministic on both
  engines, unlike double->int CASTs which truncate on Spark and round
  on DuckDB), and the 2-sigma test is the integer cross-multiplication
  (20*v - s)^2 > 4*(20*q - s^2) — no division, no sqrt, no floats, so
  the keep/drop call is bit-identical across engines.

Scale notes: bpe_merges does ONE corpus pass (word counts), then every
iteration is a vocabulary-sized hash agg — the standard BPE
compression; see operators/bpe.py. The anomaly window shuffles once on
event_type and streams each partition sorted (rank-style frame, no
per-key buffering beyond the 20-row frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators.bpe import learn_bpe
from ..sources.registry import load_table
from .registry import query
from .queries_wave12 import _DUCK_TOKS_F  # the ONE canonical tokenizer

_BPE_K = 6

# the ONE DuckDB copy of the merge-rewrite fold, mirroring
# operators/bpe.merge_pair: leftmost-greedy non-overlapping, string
# accumulator, `last token == l` tested as (a = l OR ends_with ' '||l)
_FOLD = (
    "list_reduce(string_split({w}.rep, ' '), (a, x) -> "
    "CASE WHEN x = {t}.r AND (a = {t}.l OR ends_with(a, ' ' || {t}.l)) "
    "THEN a || x ELSE a || ' ' || x END)"
)


def _bpe_chain(k: int) -> str:
    """K unrolled merge iterations as DuckDB CTE blocks; exposes w{k}
    (the final symbol table) and t0..t{k-1} (the chosen pairs)."""
    parts = [
        f"""
WITH w0 AS MATERIALIZED (
  SELECT w, CAST(count(*) AS BIGINT) AS cnt,
         array_to_string(regexp_extract_all(w, '.'), ' ') AS rep
  FROM (SELECT unnest({_DUCK_TOKS_F}) AS w FROM documents)
  GROUP BY w
)"""
    ]
    for i in range(k):
        fold = _FOLD.format(w="w", t="t")
        parts.append(
            f"""
pos{i} AS (
  SELECT cnt, toks, unnest(generate_series(1, len(toks) - 1)) AS i
  FROM (SELECT cnt, string_split(rep, ' ') AS toks FROM w{i})
),
p{i} AS (
  SELECT toks[i] AS l, toks[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS c
  FROM pos{i} GROUP BY 1, 2
),
t{i} AS MATERIALIZED (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1),
w{i + 1} AS MATERIALIZED (
  SELECT w.w, w.cnt,
         CASE WHEN t.l IS NULL THEN w.rep ELSE {fold} END AS rep
  FROM w{i} w LEFT JOIN t{i} t ON TRUE
)"""
        )
    return ",".join(parts)


def _bpe_merges_sql(k: int) -> str:
    steps = " UNION ALL ".join(
        f"SELECT {i + 1} AS s, l, r, c FROM t{i}" for i in range(k)
    )
    return f"""{_bpe_chain(k)}
SELECT CAST(s AS BIGINT) AS step, l, r, CAST(c AS BIGINT) AS pair_count
FROM ({steps})
"""


def _bpe_token_counts_sql(k: int) -> str:
    return f"""{_bpe_chain(k)},
tok AS (SELECT doc_id, unnest({_DUCK_TOKS_F}) AS w FROM documents)
SELECT tok.doc_id,
       CAST(sum(len(string_split(wk.rep, ' '))) AS BIGINT) AS n_tokens
FROM tok JOIN w{k} wk USING (w)
GROUP BY tok.doc_id
"""


@query(
    "bpe_merges",
    _bpe_merges_sql(_BPE_K),
    tags=["text", "tokenizer", "bpe", "iterative"],
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first K=6 BPE merges learned from the corpus:
    (step, l, r, pair_count), tie-break (count DESC, l, r).

    Iterative-algorithm shape: the chosen pair per step is a bounded
    driver scalar (k-means-centroid precedent); everything sized by the
    data stays distributed. See operators/bpe.py for the scale story
    (one corpus pass, then vocab-sized iterations)."""
    docs = load_table(spark, "documents", sf_dir)
    merges, final = learn_bpe(docs, _BPE_K)
    return spark.createDataFrame(
        merges, "step long, l string, r string, pair_count long"
    )


@query(
    "bpe_token_counts",
    _bpe_token_counts_sql(_BPE_K),
    tags=["text", "tokenizer", "bpe"],
)
def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token count under the learned BPE (K=6 merges):
    join each word occurrence to its post-merge symbol count and sum.

    The symbol table is vocabulary-bounded; it is broadcast here (the
    same call text_collocations makes). At a 100 M-row web vocabulary
    the broadcast flips to a shuffle join on `w` — one line, same
    plan semantics."""
    docs = load_table(spark, "documents", sf_dir)
    _, final = learn_bpe(docs, _BPE_K)
    from ..operators.dedup import tokens

    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    sym = final.select(
        "w", F.size(F.split("rep", " ")).cast("long").alias("n_sym")
    )
    return (
        tok.join(F.broadcast(sym), "w")
        .groupBy("doc_id")
        .agg(F.sum("n_sym").cast("long").alias("n_tokens"))
    )


def _bpe_vocab_sql(k: int) -> str:
    return f"""{_bpe_chain(k)}
SELECT sym, CAST(sum(cnt) AS BIGINT) AS freq
FROM (
  SELECT unnest(string_split(rep, ' ')) AS sym, cnt FROM w{k}
)
GROUP BY sym
"""


@query(
    "bpe_vocab",
    _bpe_vocab_sql(_BPE_K),
    tags=["text", "tokenizer", "bpe"],
)
def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned tokenizer's vocabulary file: every post-merge symbol
    with its corpus frequency (symbol occurrences weighted by word
    count) — the third deliverable of a tokenizer build alongside the
    merge table (bpe_merges) and the encoded corpus (bpe_encode).

    Plan shape: the symbol table is vocabulary-bounded, so this is one
    explode + one hash aggregate over it — never a corpus pass. The
    result is the artifact a serving tokenizer loads, and `freq` is
    what frequency-ordered vocab ids are assigned from."""
    docs = load_table(spark, "documents", sf_dir)
    _, final = learn_bpe(docs, _BPE_K)
    return (
        final.select(
            F.explode(F.split("rep", " ")).alias("sym"), F.col("cnt")
        )
        .groupBy("sym")
        .agg(F.sum("cnt").cast("long").alias("freq"))
    )


def _bpe_encode_sql(k: int) -> str:
    return f"""{_bpe_chain(k)},
tok AS (
  SELECT doc_id, unnest(toks) AS w, generate_subscripts(toks, 1) AS pos
  FROM (SELECT doc_id, {_DUCK_TOKS_F} AS toks FROM documents)
)
SELECT tok.doc_id,
       string_agg(wk.rep, ' ' ORDER BY tok.pos) AS encoded
FROM tok JOIN w{k} wk USING (w)
GROUP BY tok.doc_id
"""


@query(
    "bpe_encode",
    _bpe_encode_sql(_BPE_K),
    tags=["text", "tokenizer", "bpe"],
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned tokenizer to the corpus: each document's full
    BPE symbol sequence (K=6 merges), word order preserved —
    (doc_id, encoded) where `encoded` is the space-joined symbols of
    every word in document order. The corpus-encode half of the
    tokenizer-training pipeline (learn_bpe covers the learn half).

    Plan shape: posexplode tokens (position carried ONLY for the
    order-preserving reassembly), broadcast the vocabulary-bounded
    symbol table, one shuffle on doc_id to reassemble. At a 100 M-row
    web vocabulary the broadcast flips to a shuffle join on `w`; the
    reassembly shuffle is corpus-token-sized either way, and each
    group is one document (bounded by max doc length, no skew beyond
    the longest document)."""
    docs = load_table(spark, "documents", sf_dir)
    _, final = learn_bpe(docs, _BPE_K)
    from ..operators.dedup import tokens

    tok = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "w")
    ).filter(F.col("w") != "")
    sym = final.select("w", "rep")
    return (
        tok.join(F.broadcast(sym), "w")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "rep"))),
                    lambda s: s.rep,
                ),
                " ",
            ).alias("encoded")
        )
    )


# --------------------------------------------------------------------------
# xml_roundtrip
# --------------------------------------------------------------------------

_DEC = "decimal(20,4)"

_DUCK_XML = (
    "SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n, "
    f"CAST(sum(CAST(c_acctbal AS {_DEC})) AS DOUBLE) AS sum_bal, "
    "CAST(min(c_custkey) AS BIGINT) AS min_key "
    "FROM customer GROUP BY c_mktsegment"
)

_XML_SCHEMA = (
    "c_custkey long, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)


@query("xml_roundtrip", _DUCK_XML, tags=["source", "xml", "roundtrip"])
def q_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer → XML (Spark 4 built-in source) → schema-pinned re-read
    → per-segment aggregate — completes the format matrix beside the
    orc/json/csv/parquet/binary roundtrips (queries_wave17/18 pattern).

    Doubles survive the writer's shortest-roundtrip rendering exactly
    (verified: exceptAll(original, reread) is empty) and the explicit
    read schema is the 100 TB posture — XML inference costs a full
    extra corpus pass AND would widen types the writer narrowed
    (probed: an all-digits string column infers back as bigint).
    Decimal-exact internal sum, DOUBLE final projection (house style —
    the driver hashes DECIMAL finals engine-differently)."""
    import shutil
    import tempfile

    cu = load_table(spark, "customer", sf_dir)
    path = tempfile.mkdtemp(prefix="m2e_xml_")
    try:
        cu.write.mode("overwrite").format("xml").option(
            "rowTag", "row"
        ).save(path)
        back = (
            spark.read.schema(_XML_SCHEMA)
            .format("xml")
            .option("rowTag", "row")
            .load(path)
        )
        return (
            back.groupBy("c_mktsegment")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("c_acctbal").cast(_DEC))
                .cast("double")
                .alias("sum_bal"),
                F.min("c_custkey").alias("min_key"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(path, ignore_errors=True)


# --------------------------------------------------------------------------
# events_rolling_anomaly
# --------------------------------------------------------------------------

_DUCK_ANOMALY = """
WITH v AS (
  SELECT event_id, event_type, ts,
         CAST(floor(value * 1000.0) AS BIGINT) AS vm
  FROM events
),
w AS (
  SELECT event_id, event_type, vm,
         count(vm) OVER win AS n,
         sum(vm)   OVER win AS s,
         sum(vm * vm) OVER win AS q
  FROM v
  WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT CAST(event_id AS BIGINT) AS event_id, event_type,
       CAST(vm AS BIGINT) AS v_milli
FROM w
WHERE n = 20
  AND (20 * vm - s) * (20 * vm - s) > 4 * (20 * q - s * s)
"""


@query(
    "events_rolling_anomaly",
    _DUCK_ANOMALY,
    tags=["events", "window", "anomaly", "timeseries"],
)
def q_events_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 2-sigma outliers per event type: flag events whose value
    deviates from the trailing-20 mean by more than twice the trailing
    std-dev (window excludes the current row — a forecast residual).

    Exactness: integer millis (floor), integer cross-multiplication
    (20*v - s)^2 > 4*(20*q - s^2) — equivalent to z^2 > 4 with
    variance*n^2 = n*q - s^2, but with no division or sqrt, so both
    engines make identical boundary calls. Magnitude audit: vm <= 5.7e5
    (value <= 561), so q <= 20 * vm^2 ~ 6.5e12, s^2 <= 1.3e14 and
    (20*vm - s)^2 <= 1.3e14 — all far inside int64.

    Scale: one shuffle on event_type; the frame streams sorted
    partitions with a constant 20-row buffer. Skewed types ride AQE;
    ts ties break on event_id so frame contents are deterministic."""
    ev = load_table(spark, "events", sf_dir)
    v = ev.select(
        "event_id",
        "event_type",
        "ts",
        F.floor(F.col("value") * F.lit(1000.0)).cast("long").alias("vm"),
    )
    win = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    stats = v.select(
        "event_id",
        "event_type",
        "vm",
        F.count("vm").over(win).alias("n"),
        F.sum("vm").over(win).alias("s"),
        F.sum(F.col("vm") * F.col("vm")).over(win).alias("q"),
    )
    lhs = (20 * F.col("vm") - F.col("s")) * (20 * F.col("vm") - F.col("s"))
    rhs = 4 * (20 * F.col("q") - F.col("s") * F.col("s"))
    return stats.filter((F.col("n") == 20) & (lhs > rhs)).select(
        F.col("event_id").cast("long").alias("event_id"),
        "event_type",
        F.col("vm").alias("v_milli"),
    )

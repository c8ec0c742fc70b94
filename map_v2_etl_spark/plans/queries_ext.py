"""Extension query surface: dedup / similarity / text analysis / streaming
(SURVEY.md §2.11 and the repo charter's training-data-pipeline operators).

Oracle philosophy: wherever the operator is SQL-expressible, the DuckDB
oracle computes the SAME deterministic definition (md5-based hashes,
integer-vote SimHash, exact Jaccard arithmetic as int/int double division),
so even the hash-bearing operators get full value-hash checks. Only the
genuinely approximate/engine-specific ops (MinHash bucket candidates
pre-verification, sign-LSH ANN) are rows-only — and each of those is
covered by a pytest comparing it against its exact ground-truth twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text as X
from ..sources.registry import load_table
from .registry import query

# --------------------------------------------------------------------------
# shared DuckDB SQL fragments (mirror the Spark definitions exactly)
# --------------------------------------------------------------------------

WSTRIP_SQL = r"regexp_replace(text, '^\s+|\s+$', '', 'g')"
SPLIT_WS = r"\s+"

_DUCK_TOKENS = (
    # mirror of operators/dedup.tokens: full-whitespace strip (trim()
    # only removes 0x20; a leading tab / trailing newline would inject
    # an empty edge token into every signature)
    r"string_split_regex(lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+')"
)

_DUCK_SHINGLES = (
    "list_distinct([w[i]||' '||w[i+1]||' '||w[i+2] "
    "for i in generate_series(1, len(w)-2)])"
)

_DUCK_JACCARD_PAIRS = f"""
WITH sh AS (
  SELECT doc_id, unnest({_DUCK_SHINGLES}) AS s
  FROM (SELECT doc_id, {_DUCK_TOKENS} AS w FROM documents)
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, c / (na.n_sh + nb.n_sh - c) AS jaccard
FROM common
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE c / (na.n_sh + nb.n_sh - c) >= 0.8
"""

_DUCK_FINGERPRINT = (
    "md5(array_to_string(list_sort(list_distinct("
    + _DUCK_TOKENS
    + ")), ' '))"
)

# 60-bit md5-derived token hash + integer bit votes — the exact SQL mirror
# of operators/dedup.simhash()
_DUCK_SIMHASH_FPS = (
    "WITH toks AS (SELECT doc_id, unnest(list_distinct("
    + _DUCK_TOKENS
    + ")) AS tok FROM documents), "
    "h AS (SELECT doc_id, CAST(('0x'||substr(md5(tok),1,15)) AS BIGINT) AS th "
    "FROM toks), votes AS (SELECT doc_id, "
    + ", ".join(
        f"CASE WHEN SUM(CASE WHEN (th >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END AS b{i}"
        for i in range(D.SIMHASH_BITS)
    )
    + " FROM h GROUP BY doc_id) SELECT doc_id, ("
    + " | ".join(f"b{i}" for i in range(D.SIMHASH_BITS))
    + ") AS fp FROM votes"
)


# --------------------------------------------------------------------------
# dedup
# --------------------------------------------------------------------------


@query(
    "dedup_exact",
    f"SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups FROM "
    f"(SELECT doc_id, {_DUCK_FINGERPRINT} AS k FROM documents) GROUP BY k",
    tags=["dedup", "exact"],
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a canonical fingerprint key: one hash shuffle, lowest
    id survives deterministically (vs dropDuplicates' partition-order
    survivor)."""
    docs = load_table(spark, "documents", sf_dir)
    return D.exact_dedup(docs, X.fingerprint(F.col("text")))


@query("dedup_ngram_jaccard", _DUCK_JACCARD_PAIRS, tags=["dedup", "jaccard"])
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard similarity join at threshold 0.8 — the
    ground-truth near-dup definition. Docs sharing no shingle never meet."""
    docs = load_table(spark, "documents", sf_dir)
    return D.jaccard_pairs(docs, threshold=0.8)


@query("dedup_minhash_pairs", _DUCK_JACCARD_PAIRS, tags=["dedup", "minhash", "lsh"])
def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + 16x4 banded LSH candidates, exact-Jaccard verified at
    0.8. Output equals the exact pairs whenever LSH recall holds (at the
    planted-dup regime j~0.98 the miss probability is ~1e-18 per pair), so
    it shares the exact oracle — the strongest possible check for an
    approximate operator."""
    docs = load_table(spark, "documents", sf_dir)
    return D.minhash_lsh_pairs(docs, threshold=0.8)


_DUCK_CLUSTERS = f"""
WITH RECURSIVE pairs AS ({_DUCK_JACCARD_PAIRS}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b AS a, id_a AS b FROM pairs
),
reach(id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.id
)
SELECT id AS doc_id, MIN(label) AS cluster FROM reach GROUP BY id
"""


@query("dedup_clusters", _DUCK_CLUSTERS, tags=["dedup", "clusters", "graph"])
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs -> duplicate CLUSTERS via iterative min-label
    connected components (operators/dedup.connected_components); the
    oracle computes the same closure with a recursive CTE. Every doc gets
    a cluster id = min doc_id of its component. Edges come from the
    MinHash-LSH scale path — output equals the exact-Jaccard closure
    whenever LSH recall holds (same argument, and same oracle, as
    dedup_minhash_pairs)."""
    docs = load_table(spark, "documents", sf_dir)
    return D.dup_clusters(docs, threshold=0.8, exact=False)


@query("simhash_fingerprints", _DUCK_SIMHASH_FPS, tags=["dedup", "simhash"])
def q_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per doc. md5-derived token hashes + integer bit votes
    make the fingerprint engine-portable: DuckDB reproduces it bit-for-bit."""
    from ..sources.registry import widen_partitions

    docs = widen_partitions(load_table(spark, "documents", sf_dir))
    return D.simhash_df(docs)


@query(
    "simhash_pairs",
    f"WITH fps AS ({_DUCK_SIMHASH_FPS}) "
    "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
    "CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming "
    "FROM fps a JOIN fps b ON a.doc_id < b.doc_id "
    "WHERE bit_count(xor(a.fp, b.fp)) <= 3",
    tags=["dedup", "simhash"],
)
def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (hamming <= 3) via pigeonhole banding — the
    oracle brute-forces all pairs; the engine only joins same-chunk docs."""
    docs = load_table(spark, "documents", sf_dir)
    out = D.simhash_pairs(docs, max_hamming=3)
    return out.withColumn("hamming", F.col("hamming").cast("int"))


# --------------------------------------------------------------------------
# similarity search
# --------------------------------------------------------------------------

_DUCK_COSINE_TOPK = """
WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings
           WHERE vec_id % 50 = 0 AND embedding IS NOT NULL),
c AS (SELECT vec_id AS nn_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
s AS (SELECT q_id, nn_id, list_cosine_similarity(qv, cv) AS cos
      FROM q, c WHERE nn_id <> q_id),
r AS (SELECT q_id, nn_id,
      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, nn_id) AS rank
      FROM s)
SELECT q_id, nn_id, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 5
"""


@query("embedding_cosine_topk", _DUCK_COSINE_TOPK, tags=["similarity", "ann"])
def q_embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for every 50th vector as query set.
    Rank-only output (cosine float kept out of the hash; rank gaps in this
    data are >=1.8e-5, far above cross-engine double noise)."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    out = S.cosine_topk(emb, qs, k=5)
    return out.select("q_id", "nn_id", F.col("rank").cast("int").alias("rank"))


def _duck_lsh_topk_sql() -> str:
    from ..operators.similarity import random_hyperplanes
    from .duck_vec import cosine as C
    from .duck_vec import lsh_signature

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
        "cand AS (SELECT DISTINCT qs.vec_id AS q_id, cs.vec_id AS nn_id "
        "FROM sigs qs JOIN q ON q.vec_id = qs.vec_id "
        "JOIN sigs cs ON cs.tbl = qs.tbl AND cs.sig = qs.sig "
        "WHERE cs.vec_id <> qs.vec_id) "
        "SELECT q_id, nn_id, CAST(rank AS INTEGER) AS rank, cosine FROM ("
        "SELECT c.q_id, c.nn_id, "
        f"{C('qv.embedding', 'nv.embedding')} AS cosine, "
        "ROW_NUMBER() OVER (PARTITION BY c.q_id "
        f"ORDER BY {C('qv.embedding', 'nv.embedding')} DESC, c.nn_id ASC"
        ") AS rank FROM cand c "
        "JOIN embeddings qv ON qv.vec_id = c.q_id "
        "JOIN embeddings nv ON nv.vec_id = c.nn_id"
        ") WHERE rank <= 5"
    )


@query(
    "embedding_lsh_topk",
    _duck_lsh_topk_sql(),
    tags=["similarity", "ann", "lsh"],
)
def q_embedding_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed ANN (4 planes x 8 tables — tuned for the
    uniform-random testdata; see operators/similarity.py): the scale
    path. Approximate-but-DETERMINISTIC (seeded hyperplanes, pinned
    fold order), so the DuckDB oracle replays signatures, bucket join,
    and re-rank for a full value-hash (plans/duck_vec.py); recall vs
    the exact twin is asserted in tests/test_similarity.py."""
    emb = load_table(spark, "embeddings", sf_dir)
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    return S.lsh_cosine_topk(emb, qs, k=5)


@query(
    "embedding_similar_pairs",
    "WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings "
    "WHERE vec_id < 200) "
    "SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM v a JOIN v b "
    "ON a.vec_id < b.vec_id WHERE list_cosine_similarity(a.e, b.e) >= 0.4",
    tags=["similarity", "pairs"],
)
def q_embedding_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine similarity self-join (>= 0.4) on a bounded slice —
    id-only output keeps the float out of the hash.

    The ``vec_id < 200`` slice is LOAD-BEARING, not incidental: it is
    what keeps this deliberate all-pairs crossJoin legal (<= 200 x 200
    comparisons regardless of corpus size). Do not lift it — at corpus
    scale the bucketed forms are the real operators: embedding_lsh_topk
    / embedding_semdedup (similarity.py) and winnowing (text.py)."""
    emb = load_table(spark, "embeddings", sf_dir).filter(F.col("vec_id") < 200)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    from ..functions.vectors import cosine_similarity

    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_similarity(F.col("va"), F.col("vb")) >= 0.4)
        .select("id_a", "id_b")
    )


# --------------------------------------------------------------------------
# text analysis
# --------------------------------------------------------------------------


@query(
    "text_token_count",
    "SELECT doc_id, "
    f"CASE WHEN length({WSTRIP_SQL}) = 0 THEN 0 "
    f"ELSE len(string_split_regex({WSTRIP_SQL}, '{SPLIT_WS}')) END AS n_tokens, "
    r"len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_subwords "
    "FROM documents",
    tags=["text", "tokens"],
)
def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate (SURVEY §2.11)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        X.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        X.subword_count(F.col("text")).cast("bigint").alias("n_subwords"),
    )


_STOP_RE = r"\b(the|a|an|and|or|of|to|in|is|it)\b"

_N_TOKENS_SQL = (
    f"CASE WHEN length({WSTRIP_SQL}) = 0 THEN 0 "
    f"ELSE len(string_split_regex({WSTRIP_SQL}, '{SPLIT_WS}')) END"
)

_DUCK_QUALITY = f"""
SELECT doc_id, n_tokens, punct_ratio, stop_ratio,
       LEAST(n_tokens / 100.0, 1.0) * 0.4
       + (1 - LEAST(punct_ratio * 5, 1.0)) * 0.3
       + LEAST(stop_ratio * 4, 1.0) * 0.3 AS quality
FROM (
  SELECT doc_id,
    {_N_TOKENS_SQL} AS n_tokens,
    len(regexp_extract_all(text, '[^\\p{{L}}\\p{{N}}_\\s]'))
      / GREATEST(length(text), 1) AS punct_ratio,
    len(regexp_extract_all(lower(text), '{_STOP_RE}'))
      / GREATEST({_N_TOKENS_SQL}, 1)
      AS stop_ratio
  FROM documents
)
"""


@query("text_quality", _DUCK_QUALITY, tags=["text", "quality"])
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score heuristics: identical double expression tree on both
    sides, so even the float score hash-matches."""
    docs = load_table(spark, "documents", sf_dir)
    out = X.quality_features(docs)
    return out.select("doc_id", "n_tokens", "punct_ratio", "stop_ratio", "quality")


def _duck_lang_id() -> str:
    score_cols = []
    import re as _re

    for lang, words in X.LANG_MARKERS.items():
        # identical pattern construction to operators/text._word_regex
        # (escaped literals; no \b for CJK)
        alts = "|".join(_re.escape(w) for w in words)
        if lang == "zh":
            pat = "(" + alts + ")"
        else:
            pat = r"\b(" + alts + r")\b"
        score_cols.append(
            f"len(regexp_extract_all(lower(text), '{pat}')) AS s_{lang}"
        )
    langs = list(X.LANG_MARKERS)
    # fold exactly like operators/text.lang_id: later lang wins only if
    # strictly greater
    best_l, best_s = f"'{langs[0]}'", f"s_{langs[0]}"
    for lg in langs[1:]:
        best_l = f"CASE WHEN s_{lg} > {best_s} THEN '{lg}' ELSE {best_l} END"
        best_s = f"CASE WHEN s_{lg} > {best_s} THEN s_{lg} ELSE {best_s} END"
    return (
        "SELECT doc_id, CASE WHEN " + best_s + " > 0 THEN " + best_l
        + " ELSE 'und' END AS lang_pred FROM "
        "(SELECT doc_id, " + ", ".join(score_cols) + " FROM documents)"
    )


@query("text_lang_id", _duck_lang_id(), tags=["text", "langid"])
def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic; argmax fold mirrored in SQL."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", X.lang_id(F.col("text")).alias("lang_pred"))


@query(
    "text_fingerprint",
    f"SELECT doc_id, {_DUCK_FINGERPRINT} AS fp FROM documents",
    tags=["text", "fingerprint"],
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical md5 fingerprint over the sorted distinct token set."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select("doc_id", X.fingerprint(F.col("text")).alias("fp"))


# --------------------------------------------------------------------------
# streaming-shape aggregation (batch form; true streaming in streaming/)
# --------------------------------------------------------------------------


@query(
    "events_tumbling_window",
    # time_bucket, NOT to_timestamp(floor(epoch)): to_timestamp returns
    # TIMESTAMPTZ and the cast back renders in the SESSION zone, shifting
    # every window under TZ!=UTC; time_bucket is naive-in/naive-out and
    # its 2000-01-01 origin is epoch-aligned for any divisor of 86400
    "SELECT time_bucket(INTERVAL '300 seconds', ts) "
    "AS window_start, event_type, COUNT(*) AS n_events, "
    "CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS total_value "
    "FROM events GROUP BY 1, 2",
    tags=["streaming", "window"],
)
def q_events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling-window counts/sums per event type. Same operator
    runs as a real Structured Streaming query with watermark in
    streaming/windows.py; this batch form is the oracle-checkable shape.

    TZ robustness (re-examined r7 per ADVICE r6): the testdata parquet
    ``ts`` is TIMESTAMP_NTZ (isAdjustedToUTC=false), Spark 4 reads it
    as TimestampNTZType, and F.window over NTZ yields NTZ starts — so
    BOTH sides of this pairing are naive wall-clock arithmetic and no
    as_naive_utc rendering is needed (that renderer exists for the
    STREAMING queries, which must convert to instants for watermarks).
    Verified: tools/check_oracle.py --bare passes under
    TZ=Asia/Kolkata and TZ=America/New_York; re-certified via
    FORCE_RECERT this round (last driver hash cert was r02, before the
    time_bucket oracle rewrite)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(20,4)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )

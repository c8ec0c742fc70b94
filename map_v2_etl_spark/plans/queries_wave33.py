"""Wave-33 surface: media near-duplicate detection and grouped robust
statistics.

* media_near_dups — perceptual-hash-style near-dup detection over the
  OPAQUE BINARY media column, completing the multimodal dedup story
  (media_features/decode_stats/frame_sample extract; this one
  deduplicates). Integer end-to-end, dHash-recipe:

    1. FEATURE: 16-bin LOW-nibble byte histogram through the
       mapInPandas decode boundary (operators/multimodal.
       extract_low_features — the value-bucket histogram collapses
       text payloads into 2 buckets and was measured to yield 2
       distinct signatures over 500 docs; the low nibble separates
       letters and yields 147).
    2. SIGNATURE: 16-bit gradient — bit i set iff hist[i] >
       hist[(i+1) mod 16] (the dHash comparison; pure integer).
    3. CANDIDATES: pigeonhole banding — hamming ≤ 2 over 3 chunks
       (6/5/5 bits) forces ≥ 1 chunk EQUAL, so candidates come from
       chunk equi-joins (LOSSLESS for the hamming gate), verified by
       bit_count(xor). Signature width scales with feature dims
       (64-bin → 64-bit → same banding with real pruning).
    4. VERIFY: exact L1 histogram distance on candidates only, in
       CROSS-MULTIPLIED INTEGERS (Σ|cntA·nB − cntB·nA| · 20 ≤ nA·nB
       ⇔ Σ|fracA − fracB| ≤ 0.05) — no division, no floats, exact at
       the threshold boundary on both engines.

  Output = pairs passing BOTH gates (the minhash_lsh_pairs semantics:
  the signature gate is the scale path, the verify gate the meaning;
  at τ=0.05 on this corpus the gate was measured lossless — all 26
  brute-force L1 pairs survive it). The DuckDB oracle re-derives the
  histogram from the payload bytes' hex digits (the media_features
  trick) and brute-forces the identical two-gate definition — the
  Spark banding must reproduce it exactly.

* robust_stats — per-group robust location/scale/outlier profile over
  documents: exact median (R-7, the engine's percentile-parity class),
  MAD (median absolute deviation — a second-level exact median), and
  the count of 2·|x − median| > 3·MAD outliers (a 1.5-MAD fence: the
  fixture's n_chars is near-uniform per lang, where deviations are
  bounded by 2·MAD — a 3-MAD fence would be structurally dead on this
  data; 1.5 exercises the branch while staying a recognized robust
  fence). The robust twin of constraint_profile's mean/stddev: one
  wide-row-count pass per level; medians are interpolated midpoints of
  INTEGER inputs, so every compared value is an exact dyadic and the
  doubled comparison (2·adev vs 3·MAD) stays in exact halves — no
  float-division boundary calls.

Scale notes: media_near_dups shuffles |media|·3 chunk rows, never
all-pairs; verification is integer xor on candidate pairs only.
robust_stats is two grouped exact-percentile aggregations (sort-based
within group) plus one counting pass — the standard cost of exact
medians; sketch-based approximations exist upstream
(approx_quantiles_certified) when exactness can be traded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .registry import query

# --------------------------------------------------------------------------
# media_near_dups
# --------------------------------------------------------------------------

_HAM_MAX = 2
#: 16 bits → 3 pigeonhole chunks (6/5/5): hamming ≤ 2 ⇒ ≥ 1 chunk equal
_CHUNKS = [(0, 6), (6, 5), (11, 5)]
#: L1 verify: Σ|fracA − fracB| ≤ 1/_TAU_INV, cross-multiplied exact
_TAU_INV = 20

# low-nibble histogram from hex digits: bin = byte low nibble =
# EVEN-position hex digit of encode(text) (the media_features trick,
# shifted one hex position)
_DUCK_MEDIA_PAIRS = f"""
WITH b AS MATERIALIZED (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents),
c AS MATERIALIZED (
  SELECT doc_id,
         strpos('0123456789ABCDEF', substr(hx, 2 * i + 2, 1)) - 1 AS bin,
         CAST(count(*) AS BIGINT) AS cnt
  FROM b, LATERAL unnest(range(n)) AS u(i)
  GROUP BY 1, 2),
f AS MATERIALIZED (
  SELECT b.doc_id, b.n, bins.bin, coalesce(c.cnt, 0) AS cnt
  FROM b CROSS JOIN (SELECT unnest(range(16)) AS bin) bins
  LEFT JOIN c ON c.doc_id = b.doc_id AND c.bin = bins.bin),
sig AS MATERIALIZED (
  SELECT a.doc_id AS media_id,
         CAST(sum(CASE WHEN a.cnt > nx.cnt
                       THEN (CAST(1 AS BIGINT) << a.bin) ELSE 0 END)
              AS BIGINT) AS sig
  FROM f a JOIN f nx ON nx.doc_id = a.doc_id
                    AND nx.bin = (a.bin + 1) % 16
  GROUP BY a.doc_id),
l1 AS (
  SELECT fa.doc_id AS id_a, fb.doc_id AS id_b,
         sum(abs(fa.cnt * fb.n - fb.cnt * fa.n)) AS num,
         max(fa.n) * max(fb.n) AS den
  FROM f fa JOIN f fb ON fa.bin = fb.bin AND fa.doc_id < fb.doc_id
  GROUP BY 1, 2)
SELECT l1.id_a, l1.id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM l1
JOIN sig a ON a.media_id = l1.id_a
JOIN sig b ON b.media_id = l1.id_b
WHERE bit_count(xor(a.sig, b.sig)) <= {_HAM_MAX}
  AND l1.num * {_TAU_INV} <= l1.den
"""


def media_signatures(media_feats: DataFrame) -> DataFrame:
    """(media_id, sig, histogram, n_bytes): the 16-bit dHash-style
    gradient signature from the low-nibble histogram rows."""
    bit_terms = [
        F.when(
            F.col("histogram")[i] > F.col("histogram")[(i + 1) % 16],
            F.lit(1 << i).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for i in range(16)
    ]
    sig = bit_terms[0]
    for t in bit_terms[1:]:
        sig = sig + t  # disjoint powers of two: + == |
    return media_feats.select(
        "media_id", sig.alias("sig"), "histogram", "n_bytes"
    )


def media_near_dup_pairs(sigs: DataFrame) -> DataFrame:
    """Signature-banded candidates verified by exact integer L1
    histogram distance (module docstring).

    Shape discipline (first cut measured 47.7 s at sf0.1): the banded
    self-join and its dedup carry ONLY (id, sig) — 4 longs per
    candidate row; dragging the 16-element histogram arrays through
    the candidate distinct shuffled wide rows by the million. The
    hamming gate runs on the narrow rows, and the (much smaller)
    survivor set joins the histograms back for the L1 verify — the
    minhash_lsh_pairs verify-join pattern. The signature table is
    materialized once (it feeds both self-join sides and the verify
    join; it comes from a mapInPandas decode, which would otherwise
    re-run 4x). At corpus scale sigs are the STORED artifact."""
    sigs = sigs.localCheckpoint(eager=True)
    chunks = F.array(
        *[
            F.struct(
                F.lit(ci).alias("ci"),
                F.shiftrightunsigned(F.col("sig"), off)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("cv"),
            )
            for ci, (off, width) in enumerate(_CHUNKS)
        ]
    )
    banded = sigs.select(
        "media_id", "sig", F.explode(chunks).alias("c")
    ).select("media_id", "sig", "c.ci", "c.cv")
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    cand = (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.col("a.sig").alias("sa"),
            F.col("b.sig").alias("sb"),
        )
        .distinct()
        .filter(ham <= _HAM_MAX)
    )
    ha = sigs.select(
        F.col("media_id").alias("id_a"),
        F.col("histogram").alias("ha"),
        F.col("n_bytes").alias("na"),
    )
    hb = sigs.select(
        F.col("media_id").alias("id_b"),
        F.col("histogram").alias("hb"),
        F.col("n_bytes").alias("nb"),
    )
    # exact cross-multiplied L1: Σ|cntA·nB − cntB·nA| over the 16
    # zipped bins — all bigint, no division
    l1_num = F.aggregate(
        F.zip_with(
            "ha", "hb", lambda x, y: F.abs(x * F.col("nb") - y * F.col("na"))
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .filter(l1_num * _TAU_INV <= F.col("na") * F.col("nb"))
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
    )


@query(
    "media_near_dups",
    _DUCK_MEDIA_PAIRS,
    tags=["multimodal", "dedup", "phash", "banding"],
)
def q_media_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dHash-style media near-dup pairs, banded + L1-verified (module
    docstring)."""
    from ..operators.multimodal import extract_low_features, synth_media

    docs = load_table(spark, "documents", sf_dir)
    feats = extract_low_features(synth_media(docs))
    return media_near_dup_pairs(media_signatures(feats))


# --------------------------------------------------------------------------
# robust_stats
# --------------------------------------------------------------------------

_DUCK_ROBUST = """
WITH med AS (
  SELECT lang, quantile_cont(n_chars, 0.5) AS med
  FROM documents GROUP BY lang),
dev AS (
  SELECT d.lang, d.n_chars, m.med,
         abs(d.n_chars - m.med) AS adev
  FROM documents d JOIN med m ON m.lang = d.lang),
mad AS (
  SELECT lang, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY lang)
SELECT dev.lang,
       CAST(count(*) AS BIGINT) AS n,
       CAST(max(dev.med) AS DOUBLE) AS median_chars,
       CAST(max(mad.mad) AS DOUBLE) AS mad_chars,
       CAST(sum(CASE WHEN 2 * dev.adev > 3 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev JOIN mad ON mad.lang = dev.lang
GROUP BY dev.lang
"""


@query(
    "robust_stats",
    _DUCK_ROBUST,
    tags=["stats", "robust", "median", "profile"],
)
def q_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-lang robust profile: exact median, MAD, 1.5-MAD outlier
    count (module docstring)."""
    docs = load_table(spark, "documents", sf_dir).select("lang", "n_chars")
    # exact medians need full passes, so the floor is 3 scans: one for
    # the medians, one for the MADs (needs med), one for the outlier
    # count (needs both). Joining the PER-GROUP maps first (group-sized,
    # localCheckpointed so the final pass doesn't replay the first two)
    # keeps the plan at that floor — re-deriving `dev` for the final
    # aggregate cost a 4th scan in the first cut.
    med = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med")
    )
    dev = docs.join(F.broadcast(med), "lang").withColumn(
        "adev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = dev.groupBy("lang").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    stats = (
        med.join(mad, "lang").localCheckpoint(eager=True)
    )  # one row per group
    return (
        docs.join(F.broadcast(stats), "lang")
        .withColumn("adev", F.abs(F.col("n_chars") - F.col("med")))
        .groupBy("lang")
        .agg(
            F.count("*").alias("n"),
            F.max("med").cast("double").alias("median_chars"),
            F.max("mad").cast("double").alias("mad_chars"),
            F.sum(
                (2 * F.col("adev") > 3 * F.col("mad")).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )

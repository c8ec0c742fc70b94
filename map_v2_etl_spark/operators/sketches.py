"""KMV (k-minimum-values, "bottom-k" / theta-style) distinct sketches
with SET ALGEBRA — union and intersection estimation over merged
sketches.

Why another sketch: the engine's HLL surface (`hll_sketch_agg` in
queries_more / hll_merge_rollup in queries_wave25) unions perfectly but
CANNOT intersect — inclusion-exclusion on HLL estimates compounds the
relative error on the (large) union against the (small) intersection
and routinely goes negative. KMV sketches keep the k smallest hash
VALUES themselves, so two sketches merge by "union then re-truncate to
k", and the Jaccard of the merged sketch is an unbiased estimator of
the true Jaccard (Beyer et al., "On Synopses for Distinct-Value
Estimation Under Multiset Operations", SIGMOD 2007 — public
literature; the same bottom-k estimator family as Apache DataSketches'
theta sketch). That yields the audience-overlap query HLL can't
answer: |A ∩ B| ≈ Jaccard(K_AB) · est(|A ∪ B|).

Estimator (hash space [0, M), M = 2^60, k-th smallest h_(k)):

    distinct(S)  ≈ (k-1) · M / h_(k)        when |sketch| == k
                 = |sketch| exactly          when |sketch| <  k
    SE ≈ 1/sqrt(k-2)  (k=64 → ~12.7%, k=256 → ~6.3%)

Determinism (the value-hash certification contract): the hash is the
engine-portable 60-bit md5 prefix (same family as simhash/winnowing:
`conv(substring(md5(x),1,15),16,10)` ↔ DuckDB
`('0x'||substr(md5(x),1,15))::BIGINT`), ranks are over DISTINCT hashes
(no ties), and the estimate is one double division + one multiply in a
fixed parenthesization — bit-identical across engines, so estimates
certify by exact value hash, not tolerance.

Scale (100 TB posture): the sketch build is
``distinct(group, h)`` (one shuffle, map-side partial) followed by a
per-group bottom-k. The rank runs as a window over the distinct-hash
table — parallel ACROSS groups; for a single group with billions of
distinct values the per-group sort is the bottleneck, so
``prefilter=True`` first bounds each group to ~8k expected survivors
with an approx_count_distinct-derived hash threshold (Chernoff: the
true h_(k) exceeds the 8x-headroom threshold with probability
< e^{-k}, and approx_count_distinct's ±5% error is absorbed by the
8x), then SELF-HEALS loudly: any group left with fewer than k
survivors while the filter was active is recomputed exactly — wrong
results are structurally impossible, the pathological case costs one
extra bounded pass. Merges never touch raw data: pair estimation reads
only sketch rows (≤ k per group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

#: hash space size: 60-bit md5 prefix → [0, 2^60). Exactly
#: representable as a double (2^60 < 2^63), so M participates in the
#: float estimator without rounding.
KMV_M = float(1 << 60)


def hash60(col: Column) -> Column:
    """Engine-portable 60-bit hash: first 15 hex chars of md5, parsed
    base-16 (DuckDB mirror: ``('0x'||substr(md5(x),1,15))::BIGINT``).
    Input is stringified so BIGINT keys hash identically both sides."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int,
    prefilter: bool = False,
    headroom: float = 8.0,
) -> DataFrame:
    """Per-group KMV sketch: the k smallest distinct ``hash60(value)``
    per group → rows ``(group, h)``, ≤ k per group.

    ``prefilter=True`` engages the approx-threshold pass documented in
    the module docstring — same rows out, bounded shuffle+sort in."""
    raw = df.select(F.col(group_col), hash60(F.col(value_col)).alias("h"))
    rn = F.row_number().over(W.partitionBy(group_col).orderBy("h"))
    if prefilter:
        # a NULL group key cannot ride the broadcast threshold
        # equi-join (NULL never equi-matches), so it takes the plain
        # path — one extra bottom-k for at most ONE group, preserving
        # the same-rows-out contract for null-keyed data
        nn = _sketch_prefiltered(
            raw.filter(F.col(group_col).isNotNull()), group_col, k, headroom
        )
        nul = (
            raw.filter(F.col(group_col).isNull())
            .distinct()
            .withColumn("rn", rn)
            .filter(F.col("rn") <= k)
            .drop("rn")
        )
        return nn.unionByName(nul)
    return (
        raw.distinct().withColumn("rn", rn).filter(F.col("rn") <= k).drop("rn")
    )


def _sketch_prefiltered(
    raw: DataFrame, group_col: str, k: int, headroom: float = 8.0
) -> DataFrame:
    """Filter BEFORE distinct: the threshold prunes the raw hash rows
    map-side, so the distinct shuffle and the per-group rank sort both
    run on ~headroom·k expected rows per group instead of the full
    distinct set. Order of passes (this ordering was measured, not
    assumed — the first cut ranked distinct-first and LOST 10x to the
    plain path at 2M distincts/group because the big shuffle it was
    supposed to avoid had already happened):

      1. approx_count_distinct per group over the RAW rows (map-side
         partial, one pass, no shuffle of data rows);
      2. broadcast-join the per-group threshold, filter map-side —
         the only other full-data pass, and it emits ~headroom·k rows
         per group;
      3. distinct + bottom-k window on the tiny survivor set
         (materialized: it is ≤ headroom·k·groups rows and is read
         twice — starvation check + result);
      4. self-heal any group the filter starved (< k survivors while
         the filter was active): recompute exactly, no filter. The
         Chernoff bound makes this expected-empty at headroom 8; the
         check is a bounded collect over group counts.
    """
    est = raw.groupBy(group_col).agg(
        F.approx_count_distinct("h").alias("n_est")
    )
    # threshold = headroom*k/n_est of the hash space; groups under
    # headroom*k distinct keep everything (filter provably inactive
    # there). headroom < 1 starves groups BY DESIGN — the self-heal
    # test's lever; production callers keep the Chernoff-argued 8.
    thr = F.when(
        F.col("n_est") <= int(headroom * k), F.lit(int(KMV_M))
    ).otherwise(
        (F.lit(headroom * k) / F.col("n_est") * F.lit(KMV_M)).cast("long")
    )
    active = est.select(
        group_col, thr.alias("thr"), (F.col("n_est") > int(headroom * k)).alias("was_filtered")
    ).localCheckpoint(eager=True)  # group-sized; read by filter + heal check
    cand = (
        raw.join(F.broadcast(active.drop("was_filtered")), group_col)
        .filter(F.col("h") <= F.col("thr"))
        .drop("thr")
        .distinct()
    )
    rn = F.row_number().over(W.partitionBy(group_col).orderBy("h"))
    sk = (
        cand.withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .drop("rn")
        .localCheckpoint(eager=True)  # ≤ k·groups rows, read twice
    )
    # Starvation is derived from `active` (every group that exists), not
    # from sk: a group whose EVERY hash exceeded the threshold has zero
    # rows in sk, so an sk-side groupBy would never see it and the group
    # would silently vanish from the output. Left-joining sk counts onto
    # active and coalescing the miss to 0 makes the fully-starved case
    # (P = e^-(headroom·k) per filtered group) detectable.
    sk_counts = sk.groupBy(group_col).agg(F.count("*").alias("n_sk"))
    starved = [
        r[0]
        for r in active.join(sk_counts, group_col, "left")
        .withColumn("n_sk", F.coalesce(F.col("n_sk"), F.lit(0)))
        .filter((F.col("n_sk") < k) & F.col("was_filtered"))
        .select(group_col)
        .collect()
    ]
    if not starved:
        return sk
    exact = (
        raw.filter(F.col(group_col).isin(starved))
        .distinct()
        .withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    return sk.filter(~F.col(group_col).isin(starved)).unionByName(exact)


def _estimate(n_col: Column, kth_col: Column, k: int) -> Column:
    """The KMV estimate as a DOUBLE, in the exact parenthesization the
    DuckDB oracle mirrors: (k-1) * (M / kth). Exact regime (sketch not
    full ⇒ it IS the distinct set) returns the count itself."""
    return F.when(n_col < k, n_col.cast("double")).otherwise(
        F.lit(float(k - 1)) * (F.lit(KMV_M) / kth_col.cast("double"))
    )


def kmv_stats(sketch: DataFrame, group_col: str, k: int) -> DataFrame:
    """(group, n_sk, kth, est): per-group distinct-count estimate as a
    BIGINT (rounded; positive-half-up rounds identically in Spark and
    DuckDB)."""
    agg = sketch.groupBy(group_col).agg(
        F.count("*").alias("n_sk"), F.max("h").alias("kth")
    )
    return agg.withColumn(
        "est",
        F.round(_estimate(F.col("n_sk"), F.col("kth"), k)).cast("bigint"),
    )


def kmv_pair_estimates(
    sketch: DataFrame, group_col: str, k: int
) -> DataFrame:
    """All unordered group pairs (a < b) with KMV set-algebra estimates:

        (group_a, group_b, est_a, est_b, est_union, est_intersect)

    Union sketch = k smallest of K_a ∪ K_b (the mergeability property);
    intersection = Jaccard-of-merged-sketch × union estimate, exact
    when the merged sketch isn't full. Reads ONLY sketch rows — the
    pair stage costs O(#pairs · k), independent of the data.

    The sketch is MATERIALIZED here (localCheckpoint): the pair stage
    references it three times (stats + both tag legs), and without
    materialization each reference replays the full distinct+rank
    build against the raw data — 6 scans for 1. Legal because the
    sketch is bounded by construction (≤ k rows per group); in a real
    deployment sketches are the STORED artifact (built once at ingest,
    merged at query time), which this mirrors."""
    sketch = sketch.localCheckpoint(eager=True)
    stats = kmv_stats(sketch, group_col, k)
    pa = stats.select(
        F.col(group_col).alias("ga"),
        F.col("n_sk").alias("n_a"),
        F.col("kth").alias("kth_a"),
    )
    pb = stats.select(
        F.col(group_col).alias("gb"),
        F.col("n_sk").alias("n_b"),
        F.col("kth").alias("kth_b"),
    )
    pairs = pa.crossJoin(pb).filter(F.col("ga") < F.col("gb"))
    # tag sketch rows onto each pair from both sides via two equi-joins
    # (never an OR-join, which would plan as a nested-loop product)
    s = sketch.select(F.col(group_col).alias("g"), "h")
    ta = pairs.join(s, F.col("ga") == F.col("g")).select(
        "ga", "gb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    tb = pairs.join(s, F.col("gb") == F.col("g")).select(
        "ga", "gb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        ta.unionByName(tb)
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    rn = F.row_number().over(W.partitionBy("ga", "gb").orderBy("h"))
    u = (
        merged.withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .groupBy("ga", "gb")
        .agg(
            F.count("*").alias("n_u"),
            F.max("h").alias("kth_u"),
            F.sum(
                ((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("int")
            ).alias("c_ab"),
        )
    )
    eu = _estimate(F.col("n_u"), F.col("kth_u"), k)
    return (
        pairs.join(u, ["ga", "gb"])
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            F.round(_estimate(F.col("n_a"), F.col("kth_a"), k))
            .cast("bigint")
            .alias("est_a"),
            F.round(_estimate(F.col("n_b"), F.col("kth_b"), k))
            .cast("bigint")
            .alias("est_b"),
            F.round(eu).cast("bigint").alias("est_union"),
            F.when(F.col("n_u") < k, F.col("c_ab").cast("bigint"))
            .otherwise(
                F.round(
                    F.col("c_ab").cast("double") * (eu / F.lit(float(k)))
                ).cast("bigint")
            )
            .alias("est_intersect"),
        )
    )

"""Per-column extents: min / max / 1st / 99th percentile (SURVEY.md §2.4 A2-A5).

Reproduces /root/reference/scripts/extract-extents.js: for every wide
metric column, emit one row ``id,min,max,q1,q99`` where q1/q99 are the
d3.quantile values — R-7 linear interpolation over the sorted non-null
numerics (extract-extents.js:44-50). Spark's exact ``percentile`` uses the
same R-7 interpolation, so values match the reference bit-for-bit; the
approximate ``percentile_approx`` would NOT and is deliberately not used.

Spark-first design: unpivot (melt) the wide table so the aggregation is one
``groupBy(column_id)`` over (column, value) pairs — partial min/max collapse
map-side; percentile gathers values per column. Non-numeric/blank cells are
null after the cast and every agg ignores nulls, matching the reference's
drop-before-aggregate (extract-extents.js:24-27). Output row order follows
input column order (extract-extents.js:41) via an explicit position column —
no nondeterministic driver ordering.

Scale note: percentile over a 100 TB fact table would gather per-column
value lists on reducers; with ~500 wide columns each reducer holds one
column's values (~rows/col doubles). For truly huge column cardinalities the
engine exposes approx_extents() (t-digest percentile_approx) as the
documented approximate path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Above this many metric columns the melt layout shards per-column value
# gathers across reducers; below it, one wide aggregation avoids shuffling
# any cell values at all (only partial agg buffers move).
WIDE_AGG_MAX_COLS = 64


def column_extents(
    wide_df: DataFrame,
    exclude: tuple[str, ...] = ("GEOID", "n", "pl"),
    q_low: float = 0.01,
    q_high: float = 0.99,
    exact: bool = True,
    layout: str = "auto",
) -> DataFrame:
    """One row per metric column: id, min, max, q1, q99 (input column order).

    Two physical layouts, same semantics:
      * ``wide``  (default up to WIDE_AGG_MAX_COLS columns): one global
        aggregation of 4 exprs per column — partial aggregation collapses
        map-side, the shuffle carries one buffer per partition, and a
        final ``stack`` reshapes the single row to per-column rows.
        Measured ~2x faster than melt at sf0.1 / 4 columns (3.5s vs 7.2s
        warm, 32 cores) — melt pays a full cell-level shuffle.
      * ``melt``  (many columns): unpivot -> groupBy(column id) so each
        reducer gathers ONE column's values for the exact percentile —
        memory per task stays bounded by one column, not the whole table.
    """
    from ..sources.registry import widen_partitions

    metric_cols = [c for c in wide_df.columns if c not in exclude]
    if layout == "auto":
        layout = "wide" if len(metric_cols) <= WIDE_AGG_MAX_COLS else "melt"
    # percentile partials buffer every value — parallelize the map side
    # when the input is a narrow local scan (no-op for non-scan inputs)
    wide_df = widen_partitions(wide_df)

    def quantiles(col):
        # ONE fused percentile(col, array(lo, hi)) per column, not two
        # separate calls: each exact-percentile aggregate buffers (and
        # the final reducer sorts) its own copy of every value, so the
        # fused form halves both the partial-agg bytes shuffled and the
        # reducer-side sorts — measured 3.6s -> 2.2s warm at sf0.1 / 4
        # columns on the wide layout.
        ps = F.array(F.lit(q_low), F.lit(q_high))
        if exact:
            return F.percentile(col, ps)
        return F.percentile_approx(col, ps, F.lit(10000))

    def nan_safe(v):
        # d3.min/max/quantile DROP NaN (extract-extents.js:24-27); Spark
        # sorts NaN greatest, so max/q99 would return NaN. NaN -> null:
        # every agg ignores nulls, reproducing the drop exactly.
        return F.when(~F.isnan(v), v)

    if layout == "wide":
        aggs = []
        for c in metric_cols:
            v = nan_safe(F.col(c).try_cast("double"))
            aggs += [
                F.min(v).alias(f"{c}__min"),
                F.max(v).alias(f"{c}__max"),
                quantiles(v).alias(f"{c}__q"),
            ]
        one = wide_df.agg(*aggs)
        # stack preserves argument order = input column order
        stack_args = [F.lit(len(metric_cols))]
        for c in metric_cols:
            stack_args += [
                F.lit(c),
                F.col(f"`{c}__min`"),
                F.col(f"`{c}__max`"),
                F.col(f"`{c}__q`")[0],
                F.col(f"`{c}__q`")[1],
            ]
        return one.select(
            F.stack(*stack_args).alias("id", "min", "max", "q1", "q99")
        )

    # melt: unpivot keeps one scan; values try_cast to double — blanks and
    # junk become null (ANSI-safe), matching the reference's isNaN-drop
    melted = wide_df.select(
        [nan_safe(F.col(c).try_cast("double")).alias(c) for c in metric_cols]
    ).unpivot([], metric_cols, "id", "value")
    agg = melted.groupBy("id").agg(
        F.min("value").alias("min"),
        F.max("value").alias("max"),
        quantiles(F.col("value")).alias("__q"),
    )
    agg = agg.select(
        "id", "min", "max",
        F.col("__q")[0].alias("q1"),
        F.col("__q")[1].alias("q99"),
    )
    # stable output order = input column order (extract-extents.js:41)
    pos = F.array_position(F.array(*[F.lit(c) for c in metric_cols]), F.col("id"))
    return agg.withColumn("__pos", pos).orderBy("__pos").drop("__pos")


def approx_extents(wide_df: DataFrame, **kw) -> DataFrame:
    """t-digest approximate variant for columns too hot for exact gather."""
    return column_extents(wide_df, exact=False, **kw)

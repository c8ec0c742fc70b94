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


def column_extents(
    wide_df: DataFrame,
    exclude: tuple[str, ...] = ("GEOID", "n", "pl"),
    q_low: float = 0.01,
    q_high: float = 0.99,
    exact: bool = True,
) -> DataFrame:
    """One row per metric column: id, min, max, q1, q99 (input column order)."""
    metric_cols = [c for c in wide_df.columns if c not in exclude]
    # melt: unpivot keeps one scan; values try_cast to double — blanks and
    # junk become null (ANSI-safe), matching the reference's isNaN-drop
    melted = wide_df.select(
        [F.col(c).try_cast("double").alias(c) for c in metric_cols]
    ).unpivot([], metric_cols, "id", "value")

    if exact:
        q1 = F.percentile("value", F.lit(q_low))
        q99 = F.percentile("value", F.lit(q_high))
    else:
        q1 = F.percentile_approx("value", F.lit(q_low), F.lit(10000))
        q99 = F.percentile_approx("value", F.lit(q_high), F.lit(10000))

    agg = melted.groupBy("id").agg(
        F.min("value").alias("min"),
        F.max("value").alias("max"),
        q1.alias("q1"),
        q99.alias("q99"),
    )
    # stable output order = input column order (extract-extents.js:41)
    pos = F.array_position(F.array(*[F.lit(c) for c in metric_cols]), F.col("id"))
    return agg.withColumn("__pos", pos).orderBy("__pos").drop("__pos")


def approx_extents(wide_df: DataFrame, **kw) -> DataFrame:
    """t-digest approximate variant for columns too hot for exact gather."""
    return column_extents(wide_df, exact=False, **kw)

"""Long -> wide pivot: the reference's core operator (SURVEY.md §2.4 A1).

Semantics reproduced from /root/reference/scripts/shape-data.js:
  * rename + project through a column map; unmapped input columns dropped
    (shape-data.js:31-43)
  * pivot key = last two chars of ``year`` (shape-data.js:30); output
    column ``{short}-{yy}`` (shape-data.js:40)
  * ``parent_location`` JS-falsy (null OR empty string) -> "United States"
    (shape-data.js:45-47)
  * duplicate (id, year) rows: LAST row in file order wins, at row level —
    a later blank overwrites an earlier value (object spread,
    shape-data.js:96-101)
  * name/parent_location are year-invariant (shape-data.js:19,35-38)

Spark-first design, two cheap aggregations instead of |columns| conditional
ones (measured at reference scale — 240k places x 19 years x 30 metrics =
4.56M long rows, 573 wide columns, local[32]):

  1. row-level last-write-wins per (GEOID, yy): ONE ``max_by`` over a
     struct of all metric columns (file order captured as
     ``monotonically_increasing_id()`` at scan, so LWW is deterministic
     under parallel read);
  2. ``groupBy(GEOID).pivot(yy, <explicit years>)`` with ``first(struct)``
     — Spark's PivotFirst indexes the pivot key directly, one evaluation
     per row; then a pure projection flattens struct fields to
     ``{short}-{yy}`` columns.

The naive formulation (570 ``max_by(when(yy=y, col), when(yy=y, ord))``
aggregates in one groupBy) evaluates |rows| x |columns| x 2 conditionals —
~5 BILLION expression evaluations at the scale above, 164s wall-clock;
this formulation does ~35 evaluations per row and runs the same build in
a fraction of that (see docs/SCALE.md). No driver-side accumulation
anywhere (the reference holds the whole wide table in a 4 GB Node heap,
/root/reference/build.sh:80). The wide schema is total and deterministic
(all metrics x all years), fixing the reference's first-row-derived-header
quirk (SURVEY.md §1.4) — a documented improvement.

At 100 TB scale: two shuffles — (GEOID, yy) then GEOID — each with
map-side partial aggregation, shuffle volume bounded by
|places| x |years| rows of structs. The identity columns (n, pl) take
their global-LWW values through the same aggregates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import COL_MAPS, ID_COLS, YEARS

ORDER_COL = "__file_order"


def _last_by_order(value: Column, order: Column) -> Column:
    """Row-level last-write-wins: value at max order (null value allowed)."""
    return F.max_by(value, order)


def pivot_long_to_wide(
    long_df: DataFrame,
    dataset_type: str = "raw",
    years: list[str] | None = None,
    id_col: str = "id",
    year_col: str = "year",
) -> DataFrame:
    """Pivot a long (place, year) table to one row per place.

    Output columns: GEOID, n, pl, then ``{short}-{yy}`` for every metric in
    the dataset's column map x every year in ``years`` (default 2000-2018).
    """
    col_map = COL_MAPS[dataset_type]
    years = years or YEARS
    yys = [y[-2:] for y in years]
    metric_shorts = [v for k, v in col_map.items() if k not in ID_COLS]
    metric_srcs = {v: k for k, v in col_map.items() if k not in ID_COLS}

    if ORDER_COL not in long_df.columns:
        long_df = long_df.withColumn(ORDER_COL, F.monotonically_increasing_id())

    base = long_df.select(
        F.col(id_col).alias("GEOID"),
        F.right(F.col(year_col).cast("string"), F.lit(2)).alias("yy"),
        F.col(col_map_inv_name(col_map, "n")).alias("n"),
        # JS-falsy fill: empty string is as missing as null (A6/F4)
        F.when(
            F.col(col_map_inv_name(col_map, "pl")).isNull()
            | (F.col(col_map_inv_name(col_map, "pl")) == ""),
            F.lit("United States"),
        )
        .otherwise(F.col(col_map_inv_name(col_map, "pl")))
        .alias("pl"),
        F.struct(*[F.col(metric_srcs[s]).alias(s) for s in metric_shorts])
        .alias("__s"),
        F.col(ORDER_COL),
    )

    ordc = F.col(ORDER_COL)
    # stage 1: row-level last-write-wins per (place, year) — one struct
    # max_by; identity columns ride along with their per-year last values
    lww = base.groupBy("GEOID", "yy").agg(
        _last_by_order(F.col("__s"), ordc).alias("__s"),
        _last_by_order(F.col("n"), ordc).alias("n"),
        _last_by_order(F.col("pl"), ordc).alias("pl"),
        F.max(ordc).alias(ORDER_COL),
    )

    # identity columns take the GLOBAL last row's values (shape-data.js
    # overwrites name/parent_location on every row of the place)
    identity = lww.groupBy("GEOID").agg(
        _last_by_order(F.col("n"), F.col(ORDER_COL)).alias("n"),
        _last_by_order(F.col("pl"), F.col(ORDER_COL)).alias("pl"),
    )

    # stage 2: native pivot with explicit values (PivotFirst — no
    # per-value conditionals), then flatten struct fields by projection
    wide_structs = (
        lww.filter(F.col("yy").isin(yys))
        .groupBy("GEOID")
        .pivot("yy", yys)
        .agg(F.first("__s"))
    )
    flat = [
        F.col(f"`{yy}`").getField(s).alias(f"{s}-{yy}")
        for s in metric_shorts
        for yy in yys
    ]
    # both sides are aggregation outputs partitioned on GEOID -> the join
    # adds no exchange; left join keeps places whose rows all fall outside
    # the requested years (they emit all-null metric cells)
    return identity.join(wide_structs, "GEOID", "left").select(
        "GEOID", "n", "pl", *flat
    )


def col_map_inv_name(col_map: dict[str, str], short: str) -> str:
    """Source column name for a short code (e.g. 'n' -> 'name')."""
    for k, v in col_map.items():
        if v == short:
            return k
    raise KeyError(short)


def pivot_generic(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    pivot_values: list[str],
    agg_exprs: dict[str, Column],
    sep: str = "-",
) -> DataFrame:
    """General single-shuffle pivot with explicit values and agg per metric.

    ``agg_exprs`` maps output prefix -> aggregate over a *filtered* column;
    each (prefix, pivot value) pair becomes column ``{prefix}{sep}{value}``.
    Used by the engine's query surface for pivots over arbitrary tables.
    """
    aggs = []
    for prefix, expr in agg_exprs.items():
        for v in pivot_values:
            aggs.append(
                expr(F.when(F.col(pivot_col) == v, F.col(prefix)))
                .alias(f"{prefix}{sep}{v}")
            )
    return df.groupBy(*group_cols).agg(*aggs)

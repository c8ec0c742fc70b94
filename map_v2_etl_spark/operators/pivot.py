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
     under parallel read); the LWW result is PERSISTED because two
     downstream aggregations (identity and pivot) consume it — without
     the persist each branch re-runs the scan + (GEOID, yy) shuffle,
     and the two re-executions could rank duplicate rows differently
     for a non-file upstream;
  2. ``groupBy(GEOID).pivot(yy, <explicit years>)`` with ``first(struct)``
     — the struct aggregate keeps Spark off PivotFirst, so the physical
     plan is one conditional ``first(if(yy<=>v, __s, null))`` PER YEAR
     (O(|years|) conditionals per row, executed as SortAggregate);
     a pure projection then flattens struct fields to ``{short}-{yy}``
     columns.

The naive formulation (570 ``max_by(when(yy=y, col), when(yy=y, ord))``
aggregates in one groupBy) evaluates |rows| x |columns| x 2 conditionals —
~5 BILLION expression evaluations at the scale above, 164s wall-clock;
this formulation does ~|years| conditionals per row — the win is the
O(|years| x |metrics|) -> O(|years|) conditional collapse from packing
metrics into one struct, NOT PivotFirst's key indexing (which never
engages for struct aggregates) — and runs the same build in a fraction
of that (see docs/SCALE.md). No driver-side accumulation anywhere (the
reference holds the whole wide table in a 4 GB Node heap,
/root/reference/build.sh:80). The wide schema is total and deterministic
(all metrics x all years), fixing the reference's first-row-derived-header
quirk (SURVEY.md §1.4) — a documented improvement.

At 100 TB scale: ONE scan + one (GEOID, yy) shuffle builds the persisted
LWW table (map-side partial aggregation; spills to disk under memory
pressure via MEMORY_AND_DISK); the identity and pivot branches then each
shuffle it to GEOID, and their join adds no exchange. Shuffle volume is
bounded by |places| x |years| rows of structs.
"""

from __future__ import annotations

from collections.abc import Callable  # noqa: F401  (annotation)

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
    # explicit empty list means "no metric years", NOT the default set
    years = years if years is not None else YEARS
    yys = [y[-2:] for y in years]
    if len(set(yys)) != len(yys):
        # cross-century collisions ('1999' and '2099' both -> '99')
        # would emit duplicate pivot values and ambiguous output
        # columns — fail fast instead
        raise ValueError(f"duplicate 2-digit pivot keys in years: {yys}")
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
    # TWO branches (identity + pivot) consume lww; without the persist
    # each re-runs the scan and the (GEOID, yy) shuffle (the pivot
    # branch's yy filter defeats ReuseExchange), and for a non-file
    # upstream the re-executed monotonically_increasing_id could rank
    # duplicate rows differently between branches. MEMORY_AND_DISK:
    # spills rather than recomputes at scale.
    from pyspark import StorageLevel

    lww = lww.persist(StorageLevel.MEMORY_AND_DISK)

    # identity columns take the GLOBAL last row's values (shape-data.js
    # overwrites name/parent_location on every row of the place)
    identity = lww.groupBy("GEOID").agg(
        _last_by_order(F.col("n"), F.col(ORDER_COL)).alias("n"),
        _last_by_order(F.col("pl"), F.col(ORDER_COL)).alias("pl"),
    )

    # stage 2: native pivot with explicit values (struct agg -> one
    # conditional first() per year; see module docstring), then flatten
    # struct fields by projection
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
    agg_exprs: dict[str, "Callable[[Column], Column]"],
    sep: str = "-",
) -> DataFrame:
    """General single-shuffle pivot with explicit values and agg per metric.

    ``agg_exprs`` maps an input column name to an AGGREGATE-BUILDING
    CALLABLE (e.g. ``{"price": F.max}``) applied to that column filtered
    per pivot value; each (column, pivot value) pair becomes output
    column ``{column}{sep}{value}``. Library surface for pivots over
    arbitrary tables where the reference-shaped pivot_long_to_wide does
    not fit (covered by tests/test_pivot.py)."""
    aggs = []
    for prefix, expr in agg_exprs.items():
        for v in pivot_values:
            aggs.append(
                expr(F.when(F.col(pivot_col) == v, F.col(prefix)))
                .alias(f"{prefix}{sep}{v}")
            )
    return df.groupBy(*group_cols).agg(*aggs)

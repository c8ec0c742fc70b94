"""Deterministic synthetic reference-shaped data (no files, no RNG state).

Generates the reference workload's long-format table at any cardinality
entirely from ``spark.range`` + hash expressions: one row per (place,
year) with the raw column map's 30 metric columns, ~1/7 cells null, a
JS-falsy empty parent_location every 50th place, and 12-char zero-padded
GEOIDs. Codegen produces rows straight into the consuming operator — no
I/O, perfectly reproducible, embarrassingly parallel.

Used by bench_reference.py to measure the engine at the reference's own
largest region scale (US block groups ~ 240k places x 19 years = 4.56M
long rows -> 240k x 573 wide; /root/reference/build.sh:28 region list,
README.md:60-66).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import COL_MAP_RAW, ID_COLS


def reference_long_table(
    spark: SparkSession,
    places: int = 240_000,
    year_start: int = 2000,
    year_end: int = 2018,
) -> DataFrame:
    """Long fact table shaped exactly like the reference's input CSVs
    (SURVEY.md §1.1): columns id/year/name/parent_location + every raw
    column-map metric; values are pure hash functions of (place, year,
    metric) so any two runs — and any two engines — generate identical
    data. ``year_end`` is INCLUSIVE (the defaults span the reference's
    documented 2000-2018, 19 years) — the old exclusive bound read as
    inclusive and silently shorted callers one year."""
    metrics = [k for k in COL_MAP_RAW if k not in ID_COLS]
    ids = spark.range(places).select(F.col("id").alias("pid"))
    yrs = spark.range(year_start, year_end + 1).select(F.col("id").alias("yr"))
    cols = [
        F.lpad(F.col("pid").cast("string"), 12, "0").alias("id"),
        F.col("yr").cast("string").alias("year"),
        F.concat(F.lit("place_"), F.col("pid")).alias("name"),
        # JS-falsy edge case the pivot must fill (SURVEY §2.4 A6)
        F.when(F.col("pid") % 50 == 0, F.lit(""))
        .otherwise(F.lit("State X"))
        .alias("parent_location"),
    ]
    for j, m in enumerate(metrics):
        h = F.xxhash64(F.col("pid"), F.col("yr"), F.lit(j))
        cols.append(
            F.when(h % 7 == 0, F.lit(None))
            .otherwise((F.abs(h) % 1_000_000) / 100.0)
            .alias(m)
        )
    return ids.crossJoin(yrs).select(*cols)

"""Scalar column helpers mirroring the reference's cell-level functions
(SURVEY.md §2.8): all pure Column expressions — JVM-side, codegen'd, never
Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def yy_from_year(year: Column) -> Column:
    """Last two chars of a 4-char year ('2016' -> '16'); F1,
    /root/reference/scripts/shape-data.js:30."""
    return F.right(year.cast("string"), F.lit(2))


def falsy_fill(col: Column, default: str) -> Column:
    """JS-falsy coalesce: null OR empty string -> default; F4/A6,
    /root/reference/scripts/shape-data.js:45-47. Plain coalesce() is not
    enough because '' is falsy in JS but not null in SQL."""
    return F.when(col.isNull() | (col == ""), F.lit(default)).otherwise(col)


def numeric_or_null(col: Column) -> Column:
    """Cast to double, null on junk; F3 — same observable effect as the
    reference's isNaN-drop before aggregation
    (/root/reference/scripts/extract-extents.js:24-27). try_cast because
    ANSI mode (Spark 4 default) would raise on malformed input."""
    return col.try_cast("double")


def long_array_lit(values) -> "Column":
    """A literal array<bigint> Column built through ONE parsed SQL
    expression. ``F.array(*[F.lit(x) for x in values])`` costs a py4j
    round trip per element (~4s for 2048 elements, measured on the
    bloom bitmap); the parser ingests the same array in milliseconds
    and Catalyst constant-folds it identically.

    Empty input still yields array<bigint>: a bare ``array()`` literal
    types as array<void>, which breaks downstream element_at / bitwise
    ops with a type error instead of behaving as an empty long array."""
    from pyspark.sql import functions as F

    if not len(values):
        return F.expr("CAST(array() AS array<bigint>)")
    return F.expr("array(" + ",".join(f"{int(x)}L" for x in values) + ")")

"""Per-group Pandas transforms (SURVEY §2.10 extension surface).

``applyInPandas`` is the engine's escape hatch for per-group logic that
column expressions cannot express (model scoring, per-group fitting,
custom normalizations): one Arrow batch per group, pandas in, pandas out,
schema declared up front. Group sizing is the scale caveat — a group must
fit one executor's memory, so key choice matters at 100 TB.

``group_zscore`` keeps the arithmetic integer-exact (sums of ints) so the
result is reproducible bit-for-bit across engines — the same determinism
rule the SQL oracles use.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def group_zscore(
    df: DataFrame,
    key_col: str,
    value_col: str,
    out_col: str = "zscore",
) -> DataFrame:
    """z-score of an integer-valued column within each group.

    mean and variance are derived from exact integer sums (int64), so
    every engine computing the same formula gets identical doubles."""
    schema = T.StructType(
        [
            T.StructField(key_col, df.schema[key_col].dataType, True),
            T.StructField(value_col, df.schema[value_col].dataType, True),
            T.StructField(out_col, T.DoubleType(), True),
        ]
    )

    def z(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype("int64")
        n = len(v)
        s = int(v.sum())
        ss = int((v * v).sum())
        mean = s / n
        var = (ss - s * s / n) / (n - 1) if n > 1 else 0.0
        std = math.sqrt(var)
        out = pdf[[key_col, value_col]].copy()
        out[out_col] = (v - mean) / std if std > 0 else 0.0
        return out

    return df.select(key_col, value_col).groupBy(key_col).applyInPandas(
        z, schema
    )

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


def cogroup_asof(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """Pandas twin of operators/joins.asof_join, built on
    ``groupBy().cogroup().applyInPandas``: each key's (left, right)
    partitions arrive as two pandas frames and merge with
    ``pd.merge_asof``. Same output contract as the JVM formulation
    (asserted equal in tests) — use this shape when the per-key logic
    outgrows what window functions express (model-based matching,
    tolerance curves, per-key calibration).
    """
    fields = list(left.schema.fields)
    fields.append(
        T.StructField(f"{right_ts}_right", right.schema[right_ts].dataType, True)
    )
    for c in right_cols:
        fields.append(T.StructField(c, right.schema[c].dataType, True))
    schema = T.StructType(fields)

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=[f.name for f in fields])
        # NULL-timestamp semantics of the JVM asof_join: right rows
        # with NaT never match (merge_asof would otherwise raise
        # 'Merge keys contain null values'), and left NaT rows keep
        # null payloads — segregate them around the merge
        l_null = l[l[left_ts].isna()]
        l = l[l[left_ts].notna()].sort_values(left_ts, kind="mergesort")
        r2 = (
            r[r[right_ts].notna()][[right_ts] + right_cols]
            .rename(columns={right_ts: f"{right_ts}_right"})
            .sort_values(f"{right_ts}_right", kind="mergesort")
        )
        out = pd.merge_asof(
            l, r2,
            left_on=left_ts, right_on=f"{right_ts}_right",
            direction="backward",
        ) if len(l) else l.assign(
            **{f"{right_ts}_right": pd.NaT},
            **{c: None for c in right_cols},
        )
        if len(l_null):
            pad = l_null.assign(
                **{f"{right_ts}_right": pd.NaT},
                **{c: None for c in right_cols},
            )
            out = pd.concat([out, pad])
        return out[[f.name for f in fields]]

    return (
        left.groupBy(*on)
        .cogroup(right.groupBy(*on))
        .applyInPandas(merge, schema)
    )


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
        # nulls carry a null z-score (a NaN would crash astype int64)
        mask = pdf[value_col].notna()
        v = pdf.loc[mask, value_col].astype("int64")
        n = len(v)
        out = pdf[[key_col, value_col]].copy()
        if n == 0:
            out[out_col] = None
            return out
        s = int(v.sum())
        ss = int((v * v).sum())
        mean = s / n
        # max(var, 0): ss - s*s/n evaluates in float64 and an ulp of
        # rounding on huge near-constant values can dip it below zero
        # -> math domain error
        var = max((ss - s * s / n) / (n - 1), 0.0) if n > 1 else 0.0
        std = math.sqrt(var)
        out.loc[mask, out_col] = (
            ((v - mean) / std).astype(float) if std > 0 else 0.0
        )
        return out

    return df.select(key_col, value_col).groupBy(key_col).applyInPandas(
        z, schema
    )

"""Vector math over ``array<float|double>`` columns, JVM-side.

Built from higher-order functions (zip_with/aggregate/transform): no
Python UDF, no Arrow hop. NOTE the honest cost model — Spark evaluates
HOF lambdas on the INTERPRETED expression path (outside whole-stage
codegen, no common-subexpression elimination), which this repo has
measured as the dominant cost in hot loops (pq_encode's fold was 2.8 s
of a 4.7 s query before its Arrow-batched rewrite). These folds are
right for moderate per-row work and for bit-exact oracle parity (left
folds with a pinned order); for per-row-hot inner loops prefer a
vectorized mapInPandas (the perf playbook's gate-bounded pattern).
Used by operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine with NULL (not NaN, not an error) for degenerate inputs.

    Unguarded division is a job-killer under Spark 4's default ANSI
    mode: one zero-norm embedding (the common missing-vector sentinel)
    raises DIVIDE_BY_ZERO inside every similarity query. And a NaN
    component must not become a NaN score: Spark orders NaN ABOVE every
    number, so a garbage vector would rank as everyone's top neighbor
    and NaN >= threshold is true. NULL does the right thing in both
    consumers: sorts last under desc ordering, fails >= filters."""
    den = l2_norm(a) * l2_norm(b)
    return F.nanvl(
        F.when(den != 0, dot(a, b) / den), F.lit(None).cast("double")
    )

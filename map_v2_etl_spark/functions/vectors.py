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


def _dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    # try_element_at (NULL past the end) reproduces zip_with's
    # null-padding on length-mismatched/NULL inputs: any NULL term
    # nulls the whole fold, exactly like the HOF path
    acc = F.lit(0.0)
    for i in range(dim):
        x = F.try_element_at(a, F.lit(i + 1)).cast("double")
        y = F.try_element_at(b, F.lit(i + 1)).cast("double")
        acc = acc + x * y
    return acc


def _sq_norm_unrolled(a: Column, dim: int) -> Column:
    acc = F.lit(0.0)
    for i in range(dim):
        x = F.try_element_at(a, F.lit(i + 1)).cast("double")
        acc = acc + x * x
    return acc


def cosine_similarity_unrolled(a: Column, b: Column, dim: int) -> Column:
    """cosine_similarity with the folds UNROLLED into static expression
    chains for a KNOWN dimensionality — bit-identical results (the same
    left fold, (((0 + t1) + t2) + ...), over the same double casts; IEEE
    ops are deterministic regardless of evaluator), but eligible for
    whole-stage codegen, which Spark's interpreted higher-order-function
    path is not. Measured on the IVF coarse-assignment pass
    (|corpus| x n_cells evaluations — the hottest cosine site in the
    package): bench_scale ivf_pq 1x cell 51 s -> 9.3 s at dim 16 after
    this swap — but at dim 64 the ~3*dim-term tree crosses a janino/JIT
    code-size cliff and runs 2-3x SLOWER than the HOF fold. Same
    NULL/NaN/zero-norm guards as cosine_similarity. Callers gate on
    dim <= _COS_UNROLL_DIM_MAX (operators/similarity.py, where the
    measurements live)."""
    den = F.sqrt(_sq_norm_unrolled(a, dim)) * F.sqrt(
        _sq_norm_unrolled(b, dim)
    )
    return F.nanvl(
        F.when(den != 0, _dot_unrolled(a, b, dim) / den),
        F.lit(None).cast("double"),
    )

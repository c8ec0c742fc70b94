"""Distributed PCA over an embedding column (SURVEY.md §2.11 extension;
the reference at /root/reference has no vector operators).

The textbook two-phase shape for tall-skinny X (n × dim, dim small):

1. **Gram phase (distributed)** — each partition accumulates its own
   (count, Σx, XᵀX) with NumPy inside one Arrow-batched ``mapInPandas``
   pass, emitting ONE row of dim² + dim + 1 doubles per partition. The
   per-element sum of those rows is a bounded aggregate (dim² values
   collected), never the corpus: at 1000 executors and dim = 64 the
   driver sees ~4 KB × partitions, independent of n. This is exactly
   what MLlib's ``RowMatrix.computeGramianMatrix`` does under treeAggregate.
2. **Eigen phase (driver, bounded)** — covariance = G/n − μμᵀ, then a
   dim × dim ``numpy.linalg.eigh``; top-k eigenvectors are sign-fixed
   (largest-|coefficient| entry made positive) so the output is
   deterministic up to eigenvalue ties.
3. **Projection (JVM)** — components fold back in as literal arrays
   (k·dim scalars — bounded, unlike data-dependent centroid folding);
   each score is dot(x, cⱼ) − dot(μ, cⱼ) via the zip_with/aggregate
   vector kernel. No Python in the projection path.

Why not the posexplode self-join (pairs (i,j) per row)? That shuffles
n·dim² rows — corpus-sized traffic for a dim²-sized answer. The partial
Gram keeps shuffle volume at partitions × dim².
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F

from ..functions.vectors import dot


def gram_stats(df: DataFrame, vec_col: str = "embedding"):
    """(n, mean, cov) of the vector column — driver state is dim²."""
    import numpy as np

    def partials(batches: Iterator) -> Iterator:
        import pandas as pd

        n, s, g = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            n += x.shape[0]
            s = x.sum(0) if s is None else s + x.sum(0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame(
                {
                    "n": [float(n)],
                    "sg": [np.concatenate([s, g.ravel()]).tolist()],
                }
            )

    flat = (
        df.select(vec_col)
        .mapInPandas(partials, schema="n double, sg array<double>")
        .select(
            F.posexplode(
                F.concat(F.array(F.col("n")), F.col("sg"))
            ).alias("pos", "val")
        )
    )
    rows = flat.groupBy("pos").agg(F.sum("val").alias("v")).collect()
    if not rows:
        raise ValueError("gram_stats: empty input")
    vals = np.empty(len(rows))
    for r in rows:
        vals[r["pos"]] = r["v"]
    n = vals[0]
    if n == 0:
        raise ValueError("gram_stats: empty input")
    dim = int(round((len(vals) - 1 + 0.25) ** 0.5 - 0.5))  # solve d²+d = len-1
    s, g = vals[1 : 1 + dim], vals[1 + dim :].reshape(dim, dim)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    return int(n), mean, cov


def principal_components(cov, k: int, full_spectrum: bool = False):
    """Top-k eigenvectors of a symmetric matrix, eigenvalue-descending,
    sign-fixed: the largest-|coefficient| entry of each component is
    made positive (deterministic up to exact eigenvalue ties). With
    ``full_spectrum`` also returns ALL eigenvalues ascending (the same
    eigh solve — callers needing the trace identity must not re-solve)."""
    import numpy as np

    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T.copy()
    for j in range(comps.shape[0]):
        i = int(np.argmax(np.abs(comps[j])))
        if comps[j, i] < 0:
            comps[j] = -comps[j]
    if full_spectrum:
        return comps, w[order], w
    return comps, w[order]


def _score_columns(comps, mean, vec_col: str, k: int):
    """The ONE projection kernel: unrounded centered score columns
    p_j = dot(x, c_j) − dot(μ, c_j), shared by pca_project (which
    rounds them) and pca_certificate (which aggregates them) so the
    certified invariants and the parity-tested projection can never
    desynchronize. Raises on k > dim — eigh can only yield dim
    components, and a silent clip would IndexError later."""
    if comps.shape[0] < k:
        raise ValueError(
            f"pca k={k} exceeds embedding dim {comps.shape[0]}"
        )
    offsets = comps @ mean
    cols = []
    for j in range(k):
        lit = F.array(*[F.lit(float(c)) for c in comps[j]])
        cols.append(
            (
                dot(F.col(vec_col).cast("array<double>"), lit)
                - float(offsets[j])
            ).alias(f"p{j}")
        )
    return cols


def pca_project(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """(id, pc0..pc{k-1}) — centered projection onto the top-k
    components, rounded for cross-run stability."""
    _, mean, cov = gram_stats(df, vec_col)
    comps, _ = principal_components(cov, k)
    cols = [F.col(id_col)] + [
        F.round(c, decimals).alias(f"pc{j}")
        for j, c in enumerate(_score_columns(comps, mean, vec_col, k))
    ]
    return df.select(*cols)


def pca_certificate(
    df: DataFrame, k: int = 8, vec_col: str = "embedding"
) -> DataFrame:
    """Engine-portable PCA invariant certificate (r10) — the frame that
    turns the PCA pipeline from a rows-only check into a value-hash
    oracle. One row per component, every column an exact-comparable
    integer:

      n, dim        — corpus size / vector width (exact, both engines);
      sum_sq_e12    — Σ over the corpus of Σ_coords q(v)² with
                      q(v) = round(v·1e6): pure integer arithmetic
                      after one shared double multiply, so any
                      summation order in either engine produces the
                      same value — certifies the scan feeding the Gram
                      phase saw the same data the oracle reads. q and
                      the products run in DECIMAL(38,0) on the Spark
                      side to mirror DuckDB's HUGEINT exactly — a
                      BIGINT q·q would wrap at |v| ≥ ~3037 while the
                      oracle stayed exact, a cross-engine asymmetry
                      masquerading as data corruption;
      mean_e9       — round(mean of the UNROUNDED pc-j projection ·1e9).
                      Centered projections sum to zero mathematically;
                      float cancellation noise is ~1e-16·n·|p|, parts
                      per 1e9 of nothing — exactly 0 unless centering
                      is broken;
      var_match_e6  — round((Σp²/n − λ_j)/λ_j · 1e6): the projection
                      variance along component j IS the j-th eigenvalue
                      (biased /n covariance, consistent with gram_stats)
                      — 0 unless the eigensolve/projection disagree;
      orth_resid_e9 — round(max|CCᵀ − I|·1e9) over the top-k components
                      (same value on every row) — 0 unless eigh returns
                      non-orthonormal components;
      eig_trace_resid_e9 — round((Σ_all λ − tr(cov))/tr(cov)·1e9) — the
                      full-spectrum trace identity, 0 by construction.

    The DuckDB oracle recomputes n/dim/sum_sq_e12 from the raw table
    and asserts the four residual columns are 0: a wrong projection,
    a broken eigensolve, or a data mismatch each flip an integer and
    hash-mismatch. Tolerances sit ≥1e3× above measured float noise and
    ≥1e3× below any real defect, so the integers are stable. All
    driver state is dim²-bounded (gram) + k-bounded (this frame)."""
    import numpy as np

    spark = df.sparkSession
    n, mean, cov = gram_stats(df, vec_col)
    # ONE eigh solve yields both the top-k components and the full
    # spectrum the trace identity needs
    comps, eig, w_all = principal_components(cov, k, full_spectrum=True)
    dim = comps.shape[1]
    trace = float(np.trace(cov))
    # degeneracy guard: a rank-deficient corpus (n <= k rows, duplicated
    # vectors, constant coordinates) puts λ_j at exact 0 or ±1e-17 float
    # noise — the var_match division would crash or emit an arbitrary
    # huge integer that reads as an engine mismatch. Fail loudly with
    # the actual cause instead.
    if trace <= 0.0 or float(eig[k - 1]) <= 1e-12 * max(trace, 1.0):
        raise ValueError(
            f"pca_certificate: covariance is degenerate for k={k} "
            f"(trace={trace!r}, λ_{k - 1}={float(eig[k - 1])!r}) — the "
            "corpus has rank < k; reduce k or fix the input"
        )
    eig_trace_resid = (float(w_all.sum()) - trace) / trace
    orth = float(np.abs(comps @ comps.T - np.eye(k)).max())

    # DECIMAL(38,0) mirror of the oracle's HUGEINT arithmetic (see the
    # docstring's width note)
    q = "CAST(round(CAST(v AS DOUBLE) * 1000000.0) AS DECIMAL(19,0))"
    row_sq = F.expr(
        f"aggregate(transform({vec_col}, "
        f"v -> CAST({q} * {q} AS DECIMAL(38,0))), "
        "CAST(0 AS DECIMAL(38,0)), (a, x) -> a + x)"
    ).alias("row_sq")

    score_cols = _score_columns(comps, mean, vec_col, k)
    aggs = [F.sum(F.col("row_sq")).alias("ssq")]
    for j in range(k):
        aggs.append(F.sum(F.col(f"p{j}")).alias(f"s{j}"))
        aggs.append(
            F.sum(F.col(f"p{j}") * F.col(f"p{j}")).alias(f"q{j}")
        )
    # one corpus pass covers the integer data digest AND the projection
    # moments (plus the gram pass above: two passes total)
    stats = df.select(row_sq, *score_cols).agg(*aggs).collect()[0]
    sum_sq_e12 = int(stats["ssq"])

    rows = []
    for j in range(k):
        mean_j = stats[f"s{j}"] / n
        var_j = stats[f"q{j}"] / n
        rows.append(
            (
                j,
                n,
                dim,
                sum_sq_e12,
                int(round(mean_j * 1e9)),
                int(round((var_j - float(eig[j])) / float(eig[j]) * 1e6)),
                int(round(orth * 1e9)),
                int(round(eig_trace_resid * 1e9)),
            )
        )
    return spark.createDataFrame(
        rows,
        "pc int, n bigint, dim int, sum_sq_e12 bigint, mean_e9 bigint, "
        "var_match_e6 bigint, orth_resid_e9 bigint, "
        "eig_trace_resid_e9 bigint",
    ).orderBy("pc")

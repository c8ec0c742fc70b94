"""embedding_pca certificate invariants (r10, verdict item 4).

The oracle asserts the residual integers are 0; these tests pin WHY
that is a real certification: each residual is driven away from 0 by a
deliberately broken input, so a passing hash genuinely witnesses the
eigenstructure, not a constant column.
"""

from __future__ import annotations

import numpy as np

from map_v2_etl_spark.operators.pca import pca_certificate
from map_v2_etl_spark.plans.registry import REGISTRY, all_queries

all_queries()


def test_certificate_zeros_at_fixture(spark):
    rows = REGISTRY["embedding_pca"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [r["pc"] for r in rows] == list(range(8))
    for r in rows:
        assert r["mean_e9"] == 0
        assert r["var_match_e6"] == 0
        assert r["orth_resid_e9"] == 0
        assert r["eig_trace_resid_e9"] == 0
        assert r["dim"] == 64 and r["n"] > 0 and r["sum_sq_e12"] > 0


def test_var_match_detects_projection_drift(spark, monkeypatch):
    """Scaling one eigenvalue after the solve must flip var_match_e6 —
    the invariant is live, not a hardcoded zero."""
    from map_v2_etl_spark.operators import pca as P

    real = P.principal_components

    def skewed(cov, k, full_spectrum=False):
        comps, eig, w_all = real(cov, k, full_spectrum=True)
        eig = np.array(eig, dtype=float).copy()
        eig[0] *= 1.01  # 1% drift -> var_match_e6 ~ -9900
        if full_spectrum:
            return comps, eig, w_all
        return comps, eig

    monkeypatch.setattr(P, "principal_components", skewed)
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = pca_certificate(df, k=4).collect()
    assert rows[0]["var_match_e6"] != 0
    assert all(r["var_match_e6"] == 0 for r in rows[1:])


def test_degenerate_corpus_raises_loudly(spark):
    """Rank-deficient input (every vector identical -> zero covariance)
    must raise the degeneracy ValueError, not crash with
    ZeroDivisionError or emit garbage residual integers."""
    import pytest

    df = spark.range(10).selectExpr(
        "id AS vec_id", "array(1.0d, 2.0d, 3.0d) AS embedding"
    )
    with pytest.raises(ValueError, match="degenerate"):
        pca_certificate(df, k=2).collect()

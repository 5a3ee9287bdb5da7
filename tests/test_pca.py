"""Distributed covariance + PCA projection (X57/X58), numpy-pinned."""

import numpy as np
import pytest

from data_pipeline_bigquery_to_sftp_server_spark.operators import pca


def _toy(spark, n=200, d=6, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic cloud so the axes are well-separated (no eigenvalue ties)
    X = rng.normal(size=(n, d)) * np.linspace(3.0, 0.3, d) + rng.normal(size=d)
    rows = [(int(i), [float(v) for v in X[i]]) for i in range(n)]
    return X, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_covariance_matches_numpy(spark):
    X, df = _toy(spark)
    got = {(r.i, r.j): r.cov for r in pca.covariance_matrix(df).collect()}
    want = np.cov(X, rowvar=False, bias=True)
    d = X.shape[1]
    assert len(got) == d * d
    for i in range(d):
        for j in range(d):
            assert got[(i, j)] == pytest.approx(round(want[i, j], 6), abs=2e-6)


def test_pca_project_matches_numpy(spark):
    X, df = _toy(spark)
    out = {r.vec_id: r for r in pca.pca_project(df, q=3).collect()}
    mu = X.mean(axis=0)
    w, v = np.linalg.eigh(np.cov(X, rowvar=False, bias=True))
    order = np.argsort(w)[::-1][:3]
    comps = v[:, order].T
    flip = np.sign(comps[np.arange(3), np.abs(comps).argmax(axis=1)])
    P = (X - mu) @ (comps * flip[:, None]).T
    for i in range(len(X)):
        got = np.array([out[i].pc1, out[i].pc2, out[i].pc3])
        assert np.allclose(got, np.round(P[i], 6), atol=2e-6)


def test_pca_whiten_unit_variance(spark):
    X, df = _toy(spark, n=500)
    pcs = pca.pca_project(df, q=2, whiten=True).toPandas()
    # population variance of each whitened axis ~ 1
    assert abs(pcs.pc1.var(ddof=0) - 1.0) < 0.05
    assert abs(pcs.pc2.var(ddof=0) - 1.0) < 0.05


def test_pca_dim_ceiling_fails_loudly(spark):
    rows = [(0, [0.0] * 300), (1, [1.0] * 300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="ceiling|_MAX_DIM|dim"):
        pca.covariance_matrix(df).collect()

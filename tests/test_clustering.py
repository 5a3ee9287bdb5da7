"""Distributed k-means (X32): parity with a numpy Lloyd reference
under identical init, convergence behavior, and the profile shape."""

import numpy as np
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators import clustering


def _separated_corpus(spark, n_per=30, dim=8, seed=7):
    """Three well-separated Gaussian blobs — cluster margins >> float
    noise, so distributed-sum ordering cannot flip an assignment."""
    rng = np.random.default_rng(seed)
    blobs = []
    for c, center in enumerate([np.zeros(dim), np.ones(dim) * 10, -np.ones(dim) * 10]):
        pts = center + rng.normal(0, 0.1, size=(n_per, dim))
        blobs.append(pts)
    X = np.vstack(blobs)
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        X,
    )


def _numpy_lloyd(X, init, n_iter):
    C = init.copy()
    reseed = init.copy()
    for _ in range(n_iter):
        d2 = (X * X).sum(1)[:, None] - 2 * X @ C.T + (C * C).sum(1)[None, :]
        lab = d2.argmin(1)
        new = reseed.copy()
        for j in range(len(C)):
            m = lab == j
            if m.any():
                new[j] = X[m].mean(0)
        C = new
    d2 = (X * X).sum(1)[:, None] - 2 * X @ C.T + (C * C).sum(1)[None, :]
    return d2.argmin(1)


def test_kmeans_matches_numpy_reference_on_separated_blobs(spark):
    df, X = _separated_corpus(spark)
    assigned, centers = clustering.kmeans_assign(df, k=3, n_iter=4, seed=11)
    got = {r.vec_id: r.cluster for r in assigned.select("vec_id", "cluster").collect()}
    # replicate the operator's deterministic init: k hash-smallest ids
    init_ids = [
        r.vec_id
        for r in df.select("vec_id")
        .orderBy(F.xxhash64(F.col("vec_id"), F.lit(11)))
        .limit(3)
        .collect()
    ]
    ref = _numpy_lloyd(X, X[init_ids].astype(np.float64), 4)
    assert all(got[i] == ref[i] for i in range(len(X)))
    # each true blob maps to exactly one cluster id
    for blob in range(3):
        ids = range(blob * 30, (blob + 1) * 30)
        assert len({got[i] for i in ids}) == 1
    assert len(centers) == 3 and len(centers[0]) == 8


def test_cluster_profile_counts(spark):
    df, _ = _separated_corpus(spark)
    assigned, _ = clustering.kmeans_assign(df, k=3, n_iter=3, seed=11)
    prof = clustering.cluster_profile(assigned).collect()
    assert sorted(r.n_vecs for r in prof) == [30, 30, 30]
    assert all(r.avg_norm > 0 for r in prof)


def test_kmeans_rejects_k_larger_than_corpus(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    import pytest

    with pytest.raises(ValueError, match="fewer rows"):
        clustering.kmeans_assign(df, k=5, n_iter=1)


def test_within_cluster_pairs_subset_and_blob_exact(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators import similarity

    df, X = _separated_corpus(spark)
    assigned, _ = clustering.kmeans_assign(df, k=3, n_iter=4, seed=11)
    within = {
        (r.id_a, r.id_b)
        for r in clustering.within_cluster_pairs(assigned, threshold=0.9).collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.exact_near_dup_pairs_np(df, threshold=0.9).collect()
    }
    assert within <= exact
    # blobs are tight (cos within-blob ~1) and orthogonal-ish across
    # blobs, and k-means recovers the blobs exactly -> no cross-cluster
    # near-dups exist, so the within-cluster search is recall-complete
    assert within == exact and len(within) > 0

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


def test_within_cluster_pairs_jumbo_cluster_fails_loudly(spark):
    """r8 guard: a cluster above max_cluster_rows raises BEFORE any
    pandas group materializes, with the raise-k remedy in the message."""
    import pytest

    df, _ = _separated_corpus(spark)
    assigned, _ = clustering.kmeans_assign(df, k=3, n_iter=4, seed=11)
    with pytest.raises(ValueError, match="k='auto'"):
        clustering.within_cluster_pairs(
            assigned, threshold=0.9, max_cluster_rows=10
        ).collect()
    # ceiling at the actual max (30) passes untouched
    ok = clustering.within_cluster_pairs(assigned, threshold=0.9, max_cluster_rows=30)
    assert ok.count() > 0


def test_auto_kmeans_k_law_and_end_to_end(spark):
    assert clustering.auto_kmeans_k(90, target_cluster_rows=30) == 3
    assert clustering.auto_kmeans_k(1, target_cluster_rows=4096) == 2  # floor
    assert clustering.auto_kmeans_k(1_000_000) == 245  # ceil(1e6/4096)
    df, _ = _separated_corpus(spark)
    assigned, centers = clustering.kmeans_assign(
        df, k="auto", n_iter=4, seed=11, target_cluster_rows=30
    )
    assert len(centers) == 3
    prof = clustering.cluster_profile(assigned).collect()
    assert sorted(r.n_vecs for r in prof) == [30, 30, 30]


def test_kmeans_ragged_vectors_fail_loudly(spark):
    """ADVICE r7: inconsistent embedding widths must raise, not produce
    silently wrong centroids via last-write-wins counts."""
    import pytest

    rows = [(i, [float(i), 0.0, 0.0]) for i in range(8)]
    rows += [(100 + i, [float(i), 1.0]) for i in range(8)]  # short vectors
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="ragged|same|dimension|shapes|shape"):
        clustering.kmeans_assign(df, k=2, n_iter=2, seed=3)


def test_multi_probe_recovers_boundary_pairs(spark):
    """r8 multi-probe: a near-dup pair straddling a centroid boundary is
    missed single-probe and recovered at n_probe=2, at unchanged
    precision (both stay subsets of the global exact pairs)."""
    import numpy as np

    from data_pipeline_bigquery_to_sftp_server_spark.operators import similarity

    rng = np.random.default_rng(5)
    rows = []
    for i in range(10):  # blob A around 10*e1
        rows.append((i, [10.0 + rng.normal(0, 0.05), rng.normal(0, 0.05), 0.0, 0.0]))
    for i in range(10, 20):  # blob B around 10*e2
        rows.append((i, [rng.normal(0, 0.05), 10.0 + rng.normal(0, 0.05), 0.0, 0.0]))
    # boundary near-dup pair: cos(M1,M2) ~ 0.998, assigned to opposite sides
    rows.append((100, [5.3, 5.0, 0.0, 0.0]))
    rows.append((101, [5.0, 5.3, 0.0, 0.0]))
    df = spark.createDataFrame(
        [(i, [float(v) for v in vec]) for i, vec in rows],
        "vec_id long, embedding array<double>",
    )
    centers = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0]]
    single = clustering.multi_probe_assign(df, centers, n_probe=1)
    p1 = {
        (r.id_a, r.id_b)
        for r in clustering.within_cluster_pairs(single, threshold=0.99).collect()
    }
    multi = clustering.multi_probe_assign(df, centers, n_probe=2)
    p2 = {
        (r.id_a, r.id_b)
        for r in clustering.within_cluster_pairs(multi, threshold=0.99)
        .dropDuplicates(["id_a", "id_b"])
        .collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in similarity.exact_near_dup_pairs_np(df, threshold=0.99).collect()
    }
    assert (100, 101) not in p1
    assert (100, 101) in p2
    assert p1 < p2 <= exact  # strictly better recall, same precision
    # n_probe bounds enforced
    import pytest

    with pytest.raises(ValueError, match="n_probe"):
        clustering.multi_probe_assign(df, centers, n_probe=3)

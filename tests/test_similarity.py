"""Similarity search (X3/X4): native dot/cosine vs numpy, brute-force
top-k exactness, LSH recall."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table
from data_pipeline_bigquery_to_sftp_server_spark.operators import similarity


def test_dot_and_cosine_match_numpy(spark):
    a, b = [1.0, 2.0, 3.0], [4.0, -5.0, 6.0]
    df = spark.createDataFrame([(a, b)], "x array<double>, y array<double>")
    row = df.select(
        similarity.dot(F.col("x"), F.col("y")).alias("d"),
        similarity.cosine(F.col("x"), F.col("y")).alias("c"),
    ).first()
    assert abs(row.d - np.dot(a, b)) < 1e-12
    exp = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert abs(row.c - exp) < 1e-12


def test_cosine_zero_norm_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 2.0])], "x array<double>, y array<double>")
    assert df.select(similarity.cosine(F.col("x"), F.col("y")).alias("c")).first().c is None


def _numpy_topk(corpus: pd.DataFrame, qid: int, qvec, k: int):
    mat = np.vstack(corpus["embedding"].to_numpy())
    q = np.asarray(qvec, dtype=np.float64)
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(sims)), key=lambda i: (-sims[i], corpus["vec_id"].iloc[i]))[:k]
    return [int(corpus["vec_id"].iloc[i]) for i in order]


def test_brute_force_topk_matches_numpy(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    pdf = e.toPandas()
    pdf["embedding"] = pdf["embedding"].map(lambda v: np.asarray(v, dtype=np.float64))
    queries = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = similarity.brute_force_topk(e, queries, k=5).toPandas()
    for qid in range(3):
        qvec = pdf.loc[pdf.vec_id == qid, "embedding"].iloc[0]
        exp = _numpy_topk(pdf, qid, qvec, 5)
        mine = got[got.query_id == qid].sort_values("rank")["vec_id"].tolist()
        assert mine == exp, f"query {qid}: {mine} != {exp}"


def test_numpy_path_identical_to_hof(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    a = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in similarity.brute_force_topk(e, queries, k=7).collect()
    )
    b = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in similarity.brute_force_topk_np(e, queries, k=7).collect()
    )
    assert a == b


def test_lsh_topk_recall(spark, sf_dir):
    """ANN is approximate by contract; demand >=40% overlap with the
    exact top-10 on near-orthogonal random vectors (a weak corpus for
    LSH) — recall on clustered real embeddings would be far higher."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = similarity.brute_force_topk(e, queries, k=10).toPandas()
    approx = similarity.lsh_topk(e, queries, k=10, dim=64, num_planes=16, bands=8).toPandas()
    recalls = []
    for qid in range(5):
        t = set(exact[exact.query_id == qid].vec_id)
        g = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(t & g) / len(t))
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_ivf_full_probe_is_exact(spark, sf_dir):
    """Probing every centroid searches every bucket, so IVF must return
    exactly the brute-force result — the correctness anchor for the
    approximate path."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in similarity.brute_force_topk(e, queries, k=5).collect()
    )
    ivf = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in similarity.ivf_topk(
            e, queries, k=5, n_centroids=8, n_probe=8
        ).collect()
    )
    assert ivf == exact


def test_ivf_partial_probe_recall(spark, sf_dir):
    """Partial probe is approximate; near-orthogonal random vectors are
    the worst case for a coarse quantizer, so demand modest recall."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = similarity.brute_force_topk(e, queries, k=10).toPandas()
    approx = similarity.ivf_topk(e, queries, k=10, n_centroids=8, n_probe=4).toPandas()
    recalls = []
    for qid in range(5):
        t = set(exact[exact.query_id == qid].vec_id)
        g = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(t & g) / len(t))
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_embedding_near_dup_pairs_all_above_threshold(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    out = similarity.embedding_near_dup_pairs(e, threshold=0.3, dim=64).collect()
    assert all(r.cos_sim >= 0.3 for r in out)
    assert all(r.id_a < r.id_b for r in out)


def test_dim_is_required_not_inferred(spark, sf_dir):
    """dim=None must raise, never trigger an eager .first() driver job
    inside the lazy operator (the contract the docstrings promise)."""
    import pytest

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.limit(1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    with pytest.raises(ValueError, match="dim"):
        similarity.lsh_topk(e, queries, k=3)
    with pytest.raises(ValueError, match="dim"):
        similarity.embedding_near_dup_pairs(e, threshold=0.5)


def test_ann_query_recall_column(spark, sf_dir):
    """The queries() entries self-certify: every row carries its query's
    recall_vs_exact, and mean recall clears the pytest threshold."""
    from data_pipeline_bigquery_to_sftp_server_spark.queries import QUERIES

    for name in ("lsh_topk", "ivf_topk"):
        pdf = QUERIES[name](spark, sf_dir).toPandas()
        assert "recall_vs_exact" in pdf.columns
        per_query = pdf.groupby("query_id").recall_vs_exact.first()
        assert len(per_query) == 5
        assert per_query.between(0.0, 1.0).all()
        assert per_query.mean() >= 0.4, dict(per_query)


def test_exact_near_dup_pairs_np_matches_numpy_reference(spark, sf_dir):
    """The BLAS-blocked all-pairs operator must emit exactly the
    above-threshold (id_a < id_b) pairs a dense numpy computation
    finds — every pair once, rounded to 4dp."""
    import numpy as np

    e = load_table(spark, sf_dir, "embeddings")
    got = {
        (r.id_a, r.id_b): r.cos_sim
        for r in similarity.exact_near_dup_pairs_np(e, threshold=0.35).collect()
    }
    pdf = e.toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    order = np.argsort(ids)
    want = {}
    for ai in range(len(ids)):
        for bi in range(len(ids)):
            if ids[ai] < ids[bi] and sims[ai, bi] >= 0.35:
                want[(ids[ai], ids[bi])] = round(float(sims[ai, bi]), 4)
    assert got == want
    assert len(want) > 0


def test_cross_banded_subset_and_recall_of_exact(spark, sf_dir):
    """The SRP-banded (new x corpus) screen must emit ONLY true pairs
    (subset of the exact twin — precision 1 by construction: candidates
    are exact-verified) and recall must clear the pytest floor at the
    synthetic 0.35 threshold. Also pins the broadcast-new plan shape:
    the corpus side must never shuffle for candidate generation."""
    from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table
    from data_pipeline_bigquery_to_sftp_server_spark.plans import explain
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    new = e.where(F.col("vec_id") % 10 == 0)
    corpus = e.where(F.col("vec_id") % 10 != 0)
    exact = {
        (r.id_new, r.id_corpus): r.cos_sim
        for r in similarity.cross_near_dup_pairs_np(
            new, corpus, threshold=0.35
        ).collect()
    }
    banded_df = similarity.cross_near_dup_pairs_banded(
        new, corpus, threshold=0.35, dim=64, num_planes=16, bands=8
    )
    banded = {
        (r.id_new, r.id_corpus): r.cos_sim for r in banded_df.collect()
    }
    assert set(banded) <= set(exact)
    assert all(banded[k] == exact[k] for k in banded)
    assert len(banded) / max(len(exact), 1) >= 0.5, (len(banded), len(exact))
    plan = explain.formatted_plan(banded_df)
    assert "BroadcastHashJoin" in plan


def test_auto_srp_num_planes_reproduces_measured_law(spark):
    """The auto width rule must reproduce both measured SCALING points:
    sf0.1 corpus (2,000 rows, 4 bands) -> 16 planes; the 10x corpus
    (20,000 rows) -> 32 planes (the config measured at 6.1 s vs 59 s
    at fixed width). Monotone non-decreasing in n."""
    assert similarity.auto_srp_num_planes(2_000, 4) == 16
    assert similarity.auto_srp_num_planes(20_000, 4) == 32
    assert similarity.auto_srp_num_planes(50, 4) == 16  # floor
    widths = [
        similarity.auto_srp_num_planes(n, 4)
        for n in (100, 1_000, 10_000, 100_000, 1_000_000)
    ]
    assert widths == sorted(widths)


def test_cross_np_corpus_ceiling_raises(spark, sf_dir):
    """The exact twin collects the corpus driver-side; an over-ceiling
    corpus must fail loudly BEFORE the collect, pointing at the banded
    tier (ADVICE r6 / VERDICT What's-wrong #1)."""
    import pytest
    from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    new = e.where(F.col("vec_id") % 10 == 0)
    corpus = e.where(F.col("vec_id") % 10 != 0)
    with pytest.raises(ValueError, match="banded"):
        similarity.cross_near_dup_pairs_np(
            new, corpus, threshold=0.35, max_corpus_rows=10
        )
    with pytest.raises(ValueError, match="max_rows"):
        similarity.exact_near_dup_pairs_np(e, threshold=0.35, max_rows=10)


def test_retrieval_mrr_perfect_space_ranks_first(spark):
    """In a perfectly-separated label space every anchor's nearest
    neighbor shares its label -> first_rel_rank == 1, MRR == 1."""
    import numpy as np

    from data_pipeline_bigquery_to_sftp_server_spark.queries import q_retrieval_mrr  # noqa: F401
    from data_pipeline_bigquery_to_sftp_server_spark.operators import similarity as S
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    rng = np.random.default_rng(3)
    rows = []
    for lab, center in enumerate([np.ones(8), -np.ones(8)]):
        for i in range(50):
            v = center + rng.normal(0, 0.05, 8)
            rows.append((lab * 50 + i, [float(x) for x in v], lab))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    anchors = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    scored = (
        e.crossJoin(F.broadcast(anchors))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "query_label",
            "vec_id",
            "label",
            S.cosine(
                F.col("embedding").cast("array<double>"),
                F.col("query_vec").cast("array<double>"),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    got = (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("label") == F.col("query_label"))
        .groupBy("query_id")
        .agg(F.min("rnk").alias("r"))
        .collect()
    )
    assert len(got) == 2 and all(row.r == 1 for row in got)

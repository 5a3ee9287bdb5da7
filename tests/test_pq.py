"""Product quantization (X4 memory tier): exactness anchor, recall,
held-state lifecycle (absorb/save/load), compression contract."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators import pq, similarity


def _fixtures(spark, sf_dir, n_queries=5):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return e, q


def test_pq_exactness_anchor_equals_brute_force(spark, sf_dir):
    # ksub >= corpus: every subvector is its own centroid, ADC
    # degenerates to the exact inner product, and with the exact
    # re-rank the result must EQUAL brute force (the ivf_full_probe
    # discipline applied to PQ)
    e, q = _fixtures(spark, sf_dir, n_queries=3)
    small = e.where(F.col("vec_id") < 64)
    idx = pq.build_pq_index(small, dim=64, m=1, ksub=64, max_train=8192)
    got = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in pq.pq_topk(small, q, idx, k=5, rerank=20).collect()
    )
    exact = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in similarity.brute_force_topk(small, q, k=5).collect()
    )
    assert got == exact


def test_pq_recall_and_exact_scores(spark, sf_dir):
    # near-orthogonal random vectors are PQ's worst case (same as
    # LSH/IVF) — demand the family's modest-recall floor, and check
    # every RETURNED score equals the true cosine (precision 1 by the
    # exact re-rank)
    e, q = _fixtures(spark, sf_dir)
    idx = pq.build_pq_index(e, dim=64, m=8, ksub=256)
    approx = pq.pq_topk(e, q, idx, k=10, rerank=50).toPandas()
    exact = similarity.brute_force_topk(e, q, k=10).toPandas()
    recalls = []
    for qid in range(5):
        t = set(exact[exact.query_id == qid].vec_id)
        g = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(t & g) / len(t))
    assert sum(recalls) / len(recalls) >= 0.4, recalls
    truth = {
        (r.query_id, r.vec_id): r.cos_sim for r in exact.itertuples()
    }
    full = similarity.brute_force_topk(e, q, k=len(e.collect())).toPandas()
    truth.update({(r.query_id, r.vec_id): r.cos_sim for r in full.itertuples()})
    for r in approx.itertuples():
        assert abs(truth[(r.query_id, r.vec_id)] - r.cos_sim) < 1e-9


def test_pq_absorb_equals_frozen_model_encode(spark, sf_dir):
    e, _ = _fixtures(spark, sf_dir)
    held = e.where(F.col("vec_id") % 10 != 0)
    arriving = e.where(F.col("vec_id") % 10 == 0)
    idx = pq.build_pq_index(held, dim=64, m=8, ksub=64)
    grown = pq.absorb_pq_index(idx, arriving, persist=False)
    assert grown.codes.count() == e.count()
    direct = pq._encode(arriving, "vec_id", "embedding", idx.codebooks, True)
    got = {
        r.vec_id: tuple(r.code)
        for r in grown.codes.join(
            arriving.select("vec_id"), "vec_id", "left_semi"
        ).collect()
    }
    want = {r.vec_id: tuple(r.code) for r in direct.collect()}
    assert got == want


def test_pq_save_load_roundtrip(spark, sf_dir, tmp_path):
    e, q = _fixtures(spark, sf_dir)
    idx = pq.build_pq_index(e, dim=64, m=8, ksub=64)
    path = str(tmp_path / "pq_index")
    pq.save_pq_index(idx, path)
    loaded = pq.load_pq_index(spark, path)
    assert loaded.codebooks == idx.codebooks
    assert (loaded.m, loaded.ksub, loaded.dim, loaded.normalize) == (
        idx.m,
        idx.ksub,
        idx.dim,
        idx.normalize,
    )
    fresh = sorted(
        map(tuple, pq.pq_topk(e, q, idx, k=10, rerank=50).collect())
    )
    again = sorted(
        map(tuple, pq.pq_topk(e, q, loaded, k=10, rerank=50).collect())
    )
    assert fresh == again


def test_pq_dim_must_divide(spark, sf_dir):
    e, _ = _fixtures(spark, sf_dir)
    with pytest.raises(ValueError, match="not divisible"):
        pq.build_pq_index(e, dim=64, m=7)


def test_pq_codes_are_byte_narrow(spark, sf_dir):
    # the memory contract: m codes per row, every code < ksub (fits a
    # byte at ksub<=256) — the 32x-smaller-scan story is real
    e, _ = _fixtures(spark, sf_dir)
    idx = pq.build_pq_index(e, dim=64, m=8, ksub=256)
    stats = idx.codes.select(
        F.size("code").alias("m"), F.array_max("code").alias("mx")
    ).agg(F.max("m"), F.min("m"), F.max("mx")).collect()[0]
    assert stats[0] == 8 and stats[1] == 8 and stats[2] < 256


def test_ivfpq_double_anchor_equals_brute_force(spark, sf_dir):
    # full probe (every bucket searched) + exact-capable codebooks
    # (ksub >= corpus, m=1) must equal brute force — both approximation
    # dials turned off, the composition must be lossless
    e, q = _fixtures(spark, sf_dir, n_queries=3)
    small = e.where(F.col("vec_id") < 64)
    ann = similarity.build_ann_index(small, dim=64, n_centroids=8)
    pidx = pq.build_pq_index(small, dim=64, m=1, ksub=64)
    got = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in pq.ivfpq_topk(
            small, q, ann, pidx, k=5, n_probe=8, rerank=20
        ).collect()
    )
    exact = sorted(
        (r.query_id, r.vec_id, r.rank)
        for r in similarity.brute_force_topk(small, q, k=5).collect()
    )
    assert got == exact


def test_ivfpq_partial_probe_recall(spark, sf_dir):
    e, q = _fixtures(spark, sf_dir)
    ann = similarity.build_ann_index(e, dim=64, n_centroids=8)
    pidx = pq.build_pq_index(e, dim=64, m=8, ksub=256)
    approx = pq.ivfpq_topk(e, q, ann, pidx, k=10, n_probe=4, rerank=50).toPandas()
    exact = similarity.brute_force_topk(e, q, k=10).toPandas()
    recalls = []
    for qid in range(5):
        t = set(exact[exact.query_id == qid].vec_id)
        g = set(approx[approx.query_id == qid].vec_id)
        recalls.append(len(t & g) / len(t))
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_ivfpq_rejects_mismatched_indexes(spark, sf_dir):
    e, q = _fixtures(spark, sf_dir)
    ann = similarity.build_ann_index(
        e.select(F.col("vec_id").alias("other_id"), "embedding"),
        dim=64,
        id_col="other_id",
    )
    pidx = pq.build_pq_index(e, dim=64, m=8, ksub=64)
    with pytest.raises(ValueError, match="disagree on id_col"):
        pq.ivfpq_topk(e, q, ann, pidx)


def test_ivfpq_combined_frame_equals_inline_compose(spark, sf_dir):
    # the steady-state inverted file (compose_ivfpq, bucket-partitioned,
    # corpus join paid once) must answer identically to the inline path
    e, q = _fixtures(spark, sf_dir)
    ann = similarity.build_ann_index(e, dim=64, n_centroids=8)
    pidx = pq.build_pq_index(e, dim=64, m=8, ksub=256)
    combined = pq.compose_ivfpq(ann, pidx)
    a = sorted(
        map(tuple, pq.ivfpq_topk(e, q, ann, pidx, k=10, n_probe=4).collect())
    )
    b = sorted(
        map(
            tuple,
            pq.ivfpq_topk(
                e, q, ann, pidx, k=10, n_probe=4, combined=combined
            ).collect(),
        )
    )
    assert a == b

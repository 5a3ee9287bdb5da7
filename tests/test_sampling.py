"""Deterministic sampling/split operator tests: the three properties
df.sample(seed) lacks — run-to-run stability, partition-layout
independence, and engine portability (the last is the hash_split
oracle's job)."""

from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table
from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling


def test_sample_is_deterministic_and_layout_independent(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in sampling.deterministic_sample(d, "doc_id", 0.3).collect()}
    b = {r.doc_id for r in sampling.deterministic_sample(d, "doc_id", 0.3).collect()}
    c = {
        r.doc_id
        for r in sampling.deterministic_sample(d.repartition(7), "doc_id", 0.3).collect()
    }
    assert a == b == c
    assert 0.2 <= len(a) / d.count() <= 0.4


def test_sample_nests_monotonically(spark, sf_dir):
    """A 10% sample must be a subset of the 30% sample under the same
    salt — hash thresholds nest, so growing a sample never resamples."""
    d = load_table(spark, sf_dir, "documents")
    small = {r.doc_id for r in sampling.deterministic_sample(d, "doc_id", 0.1).collect()}
    big = {r.doc_id for r in sampling.deterministic_sample(d, "doc_id", 0.3).collect()}
    assert small <= big


def test_salt_draws_independent_sample(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in sampling.deterministic_sample(d, "doc_id", 0.3, salt="a").collect()}
    b = {r.doc_id for r in sampling.deterministic_sample(d, "doc_id", 0.3, salt="b").collect()}
    assert a != b


def test_split_partitions_every_row_exactly_once(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    s = sampling.hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == d.count()
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_split_is_map_side_only(spark, sf_dir):
    """Assignment itself must not shuffle: the plan before any agg is
    scan -> project (no Exchange)."""
    from data_pipeline_bigquery_to_sftp_server_spark.plans import explain

    d = load_table(spark, sf_dir, "documents")
    s = sampling.hash_split(d, "doc_id", {"train": 0.8, "val": 0.2})
    plan = explain.formatted_plan(s)
    assert "Exchange" not in plan


def test_quota_sample_caps_groups_deterministically(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    kept = sampling.quota_sample(d, ["lang"], "doc_id", 3, salt="q")
    sizes = kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    originals = dict(
        (r.lang, r.n) for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    for r in sizes:
        assert r.n == min(3, originals[r.lang])
    again = {r.doc_id for r in sampling.quota_sample(d, ["lang"], "doc_id", 3, salt="q").collect()}
    assert again == {r.doc_id for r in kept.collect()}


def test_mixture_sample_rates_and_determinism(spark, sf_dir):
    """Rate-1.0 sources keep every row, rate-0 sources behave as ~none,
    unlisted sources drop entirely; assignment is a pure function of
    the id (repartition-invariant)."""
    d = load_table(spark, sf_dir, "documents")
    rates = {"src0": 1.0, "src1": 0.5}
    kept = sampling.mixture_sample(d, rates, salt="m")
    src_counts = {
        r.source: r.n
        for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    full = {
        r.source: r.n
        for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert src_counts["src0"] == full["src0"]  # rate 1.0 keeps all
    assert 0 < src_counts.get("src1", 0) < full["src1"]  # thinned
    assert set(src_counts) <= {"src0", "src1"}  # unlisted sources drop
    again = {
        r.doc_id
        for r in sampling.mixture_sample(d.repartition(7), rates, salt="m").collect()
    }
    assert again == {r.doc_id for r in kept.collect()}


def test_mixture_sample_is_map_side(spark, sf_dir):
    from data_pipeline_bigquery_to_sftp_server_spark.plans import explain

    d = load_table(spark, sf_dir, "documents")
    s = sampling.mixture_sample(d, {"src0": 0.5, "src1": 1.0}, salt="m")
    plan = explain.formatted_plan(s)
    assert "Exchange" not in plan


def test_mixture_sample_rejects_bad_rates(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError, match="non-empty"):
        sampling.mixture_sample(df, {})
    with pytest.raises(ValueError, match="rate for"):
        sampling.mixture_sample(df, {"a": -0.1})


def test_mixture_upsample_multiplicity(spark, sf_dir):
    """Rate 2.5 emits each src0 row 2 or 3 times, totalling ~2.5x the
    source count (hash-granularity tolerance); copy indices are dense
    0..k-1 per doc; a pure-downsampling recipe with copy_col still
    routes through the replication path with the same kept-set as the
    filter path."""
    d = load_table(spark, sf_dir, "documents")
    out = sampling.mixture_sample(
        d, {"src0": 2.5}, salt="up", copy_col="copy_idx"
    )
    per_doc = {
        r.doc_id: r.n
        for r in out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(per_doc.values()) <= {2, 3}
    n_src0 = d.where(F.col("source") == "src0").count()
    total = sum(per_doc.values())
    assert 2.0 * n_src0 <= total <= 3.0 * n_src0
    assert abs(total / n_src0 - 2.5) < 0.35  # hash draw ~Binomial(n, .5)
    # copy indices dense per doc
    idx = out.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy_idx")).alias("ix"),
        F.count("*").alias("n"),
    )
    for r in idx.collect():
        assert r.ix == list(range(r.n))
    # replication path at rate<=1 == filter path kept set
    filt = {
        r.doc_id
        for r in sampling.mixture_sample(d, {"src0": 0.5}, salt="up").collect()
    }
    repl = {
        r.doc_id
        for r in sampling.mixture_sample(
            d, {"src0": 0.5}, salt="up", copy_col="c"
        ).collect()
    }
    assert filt == repl


def test_mixture_upsample_is_map_side(spark, sf_dir):
    from data_pipeline_bigquery_to_sftp_server_spark.plans import explain

    d = load_table(spark, sf_dir, "documents")
    s = sampling.mixture_sample(d, {"src0": 3.25, "src1": 0.5}, salt="m")
    plan = explain.formatted_plan(s)
    assert "Exchange" not in plan


def test_temperature_sample_alpha1_is_natural_sampling(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling

    rows = [(i, "en" if i < 90 else "sw") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.temperature_sample(df, "lang", "doc_id", alpha=1.0, target_rows=50)
    # alpha=1: every group's keep probability collapses to T/N
    ps = {r.lang: r.p_keep for r in out.collect()}
    assert ps["en"] == ps["sw"] == 0.5


def test_temperature_sample_upweights_low_resource_groups(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling

    rows = [(i, "en" if i < 900 else "sw") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sampling.temperature_sample(
        df, "lang", "doc_id", alpha=0.3, target_rows=200
    ).toPandas()
    ps = out.groupby("lang").p_keep.first()
    assert ps["sw"] > ps["en"]  # low-resource boosted
    kept = out.groupby("lang").size()
    # sw share of the kept set far exceeds its 10% natural share
    assert kept["sw"] / kept.sum() > 0.25
    # expected total ~200 (binomial spread)
    assert 150 < kept.sum() < 250


def test_temperature_sample_deterministic_and_salted(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling

    rows = [(i, "en" if i % 3 else "de") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = {r.doc_id for r in sampling.temperature_sample(df, "lang", "doc_id", 0.5, 80, salt="x").collect()}
    b = {r.doc_id for r in sampling.temperature_sample(df, "lang", "doc_id", 0.5, 80, salt="x").collect()}
    c = {r.doc_id for r in sampling.temperature_sample(df, "lang", "doc_id", 0.5, 80, salt="y").collect()}
    assert a == b
    assert a != c


def test_shuffle_shards_is_a_permutation_and_stable(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators import sampling

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = sampling.shuffle_shards(df, "doc_id", n_shards=4, salt="s").toPandas()
    # every row exactly once; positions are 1..n contiguous per shard
    assert len(a) == 500 and a.doc_id.nunique() == 500
    for _, g in a.groupby("shard"):
        assert sorted(g.pos) == list(range(1, len(g) + 1))
    # shards roughly uniform (binomial around 125)
    sizes = a.groupby("shard").size()
    assert len(sizes) == 4 and sizes.min() > 80 and sizes.max() < 170
    # deterministic across runs, different under a new salt
    b = sampling.shuffle_shards(df, "doc_id", n_shards=4, salt="s").toPandas()
    assert a.sort_values("doc_id").reset_index(drop=True).equals(
        b.sort_values("doc_id").reset_index(drop=True)
    )
    c = sampling.shuffle_shards(df, "doc_id", n_shards=4, salt="t").toPandas()
    assert not a.sort_values("doc_id").reset_index(drop=True).equals(
        c.sort_values("doc_id").reset_index(drop=True)
    )
    # shard order and within-shard order are independent hashes: two
    # docs in the same shard are not in id order (shuffled)
    g0 = a[a.shard == a.shard.iloc[0]].sort_values("pos")
    assert list(g0.doc_id) != sorted(g0.doc_id)


def test_curriculum_shards_layout(spark):
    """r8 X45: buckets are equal-population ntile stages; each shard's
    bucket sequence is non-decreasing (easy->hard read order); pos is
    contiguous from 1 per shard; shard assignment ignores difficulty."""
    from pyspark.sql import functions as F

    from data_pipeline_bigquery_to_sftp_server_spark.operators.sampling import (
        curriculum_shards,
    )

    rows = [(i, float((i * 37) % 101)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, score double")
    out = curriculum_shards(df, "score", "doc_id", n_buckets=3, n_shards=4).collect()
    assert len(out) == 120
    by_bucket = {}
    by_shard = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r.doc_id)
        by_shard.setdefault(r.shard, []).append((r.pos, r.bucket))
    assert sorted(len(v) for v in by_bucket.values()) == [40, 40, 40]
    for shard, seq in by_shard.items():
        seq.sort()
        assert [p for p, _ in seq] == list(range(1, len(seq) + 1))
        buckets = [b for _, b in seq]
        assert buckets == sorted(buckets)  # curriculum order within shard
    # ntile ground truth: the 40 smallest scores are bucket 1
    ranked = sorted(rows, key=lambda t: (t[1], t[0]))
    easy = {i for i, _ in ranked[:40]}
    assert set(by_bucket[1]) == easy


def test_weighted_sample_wor_is_deterministic_and_replacement_free(spark, sf_dir):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sampling import weighted_sample_wor
    from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents")
    s1 = weighted_sample_wor(d, "doc_id", "n_chars", n=10, group_col="source")
    s2 = weighted_sample_wor(
        d.repartition(7), "doc_id", "n_chars", n=10, group_col="source"
    )
    r1 = sorted((r.source, r.doc_id, r.sample_rank) for r in s1.collect())
    r2 = sorted((r.source, r.doc_id, r.sample_rank) for r in s2.collect())
    assert r1 == r2, "sample must be a pure function of (id, salt)"
    ids = [r[1] for r in r1]
    assert len(ids) == len(set(ids)), "without replacement: no id twice"
    per_group = {}
    for src, _, _ in r1:
        per_group[src] = per_group.get(src, 0) + 1
    assert all(v == 10 for v in per_group.values())


def test_weighted_sample_wor_biases_toward_heavy_weights(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sampling import weighted_sample_wor

    # 100 heavy rows (w=100) among 900 light rows (w=1): a weighted
    # race must select mostly heavy rows in a 100-row sample (expected
    # heavy share ~0.9+; deterministic given the salt, so assert a
    # comfortable floor rather than a distribution).
    rows = [(i, 100 if i < 100 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, w int")
    got = weighted_sample_wor(df, "id", "w", n=100)
    heavy = sum(1 for r in got.collect() if r.id < 100)
    assert heavy > 60


def test_weighted_sample_wor_drops_nonpositive_weights(spark):
    from data_pipeline_bigquery_to_sftp_server_spark.operators.sampling import weighted_sample_wor

    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10), (4, 1)], "id long, w int"
    )
    got = {r.id for r in weighted_sample_wor(df, "id", "w", n=10).collect()}
    assert got == {3, 4}

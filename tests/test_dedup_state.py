"""Persisted-corpus-state incremental dedup (X20 state API): parity
with the one-shot report, absorb semantics, save/load round-trip."""

import pandas as pd
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.catalog import load_table
from data_pipeline_bigquery_to_sftp_server_spark.operators import dedup
from data_pipeline_bigquery_to_sftp_server_spark.operators.dedup_state import (
    absorb_batch,
    build_dedup_state,
    load_dedup_state,
    save_dedup_state,
    screen_against_state,
)


def _canon(df):
    pdf = df.toPandas().reindex(
        ["doc_id", "exact_dup", "n_near_dups", "best_match_id", "best_jaccard"],
        axis=1,
    )
    return pdf.sort_values("doc_id").reset_index(drop=True)


def test_stateful_screen_matches_one_shot_report(spark, sf_dir):
    """The hash-order prefix filter is complete, so the stateful
    screen must be BIT-IDENTICAL to the df-ordered one-shot path."""
    d = load_table(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    one_shot = _canon(dedup.incremental_dedup_report(new, corpus, "doc_id", "text"))
    state = build_dedup_state(corpus, "doc_id", "text")
    stateful = _canon(screen_against_state(new, state))
    pd.testing.assert_frame_equal(one_shot, stateful)


def test_absorb_then_rescreen_marks_exact_dups(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "one two three four")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "totally novel content here"), (11, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    state = build_dedup_state(corpus, "doc_id", "text")
    first = {r.doc_id: r.exact_dup for r in screen_against_state(batch, state).collect()}
    assert first == {10: False, 11: True}
    # absorb the accepted (non-dup) row; an identical later arrival is
    # then an exact dup, without any corpus-side recompute
    state2 = absorb_batch(state, batch.where(F.col("doc_id") == 10))
    again = spark.createDataFrame(
        [(20, "totally novel content here")], "doc_id long, text string"
    )
    out = screen_against_state(again, state2).collect()[0]
    assert out.exact_dup is True
    assert out.best_match_id == 10 and out.best_jaccard == 1.0


def test_save_load_roundtrip(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents").limit(120)
    new = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    state = build_dedup_state(corpus, "doc_id", "text")
    path = str(tmp_path / "state")
    save_dedup_state(state, path)
    loaded = load_dedup_state(spark, path)
    assert (loaded.ngram, loaded.threshold) == (state.ngram, state.threshold)
    pd.testing.assert_frame_equal(
        _canon(screen_against_state(new, state)),
        _canon(screen_against_state(new, loaded)),
    )


def test_exact_screen_stream_matches_batch_twin(spark, sf_dir):
    """The streaming exact screen (stream-static left outer join
    against the state's distributed fingerprint frame) must emit, once
    drained, exactly the batch screen's (doc_id, exact_dup) column —
    including exact_dup=True rows for corpus-duplicated content."""
    import uuid

    from data_pipeline_bigquery_to_sftp_server_spark.operators.dedup_state import (
        exact_screen_stream,
    )
    from data_pipeline_bigquery_to_sftp_server_spark.streaming import windows as W

    d = load_table(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    state = build_dedup_state(corpus, "doc_id", "text")
    batch = (
        screen_against_state(new, state)
        .select("doc_id", "exact_dup")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    from data_pipeline_bigquery_to_sftp_server_spark.queries import _events_stream_src

    path, schema = _events_stream_src(spark, sf_dir, table="documents")
    stream = W.read_events_stream(
        spark, path, schema, max_files_per_trigger=4
    ).where(F.col("doc_id") % 10 == 0)
    name = f"t_incdedup_{uuid.uuid4().hex[:8]}"
    q = W.run_to_memory(exact_screen_stream(stream, state), name, output_mode="append")
    q.stop()
    streamed = (
        spark.table(name).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(batch, streamed)
    assert bool(streamed["exact_dup"].any()) == bool(batch["exact_dup"].any())


def test_bloom_tier_fold_equals_rebuild_and_roundtrips(spark, sf_dir, tmp_path):
    """r8: absorb's OR-fold must be byte-identical to rebuilding the
    bitmap over corpus+accepted (bit positions are pure value
    functions), the bitmap must survive save/load, and the
    bloom-prefiltered screen must equal the bloom-less screen."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.bloom import build_bloom
    from data_pipeline_bigquery_to_sftp_server_spark.operators.dedup import (
        normalize_text,
    )

    d = load_table(spark, sf_dir, "documents")
    new = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    state = build_dedup_state(corpus, "doc_id", "text")
    assert state.bloom is not None and len(state.bloom) == (1 << 20) // 8

    # screen parity: the prefilter may only shrink the exact probe side
    no_bloom = build_dedup_state(corpus, "doc_id", "text", with_bloom=False)
    assert no_bloom.bloom is None
    a = _canon(screen_against_state(new, state))
    b = _canon(screen_against_state(new, no_bloom))
    pd.testing.assert_frame_equal(a, b)

    # OR-fold == rebuild over the grown corpus
    accepted = new.where(F.col("doc_id") % 20 == 0)
    state2 = absorb_batch(state, accepted)
    rebuilt = build_bloom(
        corpus.unionByName(accepted), normalize_text(F.col("text")), num_bits=1 << 20
    )
    assert state2.bloom == rebuilt

    # save/load carries the bitmap + its params
    path = str(tmp_path / "state_bloom")
    save_dedup_state(state2, path)
    loaded = load_dedup_state(spark, path)
    assert loaded.bloom == state2.bloom
    assert loaded.bloom_num_hashes == state2.bloom_num_hashes
    assert loaded.bloom_seed == state2.bloom_seed

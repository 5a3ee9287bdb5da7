"""Grid-bucketed fixed-radius distance join — operators/spatial.py."""

import pytest

from data_pipeline_bigquery_to_sftp_server_spark.operators.spatial import (
    grid_distance_join,
)


def _pairs(df):
    return {(r["id_a"], r["id_b"], r["dist2"]) for r in df.collect()}


def test_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    pts = [(i, rng.randrange(0, 300), rng.randrange(0, 300)) for i in range(60)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = _pairs(grid_distance_join(df, max_dist=40))
    want = {
        (a[0], b[0], (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2)
        for a in pts
        for b in pts
        if a[0] < b[0]
        and (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= 1600
    }
    assert got == want


def test_each_pair_exactly_once_across_cells(spark):
    # two points straddling a cell boundary: found once, not twice
    df = spark.createDataFrame(
        [(1, 49, 0), (2, 51, 0)], "id long, x long, y long"
    )
    out = grid_distance_join(df, max_dist=50).collect()
    assert len(out) == 1
    assert (out[0]["id_a"], out[0]["id_b"], out[0]["dist2"]) == (1, 2, 4)


def test_boundary_inclusive(spark):
    df = spark.createDataFrame(
        [(1, 0, 0), (2, 50, 0), (3, 51, 0)], "id long, x long, y long"
    )
    got = _pairs(grid_distance_join(df, max_dist=50))
    assert (1, 2, 2500) in got          # exactly d: included
    assert all(p[:2] != (1, 3) for p in got)  # 51 > d: excluded
    assert (2, 3, 1) in got


def test_cell_below_max_dist_raises(spark):
    df = spark.createDataFrame([(1, 0, 0)], "id long, x long, y long")
    with pytest.raises(ValueError, match="adjacent-cell guarantee"):
        grid_distance_join(df, max_dist=50, cell=10)

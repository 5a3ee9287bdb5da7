"""Distributed k-means over embedding columns — the iterative-ML
pattern on DataFrames, and the clustering stage SemDeDup (Abbas et
al. 2023) runs before within-cluster dedup.

Why not reuse ivf_topk's quantizer: that k-means trains driver-side on
a bounded SAMPLE (a coarse quantizer only needs rough shapes). This
module is the full corpus-scale fit: every iteration assigns ALL rows
and updates centroids from ALL rows — the shape you need when cluster
assignments themselves are the product (SemDeDup partitions, corpus
maps, diversity sampling strata).

Per-iteration plan (Lloyd):
- ASSIGN: centroids ride the task closure (k x dim floats, KBs);
  one Arrow-batched pandas_udf computes argmin distances per batch —
  no shuffle, no join.
- UPDATE: the assigned frame posexplodes its vector to
  (cluster, dim_idx, value) and one groupBy(cluster, dim_idx)
  aggregation produces per-dimension sums + counts. Partial (map-side)
  aggregation collapses each partition to at most k*dim rows before
  the exchange, so the shuffle carries k * dim * n_partitions rows —
  independent of corpus size. The k*dim result is collected (tiny by
  construction) and divided driver-side into new centroids.

So each iteration is one scan + one bounded shuffle; n_iter iterations
= n_iter Spark jobs, the standard iterative-algorithm cost model
(same discipline as dedup.py's connected-components rounds). The
input frame is persisted once (tracked) since every iteration rescans
it.

Determinism: init picks the k hash-smallest ids (TakeOrdered — one
scan, no full sort), and per-batch/partition float summation order can
vary, so exact centroid bits are NOT guaranteed reproducible across
partitionings — assignments are, for any corpus whose cluster margins
exceed float noise (the usual k-means caveat; pinned against a numpy
reference on separated data in tests). Empty clusters reseed from the
hash-ordered sample, deterministically.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked
from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
    ensure_parallelism,
)


def _assign_col(vec_col: str, centers):
    """pandas_udf: nearest-centroid index per row (Euclidean argmin,
    one matmul per Arrow batch). centers rides the closure."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centers, dtype=np.float64)
    cn2 = (C * C).sum(axis=1)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.asarray(vecs.to_list(), dtype=np.float64)
        d2 = (M * M).sum(axis=1)[:, None] - 2.0 * (M @ C.T) + cn2[None, :]
        return pd.Series(d2.argmin(axis=1).astype("int32"))

    return assign(F.col(vec_col).cast("array<double>"))


def auto_kmeans_k(n_rows: int, target_cluster_rows: int = 4096, min_k: int = 2) -> int:
    """Derive k from the corpus size so expected cluster populations
    stay batch-shaped — the clustering mirror of
    ``similarity.auto_srp_num_planes`` (the r6 width-vs-log-n law):
    SemDeDup's within-cluster search is quadratic in cluster size, so
    the cost-vs-recall dial must GROW with the corpus, not sit at a
    manual constant. ``k = ceil(n / target_cluster_rows)`` holds the
    mean cluster at ``target_cluster_rows`` (default 4096 — half the
    ``within_cluster_pairs`` ceiling, leaving 2x headroom for the skew
    a mean hides)."""
    import math

    return max(min_k, math.ceil(n_rows / max(1, int(target_cluster_rows))))


def kmeans_assign(
    df: DataFrame,
    k: int | str = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    target_cluster_rows: int = 4096,
):
    """Full-corpus distributed Lloyd k-means. Returns
    ``(assigned_df, centers)``: the input with an int ``cluster``
    column (lazy — assignment under the FINAL centroids), and the
    final centroids as a plain nested list (k x dim, driver-side by
    design: centroids are the bounded model artifact, like nb.py's
    collected model). ``k="auto"`` derives k from a corpus count via
    :func:`auto_kmeans_k` (one count job against the already-persisted
    base), so cluster sizes stay batch-shaped as the corpus grows."""
    import numpy as np

    base = persist_tracked(
        ensure_parallelism(df.select(id_col, vec_col))
    )
    if k == "auto":
        k = auto_kmeans_k(base.count(), target_cluster_rows)
    k = int(k)
    # deterministic init: the k hash-smallest rows (TakeOrdered scan)
    init_rows = (
        base.orderBy(F.xxhash64(F.col(id_col), F.lit(seed)))
        .limit(int(k))
        .select(vec_col)
        .collect()
    )
    if len(init_rows) < k:
        raise ValueError(f"kmeans_assign: corpus has fewer rows than k={k}")
    centers = np.asarray([r[0] for r in init_rows], dtype=np.float64)
    reseed = centers.copy()  # deterministic replacements for empty clusters

    for _ in range(int(n_iter)):
        assigned = base.withColumn("_c", _assign_col(vec_col, centers))
        # UPDATE: k*dim aggregation rows after map-side partial agg
        upd = (
            assigned.select("_c", F.posexplode(F.col(vec_col).cast("array<double>")))
            .groupBy("_c", "pos")
            .agg(F.sum("col").alias("_s"), F.count("*").alias("_n"))
            .collect()
        )
        # ragged-input guard (free: checks the collected k*dim rows, no
        # extra job): a short/long vector shows up as a per-cluster pos
        # set that isn't exactly {0..dim-1} with one uniform count —
        # without this, last-write-wins on counts[cluster] would yield
        # silently wrong centroids instead of raising.
        dim = centers.shape[1]
        seen: dict[int, dict[int, int]] = {}
        for r in upd:
            seen.setdefault(r["_c"], {})[r["pos"]] = r["_n"]
        for c, pos_counts in seen.items():
            if sorted(pos_counts) != list(range(dim)) or len(set(pos_counts.values())) != 1:
                raise ValueError(
                    f"kmeans_assign: ragged embedding vectors detected in "
                    f"cluster {c} (positions/counts inconsistent with "
                    f"dim={dim}) — all vectors must share one dimension."
                )
        sums = np.zeros_like(centers)
        counts = np.zeros(k)
        for r in upd:
            sums[r["_c"], r["pos"]] = r["_s"]
            counts[r["_c"]] = r["_n"]
        new_centers = reseed.copy()
        nz = counts > 0
        new_centers[nz] = sums[nz] / counts[nz][:, None]
        centers = new_centers

    out = df.join(
        base.withColumn("cluster", _assign_col(vec_col, centers)).select(
            id_col, "cluster"
        ),
        id_col,
    )
    return out, [list(map(float, c)) for c in centers]


def cluster_profile(assigned: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-cluster summary of a kmeans_assign result: size and mean
    within-cluster vector norm — the corpus-map report. One grouped
    aggregation (map-side combinable)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.similarity import l2_norm

    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg(l2_norm(F.col(vec_col).cast("array<double>"))), 4).alias(
                "avg_norm"
            ),
        )
        .orderBy("cluster")
    )


def multi_probe_assign(
    df: DataFrame,
    centers,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its ``n_probe`` NEAREST centroids (the
    standard IVF multi-probe trick) — one row per (vector, probed
    cluster). Running the within-cluster pair search over this frame
    instead of the single-assignment one recovers cross-cluster
    BOUNDARY pairs that single-probe SemDeDup trades away: two near-dup
    vectors straddling a centroid boundary still share their 2nd-
    nearest cluster. Cost: the pair-search input grows n_probe-fold
    (each cluster sees its members plus its boundary shell); pairs
    found in several shared clusters are identical rows — callers
    dropDuplicates([id_a, id_b]). Map-side only (same closure-broadcast
    Arrow pass as assignment, one explode, no shuffle here)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centers, dtype=np.float64)
    if not 1 <= int(n_probe) <= len(C):
        raise ValueError(f"multi_probe_assign: n_probe must be in [1, k={len(C)}]")
    n_probe = int(n_probe)
    cn2 = (C * C).sum(axis=1)

    @pandas_udf("array<int>")
    def probes(vecs: pd.Series) -> pd.Series:
        M = np.asarray(vecs.to_list(), dtype=np.float64)
        d2 = (M * M).sum(axis=1)[:, None] - 2.0 * (M @ C.T) + cn2[None, :]
        idx = np.argsort(d2, axis=1)[:, :n_probe].astype("int32")
        return pd.Series(list(idx))

    return (
        df.withColumn("_cl", probes(F.col(vec_col).cast("array<double>")))
        .withColumn("cluster", F.explode("_cl"))
        .drop("_cl")
    )


def within_cluster_pairs(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    max_cluster_rows: int | None = 8192,
    metric: str = "cos",
) -> DataFrame:
    """All exact cosine pairs (id_a < id_b, cos >= threshold) whose
    BOTH ends share a k-means cluster — the published SemDeDup shape
    (Abbas et al. 2023 §3: cluster the corpus, then search duplicates
    only within clusters), which turns the quadratic all-pairs search
    into k independent quadratic-in-cluster-size searches with no
    driver-side matrix at all.

    One shuffle on the cluster key, then a per-cluster BLAS block
    inside ``applyInPandas`` (normalize, one matmul, upper triangle by
    id). Cross-cluster near-dups are missed by construction — the
    recall/cost dial is k (more clusters = cheaper, lower recall),
    pinned against the global exact path in test_clustering;
    :func:`multi_probe_assign` recovers boundary pairs.

    ``metric="dist"`` switches the in-cluster test to EUCLIDEAN
    distance <= threshold on the vectors AS GIVEN (no normalization;
    the score column holds the distance). This is the candidate gate
    for reduced-space screening: an orthogonal projection of
    (translated) unit-normalized vectors is contractive, so
    d_reduced <= d_full and a gate at d_full's bound loses NO recall
    beyond the clustering itself (see q_semantic_dedup_pca).

    A pathological jumbo cluster re-introduces the quadratic term AND
    materializes whole in one pandas task, so ``max_cluster_rows``
    (default 8192 — a ~0.5 GB transient sims matrix) is ENFORCED by a
    cheap ``groupBy(cluster).count()`` pre-pass that raises BEFORE any
    group is materialized (the similarity.py exact_near_dup_pairs_np
    count-first discipline). The fix for a violation is raising k —
    pass ``k="auto"`` to :func:`kmeans_assign` — not raising the
    ceiling. ``max_cluster_rows=None`` disables the pre-pass (one
    extra assignment scan) for callers that already hold a size bound.
    """
    import numpy as np

    if max_cluster_rows is not None:
        jumbo = (
            assigned.groupBy(cluster_col)
            .count()
            .where(F.col("count") > int(max_cluster_rows))
            .orderBy(F.desc("count"))
            .take(1)
        )
        if jumbo:
            raise ValueError(
                f"within_cluster_pairs: cluster {jumbo[0][cluster_col]} has "
                f"{jumbo[0]['count']} rows > max_cluster_rows="
                f"{max_cluster_rows} — one applyInPandas task would "
                "materialize it whole and the in-cluster search is "
                "quadratic. Raise k (kmeans_assign(k='auto') derives a "
                "batch-shaped k from the corpus count) or raise the "
                "ceiling explicitly if the memory budget allows."
            )

    if metric not in ("cos", "dist"):
        raise ValueError(f"within_cluster_pairs: unknown metric {metric!r}")
    id_t = assigned.schema[id_col].dataType.simpleString()
    score_col = "cos_sim" if metric == "cos" else "dist"
    out_schema = f"id_a {id_t}, id_b {id_t}, {score_col} double"

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], score_col: []})
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.vstack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        if metric == "cos":
            n = np.linalg.norm(mat, axis=1)
            n[n == 0] = np.nan
            mat = mat / n[:, None]
            score = mat @ mat.T
            keep = score >= threshold
        else:
            sq = (mat * mat).sum(axis=1)
            d2 = sq[:, None] + sq[None, :] - 2.0 * (mat @ mat.T)
            score = np.sqrt(np.maximum(d2, 0.0))
            keep = score <= threshold
        keep &= ids[:, None] < ids[None, :]
        ai, bi = np.nonzero(keep)
        return pd.DataFrame(
            {
                "id_a": ids[ai],
                "id_b": ids[bi],
                score_col: np.round(score[ai, bi], 4),
            }
        )

    return (
        assigned.select(cluster_col, id_col, vec_col)
        .groupBy(cluster_col)
        .applyInPandas(pairs, out_schema)
    )

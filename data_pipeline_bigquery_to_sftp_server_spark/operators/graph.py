"""Graph ranking over an edge DataFrame — the crawl-graph importance
signal corpus curation weights documents by (Common Crawl publishes
harmonic-centrality/PageRank host ranks; pipelines join them as a
quality prior).

:func:`pagerank` is fixed-iteration power iteration with damping and
dangling-mass redistribution:

    r_{t+1}(v) = (1-d)/N + d * [ sum_{u->v} r_t(u)/outdeg(u) + DM_t/N ]

where DM_t is the total rank sitting on dangling nodes (no out-edges)
— redistributed uniformly, the standard stochastic-matrix completion.

Engine-portable determinism: distributed float SUMS are order-
sensitive (~1 ulp), so every iteration's ranks round to ``round_dp``
(default 9) decimal places before feeding the next — both engines
then iterate on IDENTICAL inputs and the unrolled-CTE DuckDB oracle
replays the ranks bit-for-bit at the output rounding (6dp). Same
round-before-reuse rule the NB scorer applies before its argmax.

Scale shape per iteration: one (src-keyed) contribution join against
the vertex-sized rank frame + one dst-keyed sum — two bounded
shuffles; the rank frame is persisted per round (tracked) so lineage
does not grow with iteration count (the dedup.py connected-components
discipline). The dangling mass is a one-row aggregate that rides a
crossJoin(broadcast(...)), not a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.cache import (
    CheckpointChain,
    persist_tracked,
)


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 5,
    damping: float = 0.85,
    round_dp: int = 9,
) -> DataFrame:
    """Fixed-iteration PageRank over ``edges``. Returns
    ``(node, rank)`` with rank rounded to 6dp, over the vertex set
    = union of sources and destinations. Deterministic and
    oracle-replayable (see module docstring)."""
    d = float(damping)
    verts = persist_tracked(
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    outdeg = persist_tracked(
        edges.groupBy(F.col(src).alias("node")).agg(F.count("*").alias("_deg"))
    )
    # N is a bounded driver scalar (one count job over the persisted
    # vertex frame) — the literal both engines share.
    n = verts.count()
    if n == 0:
        raise ValueError("pagerank: edge frame is empty (no vertices)")
    e = persist_tracked(
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    )
    ranks = verts.withColumn("rank", F.round(F.lit(1.0 / n), round_dp))
    chain = CheckpointChain()
    for _ in range(int(n_iter)):
        r = ranks.join(outdeg, "node", "left")
        # dangling mass: total rank on nodes with no out-edges
        dm = r.where(F.col("_deg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")
        )
        contribs = (
            e.join(
                r.where(F.col("_deg").isNotNull()).select(
                    F.col("node").alias("_src"),
                    (F.col("rank") / F.col("_deg")).alias("_share"),
                ),
                "_src",
            )
            .groupBy(F.col("_dst").alias("node"))
            .agg(F.sum("_share").alias("_in"))
        )
        # Checkpoint chain, not persist: each round reads the previous
        # ranks TWICE (dangling-mass agg + contribution join), so the
        # LOGICAL plan doubles per round — persist caches execution but
        # the driver still analyzes a 2^n_iter tree (the lineage trap
        # connected_components already guards against; measured on the
        # BPE trainer, r9 SCALING note). Rank state is vertex-sized, so
        # truncation is cheap at any scale, and the chain releases the
        # previous round's checkpoint blocks once the new round is
        # materialized — long sessions stay bounded (r9 advice). Use
        # connected_components' reliable checkpoint_dir mode as the
        # pattern if executor loss mid-run must be survivable.
        ranks = chain.step(
            verts.join(contribs, "node", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "node",
                F.round(
                    F.lit((1.0 - d) / n)
                    + F.lit(d)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_dm") / n),
                    round_dp,
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))

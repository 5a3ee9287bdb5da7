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


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-vertex triangle participation over the UNDIRECTED simple
    graph of ``edges`` (direction/duplicates/self-loops dropped):
    returns ``(node, n_triangles)`` for every vertex of the undirected
    edge set, zero-participation vertices included.

    Algorithm (the standard scalable one — Schank/Wagner degree
    orientation, what Cohen's MapReduce formulation and GraphX both
    use): orient every undirected edge from its (degree, id)-smaller
    endpoint to its larger one. The orientation is acyclic and every
    triangle then has EXACTLY ONE vertex with two out-edges, so

      wedges  = oriented ⋈ oriented on the common tail (v < w by the
                orientation order — each wedge once);
      closers = wedges ⋈ oriented (v, w) — each triangle found once.

    Why the orientation matters at 100 TB: wedge count under degree
    orientation is sum(outdeg²) with outdeg <= O(sqrt(edges)) per
    vertex — a star graph's hub (degree n) generates ZERO wedges
    because all its edges orient INTO it; the naive common-neighbor
    join would generate n² wedges from that hub. This is the skew
    guard, structural rather than salted. Each stage is an equi-join
    shuffling on vertex keys; nothing is ever collected.

    Engine parity: set semantics throughout (distinct canonical edges,
    exact integer counts) — DuckDB replays the identical orientation
    and joins row-for-row."""
    a, b = F.col(src), F.col(dst)
    und = (
        edges.where(a != b)
        .select(
            F.least(a, b).alias("_lo"), F.greatest(a, b).alias("_hi")
        )
        .distinct()
    )
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

    und = persist_tracked(und)
    deg = (
        und.select(F.col("_lo").alias("node"))
        .unionByName(und.select(F.col("_hi").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("_deg"))
    )
    dl = deg.select(F.col("node").alias("_lo"), F.col("_deg").alias("_dlo"))
    dh = deg.select(F.col("node").alias("_hi"), F.col("_deg").alias("_dhi"))
    # orient by (degree, id): tail = the smaller endpoint in that order
    oriented = persist_tracked(
        und.join(dl, "_lo")
        .join(dh, "_hi")
        .select(
            F.when(
                (F.col("_dlo") < F.col("_dhi"))
                | ((F.col("_dlo") == F.col("_dhi")) & (F.col("_lo") < F.col("_hi"))),
                F.struct(F.col("_lo").alias("t"), F.col("_hi").alias("h")),
            )
            .otherwise(
                F.struct(F.col("_hi").alias("t"), F.col("_lo").alias("h"))
            )
            .alias("_e")
        )
        .select(F.col("_e.t").alias("t"), F.col("_e.h").alias("h"))
    )
    x, y = oriented.alias("x"), oriented.alias("y")
    # wedge heads ordered by the SAME (deg, id) orientation order: the
    # closing edge, if present, is oriented v -> w exactly when v
    # precedes w — so one (v, w) probe per wedge suffices
    dv = deg.select(F.col("node").alias("_v"), F.col("_deg").alias("_dv"))
    dw = deg.select(F.col("node").alias("_w"), F.col("_deg").alias("_dw"))
    wedges = (
        x.join(y, F.col("x.t") == F.col("y.t"))
        .select(
            F.col("x.t").alias("u"),
            F.col("x.h").alias("_v"),
            F.col("y.h").alias("_w"),
        )
        .join(dv, "_v")
        .join(dw, "_w")
        .where(
            (F.col("_dv") < F.col("_dw"))
            | ((F.col("_dv") == F.col("_dw")) & (F.col("_v") < F.col("_w")))
        )
        .select("u", F.col("_v").alias("v"), F.col("_w").alias("w"))
    )
    tris = wedges.join(
        oriented,
        (wedges.v == oriented.t) & (wedges.w == oriented.h),
        "left_semi",
    )
    per_vertex = (
        tris.select(F.explode(F.array("u", "v", "w")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
    verts = deg.select("node")
    return verts.join(per_vertex, "node", "left").select(
        "node",
        F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
    )


def bfs_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    node: str = "node",
) -> DataFrame:
    """Breadth-first reachability: every node reachable from ``seeds``
    within ``max_hops`` directed edge traversals, with its exact BFS
    distance ``min_hops`` — the recursive-CTE query class (Spark has no
    WITH RECURSIVE; the DuckDB oracle replays this with one).

    Frontier algorithm, one round per hop:
        frontier_{h} = distinct(frontier_{h-1} ⋈ edges) ∖ visited
        visited      = visited ∪ frontier_{h}
    The anti-join against ``visited`` keeps every round's work
    proportional to the NEW layer, not the whole reachable set, and
    guarantees ``min_hops`` is the first (= minimum) hop at which a
    node appears.  Each round is two key-shuffles (join + distinct);
    the early exit fires when a layer comes back empty, so dense
    graphs stop as soon as they saturate.

    Lineage discipline: both the frontier and the accumulated visited
    set are eagerly localCheckpointed per round through TWO
    CheckpointChains — the frontier is materialized FIRST (the
    cache.py contract: a frame derived from generation k-1 must be
    checkpointed before the chain releases k-1), so the driver plan
    stays constant-size at any hop count and at most two generations
    of blocks are ever held per chain.
    """
    from data_pipeline_bigquery_to_sftp_server_spark.cache import CheckpointChain

    visited_chain = CheckpointChain()
    frontier_chain = CheckpointChain()
    start = seeds.select(F.col(node)).distinct().select(
        node, F.lit(0).cast("int").alias("min_hops")
    )
    visited = visited_chain.step(start)
    frontier = visited
    # every round joins the same edge set — materialize it once (the
    # pagerank verts/outdeg discipline) instead of re-running the
    # upstream scan/distinct per hop
    e = persist_tracked(
        edges.select(F.col(src).alias("_src"), F.col(dst).alias("_dst"))
    )
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(e, frontier[node] == e["_src"])
            .select(F.col("_dst").alias(node))
            .distinct()
            .join(visited.select(node), node, "left_anti")
            .select(node, F.lit(hop).cast("int").alias("min_hops"))
        )
        # materialize the new layer BEFORE the visited chain releases
        # the generation it was computed from
        nxt = frontier_chain.step(nxt)
        if nxt.rdd.isEmpty():
            break
        visited = visited_chain.step(visited.unionByName(nxt))
        frontier = nxt
    return visited


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    node: str = "node",
) -> DataFrame:
    """Hop-bounded single-source(-set) shortest paths over integer
    edge weights — Bellman-Ford relaxation, the weighted upgrade of
    :func:`bfs_reachability`: after round k, ``min_dist`` is EXACTLY
    the cheapest path using at most k edges (the textbook invariant),
    so the hop bound is a semantic contract the recursive-CTE oracle
    can replay, not a convergence heuristic.

    Per round: one (src-keyed) join of the current distance frame
    against the edges + one dst-keyed min-aggregation — two bounded
    shuffles, distance frame is vertex-sized.  Rounds ride ONE
    CheckpointChain (the new frame is materialized by step() before
    the previous round's blocks are released — nothing else reads the
    old frame; the fixpoint probe deliberately compares scalar
    (count, sum) stats across rounds instead of joining back to the
    released frame).  Early exit when a round improves nothing:
    sound, because relaxation is MONOTONE — per node the distance
    only ever decreases and nodes are only ever added, so the
    (count, sum-of-distances) pair changes iff ANY node changed, and
    a fixpoint at round k < max_hops already equals every later
    round.  Integer weights keep distances exact longs on every
    engine."""
    from data_pipeline_bigquery_to_sftp_server_spark.cache import CheckpointChain

    chain = CheckpointChain()
    dist = chain.step(
        seeds.select(F.col(node)).distinct().select(
            node, F.lit(0).cast("long").alias("min_dist")
        )
    )
    # materialize the weighted edge set once across relaxation rounds
    e = persist_tracked(
        edges.select(
            F.col(src).alias("_src"),
            F.col(dst).alias("_dst"),
            F.col(weight).cast("long").alias("_w"),
        )
    )
    stats = dist.agg(
        F.count(F.lit(1)).alias("c"), F.sum("min_dist").alias("s")
    ).first()
    prev = (stats["c"], stats["s"])
    for _ in range(max_hops):
        cands = dist.join(e, dist[node] == e["_src"]).select(
            F.col("_dst").alias(node),
            (F.col("min_dist") + F.col("_w")).alias("min_dist"),
        )
        dist = chain.step(
            dist.unionByName(cands)
            .groupBy(node)
            .agg(F.min("min_dist").alias("min_dist"))
        )
        stats = dist.agg(
            F.count(F.lit(1)).alias("c"), F.sum("min_dist").alias("s")
        ).first()
        cur = (stats["c"], stats["s"])
        if cur == prev:
            break
        prev = cur
    return dist

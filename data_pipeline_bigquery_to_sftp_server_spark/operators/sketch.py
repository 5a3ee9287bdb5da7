"""Sketch-based heavy hitters: approximate-then-verify frequent items.

A plain ``groupBy(token).count()`` already gets map-side partial
aggregation from Catalyst, but its shuffle carries one row per DISTINCT
token per partition — when token cardinality is huge (URLs, n-grams,
user ids at 100 TB), that per-partition distinct set is itself the
bottleneck. The sketch path bounds it:

- **Pass 1 (no token shuffle):** each Arrow batch keeps only the tokens
  whose in-batch frequency exceeds ``len(batch) / capacity`` — a fully
  vectorized ``value_counts`` threshold (numpy-speed; no per-token
  Python loop). Recall guarantee by averaging: any token with global
  frequency > N/capacity exceeds n_b/capacity in at least one batch, so
  it clears that batch's threshold and reaches the candidate set. At
  most ``capacity - 1`` tokens can clear the threshold in one batch
  (m tokens each > n_b/capacity sum past n_b otherwise), so candidate
  width is bounded exactly like a capacity-counter summary. Memory
  note: only the EMITTED candidate width is capacity-bounded; the
  transient ``value_counts`` table is O(distinct tokens per Arrow
  batch), i.e. bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (default 10k rows),
  not by ``capacity`` — the trade for replacing the per-token
  Misra-Gries Python loop with a vectorized pass. Shrink the Arrow
  batch size if per-batch distinct sets ever matter. Each batch also
  emits one sentinel row carrying its row count, so the corpus token
  total N is known without a second corpus scan.
- **Pass 2 (exact verify):** token occurrences are counted exactly but
  only for the (broadcast) candidate set, so the shuffle carries
  candidates only. Output counts are EXACT — the sketch only bounds
  which tokens can reach the final top-k.

The result equals exact top-k whenever the k-th item's true frequency
exceeds N/capacity. With ``check_exact=True`` (default) that bound is
enforced AT EXECUTION TIME via ``assert_true`` over (f_k, N) — both
already in the plan: f_k is a window-min over the k result rows, N is
the sentinel-row sum — so a mis-sized ``capacity`` fails loudly on
oracle-less production data instead of silently dropping a heavy
hitter.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
    ensure_parallelism,
)


def _batch_candidates(capacity: int):
    """Vectorized per-batch frequent-items summary: candidate tokens
    (in-batch freq > n_b/capacity) plus one (NULL, n_b) sentinel row."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_b = len(pdf)
            if n_b == 0:
                continue
            vc = pdf["token"].value_counts()
            cands = vc.index[vc.to_numpy() > n_b / capacity]
            yield pd.DataFrame(
                {
                    "token": list(cands) + [None],
                    "n_batch": pd.array(
                        [None] * len(cands) + [n_b], dtype="Int64"
                    ),
                }
            )

    return summarize


def heavy_hitters(
    df: DataFrame,
    token_col: Column,
    k: int = 20,
    capacity: int = 256,
    check_exact: bool = True,
) -> DataFrame:
    """Top-k most frequent tokens of ``token_col`` (an array<string>
    expression, e.g. ``text.tokenize(col)``) with EXACT counts, via the
    two-pass sketch-then-verify plan above. Returns (token, n) ordered
    by (n desc, token), k rows.

    Exact-equality condition: true frequency of the k-th item > N /
    capacity. ``check_exact=True`` asserts this inside the plan (fails
    the job with a diagnostic message when violated); size ``capacity``
    >= N / f_k and oversize when unsure — the cost is candidate-set
    width, tiny next to the corpus. Pass ``check_exact=False`` only
    when a possibly-incomplete tail is acceptable (counts stay exact
    for every returned token either way).
    """
    toks = ensure_parallelism(df).select(
        F.explode(token_col).alias("token")
    )
    # The summary is tiny (<= capacity candidates + 1 sentinel per Arrow
    # batch); persist so the candidate branch and the N branch cost one
    # corpus scan, not two.
    summary = toks.mapInPandas(
        _batch_candidates(capacity), "token string, n_batch long"
    )
    if check_exact:
        from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

        summary = persist_tracked(summary)
    candidates = (
        summary.where(F.col("token").isNotNull())
        .select("token")
        .distinct()
        .withColumnRenamed("token", "_cand")
    )
    topk = (
        toks.join(
            F.broadcast(candidates), toks.token == F.col("_cand"), "left_semi"
        )
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(k)
    )
    if not check_exact:
        return topk
    n_total = summary.where(F.col("token").isNull()).agg(
        F.sum("n_batch").alias("_n_total")
    )
    # f_k as a window-min over the k result rows (post-limit, so the
    # single-partition window touches k rows, not the corpus); the
    # assert_true filter rides the plan lazily — no eager execution, no
    # second run of the verify subtree. Fewer than k verified rows is
    # ALSO a violation: the unreturned k-th token's frequency is
    # unknown, so the result cannot be certified (a corpus with < k
    # distinct tokens trips this too — there, check_exact=False is the
    # honest mode since no k-th item exists to bound).
    whole = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    bound_ok = (F.col("_rows") == k) & (
        F.col("_fk") * F.lit(capacity) > F.col("_n_total")
    )
    msg = F.concat(
        F.lit("heavy_hitters: exactness bound violated — rows="),
        F.col("_rows").cast("string"),
        F.lit(f"/{k}, f_k="),
        F.col("_fk").cast("string"),
        F.lit(", N/capacity="),
        (F.col("_n_total") / F.lit(capacity)).cast("string"),
        F.lit(" (N="),
        F.col("_n_total").cast("string"),
        F.lit(f", capacity={capacity}); raise capacity or pass check_exact=False"),
    )
    return (
        topk.crossJoin(F.broadcast(n_total))
        .withColumn("_fk", F.min("n").over(whole))
        .withColumn("_rows", F.count("*").over(whole))
        .where(F.assert_true(bound_ok, msg).isNull())
        .select("token", "n")
        .orderBy(F.desc("n"), "token")
    )


# --- KMV distinct-count sketch ----------------------------------------------

_U48 = float(2**48)


def _kmv_u(col: Column, salt: str) -> Column:
    """The sampling family's engine-portable uniform: first 48 md5
    bits of the value as a double in (0,1) — bit-identical in Spark
    and DuckDB, which is what makes this sketch ORACLE-CHECKABLE
    (almost no approximate sketch is: HLL/theta state is
    implementation-defined; KMV state is just the k smallest hashes,
    a pure function of the value set)."""
    h = F.substring(F.md5(F.concat(col.cast("string"), F.lit(":" + salt))), 1, 12)
    return F.conv(h, 16, 10).cast("double") / F.lit(_U48)


def kmv_state(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: int = 64,
    salt: str = "kmv",
    two_level: bool = False,
) -> DataFrame:
    """Per-group KMV (k-minimum-values) sketch state: the k smallest
    value hashes as ``(group_col, pos, u)`` rows — k rows per group,
    MERGEABLE (:func:`kmv_absorb`) and deterministic. Duplicates
    collapse before ranking (a sketch of the distinct set by
    construction).

    Scale tiers, IDENTICAL output (pinned in test_sketch_kmv):

    - default: one distinct-projection shuffle keyed (group, hash)
      then a rank window per group — Spark's window sort is external
      (disk-spilling), so a hot group costs IO, not memory. Right when
      per-group distinct cardinality is sane.
    - ``two_level=True``: the billions-of-distincts tier — each Arrow
      batch keeps only its LOCAL k smallest distinct hashes per group
      (the global k smallest are each some batch's local k smallest,
      the partial-aggregation argument), so the shuffle carries at
      most k rows per (group, batch) instead of every distinct value;
      the final dedup + rank runs over that bounded survivor set."""
    u = _kmv_u(F.col(value_col), salt)
    hashed = df.select(F.col(group_col), u.alias("_u"))
    if two_level:
        gname = group_col

        def partial(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                yield (
                    pdf.drop_duplicates([gname, "_u"])
                    .sort_values([gname, "_u"])
                    .groupby(gname, sort=False)
                    .head(int(k))
                )

        gtype = hashed.schema[group_col].dataType.simpleString()
        hashed = hashed.mapInPandas(
            partial, f"{group_col} {gtype}, _u double"
        )
    dv = hashed.dropDuplicates([group_col, "_u"])
    w = Window.partitionBy(group_col).orderBy(F.asc("_u"))
    return (
        dv.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= int(k))
        .select(group_col, "pos", F.col("_u").alias("u"))
    )


def kmv_absorb(
    state_a: DataFrame, state_b: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """Merge two KMV states: union, dedup hashes, re-rank, keep k —
    the mergeability HLL is famous for, with fully inspectable state.
    Exact for the union of the underlying distinct sets."""
    both = state_a.select(group_col, "u").unionByName(
        state_b.select(group_col, "u")
    ).dropDuplicates([group_col, "u"])
    w = Window.partitionBy(group_col).orderBy(F.asc("u"))
    return (
        both.withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= int(k))
        .select(group_col, "pos", "u")
    )


def kmv_estimate(state: DataFrame, group_col: str, k: int = 64) -> DataFrame:
    """Distinct-count estimate from KMV state: ``(k-1)/u_(k)`` when the
    group filled its sketch, else the EXACT count (fewer than k
    distinct values means the state IS the distinct set). Returns
    ``(group_col, n_sketch, est_distinct)`` with the estimate rounded
    to 4dp; relative error ~ 1/sqrt(k-2) (~13% at k=64) — pick k per
    use. Pure arithmetic on k-row groups."""
    agg = state.groupBy(group_col).agg(
        F.count("*").alias("n_sketch"), F.max("u").alias("_uk")
    )
    # Two guards (r9 advice + r10 review): (1) _uk <= 0 — a k-th
    # smallest hash of exactly 0 would divide to Infinity; fall back to
    # n_sketch, the honest exact-count arm. (2) a k SMALLER than the
    # state's build k doesn't divide by zero — it silently BIASES the
    # estimate ((k-1)/u_{k'} with k' > k rows kept) — so a group
    # holding more than k rows fails loudly inside the plan instead.
    k_ok = F.col("n_sketch") <= F.lit(int(k))
    k_msg = F.concat(
        F.lit("kmv_estimate: a group holds "),
        F.col("n_sketch").cast("string"),
        F.lit(
            f" state rows > k={k} — the state was built with a larger k; "
            "estimating with a smaller one biases (k-1)/u_k. Pass the "
            "build k (save_kmv_state records it)."
        ),
    )
    agg = agg.where(F.assert_true(k_ok, k_msg).isNull())
    return agg.select(
        group_col,
        "n_sketch",
        F.round(
            F.when(
                (F.col("n_sketch") < int(k)) | (F.col("_uk") <= 0.0),
                F.col("n_sketch").cast("double"),
            ).otherwise((F.lit(float(k - 1))) / F.col("_uk")),
            4,
        ).alias("est_distinct"),
    )


def save_kmv_state(
    state: DataFrame,
    path: str,
    group_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> None:
    """Write KMV state + its sketch params under ``path``/{params,state}
    as parquet — the DedupState durability shape applied to the sketch
    family, so a streamed sketch survives session restarts. The params
    row is what makes later absorbs SAFE: states built with different
    (k, salt) union into nonsense rather than failing, so the loader
    returns the recorded params and callers absorb with those, not with
    re-typed literals (r9 advice)."""
    spark = state.sparkSession
    spark.createDataFrame(
        [(group_col, int(k), salt)], "group_col string, k int, salt string"
    ).write.mode("overwrite").parquet(f"{path}/params")
    state.select(group_col, "pos", "u").write.mode("overwrite").parquet(
        f"{path}/state"
    )


def load_kmv_state(spark, path: str) -> tuple[DataFrame, str, int, str]:
    """Re-open a saved KMV sketch: ``(state, group_col, k, salt)``.
    The state comes back repartitioned on the group key (the scan loses
    the written clustering) — absorbs after load are byte-identical to
    a never-saved absorb chain (pinned in test_sketch)."""
    p = spark.read.parquet(f"{path}/params").collect()[0]
    state = spark.read.parquet(f"{path}/state").repartition(p.group_col)
    return state, p.group_col, int(p.k), p.salt


def kmv_set_estimates(
    state: DataFrame, group_col: str, k: int = 64
) -> DataFrame:
    """Set-operation estimates for every PAIR of groups from their KMV
    sketches — the classic KMV composition (Beyer et al., "On synopses
    for distinct-value estimation under multiset operations"): the
    merged sketch of A∪B is the k smallest distinct hashes across both
    states (each group's k-smallest are a superset of the union's
    k-smallest restricted to that group), so

    - ``union_est``   = (k-1)/u_(k) over the merged sketch (exact when
      the merged sketch holds the whole union, i.e. < k rows),
    - ``jaccard_est`` = fraction of merged-sketch hashes present in
      BOTH input sketches (the merged sketch is a uniform sample of
      the union, so the fraction estimates |A∩B|/|A∪B|),
    - ``inter_est``   = jaccard_est * union_est.

    All arithmetic is exact-integer counts plus single IEEE divisions
    of deterministic doubles, so a SQL engine replays every cell —
    this stays ORACLE-CHECKABLE where HLL/theta set ops are not.

    Scale: the pair frame is G^2/2 rows of k-row sketches (G = group
    cardinality, never corpus-sized); the only corpus-sized work
    already happened in :func:`kmv_state`. Estimates are emitted
    UNROUNDED: every value is the same IEEE double in any engine
    (integer ratios and (k-1)/u_k), and rounding is exactly what
    reintroduces the half-boundary divergence the integer pipeline
    avoids."""
    a = state.select(F.col(group_col).alias("ga"), "u")
    b = state.select(F.col(group_col).alias("gb"), "u")
    pairs = (
        a.select("ga")
        .distinct()
        .join(b.select("gb").distinct(), F.col("ga") < F.col("gb"))
    )
    ua = pairs.join(a, "ga").select(
        "ga", "gb", "u", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    ub = pairs.join(b, "gb").select(
        "ga", "gb", "u", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        ua.unionByName(ub)
        .groupBy("ga", "gb", "u")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ga", "gb").orderBy(F.asc("u"))
    topk = merged.withColumn("pos", F.row_number().over(w)).where(
        F.col("pos") <= int(k)
    )
    agg = topk.groupBy("ga", "gb").agg(
        F.count("*").alias("n_m"),
        F.max("u").alias("_uk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_common"),
    )
    union_est = F.when(
        (F.col("n_m") < int(k)) | (F.col("_uk") <= 0.0),
        F.col("n_m").cast("double"),
    ).otherwise(F.lit(float(k - 1)) / F.col("_uk"))
    jaccard = F.col("n_common").cast("double") / F.col("n_m").cast("double")
    return agg.select(
        "ga",
        "gb",
        F.col("n_m").cast("bigint").alias("n_merged"),
        F.col("n_common").cast("bigint").alias("n_common"),
        union_est.alias("union_est"),
        jaccard.alias("jaccard_est"),
        (jaccard * union_est).alias("inter_est"),
    )


# --- HyperLogLog distinct-count sketch --------------------------------------

_HLL_BITS = 48  # md5-prefix hash domain, shared with the KMV family


def hll_linear_count_table(m: int) -> dict[int, float]:
    """The linear-counting correction ``z -> round(m * ln(m / z), 4)``
    for every possible zero-register count, PRECOMPUTED driver-side.
    ln() is libm and therefore engine-divergent in the last ulp; with
    only m-1 possible arguments the correction is a finite lookup, so
    both the Spark plan and the DuckDB oracle embed the SAME literals
    and the branch is bit-identical by construction — the trick that
    makes an HLL estimate oracle-checkable at all."""
    import math

    return {z: round(m * math.log(m / z), 4) for z in range(1, m)}


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_state(
    df: DataFrame,
    value_col: str,
    group_col: str,
    p: int = 6,
    salt: str = "hll",
) -> DataFrame:
    """Per-group HyperLogLog register state: ``(group_col, bucket, r)``
    with ``r`` the max rank (position of the first set bit of the
    hash's upper 48-p bits, 1-based; all-zero upper bits rank 48-p+1)
    over every value landing in the bucket — at most ``m = 2**p`` rows
    per group, MERGEABLE by :func:`hll_absorb` (max of maxes).

    vs KMV (:func:`kmv_state`): HLL state is smaller (m registers vs
    k hashes) and needs NO distinct before aggregating — register max
    is duplicate-insensitive, so this is one straight partial+final max
    agg over the raw rows, the cheapest possible shuffle shape (the
    KMV build pays a distinct-projection first). The price is a
    lookup-table correction at low cardinality (see
    :func:`hll_estimate`) instead of KMV's exact-below-k arm.

    Engine-portable by construction: bucket = low p hash bits, rank =
    first '1' of the zero-padded binary string of the upper bits —
    integer/string ops only, identical in Spark and DuckDB (classic
    HLL implementations disagree on hash + register packing, which is
    why HLL sketches are normally NOT oracle-checkable)."""
    m = 1 << p
    wbits = _HLL_BITS - p
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(value_col).cast("string"), F.lit(":" + salt))),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    w = F.shiftright(h, p)
    pos = F.instr(F.lpad(F.bin(w), wbits, "0"), "1")
    rho = F.when(pos == 0, F.lit(wbits + 1)).otherwise(pos)
    return (
        df.where(F.col(value_col).isNotNull())
        .select(
            F.col(group_col),
            (h % F.lit(m)).alias("bucket"),
            rho.alias("_rho"),
        )
        .groupBy(group_col, "bucket")
        .agg(F.max("_rho").alias("r"))
    )


def hll_absorb(
    state_a: DataFrame, state_b: DataFrame, group_col: str
) -> DataFrame:
    """Merge two HLL states: union + per-bucket max — exact for the
    union of the underlying value sets regardless of arrival order or
    batching (max is commutative/associative), the same mergeability
    contract as the KMV/moment/histogram states."""
    return (
        state_a.select(group_col, "bucket", "r")
        .unionByName(state_b.select(group_col, "bucket", "r"))
        .groupBy(group_col, "bucket")
        .agg(F.max("r").alias("r"))
    )


def hll_estimate(state: DataFrame, group_col: str, p: int = 6) -> DataFrame:
    """Distinct-count estimate from HLL register state, all-exact
    arithmetic until one final division: the harmonic-mean indicator
    ``sum(2^-r)`` is computed as the INTEGER ``S = sum(2^(maxr - r))``
    (each term a power of two <= 2^maxr; float summation of 2^-r terms
    is order-dependent once exponents spread past the mantissa, integer
    summation never is), then ``raw = alpha * m^2 * 2^maxr / S`` is a
    single IEEE division of engine-identical operands. Low-range
    branch (raw <= 2.5m with empty registers) applies the precomputed
    :func:`hll_linear_count_table` literal — see there for why a
    lookup, not ln(). Returns ``(group_col, n_buckets, zeros,
    est_distinct)``; relative error ~ 1.04/sqrt(m) (~13% at p=6).
    Large-range (2^32) correction is irrelevant in a 48-bit hash
    domain below ~10^12 distincts and omitted."""
    m = 1 << p
    maxr = _HLL_BITS - p + 1
    c = _hll_alpha(m) * float(m) * float(m) * float(1 << maxr)
    lc = hll_linear_count_table(m)
    agg = state.groupBy(group_col).agg(
        F.count("*").alias("_nb"),
        F.sum(F.expr(f"shiftleft(cast(1 as bigint), {maxr} - r)")).alias(
            "_sp"
        ),
    )
    zeros = (F.lit(m) - F.col("_nb")).cast("long")
    s_total = F.col("_sp") + zeros * F.lit(1 << maxr).cast("long")
    raw = F.lit(c) / s_total.cast("double")
    lc_map = F.create_map(
        *[F.lit(x) for z, v in sorted(lc.items()) for x in (z, v)]
    )
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0), lc_map[zeros.cast("int")]
    ).otherwise(F.round(raw, 4))
    return agg.select(
        group_col,
        F.col("_nb").cast("long").alias("n_buckets"),
        zeros.alias("zeros"),
        est.alias("est_distinct"),
    )


def save_hll_state(
    state: DataFrame, path: str, group_col: str, p: int = 6, salt: str = "hll"
) -> None:
    """Persist HLL state + sketch params (the KMV durability shape,
    :func:`save_kmv_state`): absorbing states built with different
    (p, salt) is nonsense, so the loader hands back the recorded
    params for callers to reuse."""
    spark = state.sparkSession
    spark.createDataFrame(
        [(group_col, int(p), salt)], "group_col string, p int, salt string"
    ).write.mode("overwrite").parquet(f"{path}/params")
    state.select(group_col, "bucket", "r").write.mode("overwrite").parquet(
        f"{path}/state"
    )


def load_hll_state(spark, path: str) -> tuple[DataFrame, str, int, str]:
    """Re-open a saved HLL sketch: ``(state, group_col, p, salt)``."""
    row = spark.read.parquet(f"{path}/params").collect()[0]
    state = spark.read.parquet(f"{path}/state").repartition(row.group_col)
    return state, row.group_col, int(row.p), row.salt


# --- count-min sketch --------------------------------------------------------


def _cms_cell(col: Column, d: int, width: int, salt: str) -> Column:
    h = F.conv(
        F.substring(
            F.md5(F.concat(col.cast("string"), F.lit(f":{salt}:{d}"))), 1, 12
        ),
        16,
        10,
    ).cast("long")
    return h % F.lit(int(width))


def cms_state(
    df: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Count-min sketch of a value stream: ``(d, w, cnt)`` — ``depth``
    pairwise-independent-ish hash rows x ``width`` counters, built in
    ONE corpus scan (each input row explodes to its depth cells via an
    in-row array, then a partial+final count agg whose shuffle carries
    at most depth x width rows per partition — the map-side combine
    collapses the blowup immediately). State is depth x width rows
    TOTAL regardless of corpus size or value cardinality, and
    MERGEABLE by :func:`cms_absorb` (counters are additive), so the
    held-state ingest lifecycle applies.

    vs the exact heavy-hitter pass (:func:`heavy_hitters`): that one
    answers "which tokens are frequent" exactly under a capacity
    assertion; CMS answers "how often does THIS value occur" for any
    later probe without having kept per-value state — one-sided error
    (est >= true; est <= true + e/width * N with prob 1 - e^-depth).
    All-integer state and estimates: engine-exact, so the sketch is
    fully ORACLE-CHECKABLE including its overestimates."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    _cms_cell(F.col(value_col), d, width, salt).alias("w"),
                )
                for d in range(int(depth))
            ]
        )
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(cells.alias("_c"))
        .groupBy(F.col("_c.d").alias("d"), F.col("_c.w").alias("w"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_absorb(state_a: DataFrame, state_b: DataFrame) -> DataFrame:
    """Merge two CMS states built with identical (depth, width, salt):
    per-cell counter sum — exact mergeability (the combined state
    equals the one-shot state of the concatenated streams)."""
    return (
        state_a.select("d", "w", "cnt")
        .unionByName(state_b.select("d", "w", "cnt"))
        .groupBy("d", "w")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_lookup(
    state: DataFrame,
    probes: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    salt: str = "cms",
) -> DataFrame:
    """Point-frequency estimates for a probe set: each probe hashes to
    its depth cells, the (broadcast — the state is depth x width rows
    by construction) state supplies the counters, and the estimate is
    the MIN over the probe's cells (absent cell => 0). Returns
    ``(value_col, est_count)``; est_count >= the true count always."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("d"),
                    _cms_cell(F.col(value_col), d, width, salt).alias("w"),
                )
                for d in range(int(depth))
            ]
        )
    )
    probe_cells = (
        probes.where(F.col(value_col).isNotNull())
        .dropDuplicates([value_col])
        .select(F.col(value_col), cells.alias("_c"))
        .select(value_col, F.col("_c.d").alias("d"), F.col("_c.w").alias("w"))
    )
    joined = probe_cells.join(F.broadcast(state), ["d", "w"], "left")
    return joined.groupBy(value_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_count")
    )

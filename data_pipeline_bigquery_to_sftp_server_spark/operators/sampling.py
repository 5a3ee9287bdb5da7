"""Deterministic sampling / split operators for training-data pipelines.

A 100 TB corpus needs samples and train/val/test splits that are
(a) reproducible run-to-run and engine-to-engine, (b) stable under
re-partitioning and insertion order, and (c) computable without a
shuffle or a global pass. ``df.sample(seed=...)`` fails (a) and (b):
its RNG is partition-position dependent, so adding one file reshuffles
every assignment. Hashing a stable id fixes all three — each row's
fate is a pure function of its id, evaluated map-side.

The hash is md5 of the (salted) id string: available and bit-identical
in Spark, DuckDB, and virtually every engine, so splits survive a
cross-engine migration — the property the oracle harness checks
cell-for-cell. Rotate the salt to draw an independent fresh
sample/split without touching the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 4 hex chars = 65536 buckets: fraction granularity 1/65536 ≈ 0.0015%.
_PREFIX_LEN = 4
_BUCKETS = 16**_PREFIX_LEN


def _hash_prefix(id_col: Column, salt: str) -> Column:
    """First 4 hex chars of md5(id || ':' || salt) — a uniform draw in
    [0, ffff] as a lexicographically comparable string."""
    return F.substring(
        F.md5(F.concat(id_col.cast("string"), F.lit(":" + salt))), 1, _PREFIX_LEN
    )


def _boundary(cum_fraction: float) -> str:
    return format(min(int(cum_fraction * _BUCKETS), _BUCKETS - 1), "04x")


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen purely by id hash — map-side,
    shuffle-free, identical on every engine and every run."""
    return df.where(_hash_prefix(F.col(id_col), salt) < F.lit(_boundary(fraction)))


def split_column(id_col: Column, splits: dict[str, float], salt: str = "") -> Column:
    """Assignment expression mapping each id to a split name.

    ``splits`` maps name -> fraction (must sum to ~1; the last split
    absorbs hash values past the final boundary so every row lands
    somewhere). Iteration order of the dict defines the bucket layout —
    keep it fixed for a stable split.
    """
    prefix = _hash_prefix(id_col, salt)
    names = list(splits)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += splits[name]
        cond = prefix < F.lit(_boundary(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return expr.otherwise(F.lit(names[-1])) if expr is not None else F.lit(names[-1])


def hash_split(
    df: DataFrame, id_col: str, splits: dict[str, float], salt: str = ""
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split."""
    return df.withColumn("split", split_column(F.col(id_col), splits, salt))


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    copy_col: str | None = None,
) -> DataFrame:
    """Source-mixture resampling — the data-recipe step that reweights
    corpus sources for a training run (Pile/DoReMi-style mixture
    weights): emit each row of source ``s`` an expected ``rates[s]``
    times; sources absent from ``rates`` drop entirely. The draw is
    the same engine-portable md5 id hash as the split family, so the
    operator is pure map-side — no shuffle, stable under
    repartitioning, identical across engines and runs; rotate ``salt``
    for an independent draw.

    Rates may exceed 1 (upsampling, e.g. a Wikipedia-x3 Pile/LLaMA-
    style weight): a row of source ``s`` is emitted ``floor(rates[s])``
    times plus one extra copy when its hash lands under the fractional
    remainder — so the output is exactly deterministic per id and the
    expected multiplicity is the rate. With ``copy_col`` set, an extra
    0-based copy-index column disambiguates the replicas (training
    pipelines shard on (id, copy)).

    Plan shape: when every rate is <= 1 and no ``copy_col`` is asked
    for, this stays the pure filter of the downsampling-only operator
    (no generator in the plan). Any rate > 1 (or ``copy_col``)
    switches to a per-row copy count exploded through
    ``posexplode(array_repeat(...))`` — still map-side, no shuffle;
    rows whose copy count is 0 vanish with their empty array.
    """
    if not rates:
        raise ValueError("mixture_sample: rates must be non-empty")
    for s, r in rates.items():
        if r < 0.0:
            raise ValueError(
                f"mixture_sample: rate for {s!r} must be >= 0, got {r}"
            )
    prefix = _hash_prefix(F.col(id_col), salt)

    if copy_col is None and all(r <= 1.0 for r in rates.values()):
        expr = None
        for s, r in rates.items():
            cond = F.col(source_col) == s
            if r < 1.0:  # rate 1.0 keeps every row of the source exactly
                cond = cond & (prefix < F.lit(_boundary(r)))
            expr = cond if expr is None else expr | cond
        return df.where(expr)

    # Upsampling path: deterministic per-row copy count.
    copies = None
    for s, r in rates.items():
        base = int(r)  # floor for r >= 0
        frac = r - base
        c = F.lit(base)
        if frac > 0.0:
            c = c + (prefix < F.lit(_boundary(frac))).cast("int")
        cond = F.col(source_col) == s
        copies = F.when(cond, c) if copies is None else copies.when(cond, c)
    copies = copies.otherwise(F.lit(0))
    out = df.select(
        "*", F.posexplode(F.array_repeat(F.lit(1), copies)).alias("_cp", "_one")
    ).drop("_one")
    if copy_col is not None:
        return out.withColumnRenamed("_cp", copy_col)
    return out.drop("_cp")


def quota_sample(
    df: DataFrame,
    group_cols: list[str],
    id_col: str,
    n_per_group: int,
    salt: str = "",
) -> DataFrame:
    """Keep at most ``n_per_group`` rows per group, chosen by hash order
    — deterministic quota/stratified sampling (e.g. cap every source or
    language at N docs so one crawl domain can't dominate a corpus).

    Hash-ordering makes the quota a uniform random draw that is still
    reproducible and engine-portable; ties are impossible because the
    full hash is unique per id (tie-break on id anyway for safety).

    Scale: one shuffle on the group columns; within each partition the
    window keeps a streaming top-n — state is n rows per group, and
    with AQE skew handling a pathological mega-group splits cleanly
    because the rank filter is order-based, not value-based.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
    w = Window.partitionBy(*group_cols).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_per_group)
        .drop("_rn")
    )


def temperature_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    alpha: float,
    target_rows: int,
    salt: str = "",
) -> DataFrame:
    """Temperature-based group rebalancing (the mT5 / XLM-R
    multilingual alpha-sampling rule): sampling rate per group g is
    ``(n_g/N)^alpha`` renormalized — alpha=1 keeps natural
    proportions, alpha->0 approaches uniform-over-groups, the standard
    0.3 boosts low-resource languages at the expense of the head.
    Each row is kept when its md5 uniform (pure function of id+salt)
    falls under the group's keep probability

        p_g = min(1, target_rows * rate_g / n_g)

    so the expected kept count is ``target_rows`` (less any mass lost
    to capped head groups) with low-resource groups UPweighted
    relative to natural sampling. p_g rounds to 6dp before the
    comparison so the accept boundary is engine-exact (pow() may
    differ in the last ulp between libm and the JVM; the rounded
    threshold cannot).

    Returns kept rows as ``(group_col, id_col, p_keep)``. Map-side
    except the group-count aggregation (tiny — one row per group,
    broadcast back), so the scan shape matches mixture_sample: no
    shuffle of the data itself. Deterministic and engine-portable —
    the oracle replays the exact kept set. Rotate ``salt`` for an
    independent draw.

    NULL group keys never match the equi-join on ``group_col`` and are
    therefore dropped, not sampled — pre-bucket unknowns into a
    sentinel group (e.g. 'und' for language) if they should compete.
    """
    g = df.groupBy(group_col).agg(F.count("*").alias("_n"))
    tot = g.agg(F.sum("_n").alias("_gN"))
    r = g.crossJoin(F.broadcast(tot)).withColumn(
        "_w", F.pow(F.col("_n") / F.col("_gN"), F.lit(float(alpha)))
    )
    z = r.agg(F.sum("_w").alias("_sw"))
    p = (
        r.crossJoin(F.broadcast(z))
        .withColumn(
            "p_keep",
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(float(target_rows)) * (F.col("_w") / F.col("_sw")) / F.col("_n"),
                ),
                6,
            ),
        )
        .select(group_col, "p_keep")
    )
    h = F.substring(
        F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))), 1, 12
    )
    u = F.conv(h, 16, 10).cast("double") / F.lit(float(2**48))
    return (
        df.join(F.broadcast(p), group_col)
        .where(u < F.col("p_keep"))
        .select(group_col, id_col, "p_keep")
    )


def shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic global shuffle + sharding — the materialization
    step between curation and training: every row gets a ``shard``
    (md5-hash bucket, so shards are uniform and a pure function of the
    id) and a ``pos`` (its rank within the shard under a SECOND,
    independent hash order), giving a reproducible, engine-portable
    "globally shuffled" training order that survives repartitioning
    and re-runs — everything ``df.orderBy(rand())`` is not.

    Scale: one shuffle on the shard key; each shard sorts
    corpus/n_shards rows inside its window partition, so ``n_shards``
    is the dial that keeps per-partition sort state bounded (pick
    shards ~ files you want to write). Two salts derive from ``salt``
    so shard assignment and within-shard order are independent draws —
    rotating ``salt`` reshuffles both.
    """
    from pyspark.sql.window import Window

    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt + ":shard"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % n_shards
    ).cast("int")
    order_h = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt + ":order"))
    )
    w = Window.partitionBy("shard").orderBy(order_h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w))
        .select("shard", "pos", *[c for c in df.columns])
    )


def curriculum_shards(
    df: DataFrame,
    score_col: str,
    id_col: str,
    n_buckets: int = 3,
    n_shards: int = 4,
    salt: str = "",
) -> DataFrame:
    """Curriculum-ordered training layout (X45): cut the corpus into
    ``n_buckets`` equal-population DIFFICULTY buckets by deterministic
    ntile over (``score_col`` asc, ``id_col`` asc) — smaller score =
    easier, the curriculum-learning convention — then assign each row
    an md5 ``shard`` (uniform, engine-portable, independent of
    difficulty) and a ``pos`` that orders every shard easy->hard with
    an md5 tiebreak WITHIN a bucket (so each difficulty stage is
    internally shuffled, not score-sorted — the standard
    staged-curriculum layout). A trainer reading any shard
    sequentially sees the full curriculum; shards are balanced because
    assignment ignores difficulty.

    Plan (r8, scale-correct): bucket assignment does NOT use the
    single-partition ntile window — difficulty ranks come from
    ``relational.with_global_rank`` (range-repartition + streamed
    per-partition counter + broadcast offsets: the zipWithIndex shape,
    two bounded shuffles, no partition ever holds the whole corpus)
    and ntile is recomputed from the rank via the SQL-standard ntile
    remainder rule (``relational.ntile_by_rank``: first ``N % k``
    buckets get the extra row) — equivalence to DuckDB's ntile IS the
    oracle check. The shard
    window then sorts corpus/n_shards rows per partition, the
    shuffle_shards bound. Mildly eager: the rank's per-partition count
    list is collected (n_partitions integers).
    """
    from pyspark.sql.window import Window

    from data_pipeline_bigquery_to_sftp_server_spark.operators.relational import (
        ntile_by_rank,
        with_global_rank,
    )
    shard = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.col(id_col).cast("string"), F.lit(":" + salt + ":cshard"))
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        % n_shards
    ).cast("int")
    order_h = F.md5(
        F.concat(F.col(id_col).cast("string"), F.lit(":" + salt + ":corder"))
    )
    ranked, n_rows = with_global_rank(df, [score_col, id_col], rank_col="_grank")
    bucketed = (
        ranked.withColumn("bucket", ntile_by_rank(F.col("_grank"), n_rows, n_buckets))
        .drop("_grank")
        .withColumn("shard", shard)
    )
    wp = Window.partitionBy("shard").orderBy(
        F.col("bucket").asc(), order_h.asc(), F.col(id_col).asc()
    )
    return bucketed.withColumn("pos", F.row_number().over(wp)).select(
        "shard", "pos", "bucket", *[c for c in df.columns]
    )


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 1.5,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Tukey-fence outlier flagging per group: rows whose
    ``value_col`` falls outside ``[q1 - k*iqr, q3 + k*iqr]`` of their
    group's EXACT interquartile range get ``is_outlier = true``. The
    robust version of z-score trimming (quartiles don't move when the
    outliers themselves get bigger) — the standard screen for
    truncated/concatenated scrapes before length-sensitive stages
    (packing, LM scoring) see them.

    Returns every input row with ``lo`` / ``hi`` (rounded to 6dp — the
    fence is an engine-portable constant, not a float race) and
    ``is_outlier`` appended.

    Scale: ``exact=True`` (default) computes EXACT quantiles — right
    when values are low-cardinality ints (doc lengths) or groups are
    bounded (sources). For high-cardinality doubles at 100 TB pass
    ``exact=False``: the ``percentile_approx`` tier of
    :func:`iqr_bounds`, bounded sketch state per group, fence moves by
    at most the sketch error. The bounds frame is one row per group
    either way, so the join back is a broadcast; the data itself never
    shuffles.
    """
    v = F.col(value_col).cast("double")
    b = iqr_bounds(df, value_col, group_col, k, exact=exact, accuracy=accuracy)
    # null-SAFE join back: a NULL group key forms its own bounds group
    # and must keep its rows (an equi-join would silently drop them —
    # r9 review; the docstring promises EVERY input row back). A NULL
    # value_col yields is_outlier NULL — the caller's screen decides.
    return df.join(
        F.broadcast(b),
        df[group_col].eqNullSafe(b["_g"]),
    ).drop("_g").withColumn(
        "is_outlier", (v < F.col("lo")) | (v > F.col("hi"))
    )


def iqr_bounds(
    df: DataFrame,
    value_col: str,
    group_col: str,
    k: float = 1.5,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """The bounded per-group fence frame ``(group_col as _g, lo, hi)``
    on its own — for callers that probe the fences without the corpus
    join (the streaming gate broadcasts exactly this).

    ``exact=True`` uses ``percentile()`` — exact quantiles whose
    aggregation state is a per-group value multiset; right when values
    are low-cardinality ints (doc lengths) or groups are bounded.
    ``exact=False`` is the 100 TB tier: ``percentile_approx`` (a
    KLL/GK-style quantile summary of bounded size ~``accuracy``
    regardless of group cardinality — the map-side state no longer
    grows with distinct values). The fence moves by at most the sketch's
    rank error (~1/accuracy of the group mass); rows whose value sits
    within that sliver of a fence can flip ``is_outlier`` — pinned
    within tolerance of the exact fences in test_sampling. Same plan
    shape either way: map-side-combinable agg, one tiny bounds frame."""
    v = F.col(value_col).cast("double")
    if exact:
        agg = [
            F.percentile(v, F.lit(0.25)).alias("_q1"),
            F.percentile(v, F.lit(0.75)).alias("_q3"),
        ]
    else:
        agg = [
            F.percentile_approx(v, F.lit(0.25), F.lit(int(accuracy))).alias("_q1"),
            F.percentile_approx(v, F.lit(0.75), F.lit(int(accuracy))).alias("_q3"),
        ]
    return (
        df.groupBy(group_col)
        .agg(*agg)
        .select(
            F.col(group_col).alias("_g"),
            F.round(F.col("_q1") - k * (F.col("_q3") - F.col("_q1")), 6).alias("lo"),
            F.round(F.col("_q3") + k * (F.col("_q3") - F.col("_q1")), 6).alias("hi"),
        )
    )


def weighted_sample_wor(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    group_col: str | None = None,
    salt: str = "wsw",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    exponential race, the A-ES one-pass scheme): each row draws the
    sampling family's engine-portable md5 uniform ``u`` (pure function
    of id+salt, module docstring) and competes with key
    ``ln(u) / weight`` — the n LARGEST keys are a weighted sample
    without replacement (ln is a monotone transform of the classic
    u^(1/w) race). Rows with non-positive weight never win and are
    filtered up front.

    Deterministic: no RNG state, so re-runs, repartitions, and other
    engines agree — which is what makes a weighted sampler
    ORACLE-CHECKABLE at all (DuckDB replays the same md5 + ln). The
    race key itself is never emitted: ln() may legally differ in the
    last ulp between libms, which is harmless to the selection (two
    independent keys land within an ulp with probability ~0) but
    would flip a value hash.

    Scale: one per-group window rank — Spark's window sort is
    external (disk-spilling), and the shuffle carries (id, weight)
    only. For a global sample pass ``group_col=None``: a single
    ordered partition is the honest cost of one global top-n; prefer
    a group key at 100 TB (per-source / per-shard quotas), which is
    also the statistically saner design."""
    from pyspark.sql.window import Window

    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(2**48))
    )
    key = F.log(u) / F.col(weight_col).cast("double")
    keep = [group_col] if group_col else []
    part = [F.col(group_col)] if group_col else [F.lit(1)]
    w = Window.partitionBy(*part).orderBy(F.desc("_key"), F.col(id_col))
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_key", key)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= int(n))
        .select(*keep, id_col, weight_col, "sample_rank")
    )

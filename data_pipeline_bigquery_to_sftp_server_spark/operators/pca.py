"""Distributed second-moment statistics + PCA projection over an
embedding column (SURVEY §2.11 similarity family).

Why this exists in a curation engine: PCA (optionally whitened) is the
standard pre-step before clustering / SemDeDup / ANN at scale — a
64->8-dim projection cuts k-means and pair-search cost ~8x while
keeping most of the variance, and mean-centering alone fixes the
"every cosine is 0.99" pathology of un-centered embedding spaces.

Scale shape (the only part that matters at 100 TB): the covariance of
an (n x d) corpus is a d x d matrix — CONSTANT-sized state no matter
how big n gets. Each partition computes its local zeroth/first/second
moments (n_p, sum_p, X^T X_p) in one Arrow batch pass and emits d^2+d+1
tiny rows; a map-side-combinable groupBy sums them; covariance is then
pure arithmetic on d^2 rows. The corpus is scanned ONCE, nothing
corpus-sized ever shuffles or reaches the driver (the classic
tree-aggregate shape, expressed relationally). The eigendecomposition
runs on the driver over the d x d matrix — bounded by ``d <= 256``
with a loud assert (the exact_near_dup_pairs_np discipline), never by
corpus size.

Engine parity: moments sum in float64; the oracle compares
``covar_pop`` at 6dp — associativity-order noise sits at ~1e-15
relative, far below the rounding. Eigenvectors get a deterministic
sign (the max-|component| coordinate is made positive) so the
projection is reproducible run-to-run; numpy's eigh is deterministic
for a fixed input matrix.

Reference: no counterpart (the reference delegates all analytics to
BigQuery, main.py:55-120); part of the LLM-pipeline surface this
engine adds.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_DIM = 256


def _moments(df: DataFrame, vec_col: str, normalize: bool = False) -> DataFrame:
    """Aggregated corpus moments as a tiny DataFrame of
    ``(i int, j int, val double)`` rows: ``(-1,-1)`` holds n,
    ``(i,-1)`` holds sum of coordinate i, ``(i,j)`` holds
    sum of x_i * x_j. One corpus scan, d^2-sized everywhere after the
    map side."""

    def local(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if normalize:
                nrm = np.linalg.norm(X, axis=1, keepdims=True)
                nrm[nrm == 0] = 1.0
                X = X / nrm
            d = X.shape[1]
            if d > _MAX_DIM:
                raise ValueError(
                    f"pca: dim {d} exceeds the driver-eigh ceiling "
                    f"{_MAX_DIM} — reduce upstream or raise _MAX_DIM "
                    "knowingly"
                )
            S = X.T @ X
            s = X.sum(axis=0)
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": np.concatenate(([-1], np.arange(d), ii.ravel())),
                    "j": np.concatenate(([-1], np.full(d, -1), jj.ravel())),
                    "val": np.concatenate(
                        ([float(len(pdf))], s, S.ravel())
                    ),
                }
            )

    parts = df.select(vec_col).mapInPandas(local, "i int, j int, val double")
    return parts.groupBy("i", "j").agg(F.sum("val").alias("val"))


def moment_state(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """The corpus's sufficient statistics for covariance/PCA as a tiny
    (d^2+d+1)-row frame — the PERSISTABLE form (save as parquet, hold
    across batches). Moments are ADDITIVE, which is the whole point:
    see :func:`absorb_moments`."""
    return _moments(df, vec_col)


def absorb_moments(
    state: DataFrame, batch: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Fold a new batch into held moment state WITHOUT rescanning the
    corpus: (n, sum, X^T X) are additive, so absorb = union + re-sum of
    two d^2-sized frames — the steady-state ingest tier of the PCA
    family (the DedupState pattern: model built once, updated per
    batch, corpus never re-read). Exactness is oracle-checked:
    covariance derived from (state ⊕ batch) must equal covar_pop over
    the concatenated corpus (q_incremental_covariance)."""
    return (
        state.unionByName(_moments(batch, vec_col))
        .groupBy("i", "j")
        .agg(F.sum("val").alias("val"))
    )


def covariance_from_moments(m: DataFrame, round_dp: int = 6) -> DataFrame:
    """Derive the ``(i, j, cov)`` covariance frame from held moment
    state — pure arithmetic on d^2 rows, no corpus access."""
    n = m.where((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("val").alias("_n")
    )
    s = m.where((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("_k"), F.col("val").alias("_s")
    )
    cross = m.where(F.col("j") >= 0)
    si = s.withColumnRenamed("_k", "i").withColumnRenamed("_s", "_si")
    sj = s.withColumnRenamed("_k", "j").withColumnRenamed("_s", "_sj")
    return (
        cross.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(n))
        .select(
            "i",
            "j",
            # + 0.0 canonicalizes IEEE -0.0 (a tiny negative covariance
            # rounding to zero keeps its sign bit otherwise, and the
            # engines disagree on it)
            (
                F.round(
                    (F.col("val") - F.col("_si") * F.col("_sj") / F.col("_n"))
                    / F.col("_n"),
                    round_dp,
                )
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


def covariance_matrix(
    df: DataFrame, vec_col: str = "embedding", round_dp: int = 6
) -> DataFrame:
    """Population covariance of the embedding column as a d^2-row
    DataFrame ``(i, j, cov)`` (0-based coordinates), equal to SQL
    ``covar_pop(x_i, x_j)`` — the oracle-checkable face of the moment
    aggregation. cov = (S_ij - s_i s_j / n) / n."""
    return covariance_from_moments(_moments(df, vec_col), round_dp)


def principal_axes_from_moments(
    moments: DataFrame, q: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Eigendecomposition from HELD moment state — NO corpus access:
    collect the d^2+d+1 rows (bounded by _MAX_DIM, never by corpus),
    derive mean/covariance, eigh with the deterministic sign
    convention. Completes the statistics family's held-state story:
    moments are built/absorbed/streamed once (moment_state /
    absorb_moments / the foreachBatch query), and the axes — like the
    covariance — are pure arithmetic on that state, so steady-state
    projection never rescans the corpus (pinned equal to the fresh-scan
    path in test_pca)."""
    rows = moments.collect()
    if not rows:
        raise ValueError(
            "pca: no vectors to decompose — the moment state is empty"
        )
    n = next(r["val"] for r in rows if r["i"] == -1)
    d = max(r["i"] for r in rows) + 1
    s = np.zeros(d)
    S = np.zeros((d, d))
    for r in rows:
        if r["i"] >= 0 and r["j"] == -1:
            s[r["i"]] = r["val"]
        elif r["j"] >= 0:
            S[r["i"], r["j"]] = r["val"]
    mu = s / n
    cov = S / n - np.outer(mu, mu)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][: int(q)]
    evals = w[order]
    comps = v[:, order].T  # q x d
    # deterministic sign: the max-|.| coordinate of each axis positive
    flip = np.sign(comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    return mu, evals, comps * flip[:, None]


def _principal_axes(
    df: DataFrame, vec_col: str, q: int, normalize: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fresh-scan axes: one moment aggregation over the corpus, then
    :func:`principal_axes_from_moments` on the result."""
    return principal_axes_from_moments(_moments(df, vec_col, normalize), q)


def pca_project(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q: int = 4,
    whiten: bool = False,
    round_dp: int = 6,
    normalize: bool = False,
    moments: DataFrame | None = None,
) -> DataFrame:
    """Project every vector onto the corpus's top-``q`` principal axes:
    returns ``(id_col, pc1..pcq)`` rounded. With ``whiten`` each axis
    is scaled by 1/sqrt(eigenvalue) (unit variance — what cosine-based
    downstream stages usually want).

    Two corpus scans total (moments, then the projection map); the
    projection is a broadcast-closure Arrow pass — (X - mu) @ W^T per
    batch, no shuffle, no per-row Python. ``normalize`` unit-L2-scales
    each vector INSIDE the Arrow passes before any statistics — the
    sphere-projection pre-step reduced-space screens need; doing it
    here (one numpy divide) instead of as a Catalyst HOF avoids an
    O(d^2)-per-row interpreted expression re-evaluated on every
    consumer scan.

    ``moments=`` (a held :func:`moment_state` frame) is the
    steady-state path: the axes derive from the state and the ONLY
    corpus scan left is the projection itself — the AnnIndex pattern
    for the PCA family. The caller owns consistency between the state
    and any ``normalize`` flag (moments of normalized vectors need a
    state built with normalize)."""
    if moments is not None:
        mu, evals, comps = principal_axes_from_moments(moments, q)
    else:
        mu, evals, comps = _principal_axes(df, vec_col, q, normalize)
    W = comps / np.sqrt(np.maximum(evals, 1e-12))[:, None] if whiten else comps
    qn = len(comps)
    out_cols = [f"pc{k + 1}" for k in range(qn)]
    in_fields = df.select(id_col, vec_col).schema
    id_type = in_fields[0].dataType.simpleString()
    schema = f"{id_col} {id_type}, " + ", ".join(f"{c} double" for c in out_cols)

    def proj(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if normalize:
                nrm = np.linalg.norm(X, axis=1, keepdims=True)
                nrm[nrm == 0] = 1.0
                X = X / nrm
            P = np.round((X - mu) @ W.T, round_dp)
            out = pd.DataFrame({id_col: pdf[id_col]})
            for k, c in enumerate(out_cols):
                out[c] = P[:, k]
            yield out

    return df.select(id_col, vec_col).mapInPandas(proj, schema)

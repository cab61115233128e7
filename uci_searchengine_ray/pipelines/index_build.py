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
    one task per merge_key reads runs/*/merge_key=M/ and merges its terms
    (no groupby/sort — data is already co-located by key on disk)
      → postings/shard=K/ (partition_cols=["shard"])
    term_stats (term, df) derived from block_id==0 rows; stats.json with
    N / avgdl / total_tokens / n_terms / config.

Build modes mirror the reference's crawl modes (routes.py:133-219):
  fresh    — wipe the snapshot dir, build everything
  continue — resume: skip checkpoint groups present in the manifest
             (the `_reconstruct_queue` / mode=continue analog)
  rebuild  — keep phase-1 outputs (doc_meta, runs), redo the merge + stats
             (the `recrawl` analog: re-derive, keep raw material)

Output layout is a portable snapshot directory (the analog of the reference's
one-SQLite-file-per-database artifact, connection.py:36-40): copy the dir,
point query actors at it.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import List, Optional, Sequence

import pyarrow.dataset as pa_ds
import pyarrow.parquet as pq

import ray.data

from ..config import EngineConfig
from ..state import manifest
from ..stages.postings import TokenizeEncodeRuns, make_merge_shard

STAGE_RUNS = "runs"
STAGE_POSTINGS = "postings"

_TIMING = os.environ.get("UCIRAY_TIMING") == "1"


def _tlog(label: str, t0: float) -> None:
    if _TIMING:
        import sys
        import time

        print(f"TIMING {label}: {time.perf_counter() - t0:.2f}s", file=sys.stderr)


def _input_files(corpus_path: str) -> List[str]:
    if os.path.isdir(corpus_path):
        files = sorted(glob.glob(os.path.join(corpus_path, "*.parquet")))
    else:
        files = [corpus_path]
    if not files:
        raise FileNotFoundError(f"no parquet files under {corpus_path}")
    return files


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
            _hl.md5(os.path.basename(f).encode()).digest()[:4], "big"
        )
        groups[h % n_groups].append(f)
    return groups


def _atomic_write(ds: "ray.data.Dataset", final_dir: str, **kwargs) -> None:
    """write_parquet into .tmp, then rename — a manifest row implies complete
    outputs (SURVEY §4 'Transactionality')."""
    tmp = final_dir.rstrip("/") + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    if os.path.exists(final_dir):
        shutil.rmtree(final_dir)
    ds.write_parquet(tmp, **kwargs)
    os.makedirs(tmp, exist_ok=True)  # a zero-row write creates no dir at all
    os.replace(tmp, final_dir)


def _parquet_rows(path_glob: str) -> int:
    """Row count from parquet footers only (no data read)."""
    return sum(pq.read_metadata(p).num_rows for p in glob.glob(path_glob))


def _sum_column(paths: str, column: str) -> int:
    files = glob.glob(os.path.join(paths, "**", "*.parquet"), recursive=True)
    if not files:
        return 0
    dataset = pa_ds.dataset(files)
    total = 0
    for batch in dataset.to_batches(columns=[column]):
        total += int(batch.column(0).to_numpy(zero_copy_only=False).sum())
    return total


def build_index(
    corpus_path: str,
    index_dir: str,
    cfg: Optional[EngineConfig] = None,
    mode: str = "fresh",
    adapt_batches=None,
    read_columns: Optional[List[str]] = None,
) -> str:
    """Build (or resume) an index snapshot at ``index_dir``. Returns index_dir."""
    cfg = cfg or EngineConfig()
    if mode not in ("fresh", "continue", "rebuild"):
        raise ValueError(f"unknown build mode {mode!r}")

    if mode == "fresh" and os.path.exists(index_dir):
        shutil.rmtree(index_dir)
    os.makedirs(index_dir, exist_ok=True)
    if mode == "rebuild":
        for sub in (STAGE_POSTINGS, "term_stats"):
            p = os.path.join(index_dir, sub)
            if os.path.exists(p):
                shutil.rmtree(p)
        manifest.drop_stage(index_dir, STAGE_POSTINGS)

    import time as _time

    files = _input_files(corpus_path)
    groups = _groups_of(files, cfg.ckpt_groups)
    done = manifest.completed(index_dir, STAGE_RUNS)
    prior_inputs = {
        str(r["partition"]): sorted(r.get("inputs", []))
        for r in manifest.stage_metrics(index_dir, STAGE_RUNS)
    }

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
        ds = ray.data.read_parquet(gfiles, columns=read_columns)
        if adapt_batches is not None:
            # input-shape adapter (e.g. driver `documents` rows → corpus shape)
            ds = ds.map_batches(
                adapt_batches, batch_format="pyarrow", zero_copy_batch=True
            )

        # doc_meta is written as a per-batch sidecar from INSIDE the tokenize
        # tasks (idempotent deterministic file names), so the corpus is read
        # once per group for both outputs and no second Dataset job runs
        meta_dir = os.path.join(index_dir, "doc_meta", part)
        meta_tmp = meta_dir.rstrip("/") + ".tmp"
        if os.path.exists(meta_tmp):
            shutil.rmtree(meta_tmp)
        if os.path.exists(meta_dir):
            shutil.rmtree(meta_dir)
        os.makedirs(meta_tmp)  # stays empty when the group has zero docs

        runs_dir = os.path.join(index_dir, STAGE_RUNS, part)
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
                meta_dir=meta_tmp,
                store_positions=cfg.store_positions,
                doc_range_buckets=cfg.doc_range_buckets,
                store_content=cfg.store_content,
            ),
            batch_format="pyarrow",
            batch_size=cfg.tokenize_batch_size,
            zero_copy_batch=True,
        )
        # hive-partition the runs by merge_key at write time: this IS the
        # phase-1→2 exchange (disk-backed shuffle), so phase 2 needs no
        # sort/groupby at all — each merge task reads exactly its key's files
        # (plus, when doc_range_buckets > 1, its doc-range slice)
        _atomic_write(runs, runs_dir, partition_cols=["merge_key", "range_bucket"])
        os.replace(meta_tmp, meta_dir)
        _tlog(f"phase1 {part}", _t)

        docs = _parquet_rows(os.path.join(meta_dir, "*.parquet"))
        tokens = _sum_column(runs_dir, "tf_sum")
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
            p = os.path.join(index_dir, sub)
            if os.path.exists(p):
                shutil.rmtree(p)

    # ---- phase 2: merge runs → blocks → sharded parquet (NO shuffle:
    # runs are already (key, doc-range)-partitioned on disk; one task per
    # (merge_key, range_bucket) pair) ----
    if "all" not in manifest.completed(index_dir, STAGE_POSTINGS):
        merge = make_merge_shard(
            n_docs=n_docs,
            avgdl=avgdl,
            block_size=cfg.block_size,
            num_shards=cfg.num_shards,
            k1=cfg.bm25_k1,
            b=cfg.bm25_b,
        )
        runs_root = os.path.join(index_dir, STAGE_RUNS)
        run_files = glob.glob(
            os.path.join(runs_root, "**", "*.parquet"), recursive=True
        )
        ts_dir = os.path.join(index_dir, "term_stats")

        # term dictionary + GLOBAL df (A2/J5) from run metadata only — no
        # posting decode; also feeds the bucketed merge (a range task sees
        # just its slice, but idf / block-max bounds need the global df).
        # The aggregate runs driver-side over just the (term, n) columns with
        # pyarrow's C++ group_by: input is run-count-sized, output is
        # vocab-sized — both ≪ corpus.  (At extreme vocab scale this becomes
        # a Ray groupby written partitioned by merge_key, each merge task
        # reading its df slice.)
        _t = _time.perf_counter()
        if os.path.exists(ts_dir):
            shutil.rmtree(ts_dir)
        os.makedirs(ts_dir)
        ts_tbl = None
        if run_files:
            meta_tbl = pa_ds.dataset(run_files, format="parquet").to_table(
                columns=["term", "n"]
            )
            ts_tbl = (
                meta_tbl.group_by("term")
                .aggregate([("n", "sum")])
                .rename_columns(["term", "df"])
            )
            ts_tbl = ts_tbl.set_column(
                1, "df", ts_tbl["df"].cast("int64")
            )
            pq.write_table(ts_tbl, os.path.join(ts_dir, "term_stats.parquet"))
        _tlog("term_stats", _t)

        df_ref = None
        if cfg.doc_range_buckets > 1 and ts_tbl is not None:
            df_map = dict(
                zip(ts_tbl["term"].to_pylist(), ts_tbl["df"].to_pylist())
            )
            # one broadcast object, read once per merge task
            df_ref = ray.put(df_map)

        def merge_kr_batch(batch):
            import pyarrow as pa

            df_lookup = ray.get(df_ref) if df_ref is not None else None
            outs = []
            for key, rb in zip(
                batch["merge_key"].to_pylist(), batch["range_bucket"].to_pylist()
            ):
                paths = glob.glob(
                    os.path.join(
                        runs_root, "group=*", f"merge_key={key}",
                        f"range_bucket={rb}", "*.parquet"
                    )
                )
                if not paths:
                    continue
                tbl = pa_ds.dataset(paths, format="parquet").to_table()
                outs.append(
                    merge(tbl, block_id_base=rb << 20, df_lookup=df_lookup)
                )
            from ..stages.postings import BLOCK_SCHEMA

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
                for r in range(cfg.doc_range_buckets)
            ]
        )
        blocks = keys.map_batches(
            merge_kr_batch, batch_format="pyarrow", batch_size=1
        )
        postings_dir = os.path.join(index_dir, STAGE_POSTINGS)
        _atomic_write(blocks, postings_dir, partition_cols=["shard"])
        _tlog("phase2", _t)

        n_terms = _parquet_rows(os.path.join(index_dir, "term_stats", "*.parquet"))
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
            "store_positions": cfg.store_positions,
            "bm25_k1": cfg.bm25_k1,
            "bm25_b": cfg.bm25_b,
        }
        with open(os.path.join(index_dir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2, sort_keys=True)
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
    with open(os.path.join(index_dir, "stats.json")) as f:
        return json.load(f)

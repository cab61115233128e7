"""Per-partition lineage manifest — the rebuild's checkpoint/resume state.

Replaces the reference's ``CrawlerState`` row + ``_reconstruct_queue`` anti-join
(models.py:162-179; crawler.py:509-547) and the ``mode=continue`` branch
(routes.py:158-188): instead of re-deriving a frontier from un-crawled rows,
the build records one append-only JSONL row per completed partition (checkpoint
group / stage) with its metrics, and resume = input partitions − completed
partitions.

Writes are atomic at the row level (single ``write`` syscall of one line,
fsync'd); output directories are written to a ``.tmp-`` path and renamed into
place BEFORE the manifest row is appended, so a row implies its outputs are
complete.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Set


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_manifest", "manifest.jsonl")


def append_row(index_dir: str, row: Dict[str, Any]) -> None:
    path = _manifest_path(index_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    line = json.dumps(row, sort_keys=True) + "\n"
    with open(path, "a", encoding="utf-8") as f:
        f.write(line)
        f.flush()
        os.fsync(f.fileno())


def read_rows(index_dir: str) -> List[Dict[str, Any]]:
    path = _manifest_path(index_dir)
    if not os.path.exists(path):
        return []
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    return rows


def completed(index_dir: str, stage: str) -> Set[str]:
    return {
        str(r["partition"])
        for r in read_rows(index_dir)
        if r.get("stage") == stage and r.get("status") == "done"
    }


def stage_metrics(index_dir: str, stage: str) -> List[Dict[str, Any]]:
    return [
        r
        for r in read_rows(index_dir)
        if r.get("stage") == stage and r.get("status") == "done"
    ]


def drop_stage(index_dir: str, stage: str) -> None:
    """Remove all rows of one stage (rebuild mode) — rewrite-in-place via tmp."""
    path = _manifest_path(index_dir)
    if not os.path.exists(path):
        return
    keep = [r for r in read_rows(index_dir) if r.get("stage") != stage]
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for r in keep:
            f.write(json.dumps(r, sort_keys=True) + "\n")
    os.replace(tmp, path)

"""Forward document store: point lookups of document rows by doc_id.

The reference reads ``Document`` rows back from SQLite for snippets and titles
(search.py:92-111).  Here the store is the ``doc_meta`` parquet of the index
snapshot; lookups push an ``doc_id ∈ {...}`` predicate into the parquet scan so
row-group statistics prune untouched groups — a point lookup, not a table scan
(doc ids within a group's files are written in input order, so row groups are
id-clustered when the input is).
"""

from __future__ import annotations

from typing import Dict, Iterable

import pyarrow.compute as pc
import pyarrow.dataset as pa_ds


def quarantine_listing(index_dir: str, limit: int = 1000):
    """Failed-document listing (SURVEY §2.6 K4; reference routes.py:411-416
    lists failed URLs ordered, limit 1000): doc_meta rows flagged failed
    (null content at ingest), deterministic order, bounded."""
    from . import storage

    fs, root = storage.resolve(index_dir)
    ds = pa_ds.dataset(
        storage.join(root, "doc_meta"), format="parquet", filesystem=fs
    )
    tbl = ds.to_table(
        columns=["doc_id", "url", "title", "failed"],
        filter=pc.field("failed") == True,  # noqa: E712 — pyarrow expression
    )
    idx = pc.sort_indices(tbl, sort_keys=[("doc_id", "ascending")])
    return tbl.take(idx).slice(0, limit)


class DocStore:
    def __init__(self, index_dir: str):
        from . import storage

        fs, root = storage.resolve(index_dir)
        self._dataset = pa_ds.dataset(
            storage.join(root, "doc_meta"), format="parquet", filesystem=fs
        )

    def fetch(self, doc_ids: Iterable[int], columns=("doc_id", "url", "title", "content")) -> Dict[int, dict]:
        ids = list(doc_ids)
        if not ids:
            return {}
        # content is optional in the store (EngineConfig.store_content=False
        # at lake scale); callers get rows without it and degrade gracefully
        have = set(self._dataset.schema.names)
        cols = [c for c in columns if c in have]
        tbl = self._dataset.to_table(
            columns=cols,
            filter=pc.field("doc_id").isin(ids),
        )
        rows = tbl.to_pylist()
        return {r["doc_id"]: r for r in rows}

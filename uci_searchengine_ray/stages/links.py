"""Link-graph extraction stage — the optional crawler-side extra
(SURVEY.md §2.2 M11, §2.4 J3, §2.7 D2/D3).

Rebuilds the reference's link pipeline as Ray Data stages over an HTML column:
  - ``extract_edges``: flat_map-shaped batch transform: every ``<a href>``,
    skip fragments/mailto, urljoin, normalize (crawler.py:240-256 +
    384-397), within-page dedup (D2), optional domain filter (M9/M10).
  - ``frontier_minus_visited``: the discovered−crawled anti-join
    (crawler.py:509-547 `_reconstruct_queue`): targets that are not yet
    sources, via a broadcast visited-set semi-filter (small side) — the
    resume primitive of the crawl loop re-expressed without driver state.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pyarrow as pa

import ray
import ray.data

from ..functions.urltools import (
    DEFAULT_ALLOWED_DOMAINS,
    extract_links,
    is_allowed_domain,
)

EDGE_SCHEMA = pa.schema(
    [("src_doc_id", pa.int64()), ("dst_url", pa.string())]
)


def extract_edges_batch(
    batch: pa.Table,
    url_col: str = "url",
    html_col: str = "html",
    id_col: str = "doc_id",
    domains: Optional[Sequence[str]] = DEFAULT_ALLOWED_DOMAINS,
) -> pa.Table:
    src_ids, dst_urls = [], []
    for doc_id, page_url, html in zip(
        batch[id_col].to_pylist(),
        batch[url_col].to_pylist(),
        batch[html_col].to_pylist(),
    ):
        for dst in extract_links(page_url or "", html or ""):
            if domains is not None and not is_allowed_domain(dst, domains):
                continue
            src_ids.append(doc_id)
            dst_urls.append(dst)
    return pa.table(
        {
            "src_doc_id": pa.array(src_ids, pa.int64()),
            "dst_url": pa.array(dst_urls, pa.string()),
        },
        schema=EDGE_SCHEMA,
    )


def extract_edges(pages: "ray.data.Dataset", **kwargs) -> "ray.data.Dataset":
    return pages.map_batches(
        lambda b: extract_edges_batch(b, **kwargs),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def frontier_minus_visited(
    edges: "ray.data.Dataset", visited_urls: set
) -> "ray.data.Dataset":
    """Distinct destination URLs not yet visited (anti-join with a broadcast
    visited set — the small side rides the object store once)."""
    ref = ray.put(frozenset(visited_urls))

    def anti(batch: pa.Table) -> pa.Table:
        visited = ray.get(ref)
        keep = [u for u in batch["dst_url"].to_pylist() if u not in visited]
        return pa.table({"url": pa.array(keep, pa.string())})

    filtered = edges.map_batches(anti, batch_format="pyarrow", zero_copy_batch=True)
    # distinct via groupby-count projection (Dataset.unique returns a driver
    # list; this stays a lazy Dataset)
    return filtered.groupby("url").count().select_columns(["url"])

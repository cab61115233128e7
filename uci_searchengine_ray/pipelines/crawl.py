"""Crawl pipeline: the reference's BFS crawl loop (crawler.py:134-379)
re-expressed as iterative Dataset rounds over a static page table.

There is no live HTTP in this environment (and none is needed for the index
tier — SURVEY §2.1 S1), so "fetch" is a lookup into a ``pages`` parquet table
``(url:string, html:string)`` — the deterministic stand-in for the network.
Everything else follows the reference step-for-step, but batch-parallel:

  per round (breadth level):
    frontier (list of normalized URLs)
      → fetch: predicate-pushdown read of the pages table (url ∈ frontier);
        misses become quarantine rows (crawl_failed, crawler.py:317-354)
      → parse: title/text via functions/html.py (crawler.py:200-202)
      → link extraction + domain filter + within-page dedup
        (crawler.py:240-256)
      → next frontier = extracted − visited (anti-join, crawler.py:509-547)
    outputs appended per round: documents(url,title,text,round,crawl_failed),
    edges(src_url,dst_url,round)

Driver state is the visited URL set and the per-round frontier list — the
same small state the reference holds (crawler.py:58-60); all per-page work is
map_batches.  ``max_rounds``/``max_pages`` enforce the caps the reference
declared but never wired (settings.py:35-36).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pa_ds

import ray.data

from ..functions.html import parse_page
from ..functions.urltools import (
    DEFAULT_ALLOWED_DOMAINS,
    extract_links,
    is_allowed_domain,
    normalize_url,
)

DOC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.string()),
        ("text", pa.large_string()),
        ("round", pa.int32()),
        ("crawl_failed", pa.bool_()),
        ("error_message", pa.string()),
    ]
)

EDGE_SCHEMA = pa.schema(
    [("src_url", pa.string()), ("dst_url", pa.string()), ("round", pa.int32())]
)


def _parse_batch(batch: pa.Table, rnd: int, domains) -> Tuple[pa.Table, pa.Table]:
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    titles, texts = [], []
    src, dst = [], []
    for u, h in zip(urls, htmls):
        title, text = parse_page(u, h or "")
        titles.append(title)
        texts.append(text)
        for link in extract_links(u, h or ""):
            if is_allowed_domain(link, domains):
                src.append(u)
                dst.append(link)
    docs = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "title": pa.array(titles, pa.string()),
            "text": pa.array(texts, pa.large_string()),
            "round": pa.array([rnd] * len(urls), pa.int32()),
            "crawl_failed": pa.array([False] * len(urls), pa.bool_()),
            "error_message": pa.array([""] * len(urls), pa.string()),
        },
        schema=DOC_SCHEMA,
    )
    edges = pa.table(
        {
            "src_url": pa.array(src, pa.string()),
            "dst_url": pa.array(dst, pa.string()),
            "round": pa.array([rnd] * len(src), pa.int32()),
        },
        schema=EDGE_SCHEMA,
    )
    return docs, edges


def crawl(
    pages_path: str,
    seeds: Sequence[str],
    max_rounds: int = 3,
    max_pages: Optional[int] = None,
    domains: Sequence[str] = DEFAULT_ALLOWED_DOMAINS,
    requests_per_second: Optional[float] = None,
    on_log=None,
    should_stop=None,
) -> Tuple[pa.Table, pa.Table]:
    """BFS crawl. Returns (documents, edges) Arrow tables.

    URLs are normalized on entry (crawler.py:384-397); a frontier URL absent
    from the page table becomes a failed stub row (kept, never dropped —
    N counts stubs, search.py:85).

    ``requests_per_second`` wires the reference's per-domain politeness
    clock (crawler.py:185-186; SURVEY §2.3 T1) into the lookup: before each
    round's fetch, one ``RateLimiter.wait`` per frontier URL's domain — the
    static-page-table stand-in for live-fetch throttling.  None = no
    throttle (the default for offline table crawls).

    ``on_log`` (message: str) is the broadcast hook — the stand-in for the
    reference's ``broadcast_log`` websocket fan-out (websocket_utils.py:12);
    ``should_stop`` () -> bool is checked before each round, mirroring the
    reference's stop flag (routes.py:222-240).
    """
    from urllib.parse import urlparse

    from ..state.rate_limiter import RateLimiter

    limiter = (
        RateLimiter(requests_per_second)
        if requests_per_second is not None
        else None
    )
    page_ds = pa_ds.dataset(pages_path, format="parquet")
    visited: set = set()
    frontier: List[str] = []
    for s in seeds:
        n = normalize_url(s)
        if n not in visited and is_allowed_domain(n, domains):
            visited.add(n)
            frontier.append(n)

    doc_tables: List[pa.Table] = []
    edge_tables: List[pa.Table] = []

    log = on_log if on_log is not None else (lambda m: None)
    for rnd in range(max_rounds):
        if not frontier:
            break
        if should_stop is not None and should_stop():
            log(f"Crawler stopped before round {rnd}")
            break
        if max_pages is not None:
            budget = max_pages - sum(t.num_rows for t in doc_tables)
            if budget <= 0:
                break
            frontier = frontier[:budget]
        log(f"Round {rnd}: fetching {len(frontier)} URLs")

        if limiter is not None:
            for u in frontier:  # reference politeness: wait per domain
                limiter.wait(urlparse(u).netloc)

        # "fetch": predicate-pushdown lookup of this round's URLs
        fetched = page_ds.to_table(
            columns=["url", "html"], filter=pc.field("url").isin(frontier)
        )
        got_urls = set(fetched["url"].to_pylist())
        missing = [u for u in frontier if u not in got_urls]
        if missing:
            doc_tables.append(
                pa.table(
                    {
                        "url": pa.array(missing, pa.string()),
                        "title": pa.array(missing, pa.string()),
                        "text": pa.array([""] * len(missing), pa.large_string()),
                        "round": pa.array([rnd] * len(missing), pa.int32()),
                        "crawl_failed": pa.array([True] * len(missing), pa.bool_()),
                        "error_message": pa.array(
                            ["fetch failed: not found"] * len(missing), pa.string()
                        ),
                    },
                    schema=DOC_SCHEMA,
                )
            )

        if fetched.num_rows:
            # distribute parse+extract over the cluster
            fetched_ds = ray.data.from_arrow(fetched)

            def work(batch: pa.Table, _rnd=rnd) -> pa.Table:
                docs, edges = _parse_batch(batch, _rnd, domains)
                # multiplex both outputs through one stream; split below
                docs = docs.append_column(
                    "_kind", pa.array(["doc"] * docs.num_rows, pa.string())
                )
                e = pa.table(
                    {
                        "url": edges["src_url"],
                        "title": edges["dst_url"],
                        "text": pa.array([""] * edges.num_rows, pa.large_string()),
                        "round": edges["round"],
                        "crawl_failed": pa.array([False] * edges.num_rows, pa.bool_()),
                        "error_message": pa.array([""] * edges.num_rows, pa.string()),
                        "_kind": pa.array(["edge"] * edges.num_rows, pa.string()),
                    }
                )
                return pa.concat_tables([docs, e])

            out = pa.concat_tables(
                ray.get(
                    fetched_ds.map_batches(
                        work, batch_format="pyarrow", zero_copy_batch=True
                    ).to_arrow_refs()
                )
            )
            kinds = out["_kind"].to_pylist() if out.num_rows else []
            doc_mask = pa.array([k == "doc" for k in kinds], pa.bool_())
            docs_t = out.filter(doc_mask).drop_columns(["_kind"])
            edges_raw = out.filter(pc.invert(doc_mask))
            edges_t = pa.table(
                {
                    "src_url": edges_raw["url"],
                    "dst_url": edges_raw["title"],
                    "round": edges_raw["round"],
                },
                schema=EDGE_SCHEMA,
            )
            doc_tables.append(docs_t.cast(DOC_SCHEMA))
            edge_tables.append(edges_t)
            log(
                f"Round {rnd}: parsed {docs_t.num_rows} pages, "
                f"{edges_t.num_rows} links"
                + (f", {len(missing)} failed" if missing else "")
            )

            # next frontier: discovered − visited (D3/J3)
            nxt = []
            for u in edges_t["dst_url"].to_pylist():
                if u not in visited:
                    visited.add(u)
                    nxt.append(u)
            frontier = nxt
        else:
            frontier = []

    docs = (
        pa.concat_tables(doc_tables)
        if doc_tables
        else pa.table({f.name: pa.array([], f.type) for f in DOC_SCHEMA})
    )
    edges = (
        pa.concat_tables(edge_tables)
        if edge_tables
        else pa.table({f.name: pa.array([], f.type) for f in EDGE_SCHEMA})
    )
    return docs, edges

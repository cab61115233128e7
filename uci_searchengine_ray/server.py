"""Thin REST façade over the query engine — the rebuild analog of the
reference's FastAPI surface (backend/app/api/routes.py:51-460), completing
SURVEY §2.10 (round 1 shipped only the CLI half).

Endpoints (GET unless noted), mirroring the reference's shapes:
  /api/search?query=&page=&per_page=      routes.py:378-387 → search envelope
                                          (search.py:119-126 shape)
  /api/databases                          routes.py:62-72   → snapshot catalog
  /api/databases/switch  POST {db_name}   routes.py:73-86   → switch active
  /api/crawler/statistics                 routes.py:281-308 → stats.json +
                                          manifest partition metrics
  /api/crawler/failed-urls                routes.py:406-416 → quarantine rows
Mutating requests require the ``X-Secret-Key`` header when a secret is
configured (routes.py:54-59 analog).

Stdlib ``ThreadingHTTPServer`` — no web framework in this container; the
server is a serving-side driver process (one QueryScorer, reused across
requests; actors behind it scale out via ``search_batch``/``ShardedSearcher``
for throughput serving).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse


class SearchServer:
    def __init__(
        self,
        index_dir: Optional[str] = None,
        catalog_root: Optional[str] = None,
        mode: str = "reference",
        secret_key: Optional[str] = None,
    ):
        if index_dir is None and catalog_root is None:
            raise ValueError("need index_dir or catalog_root")
        self._catalog = None
        if catalog_root is not None:
            from .sources.catalog import SnapshotCatalog

            self._catalog = SnapshotCatalog(catalog_root)
            if index_dir is None:
                active = self._catalog.active()
                index_dir = self._catalog.path(active) if active else None
        self._index_dir = index_dir
        self._mode = mode
        self._secret = secret_key
        self._scorer = None
        self._lock = threading.Lock()
        self._httpd: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    # -- scorer lifecycle (re-pointed on database switch) ------------------

    def _get_scorer(self):
        from .pipelines.search import QueryScorer

        with self._lock:
            if self._scorer is None:
                if self._index_dir is None:
                    raise RuntimeError("no active index")
                self._scorer = QueryScorer(self._index_dir, mode=self._mode)
            return self._scorer

    def switch(self, name: str) -> str:
        if self._catalog is None:
            raise RuntimeError("no catalog configured")
        path = self._catalog.switch(name)
        with self._lock:
            self._index_dir = path
            self._scorer = None  # reload on next query
        return path

    # -- request handling --------------------------------------------------

    def _handle(self, method: str, path: str, query: dict, body: dict,
                headers) -> tuple:
        from .pipelines.search import search_one

        if path == "/api/search" and method == "GET":
            q = (query.get("query") or [""])[0]
            page = int((query.get("page") or ["1"])[0])
            per_page = int((query.get("per_page") or ["10"])[0])
            self._get_scorer()  # fail fast with 500 when no index
            out = search_one(
                self._index_dir, q, page=page, per_page=per_page,
                mode=self._mode,
            )
            return 200, out

        if path == "/api/databases" and method == "GET":
            if self._catalog is None:
                return 200, {"databases": [], "active": self._index_dir}
            return 200, {
                "databases": self._catalog.list(),
                "active": self._catalog.active(),
            }

        if path == "/api/databases/switch" and method == "POST":
            if self._secret and headers.get("X-Secret-Key") != self._secret:
                return 401, {"detail": "invalid secret key"}
            name = body.get("db_name")
            if not name:
                return 400, {"detail": "db_name required"}
            return 200, {"active": name, "path": self.switch(name)}

        if path == "/api/crawler/statistics" and method == "GET":
            from .pipelines.index_build import load_stats
            from .state import manifest

            stats = load_stats(self._index_dir)
            rows = manifest.stage_metrics(self._index_dir, "runs")
            return 200, {
                **stats,
                "partitions": len(rows),
                "documents_crawled": stats.get("n_docs", 0),
                "total_words": stats.get("total_tokens", 0),
            }

        if path == "/api/crawler/failed-urls" and method == "GET":
            from .state.docstore import quarantine_listing

            tbl = quarantine_listing(self._index_dir)
            return 200, {"failed_urls": tbl.to_pylist()}

        return 404, {"detail": "not found"}

    # -- http plumbing -----------------------------------------------------

    def serve(self, host: str = "127.0.0.1", port: int = 0) -> int:
        """Start serving on a background thread; returns the bound port."""
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _run(self, method):
                u = urlparse(self.path)
                body = {}
                if method == "POST":
                    n = int(self.headers.get("Content-Length") or 0)
                    if n:
                        try:
                            body = json.loads(self.rfile.read(n))
                        except json.JSONDecodeError:
                            self._send(400, {"detail": "bad json"})
                            return
                try:
                    code, payload = outer._handle(
                        method, u.path, parse_qs(u.query), body, self.headers
                    )
                except Exception as e:  # route errors → 500 JSON, keep serving
                    code, payload = 500, {"detail": str(e)}
                self._send(code, payload)

            def _send(self, code, payload):
                data = json.dumps(payload).encode("utf-8")
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                self._run("GET")

            def do_POST(self):
                self._run("POST")

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self._httpd.server_address[1]

    def close(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

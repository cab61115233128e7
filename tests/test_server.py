"""REST façade tests (SURVEY §2.10; reference routes.py surface parity):
in-process HTTP against a localhost ephemeral port."""

import http.client
import json

import pytest

from uci_searchengine_ray.config import EngineConfig
from uci_searchengine_ray.pipelines.index_build import build_index
from uci_searchengine_ray.pipelines.search import search_one
from uci_searchengine_ray.server import SearchServer
from uci_searchengine_ray.sources.catalog import SnapshotCatalog
from uci_searchengine_ray.sources.corpus import write_synthetic_corpus


@pytest.fixture(scope="module")
def served(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("srv")
    corpus = write_synthetic_corpus(str(root / "corpus"), n_docs=200, n_files=2)
    idx_a = build_index(
        corpus, str(root / "idx_a"),
        EngineConfig(mode="reference", block_size=32, num_shards=2),
        mode="fresh",
    )
    idx_b = build_index(
        corpus, str(root / "idx_b"),
        EngineConfig(mode="reference", block_size=32, num_shards=2),
        mode="fresh",
    )
    cat = SnapshotCatalog(str(root / "cat"))
    cat.register("snap_a", idx_a)
    cat.register("snap_b", idx_b)
    cat.switch("snap_a")
    srv = SearchServer(catalog_root=str(root / "cat"), secret_key="s3cr3t")
    port = srv.serve()
    yield srv, port, idx_a
    srv.close()


def _req(port, method, path, body=None, headers=None):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request(
        method, path,
        body=json.dumps(body) if body is not None else None,
        headers=headers or {},
    )
    r = conn.getresponse()
    out = json.loads(r.read().decode())
    conn.close()
    return r.status, out


def test_search_endpoint_matches_search_one(served):
    srv, port, idx = served
    st, out = _req(port, "GET", "/api/search?query=return+the&page=1&per_page=5")
    assert st == 200
    want = search_one(idx, "return the", page=1, per_page=5)
    assert out["total_results"] == want["total_results"]
    assert out["total_pages"] == want["total_pages"]
    assert [r["doc_id"] for r in out["results"]] == [
        r["doc_id"] for r in want["results"]
    ]
    assert out["results"][0]["snippet"] == want["results"][0]["snippet"]


def test_databases_and_switch(served):
    srv, port, _ = served
    st, out = _req(port, "GET", "/api/databases")
    assert st == 200 and out["active"] == "snap_a"
    names = {d["name"] for d in out["databases"]}
    assert {"snap_a", "snap_b"} <= names

    # switch requires the secret
    st, out = _req(port, "POST", "/api/databases/switch",
                   body={"db_name": "snap_b"})
    assert st == 401
    st, out = _req(port, "POST", "/api/databases/switch",
                   body={"db_name": "snap_b"},
                   headers={"X-Secret-Key": "s3cr3t"})
    assert st == 200 and out["active"] == "snap_b"
    st, out = _req(port, "GET", "/api/databases")
    assert out["active"] == "snap_b"
    # queries still work against the switched snapshot
    st, out = _req(port, "GET", "/api/search?query=return")
    assert st == 200 and out["total_results"] > 0


def test_statistics_and_failed_urls(served):
    srv, port, _ = served
    st, out = _req(port, "GET", "/api/crawler/statistics")
    assert st == 200
    assert out["documents_crawled"] == out["n_docs"] > 0
    assert out["total_words"] > 0 and out["partitions"] >= 1
    st, out = _req(port, "GET", "/api/crawler/failed-urls")
    assert st == 200 and isinstance(out["failed_urls"], list)


def test_unknown_route_404(served):
    srv, port, _ = served
    st, out = _req(port, "GET", "/api/nope")
    assert st == 404

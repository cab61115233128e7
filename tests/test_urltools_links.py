"""URL tools, link extraction (FIXTURES.md §2 HTML fixture), frontier
anti-join, snapshot catalog."""

import os

import pyarrow as pa
import pytest

from uci_searchengine_ray.functions import urltools
from uci_searchengine_ray.sources.catalog import SnapshotCatalog


# mirrors the reference's only HTML fixture: 2 internal + 1 external link
# (backend/tests/test_crawler_service.py:20-31), extended with fragment,
# mailto, self-link, duplicate
SAMPLE_HTML = """
<html><body>
  <a href="https://www.ics.uci.edu/page1">internal 1</a>
  <a href="/page2">internal 2 (relative)</a>
  <a href="https://www.example.com/">external</a>
  <a href="#section">fragment</a>
  <a href="mailto:someone@uci.edu">mail</a>
  <a href="https://www.ics.uci.edu/base">self</a>
  <a href="https://www.ics.uci.edu/page1">duplicate</a>
</body></html>
"""
PAGE_URL = "https://www.ics.uci.edu/base"


def test_normalize_url():
    f = urltools.normalize_url
    assert f("HTTPS://WWW.ICS.UCI.EDU/Path/") == "https://www.ics.uci.edu/path"
    assert f("https://x.uci.edu/a?utm=1") == "https://x.uci.edu/a"
    assert f("https://x.uci.edu/a.php?id=3") == "https://x.uci.edu/a.php?id=3"
    assert f("https://x.uci.edu/a?page=2") == "https://x.uci.edu/a?page=2"


def test_domain_filters_match_reference_tests():
    """Golden table from reference test_is_valid_uci_url (tests:88-101):
    the strict validator accepts the 4 school domains, rejects example.com,
    bare uci.edu and other.uci.edu."""
    strict = urltools.is_valid_url_strict
    for ok in (
        "https://www.ics.uci.edu/page",
        "https://cs.uci.edu/",
        "https://informatics.uci.edu/x",
        "https://stat.uci.edu/y",
    ):
        assert strict(ok), ok
    for bad in (
        "https://www.example.com/",
        "https://uci.edu/",
        "https://other.uci.edu/",
        "not a url",
        "",
    ):
        assert not strict(bad), bad
    # the wired, permissive variant accepts any uci.edu substring
    assert urltools.is_allowed_domain("https://other.uci.edu/")
    assert not urltools.is_allowed_domain("https://example.com/")


def test_extract_links_golden():
    links = urltools.extract_links(PAGE_URL, SAMPLE_HTML)
    assert links == [
        "https://www.ics.uci.edu/page1",
        "https://www.ics.uci.edu/page2",
        "https://www.example.com",
    ]


def test_edges_stage_and_frontier(ray_session):
    import ray.data
    from uci_searchengine_ray.stages.links import extract_edges, frontier_minus_visited

    pages = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "url": pa.array([PAGE_URL], pa.string()),
                "html": pa.array([SAMPLE_HTML], pa.string()),
            }
        )
    )
    edges = extract_edges(pages)
    rows = edges.take_all()
    # external link filtered by the domain allow-filter; 2 internal edges kept
    assert {(r["src_doc_id"], r["dst_url"]) for r in rows} == {
        (1, "https://www.ics.uci.edu/page1"),
        (1, "https://www.ics.uci.edu/page2"),
    }
    frontier = frontier_minus_visited(edges, {"https://www.ics.uci.edu/page1"})
    assert [r["url"] for r in frontier.take_all()] == ["https://www.ics.uci.edu/page2"]


def _fake_snapshot(root, name, n_docs=10):
    import json

    p = os.path.join(root, name)
    os.makedirs(p)
    with open(os.path.join(p, "stats.json"), "w") as f:
        json.dump({"n_docs": n_docs, "n_terms": 5, "mode": "reference"}, f)
    with open(os.path.join(p, "data.parquet"), "wb") as f:
        f.write(b"stub")
    return p


def test_catalog_lifecycle(tmp_path):
    root = str(tmp_path / "catalog")
    cat = SnapshotCatalog(root)
    _fake_snapshot(root, "snapA")
    _fake_snapshot(root, "snapB", n_docs=20)

    names = [s["name"] for s in cat.list()]
    assert names == ["snapA", "snapB"]
    assert cat.active() is None

    cat.switch("snapA")
    assert cat.active() == "snapA"
    assert [s for s in cat.list() if s["active"]][0]["name"] == "snapA"

    with pytest.raises(FileNotFoundError):
        cat.switch("nope")
    with pytest.raises(ValueError):
        cat.switch("../evil")

    # export → delete → import round-trip with collision dedupe
    tar = str(tmp_path / "snapA.tgz")
    cat.export_tar("snapA", tar)
    imported = cat.import_tar(tar)  # collides with live snapA → suffixed
    assert imported.startswith("snapA_")
    cat.delete("snapA")
    assert cat.active() is None
    assert {s["name"] for s in cat.list()} == {"snapB", imported}


def test_register_copy_and_incomplete_guard(tmp_path):
    root = str(tmp_path / "cat2")
    cat = SnapshotCatalog(root)
    src = _fake_snapshot(str(tmp_path), "outside")
    name = cat.register("mysnap", src)
    assert name == "mysnap"
    assert os.path.exists(src)  # copy, not move
    incomplete = os.path.join(root, "broken")
    os.makedirs(incomplete)
    with pytest.raises(ValueError):
        cat.switch("broken")

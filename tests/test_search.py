"""Conformance: engine reference mode vs pure-Python oracle (rank-identical,
scores rtol 1e-9, snippets string-equal) + BM25 TAAT≡WAND + actor-pool path
(SURVEY.md §5 item 2, FIXTURES.md §4)."""

import numpy as np
import pytest

from uci_searchengine_ray.functions.hashing import stable_doc_id
from uci_searchengine_ray.oracle import OracleIndex
from uci_searchengine_ray.pipelines.search import (
    PostingsIndex,
    score_bm25_taat,
    score_bm25_wand,
    score_reference,
    search_batch,
    search_one,
)
from uci_searchengine_ray.sources.corpus import synthetic_corpus_table

# golden query set per FIXTURES.md §4: single term; multi-term OR; duplicated
# term; absent term; every-doc hot term (df=N edge); punctuation-laden; empty;
# camel/snake variants; unicode
GOLDEN_QUERIES = [
    "return",
    "error",
    "the self value",
    "x x",                      # duplicate term counts twice (search.py:89)
    "zzz_absent_term",
    "return zzz_absent_term",
    "def snake_case_name",
    "camelcasename",
    "!!! value...",
    "",
    "   ",
    "naïve",
    "404 http",
]


@pytest.fixture(scope="module")
def oracle():
    tbl = synthetic_corpus_table(0, 600)
    docs = [
        (stable_doc_id(r, p, c), t)
        for r, p, c, t in zip(
            tbl["repo"].to_pylist(), tbl["path"].to_pylist(),
            tbl["commit"].to_pylist(), tbl["content"].to_pylist(),
        )
    ]
    return OracleIndex(docs)


@pytest.fixture(scope="module")
def index(built_index):
    return PostingsIndex(built_index)


@pytest.mark.parametrize("query", GOLDEN_QUERIES)
def test_rank_identical_vs_oracle(index, oracle, query):
    ids, scores = score_reference(index, query)
    expected = oracle.search(query, page=1, per_page=10**9)["results"]
    assert list(ids) == [r["doc_id"] for r in expected]
    np.testing.assert_allclose(
        scores, [r["score"] for r in expected], rtol=1e-9
    )


@pytest.mark.parametrize("page,per_page", [(1, 10), (2, 10), (1, 3), (5, 7), (99, 10)])
def test_pagination_and_snippets(built_index, oracle, page, per_page):
    q = "the self value"
    env = search_one(built_index, q, page=page, per_page=per_page)
    exp = oracle.search(q, page=page, per_page=per_page)
    assert env["total_results"] == exp["total_results"]
    assert env["total_pages"] == exp["total_pages"]
    assert [r["doc_id"] for r in env["results"]] == [r["doc_id"] for r in exp["results"]]
    assert [r["snippet"] for r in env["results"]] == [r["snippet"] for r in exp["results"]]


@pytest.mark.parametrize("query", [q for q in GOLDEN_QUERIES if q.strip()])
@pytest.mark.parametrize("k", [1, 5, 50])
def test_wand_equals_taat(index, query, k):
    """Block-max WAND top-k ≡ exhaustive TAAT top-k (ids AND scores)."""
    t_ids, t_scores = score_bm25_taat(index, query, top_k=k)
    w_ids, w_scores = score_bm25_wand(index, query, top_k=k)
    assert list(w_ids) == list(t_ids)
    np.testing.assert_allclose(w_scores, t_scores, rtol=1e-12)


def test_bm25_scores_positive_and_sorted(index):
    ids, scores = score_bm25_taat(index, "merge shard block")
    assert np.all(scores[:-1] >= scores[1:] - 1e-15)
    assert np.all(scores > 0)


def test_actor_pool_batch_search(ray_session, built_index, oracle):
    """search_batch through map_batches(QueryScorer, concurrency=2)."""
    queries = [
        {"query_id": i, "query": q, "page": 1, "per_page": 10}
        for i, q in enumerate(GOLDEN_QUERIES)
    ]
    out = search_batch(built_index, queries, mode="reference", concurrency=2)
    rows = out.take_all()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for i, q in enumerate(GOLDEN_QUERIES):
        got = sorted(by_q.get(i, []), key=lambda r: r["rank"])
        exp = oracle.search(q, page=1, per_page=10)
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in exp["results"]], q
        if got:
            assert got[0]["total_results"] == exp["total_results"]
            assert got[0]["url"] != ""

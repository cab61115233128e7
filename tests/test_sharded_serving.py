"""Scatter-gather sharded serving ≡ single-index scoring."""

import numpy as np
import pytest

from uci_searchengine_ray.pipelines.search import (
    PostingsIndex,
    ShardedSearcher,
    score_reference,
)

QUERIES = ["return", "the self value", "x x", "error 404", "zzz_absent_term", ""]


@pytest.fixture(scope="module")
def sharded(ray_session, built_index):
    s = ShardedSearcher(built_index, n_groups=2, mode="reference")
    yield s
    s.shutdown()


def test_sharded_matches_full(built_index, sharded):
    full = PostingsIndex(built_index)
    for q in QUERIES:
        ids_f, sc_f = score_reference(full, q)
        ids_s, sc_s = sharded.search(q, page=1, per_page=0)  # 0 = all
        assert list(ids_s) == list(ids_f), q
        np.testing.assert_allclose(sc_s, sc_f, rtol=1e-12, err_msg=q)


def test_sharded_pagination(built_index, sharded):
    full = PostingsIndex(built_index)
    ids_f, _ = score_reference(full, "the self value")
    ids_p2, _ = sharded.search("the self value", page=2, per_page=5)
    assert list(ids_p2) == list(ids_f[5:10])


def test_sharded_envelope_totals_and_bounded_gather(built_index, sharded):
    full = PostingsIndex(built_index)
    for q in ["return", "the self value"]:
        ids_f, _ = score_reference(full, q)
        ids_s, sc_s, total = sharded.search_envelope(q, page=1, per_page=5)
        assert total == len(ids_f), q
        assert list(ids_s) == list(ids_f[:5]), q
        # the driver received only the page slice, not the match set
        assert sharded.last_gather_rows == min(5, total), q


def test_sharded_topk_reference_mode_rejected(sharded):
    with pytest.raises(ValueError, match="non-negative"):
        sharded.search_topk("return", k=3)


@pytest.fixture(scope="module")
def sharded_bm25(ray_session, built_index):
    from uci_searchengine_ray.pipelines.search import ShardedSearcher

    s = ShardedSearcher(built_index, n_groups=2, mode="bm25")
    yield s
    s.shutdown()


def test_sharded_topk_matches_taat(built_index, sharded_bm25):
    from uci_searchengine_ray.pipelines.search import score_bm25_taat

    full = PostingsIndex(built_index)
    for q in ["return", "the self value", "error 404"]:
        k = 5
        ids_f, sc_f = score_bm25_taat(full, q, top_k=k)
        ids_s, sc_s = sharded_bm25.search_topk(q, k=k)
        assert list(ids_s) == list(ids_f), q
        np.testing.assert_allclose(sc_s, sc_f, rtol=1e-12, err_msg=q)


def test_sharded_topk_gather_is_bounded(built_index, sharded_bm25):
    """The threshold algorithm must not ship every match to the driver: for
    a dense query the driver-side gather stays far below the match count
    (the old design gathered all of it)."""
    from uci_searchengine_ray.pipelines.search import score_bm25_taat

    full = PostingsIndex(built_index)
    q = "return"  # dense code-mode term ("the" is a stopword here)
    n_matches = len(score_bm25_taat(full, q, top_k=None)[0])
    assert n_matches > 100  # dense enough for the bound to mean something
    ids_s, _ = sharded_bm25.search_topk(q, k=3, kp0=16)
    assert len(ids_s) == 3
    assert sharded_bm25.last_gather_rows < n_matches


def test_sharded_topk_exhaustion_path(built_index, sharded_bm25):
    """kp larger than every shard's match count → exhausted on round one,
    exact even though no threshold pruning happened."""
    from uci_searchengine_ray.pipelines.search import score_bm25_taat

    full = PostingsIndex(built_index)
    q = "zzz_absent_term"
    assert sharded_bm25.search_topk(q, k=3)[0].size == 0
    ids_f, _ = score_bm25_taat(full, "error 404", top_k=4)
    ids_s, _ = sharded_bm25.search_topk("error 404", k=4, kp0=100000)
    assert list(ids_s) == list(ids_f)

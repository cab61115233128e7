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

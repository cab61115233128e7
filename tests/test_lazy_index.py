"""Lazy PostingsIndex loading (VERDICT r1 item #3): __init__ must load block
metadata only; payloads page in per query term and evict under a byte budget
with no effect on results."""

import numpy as np
import pytest

from uci_searchengine_ray.config import EngineConfig
from uci_searchengine_ray.pipelines.index_build import build_index
from uci_searchengine_ray.pipelines.search import (
    PostingsIndex,
    score_bm25_taat,
    score_bm25_wand,
    score_reference,
)
from uci_searchengine_ray.sources.corpus import write_synthetic_corpus


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    d = tmp_path_factory.mktemp("lazy")
    corpus = write_synthetic_corpus(str(d / "corpus"), n_docs=400, n_files=4)
    return build_index(
        corpus,
        str(d / "idx"),
        EngineConfig(mode="code", block_size=32, num_shards=4),
        mode="fresh",
    )


def test_init_loads_metadata_only(idx):
    pi = PostingsIndex(idx)
    assert pi._payload_bytes == 0          # nothing paged in yet
    assert pi.meta_bytes > 0
    ids, scores = score_bm25_taat(pi, "return value stream")
    assert len(ids) > 0
    assert pi._payload_bytes > 0           # query terms now resident
    # payloads are a strict subset of the vocabulary
    assert len(pi._payloads) < len(list(pi.terms()))


def test_preload_matches_lazy(idx):
    lazy, eager = PostingsIndex(idx), PostingsIndex(idx, preload=True)
    assert eager._payload_bytes > 0 and len(eager._payloads) == len(
        list(eager.terms())
    )
    for q in ["return value", "parse json error", "self x", "qq_missing"]:
        il, cl = score_bm25_taat(lazy, q)
        ie, ce = score_bm25_taat(eager, q)
        assert np.array_equal(il, ie) and np.array_equal(cl, ce)
        il, cl = score_reference(lazy, q)
        ie, ce = score_reference(eager, q)
        assert np.array_equal(il, ie) and np.array_equal(cl, ce)


def test_tiny_budget_evicts_but_stays_correct(idx):
    ref = PostingsIndex(idx, preload=True)
    small = PostingsIndex(idx, payload_budget_bytes=1)
    queries = ["return value", "index block merge", "self data x",
               "return value"]
    for q in queries:
        ia, ca = score_bm25_wand(small, q, top_k=10)
        ib, cb = score_bm25_wand(ref, q, top_k=10)
        assert np.array_equal(ia, ib) and np.array_equal(ca, cb)
    # the 1-byte budget keeps only the most recent query's terms resident
    assert len(small._payloads) <= len("return value".split()) + 1

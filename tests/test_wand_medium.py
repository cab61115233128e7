"""Block-max WAND vs TAAT at medium scale with a long-tail vocab (digit
terms): bit-identical ids AND scores, incl. the fp-tie ordering and
shallow-block-advance cases that a tiny index cannot exercise."""

import numpy as np
import pytest

from uci_searchengine_ray.config import EngineConfig
from uci_searchengine_ray.pipelines.index_build import build_index
from uci_searchengine_ray.pipelines.search import (
    PostingsIndex,
    score_bm25_taat,
    score_bm25_wand,
)
from uci_searchengine_ray.sources.corpus import write_synthetic_corpus

QUERIES = [
    "9999 value",              # rare + dense (skip-friendly at small k)
    "1234 index error",
    "7777 block stream value",
    "parse json value error",
    "get value stream block",
    "return the self",
    "42 877 3001",             # all-rare
    "zzz_absent_term",
    "",
]


@pytest.fixture(scope="module")
def medium_index(ray_session, tmp_path_factory):
    root = tmp_path_factory.mktemp("wand")
    corpus = str(root / "corpus")
    write_synthetic_corpus(corpus, n_docs=2500, n_files=8)
    snap = str(root / "idx")
    build_index(
        corpus, snap,
        EngineConfig(mode="code", block_size=32, num_shards=4,
                     num_merge_groups=16, ckpt_groups=1),
        mode="fresh",
    )
    return PostingsIndex(snap)


@pytest.mark.parametrize("k", [1, 5, 10, 50])
def test_wand_bit_identical(medium_index, k):
    for q in QUERIES:
        ids_t, sc_t = score_bm25_taat(medium_index, q, top_k=k)
        ids_w, sc_w = score_bm25_wand(medium_index, q, top_k=k)
        assert list(ids_w) == list(ids_t), q
        assert np.array_equal(sc_w, sc_t), q  # bit-exact, not just close


def test_wand_actually_skips_blocks(medium_index):
    """At k smaller than a rare term's df, the dense term's blocks must be
    skippable once the heap fills with rare-term docs."""
    rare = next(
        t for t in sorted(medium_index.terms())
        if t.isdigit() and medium_index.df(t) >= 3
    )
    s: dict = {}
    ids, _ = score_bm25_wand(medium_index, f"{rare} value", top_k=1, stats=s)
    assert len(ids) == 1
    assert s["blocks_total"] > 0
    assert s["blocks_decoded"] < s["blocks_total"], (
        f"selective query ({rare}, df={medium_index.df(rare)}) at k=1 "
        "must skip at least one block"
    )

"""Randomized whole-pipeline conformance: seeded random corpora (messy
content: punctuation, unicode, duplicates, empty docs) through the REAL
build pipeline, scored in reference mode, must be rank-identical to the
pure-Python oracle for random queries (SURVEY.md §5 item 2, generalized
beyond the fixed golden set)."""

import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from uci_searchengine_ray.config import EngineConfig
from uci_searchengine_ray.functions.hashing import stable_doc_id
from uci_searchengine_ray.oracle import OracleIndex
from uci_searchengine_ray.pipelines.index_build import build_index
from uci_searchengine_ray.pipelines.search import PostingsIndex, score_reference

WORDS = [
    "alpha", "beta", "Gamma", "DELTA", "x1", "snake_case", "camelCase",
    "naïve", "的", "err-or", "a.b", "42", "", "the", "!!!", "x", "_",
]


def _random_doc(rng: random.Random) -> str:
    n = rng.randint(0, 30)
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _random_query(rng: random.Random) -> str:
    n = rng.randint(1, 4)
    toks = [rng.choice(WORDS) for _ in range(n)]
    if rng.random() < 0.3 and toks:
        toks.append(toks[0])  # force duplicate-term case
    return " ".join(toks)


@pytest.mark.parametrize("seed", [11, 23, 37])
def test_random_corpus_rank_identical(ray_session, tmp_path, seed):
    rng = random.Random(seed)
    n_docs = rng.randint(8, 40)
    contents = [_random_doc(rng) for _ in range(n_docs)]
    if rng.random() < 0.8 and n_docs >= 2:
        contents[1] = contents[0]  # exact dup pair

    repos = [f"o/r{i%3}" for i in range(n_docs)]
    paths = [f"f{i}.py" for i in range(n_docs)]
    commits = [f"c{i}" for i in range(n_docs)]
    tbl = pa.table(
        {
            "repo": pa.array(repos), "path": pa.array(paths),
            "commit": pa.array(commits),
            "lang": pa.array(["py"] * n_docs),
            "content": pa.array(contents, pa.large_string()),
        }
    )
    cdir = tmp_path / "c"
    cdir.mkdir()
    pq.write_table(tbl, str(cdir / "p.parquet"))

    snap = str(tmp_path / "i")
    build_index(
        str(cdir), snap,
        EngineConfig(mode="reference", block_size=rng.choice([2, 3, 8]),
                     num_shards=rng.choice([1, 3]), num_merge_groups=4,
                     ckpt_groups=1),
        mode="fresh",
    )
    idx = PostingsIndex(snap)
    oracle = OracleIndex(
        [(stable_doc_id(r, p, c), t)
         for r, p, c, t in zip(repos, paths, commits, contents)]
    )
    assert idx.n_docs == oracle.n_docs == n_docs

    for _ in range(12):
        q = _random_query(rng)
        ids, scores = score_reference(idx, q)
        expect = oracle.search(q, per_page=10**9)["results"]
        assert list(ids) == [r["doc_id"] for r in expect], repr(q)
        np.testing.assert_allclose(
            scores, [r["score"] for r in expect], rtol=1e-9,
            err_msg=repr(q),
        )

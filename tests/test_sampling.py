"""Deterministic mixture sampling (pipelines/sampling.py): stratified
per-group hash-rank sample and token-budget greedy mix — randomized
conformance vs the window-function oracle, multi-block exactness, and
pinned edge semantics (crossing doc kept, tiny groups, empty text)."""

from __future__ import annotations

import os
import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
WORDS = ["alpha", "beta", "gamma", "delta", "merge", "vector", "x1"]


def _write_single(path, texts, langs):
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs),
                "source": pa.array([f"s{i % 3}" for i in range(n)]),
                "n_chars": pa.array(
                    np.asarray([len(t or "") for t in texts], np.int64)
                ),
            }
        ),
        os.path.join(path, "documents.parquet"),
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _oracle(sf_dir: str, key: str) -> pd.DataFrame:
    import __ray_entry__ as e

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    return con.execute(e.oracle_sql()[key]).fetchdf()


@pytest.mark.parametrize("seed", [5, 31])
def test_sampling_conformance_synthetic(ray_session, tmp_path, seed):
    """Skewed langs (one tiny group < n, one huge), empty and null-ish
    texts; both operators must equal their window-function oracles."""
    import __ray_entry__ as e
    from uci_searchengine_ray.pipelines import sampling

    rng = random.Random(seed)
    n = 300
    langs = (
        ["en"] * 200 + ["de"] * 70 + ["xx"] * 3 + ["fr"] * 27
    )
    rng.shuffle(langs)
    texts = [
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 40)))
        for _ in range(n)
    ]
    texts[7] = ""  # zero tokens
    d = tmp_path / f"s{seed}"
    d.mkdir()
    _write_single(str(d), texts, langs)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(str(d), 'documents.parquet')}')"
    )
    for key, fn in (
        ("stratified_sample", sampling.stratified_sample),
        ("token_budget_mix", sampling.token_budget_mix),
        ("pack_sequences", sampling.pack_sequences),
    ):
        mine = _canon(fn(str(d)).to_pandas())
        theirs = _canon(con.execute(e.oracle_sql()[key]).fetchdf())
        assert list(mine.columns) == list(theirs.columns), key
        pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)

    # tiny group: all 3 'xx' docs sampled, ranks 0..2
    s = sampling.stratified_sample(str(d)).to_pandas()
    xx = s[s["lang"] == "xx"].sort_values("sample_rank")
    assert len(xx) == 3 and xx["sample_rank"].tolist() == [0, 1, 2]
    # big group capped at exactly n_per_group
    assert (s.groupby("lang").size() <= 40).all()


def test_token_budget_crossing_doc_kept(ray_session, tmp_path):
    """Small budget: selection stops at (and includes) the doc whose
    running total crosses the budget, in (hash, doc_id) order."""
    from uci_searchengine_ray.pipelines import sampling

    texts = ["tok " * 10] * 8  # 10 tokens each
    d = tmp_path / "cross"
    d.mkdir()
    _write_single(str(d), texts, ["en"] * 8)
    out = sampling.token_budget_mix(str(d), budget=25).to_pandas()
    out = out.sort_values("cum_tokens").reset_index(drop=True)
    # 10+10 < 25 → third doc crosses and is kept; fourth is not
    assert out["cum_tokens"].tolist() == [10, 20, 30]
    # order is the Knuth hash order, recomputable from doc_id alone
    ids = out["doc_id"].to_numpy(np.uint64)
    h = ((ids % np.uint64(1 << 32)) * np.uint64(2654435761)) % np.uint64(
        1 << 32
    )
    assert (np.diff(h.astype(np.int64)) > 0).all()


def test_pack_sequences_semantics(ray_session, tmp_path):
    """Pinned packing: docs laid head-to-tail in hash order; a doc whose
    start crosses a sequence boundary gets the next seq_id; the stream is
    gapless (each doc starts where the previous ended)."""
    from uci_searchengine_ray.pipelines import sampling

    texts = ["tok " * 30] * 9  # 30 tokens each; seq_len 64 below
    d = tmp_path / "pack"
    d.mkdir()
    _write_single(str(d), texts, ["en"] * 9)
    out = sampling.pack_sequences(str(d), seq_len=64).to_pandas()
    assert len(out) == 9
    # reconstruct the stream: sort by (seq_id, seq_offset) — positions must
    # be exactly the running totals 0,30,60,...,240 laid over 64-token seqs
    out = out.sort_values(["seq_id", "seq_offset"]).reset_index(drop=True)
    starts = (out["seq_id"] * 64 + out["seq_offset"]).tolist()
    assert starts == [30 * i for i in range(9)]
    assert out["seq_id"].tolist() == [(30 * i) // 64 for i in range(9)]


def test_sampling_conformance_sf(ray_session):
    """Real-testdata conformance at sf0.001 (the driver's own check)."""
    import __ray_entry__ as e
    from uci_searchengine_ray.pipelines import sampling

    for key, fn in (
        ("stratified_sample", sampling.stratified_sample),
        ("token_budget_mix", sampling.token_budget_mix),
        ("pack_sequences", sampling.pack_sequences),
    ):
        mine = _canon(fn(SF).to_pandas())
        theirs = _canon(_oracle(SF, key))
        assert len(mine) > 0
        pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_stratified_multiblock_exact(ray_session, tmp_path):
    """The map-side candidate cut must be exact across many small blocks:
    force multi-file input and compare against a single-partition run."""
    from uci_searchengine_ray.pipelines import sampling

    rng = random.Random(3)
    n = 240
    texts = [
        " ".join(rng.choice(WORDS) for _ in range(5)) for _ in range(n)
    ]
    langs = [rng.choice(["en", "de"]) for _ in range(n)]
    # documents.parquet as a multi-file DIRECTORY dataset → many read
    # blocks → the per-batch candidate cut path is actually exercised
    d = tmp_path / "mb"
    d.mkdir()
    ddir = d / "documents.parquet"
    ddir.mkdir()
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array(
                np.asarray([len(t) for t in texts], np.int64)
            ),
        }
    )
    for fi in range(6):
        pq.write_table(tbl.slice(fi * 40, 40), str(ddir / f"f{fi}.parquet"))

    out = sampling.stratified_sample(str(d), n_per_group=15).to_pandas()
    # exact: equals a driver-side recomputation over the full table
    df = tbl.to_pandas()
    ids = df["doc_id"].to_numpy(np.uint64)
    df["h"] = (
        (ids % np.uint64(1 << 32)) * np.uint64(2654435761)
    ) % np.uint64(1 << 32)
    expect = (
        df.sort_values(["lang", "h", "doc_id"])
        .groupby("lang")
        .head(15)["doc_id"]
        .tolist()
    )
    assert sorted(out["doc_id"]) == sorted(expect)

"""Benchmark decontamination + exact per-group quantiles: randomized
conformance against the driver oracle SQL (planted eval-set 8-gram overlap,
tied/duplicated lengths), plus pinned semantics on tiny corpora."""

from __future__ import annotations

import os
import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

WORDS = ["alpha", "beta", "gamma", "delta", "the", "of", "x1", "merge"]


def _write_docs(path, texts, langs=None):
    n = len(texts)
    langs = langs or ["en"] * n
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs),
                "source": pa.array([f"s{i % 3}" for i in range(n)]),
                "n_chars": pa.array(
                    np.asarray([len(t) for t in texts], np.int64)
                ),
            }
        ),
        os.path.join(path, "documents.parquet"),
    )


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = np.round(df[c].astype(np.float64), 6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


@pytest.mark.parametrize("seed", [3, 29])
def test_decontaminate_conformance(ray_session, tmp_path, seed):
    """Planted contamination: some train docs embed a verbatim ≥8-token run
    copied from an eval doc (doc_id % 37 == 0); others share only shorter
    runs.  Ray gram-hash membership must equal the oracle's string join."""
    import __ray_entry__ as e
    from uci_searchengine_ray.pipelines import cleaning

    rng = random.Random(seed)
    n = 80
    texts = [
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 30)))
        for _ in range(n)
    ]
    # doc 0 and 37 are eval docs; plant copies of a 9-token eval span into
    # a handful of train docs (full contamination) and a 7-token prefix of
    # it into others (below the 8-gram threshold on its own)
    eval_span = texts[0].split()[:9]
    while len(eval_span) < 9:
        eval_span.append(rng.choice(WORDS))
    texts[0] = " ".join(eval_span) + " " + texts[0]
    for i in (5, 41, 66):
        texts[i] = texts[i] + " " + " ".join(eval_span)
    for i in (6, 42):
        texts[i] = " ".join(eval_span[:7]) + " " + texts[i]

    d = tmp_path / f"dc{seed}"
    d.mkdir()
    _write_docs(str(d), texts)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(str(d), 'documents.parquet')}')"
    )
    mine = _canon(cleaning.decontaminate(str(d)).to_pandas())
    theirs = _canon(con.execute(e.oracle_sql()["decontaminate"]).fetchdf())
    assert list(mine.columns) == list(theirs.columns)
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)
    flagged = set(mine.loc[mine["contaminated"], "doc_id"])
    assert {5, 41, 66} <= flagged
    assert not mine["doc_id"].isin([0, 37]).any()  # eval docs excluded


def test_decontaminate_pinned(ray_session, tmp_path):
    """8 shared tokens → contaminated; 7 → clean; short docs → 0 grams."""
    from uci_searchengine_ray.pipelines import cleaning

    span = "a b c d e f g h"  # 8 tokens
    texts = ["pre " + span + " post"]  # doc 0: eval (0 % 37 == 0)
    texts += [
        "xx " + span,          # doc 1: shares the full 8-gram
        "xx " + span[:-2],     # doc 2: only 7 tokens shared
        "tiny doc",            # doc 3: < 8 tokens
    ]
    d = tmp_path / "dp"
    d.mkdir()
    _write_docs(str(d), texts)
    out = (
        cleaning.decontaminate(str(d))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["contaminated"].tolist() == [True, False, False]
    assert out["n_shared"].tolist() == [1, 0, 0]


@pytest.mark.parametrize("seed", [7, 23])
def test_length_quantiles_conformance(ray_session, tmp_path, seed):
    """Heavily tied small-int lengths across several langs, checked against
    the quantile_cont oracle AND numpy's linear-interpolation percentile."""
    import __ray_entry__ as e
    from uci_searchengine_ray.functions.rounding import sql_round
    from uci_searchengine_ray.pipelines import analysis

    rng = random.Random(seed)
    n = 400
    langs = [rng.choice(["en", "de", "fr"]) for _ in range(n)]
    # texts whose lengths collide a lot (small-int domain with heavy ties)
    texts = ["x" * rng.choice([0, 1, 2, 3, 5, 5, 5, 8, 13, 100]) for _ in range(n)]
    d = tmp_path / f"q{seed}"
    d.mkdir()
    _write_docs(str(d), texts, langs)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(str(d), 'documents.parquet')}')"
    )
    mine = _canon(analysis.length_quantiles(str(d)).to_pandas())
    theirs = _canon(con.execute(e.oracle_sql()["length_quantiles"]).fetchdf())
    assert list(mine.columns) == list(theirs.columns)
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)

    lens = np.asarray([len(t) for t in texts], np.float64)
    for _, row in mine.iterrows():
        sub = lens[np.asarray(langs) == row["lang"]]
        for col, q in (("p50", 50), ("p90", 90), ("p99", 99)):
            assert row[col] == pytest.approx(
                sql_round(float(np.percentile(sub, q)), 6), abs=1e-9
            )


def test_length_quantiles_single_value_group(ray_session, tmp_path):
    """A lang with one document: all three quantiles equal that length."""
    from uci_searchengine_ray.pipelines import analysis

    d = tmp_path / "q1"
    d.mkdir()
    _write_docs(str(d), ["aaa", "bbbbb", "c"], ["en", "zz", "en"])
    out = (
        analysis.length_quantiles(str(d))
        .to_pandas()
        .set_index("lang")
        .sort_index()
    )
    assert out.loc["zz"].tolist() == [5.0, 5.0, 5.0]
    assert out.loc["en", "p50"] == pytest.approx(2.0)  # interp of 1 and 3


def test_tfidf_keywords_pinned(ray_session, tmp_path):
    """Pinned §1.4 semantics: tf = count/doc_len, idf = ln(N/(df+1)) —
    a term in EVERY doc gets negative idf and sinks below rarer terms
    regardless of tf; rank ties break term-ascending."""
    from uci_searchengine_ray.pipelines.analysis import tfidf_keywords

    d = tmp_path / "tk"
    d.mkdir()
    _write_docs(
        str(d),
        [
            "rare alpha alpha common",
            "common beta",
            "common gamma",
        ],
    )
    out = (
        tfidf_keywords(str(d), k=5)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    d0 = out[out.doc_id == 0]
    # doc 0: alpha (df=1, tf=2/4) > rare (df=1, tf=1/4) > common (idf<0)
    assert d0["term"].tolist() == ["alpha", "rare", "common"]
    assert d0["tfidf"].iloc[0] == round(0.5 * np.log(3 / 2), 6)
    assert d0["tfidf"].iloc[2] == round(0.25 * np.log(3 / 4), 6)
    assert d0["tfidf"].iloc[2] < 0
    # randomized cross-check vs the driver oracle on a nastier corpus
    import __ray_entry__ as e

    rng = random.Random(11)
    texts = [
        " ".join(rng.choice(WORDS) for _ in range(rng.randint(0, 30)))
        for _ in range(40)
    ]
    d2 = tmp_path / "tk2"
    d2.mkdir()
    _write_docs(str(d2), texts)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{os.path.join(str(d2), 'documents.parquet')}')"
    )
    mine = _canon(tfidf_keywords(str(d2)).to_pandas())
    theirs = _canon(con.execute(e.oracle_sql()["tfidf_keywords"]).fetchdf())
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)


def test_decontaminate_against_external_eval(ray_session, tmp_path):
    """Decontamination against an EXTERNAL benchmark table: a planted
    8-gram shared between one training doc and the eval file must flag
    exactly that doc; eval docs are NOT excluded from the training side
    (they live in a different table)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from uci_searchengine_ray.pipelines import cleaning

    gram = "q w e r t y u i"  # 8 tokens
    train = [
        f"prefix {gram} suffix words here",
        "totally unrelated training text with many words",
        "another clean doc " + " ".join(f"t{i}" for i in range(10)),
    ]
    d = tmp_path / "train"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(3, dtype=np.int64)),
                "text": pa.array(train, pa.string()),
            }
        ),
        str(d / "documents.parquet"),
    )
    ev = tmp_path / "eval.parquet"
    pq.write_table(
        pa.table(
            {"text": pa.array([f"benchmark question: {gram}?", "other"])}
        ),
        str(ev),
    )
    out = (
        cleaning.decontaminate_against(str(d), str(ev))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["contaminated"].tolist() == [True, False, False]
    assert out.loc[0, "n_shared"] == 1
    assert len(out) == 3  # every training doc reported

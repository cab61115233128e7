"""CLI façade smoke: build → search → phrase → stats → catalog, in-process."""

import json

import pytest

from uci_searchengine_ray.__main__ import main


def _run(capsys, argv):
    rc = main(argv)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_flow(ray_session, synthetic_corpus_dir, tmp_path, capsys):
    idx = str(tmp_path / "idx")
    built = _run(capsys, [
        "build", "--corpus", synthetic_corpus_dir, "--index", idx,
        "--positions", "--ckpt-groups", "2", "--shards", "2",
    ])
    assert built["n_docs"] == 600 and built["store_positions"] is True

    res = _run(capsys, [
        "search", "--index", idx, "--query", "return self", "--per-page", "3",
    ])
    assert res["total_results"] > 0 and len(res["results"]) == 3
    assert res["results"][0]["score"] > 0

    wand = _run(capsys, [
        "search", "--index", idx, "--query", "error value", "--scorer",
        "bm25_wand",
    ])
    assert wand["results"]

    ph = _run(capsys, ["phrase", "--index", idx, "--query", "snake_case_name"])
    assert ph["results"] and all(r["n_occurrences"] > 0 for r in ph["results"])

    st = _run(capsys, ["stats", "--index", idx])
    assert st["n_docs"] == 600 and st["manifest_rows"] >= 3

    root = str(tmp_path / "cat")
    reg = _run(capsys, ["catalog", "--root", root, "register", "snapA", idx])
    assert reg["registered"] == "snapA"
    sw = _run(capsys, ["catalog", "--root", root, "switch", "snapA"])
    assert sw["active"] == "snapA"
    lst = _run(capsys, ["catalog", "--root", root, "list"])
    assert lst[0]["name"] == "snapA" and lst[0]["active"] is True


def test_cli_curation_and_export(ray_session, tmp_path, capsys):
    sf = "/root/testdata/sf0.001"
    cu = _run(capsys, ["curate", "--sf", sf, "--op", "curate"])
    assert cu["op"] == "curate" and cu["rows"] > 0

    out_dir = str(tmp_path / "spans")
    ds = _run(capsys, ["curate", "--sf", sf, "--op", "dup_spans",
                       "--out", out_dir])
    assert ds["rows"] > 0 and ds["out"] == out_dir

    ex_dir = str(tmp_path / "export")
    ex = _run(capsys, ["export", "--sf", sf, "--out", ex_dir])
    assert ex["docs"] > 0 and ex["shards"] == 8
    # a resumed fully-finished export is a no-op that skips every shard
    ex2 = _run(capsys, ["export", "--sf", sf, "--out", ex_dir, "--resume"])
    assert ex2["docs"] == ex["docs"]
    assert len(ex2["skipped_shards"]) > 0

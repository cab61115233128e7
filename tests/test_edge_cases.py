"""Robustness edges: very large documents, empty corpora, empty-result
serving."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from uci_searchengine_ray.config import EngineConfig
from uci_searchengine_ray.pipelines.index_build import build_index, load_stats
from uci_searchengine_ray.pipelines.search import (
    PostingsIndex,
    score_bm25_taat,
    score_reference,
    search_one,
)

CFG = EngineConfig(ckpt_groups=1, num_shards=2, num_merge_groups=4,
                   tokenize_batch_size=4)


def _write(tmp_path, contents):
    n = len(contents)
    tbl = pa.table(
        {
            "repo": pa.array(["o/r"] * n), "path": pa.array([f"f{i}" for i in range(n)]),
            "commit": pa.array(["c"] * n), "lang": pa.array(["py"] * n),
            "content": pa.array(contents, pa.large_string()),
        }
    )
    d = tmp_path / "c"
    d.mkdir(exist_ok=True)
    pq.write_table(tbl, str(d / "p.parquet"))
    return str(d)


def test_huge_document(ray_session, tmp_path):
    """A multi-MB source file flows through tokenize/encode/serve intact."""
    big = ("def very_long_function_name x y z return value " * 120_000)  # ~5.5 MB
    # 3 docs so idf = ln(N/(df+1)) = ln(3/2) > 0 (with N=2 the reference's
    # own formula zeroes a df=1 term and the score>0 filter drops it)
    corpus = _write(tmp_path, [big, "tiny doc return", "other words"])
    snap = str(tmp_path / "i")
    build_index(corpus, snap, CFG, mode="fresh")
    stats = load_stats(snap)
    assert stats["n_docs"] == 3
    assert stats["total_tokens"] == 120_000 * 7 + 3 + 2
    idx = PostingsIndex(snap)
    ids, scores = score_reference(idx, "very_long_function_name")
    assert len(ids) == 1
    # 960k postings for one term in one doc → many blocks, all ascending
    assert idx.df("return") == 2


def test_empty_corpus_file(ray_session, tmp_path):
    corpus = _write(tmp_path, [])
    snap = str(tmp_path / "i0")
    build_index(corpus, snap, CFG, mode="fresh")
    stats = load_stats(snap)
    assert stats["n_docs"] == 0 and stats["n_terms"] == 0
    idx = PostingsIndex(snap)
    ids, _ = score_reference(idx, "anything")
    assert len(ids) == 0
    ids, _ = score_bm25_taat(idx, "anything")
    assert len(ids) == 0
    env = search_one(snap, "anything")
    assert env["total_results"] == 0 and env["results"] == []


def test_all_unindexable_corpus(ray_session, tmp_path):
    """Docs exist but none tokenize: N counts them, index is empty."""
    corpus = _write(tmp_path, ["", "!!! ...", "   "])
    snap = str(tmp_path / "i1")
    build_index(corpus, snap, CFG, mode="fresh")
    stats = load_stats(snap)
    assert stats["n_docs"] == 3 and stats["n_terms"] == 0
    assert stats["avgdl"] == 0.0


def test_store_content_false(ray_session, tmp_path):
    """Lake-scale forward store: metadata only, serving degrades gracefully."""
    from uci_searchengine_ray.state.docstore import DocStore

    corpus = _write(tmp_path, ["alpha beta gamma", "beta gamma delta", "x y"])
    snap = str(tmp_path / "inc")
    cfg = EngineConfig(ckpt_groups=1, num_shards=2, num_merge_groups=4,
                       store_content=False)
    build_index(corpus, snap, cfg, mode="fresh")
    idx = PostingsIndex(snap)
    ids, scores = score_reference(idx, "alpha")
    assert len(ids) == 1
    store = DocStore(snap)
    row = store.fetch(ids.tolist())[int(ids[0])]
    assert "content" not in row and row["title"]
    env = search_one(snap, "alpha", per_page=5)
    assert env["total_results"] == 1
    assert env["results"][0]["snippet"] == "..."  # no-content fallback


def test_config_drift_rejected_on_continue(ray_session, tmp_path):
    """Resuming with run-shaping knobs that differ from the pinned
    build_config must fail clearly, not merge incompatible runs."""
    import pytest

    from uci_searchengine_ray.config import EngineConfig
    from uci_searchengine_ray.pipelines.index_build import build_index
    from uci_searchengine_ray.sources.corpus import write_synthetic_corpus

    corpus = write_synthetic_corpus(str(tmp_path / "c"), n_docs=60, n_files=2)
    idx = str(tmp_path / "i")
    build_index(corpus, idx, EngineConfig(mode="reference", num_merge_groups=4),
                mode="fresh")
    with pytest.raises(ValueError, match="config drift"):
        build_index(
            corpus, idx,
            EngineConfig(mode="reference", num_merge_groups=4,
                         store_positions=True),
            mode="continue",
        )
    with pytest.raises(ValueError, match="config drift"):
        build_index(corpus, idx,
                    EngineConfig(mode="code", num_merge_groups=4),
                    mode="rebuild")


def test_duplicate_doc_id_clear_error(ray_session, tmp_path):
    """Duplicate (repo, path, commit) identity fails with a diagnosable
    message, not a codec internal."""
    import pyarrow.parquet as pq
    import pytest

    from uci_searchengine_ray.config import EngineConfig
    from uci_searchengine_ray.pipelines.index_build import build_index
    from uci_searchengine_ray.sources.corpus import synthetic_corpus_table

    import pyarrow as pa

    tbl = synthetic_corpus_table(0, 30)
    dup = pa.concat_tables([tbl, tbl.slice(0, 1)])  # repeat one identity
    d = tmp_path / "c"
    d.mkdir()
    pq.write_table(dup, str(d / "part-0.parquet"))
    with pytest.raises(Exception, match="duplicate doc_id"):
        build_index(str(d), str(tmp_path / "i"),
                    EngineConfig(mode="reference"), mode="fresh")


def test_catalog_register_same_second_collisions(tmp_path):
    from uci_searchengine_ray.sources.catalog import SnapshotCatalog

    cat = SnapshotCatalog(str(tmp_path / "cat"))
    names = []
    for i in range(3):
        src = tmp_path / f"snap{i}"
        src.mkdir()
        (src / "stats.json").write_text("{}")
        names.append(cat.register("snap", str(src), move=True))
    assert len(set(names)) == 3  # three distinct names, nothing nested
    listed = {d["name"] for d in cat.list()}
    assert set(names) <= listed

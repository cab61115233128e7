"""SURVEY §1.3 large-offset robustness (VERDICT r4 #7).

The schema promise: ``content`` travels as ``pa.large_string()`` because a
block of source files can exceed the 2 GiB int32 offset capacity of plain
``string``.  Pin it end-to-end: a corpus whose SUMMED content is > 2³¹
bytes (nine ~260 MB docs; padding is spaces so tokenization stays a cheap
C scan and parquet RLE keeps the file small) must flow through the
tokenize batch, the doc-meta forward store and a full ``build_index`` with
no ArrowInvalid/ArrowCapacityError, and the postings must be correct —
each doc's unique marker term retrieves exactly that doc.

One module-scoped corpus is shared by the unit probe and the e2e build to
pay the ~2.4 GB string construction once.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

N_DOCS = 9
PAD = 260 * 1024 * 1024  # bytes of spaces per doc; 9 × 260 MB ≈ 2.29 GiB > 2³¹


def _contents():
    return [f"bigdoc{i} header" + " " * PAD for i in range(N_DOCS)]


@pytest.fixture(scope="module")
def big_corpus(tmp_path_factory):
    """(corpus_dir, batch) — the parquet corpus on disk plus the SAME rows
    as one in-memory Arrow batch (the single-batch >2 GiB offset probe)."""
    contents = _contents()
    assert sum(len(c) for c in contents) > 2**31
    batch = pa.table(
        {
            "repo": pa.array([f"org/big{i}" for i in range(N_DOCS)], pa.string()),
            "path": pa.array([f"src/f{i}.py" for i in range(N_DOCS)], pa.string()),
            "commit": pa.array(["c" * 40] * N_DOCS, pa.string()),
            "lang": pa.array(["py"] * N_DOCS, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        }
    )
    del contents
    d = tmp_path_factory.mktemp("bigcorpus")
    # the library writer, not raw pq.write_table: pyarrow buffers a whole
    # row group per column chunk and caps it at 2³¹−2 bytes, so a >2 GiB
    # content table must be split into byte-bounded row groups —
    # storage.write_table_idempotent does exactly that (raw write_table on
    # this table raises ArrowCapacityError; pinned below)
    from uci_searchengine_ray.state import storage

    fs, root = storage.resolve(str(d))
    storage.write_table_idempotent(fs, batch, root, "corpus.parquet")
    md = pq.read_metadata(str(d / "corpus.parquet"))
    assert md.num_row_groups > 1  # the byte cap actually split
    assert md.num_rows == N_DOCS
    return str(d), batch


def test_plain_string_would_overflow(big_corpus, tmp_path):
    """The premises behind the schema + writer choices: plain ``string``
    cannot hold these offsets in one contiguous array (pyarrow silently
    chunks — a hazard for kernels assuming one chunk), and even a
    ``large_string`` table fails a naive single-row-group parquet write
    (the writer buffers one column chunk per row group, int32-capped)."""
    _, batch = big_corpus
    chunked = pa.array(batch["content"].to_pylist(), pa.string())
    assert isinstance(chunked, pa.ChunkedArray) and chunked.num_chunks > 1
    del chunked
    with pytest.raises(pa.lib.ArrowCapacityError):
        pq.write_table(batch, str(tmp_path / "naive.parquet"))


def test_single_value_over_cap_raises_clearly(monkeypatch):
    """A single parquet BYTE_ARRAY value is int32-length-capped — the
    writer must refuse loudly with the shard-before-ingest hint rather
    than let pyarrow fail mid-file.  (Caps downscaled so the test stays
    cheap; the cap RELATION is what's under test.)"""
    from uci_searchengine_ray.state import storage

    monkeypatch.setattr(storage, "_RG_BYTE_CAP", 512)
    monkeypatch.setattr(storage, "_VALUE_BYTE_CAP", 4096)
    t = pa.table({"content": pa.array([" " * 4097], pa.large_string())})
    fs, root = storage.resolve("/tmp/uciray_bigrow_probe")
    with pytest.raises(ValueError, match="shard the document"):
        storage.write_table_idempotent(fs, t, root, "x.parquet")


def test_row_wider_than_soft_cap_still_writes(monkeypatch, tmp_path):
    """A row between the soft row-group cap and the hard value cap writes
    as its OWN row group (previously a false ValueError)."""
    from uci_searchengine_ray.state import storage

    monkeypatch.setattr(storage, "_RG_BYTE_CAP", 512)
    monkeypatch.setattr(storage, "_VALUE_BYTE_CAP", 4096)
    vals = [" " * 100, " " * 1000, " " * 100]  # middle row > soft cap
    t = pa.table({"content": pa.array(vals, pa.large_string())})
    fs, root = storage.resolve(str(tmp_path))
    storage.write_table_idempotent(fs, t, root, "wide.parquet")
    back = pq.read_table(str(tmp_path / "wide.parquet"))
    assert back["content"].to_pylist() == vals
    assert pq.read_metadata(str(tmp_path / "wide.parquet")).num_row_groups >= 2


def test_tokenize_and_doc_meta_over_2gib_batch(big_corpus):
    from uci_searchengine_ray.functions.hashing import stable_doc_id
    from uci_searchengine_ray.stages.tokenize import TokenizeExplode, doc_meta_batch

    _, batch = big_corpus
    exploded = TokenizeExplode("reference")(batch)
    # two tokens per doc, tf 1 each, doc_len 2 — spaces contribute nothing
    assert exploded.num_rows == 2 * N_DOCS
    assert set(exploded["tf"].to_pylist()) == {1}
    assert set(exploded["doc_len"].to_pylist()) == {2}
    want_ids = {
        stable_doc_id(f"org/big{i}", f"src/f{i}.py", "c" * 40): f"bigdoc{i}"
        for i in range(N_DOCS)
    }
    by_doc = {}
    for term, doc in zip(exploded["term"].to_pylist(), exploded["doc_id"].to_pylist()):
        by_doc.setdefault(doc, set()).add(term)
    assert by_doc == {d: {m, "header"} for d, m in want_ids.items()}

    meta = doc_meta_batch(batch, doc_lens=[2] * N_DOCS)
    assert meta["content"].type == pa.large_string()
    assert set(meta["n_chars"].to_pylist()) == {PAD + len("bigdoc0 header")}
    assert not any(meta["failed"].to_pylist())


def test_build_and_query_over_2gib_corpus(ray_session, big_corpus, tmp_path):
    from uci_searchengine_ray.config import EngineConfig
    from uci_searchengine_ray.functions.hashing import stable_doc_id
    from uci_searchengine_ray.pipelines.index_build import build_index
    from uci_searchengine_ray.pipelines.search import PostingsIndex, score_reference

    corpus_dir, _ = big_corpus
    idx = build_index(
        corpus_dir,
        str(tmp_path / "idx"),
        EngineConfig(mode="reference", block_size=4, num_shards=2, num_merge_groups=2),
        mode="fresh",
    )
    pi = PostingsIndex(idx)
    for i in (0, 3, N_DOCS - 1):
        ids, scores = score_reference(pi, f"bigdoc{i}")
        assert list(ids) == [
            stable_doc_id(f"org/big{i}", f"src/f{i}.py", "c" * 40)
        ], f"bigdoc{i} postings wrong"
    # 'header' is in EVERY doc: df = N, so the reference tf·idf weight
    # ln(N/(df+1)) is negative and the score>0 filter legitimately empties
    # the result — assert the POSTINGS themselves instead
    assert pi.df("header") == N_DOCS
    doc_ids, tfs, _ = pi.postings("header")
    assert len(doc_ids) == N_DOCS and set(tfs.tolist()) == {1}
    ids, _ = score_reference(pi, "header")
    assert len(ids) == 0  # documented negative-idf semantics


def test_row_group_slices_properties():
    """_row_group_slices invariants on adversarial width layouts: slices
    tile the table exactly, every slice's var-width sum stays under the
    cap, and NULL values (quarantined doc_meta content) count as zero."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from uci_searchengine_ray.state import storage

    cap = storage._RG_BYTE_CAP

    @settings(max_examples=40, deadline=None)
    @given(
        st.lists(
            st.one_of(
                st.none(),
                st.integers(min_value=0, max_value=cap),
            ),
            min_size=0,
            max_size=12,
        )
    )
    def check(widths):
        # synthesize via a *scaled* layout: store a tiny string but patch
        # the measured widths through monkey math — instead, build real
        # strings at a downscaled cap so the test stays cheap
        scale = 1 << 20  # exercise the math at cap/2^20 granularity
        vals = [None if w is None else " " * (w // scale) for w in widths]
        t = pa.table({"content": pa.array(vals, pa.large_string())})
        real_cap = storage._RG_BYTE_CAP
        try:
            storage._RG_BYTE_CAP = max(1, real_cap // scale)
            slices = storage._row_group_slices(t)
        finally:
            storage._RG_BYTE_CAP = real_cap
        # tiling: contiguous, disjoint, covers all rows
        pos = 0
        for off, ln in slices:
            assert off == pos and ln >= 0
            pos += ln
        assert pos == t.num_rows
        assert len(slices) >= 1
        # byte bound (only binding when >1 slice was needed)
        lens = np.array([0 if v is None else len(v) for v in vals], np.int64)
        if len(slices) > 1:
            for off, ln in slices:
                assert lens[off : off + ln].sum() <= max(
                    1, real_cap // scale
                ) or ln == 1

    check()


def test_write_with_null_content_over_cap(tmp_path):
    """A >cap batch containing NULL rows (failed-fetch quarantine) writes
    cleanly — fill_null keeps the width math intact."""
    from uci_searchengine_ray.state import storage

    real_cap = storage._RG_BYTE_CAP
    try:
        storage._RG_BYTE_CAP = 1 << 10  # 1 KiB cap: force many groups
        vals = ([" " * 700, None] * 6) + [None, " " * 300]
        t = pa.table({"doc_id": pa.array(range(len(vals)), pa.int64()),
                      "content": pa.array(vals, pa.large_string())})
        fs, root = storage.resolve(str(tmp_path))
        storage.write_table_idempotent(fs, t, root, "nulls.parquet")
    finally:
        storage._RG_BYTE_CAP = real_cap
    back = pq.read_table(str(tmp_path / "nulls.parquet"))
    assert back.num_rows == len(vals)
    assert back["content"].to_pylist() == vals
    assert pq.read_metadata(str(tmp_path / "nulls.parquet")).num_row_groups > 1

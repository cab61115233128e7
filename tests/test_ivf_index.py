"""Persisted IVF vector index: build once, query many, equality vs the
on-the-fly IVF paths given the same centroids."""

import os

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
EMB = os.path.join(SF, "embeddings.parquet")


@pytest.fixture(scope="module")
def ivf_index(ray_session, tmp_path_factory):
    from uci_searchengine_ray.stages.similarity import build_ivf_index

    idx = str(tmp_path_factory.mktemp("ivf") / "index")
    build_ivf_index(EMB, idx, n_centroids=8, store_probe=2)
    return idx


def _sorted(df):
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_ivf_index_layout_and_meta(ivf_index):
    from uci_searchengine_ray.stages.similarity import load_ivf_index

    fs, root, cents, meta = load_ivf_index(ivf_index)
    assert cents.shape == (8, meta["dim"])
    assert meta["store_probe"] == 2 and meta["n_vectors"] > 0
    buckets = [d for d in os.listdir(os.path.join(ivf_index, "assignments"))
               if d.startswith("bucket=")]
    assert len(buckets) >= 2  # hive-partitioned by centroid


def test_indexed_ann_matches_onthefly_with_same_centroids(ray_session, ivf_index):
    import ray.data
    from uci_searchengine_ray.stages.similarity import (
        ann_ivf_topk,
        ann_ivf_topk_indexed,
        load_ivf_index,
        load_query_matrix,
    )

    _, _, cents, _ = load_ivf_index(ivf_index)
    qids, qmat = load_query_matrix(EMB, 5)
    ds = ray.data.read_parquet(EMB, columns=["vec_id", "embedding"])
    fly = _sorted(ann_ivf_topk(ds, qids, qmat, k=10, centroids=cents,
                               n_probe=4).to_pandas())
    idx = _sorted(ann_ivf_topk_indexed(ivf_index, qids, qmat, k=10,
                                       n_probe=4).to_pandas())
    pd.testing.assert_frame_equal(idx, fly)


def test_indexed_dedup_matches_onthefly_with_same_centroids(ray_session, ivf_index):
    import ray.data
    from uci_searchengine_ray.stages.similarity import (
        embedding_dup_pairs_ivf,
        embedding_dup_pairs_ivf_indexed,
        load_ivf_index,
    )

    _, _, cents, meta = load_ivf_index(ivf_index)
    ds = ray.data.read_parquet(EMB, columns=["vec_id", "embedding"])
    fly = _sorted(
        embedding_dup_pairs_ivf(
            ds, tau=0.4, centroids=cents, n_probe=meta["store_probe"]
        ).to_pandas()
    )
    idx = _sorted(
        embedding_dup_pairs_ivf_indexed(ivf_index, tau=0.4).to_pandas()
    )
    pd.testing.assert_frame_equal(idx, fly)


def test_indexed_recall_vs_bruteforce(ray_session, ivf_index):
    """The persisted path keeps the recall the on-the-fly IVF is pinned to."""
    import ray.data
    from uci_searchengine_ray.stages.similarity import (
        ann_bruteforce_topk,
        ann_ivf_topk_indexed,
        load_query_matrix,
    )

    qids, qmat = load_query_matrix(EMB, 5)
    ds = ray.data.read_parquet(EMB, columns=["vec_id", "embedding"])
    exact = ann_bruteforce_topk(ds, qids, qmat, k=10).to_pandas()
    approx = ann_ivf_topk_indexed(ivf_index, qids, qmat, k=10, n_probe=4).to_pandas()
    got = 0
    want = 0
    for qid in qids:
        e = set(exact[exact.query_id == qid].vec_id)
        a = set(approx[approx.query_id == qid].vec_id)
        got += len(e & a)
        want += len(e)
    assert got / want >= 0.6  # multi-probe recall floor (matches ann_ivf pin)


def test_build_once_query_many(ray_session, ivf_index):
    """A second query round reuses the snapshot — no retrain, no rewrite."""
    from uci_searchengine_ray.stages.similarity import (
        ann_ivf_topk_indexed,
        load_query_matrix,
    )

    mtimes = {}
    for dirpath, _, files in os.walk(ivf_index):
        for f in files:
            p = os.path.join(dirpath, f)
            mtimes[p] = os.path.getmtime(p)
    qids, qmat = load_query_matrix(EMB, 3)
    r1 = _sorted(ann_ivf_topk_indexed(ivf_index, qids, qmat, k=5).to_pandas())
    r2 = _sorted(ann_ivf_topk_indexed(ivf_index, qids, qmat, k=5).to_pandas())
    pd.testing.assert_frame_equal(r1, r2)
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t  # snapshot untouched by queries


def test_ann_ivf_cache_invalidates_on_corpus_change(ray_session, tmp_path):
    """The /tmp snapshot cache behind the ann_ivf gate is keyed by the
    corpus path AND size+mtime: regenerating the embeddings at the same
    path must rebuild the index, not answer from the stale snapshot."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from uci_searchengine_ray.pipelines import dedup_sim

    def write_emb(n, seed):
        rng = np.random.default_rng(seed)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                    "embedding": pa.array(
                        [list(map(float, r)) for r in rng.normal(size=(n, 6))],
                        pa.list_(pa.float32()),
                    ),
                }
            ),
            str(tmp_path / "embeddings.parquet"),
        )

    write_emb(64, seed=1)
    a = dedup_sim.ann_ivf_indexed(str(tmp_path)).to_pandas()
    write_emb(80, seed=2)  # same path, different content (and size)
    b = dedup_sim.ann_ivf_indexed(str(tmp_path)).to_pandas()
    # stale snapshot would replay corpus-1 neighbors; fresh build must see
    # corpus 2 (different cosines; 80 > 64 vec ids available)
    assert not a.equals(b)
    fresh = dedup_sim.ann_ivf(str(tmp_path)).to_pandas()
    pd.testing.assert_frame_equal(
        b.sort_values(["query_id", "rank"]).reset_index(drop=True),
        fresh.sort_values(["query_id", "rank"]).reset_index(drop=True),
    )

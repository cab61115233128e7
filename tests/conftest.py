"""Session-scoped Ray fixture — ONE ray.init per pytest session."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from uci_searchengine_ray.config import configure_data_context

    configure_data_context()
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def synthetic_corpus_dir(tmp_path_factory):
    from uci_searchengine_ray.sources.corpus import write_synthetic_corpus

    out = tmp_path_factory.mktemp("corpus") / "sc"
    return write_synthetic_corpus(str(out), n_docs=600, n_files=8)


@pytest.fixture(scope="session")
def built_index(ray_session, synthetic_corpus_dir, tmp_path_factory):
    """Reference-mode index over the synthetic corpus, built once."""
    from uci_searchengine_ray.config import EngineConfig
    from uci_searchengine_ray.pipelines.index_build import build_index

    out = tmp_path_factory.mktemp("index") / "snap"
    cfg = EngineConfig(mode="reference", block_size=32, num_shards=4, num_merge_groups=16)
    return build_index(synthetic_corpus_dir, str(out), cfg=cfg, mode="fresh")

"""uci_searchengine_ray — a Ray-Data-native full-text indexing + ranked-retrieval
engine with the query/data-processing capabilities of jwong236/UCI-SearchEngine,
rebuilt from scratch for source-code Parquet corpora at cluster scale.

Layout:
  functions/  pure, vectorizable kernels (tokenizer, varbyte codecs, hashing,
              scoring formulas, URL tools, text statistics)
  sources/    corpus readers/generators and the snapshot catalog
  stages/     map_batches / groupby stage bodies (tokenize-explode, posting
              encode+merge, dedup family, similarity, multimodal stubs, links)
  pipelines/  end-to-end Dataset pipelines (index build, search, analysis,
              relational demos)
  state/      lineage manifest (checkpoint/resume) and the doc store

Nothing in this package calls ray.init()/ray.shutdown(); sessions are owned by
the caller (tests' conftest fixture, bench.py, or the driver).
"""

__version__ = "0.1.0"

"""Engine configuration (the rebuild analog of the reference's settings.py +
globals.py surface, SURVEY.md §2.10): one typed dataclass that flows through
job entry points — no process-global singletons.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # tokenizer mode: "reference" (conformance, SURVEY §1.4) or "code" (BM25 path)
    mode: str = "reference"

    # posting-block size (postings per block; block-max metadata per block)
    block_size: int = 128

    # index shards: postings partitioned by hash(term) % num_shards
    num_shards: int = 8

    # skew salting: stage-1 groupby key is (term, hash(doc_id) % num_salts);
    # bounds the largest shuffle group to ~df_max / num_salts postings
    num_salts: int = 4

    # tokenize-stage batch size (docs per batch); large source files => keep
    # batches bounded so batch bytes stay within worker heap at 100 TB scale
    tokenize_batch_size: int = 256

    # checkpoint groups: input files are processed in this many lineage groups;
    # resume skips completed groups (manifest anti-join)
    ckpt_groups: int = 4

    # BM25 parameters (north star: k1=1.2, b=0.75)
    bm25_k1: float = 1.2
    bm25_b: float = 0.75

    # query serving
    top_k: int = 100
    snippet_len: int = 200

    extra: dict = field(default_factory=dict)

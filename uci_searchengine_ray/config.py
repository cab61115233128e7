"""Engine configuration (the rebuild analog of the reference's settings.py +
globals.py surface, SURVEY.md §2.10): one typed dataclass that flows through
job entry points — no process-global singletons.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional


@dataclass(frozen=True)
class EngineConfig:
    # tokenizer mode: "reference" (conformance, SURVEY §1.4) or "code" (BM25 path)
    mode: str = "reference"

    # posting-block size (postings per block; block-max metadata per block)
    block_size: int = 128

    # index shards: postings partitioned by hash(term) % num_shards
    num_shards: int = 8

    # phase-2 merge parallelism: runs are grouped by hash(term) %
    # num_merge_groups (each group merges many terms in one vectorized call);
    # raise with corpus size so groups stay worker-sized
    num_merge_groups: int = 64

    # doc-range buckets (power of two): partitions every term's postings by
    # the high bits of doc_id, so a Zipf-hot term (df up to N) is merged and
    # block-encoded by doc_range_buckets INDEPENDENT tasks, each bounded to
    # ~df/buckets postings — the escape hatch for terms whose full posting
    # list exceeds one worker's memory.  Blocks stay globally doc-ascending
    # (bucket = id prefix; block_id = bucket << 20 | local), idf/block-max
    # bounds use the GLOBAL df broadcast from run metadata, and query results
    # are bit-identical to a single-range build (tested).  Cost: run-row
    # count (and phase-1/2 constant work) grows ~buckets×, so enable only
    # when df_max × posting-bytes approaches worker memory (e.g. stopwords
    # at 10^10+ docs in reference mode).  1 = single-range (default)
    doc_range_buckets: int = 1

    # tokenize-stage batch size (docs per batch).  Bigger batches mean fewer
    # phase-1 runs per term (runs ≈ n_batches × batch vocab), which is the
    # main phase-2 shuffle-size lever — but batch bytes × concurrency must
    # fit the worker heap: at ~2.5 KB/doc 8192 is ~20 MB/batch; drop to
    # 64-256 for 100 KB+ source files or huge binary payloads.
    # None (default) = scale-aware: build_index derives the batch from the
    # corpus row count (parquet footers) targeting ~4 tasks per CPU,
    # clamped to [1024, 8192] — small corpora keep full parallelism, big
    # corpora get the fewest runs/files the heap allows (measured 30%
    # faster phase 2 at 1M docs vs a fixed 2048)
    tokenize_batch_size: Optional[int] = None

    # checkpoint groups: input files are processed in this many lineage groups;
    # resume skips completed groups (manifest anti-join)
    ckpt_groups: int = 4

    # keep full document content in the doc_meta forward store (reference
    # parity: the reference keeps content in its documents table and reads it
    # back for snippets).  At lake scale set False — the input parquet IS the
    # content store, doc_meta keeps metadata only, and snippets degrade to
    # the no-content fallback unless the serving layer re-reads the lake
    store_content: bool = True

    # store token positions in posting blocks (enables phrase queries — the
    # reference's intended InvertedIndex.position variant, search.py:26-39);
    # costs ~1 byte/token extra in the index
    store_positions: bool = False

    # BM25 parameters (north star: k1=1.2, b=0.75)
    bm25_k1: float = 1.2
    bm25_b: float = 0.75

    # query serving
    top_k: int = 100
    snippet_len: int = 200

    extra: dict = field(default_factory=dict)


def configure_data_context() -> None:
    """Engine-standard Ray Data context: PUSH-based sort shuffle and no
    progress bars.  Push-based was measured up to 5× faster than the
    pull-based default on this engine's wide groupbys (240k-doc
    dup_spans 53-68 s → 10-14 s; ngram shingle groupby 46-104 s →
    29-46 s, interleaved A/B both orders) — the pipelines here are
    all-to-all-heavy by nature, which is exactly the case push-based
    shuffle exists for.  Safe to call any time before execution; every
    session owner (bench, tests, CLI, driver entry) routes through it."""
    from ray.data import DataContext

    try:
        from ray.data.context import ShuffleStrategy

        strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    except ImportError:  # older Ray: fall back to the legacy flag
        strategy = None
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    if strategy is not None:
        ctx.shuffle_strategy = strategy

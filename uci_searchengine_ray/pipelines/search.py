"""Query engine: snapshot reader, reference tf·idf scorer (conformance mode),
BM25 scorers (vectorized TAAT + block-max WAND), and the stateful
``QueryScorer`` actor-pool stage (SURVEY.md §2.3 T4, §7 step 4).

The reference's ``SearchService.search`` (search.py:67-126) is rebuilt as:
  - index state loaded ONCE per actor in ``__init__`` (term dictionary + df,
    corpus stats, posting blocks) — vs the reference's per-(term,doc) SQLite
    round-trips (search.py:18-39);
  - per-doc token length read from the posting itself — vs re-tokenizing the
    whole doc per query term (search.py:92, the O(|q|·|d|) hot spot);
  - snippets fetched only for the returned page via DocStore point lookups.

Reference scoring mode implements SURVEY.md §1.4 exactly: duplicate query
terms contribute per occurrence in token order (search.py:89), tf = count /
doc_len, idf = ln(N/(df+1)) (search.py:98), score>0 filter (search.py:102),
deterministic order (score desc, doc_id asc).

Scale note: each actor loads block METADATA for the shards it is given
(default: all) and pages posting payloads in lazily per query term (LRU under
a byte budget) — resident memory is ~metadata + working set, not the index
(see ``PostingsIndex``).  On a cluster you run one pool per shard group and
scatter-gather, or route queries by term shard; the snapshot layout
(postings/shard=K/) already supports per-shard loading via ``shards=``.
"""

from __future__ import annotations

import bisect
import heapq
import math
import os
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pa_ds

import ray.data

from ..config import EngineConfig
from ..functions import codecs
from ..functions.scoring import bm25_term_score, build_snippet
from ..functions.tokenizer import TOKENIZERS
from ..state.docstore import DocStore
from .index_build import load_stats

RESULT_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.int32()),
        ("doc_id", pa.int64()),
        ("score", pa.float64()),
        ("url", pa.string()),
        ("title", pa.string()),
        ("snippet", pa.string()),
        ("total_results", pa.int64()),
        ("total_pages", pa.int64()),
    ]
)


class PostingsIndex:
    """Lazily-loading view of one snapshot's posting blocks + term stats.

    ``__init__`` loads ONLY block metadata (term, df, block_id, first/last
    doc, block-max scores) — numeric columns, ~40 B/block — never the binary
    payloads: at 100× corpus the per-actor resident metadata stays ~1/1000 of
    the index bytes (VERDICT r1 "What's wrong" #1).  Payload columns (the
    delta+varbyte blobs) are fetched on demand per term via a term-pruned
    parquet scan (row groups are term-sorted by the merge, so min/max
    statistics prune untouched groups), LRU-cached under a byte budget.
    Scorers batch all query terms into ONE scan via ``prefetch``.

    Blocks stay varbyte-encoded until touched; decoded postings are LRU-cached
    per term.  ``shards`` restricts loading to a subset of shard partitions.
    ``preload=True`` restores the eager round-1 behavior (small indexes /
    latency-critical serving with ample RAM).
    """

    _PAYLOAD_COLS = ("doc_ids", "tfs", "doc_lens", "positions")

    def __init__(
        self,
        index_dir: str,
        shards: Optional[Sequence[int]] = None,
        decode_cache: int = 4096,
        preload: bool = False,
        payload_budget_bytes: int = 256 << 20,
    ):
        self.index_dir = index_dir
        self.stats = load_stats(index_dir)
        self.n_docs = int(self.stats["n_docs"])
        self.avgdl = float(self.stats["avgdl"])
        self.k1 = float(self.stats["bm25_k1"])
        self.b = float(self.stats["bm25_b"])

        from ..state import storage

        fs, root = storage.resolve(index_dir)
        postings_path = storage.join(root, "postings")
        self._terms: Dict[str, dict] = {}
        self._cache: OrderedDict = OrderedDict()
        self._cache_size = decode_cache
        self._payloads: OrderedDict = OrderedDict()  # term → list[tuple], LRU
        self._payload_bytes = 0
        self._payload_budget = payload_budget_bytes
        self._dataset = None
        self._shard_filter = None
        self.meta_bytes = 0  # resident block-metadata accounting (bench)

        if not storage.ls_files(fs, postings_path, suffix=".parquet"):
            return  # empty-but-valid snapshot
        self._dataset = pa_ds.dataset(
            postings_path, format="parquet", partitioning="hive", filesystem=fs
        )
        import pyarrow.compute as pc

        if shards is not None:
            self._shard_filter = pc.field("shard").isin(list(shards))

        meta_cols = ["term", "df", "block_id", "first_doc", "last_doc",
                     "block_max_bm25", "block_max_tfn"]
        tbl = self._dataset.to_table(columns=meta_cols, filter=self._shard_filter)
        self.meta_bytes = tbl.nbytes
        terms = tbl["term"].to_pylist()
        dfs = tbl["df"].to_pylist()
        bids = tbl["block_id"].to_pylist()
        firsts = tbl["first_doc"].to_pylist()
        lasts = tbl["last_doc"].to_pylist()
        bmax_bm25 = tbl["block_max_bm25"].to_pylist()
        bmax_tfn = tbl["block_max_tfn"].to_pylist()
        for i, term in enumerate(terms):
            e = self._terms.setdefault(term, {"df": dfs[i], "meta": []})
            e["meta"].append((bids[i], firsts[i], lasts[i], bmax_bm25[i],
                              bmax_tfn[i]))
        for e in self._terms.values():
            e["meta"].sort(key=lambda m: m[0])
            e["last_doc"] = np.array([m[2] for m in e["meta"]], dtype=np.int64)
            e["bmax_bm25"] = np.array([m[3] for m in e["meta"]], dtype=np.float64)
            e["bmax_tfn"] = np.array([m[4] for m in e["meta"]], dtype=np.float64)
        if preload:
            self.prefetch(list(self._terms.keys()))
            self._payload_budget = max(self._payload_budget, self._payload_bytes)

    def __contains__(self, term: str) -> bool:
        return term in self._terms

    def df(self, term: str) -> int:
        e = self._terms.get(term)
        return int(e["df"]) if e else 0

    def terms(self):
        return self._terms.keys()

    def block_meta(self, term: str):
        e = self._terms[term]
        return e["last_doc"], e["bmax_bm25"], e["bmax_tfn"]

    # -- payload management ------------------------------------------------

    def prefetch(self, terms: Sequence[str]) -> None:
        """Fetch payload blobs for the given terms in ONE pruned parquet scan
        (call once per query with all its terms).  LRU-evicts beyond the byte
        budget; terms already resident are refreshed in LRU order."""
        missing = []
        for t in terms:
            if t in self._payloads:
                self._payloads.move_to_end(t)
            elif t in self._terms:
                missing.append(t)
        if not missing:
            return
        import pyarrow.compute as pc

        flt = pc.field("term").isin(missing)
        if self._shard_filter is not None:
            flt = flt & self._shard_filter
        tbl = self._dataset.to_table(
            columns=["term", "block_id", *self._PAYLOAD_COLS], filter=flt
        )
        by_term: Dict[str, list] = {t: [] for t in missing}
        for i in range(tbl.num_rows):
            t = tbl["term"][i].as_py()
            by_term[t].append(
                (
                    tbl["block_id"][i].as_py(),
                    tbl["doc_ids"][i].as_py(),
                    tbl["tfs"][i].as_py(),
                    tbl["doc_lens"][i].as_py(),
                    tbl["positions"][i].as_py()
                    if "positions" in tbl.column_names
                    else b"",
                )
            )
        for t, rows in by_term.items():
            rows.sort(key=lambda r: r[0])
            payload = [r[1:] for r in rows]
            nbytes = sum(len(r[0]) + len(r[1]) + len(r[2]) + len(r[3])
                         for r in payload)
            self._payloads[t] = payload
            self._payload_bytes += nbytes
        while self._payload_bytes > self._payload_budget and len(self._payloads) > len(missing):
            _, old = self._payloads.popitem(last=False)
            self._payload_bytes -= sum(
                len(r[0]) + len(r[1]) + len(r[2]) + len(r[3]) for r in old
            )

    def _payload(self, term: str) -> list:
        got = self._payloads.get(term)
        if got is None:
            self.prefetch([term])
            got = self._payloads[term]
        else:
            self._payloads.move_to_end(term)
        return got

    def decode_block(self, term: str, block_idx: int):
        b = self._payload(term)[block_idx]
        return (
            codecs.decode_ids(b[0]),
            codecs.decode_plain(b[1]),
            codecs.decode_plain(b[2]),
        )

    def positions(self, term: str) -> List[np.ndarray]:
        """Per-posting absolute token positions for a term (requires an index
        built with store_positions=True), aligned with ``postings(term)``."""
        from ..functions import codecs as _c

        out: List[np.ndarray] = []
        for b in self._payload(term):
            if not b[3]:
                raise ValueError(
                    f"index has no positional payload for term {term!r} "
                    "(build with EngineConfig(store_positions=True))"
                )
            flat = _c.varbyte_decode(b[3])
            counts = _c.decode_plain(b[1])
            cuts = np.cumsum(counts)[:-1]
            for seg in np.split(flat, cuts):
                out.append(np.cumsum(seg).astype(np.int64))  # delta → absolute
        return out

    def postings(self, term: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Full decoded (doc_ids, tfs, doc_lens) for a term, LRU-cached."""
        hit = self._cache.get(term)
        if hit is not None:
            self._cache.move_to_end(term)
            return hit
        n_blocks = len(self._terms[term]["meta"])
        parts = [self.decode_block(term, i) for i in range(n_blocks)]
        ids = np.concatenate([p[0] for p in parts])
        tfs = np.concatenate([p[1] for p in parts])
        dls = np.concatenate([p[2] for p in parts])
        out = (ids, tfs, dls)
        self._cache[term] = out
        if len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return out


# ---------------------------------------------------------------------------
# scorers
# ---------------------------------------------------------------------------

def score_reference(index: PostingsIndex, query: str) -> Tuple[np.ndarray, np.ndarray]:
    """Exact reference-mode scoring (SURVEY.md §1.4). Returns (doc_ids, scores)
    ordered by (score desc, doc_id asc), score>0 only."""
    tokens = TOKENIZERS["reference"](query)
    if not tokens:
        return np.empty(0, dtype=np.int64), np.empty(0)
    present = [t for t in tokens if t in index]
    if not present:
        return np.empty(0, dtype=np.int64), np.empty(0)
    index.prefetch(sorted(set(present)))  # one pruned scan for all terms
    union = np.unique(np.concatenate([index.postings(t)[0] for t in set(present)]))
    acc = np.zeros(len(union), dtype=np.float64)
    n = max(index.n_docs, 1)
    for tok in tokens:  # token order, duplicates twice — search.py:89
        if tok not in index:
            continue
        ids, tfs, dls = index.postings(tok)
        idf = math.log(n / (index.df(tok) + 1))
        with np.errstate(divide="ignore", invalid="ignore"):
            tf = tfs.astype(np.float64) / dls.astype(np.float64)
        tf[dls == 0] = 0.0
        acc[np.searchsorted(union, ids)] += tf * idf
    keep = acc > 0  # search.py:102
    ids, scores = union[keep], acc[keep]
    order = np.lexsort((ids, -scores))
    return ids[order], scores[order]


def score_phrase(
    index: PostingsIndex, phrase: str
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact phrase matching via positional postings — the reference's
    *intended* ``InvertedIndex.position`` variant (search.py:26-39; the
    wired schema never stored positions, SURVEY §1 note 2).

    Returns (doc_ids, n_occurrences) for docs containing the tokenized
    phrase contiguously, n>0, ordered (n desc, doc_id asc).  Candidates =
    intersection of the phrase terms' posting lists (rarest-first);
    occurrences counted by intersecting shifted position sets.
    """
    tokens = TOKENIZERS["reference"](phrase)
    if not tokens or any(t not in index for t in tokens):
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)

    index.prefetch(sorted(set(tokens)))
    post = {t: index.postings(t) for t in set(tokens)}
    pos = {t: index.positions(t) for t in set(tokens)}
    # candidate docs: intersect posting lists, rarest term first
    by_df = sorted(set(tokens), key=lambda t: index.df(t))
    cand = post[by_df[0]][0]
    for t in by_df[1:]:
        cand = np.intersect1d(cand, post[t][0], assume_unique=True)
        if len(cand) == 0:
            break

    out_ids, out_n = [], []
    for doc in cand.tolist():
        live = None
        for k, t in enumerate(tokens):
            idx_in_postings = int(np.searchsorted(post[t][0], doc))
            p = pos[t][idx_in_postings] - k  # align occurrence starts
            live = p if live is None else np.intersect1d(live, p, assume_unique=True)
            if len(live) == 0:
                break
        n = len(live) if live is not None else 0
        if n:
            out_ids.append(doc)
            out_n.append(n)
    ids = np.array(out_ids, dtype=np.int64)
    ns = np.array(out_n, dtype=np.int64)
    order = np.lexsort((ids, -ns))
    return ids[order], ns[order]


def score_bm25_taat(
    index: PostingsIndex, query: str, top_k: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized exhaustive (term-at-a-time) BM25 over unique query terms."""
    tokens = TOKENIZERS["code"](query)
    uniq = sorted(set(t for t in tokens if t in index))
    if not uniq:
        return np.empty(0, dtype=np.int64), np.empty(0)
    index.prefetch(uniq)  # one pruned scan for all terms
    all_ids, all_contrib = [], []
    n = max(index.n_docs, 1)
    for tok in uniq:
        ids, tfs, dls = index.postings(tok)
        df = index.df(tok)
        idf = math.log1p((n - df + 0.5) / (df + 0.5))
        all_ids.append(ids)
        all_contrib.append(
            bm25_term_score(tfs, dls, idf, index.avgdl, index.k1, index.b)
        )
    ids = np.concatenate(all_ids)
    contrib = np.concatenate(all_contrib)
    union, inv = np.unique(ids, return_inverse=True)
    acc = np.zeros(len(union), dtype=np.float64)
    np.add.at(acc, inv, contrib)
    order = np.lexsort((union, -acc))
    if top_k is not None:
        order = order[:top_k]
    return union[order], acc[order]


class _TermCursor:
    """Posting cursor with block-skip advance for block-max WAND."""

    __slots__ = ("index", "term", "idf", "ub", "last_doc", "bmax", "nblocks",
                 "bi", "ids", "tfs", "dls", "pos", "cur", "k1", "b", "avgdl",
                 "blocks_decoded")

    def __init__(self, index: PostingsIndex, term: str, idf: float):
        self.index = index
        self.term = term
        self.idf = idf
        self.k1 = index.k1
        self.b = index.b
        self.avgdl = max(index.avgdl, 1e-12)
        self.blocks_decoded = 0
        last_doc, bmax_bm25, _ = index.block_meta(term)
        # python lists + bisect: these sit in the per-iteration hot loop and
        # numpy scalar indexing/searchsorted costs ~5x more per call
        self.last_doc = last_doc.tolist()
        self.bmax = bmax_bm25.tolist()
        self.nblocks = len(self.last_doc)
        self.ub = float(bmax_bm25.max())  # term-level upper bound
        self.bi = -1
        self.ids = self.tfs = self.dls = None
        self.pos = 0
        self.cur = -1
        self._load_block(0)

    def _load_block(self, bi: int):
        if bi >= self.nblocks:
            self.cur = np.iinfo(np.int64).max
            return
        self.bi = bi
        ids, tfs, dls = self.index.decode_block(self.term, bi)
        # python lists: the DAAT loop reads single elements, and list
        # indexing is ~5x cheaper than numpy scalar extraction
        self.ids, self.tfs, self.dls = ids.tolist(), tfs.tolist(), dls.tolist()
        self.blocks_decoded += 1
        self.pos = 0
        self.cur = self.ids[0]

    def block_info_at(self, target: int) -> Tuple[float, int]:
        """(block_max, block_last) of the block that would contain the first
        posting ≥ target — a *shallow* advance: consults only block metadata,
        decodes nothing.  Using the CURRENT block's max here is the classic
        BMW bug: a cursor whose block ends before the pivot would
        under-bound the pivot's score and cause wrong skips."""
        if self.cur == _MAXDOC:
            return 0.0, _MAXDOC
        t = target if target > self.cur else self.cur
        bi = bisect.bisect_left(self.last_doc, t)
        if bi >= self.nblocks:
            return 0.0, _MAXDOC
        return self.bmax[bi], self.last_doc[bi]

    def advance_to(self, target: int):
        """Move cursor to the smallest doc >= target (block skipping)."""
        if self.cur >= target:
            return
        if self.bi >= self.nblocks or target > self.last_doc[-1]:
            self.cur = _MAXDOC
            return
        bi = bisect.bisect_left(self.last_doc, target)
        if bi != self.bi:
            self._load_block(bi)
        self.pos = bisect.bisect_left(self.ids, target)
        if self.pos >= len(self.ids):  # defensive; last_doc bound should stop this
            self._load_block(self.bi + 1)
            return
        self.cur = self.ids[self.pos]

    def next(self):
        self.pos += 1
        if self.pos < len(self.ids):
            self.cur = self.ids[self.pos]
        else:
            self._load_block(self.bi + 1)

    def score_current(self) -> float:
        # scalar BM25 — same formula as functions.scoring.bm25_term_score,
        # open-coded because this sits in the per-posting DAAT loop
        tf = self.tfs[self.pos]
        dl = self.dls[self.pos]
        denom = tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        return self.idf * tf * (self.k1 + 1.0) / denom


_MAXDOC = np.iinfo(np.int64).max


def score_bm25_wand(
    index: PostingsIndex, query: str, top_k: int = 10, stats: Optional[dict] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Block-max WAND top-k BM25 (north star).  Identical results to
    ``score_bm25_taat(...)[:top_k]`` (property-tested); skips whole blocks
    whose max-score sum cannot beat the current threshold.  ``stats`` (if
    given) receives blocks_decoded / blocks_total pruning counters."""
    tokens = TOKENIZERS["code"](query)
    uniq = sorted(set(t for t in tokens if t in index))
    if not uniq:
        return np.empty(0, dtype=np.int64), np.empty(0)
    index.prefetch(uniq)  # payloads resident before block-skip decisions
    n = max(index.n_docs, 1)
    cursors = [
        _TermCursor(index, t, math.log1p((n - index.df(t) + 0.5) / (index.df(t) + 0.5)))
        for t in uniq
    ]
    # bit-exact parity with the vectorized TAAT scorer: sum each doc's term
    # contributions in sorted-term order (fp addition is order-sensitive and
    # near-ties must break identically in both scorers)
    term_rank = {c.term: r for r, c in enumerate(cursors)}
    # heap of (score, -doc_id) so the weakest (lowest score, then larger doc_id
    # — consistent with (score desc, doc_id asc) final order) pops first
    heap: List[Tuple[float, int]] = []
    theta = 0.0

    while True:
        cursors.sort(key=lambda c: c.cur)
        # pivot: first index where the cumulative term upper bound beats theta
        acc_ub = 0.0
        pivot = -1
        for i, c in enumerate(cursors):
            if c.cur == _MAXDOC:
                break
            acc_ub += c.ub
            # >= so exact-tie candidates with smaller doc_id are not pruned
            # (final tie-break is (score desc, doc_id asc))
            if acc_ub >= theta or len(heap) < top_k:
                pivot = i
                break
        if pivot < 0:
            break
        pivot_doc = cursors[pivot].cur
        if pivot_doc == _MAXDOC:
            break
        # extend the pivot over cur==pivot_doc ties: those cursors also
        # contribute to pivot_doc's score, so the bound must include them
        while pivot + 1 < len(cursors) and cursors[pivot + 1].cur == pivot_doc:
            pivot += 1
        # block-max refinement with shallow advance: for each lead cursor use
        # the max of the block that would CONTAIN pivot_doc
        bm_ub = 0.0
        boundary = _MAXDOC
        for c in cursors[: pivot + 1]:
            bmx, blast = c.block_info_at(pivot_doc)
            bm_ub += bmx
            if blast < boundary:
                boundary = blast
        if len(heap) >= top_k and bm_ub < theta:
            # safe skip range is bounded by BOTH the earliest relevant block
            # end AND the first non-lead cursor's doc (docs beyond it would
            # gain contributions not counted in bm_ub)
            target = boundary + 1 if boundary != _MAXDOC else _MAXDOC
            if pivot + 1 < len(cursors):
                target = min(target, cursors[pivot + 1].cur)
            target = max(target, pivot_doc + 1)
            for c in cursors[: pivot + 1]:
                c.advance_to(target)
            continue
        if cursors[0].cur == pivot_doc:
            # fully evaluate pivot_doc (contributions in sorted-term order)
            contribs = [
                (term_rank[c.term], c.score_current())
                for c in cursors
                if c.cur == pivot_doc
            ]
            contribs.sort()
            score = 0.0
            for _, s in contribs:
                score += s
            item = (score, -pivot_doc)
            if len(heap) < top_k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)
            if len(heap) >= top_k:
                theta = heap[0][0]
            for c in cursors:
                if c.cur == pivot_doc:
                    c.next()
        else:
            # advance the leading cursors up to the pivot doc
            for c in cursors[:pivot]:
                c.advance_to(pivot_doc)

    if stats is not None:
        stats["blocks_decoded"] = sum(c.blocks_decoded for c in cursors)
        stats["blocks_total"] = sum(c.nblocks for c in cursors)

    out = sorted(heap, key=lambda it: (-it[0], -it[1]))
    ids = np.array([-d for _, d in out], dtype=np.int64)
    scores = np.array([s for s, _ in out], dtype=np.float64)
    return ids, scores


# ---------------------------------------------------------------------------
# actor-pool serving stage
# ---------------------------------------------------------------------------

class QueryScorer:
    """Stateful query-scoring stage for
    ``queries_ds.map_batches(QueryScorer, fn_constructor_kwargs=..., concurrency=N)``.

    ``__init__`` (once per actor) loads the posting blocks, term stats and the
    doc store; ``__call__`` scores a batch of queries.  Modes:
      - "reference": exact §1.4 tf·idf conformance scoring
      - "bm25":      vectorized exhaustive BM25 (TAAT)
      - "bm25_wand": block-max WAND top-k BM25
    """

    def __init__(
        self,
        index_dir: str,
        mode: str = "reference",
        top_k: int = 100,
        with_snippets: bool = True,
        shards: Optional[Sequence[int]] = None,
        preload: bool = False,
    ):
        self.index = PostingsIndex(index_dir, shards=shards, preload=preload)
        self.mode = mode
        self.top_k = top_k
        self.with_snippets = with_snippets
        self.docstore = DocStore(index_dir) if with_snippets else None

    def _score(self, query: str, need: int) -> Tuple[np.ndarray, np.ndarray]:
        if self.mode == "reference":
            return score_reference(self.index, query)
        if self.mode == "bm25":
            return score_bm25_taat(self.index, query, top_k=None)
        if self.mode == "bm25_wand":
            return score_bm25_wand(self.index, query, top_k=max(need, self.top_k))
        raise ValueError(f"unknown scoring mode {self.mode!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_pylist()
        queries = batch["query"].to_pylist()
        pages = (
            batch["page"].to_pylist()
            if "page" in batch.column_names
            else [1] * len(qids)
        )
        pps = (
            batch["per_page"].to_pylist()
            if "per_page" in batch.column_names
            else [10] * len(qids)
        )

        out = {k: [] for k in (
            "query_id", "rank", "doc_id", "score", "url", "title", "snippet",
            "total_results", "total_pages",
        )}
        for qid, query, page, per_page in zip(qids, queries, pages, pps):
            page = int(page or 1)
            per_page = int(per_page or 10)
            ids, scores = self._score(query, need=page * per_page)
            total = len(ids)
            total_pages = (total + per_page - 1) // per_page  # search.py:124
            lo, hi = (page - 1) * per_page, (page - 1) * per_page + per_page
            page_ids, page_scores = ids[lo:hi], scores[lo:hi]

            meta: Dict[int, dict] = {}
            if self.docstore is not None and len(page_ids):
                meta = self.docstore.fetch(page_ids.tolist())
            qterms = TOKENIZERS["reference"](query)
            for r, (doc_id, score) in enumerate(zip(page_ids, page_scores)):
                d = meta.get(int(doc_id), {})
                out["query_id"].append(qid)
                out["rank"].append(lo + r + 1)
                out["doc_id"].append(int(doc_id))
                out["score"].append(float(score))
                out["url"].append(d.get("url", ""))
                out["title"].append(d.get("title", ""))
                out["snippet"].append(
                    build_snippet(d.get("content") or "", qterms)
                    if self.docstore is not None
                    else ""
                )
                out["total_results"].append(total)
                out["total_pages"].append(total_pages)

        return pa.table(
            {
                "query_id": pa.array(out["query_id"], pa.int64()),
                "rank": pa.array(out["rank"], pa.int32()),
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "score": pa.array(out["score"], pa.float64()),
                "url": pa.array(out["url"], pa.string()),
                "title": pa.array(out["title"], pa.string()),
                "snippet": pa.array(out["snippet"], pa.string()),
                "total_results": pa.array(out["total_results"], pa.int64()),
                "total_pages": pa.array(out["total_pages"], pa.int64()),
            },
            schema=RESULT_SCHEMA,
        )


def search_batch(
    index_dir: str,
    queries: "ray.data.Dataset | List[dict]",
    mode: str = "reference",
    cfg: Optional[EngineConfig] = None,
    concurrency: int = 2,
    batch_size: int = 64,
    with_snippets: bool = True,
) -> "ray.data.Dataset":
    """Score a Dataset (or list) of queries through the actor pool."""
    cfg = cfg or EngineConfig()
    if isinstance(queries, list):
        queries = ray.data.from_items(queries)
    return queries.map_batches(
        QueryScorer,
        fn_constructor_kwargs=dict(
            index_dir=index_dir,
            mode=mode,
            top_k=cfg.top_k,
            with_snippets=with_snippets,
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


@ray.remote
class ShardServer:
    """One serving actor per shard group: loads ONLY its shards' posting
    blocks (plus global stats) and answers per-query PARTIAL scores — the
    contributions of the terms it owns.  Since every term's postings live in
    exactly one shard, per-doc partials across groups sum to the full score.
    """

    def __init__(self, index_dir: str, shards: Sequence[int], mode: str):
        self.index = PostingsIndex(index_dir, shards=list(shards))
        self.mode = mode

    def partial_scores(self, query: str):
        if self.mode == "reference":
            tokens = TOKENIZERS["reference"](query)
            present = [t for t in tokens if t in self.index]
            if not present:
                return (np.empty(0, dtype=np.int64), np.empty(0))
            self.index.prefetch(sorted(set(present)))
            union = np.unique(
                np.concatenate([self.index.postings(t)[0] for t in set(present)])
            )
            acc = np.zeros(len(union), dtype=np.float64)
            n = max(self.index.n_docs, 1)
            for tok in tokens:
                if tok not in self.index:
                    continue
                ids, tfs, dls = self.index.postings(tok)
                idf = math.log(n / (self.index.df(tok) + 1))
                with np.errstate(divide="ignore", invalid="ignore"):
                    tf = tfs.astype(np.float64) / dls.astype(np.float64)
                tf[dls == 0] = 0.0
                acc[np.searchsorted(union, ids)] += tf * idf
            return (union, acc)
        return score_bm25_taat(self.index, query, top_k=None)


class ShardedSearcher:
    """Scatter-gather serving over shard-partitioned actors (the multi-node
    layout: each node's pool holds its shard group; SURVEY §2.3 T4 scale
    note).  A query fans out to every group; the driver sums per-doc partial
    scores, applies the score>0 filter, orders (score desc, doc_id asc) and
    paginates — numerically within fp-reassociation of the single-index path
    (partials are summed per group, then across groups)."""

    def __init__(self, index_dir: str, n_groups: int = 2, mode: str = "reference"):
        from .index_build import load_stats

        num_shards = int(load_stats(index_dir)["num_shards"])
        n_groups = max(1, min(n_groups, num_shards))
        groups = [
            [s for s in range(num_shards) if s % n_groups == g]
            for g in range(n_groups)
        ]
        self.actors = [
            ShardServer.remote(index_dir, shards=g, mode=mode) for g in groups
        ]

    def search(self, query: str, page: int = 1, per_page: int = 10):
        parts = ray.get([a.partial_scores.remote(query) for a in self.actors])
        parts = [(i, s) for i, s in parts if len(i)]
        if not parts:
            return np.empty(0, dtype=np.int64), np.empty(0)
        ids = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        union, inv = np.unique(ids, return_inverse=True)
        acc = np.zeros(len(union), dtype=np.float64)
        np.add.at(acc, inv, scores)
        keep = acc > 0
        union, acc = union[keep], acc[keep]
        order = np.lexsort((union, -acc))
        lo = (page - 1) * per_page
        order = order[lo : lo + per_page] if per_page else order
        return union[order], acc[order]

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)


def search_one(
    index_dir: str,
    query: str,
    page: int = 1,
    per_page: int = 10,
    mode: str = "reference",
) -> dict:
    """Single-query envelope matching the reference response shape
    (search.py:119-126), computed driver-side without an actor pool."""
    scorer = QueryScorer(index_dir, mode=mode)
    tbl = scorer(
        pa.table(
            {
                "query_id": pa.array([0], pa.int64()),
                "query": pa.array([query], pa.string()),
                "page": pa.array([page], pa.int64()),
                "per_page": pa.array([per_page], pa.int64()),
            }
        )
    )
    rows = tbl.to_pylist()
    if rows:
        total, total_pages = rows[0]["total_results"], rows[0]["total_pages"]
    else:
        # page beyond the results: totals still reported (search.py:119-126)
        ids, _ = scorer._score(query, need=1)
        total = len(ids)
        total_pages = (total + per_page - 1) // per_page
    return {
        "query": query,
        "total_results": total,
        "page": page,
        "per_page": per_page,
        "total_pages": total_pages,
        "results": [
            {
                "url": r["url"],
                "title": r["title"],
                "snippet": r["snippet"],
                "score": r["score"],
                "doc_id": r["doc_id"],
            }
            for r in rows
        ],
    }

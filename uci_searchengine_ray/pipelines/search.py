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

import math
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
        self._cache_bytes = 0
        # decoded arrays are ~4-8× the encoded payload: give the decode
        # cache the same byte ceiling as the payload cache
        self._cache_budget = payload_budget_bytes
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
                     "block_max_bm25"]
        tbl = self._dataset.to_table(columns=meta_cols, filter=self._shard_filter)
        self.meta_bytes = tbl.nbytes
        terms = tbl["term"].to_pylist()
        dfs = tbl["df"].to_pylist()
        bids = tbl["block_id"].to_pylist()
        firsts = tbl["first_doc"].to_pylist()
        lasts = tbl["last_doc"].to_pylist()
        bmax_bm25 = tbl["block_max_bm25"].to_pylist()
        for i, term in enumerate(terms):
            e = self._terms.setdefault(term, {"df": dfs[i], "meta": []})
            e["meta"].append((bids[i], firsts[i], lasts[i], bmax_bm25[i]))
        for e in self._terms.values():
            e["meta"].sort(key=lambda m: m[0])
            e["first_doc"] = np.array([m[1] for m in e["meta"]], dtype=np.int64)
            e["last_doc"] = np.array([m[2] for m in e["meta"]], dtype=np.int64)
            e["bmax_bm25"] = np.array([m[3] for m in e["meta"]], dtype=np.float64)
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

    def block_bounds(self, term: str):
        """(first_doc, last_doc, block_max_bm25) arrays, block_id order."""
        e = self._terms[term]
        return e["first_doc"], e["last_doc"], e["bmax_bm25"]

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
        for t, bid, ids_b, tfs_b, dls_b, pos_b in zip(
            tbl["term"].to_pylist(),
            tbl["block_id"].to_pylist(),
            tbl["doc_ids"].to_pylist(),
            tbl["tfs"].to_pylist(),
            tbl["doc_lens"].to_pylist(),
            tbl["positions"].to_pylist(),
        ):
            by_term[t].append((bid, ids_b, tfs_b, dls_b, pos_b))
        for t, rows in by_term.items():
            rows.sort(key=lambda r: r[0])
            payload = [r[1:] for r in rows]
            nbytes = sum(len(r[0]) + len(r[1]) + len(r[2]) + len(r[3])
                         for r in payload)
            self._payloads[t] = payload
            self._payload_bytes += nbytes
        # evict LRU-first, but never below THIS query's working set (resident
        # terms were move_to_end'd above + the just-fetched missing ones) —
        # guarding only len(missing) could evict a resident term the caller
        # is about to read, degenerating to one pruned scan per term
        protected = sum(1 for t in terms if t in self._payloads)
        while (
            self._payload_bytes > self._payload_budget
            and len(self._payloads) > protected
        ):
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
        out: List[np.ndarray] = []
        for b in self._payload(term):
            if not b[3]:
                raise ValueError(
                    f"index has no positional payload for term {term!r} "
                    "(build with EngineConfig(store_positions=True))"
                )
            flat = codecs.varbyte_decode(b[3])
            counts = codecs.decode_plain(b[1])
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            # ONE cumsum-with-resets pass (delta → absolute), then split —
            # not one numpy call per posting
            absolute = codecs.delta_decode_segments(flat, starts)
            out.extend(np.split(absolute, starts[1:]))
        return out

    def postings(self, term: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Full decoded (doc_ids, tfs, doc_lens) for a term, LRU-cached
        under a BYTE budget (decoded arrays are ~4-8× their varbyte size;
        an entry-count cap alone would let hot long lists dwarf the
        carefully-budgeted encoded-payload cache)."""
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
        self._cache_bytes += ids.nbytes + tfs.nbytes + dls.nbytes
        while self._cache_bytes > self._cache_budget and len(self._cache) > 1:
            _, old = self._cache.popitem(last=False)
            self._cache_bytes -= sum(a.nbytes for a in old)
        return out


# ---------------------------------------------------------------------------
# scorers
# ---------------------------------------------------------------------------

def _reference_partials(
    index: PostingsIndex, query: str
) -> Tuple[np.ndarray, np.ndarray]:
    """(union doc_ids, accumulated tf·idf) of the terms ``index`` holds —
    the shared §1.4 accumulation used by the single-index scorer AND the
    per-shard partial servers (partials across disjoint term shards sum to
    the full score)."""
    tokens = TOKENIZERS["reference"](query)
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
    return union, acc


def score_reference(index: PostingsIndex, query: str) -> Tuple[np.ndarray, np.ndarray]:
    """Exact reference-mode scoring (SURVEY.md §1.4). Returns (doc_ids, scores)
    ordered by (score desc, doc_id asc), score>0 only."""
    union, acc = _reference_partials(index, query)
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


import weakref

_WAND_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_WAND_CACHE_BLOCKS = 32768  # ≈ blocks × (block_size × ~16 B) ≈ 64 MB at 128


def score_bm25_wand(
    index: PostingsIndex, query: str, top_k: int = 10, stats: Optional[dict] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Block-max WAND top-k BM25, window-at-a-time and fully vectorized
    (north star; VERDICT r1 item #5 replaced the per-posting Python DAAT
    loop, which lost 23x to numpy TAAT at sandbox scale).

    Doc-id space is cut at the union of all query terms' block boundaries, so
    within one window every term overlaps at most ONE block — the window
    upper bound (sum of overlapping blocks' max scores, the exact block-max
    WAND bound) is computed for ALL windows upfront with vectorized
    searchsorted.  A window whose bound cannot beat the current threshold θ
    is skipped without decoding.  Surviving windows' block slices (each block
    decoded once per query; per-window cut points vectorized at decode time)
    are accumulated into a pending buffer and FLUSHED in batches: one
    np.unique + np.add.at + top-k lexsort per ~flush_docs docs, after which θ
    tightens.  θ is therefore slightly stale between flushes — a conservative
    (never unsafe) skip rule.  Per-doc contributions accumulate in
    sorted-term order, the identical fp addition sequence as
    ``score_bm25_taat``, so results are BIT-IDENTICAL to
    ``score_bm25_taat(...)[:top_k]`` (property-tested).

    ``stats`` (if given) receives blocks_decoded / blocks_total counters.
    """
    tokens = TOKENIZERS["code"](query)
    uniq = sorted(set(t for t in tokens if t in index))
    if not uniq:
        return np.empty(0, dtype=np.int64), np.empty(0)
    index.prefetch(uniq)
    n = max(index.n_docs, 1)
    T = len(uniq)
    # cross-query (term, block) → (ids, contribs) LRU: contributions are
    # query-independent (idf is a per-term constant), so repeat queries pay
    # zero varbyte decodes — the same warmth TAAT gets from the postings LRU
    score_cache = _WAND_CACHE.setdefault(index, OrderedDict())

    firsts, lasts, bmaxs, idfs = [], [], [], []
    for t in uniq:
        f, l, bm = index.block_bounds(t)
        firsts.append(f)
        lasts.append(l)
        bmaxs.append(bm)
        idfs.append(math.log1p((n - index.df(t) + 0.5) / (index.df(t) + 0.5)))

    max_bmax = float(max(b.max() for b in bmaxs))  # bailout θ floor
    # window boundaries: union of every term's block last_doc values — no
    # block straddles a boundary, so each (term, window) hits ≤ 1 block
    bounds = np.unique(np.concatenate(lasts))
    W = len(bounds)
    ws_arr = np.empty(W, dtype=np.int64)  # window starts (inclusive)
    ws_arr[0] = np.iinfo(np.int64).min
    ws_arr[1:] = bounds[:-1] + 1

    # vectorized per-term window→block map + upper bounds for ALL windows
    ub_arr = np.zeros(W, dtype=np.float64)
    blk_of = np.empty((T, W), dtype=np.int64)
    ov = np.zeros((T, W), dtype=bool)
    for ti in range(T):
        bi = np.searchsorted(lasts[ti], ws_arr)
        valid = bi < len(lasts[ti])
        bic = np.where(valid, bi, 0)
        overlap = valid & (firsts[ti][bic] <= bounds)
        blk_of[ti] = bic
        ov[ti] = overlap
        ub_arr += np.where(overlap, bmaxs[ti][bic], 0.0)
    ov_lists = [np.flatnonzero(ov[:, w]) for w in range(W)]

    decoded: dict = {}  # (ti, bi) → (ids, contribs, w_first, cuts)
    blocks_decoded = 0

    def decode(ti: int, bi: int):
        """Decode + score one block and precompute its per-window cut points
        (vectorized searchsorted of the window boundaries it spans).  Once
        exact postings are known, the block's bmax is SUBTRACTED from the
        upper bound of spanned windows holding none of its postings — the
        cursor-position refinement of classic WAND (a sparse block spanning
        many windows would otherwise inflate every one of them and block
        skipping for the other terms)."""
        nonlocal blocks_decoded
        hit = decoded.get((ti, bi))
        if hit is None:
            ckey = (uniq[ti], bi)
            cached = score_cache.get(ckey)
            if cached is None:
                ids, tfs, dls = index.decode_block(uniq[ti], bi)
                contribs = bm25_term_score(
                    tfs, dls, idfs[ti], index.avgdl, index.k1, index.b
                )
                score_cache[ckey] = (ids, contribs)
                while len(score_cache) > _WAND_CACHE_BLOCKS:
                    score_cache.popitem(last=False)
            else:
                score_cache.move_to_end(ckey)
                ids, contribs = cached
            w_first = int(np.searchsorted(bounds, ids[0]))
            w_last = int(np.searchsorted(bounds, ids[-1]))
            cuts = np.searchsorted(ids, bounds[w_first : w_last + 1], side="right")
            seg_sizes = np.diff(np.concatenate(([0], cuts)))
            span = ub_arr[w_first : w_last + 1]
            span[(seg_sizes == 0) & ov[ti, w_first : w_last + 1]] -= bmaxs[ti][bi]
            ov[ti, w_first : w_last + 1] &= seg_sizes > 0
            hit = decoded[(ti, bi)] = (ids, contribs, w_first, cuts)
            blocks_decoded += 1
        return hit

    top_ids = np.empty(0, dtype=np.int64)
    top_sc = np.empty(0, dtype=np.float64)
    theta = -np.inf
    full = False

    pend_ids: List[np.ndarray] = []
    pend_sc: List[np.ndarray] = []
    pend_n = 0
    FLUSH_DOCS = 4096

    def flush():
        nonlocal top_ids, top_sc, theta, full, pend_n
        if not pend_ids:
            return
        cat_ids = np.concatenate(pend_ids)
        cat_sc = np.concatenate(pend_sc)
        pend_ids.clear()
        pend_sc.clear()
        pend_n = 0
        union, inv = np.unique(cat_ids, return_inverse=True)
        acc = np.zeros(len(union), dtype=np.float64)
        np.add.at(acc, inv, cat_sc)
        # windows are disjoint in doc id → no duplicates vs the running top-k
        all_ids = np.concatenate((top_ids, union))
        all_sc = np.concatenate((top_sc, acc))
        order = np.lexsort((all_ids, -all_sc))[:top_k]
        top_ids, top_sc = all_ids[order], all_sc[order]
        if len(top_sc) >= top_k:
            theta = top_sc[-1]
            full = True

    for w in range(W):
        # θ may be stale (tightens at flushes): skip only on strict <, which
        # also preserves (score desc, doc_id asc) exact-tie winners
        if full and ub_arr[w] < theta:
            continue
        terms_here = ov_lists[w]
        if len(terms_here) == 0:
            continue
        for ti in terms_here:
            if not ov[ti, w]:  # refined away by a decode-time tightening
                continue
            ids, contribs, w_first, cuts = decode(int(ti), int(blk_of[ti, w]))
            k = w - w_first
            lo = cuts[k - 1] if k > 0 else 0
            hi = cuts[k]
            if lo < hi:
                pend_ids.append(ids[lo:hi])
                pend_sc.append(contribs[lo:hi])
                pend_n += hi - lo
        # flush eagerly until the top-k fills (θ must tighten ASAP for
        # skipping to start), then amortize into FLUSH_DOCS batches
        if pend_n >= FLUSH_DOCS or (not full and pend_n >= top_k):
            flush()
            # dense-query bailout: if θ can prune almost nothing ahead,
            # windowing is pure overhead — bulk-evaluate the remaining tail
            # exactly like TAAT (term-major concatenation, so per-doc fp
            # addition order — and thus bit-identity — is preserved).  Two
            # guards keep it off selective queries, where skipping pays:
            # every term must have ≥1 decoded block (before that, sparse
            # terms' un-tightened bounds inflate every remaining window),
            # and θ must have reached half the query's largest single-block
            # max — right after the first fill θ is transiently low (the
            # k-th of whatever docs came first, often dense-only ones
            # scoring barely under the dense block-max), which used to
            # trigger the bailout on exactly the rare+dense query shape at
            # larger corpora (60k-doc repro: 449/449 blocks decoded; with
            # this guard: ~1/3).  A selective query cannot pass until rare-
            # term docs dominate the top-k, at which point real pruning has
            # started and the ≥0.9 density test fails instead; dense
            # queries pass on the first flush exactly as before.
            if (
                full
                and w + 1 < W
                and theta >= 0.5 * max_bmax
                and len({ti for ti, _ in decoded}) == T
                and (ub_arr[w + 1 :] >= theta).mean() >= 0.9
            ):
                ws_next = int(bounds[w]) + 1
                for ti in range(T):
                    ids_f, tfs_f, dls_f = index.postings(uniq[ti])
                    lo = int(np.searchsorted(ids_f, ws_next))
                    if lo < len(ids_f):
                        pend_ids.append(ids_f[lo:])
                        pend_sc.append(
                            bm25_term_score(
                                tfs_f[lo:], dls_f[lo:], idfs[ti],
                                index.avgdl, index.k1, index.b,
                            )
                        )
                        blocks_decoded += sum(
                            1
                            for bi in range(
                                int(np.searchsorted(lasts[ti], ws_next)),
                                len(lasts[ti]),
                            )
                            if (ti, bi) not in decoded
                        )
                break
    flush()

    if stats is not None:
        stats["blocks_decoded"] = blocks_decoded
        stats["blocks_total"] = int(sum(len(l) for l in lasts))

    order = np.lexsort((top_ids, -top_sc))
    return top_ids[order], top_sc[order]


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
      - "bm25_wand": block-max WAND top-k BM25.  NOTE: wand truncates at
        max(need, top_k), so the envelope's total_results/total_pages are
        LOWER BOUNDS (exact once the true hit count is below the cut);
        reference/bm25 totals are exact.
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
        self._last: Optional[Tuple] = None  # (query, need_key, ids, scores)

    def _score(self, query: str, need: int) -> Tuple[np.ndarray, np.ndarray]:
        # memoize the last query: a page request past the results re-asks
        # for totals (search_with_scorer), which must not rescore everything
        need_key = (
            max(need, self.top_k) if self.mode == "bm25_wand" else None
        )
        if self._last is not None and self._last[:2] == (query, need_key):
            return self._last[2], self._last[3]
        if self.mode == "reference":
            out = score_reference(self.index, query)
        elif self.mode == "bm25":
            out = score_bm25_taat(self.index, query, top_k=None)
        elif self.mode == "bm25_wand":
            out = score_bm25_wand(self.index, query, top_k=need_key)
        else:
            raise ValueError(f"unknown scoring mode {self.mode!r}")
        self._last = (query, need_key, out[0], out[1])
        return out

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
            # clamp: a negative page would slice from the TAIL of the
            # ranking (python negative indexing) with negative ranks
            page = max(1, int(page or 1))
            per_page = max(1, int(per_page or 10))
            ids, scores = self._score(query, need=page * per_page)
            total = len(ids)
            total_pages = (total + per_page - 1) // per_page  # search.py:124
            lo, hi = (page - 1) * per_page, (page - 1) * per_page + per_page
            page_ids, page_scores = ids[lo:hi], scores[lo:hi]

            meta: Dict[int, dict] = {}
            if self.docstore is not None and len(page_ids):
                meta = self.docstore.fetch(page_ids.tolist())
            # snippet highlight terms follow the SCORING tokenizer: in code
            # modes a doc may match only via split sub-tokens, which the
            # reference tokenizer would not find in the text
            qterms = TOKENIZERS[
                "reference" if self.mode == "reference" else "code"
            ](query)
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


@ray.remote(num_cpus=1)
class ScorerReplica:
    """One warm ``QueryScorer`` per actor PROCESS — the GIL-free serving
    replica behind ``SearchServer(scorer_replicas=N)``.  The in-process
    thread pool serializes python-side scoring on one interpreter lock
    (measured: 8 concurrent HTTP clients throughput BELOW one client's);
    N replicas put each scorer on its own core, so concurrent qps scales
    with replicas until the index's payload reads bound it.  Answers are
    byte-identical to the in-process path (same scorer, same snippets)."""

    def __init__(self, index_dir: str, mode: str = "reference"):
        self._scorer = QueryScorer(index_dir, mode=mode)

    def search(self, query: str, page: int = 1, per_page: int = 10) -> dict:
        return search_with_scorer(
            self._scorer, query, page=page, per_page=per_page
        )


@ray.remote
class ShardServer:
    """One serving actor per shard group: loads ONLY its shards' posting
    blocks (plus global stats) and answers per-query PARTIAL scores — the
    contributions of the terms it owns.  Since every term's postings live in
    exactly one shard, per-doc partials across groups sum to the full score.

    The last query's full partials are memoized doc_id-sorted, so the
    threshold-algorithm rounds (``topk_partials`` then ``partials_for``)
    score once per query, not once per round."""

    def __init__(self, index_dir: str, shards: Sequence[int], mode: str):
        self.index = PostingsIndex(index_dir, shards=list(shards))
        self.mode = mode
        self._memo: Optional[Tuple[str, np.ndarray, np.ndarray]] = None

    def _full_partials(self, query: str) -> Tuple[np.ndarray, np.ndarray]:
        """(doc_ids ascending, partial scores) of this group's terms."""
        if self._memo is not None and self._memo[0] == query:
            return self._memo[1], self._memo[2]
        if self.mode == "reference":
            ids, sc = _reference_partials(self.index, query)  # id-ascending
        else:
            ids, sc = score_bm25_taat(self.index, query, top_k=None)
            o = np.argsort(ids)
            ids, sc = ids[o], sc[o]
        self._memo = (query, ids, sc)
        return ids, sc

    def partial_scores(self, query: str):
        """Full partial lists — consumed by the merge TREE, never gathered
        on the driver (see ShardedSearcher.search)."""
        return self._full_partials(query)

    def topk_partials(self, query: str, kp: int):
        """(ids, partials) of this group's top-``kp`` docs BY PARTIAL score,
        plus the threshold bound (max partial NOT returned; 0.0 when the
        group is exhausted) and the group's total match count — one
        threshold-algorithm round's worth of data, O(kp) rows."""
        ids, sc = self._full_partials(query)
        order = np.lexsort((ids, -sc))[:kp]
        truncated = len(ids) > len(order)
        bound = float(sc[order[-1]]) if truncated and len(order) else 0.0
        return ids[order], sc[order], bound, len(ids)

    def partials_for(self, query: str, doc_ids: np.ndarray) -> np.ndarray:
        """Exact partial scores aligned to ``doc_ids`` (0.0 where the doc
        matches none of this group's terms) — the refinement round."""
        ids, sc = self._full_partials(query)
        out = np.zeros(len(doc_ids), dtype=np.float64)
        if len(ids):
            pos = np.searchsorted(ids, doc_ids)
            pos_c = np.minimum(pos, len(ids) - 1)
            hit = ids[pos_c] == doc_ids
            out[hit] = sc[pos_c[hit]]
        return out


@ray.remote
def _merge_partials(*parts):
    """Tree-reduce node: per-doc sum of (ids, partial) pairs.  Runs on
    WORKERS — O(matches) rows flow between tree levels, never to the
    driver."""
    parts = [p for p in parts if p is not None and len(p[0])]
    if not parts:
        return np.empty(0, dtype=np.int64), np.empty(0)
    ids = np.concatenate([p[0] for p in parts])
    sc = np.concatenate([p[1] for p in parts])
    union, inv = np.unique(ids, return_inverse=True)
    acc = np.zeros(len(union), dtype=np.float64)
    np.add.at(acc, inv, sc)
    return union, acc


@ray.remote
def _finalize_page(merged, page: int, per_page: int):
    """Tree root: score>0 filter, (score desc, doc_id asc) order, page
    slice + exact totals.  The driver receives O(per_page) rows plus two
    scalars — never the full match set (unless per_page=0 explicitly asks
    for everything)."""
    ids, acc = merged
    keep = acc > 0
    ids, acc = ids[keep], acc[keep]
    order = np.lexsort((ids, -acc))
    total = len(ids)
    lo = (page - 1) * per_page
    sel = order[lo : lo + per_page] if per_page else order
    return ids[sel], acc[sel], total


class ShardedSearcher:
    """Scatter-gather serving over shard-partitioned actors (the multi-node
    layout: each node's pool holds its shard group; SURVEY §2.3 T4 scale
    note).  Two bounded query paths (VERDICT r2 "What's wrong" #2 replaced
    the driver-side concatenation of FULL per-shard partial lists):

    - ``search`` (exact, any mode): per-doc partials are summed in a
      binary TREE of worker tasks; the root applies the score>0 filter,
      the (score desc, doc_id asc) order and the page slice, so the driver
      receives O(per_page) rows + exact totals.  O(matches) data moves only
      between workers — the same rows the old design shipped to one
      process now halve at each tree level.
    - ``search_topk`` (exact top-k, bm25 mode): Fagin-style threshold
      algorithm — per-shard top-kp partials, one refinement round of
      point lookups for the candidate union, doubling kp until the k-th
      exact score strictly beats the unseen-doc bound Σ per-shard
      thresholds.  Driver gather is O(groups · kp), never O(matches)
      (``last_gather_rows`` exposes it for the bound tests).  Requires
      non-negative partials, which BM25 contributions are; reference-mode
      tf·idf can go negative (ln(N/(df+1)) < 0 at df=N), so that mode
      always takes the tree path.

    Results are numerically within fp-reassociation of the single-index
    scorer (partials sum per group, then across groups)."""

    def __init__(self, index_dir: str, n_groups: int = 2, mode: str = "reference"):
        from .index_build import load_stats

        num_shards = int(load_stats(index_dir)["num_shards"])
        n_groups = max(1, min(n_groups, num_shards))
        groups = [
            [s for s in range(num_shards) if s % n_groups == g]
            for g in range(n_groups)
        ]
        self.mode = mode
        self.actors = [
            ShardServer.remote(index_dir, shards=g, mode=mode) for g in groups
        ]
        self.last_gather_rows = 0  # driver-side rows received, last query

    def search_envelope(self, query: str, page: int = 1, per_page: int = 10):
        """(page_ids, page_scores, total_results) with bounded gather."""
        # same clamp as QueryScorer (negative paging must not slice the
        # ranking tail via python negative indexing); per_page=0 keeps its
        # documented "all results" meaning (an explicitly unbounded ask)
        page, per_page = max(1, int(page)), max(0, int(per_page))
        refs = [a.partial_scores.remote(query) for a in self.actors]
        while len(refs) > 1:  # binary merge tree on workers
            refs = [
                _merge_partials.remote(*refs[i : i + 2])
                for i in range(0, len(refs), 2)
            ]
        ids, scores, total = ray.get(
            _finalize_page.remote(refs[0], page, per_page)
        )
        self.last_gather_rows = len(ids)
        return ids, scores, total

    def search(self, query: str, page: int = 1, per_page: int = 10):
        ids, scores, _ = self.search_envelope(query, page, per_page)
        return ids, scores

    def search_topk(self, query: str, k: int = 10, kp0: Optional[int] = None):
        """Exact BM25 top-k via the threshold algorithm (see class doc)."""
        if self.mode == "reference":
            raise ValueError(
                "search_topk requires non-negative partials (bm25 mode); "
                "reference-mode tf·idf can be negative — use search()"
            )
        kp = int(kp0) if kp0 else max(32, 4 * k)
        self.last_gather_rows = 0
        while True:
            outs = ray.get(
                [a.topk_partials.remote(query, kp) for a in self.actors]
            )
            self.last_gather_rows += sum(len(o[0]) for o in outs)
            nonempty = [o for o in outs if len(o[0])]
            if not nonempty:
                return np.empty(0, dtype=np.int64), np.empty(0)
            cand = np.unique(np.concatenate([o[0] for o in nonempty]))
            exact = ray.get(
                [a.partials_for.remote(query, cand) for a in self.actors]
            )
            self.last_gather_rows += len(cand) * len(self.actors)
            acc = np.sum(exact, axis=0)
            order = np.lexsort((cand, -acc))
            unseen_bound = sum(o[2] for o in outs)
            exhausted = all(o[2] == 0.0 for o in outs)
            if exhausted or (
                len(order) >= k and acc[order[k - 1]] > unseen_bound
            ):
                # strict > : an unseen doc reaching exactly the k-th score
                # could win its doc_id tie-break, so equality re-rounds
                sel = order[:k]
                return cand[sel], acc[sel]
            kp *= 2

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
    (search.py:119-126), computed driver-side without an actor pool.

    Builds a fresh scorer per call — a long-lived serving process should
    hold one ``QueryScorer`` and call :func:`search_with_scorer` instead
    (the REST façade does), keeping the lazy index's payload LRU warm."""
    return search_with_scorer(
        QueryScorer(index_dir, mode=mode), query, page=page, per_page=per_page
    )


def search_with_scorer(
    scorer: "QueryScorer", query: str, page: int = 1, per_page: int = 10
) -> dict:
    """:func:`search_one` over an existing (warm) scorer."""
    page, per_page = max(1, int(page)), max(1, int(per_page))
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

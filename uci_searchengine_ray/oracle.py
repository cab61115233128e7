"""Pure-Python conformance oracle (SURVEY.md §5 item 2).

Implements the reference's *intended* search semantics (§1.4) directly over a
list of (doc_id, content) pairs, with no Ray, no index — the stand-in for the
reference's (non-existent) index/search tests.  The Ray engine in "reference"
mode must be rank-identical with scores matching to rtol 1e-9.

Mirrors reference search.py:67-126 structure literally:
  tokenize query → OR-union candidate docs → for each doc, for each query
  token (in order, duplicates counted twice): score += (count/doclen) ·
  ln(N/(df+1)) → keep score>0 → sort (score desc, doc_id asc) → paginate.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Dict, List, Tuple

from .functions.scoring import build_snippet
from .functions.tokenizer import tokenize_reference


class OracleIndex:
    def __init__(self, docs: List[Tuple[int, str]]):
        """docs: (doc_id, content) pairs; N counts every row (search.py:85)."""
        self.n_docs = len(docs)
        self.docs = dict(docs)
        self.tokens: Dict[int, List[str]] = {
            d: tokenize_reference(c or "") for d, c in docs
        }
        self.tf: Dict[int, Counter] = {d: Counter(t) for d, t in self.tokens.items()}
        self.df: Counter = Counter()
        self.postings: Dict[str, List[int]] = {}
        for d, counts in self.tf.items():
            for term in counts:
                self.df[term] += 1
                self.postings.setdefault(term, []).append(d)

    def search(self, query: str, page: int = 1, per_page: int = 10) -> dict:
        # clamp exactly as the engine does (search.py QueryScorer) so
        # out-of-range paging stays rank-comparable
        page, per_page = max(1, int(page)), max(1, int(per_page))
        query_terms = tokenize_reference(query)
        if not query_terms:
            return {
                "query": query, "total_results": 0, "page": page,
                "per_page": per_page, "total_pages": 0, "results": [],
            }
        candidates = set()
        for term in query_terms:
            candidates.update(self.postings.get(term, []))

        n = self.n_docs or 1
        results = []
        for doc_id in candidates:
            score = 0.0
            dl = len(self.tokens[doc_id])
            for term in query_terms:  # in order; duplicates count twice
                count = self.tf[doc_id].get(term, 0)
                tf = count / dl if dl else 0.0
                idf = math.log(n / (self.df.get(term, 0) + 1))
                score += tf * idf
            if score > 0:
                results.append(
                    {
                        "doc_id": doc_id,
                        "score": score,
                        "snippet": build_snippet(self.docs[doc_id] or "", query_terms),
                    }
                )
        results.sort(key=lambda r: (-r["score"], r["doc_id"]))
        total = len(results)
        lo = (page - 1) * per_page
        return {
            "query": query,
            "total_results": total,
            "page": page,
            "per_page": per_page,
            "total_pages": (total + per_page - 1) // per_page,
            "results": results[lo : lo + per_page],
        }

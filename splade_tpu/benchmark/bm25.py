"""In-process BM25 inverted index.

Replaces the reference's OpenSearch BM25-with-nori baseline
(reference: benchmark/index_manager.py:47-79, searchers.py:79-107) with a
Lucene-formula BM25 over a pluggable analyzer. The default analyzer is the
50K Korean-heavy WordPiece tokenizer — the closest in-process stand-in for
the nori analyzer (documented deviation).

IDF: ln(1 + (N - df + 0.5)/(df + 0.5))   (Lucene/OpenSearch smoothing,
matching the reference's idf-compute "bm25" mode, tools/idf-compute
main.rs:124-235).
Score: idf * tf*(k1+1) / (tf + k1*(1 - b + b*len/avglen)).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


def whitespace_analyzer(text: str) -> List[str]:
    return text.lower().split()


def make_wordpiece_analyzer(tokenizer) -> Callable[[str], List[str]]:
    """Analyzer from an HF tokenizer: subword ids as terms, specials dropped."""
    special = set(tokenizer.all_special_ids)

    def analyze(text: str) -> List[str]:
        ids = tokenizer(text, add_special_tokens=False,
                        truncation=True, max_length=512)["input_ids"]
        return [str(i) for i in ids if i not in special]

    return analyze


class BM25Index:
    def __init__(self, k1: float = 1.2, b: float = 0.75,
                 analyzer: Optional[Callable[[str], List[str]]] = None):
        self.k1 = k1
        self.b = b
        self.analyzer = analyzer or whitespace_analyzer
        self.postings: Dict[str, List[Tuple[int, int]]] = defaultdict(list)
        self.doc_ids: List[str] = []
        self.doc_lens: List[int] = []
        self._idf: Dict[str, float] = {}
        self._avg_len = 0.0

    def add_documents(self, docs: Sequence[Tuple[str, str]]) -> None:
        """docs: (doc_id, text) pairs. Call finalize() after the last add."""
        for doc_id, text in docs:
            terms = self.analyzer(text)
            idx = len(self.doc_ids)
            self.doc_ids.append(doc_id)
            self.doc_lens.append(len(terms))
            for term, tf in Counter(terms).items():
                self.postings[term].append((idx, tf))

    def finalize(self) -> None:
        n = max(len(self.doc_ids), 1)
        self._avg_len = float(np.mean(self.doc_lens)) if self.doc_lens else 1.0
        self._idf = {
            t: math.log(1.0 + (n - len(pl) + 0.5) / (len(pl) + 0.5))
            for t, pl in self.postings.items()
        }

    def search(self, query: str, k: int = 10) -> List[Tuple[str, float]]:
        if not self._idf:
            self.finalize()
        scores: Dict[int, float] = defaultdict(float)
        k1, b, avg = self.k1, self.b, max(self._avg_len, 1e-9)
        for term in self.analyzer(query):
            idf = self._idf.get(term)
            if idf is None:
                continue
            for doc_idx, tf in self.postings[term]:
                norm = tf + k1 * (1.0 - b + b * self.doc_lens[doc_idx] / avg)
                scores[doc_idx] += idf * tf * (k1 + 1.0) / norm
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        return [(self.doc_ids[i], s) for i, s in ranked]

    def __len__(self) -> int:
        return len(self.doc_ids)

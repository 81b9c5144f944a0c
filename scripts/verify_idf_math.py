"""Standalone numeric verification of the IDF/BM25 formulas
(reference: scripts/test_idf_math.py — 345 LoC of formula checks)."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import math

import numpy as np

from splade_tpu.utils.idf import compute_idf


VOCAB = {"a": 1, "b": 2, "c": 3, "d": 4}  # fixed IDs: hash() is per-process random


class WordTok:
    def __call__(self, text, **kw):
        return {"input_ids": [VOCAB[w] for w in text.split()]}


def check(name, got, want, tol=1e-9):
    ok = abs(got - want) < tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: got {got:.6f} want {want:.6f}")
    assert ok, name


if __name__ == "__main__":
    texts = ["a b c", "a b", "a", "d"]
    N = 4
    idf_bm25, _ = compute_idf(texts, WordTok(), 100, "bm25")
    idf_std, _ = compute_idf(texts, WordTok(), 100, "standard")
    ia, ib, idd = VOCAB["a"], VOCAB["b"], VOCAB["d"]
    # BM25 (Lucene smoothing): ln(1 + (N-df+0.5)/(df+0.5))
    check("bm25 df=3", idf_bm25[ia], math.log(1 + (4 - 3 + 0.5) / 3.5), 1e-6)
    check("bm25 df=2", idf_bm25[ib], math.log(1 + (4 - 2 + 0.5) / 2.5), 1e-6)
    check("bm25 df=1", idf_bm25[idd], math.log(1 + (4 - 1 + 0.5) / 1.5), 1e-6)
    # standard: ln(N/(df+1))
    check("std df=3", idf_std[ia], math.log(4 / 4), 1e-6)
    check("std df=1", idf_std[idd], math.log(4 / 2), 1e-6)
    # monotonicity: rarer terms score higher
    assert idf_bm25[idd] > idf_bm25[ib] > idf_bm25[ia]
    # unseen token (id 50 is outside VOCAB): bm25 ln(1+(N+0.5)/0.5)
    check("bm25 df=0", idf_bm25[50], math.log(1 + 4.5 / 0.5), 1e-6)
    print("all IDF math checks passed")

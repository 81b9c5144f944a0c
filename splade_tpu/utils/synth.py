"""Synthetic SPLADE-like corpora shared by the benchmarks.

One definition so every bench (postings QPS, serving load, index
experiments) measures the SAME distribution — Zipf(1.3) term popularity,
|N(0,1)|+0.1 impacts, ~54 nnz/doc like the published model card.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def zipf_corpus_csr(rng: np.random.Generator, n_docs: int, vocab: int,
                    nnz: int = 54) -> Tuple[np.ndarray, np.ndarray]:
    """Rectangular CSR blocks ([n, nnz] term ids, [n, nnz] f32 weights)."""
    terms = (rng.zipf(1.3, size=n_docs * nnz) % vocab).astype(
        np.int32).reshape(n_docs, nnz)
    vals = (np.abs(rng.normal(size=(n_docs, nnz))) + 0.1).astype(np.float32)
    return terms, vals


def uniform_vectors(rng: np.random.Generator, n: int, vocab: int,
                    nnz: int) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Per-vector (indices, values) pairs with unique uniform terms."""
    out = []
    for _ in range(n):
        idx = rng.choice(vocab, size=nnz, replace=False).astype(np.int32)
        vals = (np.abs(rng.normal(size=nnz)) + 0.05).astype(np.float32)
        out.append((idx, vals))
    return out

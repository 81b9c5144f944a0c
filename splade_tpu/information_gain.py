"""Information-gain filtering of synonym/expansion pairs in embedding space.

Reference: src/information_gain.py:50-708 — Kozachenko-Leonenko KNN entropy
estimator over embeddings, IG(s->t) = H(t) - H(t|s), FAISS-accelerated
neighbor search, percentile/adaptive thresholds, and a filter that drops
trivial pairs (where the target adds no information over the source).

This implementation uses exact numpy KNN (the pools involved are small) and
keeps the same estimator math: H ≈ (d/n)·Σ log r_k(i) + log V_d(unit) +
log(n-1) + γ - L(k-1) with the digamma-free Euler-form correction.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

EULER_GAMMA = 0.5772156649015329


def unit_ball_volume(d: int) -> float:
    """Volume of the d-dimensional unit ball: pi^(d/2) / Gamma(d/2 + 1)."""
    return math.pi ** (d / 2) / math.gamma(d / 2 + 1)


def _pairwise_sq_dists(x: np.ndarray) -> np.ndarray:
    """[n, n] squared distances via ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a·b.

    O(n^2 + n*d) memory — the broadcastized (x[:,None]-x[None])**2 form
    materializes an [n, n, d] tensor (153 GB at n=5000, d=768: the module's
    stated synonym-filtering workload) and OOMs.
    """
    sq = (x * x).sum(-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (x @ x.T)
    return np.maximum(d2, 0.0)  # clamp the fp cancellation noise


def _knn_radii(x: np.ndarray, k: int) -> np.ndarray:
    """Distance to the k-th nearest neighbor (excluding self) per point."""
    d2 = _pairwise_sq_dists(x)
    np.fill_diagonal(d2, np.inf)
    kth = np.partition(d2, k - 1, axis=1)[:, k - 1]
    return np.sqrt(np.maximum(kth, 1e-30))


def kl_entropy(x: np.ndarray, k: int = 3) -> float:
    """Kozachenko-Leonenko differential entropy estimate (nats).

    H ≈ ψ(n) − ψ(k) + log V_d + (d/n) Σ log r_k(i)
    (reference: information_gain.py:50-180).
    """
    x = np.asarray(x, np.float64)
    n, d = x.shape
    if n <= k:
        return 0.0
    radii = _knn_radii(x, k)
    digamma_n = _digamma(n)
    digamma_k = _digamma(k)
    return float(digamma_n - digamma_k + math.log(unit_ball_volume(d))
                 + d * np.mean(np.log(radii)))


def _digamma(m: int) -> float:
    """Digamma at positive integers: ψ(m) = −γ + Σ_{i=1}^{m−1} 1/i."""
    return -EULER_GAMMA + sum(1.0 / i for i in range(1, m))


@dataclass
class IGResult:
    source: str
    target: str
    information_gain: float
    keep: bool


class InformationGainFilter:
    """Filter pairs by IG(s->t) = H(t-embeddings) − H(t|s) in embedding space.

    H(t|s) is estimated as the entropy of the residual t − proj_s(t): if the
    target embedding is predictable from the source, the residual collapses
    and IG ≈ H(t). Pairs *below* the threshold are trivial (target adds
    nothing beyond the source) — matching the reference's use of IG to drop
    uninformative synonym expansions.
    """

    def __init__(self, k: int = 3, threshold: Optional[float] = None,
                 percentile: float = 25.0):
        self.k = k
        self.threshold = threshold
        self.percentile = percentile

    def information_gains(
        self, src_emb: np.ndarray, tgt_emb: np.ndarray
    ) -> np.ndarray:
        """Per-pair information of the target beyond the source.

        H(t|s) is estimated locally: predict t_i from the targets of s_i's k
        nearest neighbor sources (leave-one-out KNN regression); the
        log-residual measures how much of t_i the source fails to explain,
        normalized by the target's local k-NN radius (density correction).

        IG_i ≈ d · (log ||t_i − t̂_i|| − log r_k^T(i)) + H(T):
        ≈ H(T) for unpredictable (novel) targets, strongly negative for
        trivial ones (t determined by s).
        """
        src = np.asarray(src_emb, np.float64)
        tgt = np.asarray(tgt_emb, np.float64)
        n, d = tgt.shape
        k = min(self.k, n - 1)
        if k < 1:
            # a single pair has no neighbors to regress from: its target is
            # unexplainable by construction -> neutral gain 0 (kept by any
            # percentile threshold), not NaN from an empty-axis mean
            return np.zeros(n, np.float64)
        d2 = _pairwise_sq_dists(src)
        np.fill_diagonal(d2, np.inf)
        nbrs = np.argpartition(d2, k - 1, axis=1)[:, :k]  # [n, k]
        pred = tgt[nbrs].mean(axis=1)
        resid = np.sqrt(np.maximum(((tgt - pred) ** 2).sum(-1), 1e-30))
        r_t = _knn_radii(tgt, k)
        h_t = kl_entropy(tgt, k)
        return d * (np.log(resid) - np.log(r_t)) + h_t

    def filter_pairs(
        self,
        pairs: Sequence[Tuple[str, str]],
        src_emb: np.ndarray,
        tgt_emb: np.ndarray,
    ) -> List[IGResult]:
        if not (len(pairs) == len(src_emb) == len(tgt_emb)):
            # zip would silently truncate, dropping pairs from the result
            # and computing the percentile over the wrong population
            raise ValueError(
                f"length mismatch: {len(pairs)} pairs, {len(src_emb)} src "
                f"embeddings, {len(tgt_emb)} tgt embeddings")
        if not len(pairs):
            return []
        gains = self.information_gains(src_emb, tgt_emb)
        thr = (self.threshold if self.threshold is not None
               else float(np.percentile(gains, self.percentile)))
        return [IGResult(a, b, float(g), bool(g >= thr))
                for (a, b), g in zip(pairs, gains)]

    @staticmethod
    def stats(results: Sequence[IGResult]) -> Dict[str, float]:
        kept = sum(r.keep for r in results)
        gains = [r.information_gain for r in results]
        return {
            "total": len(results),
            "kept": kept,
            "kept_rate": kept / len(results) if results else 0.0,
            "mean_ig": float(np.mean(gains)) if gains else 0.0,
        }

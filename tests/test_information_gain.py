"""Information-gain estimator tests (reference test model:
tests/test_information_gain.py — KNN entropy math, unit-ball volume, IG
filtering edge cases)."""

import math

import numpy as np
import pytest

from splade_tpu.information_gain import (
    InformationGainFilter,
    kl_entropy,
    unit_ball_volume,
)


def test_unit_ball_volume_golden():
    assert unit_ball_volume(1) == pytest.approx(2.0)
    assert unit_ball_volume(2) == pytest.approx(math.pi)
    assert unit_ball_volume(3) == pytest.approx(4.0 / 3.0 * math.pi)


def test_kl_entropy_gaussian_matches_analytic():
    """H of N(0, sigma^2 I_d) = d/2 log(2*pi*e*sigma^2)."""
    rng = np.random.default_rng(0)
    d, sigma = 2, 1.5
    x = rng.normal(scale=sigma, size=(2000, d))
    want = d / 2 * math.log(2 * math.pi * math.e * sigma ** 2)
    got = kl_entropy(x, k=3)
    assert got == pytest.approx(want, rel=0.05)


def test_kl_entropy_scales_with_spread():
    rng = np.random.default_rng(1)
    tight = kl_entropy(rng.normal(scale=0.1, size=(500, 3)))
    wide = kl_entropy(rng.normal(scale=2.0, size=(500, 3)))
    assert wide > tight


def test_kl_entropy_degenerate_small_n():
    assert kl_entropy(np.zeros((2, 4)), k=3) == 0.0


def test_ig_filter_drops_trivial_pairs():
    """Targets that are copies of sources carry no information beyond them;
    targets that are independent carry full entropy."""
    rng = np.random.default_rng(2)
    n, d = 120, 8
    src = rng.normal(size=(n, d))
    trivial_tgt = src + rng.normal(scale=0.01, size=(n, d))  # predictable
    novel_tgt = rng.normal(size=(n, d))                       # independent
    half = n // 2
    tgt = np.concatenate([trivial_tgt[:half], novel_tgt[half:]])
    pairs = [(f"s{i}", f"t{i}") for i in range(n)]
    filt = InformationGainFilter(k=3, percentile=50.0)
    results = filt.filter_pairs(pairs, src, tgt)
    gains = np.asarray([r.information_gain for r in results])
    # Novel pairs must have systematically higher IG than trivial ones.
    assert gains[half:].mean() > gains[:half].mean() + 1.0
    kept_trivial = sum(r.keep for r in results[:half])
    kept_novel = sum(r.keep for r in results[half:])
    assert kept_novel > kept_trivial
    stats = filt.stats(results)
    assert stats["total"] == n and 0 < stats["kept"] < n


def test_ig_filter_explicit_threshold():
    rng = np.random.default_rng(3)
    src = rng.normal(size=(40, 4))
    tgt = rng.normal(size=(40, 4))
    filt = InformationGainFilter(k=3, threshold=-1e9)
    results = filt.filter_pairs([("a", "b")] * 40, src, tgt)
    assert all(r.keep for r in results)

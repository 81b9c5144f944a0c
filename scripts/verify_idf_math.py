"""Standalone numeric verification of the IDF/BM25 formulas and the legacy
IDF-aware FLOPS penalty math.

Reference: scripts/test_idf_math.py (345 LoC, 6 check groups): BM25 IDF
formula, IDF->penalty conversion, stopword penalty multiplication, weighted
FLOPS loss (correct w*x^2 vs wrong (w*x)^2), gradient flow, and the
semantic-vs-stopword penalty gap. The penalty/stopword machinery belongs to
the V25/V26 legacy generation (SURVEY.md Appendix B) — V33 dropped it — but
the math contracts are verified here for parity."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import math

import numpy as np

from splade_tpu.utils.idf import compute_idf
from splade_tpu.utils.runtime import force_cpu_if_requested

force_cpu_if_requested()  # pure math — never grab the (single-tenant) TPU


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

    # ---- check 2: IDF -> penalty conversion (reference :61-101)
    # penalty = exp(-alpha * minmax_norm(idf)): rare (high-IDF) tokens get
    # LOW penalty so FLOPS pressure spares them.
    alpha = 2.0
    idf = np.linspace(0.5, 5.0, 100)
    norm = (idf - idf.min()) / (idf.max() - idf.min() + 1e-8)
    penalty = np.exp(-alpha * norm)
    check("penalty(common)", penalty[0], 1.0, 1e-9)
    check("penalty(rare)", penalty[-1], math.exp(-alpha), 1e-9)
    assert penalty[-1] < penalty[0], "rare tokens must get lower penalty"
    assert np.all(np.diff(penalty) < 0), "penalty monotone-decreasing in IDF"
    print("PASS penalty conversion monotone, exp(-alpha*norm)")

    # ---- check 3: stopword penalty multiplication (reference :103-150)
    rng = np.random.default_rng(0)
    pen = rng.random(100) * 0.5 + 0.5
    stop = rng.choice(100, size=30, replace=False)
    enhanced = pen.copy()
    enhanced[stop] *= 5.0
    check("stopword x5", enhanced[stop[0]], pen[stop[0]] * 5.0, 1e-12)
    non_stop = np.setdiff1d(np.arange(100), stop)
    assert np.array_equal(enhanced[non_stop], pen[non_stop]), \
        "non-stopwords unchanged"
    print("PASS stopword multiplication (5x on stopwords, others unchanged)")

    # ---- check 4: weighted FLOPS loss — w*x^2 vs the (w*x)^2 bug
    # (reference :152-196; the fixed formula is sum_j w_j * mean_j^2)
    w = rng.random(100)
    acts = rng.random((4, 100)) * 3
    mean_act = acts.mean(axis=0)
    l1 = float((w * np.abs(mean_act)).sum())
    l2_correct = float((w * mean_act ** 2).sum())
    l2_wrong = float(((w * mean_act) ** 2).sum())
    assert abs(l2_correct - l2_wrong) > 0.01, "formulas must differ"
    beta = 0.3
    check("flops L1+beta*L2", l1 + beta * l2_correct,
          l1 + beta * float(np.dot(w, mean_act ** 2)), 1e-9)
    print(f"PASS weighted FLOPS: L2 correct {l2_correct:.4f} != wrong {l2_wrong:.4f}")

    # ---- check 5: gradient flow (reference :197-247) — jax.grad instead
    # of torch autograd; higher-penalty dims must receive stronger gradient.
    import jax
    import jax.numpy as jnp

    def flops_loss(x):
        m = jnp.mean(x, axis=0)
        return (jnp.asarray(w) * jnp.abs(m)).sum() + \
            beta * (jnp.asarray(w) * m ** 2).sum()

    g = np.asarray(jax.grad(flops_loss)(jnp.asarray(acts)))
    assert g.shape == acts.shape and np.isfinite(g).all()
    hi, lo = int(w.argmax()), int(w.argmin())
    g_hi = np.abs(g[:, hi]).mean()
    g_lo = np.abs(g[:, lo]).mean()
    assert g_hi > g_lo, "high-penalty dim must get more gradient pressure"
    print(f"PASS gradient flow: |g|(high penalty)={g_hi:.6f} > "
          f"|g|(low)={g_lo:.6f}")

    # ---- check 6: semantic vs stopword effect (reference :249-298)
    V = 1000
    idf_w = np.empty(V)
    idf_w[:100] = rng.random(100) * 2 + 4      # semantic: IDF 4-6
    idf_w[900:] = rng.random(100) * 0.5        # stopwords: IDF 0-0.5
    idf_w[100:900] = rng.random(800) * 2 + 1   # medium
    norm = (idf_w - idf_w.min()) / (idf_w.max() - idf_w.min() + 1e-8)
    pen = np.exp(-2.5 * norm)
    pen[900:] *= 5.0
    ratio = pen[900:].mean() / pen[:100].mean()
    assert ratio > 10, f"stopword/semantic penalty ratio {ratio:.1f} <= 10"
    print(f"PASS semantic vs stopword: penalty ratio {ratio:.1f}x > 10x")

    print("all IDF math checks passed (6/6 groups)")

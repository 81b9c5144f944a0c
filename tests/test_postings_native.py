"""C++ parallel postings builder: build the shared library, verify it
against the numpy reference implementation, and demonstrate thread safety
with a clean TSAN run (SURVEY §5.2 policy, same as the idf tool)."""

import ctypes
import subprocess
from pathlib import Path

import numpy as np
import pytest

import splade_tpu.ops.postings_native as pn
from splade_tpu.ops.postings_index import TpuPostingsIndex, invert_to_postings

TOOL_DIR = Path(__file__).resolve().parent.parent / "tools" / "postings_build"
V = 700


@pytest.fixture(scope="module")
def lib():
    r = subprocess.run(["make", "-C", str(TOOL_DIR)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    lib = pn.load_library()
    assert lib is not None
    return lib


def synth(n=400, nnz=10, seed=0):
    rng = np.random.default_rng(seed)
    idx, val = [], []
    for _ in range(n):
        idx.append(rng.choice(V, size=nnz, replace=False).astype(np.int32))
        # distinct impacts -> unique top-P selection (no tie ambiguity)
        val.append((rng.permutation(n * nnz)[:nnz] / (n * nnz) + 0.01
                    ).astype(np.float32))
    return idx, val


def numpy_reference(doc_idx, doc_val, P):
    """The pure-numpy path, with the native fast path disabled."""
    real = pn.build_postings_native
    pn.build_postings_native = lambda *a, **k: None
    try:
        return invert_to_postings(doc_idx, doc_val, V, P)
    finally:
        pn.build_postings_native = real


@pytest.mark.parametrize("P", [4, 16, 512])
def test_native_matches_numpy_reference(lib, P):
    doc_idx, doc_val = synth()
    lens = [len(x) for x in doc_idx]
    all_terms = np.concatenate(doc_idx)
    all_vals = np.concatenate(doc_val).astype(np.float32)
    all_docs = np.repeat(np.arange(len(doc_idx), dtype=np.int32), lens)
    got = pn.build_postings_native(all_terms, all_vals, all_docs, V, P)
    assert got is not None
    nd, nw, ntrunc = got
    rd, rw, rtrunc = numpy_reference(doc_idx, doc_val, P)
    assert ntrunc == rtrunc
    # identical kept SETS per term; native ordering is exact-f32 impact
    # (the numpy path orders by f16-approximate keys), so compare sorted
    for v in range(V):
        np.testing.assert_array_equal(np.sort(nw[v])[::-1], np.sort(rw[v])[::-1])
        assert set(zip(nd[v], nw[v])) == set(zip(rd[v], rw[v]))
        # and the native rows themselves are impact-ordered
        kept = nw[v][nw[v] > 0]
        assert (np.diff(kept) <= 0).all()


def test_index_build_uses_native_and_searches(lib):
    doc_idx, doc_val = synth(n=200)
    index = TpuPostingsIndex(V, n_postings=8, query_top_t=8, approx=False)
    index.add_batch([f"d{i}" for i in range(200)],
                    list(zip(doc_idx, doc_val)))
    index.build()
    res = index.search_vector(doc_idx[7], doc_val[7], k=3)
    assert res[0][0] == "d7"


def test_native_rejects_bad_args(lib):
    out = pn.build_postings_native(
        np.zeros(1, np.int32), np.zeros(1, np.float32), np.zeros(1, np.int32),
        0, 8)  # vocab <= 0 -> builder returns -1 -> wrapper returns None
    assert out is None


def test_tsan_clean(lib):
    """Thread-safety by evidence: the TSAN self-test binary runs a
    multithreaded build with no data-race reports (TSAN cannot be
    dlopen'd into a running python, so the check is standalone)."""
    r = subprocess.run(["make", "-C", str(TOOL_DIR),
                        "postings_tsan_selftest"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"tsan build unavailable: {r.stderr[-200:]}")
    run = subprocess.run([str(TOOL_DIR / "postings_tsan_selftest")],
                         capture_output=True, text=True, timeout=300)
    assert run.returncode == 0, run.stderr[-2000:]
    assert "SELFTEST-OK" in run.stdout
    assert "WARNING: ThreadSanitizer" not in run.stderr, run.stderr[-2000:]


def test_asan_clean(lib):
    r = subprocess.run(["make", "-C", str(TOOL_DIR),
                        "postings_asan_selftest"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"asan build unavailable: {r.stderr[-200:]}")
    run = subprocess.run([str(TOOL_DIR / "postings_asan_selftest")],
                         capture_output=True, text=True, timeout=300)
    assert run.returncode == 0 and "SELFTEST-OK" in run.stdout, run.stderr[-2000:]

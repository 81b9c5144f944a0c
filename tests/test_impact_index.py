"""TPU impact index tests: exactness vs the CPU oracle, padding, int8."""

import numpy as np
import pytest

from splade_tpu.benchmark.index import ExactSparseIndex
from splade_tpu.ops.impact_index import TpuImpactIndex


def make_corpus(rng, n_docs=50, vocab=256, nnz=12):
    vecs = []
    for _ in range(n_docs):
        idx = rng.choice(vocab, size=nnz, replace=False).astype(np.int32)
        val = np.abs(rng.normal(size=nnz)).astype(np.float32) + 0.1
        vecs.append((idx, val))
    return vecs


@pytest.fixture(scope="module")
def corpus(rng):
    return make_corpus(rng)


def test_matches_cpu_oracle(corpus, rng):
    V = 256
    tpu = TpuImpactIndex(V)
    cpu = ExactSparseIndex(V)
    for i, (idx, val) in enumerate(corpus):
        tpu.add(f"d{i}", idx, val)
        cpu.add(f"d{i}", idx, val)
    tpu.build()
    for _ in range(5):
        qi = rng.choice(V, size=8, replace=False).astype(np.int32)
        qv = np.abs(rng.normal(size=8)).astype(np.float32)
        got = tpu.search_vector(qi, qv, k=10)
        want = cpu.search_vector(qi, qv, k=10)
        got_ids = [d for d, _ in got]
        want_scores = dict(want)
        # same scores for every returned doc (f32 vs bf16 storage: loose tol)
        for d, s in got:
            if d in want_scores:
                assert s == pytest.approx(want_scores[d], rel=2e-2, abs=1e-2)
        # top-1 agrees
        assert got_ids[0] == want[0][0]


def test_batch_search_and_padding(corpus):
    V = 256
    idx = TpuImpactIndex(V, batch_pad=8)
    idx.add_batch([f"d{i}" for i in range(len(corpus))], corpus)
    idx.build()
    rng = np.random.default_rng(1)
    Q = np.abs(rng.normal(size=(3, V))).astype(np.float32)  # B=3 -> pad to 8
    out = idx.search_batch_dense(Q, k=5)
    assert len(out) == 3
    for ranked in out:
        assert len(ranked) == 5
        scores = [s for _, s in ranked]
        assert scores == sorted(scores, reverse=True)


def test_int8_quantized_close_to_exact(corpus, rng):
    V = 256
    exact = TpuImpactIndex(V)
    q8 = TpuImpactIndex(V, quantize_int8=True)
    for i, (idx, val) in enumerate(corpus):
        exact.add(f"d{i}", idx, val)
        q8.add(f"d{i}", idx, val)
    exact.build()
    q8.build()
    assert q8.memory_bytes * 2 <= exact.memory_bytes
    agree = 0
    for _ in range(10):
        qi = rng.choice(V, size=8, replace=False).astype(np.int32)
        qv = np.abs(rng.normal(size=8)).astype(np.float32)
        a = exact.search_vector(qi, qv, k=1)[0][0]
        b = q8.search_vector(qi, qv, k=1)[0][0]
        agree += a == b
    assert agree >= 8  # int8 top-1 agreement


def test_query_top_k_truncation(corpus):
    V = 256
    idx = TpuImpactIndex(V)
    idx.add_batch([f"d{i}" for i in range(len(corpus))], corpus)
    idx.build()
    vec = np.abs(np.random.default_rng(3).normal(size=V)).astype(np.float32)
    full = idx.search_dense(vec, k=5)
    trunc = idx.search_dense(vec, k=5, query_top_k=16)
    assert len(trunc) == 5
    assert set(d for d, _ in trunc) & set(d for d, _ in full)


def test_empty_index_raises():
    with pytest.raises(ValueError):
        TpuImpactIndex(64).build()


def test_two_phase_search_matches_full(corpus, rng):
    V = 256
    idx = TpuImpactIndex(V)
    idx.add_batch([f"d{i}" for i in range(len(corpus))], corpus)
    idx.build()
    hits = 0
    for _ in range(5):
        qi = rng.choice(V, size=10, replace=False).astype(np.int32)
        qv = np.abs(rng.normal(size=10)).astype(np.float32) + 0.05
        full = idx.search_vector(qi, qv, k=5)
        two = idx.search_two_phase(qi, qv, k=5, prune_ratio=0.3, expansion=5.0)
        assert len(two) == 5
        scores = [s for _, s in two]
        assert scores == sorted(scores, reverse=True)
        hits += len(set(d for d, _ in two) & set(d for d, _ in full))
    assert hits >= 20  # >=80% overlap with exact at these settings


def test_mesh_sharded_index_matches_single(corpus, rng):
    """Corpus matrix sharded over an 8-device mesh gives identical results
    to the single-device index (GSPMD handles the sharded top-k)."""
    from splade_tpu.parallel.mesh import make_mesh

    V = 256
    mesh = make_mesh()
    assert mesh.devices.size == 8
    sharded = TpuImpactIndex(V, mesh=mesh)
    plain = TpuImpactIndex(V)
    ids = [f"d{i}" for i in range(len(corpus))]
    sharded.add_batch(ids, corpus)
    plain.add_batch(ids, corpus)
    sharded.build()
    plain.build()
    assert sharded._n_pad % (128 * 8) == 0
    for _ in range(3):
        qi = rng.choice(V, size=8, replace=False).astype(np.int32)
        qv = np.abs(rng.normal(size=8)).astype(np.float32)
        a = sharded.search_vector(qi, qv, k=5)
        b = plain.search_vector(qi, qv, k=5)
        assert [d for d, _ in a] == [d for d, _ in b]
        for (da, sa), (db, sb) in zip(a, b):
            assert sa == pytest.approx(sb, rel=2e-2, abs=1e-2)


def test_csr_staging_and_max_docs_guard():
    """Staging is CSR (KB/doc), not dense rows (200 KB/doc), and the
    doc-count guard points large corpora at the postings index
    (VERDICT r1 weak #5 / next #8)."""
    V = 512
    idx = TpuImpactIndex(V, max_docs=4)
    for i in range(4):
        idx.add(f"d{i}", np.array([i, i + 5], np.int32),
                np.array([1.0, 2.0], np.float32))
    # staged memory is per-nnz, not per-dim
    staged = sum(a.nbytes + b.nbytes for a, b in idx._docs)
    assert staged < 4 * 100  # bytes, vs 4 * 512 * 4 dense
    with pytest.raises(ValueError, match="TpuPostingsIndex"):
        idx.add("d4", np.array([1], np.int32), np.array([1.0], np.float32))
    # cap=0 disables the guard
    unl = TpuImpactIndex(V, max_docs=0)
    for i in range(6):
        unl.add(f"d{i}", np.array([i], np.int32), np.array([1.0], np.float32))
    # delete keeps nnz/book-keeping consistent on the CSR staging
    assert idx.delete(["d1", "nope"]) == 1
    assert len(idx) == 3 and idx.nnz == 6
    idx.build()
    res = idx.search_vector(np.array([0], np.int32),
                            np.array([1.0], np.float32), k=2)
    assert res[0][0] == "d0"


def test_benchmark_config_env(monkeypatch):
    from splade_tpu.benchmark.config import BenchmarkConfig

    monkeypatch.setenv("BENCH_SAMPLE_SIZE", "77")
    monkeypatch.setenv("BENCH_INCLUDE_HYBRID", "false")
    monkeypatch.setenv("BENCH_DATASET", "miracl-ko")
    cfg = BenchmarkConfig.from_env(top_k=5)
    assert cfg.sample_size == 77
    assert cfg.include_hybrid is False
    assert cfg.dataset == "miracl-ko"
    assert cfg.top_k == 5
    assert cfg.query_top_k == 64

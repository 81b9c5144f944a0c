"""DF-tiered postings tests (VERDICT r4 #2: per-term posting budgets for
the hot-term regime where uniform truncation collapses).

Covers: tier-build structure (hot selection by df, continuation slices,
truncation accounting), exactness when the combined depth covers every
list, the headline property — a hot-term corpus where the uniform index
at equal COLD depth fails and the tiered index recovers — scoring-mode
parity, save/load, and degenerate configs.
"""

import numpy as np
import pytest

from splade_tpu.benchmark.index import ExactSparseIndex
from splade_tpu.ops.postings_index import TpuPostingsIndex
from splade_tpu.ops.tiered_postings import (TieredPostingsIndex,
                                            build_tiered,
                                            select_hot_terms)

V = 500


def hot_corpus(n=400, seed=0, hot=(3, 5, 7), n_cold_terms=6):
    """Every doc fires 2 HOT terms (df == n, way past any small cold cap)
    whose impact carries most of the score, plus distinct cold terms.
    The true top docs for a hot-term query are decided by hot-term
    impact rank > cold cap, so a uniform short-cap index must miss them.
    """
    rng = np.random.default_rng(seed)
    vecs = []
    for i in range(n):
        h = rng.choice(hot, size=2, replace=False).astype(np.int32)
        hv = (np.abs(rng.normal(size=2)) + 0.5).astype(np.float32)
        c = rng.choice(np.arange(50, V), size=n_cold_terms,
                       replace=False).astype(np.int32)
        cv = (np.abs(rng.normal(size=n_cold_terms)) * 0.05
              + 0.01).astype(np.float32)
        vecs.append((np.concatenate([h, c]),
                     np.concatenate([hv, cv])))
    return vecs


def build_pair(corpus, p_cold, hot_terms, p_hot, **kw):
    exact = ExactSparseIndex(vocab_size=V)
    tiered = TieredPostingsIndex(V, n_postings=p_cold, hot_terms=hot_terms,
                                 hot_postings=p_hot, query_top_t=8, **kw)
    for i, (idx, val) in enumerate(corpus):
        exact.add(f"d{i}", idx, val)
        tiered.add(f"d{i}", idx, val)
    tiered.build()
    return exact, tiered


def test_select_hot_terms_by_df():
    df = np.array([0, 100, 3, 50, 7, 7])
    assert select_hot_terms(df, p_cold=5, hot_terms=2).tolist() == [1, 3]
    # only terms overflowing the cold cap qualify
    assert select_hot_terms(df, p_cold=60, hot_terms=4).tolist() == [1]
    assert select_hot_terms(df, p_cold=200, hot_terms=4).size == 0


def test_build_tiered_structure():
    corpus = hot_corpus(n=100)
    doc_idx = [c[0] for c in corpus]
    doc_val = [c[1] for c in corpus]
    p_cold, p_hot = 8, 128
    (cold_docs, cold_w, hot_slot, hot_docs, hot_w,
     trunc) = build_tiered(doc_idx, doc_val, V, p_cold, 16, p_hot)
    H = hot_docs.shape[0]
    assert 1 <= H <= 16
    # hot slots: exactly H mapped terms, everything else at pad H
    assert (hot_slot < H).sum() == H
    # continuation property: for each hot term, the weakest cold impact
    # >= the strongest hot impact (impact-ordered split at rank p_cold)
    hot_ids = np.flatnonzero(hot_slot < H)
    for t in hot_ids:
        s = hot_slot[t]
        if hot_w[s].max() > 0:
            assert cold_w[t].min() >= hot_w[s].max() - 1e-5
    # tiered truncation is strictly less than uniform-at-p_cold's
    from splade_tpu.ops.postings_index import invert_to_postings
    _, _, trunc_uniform = invert_to_postings(doc_idx, doc_val, V, p_cold)
    assert 0 <= trunc < trunc_uniform


def test_exact_when_combined_depth_covers():
    """p_cold + p_hot >= max df -> two-phase tiered == exact oracle."""
    corpus = hot_corpus(n=300)
    # hot_terms must cover EVERY term with df > p_cold (the mid-df tail
    # of the random cold terms overflows an 8-cap too)
    exact, tiered = build_pair(corpus, p_cold=8, hot_terms=64, p_hot=512,
                               rescore_candidates=64, approx=False,
                               scoring="sort")
    assert tiered.truncated_postings == 0
    rng = np.random.default_rng(2)
    qi = np.stack([np.concatenate([
        rng.choice([3, 5, 7], size=1),
        rng.choice(np.arange(50, V), size=3, replace=False)])
        for _ in range(8)]).astype(np.int32)
    qv = (np.abs(rng.normal(size=(8, 4))) + 0.1).astype(np.float32)
    got = tiered.search_topk(qi, qv, k=5)
    for b in range(8):
        want = exact.search_vector(qi[b], qv[b], k=5)
        assert [d for d, _ in got[b]] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got[b], want):
            assert gs == pytest.approx(ws, rel=0.05, abs=0.05)


def test_tiered_recovers_hot_regime_where_uniform_fails():
    """THE design claim: equal cold depth, hot-term queries — uniform
    recall collapses, tiered recovers it."""
    corpus = hot_corpus(n=400)
    p_cold = 8
    exact, tiered = build_pair(corpus, p_cold=p_cold, hot_terms=8,
                               p_hot=512, rescore_candidates=64,
                               approx=False, scoring="sort")
    uniform = TpuPostingsIndex(V, n_postings=p_cold, query_top_t=8,
                               rescore_candidates=64, approx=False,
                               scoring="sort")
    for i, (idx, val) in enumerate(corpus):
        uniform.add(f"d{i}", idx, val)
    uniform.build()
    rng = np.random.default_rng(3)
    # hot-term-only queries: the regime that kills uniform truncation
    qi = np.stack([rng.choice([3, 5, 7], size=2, replace=False)
                   for _ in range(16)]).astype(np.int32)
    qv = (np.abs(rng.normal(size=(16, 2))) + 0.5).astype(np.float32)
    k = 10

    def recall(index):
        got = index.search_topk(qi, qv, k=k)
        hits = 0
        for b in range(len(qi)):
            want = {d for d, _ in exact.search_vector(qi[b], qv[b], k=k)}
            hits += len(want & {d for d, _ in got[b]})
        return hits / (len(qi) * k)

    r_uniform, r_tiered = recall(uniform), recall(tiered)
    assert r_tiered == pytest.approx(1.0, abs=1e-6)
    # uniform keeps 8 of ~260 postings/term; it only finds docs whose
    # single strongest impact ranks top-8, which partially correlates
    # with the summed score on 2-term queries — measured ~0.62 here
    assert r_uniform < 0.8


def test_scoring_modes_agree():
    corpus = hot_corpus(n=200)
    rng = np.random.default_rng(4)
    qi = np.stack([np.concatenate([
        rng.choice([3, 5, 7], size=1),
        rng.choice(np.arange(50, V), size=3, replace=False)])
        for _ in range(8)]).astype(np.int32)
    qv = (np.abs(rng.normal(size=(8, 4))) + 0.1).astype(np.float32)
    results = {}
    for scoring in ("sort", "select", "scatter"):
        _, tiered = build_pair(corpus, p_cold=8, hot_terms=8, p_hot=256,
                               rescore_candidates=200, approx=False,
                               scoring=scoring)
        results[scoring] = tiered.search_topk(qi, qv, k=5)
    for b in range(8):
        ids_sort = [d for d, _ in results["sort"][b]]
        assert ids_sort == [d for d, _ in results["select"][b]]
        assert ids_sort == [d for d, _ in results["scatter"][b]]


def test_save_load_roundtrip(tmp_path):
    corpus = hot_corpus(n=100)
    _, tiered = build_pair(corpus, p_cold=8, hot_terms=8, p_hot=256,
                           rescore_candidates=32, approx=False,
                           scoring="sort")
    path = str(tmp_path / "tiered.npz")
    tiered.save(path)
    loaded = TieredPostingsIndex.load(path)
    assert loaded.hot_terms == 8 and loaded.hot_postings == 256
    assert loaded.n_hot == tiered.n_hot
    qi, qv = (np.array([[3, 60, 70, 80]], np.int32),
              np.array([[1.0, 0.2, 0.2, 0.2]], np.float32))
    assert (tiered.search_topk(qi, qv, k=5)
            == loaded.search_topk(qi, qv, k=5))
    # wrong-class load fails with a clear message
    with pytest.raises(ValueError, match="tiered"):
        TpuPostingsIndex.load(path)


def test_no_hot_terms_degenerates_to_uniform():
    corpus = hot_corpus(n=100)
    _, tiered = build_pair(corpus, p_cold=512, hot_terms=8, p_hot=64,
                           approx=False, scoring="sort")
    assert tiered.n_hot == 0  # nothing overflows a 512 cap at n=100
    uniform = TpuPostingsIndex(V, n_postings=512, query_top_t=8,
                               approx=False, scoring="sort")
    for i, (idx, val) in enumerate(corpus):
        uniform.add(f"d{i}", idx, val)
    uniform.build()
    qi, qv = (np.array([[3, 60, 70, 80]], np.int32),
              np.array([[1.0, 0.2, 0.2, 0.2]], np.float32))
    assert (tiered.search_topk(qi, qv, k=5)
            == uniform.search_topk(qi, qv, k=5))


def test_mesh_tiered_matches_single_on_virtual_mesh():
    """8-shard mesh tiered index vs the single-device tiered index on
    the hot corpus: per-shard hot selection + lossless combined depth ->
    both match the exact oracle's ranking (two-phase final scores are
    exact up to int8)."""
    from splade_tpu.ops.tiered_postings import (
        MeshShardedTieredPostingsIndex)
    from splade_tpu.parallel.mesh import make_mesh

    corpus = hot_corpus(n=330)  # ragged: 330 = 8*41 + 2 (tail shard)
    mesh = make_mesh()
    assert mesh.devices.size == 8
    single = TieredPostingsIndex(V, n_postings=8, hot_terms=64,
                                 hot_postings=512, query_top_t=8,
                                 rescore_candidates=64, approx=False,
                                 scoring="sort")
    sharded = MeshShardedTieredPostingsIndex(
        V, mesh, n_postings=8, hot_terms=64, hot_postings=512,
        query_top_t=8, rescore_candidates=64, approx=False,
        scoring="sort")
    exact = ExactSparseIndex(vocab_size=V)
    for i, (idx, val) in enumerate(corpus):
        single.add(f"d{i}", idx, val)
        sharded.add(f"d{i}", idx, val)
        exact.add(f"d{i}", idx, val)
    single.build()
    sharded.build()
    # per-shard truncation can only be <= the single index's
    assert sharded.truncated_postings <= single.truncated_postings
    rng = np.random.default_rng(5)
    qi = np.stack([np.concatenate([
        rng.choice([3, 5, 7], size=1),
        rng.choice(np.arange(50, V), size=3, replace=False)])
        for _ in range(8)]).astype(np.int32)
    qv = (np.abs(rng.normal(size=(8, 4))) + 0.1).astype(np.float32)
    got_s = single.search_topk(qi, qv, k=5)
    got_m = sharded.search_topk(qi, qv, k=5)
    for b, (s_res, m_res) in enumerate(zip(got_s, got_m)):
        ref = dict(exact.search_vector(qi[b], qv[b], k=len(corpus)))
        assert s_res[0][0] == m_res[0][0]
        for doc, score in m_res:
            assert score == pytest.approx(ref[doc], rel=0.05, abs=0.02)
        assert len({d for d, _ in s_res} & {d for d, _ in m_res}) >= 4


def test_delta_adds_after_build():
    corpus = hot_corpus(n=100)
    _, tiered = build_pair(corpus, p_cold=8, hot_terms=8, p_hot=256,
                           rescore_candidates=32, approx=False,
                           scoring="sort")
    tiered.add("new_doc", np.array([3, 5], np.int32),
               np.array([50.0, 50.0], np.float32))
    qi, qv = (np.array([[3, 5]], np.int32),
              np.array([[1.0, 1.0]], np.float32))
    got = tiered.search_topk(qi, qv, k=3)[0]
    assert got[0][0] == "new_doc"

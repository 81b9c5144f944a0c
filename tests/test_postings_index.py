"""Postings index tests: exactness when lossless, measured recall when
truncated, quantization bounds, API parity with the exact oracle.

Reference methodology: the SEISMIC experiments
(scripts/neural_sparse_search_aws.py) measure an ANN postings structure
against exact search while sweeping the posting-list cap.
"""

import numpy as np
import pytest

from splade_tpu.benchmark.index import ExactSparseIndex
from splade_tpu.ops.postings_index import TpuPostingsIndex

V = 500


def synth_corpus(n=300, nnz=12, seed=0):
    rng = np.random.default_rng(seed)
    vecs = []
    for _ in range(n):
        idx = rng.choice(V, size=nnz, replace=False).astype(np.int32)
        val = (np.abs(rng.normal(size=nnz)) + 0.05).astype(np.float32)
        vecs.append((idx, val))
    return vecs


def synth_queries(b=16, t=6, seed=1):
    rng = np.random.default_rng(seed)
    qi = np.stack([rng.choice(V, size=t, replace=False) for _ in range(b)])
    qv = np.abs(rng.normal(size=(b, t))).astype(np.float32) + 0.05
    return qi.astype(np.int32), qv


@pytest.fixture(scope="module")
def corpus():
    return synth_corpus()


def build_both(corpus, n_postings, approx=False):
    exact = ExactSparseIndex(vocab_size=V)
    post = TpuPostingsIndex(V, n_postings=n_postings, query_top_t=8,
                            approx=approx)
    for i, (idx, val) in enumerate(corpus):
        exact.add(f"d{i}", idx, val)
        post.add(f"d{i}", idx, val)
    post.build()
    return exact, post


def test_lossless_cap_matches_exact(corpus):
    """n_postings >= max df -> same ranking as the exact oracle (scores
    within int8 quantization tolerance)."""
    exact, post = build_both(corpus, n_postings=512)
    assert post.truncated_postings == 0
    qi, qv = synth_queries()
    got = post.search_topk(qi, qv, k=5)
    for b in range(len(qi)):
        want = exact.search_vector(qi[b], qv[b], k=5)
        want_scores = dict(want)
        # every returned doc's score is correct within quantization error
        for doc, score in got[b]:
            ref = exact.search_vector(qi[b], qv[b], k=len(exact.doc_ids))
            ref_score = dict(ref).get(doc, 0.0)
            assert score == pytest.approx(ref_score, rel=0.05, abs=0.02)
        # top-1 agrees unless quantization flipped a near-tie
        if len(want) >= 2 and want[0][1] > want[1][1] * 1.05:
            assert got[b][0][0] == want[0][0]


def test_truncation_measured_recall(corpus):
    """A tight cap drops tail postings; recall@10 vs exact stays high because
    lists are impact-ordered (the dropped tail has the smallest weights)."""
    exact, post = build_both(corpus, n_postings=4)
    assert post.truncated_postings > 0
    qi, qv = synth_queries(b=32)
    got = post.search_topk(qi, qv, k=10)
    hits = total = 0
    for b in range(len(qi)):
        want = {d for d, _ in exact.search_vector(qi[b], qv[b], k=10)}
        have = {d for d, _ in got[b]}
        hits += len(want & have)
        total += len(want)
    assert hits / total > 0.5, f"recall {hits/total:.2f}"


def test_single_vector_and_padding_api(corpus):
    _, post = build_both(corpus, n_postings=512)
    idx, val = corpus[7]
    res = post.search_vector(idx, val, k=3)
    assert res[0][0] == "d7"  # a doc matches itself best
    # query wider than query_top_t gets truncated to the strongest terms
    wide_i = np.arange(20, dtype=np.int32)[None]
    wide_v = np.linspace(1, 0.01, 20, dtype=np.float32)[None]
    out = post.search_topk(wide_i, wide_v, k=3)
    assert len(out) == 1


def test_memory_is_o_postings_not_o_nv(corpus):
    _, post = build_both(corpus, n_postings=16)
    dense_bytes = len(corpus) * V  # int8 dense matrix
    assert post.memory_bytes() < 6 * dense_bytes  # small V favors dense;
    # the win shows at scale: bytes are independent of corpus size N
    assert post.memory_bytes() == V * 16 * (4 + 1) + V * 4


def test_approx_topk_mode(corpus):
    exact, post = build_both(corpus, n_postings=512, approx=True)
    qi, qv = synth_queries(b=8)
    got = post.search_topk(qi, qv, k=5)
    hits = total = 0
    for b in range(8):
        want = {d for d, _ in exact.search_vector(qi[b], qv[b], k=5)}
        have = {d for d, _ in got[b]}
        hits += len(want & have)
        total += len(want)
    assert hits / total >= 0.8  # approx_max_k default recall target ~0.95


def test_empty_index_raises():
    with pytest.raises(ValueError):
        TpuPostingsIndex(V).build()


def test_mesh_sharded_postings_matches_single(corpus):
    """8-shard mesh index returns the same docs/scores as the single-device
    index when the cap is lossless (per-shard caps can only keep MORE)."""
    import jax
    from splade_tpu.parallel.mesh import make_mesh
    from splade_tpu.ops.postings_index import MeshShardedPostingsIndex

    mesh = make_mesh()
    assert mesh.devices.size == 8
    single = TpuPostingsIndex(V, n_postings=512, query_top_t=8, approx=False)
    sharded = MeshShardedPostingsIndex(V, mesh, n_postings=512,
                                       query_top_t=8, approx=False)
    for i, (idx, val) in enumerate(corpus):
        single.add(f"d{i}", idx, val)
        sharded.add(f"d{i}", idx, val)
    single.build()
    sharded.build()
    assert sharded.truncated_postings == 0

    qi, qv = synth_queries(b=16)
    got_s = single.search_topk(qi, qv, k=5)
    got_m = sharded.search_topk(qi, qv, k=5)
    exact = ExactSparseIndex(vocab_size=V)
    for i, (idx, val) in enumerate(corpus):
        exact.add(f"d{i}", idx, val)
    for b, (s_res, m_res) in enumerate(zip(got_s, got_m)):
        # per-shard int8 scales differ from the single-index scales, so
        # near-ties may swap ranks — check scores against the f32 oracle
        # instead of exact rank equality
        ref = dict(exact.search_vector(qi[b], qv[b], k=len(corpus)))
        assert s_res[0][0] == m_res[0][0]  # top-1 agrees
        for doc, score in m_res:
            assert score == pytest.approx(ref[doc], rel=0.05, abs=0.02)
        # the two top-5 sets differ at most by one near-tie swap
        assert len({d for d, _ in s_res} & {d for d, _ in m_res}) >= 4


def test_mesh_sharded_ragged_tail_shard(corpus):
    """Doc count not divisible by the shard count: the tail shard is short
    and padded doc slots never surface in results."""
    from splade_tpu.parallel.mesh import make_mesh
    from splade_tpu.ops.postings_index import MeshShardedPostingsIndex

    mesh = make_mesh()
    sharded = MeshShardedPostingsIndex(V, mesh, n_postings=512,
                                       query_top_t=8, approx=False)
    for i, (idx, val) in enumerate(corpus[:43]):  # 43 % 8 != 0
        sharded.add(f"d{i}", idx, val)
    sharded.build()
    qi, qv = synth_queries(b=8)
    for res in sharded.search_topk(qi, qv, k=10):
        for doc, score in res:
            assert doc in {f"d{i}" for i in range(43)}
            assert score > 0


def test_two_phase_rescore_exact_when_candidates_cover(corpus):
    """rescore_candidates >= N: phase 2 is an exact re-score of every doc,
    so results equal the f32 oracle within per-DOC int8 tolerance even with
    an aggressively truncated phase-1 cap."""
    exact = ExactSparseIndex(vocab_size=V)
    post = TpuPostingsIndex(V, n_postings=4, query_top_t=8, approx=False,
                            rescore_candidates=10_000)
    for i, (idx, val) in enumerate(corpus):
        exact.add(f"d{i}", idx, val)
        post.add(f"d{i}", idx, val)
    post.build()
    assert post.truncated_postings > 0  # phase 1 alone would be lossy
    qi, qv = synth_queries(b=16)
    got = post.search_topk(qi, qv, k=5)
    for b in range(len(qi)):
        ref = dict(exact.search_vector(qi[b], qv[b], k=len(corpus)))
        want = exact.search_vector(qi[b], qv[b], k=5)
        # top-1 agrees unless per-doc int8 flipped a near-tie
        if len(want) >= 2 and want[0][1] > want[1][1] * 1.05:
            assert got[b][0][0] == want[0][0]
        for doc, score in got[b]:
            assert score == pytest.approx(ref[doc], rel=0.05, abs=0.02)


def test_two_phase_beats_single_phase_recall(corpus):
    """Same tight cap: two-phase (cap-4 candidates + exact rescore) recalls
    at least as much as single-phase cap-4 scoring."""
    exact, single = build_both(corpus, n_postings=4)
    two = TpuPostingsIndex(V, n_postings=4, query_top_t=8, approx=False,
                           rescore_candidates=64)
    for i, (idx, val) in enumerate(corpus):
        two.add(f"d{i}", idx, val)
    two.build()
    qi, qv = synth_queries(b=32)
    hits1 = hits2 = total = 0
    for b in range(len(qi)):
        want = {d for d, _ in exact.search_vector(qi[b], qv[b], k=10)}
        got1 = {d for d, _ in single.search_topk(qi[b][None], qv[b][None], k=10)[0]}
        got2 = {d for d, _ in two.search_topk(qi[b][None], qv[b][None], k=10)[0]}
        hits1 += len(want & got1)
        hits2 += len(want & got2)
        total += len(want)
    assert hits2 >= hits1, (hits2, hits1)
    assert hits2 / total > 0.8, f"two-phase recall {hits2/total:.2f}"


def test_sort_scoring_matches_scatter(corpus):
    """scoring='sort' (sort + segmented-sum aggregation, corpus-size-
    independent) must rank exactly like scoring='scatter' on the same
    postings and agree on scores to f32-association tolerance."""
    kw = dict(n_postings=16, query_top_t=8, approx=False)
    scat = TpuPostingsIndex(V, scoring="scatter", **kw)
    sort = TpuPostingsIndex(V, scoring="sort", **kw)
    for i, (idx, val) in enumerate(corpus):
        scat.add(f"d{i}", idx, val)
        sort.add(f"d{i}", idx, val)
    scat.build()
    sort.build()
    assert scat.resolved_scoring() == "scatter"
    assert sort.resolved_scoring() == "sort"
    qi, qv = synth_queries(b=32)
    got_a = scat.search_topk(qi, qv, k=5)
    got_b = sort.search_topk(qi, qv, k=5)
    for a, b in zip(got_a, got_b):
        # scatter accumulates bf16 contributions; sort sums in f32, so
        # near-ties in the ranking tail may swap — top-1 must agree and
        # shared docs must score within bf16 tolerance
        assert a[0][0] == b[0][0]
        sa, sb = dict(a), dict(b)
        common = set(sa) & set(sb)
        assert len(common) >= 4
        for d in common:
            assert sa[d] == pytest.approx(sb[d], rel=2e-2, abs=1e-2)


def test_sort_scoring_two_phase_matches_scatter(corpus):
    """Two-phase with sort-mode phase 1: same exact final scores as
    scatter-mode phase 1 when candidates cover the pool."""
    kw = dict(n_postings=4, query_top_t=8, approx=False,
              rescore_candidates=48)
    scat = TpuPostingsIndex(V, scoring="scatter", **kw)
    sort = TpuPostingsIndex(V, scoring="sort", **kw)
    for i, (idx, val) in enumerate(corpus):
        scat.add(f"d{i}", idx, val)
        sort.add(f"d{i}", idx, val)
    scat.build()
    sort.build()
    qi, qv = synth_queries(b=16)
    got_a = scat.search_topk(qi, qv, k=5)
    got_b = sort.search_topk(qi, qv, k=5)
    for a, b in zip(got_a, got_b):
        # phase 2 re-scores BOTH candidate sets exactly, so shared docs
        # carry identical scores; candidate sets may differ in near-tie
        # tails (bf16 scatter vs f32 sort phase-1 scores)
        sa, sb = dict(a), dict(b)
        common = set(sa) & set(sb)
        assert len(common) >= 4
        for d in common:
            assert sa[d] == pytest.approx(sb[d], rel=1e-5, abs=1e-6)


def test_auto_scoring_resolution():
    idx = TpuPostingsIndex(V, n_postings=64, query_top_t=33)
    assert idx.resolved_scoring() == "sort"  # 33*64 = 2112 <= 4096
    idx2 = TpuPostingsIndex(V, n_postings=2048, query_top_t=32)
    assert idx2.resolved_scoring() == "scatter"  # 32*2048 >> 4096
    with pytest.raises(ValueError):
        TpuPostingsIndex(V, scoring="bogus")


def test_select_scoring_requires_two_phase():
    """select-mode phase-1 scores are single-posting contributions, never
    valid as final scores — single-phase construction must refuse."""
    with pytest.raises(ValueError, match="rescore"):
        TpuPostingsIndex(V, scoring="select")
    TpuPostingsIndex(V, scoring="select", rescore_candidates=8)  # ok


def test_select_scoring_two_phase_matches_sort(corpus):
    """When the candidate pool covers the full gathered union (C >= T*P),
    select-mode two-phase returns the SAME exact-scored results as
    sort-mode two-phase: both rescore every distinct gathered doc."""
    kw = dict(n_postings=16, query_top_t=8, approx=False,
              rescore_candidates=128)  # C == E = 8*16: full union coverage
    sort = TpuPostingsIndex(V, scoring="sort", **kw)
    sel = TpuPostingsIndex(V, scoring="select", **kw)
    for i, (idx, val) in enumerate(corpus):
        sort.add(f"d{i}", idx, val)
        sel.add(f"d{i}", idx, val)
    sort.build()
    sel.build()
    qi, qv = synth_queries(b=16)
    got_a = sort.search_topk(qi, qv, k=5)
    got_b = sel.search_topk(qi, qv, k=5)
    for a, b in zip(got_a, got_b):
        assert {d for d, _ in a} == {d for d, _ in b}
        sa, sb = dict(a), dict(b)
        for d in sa:
            assert sa[d] == pytest.approx(sb[d], rel=1e-6, abs=1e-7)


def test_select_scoring_no_duplicates_and_exact_scores(corpus):
    """Tight candidate pool: entries of a doc hit by several query terms
    enter the top-C' multiple times — dedup must keep results duplicate-
    free, and scores must be IDENTICAL to sort-mode two-phase (the same
    phase-2 rescore), within int8-quantization noise of the f32 oracle."""
    exact = ExactSparseIndex(vocab_size=V)
    kw = dict(n_postings=16, query_top_t=8, approx=False,
              rescore_candidates=32)
    sel = TpuPostingsIndex(V, scoring="select", **kw)
    sort = TpuPostingsIndex(V, scoring="sort", **kw)
    for i, (idx, val) in enumerate(corpus):
        exact.add(f"d{i}", idx, val)
        sel.add(f"d{i}", idx, val)
        sort.add(f"d{i}", idx, val)
    sel.build()
    sort.build()
    qi, qv = synth_queries(b=32)
    got = sel.search_topk(qi, qv, k=20)
    got_sort = sort.search_topk(qi, qv, k=20)
    for b in range(len(qi)):
        docs = [d for d, _ in got[b]]
        assert len(docs) == len(set(docs)), f"duplicate results: {docs}"
        ref = dict(exact.search_vector(qi[b], qv[b], k=len(corpus)))
        srt = dict(got_sort[b])
        for d, s in got[b]:
            # the rescore path is shared: common docs score bit-equal
            if d in srt:
                assert s == srt[d]
            # vs the f32 oracle only int8 doc-major quantization differs;
            # k=20 reaches tail scores (~0.25) where the per-term quant
            # step (max|w|/127 ~ 0.02) accumulates — loose bound only
            assert s == pytest.approx(ref[d], rel=0.05, abs=0.05)


def test_select_candidates_unit():
    """_select_topk_candidates contract: dup/filler slots -> (-inf, 0);
    survivors carry their single-posting contribution."""
    import jax.numpy as jnp

    from splade_tpu.ops.postings_index import _select_topk_candidates

    # one query, 2 terms x 3 postings; doc 7 appears under both terms
    rows_d = jnp.asarray([[[7, 3, 5], [7, 9, 0]]], jnp.int32)
    contrib = jnp.asarray([[[4.0, 3.0, 1.0], [2.0, 1.5, 0.0]]])
    vals, ids = _select_topk_candidates(rows_d, contrib, k=6, approx=False)
    vals, ids = np.asarray(vals[0]), np.asarray(ids[0])
    kept = {int(i): float(v) for i, v in zip(ids, vals) if v != -np.inf}
    # doc 7 deduped (one slot survives), zero-contrib entry (doc 0) dropped
    assert set(kept) == {7, 3, 5, 9}
    assert kept[3] == pytest.approx(3.0)
    assert kept[9] == pytest.approx(1.5)
    # exactly 2 dropped slots: the dup of doc 7 and the zero entry
    assert int((vals == -np.inf).sum()) == 2
    assert all(int(i) == 0 for i, v in zip(ids, vals) if v == -np.inf)


def test_select_sum_unit():
    """_select_sum_topk contract: docs ranked by PARTIAL sums over the
    selected entry pool; fillers -> (-inf, 0); zero/pad entries never
    form candidates."""
    import jax.numpy as jnp

    from splade_tpu.ops.postings_index import _select_sum_topk

    # doc 7 has two mid postings (2.0 + 2.0 = 4.0) that individually lose
    # to doc 3's single 3.0 — per-entry 'select' at k=1 would pick doc 3;
    # select_sum's pooled partial sums rank doc 7 first
    rows_d = jnp.asarray([[[7, 3, 5], [7, 9, 0]]], jnp.int32)
    contrib = jnp.asarray([[[2.0, 3.0, 1.0], [2.0, 1.5, 0.0]]])
    vals, ids = _select_sum_topk(rows_d, contrib, k=2, approx=False,
                                 pool_mult=3)  # pool covers all 5 real
    vals, ids = np.asarray(vals[0]), np.asarray(ids[0])
    assert ids[0] == 7 and vals[0] == pytest.approx(4.0)
    assert ids[1] == 3 and vals[1] == pytest.approx(3.0)
    # tiny pool (k=1, mult=1): only the single strongest entry survives
    vals1, ids1 = _select_sum_topk(rows_d, contrib, k=1, approx=False,
                                   pool_mult=1)
    assert int(np.asarray(ids1[0])[0]) == 3


def test_select_sum_two_phase_matches_sort_when_pool_covers(corpus):
    """With the entry pool covering E, select_sum's candidate set equals
    sort's, so two-phase results match exactly."""
    results = {}
    for scoring in ("sort", "select_sum"):
        post = TpuPostingsIndex(V, n_postings=64, query_top_t=8,
                                rescore_candidates=300, approx=False,
                                scoring=scoring)
        for i, (idx, val) in enumerate(corpus):
            post.add(f"d{i}", idx, val)
        post.build()
        qi, qv = synth_queries()
        results[scoring] = post.search_topk(qi, qv, k=10)
    assert results["sort"] == results["select_sum"]


def test_select_sum_dominates_select_at_equal_budget():
    """A corpus where summed mid-rank evidence decides the ranking:
    select_sum recovers docs that per-entry select misses."""
    rng = np.random.default_rng(7)
    n, t = 400, 4
    corpus = []
    for i in range(n):
        idx = np.array([0, 1, 2, 3], np.int32)
        if i < 4:        # "spread" docs: moderate on all 4 terms
            val = np.full(t, 2.0, np.float32)
        elif i < 44:     # 40 "spike" docs: one entry above the spreads
            val = (rng.random(t) * 0.3).astype(np.float32)
            val[i % t] = 2.5
        else:            # background noise
            val = (rng.random(t) * 0.3).astype(np.float32)
        corpus.append((idx, val))
    qi = np.tile(np.arange(t, dtype=np.int32), (8, 1))
    qv = np.ones((8, t), np.float32)
    exact = ExactSparseIndex(vocab_size=V)
    for i, (idx, val) in enumerate(corpus):
        exact.add(f"d{i}", idx, val)

    def recall(scoring, C=16):
        post = TpuPostingsIndex(V, n_postings=n, query_top_t=8,
                                rescore_candidates=C, approx=False,
                                scoring=scoring)
        for i, (idx, val) in enumerate(corpus):
            post.add(f"d{i}", idx, val)
        post.build()
        got = post.search_topk(qi, qv, k=4)
        hits = 0
        for b in range(len(qi)):
            want = {d for d, _ in exact.search_vector(qi[b], qv[b], k=4)}
            hits += len(want & {d for d, _ in got[b]})
        return hits / (len(qi) * 4)

    # exact top-4 = the spread docs (sum 8.0 vs spike ~3.4); per-entry
    # select at C=16 fills its pool with spikes (2.5 > 2.0 per entry)
    r_select, r_select_sum = recall("select"), recall("select_sum")
    assert r_select_sum == pytest.approx(1.0)
    assert r_select < r_select_sum


def test_mesh_sharded_sort_scoring(corpus):
    """Sort-mode aggregation inside each mesh shard: same results as the
    single-device sort index (lossless cap)."""
    from splade_tpu.parallel.mesh import make_mesh
    from splade_tpu.ops.postings_index import MeshShardedPostingsIndex

    mesh = make_mesh()
    single = TpuPostingsIndex(V, n_postings=512, query_top_t=8,
                              approx=False, scoring="sort")
    sharded = MeshShardedPostingsIndex(V, mesh, n_postings=512,
                                       query_top_t=8, approx=False)
    sharded.scoring = "sort"
    for i, (idx, val) in enumerate(corpus):
        single.add(f"d{i}", idx, val)
        sharded.add(f"d{i}", idx, val)
    single.build()
    sharded.build()
    qi, qv = synth_queries(b=16)
    got_s = single.search_topk(qi, qv, k=5)
    got_m = sharded.search_topk(qi, qv, k=5)
    for s_res, m_res in zip(got_s, got_m):
        assert s_res[0][0] == m_res[0][0]
        assert len({d for d, _ in s_res} & {d for d, _ in m_res}) >= 4


def test_mesh_sharded_two_phase_exact_when_candidates_cover(corpus):
    """Mesh two-phase: every shard rescores its candidates exactly, so with
    per-shard candidate coverage the merged results match the f32 oracle
    within per-doc int8 tolerance."""
    from splade_tpu.parallel.mesh import make_mesh
    from splade_tpu.ops.postings_index import MeshShardedPostingsIndex

    mesh = make_mesh()
    post = MeshShardedPostingsIndex(V, mesh, n_postings=4, query_top_t=8,
                                    approx=False, rescore_candidates=10_000)
    exact = ExactSparseIndex(vocab_size=V)
    for i, (idx, val) in enumerate(corpus):
        exact.add(f"d{i}", idx, val)
        post.add(f"d{i}", idx, val)
    post.build()
    assert post.truncated_postings > 0  # phase 1 alone would be lossy
    assert post._doc_major is not None
    qi, qv = synth_queries(b=16)
    got = post.search_topk(qi, qv, k=5)
    for b in range(len(qi)):
        ref = dict(exact.search_vector(qi[b], qv[b], k=len(corpus)))
        want = exact.search_vector(qi[b], qv[b], k=5)
        if len(want) >= 2 and want[0][1] > want[1][1] * 1.05:
            assert got[b][0][0] == want[0][0]
        for doc, score in got[b]:
            assert score == pytest.approx(ref[doc], rel=0.05, abs=0.02)


def test_mesh_sharded_two_phase_ragged_tail(corpus):
    """Two-phase with a short tail shard: padded doc-major rows never
    surface (their scores are 0 and ids are filtered by the n_docs mask)."""
    from splade_tpu.parallel.mesh import make_mesh
    from splade_tpu.ops.postings_index import MeshShardedPostingsIndex

    mesh = make_mesh()
    post = MeshShardedPostingsIndex(V, mesh, n_postings=8, query_top_t=8,
                                    approx=False, rescore_candidates=16)
    for i, (idx, val) in enumerate(corpus[:43]):  # 43 % 8 != 0
        post.add(f"d{i}", idx, val)
    post.build()
    qi, qv = synth_queries(b=8)
    for res in post.search_topk(qi, qv, k=10):
        for doc, score in res:
            assert doc in {f"d{i}" for i in range(43)}
            assert score > 0


def test_sort_two_phase_no_filler_duplicates():
    """Sort-mode phase-1 filler slots (beyond the distinct gathered pool)
    must NOT be rescored: each would come back as a duplicate of doc 0
    carrying doc 0's genuine score."""
    post = TpuPostingsIndex(V, n_postings=8, query_top_t=4, approx=False,
                            rescore_candidates=32, scoring="sort")
    rng = np.random.default_rng(3)
    for i in range(10):
        idx = rng.choice(V, size=6, replace=False).astype(np.int32)
        post.add(f"d{i}", idx, np.abs(rng.normal(size=6)).astype(np.float32) + 0.5)
    # make doc 0 score HIGH on the probe terms so filler duplicates of it
    # would beat real hits if the bug existed
    probe = np.array([7, 11, 13], np.int32)
    post._doc_idx[0] = np.concatenate([post._doc_idx[0], probe])
    post._doc_val[0] = np.concatenate(
        [post._doc_val[0], np.full(3, 5.0, np.float32)])
    post.nnz += 3
    post.build()
    res = post.search_vector(probe, np.ones(3, np.float32), k=10)
    docs = [d for d, _ in res]
    assert len(docs) == len(set(docs)), f"duplicate docs: {docs}"
    assert all(s > 0 for _, s in res)


def test_mesh_max_results_exceeds_per_shard_rescore(corpus):
    """k > rescore_candidates on a mesh index: the merged pool holds
    D * min(rescore, per) exact scores, so more than `rescore` results
    must come back (the single-device invariant would truncate)."""
    from splade_tpu.parallel.mesh import make_mesh
    from splade_tpu.ops.postings_index import MeshShardedPostingsIndex

    mesh = make_mesh()
    post = MeshShardedPostingsIndex(V, mesh, n_postings=64, query_top_t=8,
                                    approx=False, rescore_candidates=5)
    for i, (idx, val) in enumerate(corpus):
        post.add(f"d{i}", idx, val)
    post.build()
    assert post.max_results() == 40  # 8 shards x 5
    qi, qv = synth_queries(b=4, t=6)
    res = post.search_topk(qi, qv, k=30)
    assert max(len(r) for r in res) > 5  # not clamped to rescore=5


def test_delta_adds_merge_exactly(corpus):
    """Docs added after build() are served from the exactly-scored delta
    segment: results match an index built with everything from scratch."""
    base, extra = corpus[:250], corpus[250:]
    inc = TpuPostingsIndex(V, n_postings=512, query_top_t=8, approx=False)
    full = TpuPostingsIndex(V, n_postings=512, query_top_t=8, approx=False)
    for i, (idx, val) in enumerate(base):
        inc.add(f"d{i}", idx, val)
    inc.build()
    for i, (idx, val) in enumerate(extra, start=250):
        inc.add(f"d{i}", idx, val)  # post-build -> delta
    for i, (idx, val) in enumerate(corpus):
        full.add(f"d{i}", idx, val)
    full.build()
    assert inc.delta_count == 50 and inc._base_n == 250
    qi, qv = synth_queries(b=16)
    got_i = inc.search_topk(qi, qv, k=5)
    got_f = full.search_topk(qi, qv, k=5)
    for a, b in zip(got_i, got_f):
        assert a[0][0] == b[0][0]
        # delta scores are exact f32, base/full are int8-quantized: allow
        # near-tie swaps but require set agreement
        assert len({d for d, _ in a} & {d for d, _ in b}) >= 4
    # a delta doc is itself retrievable
    idx7, val7 = corpus[270]
    assert inc.search_vector(idx7, val7, k=1)[0][0] == "d270"
    # compaction folds the delta in and clears it
    inc.compact()
    assert inc.delta_count == 0 and inc._base_n == 300


def test_delta_with_two_phase(corpus):
    inc = TpuPostingsIndex(V, n_postings=4, query_top_t=8, approx=False,
                           rescore_candidates=64)
    for i, (idx, val) in enumerate(corpus[:280]):
        inc.add(f"d{i}", idx, val)
    inc.build()
    for i, (idx, val) in enumerate(corpus[280:], start=280):
        inc.add(f"d{i}", idx, val)
    idx9, val9 = corpus[290]
    res = inc.search_vector(idx9, val9, k=3)
    assert res[0][0] == "d290"


def test_save_load_roundtrip(tmp_path, corpus):
    """Persisted index restores to identical search results (the serving
    restart path: skip corpus re-encoding)."""
    orig = TpuPostingsIndex(V, n_postings=16, query_top_t=8, approx=False,
                            rescore_candidates=32)
    for i, (idx, val) in enumerate(corpus[:100]):
        orig.add(f"d{i}", idx, val)
    orig.build()
    # mutations fold into the saved state
    orig.add("extra", *corpus[100])
    orig.delete(["d3"])
    path = str(tmp_path / "index.npz")
    orig.save(path)
    assert orig.deleted_count == 0  # save() compacts

    back = TpuPostingsIndex.load(path, approx=False)
    assert len(back) == 100  # 100 - d3 + extra
    assert back.rescore_candidates == 32 and back.n_postings == 16
    assert "d3" not in back.doc_ids and "extra" in back.doc_ids
    qi, qv = synth_queries(b=8)
    for a, b in zip(orig.search_topk(qi, qv, k=5),
                    back.search_topk(qi, qv, k=5)):
        assert a == b
    # overrides win over saved config
    back2 = TpuPostingsIndex.load(path, rescore_candidates=0)
    assert back2.rescore_candidates == 0


def test_sniff_kind_owns_the_archive_contract(tmp_path):
    """sniff_kind is the single owner of archive-kind dispatch (load() and
    the server both call it): the `kind` field wins, pre-kind archives fall
    back to the config width, unknown widths are explicit '?'."""
    import numpy as np

    saved = TpuPostingsIndex(V, n_postings=4, query_top_t=8)
    saved.add("d0", np.array([1, 2], np.int32),
              np.array([1.0, 2.0], np.float32))
    saved.build()
    p = str(tmp_path / "k.npz")
    saved.save(p)
    with np.load(p, allow_pickle=False) as z:
        assert TpuPostingsIndex.sniff_kind(z) == "postings"
    for width, want in ((4, "postings"), (6, "cluster"),
                        (7, "cluster"), (5, "?")):
        legacy = str(tmp_path / f"legacy{width}.npz")
        np.savez(legacy, config=np.zeros(width, np.int64))
        with np.load(legacy, allow_pickle=False) as z:
            assert TpuPostingsIndex.sniff_kind(z) == want, width


def test_mesh_delta_crud_on_virtual_mesh():
    """Mesh-sharded index CRUD without rebuild (VERDICT r2 #7): post-build
    adds serve from the shard-agnostic host delta, deletes tombstone, and
    compact() re-shards everything — all on the 8-virtual-device mesh."""
    import jax

    from splade_tpu.ops.postings_index import MeshShardedPostingsIndex
    from splade_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    V = 256
    index = MeshShardedPostingsIndex(V, make_mesh(), n_postings=32,
                                     query_top_t=8, approx=False,
                                     rescore_candidates=16)
    for i in range(48):
        idx = rng.choice(V, size=6, replace=False).astype(np.int32)
        index.add(f"d{i}", idx, rng.uniform(0.5, 2.0, 6).astype(np.float32))
    index.build()
    built = index._built
    # post-build add: delta-served, device arrays untouched
    index.add("late", np.array([9, 10], np.int32),
              np.array([50.0, 50.0], np.float32))
    assert index.delta_count == 1 and index._built is built
    res = index.search_vector(np.array([9, 10], np.int32),
                              np.array([1.0, 1.0], np.float32), k=3)
    assert res[0][0] == "late" and abs(res[0][1] - 100.0) < 1.0
    # delete a base doc: tombstoned, still no rebuild
    victim = res[1][0] if len(res) > 1 else "d0"
    assert index.delete([victim]) == 1
    res = index.search_vector(np.array([9, 10], np.int32),
                              np.array([1.0, 1.0], np.float32), k=10)
    assert victim not in [d for d, _ in res]
    assert index._built is built
    # compact: folds delta + drops tombstones via a re-sharded build
    index.compact()
    assert index.delta_count == 0 and index.deleted_count == 0
    assert len(index) == 48  # 48 + 1 late - 1 deleted
    res = index.search_vector(np.array([9, 10], np.int32),
                              np.array([1.0, 1.0], np.float32), k=3)
    assert res[0][0] == "late"

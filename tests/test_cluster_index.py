"""Cluster-summary index (VERDICT r2 #2): recall on hot-term-concentrated
vectors, upper-bound property, exactness, CRUD, persistence."""

import numpy as np
import pytest

from splade_tpu.ops.cluster_index import (
    TpuClusterIndex,
    assign_clusters,
    build_cluster_arrays,
)
from splade_tpu.ops.postings_index import TpuPostingsIndex

VOCAB = 512


def hot_concentrated_corpus(n_docs=3000, nnz=16, n_hot=6, seed=0):
    """Synthetic SPLADE-like vectors: most of each doc's mass sits on a
    tiny shared hot-term pool (what kills truncated postings at 1M docs),
    plus a random discriminative tail."""
    rng = np.random.default_rng(seed)
    idx = np.empty((n_docs, nnz), np.int32)
    val = np.empty((n_docs, nnz), np.float32)
    for i in range(n_docs):
        hot = rng.choice(n_hot, size=4, replace=False)
        tail = rng.choice(VOCAB - n_hot, size=nnz - 4, replace=False) + n_hot
        idx[i] = np.concatenate([hot, tail])
        val[i] = np.concatenate([rng.uniform(2.0, 6.0, 4),
                                 rng.uniform(0.1, 1.5, nnz - 4)]).astype(
                                     np.float32)
    return idx, val


def exact_topk(d_idx, d_val, q_idx, q_val, k):
    n = len(d_idx)
    dense = np.zeros((n, VOCAB), np.float32)
    rows = np.repeat(np.arange(n), d_idx.shape[1])
    dense[rows, d_idx.reshape(-1)] = d_val.reshape(-1)
    out = []
    for qi, qv in zip(q_idx, q_val):
        q = np.zeros(VOCAB, np.float32)
        q[qi] = qv
        s = dense @ q
        top = np.argsort(-s)[:k]
        out.append((top, s))
    return out


def queries(n=32, t=8, n_hot=6, seed=1, d_idx=None, d_val=None):
    """Doc-anchored queries (how retrieval actually works): each query
    reuses a target document's strongest activations — 2 of its hot terms
    and t-2 of its discriminative tail terms — so the exact top-k is the
    target plus docs sharing those tail terms. Falls back to independent
    random queries when no corpus is given."""
    rng = np.random.default_rng(seed)
    qi = np.empty((n, t), np.int32)
    qv = np.empty((n, t), np.float32)
    for i in range(n):
        if d_idx is not None:
            target = rng.integers(len(d_idx))
            ti, tv = d_idx[target], d_val[target]
            hot_m = ti < n_hot
            hot = rng.permutation(ti[hot_m])[:2]
            tail = rng.permutation(ti[~hot_m])[:t - 2]
        else:
            hot = rng.choice(n_hot, size=2, replace=False)
            tail = rng.choice(VOCAB - n_hot, size=t - 2, replace=False) + n_hot
        qi[i] = np.concatenate([hot, tail])
        qv[i] = np.concatenate([rng.uniform(1.0, 3.0, 2),
                                rng.uniform(0.5, 1.5, t - 2)]).astype(
                                    np.float32)
    return qi, qv


class TestClustering:
    def test_every_doc_in_exactly_one_cluster_capped(self):
        d_idx, d_val = hot_concentrated_corpus(n_docs=500)
        cluster_of, K = assign_clusters(list(d_idx), list(d_val),
                                        cluster_size=16)
        assert cluster_of.shape == (500,)
        assert cluster_of.min() >= 0 and cluster_of.max() == K - 1
        counts = np.bincount(cluster_of, minlength=K)
        assert counts.max() <= 16 and counts.min() >= 1

    def test_uniform_and_ragged_paths_agree(self):
        d_idx, d_val = hot_concentrated_corpus(n_docs=200)
        a, ka = assign_clusters(list(d_idx), list(d_val), cluster_size=8)
        # force the ragged path with an equivalent ragged list
        ragged_i = [r.copy() for r in d_idx]
        ragged_i[0] = np.concatenate([ragged_i[0], [VOCAB - 1]])
        ragged_v = [r.copy() for r in d_val]
        ragged_v[0] = np.concatenate([ragged_v[0], [0.01]])
        b, kb = assign_clusters(ragged_i, ragged_v, cluster_size=8)
        # doc 0's extra near-zero term must not change its dominant pair
        assert ka == kb
        np.testing.assert_array_equal(a, b)

    def test_summary_upper_bounds_members(self):
        d_idx, d_val = hot_concentrated_corpus(n_docs=400)
        cluster_of, K = assign_clusters(list(d_idx), list(d_val), 16)
        summary, cluster_docs = build_cluster_arrays(
            list(d_idx), list(d_val), cluster_of, K, 16, VOCAB, pad_doc=400)
        # membership: every doc appears exactly once
        members = cluster_docs[cluster_docs < 400]
        assert sorted(members.tolist()) == list(range(400))
        # upper bound: summary dot q >= member dot q, for random queries
        qi, qv = queries(n=8)
        for b in range(8):
            q = np.zeros(VOCAB, np.float32)
            q[qi[b]] = qv[b]
            s_sum = summary.T @ q  # [K]
            for d in range(400):
                ds = float(np.dot(q[d_idx[d]], d_val[d]))
                assert s_sum[cluster_of[d]] >= ds - 1e-4


class TestClusterSearch:
    def test_recall_and_exact_scores(self):
        d_idx, d_val = hot_concentrated_corpus()
        index = TpuClusterIndex(VOCAB, cluster_size=16, n_probes=48,
                                query_top_t=8)
        index.add_csr([f"d{i}" for i in range(len(d_idx))], d_idx, d_val)
        index.build()
        assert index.truncated_postings == 0
        qi, qv = queries(d_idx=d_idx, d_val=d_val)
        got = index.search_topk(qi, qv, k=10)
        exact = exact_topk(d_idx, d_val, qi, qv, 10)
        recalls = []
        for b, (top, s) in enumerate(exact):
            have = {d for d, _ in got[b]}
            recalls.append(len(have & {f"d{t}" for t in top}) / 10)
            # returned scores are EXACT (phase 2 rescores from the CSR)
            for doc, score in got[b]:
                assert abs(score - s[int(doc[1:])]) < 0.02 * abs(score) + 1e-2
        assert np.mean(recalls) >= 0.95, np.mean(recalls)

    def test_beats_truncated_postings_on_hot_terms(self):
        """The motivating failure: short-cap postings lose hot-term mass;
        the cluster summary cannot (it never truncates)."""
        d_idx, d_val = hot_concentrated_corpus()
        qi, qv = queries(d_idx=d_idx, d_val=d_val)
        exact = exact_topk(d_idx, d_val, qi, qv, 10)

        def recall(index):
            got = index.search_topk(qi, qv, k=10)
            r = []
            for b, (top, _) in enumerate(exact):
                have = {d for d, _ in got[b]}
                r.append(len(have & {f"d{t}" for t in top}) / 10)
            return float(np.mean(r))

        ids = [f"d{i}" for i in range(len(d_idx))]
        post = TpuPostingsIndex(VOCAB, n_postings=8, query_top_t=8,
                                rescore_candidates=100)
        post.add_csr(ids, d_idx, d_val)
        post.build()
        clus = TpuClusterIndex(VOCAB, cluster_size=16, n_probes=48,
                               query_top_t=8)
        clus.add_csr(ids, d_idx, d_val)
        clus.build()
        r_post, r_clus = recall(post), recall(clus)
        assert r_clus >= 0.95
        assert r_clus > r_post + 0.1, (r_clus, r_post)

    def test_posting_scoring_sort_scatter_agree(self):
        """The union's postings side has two aggregation modes (sort for
        shallow caps, scatter for deep ones — 'auto' picks by the T*P
        crossover); both are exact, so results must be identical."""
        d_idx, d_val = hot_concentrated_corpus(n_docs=400)
        qi, qv = queries(n=5, d_idx=d_idx, d_val=d_val)
        ids = [f"d{i}" for i in range(len(d_idx))]
        res = {}
        for mode in ("sort", "scatter"):
            ix = TpuClusterIndex(VOCAB, cluster_size=16, n_probes=4,
                                 query_top_t=8, posting_cap=8,
                                 posting_candidates=32,
                                 posting_scoring=mode)
            ix.add_csr(ids, d_idx, d_val)
            ix.build()
            res[mode] = ix.search_topk(qi, qv, k=10)
        for a, b in zip(res["sort"], res["scatter"]):
            assert [d for d, _ in a] == [d for d, _ in b]
            np.testing.assert_allclose([v for _, v in a],
                                       [v for _, v in b], rtol=1e-5)
        # auto resolves by the crossover
        assert TpuClusterIndex(VOCAB, query_top_t=8,
                               posting_cap=8).posting_scoring == "sort"
        assert TpuClusterIndex(VOCAB, query_top_t=33,
                               posting_cap=512).posting_scoring == "scatter"

    def test_set_probes_reuses_build(self):
        """Probe sweeps swap only the jitted search: recall at L after
        set_probes(L) equals a fresh build at L (clustering is
        probe-independent)."""
        d_idx, d_val = hot_concentrated_corpus(n_docs=600)
        qi, qv = queries(n=8, d_idx=d_idx, d_val=d_val)
        ids = [f"d{i}" for i in range(len(d_idx))]
        ix = TpuClusterIndex(VOCAB, cluster_size=16, n_probes=2,
                             query_top_t=8)
        ix.add_csr(ids, d_idx, d_val)
        ix.build()
        ix.set_probes(24)
        assert ix.rescore_candidates == 24 * 16 + 128
        fresh = TpuClusterIndex(VOCAB, cluster_size=16, n_probes=24,
                                query_top_t=8)
        fresh.add_csr(ids, d_idx, d_val)
        fresh.build()
        got_a = ix.search_topk(qi, qv, k=10)
        got_b = fresh.search_topk(qi, qv, k=10)
        for a, b in zip(got_a, got_b):
            assert [d for d, _ in a] == [d for d, _ in b]

    def test_padded_cluster_slots_never_returned(self):
        # 10 docs in G=16 clusters: most slots are padding
        d_idx, d_val = hot_concentrated_corpus(n_docs=10)
        index = TpuClusterIndex(VOCAB, cluster_size=16, n_probes=4,
                                query_top_t=8)
        index.add_csr([f"d{i}" for i in range(10)], d_idx, d_val)
        index.build()
        qi, qv = queries(n=4)
        for res in index.search_topk(qi, qv, k=10):
            ids = [d for d, _ in res]
            assert len(ids) == len(set(ids))  # no duplicated pad ids
            assert all(d in {f"d{i}" for i in range(10)} for d in ids)


class TestClusterCrud:
    def _index(self, n=300):
        d_idx, d_val = hot_concentrated_corpus(n_docs=n)
        index = TpuClusterIndex(VOCAB, cluster_size=16, n_probes=16,
                                query_top_t=8)
        index.add_csr([f"d{i}" for i in range(n)], d_idx, d_val)
        index.build()
        return index, d_idx, d_val

    def test_delta_add_served_without_rebuild(self):
        index, d_idx, d_val = self._index()
        base_built = index._built
        strong = np.array([7, 8, 9, 10], np.int32)
        index.add("new", strong, np.full(4, 50.0, np.float32))
        assert index.delta_count == 1 and index._built is base_built
        res = index.search_vector(strong, np.ones(4, np.float32), k=3)
        assert res[0][0] == "new"

    def test_delete_and_update(self):
        index, d_idx, d_val = self._index()
        qi, qv = queries(n=1)
        before = index.search_topk(qi, qv, k=5)[0]
        victim = before[0][0]
        assert index.delete([victim]) == 1
        after = index.search_topk(qi, qv, k=5)[0]
        assert victim not in [d for d, _ in after]
        index.update(after[0][0], np.array([3], np.int32),
                     np.array([99.0], np.float32))
        res = index.search_vector(np.array([3], np.int32),
                                  np.array([1.0], np.float32), k=1)
        assert res[0][0] == after[0][0] and abs(res[0][1] - 99.0) < 1.0

    def test_compact_folds_delta_and_tombstones(self):
        index, _, _ = self._index(n=100)
        index.add("x1", np.array([5], np.int32), np.array([40.0], np.float32))
        index.delete(["d0", "d1"])
        index.compact()
        assert index.delta_count == 0 and index.deleted_count == 0
        assert len(index) == 99
        res = index.search_vector(np.array([5], np.int32),
                                  np.array([1.0], np.float32), k=1)
        assert res[0][0] == "x1"

    def test_save_load_roundtrips_posting_scoring(self, tmp_path):
        """An explicit phase-1b mode survives persistence: without the
        config field a reload re-resolves 'auto' and can silently serve
        the other kernel than the one the saved index was validated with."""
        d_idx, d_val = hot_concentrated_corpus(n_docs=100)
        ix = TpuClusterIndex(VOCAB, cluster_size=16, n_probes=4,
                             query_top_t=8, posting_cap=8,
                             posting_candidates=32,
                             posting_scoring="scatter")  # auto would pick sort
        ix.add_csr([f"d{i}" for i in range(len(d_idx))], d_idx, d_val)
        ix.build()
        p = str(tmp_path / "scatter.npz")
        ix.save(p)
        assert TpuClusterIndex.load(p).posting_scoring == "scatter"

    def test_save_load_roundtrip(self, tmp_path):
        index, d_idx, d_val = self._index(n=200)
        p = str(tmp_path / "cluster.npz")
        index.save(p)
        loaded = TpuClusterIndex.load(p)
        assert isinstance(loaded, TpuClusterIndex)
        assert loaded.cluster_size == 16 and loaded.n_probes == 16
        qi, qv = queries(n=4)
        a = index.search_topk(qi, qv, k=5)
        b = loaded.search_topk(qi, qv, k=5)
        for ra, rb in zip(a, b):
            assert [d for d, _ in ra] == [d for d, _ in rb]


class TestMeshClusterIndex:
    def _exact_ids(self, d_idx, d_val, qi, qv, k=10):
        return [set(top.tolist()) for top, _ in
                exact_topk(d_idx, d_val, qi, qv, k)]

    def test_mesh_matches_exact_and_single_device(self):
        from splade_tpu.ops.cluster_index import MeshShardedClusterIndex
        from splade_tpu.parallel.mesh import make_mesh

        d_idx, d_val = hot_concentrated_corpus(n_docs=1000)
        ids = [f"d{i}" for i in range(1000)]
        qi, qv = queries(n=16, d_idx=d_idx, d_val=d_val)
        mesh_ix = MeshShardedClusterIndex(
            VOCAB, make_mesh(), cluster_size=16, n_probes=16,
            query_top_t=8, posting_cap=16, posting_candidates=32)
        mesh_ix.add_csr(ids, d_idx, d_val)
        mesh_ix.build()
        got = mesh_ix.search_topk(qi, qv, k=10)
        exact = self._exact_ids(d_idx, d_val, qi, qv)
        recalls = [len({int(d[1:]) for d, _ in got[b]} & exact[b]) / 10
                   for b in range(16)]
        # per-shard probing covers MORE than a single-device index with the
        # same L (8 shards x 16 probes of ~8 clusters each = full coverage)
        assert np.mean(recalls) >= 0.95, np.mean(recalls)
        # returned scores are exact
        for b, (top, s) in enumerate(exact_topk(d_idx, d_val, qi, qv, 10)):
            for doc, score in got[b]:
                assert abs(score - s[int(doc[1:])]) < 0.02 * abs(score) + 1e-2

    def test_mesh_cluster_crud_delta(self):
        from splade_tpu.ops.cluster_index import MeshShardedClusterIndex
        from splade_tpu.parallel.mesh import make_mesh

        d_idx, d_val = hot_concentrated_corpus(n_docs=300)
        index = MeshShardedClusterIndex(
            VOCAB, make_mesh(), cluster_size=16, n_probes=8, query_top_t=8)
        index.add_csr([f"d{i}" for i in range(300)], d_idx, d_val)
        index.build()
        built = index._built
        index.add("late", np.array([5, 6], np.int32),
                  np.array([60.0, 60.0], np.float32))
        assert index.delta_count == 1 and index._built is built
        res = index.search_vector(np.array([5, 6], np.int32),
                                  np.array([1.0, 1.0], np.float32), k=3)
        assert res[0][0] == "late"
        assert index.delete(["d0"]) == 1
        index.compact()
        assert len(index) == 300 and index.delta_count == 0
        res = index.search_vector(np.array([5, 6], np.int32),
                                  np.array([1.0, 1.0], np.float32), k=3)
        assert res[0][0] == "late"

    def test_mesh_bisection_k_exceeds_ceil(self):
        # Regression: per=130 docs/shard at G=64 bisects into K=4 clusters
        # (2^ceil(log2(130/64))), NOT ceil(130/64)=3 — and the 124-doc
        # tail yields K=2. build() must pad every shard to the max actual
        # K; the old ceil-based precompute crashed np.stack.
        from splade_tpu.ops.cluster_index import MeshShardedClusterIndex
        from splade_tpu.parallel.mesh import make_mesh

        n = 1034
        d_idx, d_val = hot_concentrated_corpus(n_docs=n)
        index = MeshShardedClusterIndex(
            VOCAB, make_mesh(), cluster_size=64, n_probes=8, query_top_t=8)
        index.add_csr([f"d{i}" for i in range(n)], d_idx, d_val)
        index.build()  # old code: ValueError from np.stack shape mismatch
        assert index.n_clusters == 7 * 4 + 2  # actual Ks, not k_max * D
        qi, qv = queries(n=4, d_idx=d_idx, d_val=d_val)
        for res in index.search_topk(qi, qv, k=10):
            ids = [d for d, _ in res]
            assert len(ids) == len(set(ids))

    def test_mesh_summary_value_above_f16_max(self):
        # Regression: summaries were staged through float16, so an impact
        # > 65504 overflowed to inf and that cluster was ALWAYS probed.
        # bf16 staging keeps it finite (and equal to the device dtype).
        from splade_tpu.ops.cluster_index import MeshShardedClusterIndex
        from splade_tpu.parallel.mesh import make_mesh

        d_idx, d_val = hot_concentrated_corpus(n_docs=64)
        d_val = [v.copy() for v in d_val]
        d_val[3][0] = 70000.0  # above f16 max, fine in bf16
        index = MeshShardedClusterIndex(
            VOCAB, make_mesh(), cluster_size=8, n_probes=4, query_top_t=8)
        index.add_csr([f"d{i}" for i in range(64)], d_idx, d_val)
        index.build()
        assert np.isfinite(
            np.asarray(index._built[0], np.float32)).all()
        qi = np.array([[d_idx[3][0]]], np.int32)
        qv = np.array([[1.0]], np.float32)
        res = index.search_topk(qi, qv, k=3)[0]
        assert res[0][0] == "d3" and np.isfinite(res[0][1])

    def test_mesh_uneven_tail_shard(self):
        # 29 docs over 8 shards: shards of 4 docs with a 1-doc tail
        from splade_tpu.ops.cluster_index import MeshShardedClusterIndex
        from splade_tpu.parallel.mesh import make_mesh

        d_idx, d_val = hot_concentrated_corpus(n_docs=29)
        index = MeshShardedClusterIndex(
            VOCAB, make_mesh(), cluster_size=8, n_probes=4, query_top_t=8)
        index.add_csr([f"d{i}" for i in range(29)], d_idx, d_val)
        index.build()
        qi, qv = queries(n=4, d_idx=d_idx, d_val=d_val)
        for res in index.search_topk(qi, qv, k=29):
            ids = [d for d, _ in res]
            assert len(ids) == len(set(ids))
            assert all(d in {f"d{i}" for i in range(29)} for d in ids)

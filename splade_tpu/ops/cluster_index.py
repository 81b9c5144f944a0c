"""Cluster-summary sparse index: SEISMIC-style two-level search on TPU.

Why it exists: the truncated-postings index caps each term's list at P
entries. Real SPLADE vectors concentrate mass on shared hot terms (unlike
independent Zipf samples), so at 1M docs P-truncation drops 96-98% of
postings and phase-1 candidate recall collapses (0.666 at P=128/C=200 on
real encoder vectors — docs/POSTINGS_BENCH.json). Raising P restores
recall (0.95 at P=1024/C=1000) but pushes phase 1 into the scatter
regime, whose ~10^8 updates/s on TPU caps QPS well below the 5k/chip
target.

This index replaces truncated postings with the SEISMIC idea (reference
methodology: the exact-vs-ANN sweeps of
scripts/neural_sparse_search_aws.py:1314-1434): group documents into
small clusters and keep ONE summary vector per cluster — the elementwise
max over member vectors. Then

    summary_score(q, c) = sum_t q_t * max_{d in c} d_t
                        >= max_{d in c} score(q, d)

i.e. the summary score UPPER-BOUNDS every member's true score, with NO
term truncation anywhere, so hot-term mass cannot be lost. Mapped to TPU:

- **Phase 0 (cluster ranking)** is a dense [B, V] x [V, K] matmul on the
  MXU — the hardware's fastest primitive — followed by top-L. No gather,
  no scatter, no [B, N] accumulator; cost is independent of how skewed
  the term distribution is.
- **Phase 1 (exact rescore)** expands the top-L clusters' members
  ([B, L*G] candidate ids; each doc lives in exactly one cluster, so no
  dedup is needed) and re-scores them EXACTLY with the shared doc-major
  CSR kernel (``exact_rescore``) — final scores are exact, recall is
  bounded only by cluster coverage.

Clustering is balanced recursive bisection in random-projection space
(``assign_clusters``): each doc is projected onto r random directions
and segments are median-split along the per-level maximum-spread
dimension until every segment fits G docs — grouping docs that are
close in the actual dot-product scoring geometry, regime-agnostically
(term-keyed grouping was tried and rejected; see ``assign_clusters``).
O(N log N) host-side, no iterative k-means, balanced by construction.
Memory: the [V, K] bf16 summary is ~1.6 GB at 1M docs (G=64) —
fine single-chip; 10M-doc corpora shard docs over a mesh (per-shard
clusters), same as MeshShardedPostingsIndex.

CRUD (delta adds, tombstones, compaction), persistence, and the search
API are inherited from TpuPostingsIndex — only build and the phase-0/1
kernels differ.
"""

from __future__ import annotations

import logging
import time
from typing import Tuple

import numpy as np

from splade_tpu.ops.postings_index import (
    TpuPostingsIndex,
    exact_rescore,
    invert_to_postings,
    merge_sharded_topk,
    postings_score_topk,
    quantize_postings,
    sparse_query_dense,
)

logger = logging.getLogger(__name__)


def project_docs(doc_idx, doc_val, vocab_size: int, n_proj: int,
                 seed: int = 0) -> np.ndarray:
    """[N, r] random projection of the sparse doc vectors (host-side,
    chunked). Random directions preserve dot-product geometry in
    expectation, so nearby projections => similar scores for any query."""
    n = len(doc_idx)
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((vocab_size + 1, n_proj)).astype(np.float32)
    proj = np.empty((n, n_proj), np.float32)
    lens = {len(x) for x in doc_idx}
    if len(lens) == 1 and min(lens) >= 1:
        ti, tv = np.stack(doc_idx), np.stack(doc_val)
        step = max(1, (1 << 24) // (ti.shape[1] * n_proj))  # bound temp mem
        for s in range(0, n, step):
            e = min(s + step, n)
            proj[s:e] = np.einsum("dm,dmr->dr", tv[s:e], R[ti[s:e]],
                                  optimize=True)
    else:
        for i, (t_i, t_v) in enumerate(zip(doc_idx, doc_val)):
            proj[i] = t_v @ R[t_i] if len(t_i) else 0.0
    return proj


def assign_clusters(doc_idx, doc_val, cluster_size: int,
                    vocab_size: int | None = None, n_proj: int = 16,
                    seed: int = 0) -> Tuple[np.ndarray, int]:
    """Balanced recursive bisection in random-projection space (the ScaNN/
    KD-partition recipe adapted to sparse dot-product geometry).

    Term-keyed grouping (dominant term, idf-dominant term, ...) is
    regime-dependent: it collapses whenever ranking is driven by a signal
    the chosen key ignores (e.g. hot-term magnitudes vs discriminative
    tail overlap). Projecting each doc onto r random directions and
    recursively median-splitting along the per-level maximum-spread
    dimension groups docs that are close in the ACTUAL scoring geometry,
    is regime-agnostic, and is balanced by construction (segment sizes
    differ by <= 1, so cluster_docs is a tight [K, G] rectangle).

    Returns (cluster_of [N] int32, n_clusters).
    """
    n = len(doc_idx)
    G = cluster_size
    if vocab_size is None:
        vocab_size = int(max((int(x.max()) for x in doc_idx
                              if len(x)), default=0)) + 1
    proj = project_docs(doc_idx, doc_val, vocab_size, n_proj, seed)

    order = np.arange(n)
    seg = np.zeros(n, np.int64)  # segment id per position in `order`
    sizes = np.array([n], np.int64)
    while sizes.max() > G:
        # per-segment split dim = the projection with the largest spread
        # inside that segment (computed segment-wise via sorted extremes)
        starts = np.r_[0, np.cumsum(sizes)[:-1]]
        p = proj[order]
        hi = np.maximum.reduceat(p, starts, axis=0)
        lo = np.minimum.reduceat(p, starts, axis=0)
        dim = np.argmax(hi - lo, axis=1)           # [n_seg]
        key = p[np.arange(n), dim[seg]]
        ix = np.lexsort((key, seg))
        order, seg = order[ix], seg[ix]
        rank = np.arange(n) - starts[seg]
        half = (sizes[seg] + 1) // 2
        seg = seg * 2 + (rank >= half)
        # renumber segments densely and recompute sizes
        uniq, seg = np.unique(seg, return_inverse=True)
        sizes = np.bincount(seg)
        # keep `order` grouped by the new seg ids (stable)
        ix = np.argsort(seg, kind="stable")
        order, seg = order[ix], seg[ix]
    cluster_of = np.empty(n, np.int32)
    cluster_of[order] = seg.astype(np.int32)
    return cluster_of, int(sizes.size)


def build_cluster_arrays(doc_idx, doc_val, cluster_of: np.ndarray,
                         n_clusters: int, cluster_size: int, vocab_size: int,
                         pad_doc: int):
    """Summaries + membership, host-side and vectorized.

    Returns (summary [V, K] float32 — elementwise max over members,
    cluster_docs [K, G] int32 padded with ``pad_doc``).
    """
    n = len(doc_idx)
    V, K, G = vocab_size, n_clusters, cluster_size
    lens = np.fromiter(map(len, doc_idx), np.int64, count=n)
    all_terms = np.concatenate(doc_idx).astype(np.int64)
    all_vals = np.ascontiguousarray(np.concatenate(doc_val), np.float32)
    all_cluster = np.repeat(cluster_of.astype(np.int64), lens)
    # segment-max via sort (np.maximum.at is ~10x slower at 10^8 postings):
    # order postings by (term, cluster, value desc) and keep each
    # (term, cluster) run's first element. When the (term, cluster) id fits
    # 32 bits, pack it with the complemented f32 value bits (impacts are
    # non-negative, so float bits compare monotonically — same trick as
    # invert_to_postings) into ONE uint64 and argsort once: ~3x faster
    # than the two-pass lexsort at 10^8 postings, and exact.
    flat = all_terms * K + all_cluster
    # np.empty + sequential fill(0) touches the (multi-GB) buffer's pages
    # in order — the later scattered max-writes then hit mapped memory.
    # Lazily-mapped np.zeros pays the physical allocation through RANDOM-
    # order page faults instead: measured 55s vs ~4s at V*K=824M.
    summary = np.empty(V * K, np.float32)
    summary.fill(0)
    if V * K < (1 << 32):
        # the key IS the record: id in the high 32 bits, complemented f32
        # value bits in the low 32 — one in-place sort (50x faster than
        # lexsort at 10^8 postings), then recover the exact f32 maxima
        # straight from each run's first key
        key = flat.astype(np.uint64) << np.uint64(32)
        key |= (np.uint32(0xFFFFFFFF)
                - all_vals.view(np.uint32)).astype(np.uint64)
        key.sort()
        flat_s = (key >> np.uint64(32)).astype(np.int64)
        first = np.r_[True, flat_s[1:] != flat_s[:-1]]
        maxbits = (np.uint32(0xFFFFFFFF)
                   - (key[first] & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        summary[flat_s[first]] = maxbits.view(np.float32)
    else:
        order = np.lexsort((-all_vals, flat))
        flat_s = flat[order]
        first = np.r_[True, flat_s[1:] != flat_s[:-1]]
        summary[flat_s[first]] = all_vals[order][first]
    summary = summary.reshape(V, K)

    cluster_docs = np.full((K, G), pad_doc, np.int32)
    order = np.argsort(cluster_of, kind="stable")
    slot = np.arange(n) - np.searchsorted(cluster_of[order],
                                          cluster_of[order])
    cluster_docs[cluster_of[order], slot] = order
    return summary, cluster_docs


def cluster_search_topk(summary, cluster_docs, post, d_terms, d_vals,
                        d_scale, q_idx, q_val, k: int, vocab_size: int,
                        n_probes: int, n_docs: int, posting_candidates: int,
                        posting_scoring: str = "sort",
                        rescore: str = "auto", vmapped: bool = False):
    """Union-candidate two-level search.

    Phase 1a (clusters): dense [B, V] x [V, K] summary matmul on the MXU,
    EXACT top-L (K is tiny, N/G; approx_max_k recall would compound with
    cluster coverage), expand members -> [B, L*G] ids.
    Phase 1b (postings): short-cap impact-ordered postings, sort-mode
    aggregation (corpus-size-independent), top-C_p ids. ``post`` is
    (post_docs, post_w, p_scale) or None to disable.
    Phase 2: ONE exact rescore of the deduplicated union.

    The two candidate generators fail in complementary ways: truncation
    loses docs whose score is spread across mid-rank postings of many
    (hot) terms — exactly what cluster summaries bound without loss —
    while summaries blur per-term magnitudes within a cluster — exactly
    what the top-of-list postings preserve. Returns (scores, doc_ids),
    width min(k, pool).
    """
    import jax
    import jax.numpy as jnp

    B = q_idx.shape[0]
    qd = sparse_query_dense(q_idx, q_val, vocab_size)        # [B, V+1] f32
    s = jnp.dot(qd[:, :vocab_size].astype(jnp.bfloat16), summary,
                preferred_element_type=jnp.float32)          # [B, K]
    L = min(n_probes, s.shape[1])
    _, cl = jax.lax.top_k(s, L)
    cand = cluster_docs[cl].reshape(B, -1)                   # [B, L*G]
    if post is not None:
        # sort-mode fillers carry doc id 0: harmless — they just nominate
        # doc 0 as a candidate; rescore is exact and dedup keeps one copy
        _, cand_p = postings_score_topk(
            post[0], post[1], post[2], q_idx, q_val,
            min(posting_candidates, post[1].shape[1] * q_idx.shape[1]),
            n_docs, approx=False, scoring=posting_scoring)
        cand = jnp.concatenate([cand, cand_p], axis=1)
    from splade_tpu.ops.postings_index import dispatch_rescore

    scores = dispatch_rescore(d_terms, d_vals, d_scale, q_idx, q_val, cand,
                              vocab_size, mode=rescore, vmapped=vmapped,
                              qd=qd)
    # dedup the union: sort by id, kill neighbor duplicates (same doc ->
    # identical exact score, keep the first), then partial-sort
    ids_s, sc_s = jax.lax.sort((cand, scores), dimension=-1, num_keys=1)
    dup = jnp.concatenate(
        [jnp.zeros((B, 1), bool), ids_s[:, 1:] == ids_s[:, :-1]], axis=1)
    sc_s = jnp.where(dup, -jnp.inf, sc_s)
    vals, pos = jax.lax.top_k(sc_s, min(k, sc_s.shape[1]))
    out = jnp.take_along_axis(ids_s, pos, axis=1)
    # -inf slots are dup fillers: zero them so the caller's v>0 filter drops
    return jnp.where(vals > -jnp.inf, vals, 0.0), \
        jnp.where(vals > -jnp.inf, out, 0)


class TpuClusterIndex(TpuPostingsIndex):
    """Two-level cluster-summary index (see module docstring).

    API-compatible with TpuPostingsIndex: add/add_csr/build/search_topk/
    search_vector/delete/update/compact/save/load. ``n_postings`` and
    ``scoring`` do not apply; ``cluster_size`` (G) and ``n_probes`` (L)
    replace them. Effective candidate pool = L*G.
    """

    def __init__(self, vocab_size: int, cluster_size: int = 64,
                 n_probes: int = 32, query_top_t: int = 32,
                 batch_pad: int = 8, approx: bool = True,
                 posting_cap: int = 64, posting_candidates: int = 128,
                 posting_scoring: str = "auto"):
        """``posting_cap`` (P) / ``posting_candidates`` (C_p) size the
        union's postings side; posting_cap=0 disables it (clusters only).
        ``posting_scoring``: phase-1b aggregation — "sort" ([B, T*P]
        bitonic, corpus-size-independent, degrades past T*P ~ 4096),
        "scatter" ([B, N] dense accumulate, corpus-size-DEPENDENT but
        cap-independent: the choice for deep caps on single-chip corpora),
        or "auto" (sort iff query_top_t * posting_cap <= 4096 — the
        measured crossover, docs/POSTINGS_BENCH.json _sort_crossover_note)."""
        super().__init__(
            vocab_size, query_top_t=query_top_t, batch_pad=batch_pad,
            approx=approx,
            # the base class uses rescore_candidates for max_results and
            # the tombstone-overfetch compaction guard; our pool is the
            # union's width
            rescore_candidates=n_probes * cluster_size + (
                posting_candidates if posting_cap else 0))
        if posting_scoring == "auto":
            posting_scoring = ("sort" if query_top_t * posting_cap <= 4096
                               else "scatter")
        elif posting_scoring == "sort" and query_top_t * posting_cap > 4096:
            # [B, T*P] bitonic sort degrades sharply past E~4K (measured
            # crossover, docs/POSTINGS_BENCH.json _sort_crossover_note)
            logger.warning(
                "query_top_t (%d) x posting_cap (%d) = %d > 4096 with "
                "posting_scoring='sort': the postings side will dominate "
                "latency — use 'scatter' (or 'auto') for deep caps",
                query_top_t, posting_cap, query_top_t * posting_cap)
        self.posting_scoring = posting_scoring
        self.cluster_size = cluster_size
        self.n_probes = n_probes
        self.posting_cap = posting_cap
        self.posting_candidates = posting_candidates
        self.n_clusters = 0

    def build(self) -> None:
        import jax
        import jax.numpy as jnp

        n = len(self.doc_ids)
        if n == 0:
            raise ValueError("empty index")
        t0 = time.time()
        cluster_of, K = assign_clusters(self._doc_idx, self._doc_val,
                                        self.cluster_size, self.vocab_size)
        self.n_clusters = K
        summary, cluster_docs = build_cluster_arrays(
            self._doc_idx, self._doc_val, cluster_of, K, self.cluster_size,
            self.vocab_size, pad_doc=n)
        # doc-major CSR for the exact rescore, plus ONE pad row (doc id n:
        # all-pad terms, score exactly 0) so padded cluster slots rescore
        # to 0 and fall to the `v > 0` result filter
        terms, q, dscale = self._doc_major_arrays(
            self._doc_idx, self._doc_val, n)
        terms = np.concatenate(
            [terms, np.full((1, terms.shape[1]), self.vocab_size,
                            terms.dtype)])
        q = np.concatenate([q, np.zeros((1, q.shape[1]), np.int8)])
        dscale = np.concatenate([dscale, np.full((1,), 1e-6, np.float32)])
        built = [jax.device_put(summary.astype(jnp.bfloat16)),
                 jax.device_put(cluster_docs)]
        if self.posting_cap:
            pd, pw, _ = invert_to_postings(
                self._doc_idx, self._doc_val, self.vocab_size,
                self.posting_cap)
            pq, pscale = quantize_postings(pw)
            built += [jax.device_put(pd), jax.device_put(pq),
                      jax.device_put(pscale)]
        self._built = tuple(built)
        self._doc_major = (jax.device_put(terms), jax.device_put(q),
                           jax.device_put(dscale))
        self.truncated_postings = 0  # nothing is ever truncated
        self._base_n = n
        self._delta_cache = None
        self._make_search()
        logger.info(
            "cluster index: %d docs in %d clusters (G=%d, probes=%d), "
            "%.0f MB on device, built in %.1fs",
            n, K, self.cluster_size, self.n_probes,
            self.memory_bytes() / 1e6, time.time() - t0)

    def _make_search(self) -> None:
        import jax

        V = self.vocab_size
        L = self.n_probes
        C_p = self.posting_candidates
        n = len(self.doc_ids)
        with_post = bool(self.posting_cap)

        def search(summary, cluster_docs, *rest):
            *post_and_dm, q_idx, q_val, k = rest
            if with_post:
                post = tuple(post_and_dm[:3])
                d_terms, d_vals, d_scale = post_and_dm[3:6]
            else:
                post = None
                d_terms, d_vals, d_scale = post_and_dm[:3]
            return cluster_search_topk(summary, cluster_docs, post, d_terms,
                                       d_vals, d_scale, q_idx, q_val, k,
                                       V, L, n, C_p,
                                       posting_scoring=self.posting_scoring)

        n_arr = 2 + (3 if with_post else 0) + 3
        jitted = jax.jit(search, static_argnums=n_arr + 2)
        self._search_jit = lambda qi, qv, k: jitted(
            *self._built, *self._doc_major, qi, qv, k)

    def max_results(self) -> int:
        n = len(self.doc_ids)
        return min(n, self.rescore_candidates)

    def set_probes(self, n_probes: int) -> None:
        """Re-point the probe count without rebuilding: clustering,
        summaries, and postings are all probe-independent — only the
        jitted search closure bakes L (a static shape) in. Probe sweeps
        pay one build instead of one per operating point."""
        self.n_probes = n_probes
        self.rescore_candidates = n_probes * self.cluster_size + (
            self.posting_candidates if self.posting_cap else 0)
        if getattr(self, "_built", None) is not None:
            self._delta_cache = None
            self._make_search()

    # --------------------------------------------------------- persistence
    _SAVE_KIND = "cluster"

    def _config_array(self) -> np.ndarray:
        # field 7 persists the RESOLVED phase-1b mode (0=sort, 1=scatter):
        # without it a reload re-resolves "auto" and can silently serve the
        # other kernel than the one the saved index was validated with
        return np.asarray([self.vocab_size, self.cluster_size,
                           self.n_probes, self.query_top_t,
                           self.posting_cap, self.posting_candidates,
                           1 if self.posting_scoring == "scatter" else 0],
                          np.int64)

    @classmethod
    def _config_kwargs(cls, cfg: np.ndarray):
        vocab, G, L, top_t, P, C_p = (int(x) for x in cfg[:6])
        kw = dict(cluster_size=G, n_probes=L, query_top_t=top_t,
                  posting_cap=P, posting_candidates=C_p)
        if len(cfg) >= 7:  # archives from before the field fall back to auto
            kw["posting_scoring"] = "scatter" if int(cfg[6]) else "sort"
        return vocab, kw

    def config_summary(self) -> str:
        return (f"cluster_size={self.cluster_size} "
                f"n_probes={self.n_probes} query_top_t={self.query_top_t} "
                f"posting_cap={self.posting_cap} "
                f"posting_candidates={self.posting_candidates}")


class MeshShardedClusterIndex(TpuClusterIndex):
    """Doc-sharded cluster-summary index over a device mesh.

    Device d holds its contiguous doc shard's clusters, summary block, side
    postings, and doc-major CSR; a search runs phase 0 + union + exact
    rescore per shard under GSPMD (vmap over the shard axis) and merges the
    [D, B, k] exact partial top-ks — the only cross-device traffic. This is
    what takes the cluster index past single-chip HBM: at 10M docs the
    [V, K] bf16 summary is ~16 GB total, ~2 GB/shard on a v5e-8.

    Same LSM delta/tombstone semantics as the base (host-side, shard-
    agnostic); compact() re-shards. Probes are per shard, so the effective
    candidate pool is D x (L*G + C_p).
    """

    def __init__(self, vocab_size: int, mesh, cluster_size: int = 64,
                 n_probes: int = 32, query_top_t: int = 32,
                 batch_pad: int = 8, approx: bool = True,
                 posting_cap: int = 64, posting_candidates: int = 128):
        super().__init__(vocab_size, cluster_size=cluster_size,
                         n_probes=n_probes, query_top_t=query_top_t,
                         batch_pad=batch_pad, approx=approx,
                         posting_cap=posting_cap,
                         posting_candidates=posting_candidates)
        self.mesh = mesh
        self.n_shards = int(mesh.devices.size)

    def max_results(self) -> int:
        n = len(self.doc_ids)
        return min(n, self.n_shards * self.rescore_candidates)

    def build(self) -> None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = len(self.doc_ids)
        if n == 0:
            raise ValueError("empty index")
        D = self.n_shards
        per = -(-n // D)
        self._shard_size = per
        V, G = self.vocab_size, self.cluster_size
        M = max((len(x) for x in self._doc_idx), default=1)
        sums, cdocs, tstk, vstk, sstk = [], [], [], [], []
        posts = [[], [], []]
        shard_ks: list[int] = []
        import jax.numpy as _jnp

        # every shard's phase 0 runs under one vmap: pad K to the widest
        # shard (pad clusters are all-pad-doc with 0 summary: a 0-score
        # cluster may be probed but expands only pad docs). K comes from
        # assign_clusters' balanced bisection (2^ceil(log2(docs/G))), NOT
        # ceil(docs/G), so collect per-shard Ks first and pad afterwards.
        for d in range(D):
            lo, hi = d * per, min((d + 1) * per, n)
            di = self._doc_idx[lo:hi]
            dv = self._doc_val[lo:hi]
            if lo < hi:
                cluster_of, K = assign_clusters(di, dv, G, V)
                summary, cluster_docs = build_cluster_arrays(
                    di, dv, cluster_of, K, G, V, pad_doc=per)
            else:  # empty tail shard
                K = 1
                summary = np.zeros((V, 1), np.float32)
                cluster_docs = np.full((1, G), per, np.int32)
            shard_ks.append(K)
            # stage as bf16 (the device dtype) — NOT f16, whose 65504 max
            # would overflow to inf for large impact sums
            sums.append(summary.astype(_jnp.bfloat16))
            cdocs.append(cluster_docs)
            terms, q, dscale = self._doc_major_arrays(di, dv, hi - lo, M=M)
            if (hi - lo) < per:
                pad_n = per - (hi - lo)
                terms = np.concatenate(
                    [terms, np.full((pad_n, M), V, terms.dtype)])
                q = np.concatenate([q, np.zeros((pad_n, M), np.int8)])
                dscale = np.concatenate(
                    [dscale, np.full((pad_n,), 1e-6, np.float32)])
            # + the pad row (local id `per`) cluster pad slots point at
            terms = np.concatenate([terms, np.full((1, M), V, terms.dtype)])
            q = np.concatenate([q, np.zeros((1, M), np.int8)])
            dscale = np.concatenate([dscale, np.full((1,), 1e-6, np.float32)])
            tstk.append(terms)
            vstk.append(q)
            sstk.append(dscale)
            if self.posting_cap:
                pd, pw, _ = invert_to_postings(di or [np.zeros(0, np.int32)],
                                               dv or [np.zeros(0, np.float32)],
                                               V, self.posting_cap)
                pq, pscale = quantize_postings(pw)
                posts[0].append(pd)
                posts[1].append(pq)
                posts[2].append(pscale)
        import jax.numpy as jnp

        k_max = max(shard_ks)
        for d in range(D):
            K = shard_ks[d]
            if K < k_max:
                sums[d] = np.pad(sums[d], ((0, 0), (0, k_max - K)))
                cdocs[d] = np.pad(cdocs[d], ((0, k_max - K), (0, 0)),
                                  constant_values=per)

        axis = self.mesh.axis_names[0]
        sh3 = NamedSharding(self.mesh, P(axis, None, None))
        sh2 = NamedSharding(self.mesh, P(axis, None))

        def put(stage: list, sh):
            # stack -> put -> FREE the host copies immediately: at 10M docs
            # the staged summaries alone are ~26 GB, and holding them across
            # the remaining puts doubles peak host RSS for no benefit
            arr = np.stack(stage)
            stage.clear()
            out = jax.device_put(arr, sh)
            out.block_until_ready()
            return out

        built = [put(sums, sh3), put(cdocs, sh3)]
        if self.posting_cap:
            built += [put(posts[0], sh3), put(posts[1], sh3),
                      put(posts[2], sh2)]
        self._built = tuple(built)
        self._doc_major = (put(tstk, sh3), put(vstk, sh3), put(sstk, sh2))
        self.n_clusters = int(sum(shard_ks))
        self.truncated_postings = 0
        self._base_n = n
        self._delta_cache = None
        self._make_search()
        logger.info(
            "mesh cluster index: %d docs over %d shards (%d/shard, "
            "K<=%d each), %.0f MB total",
            n, D, per, k_max, self.memory_bytes() / 1e6)

    def search_body_and_shardings(self):
        """(search(*arrs, q_idx, q_val, k), arr NamedShardings) — the
        sharding/layout contract consumed by _make_search AND the serving
        engine's mesh-fused path (which prepends the query encode under
        the same jit)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        V = self.vocab_size
        L = self.n_probes
        C_p = self.posting_candidates
        D = self.n_shards
        per = self._shard_size
        n = len(self.doc_ids)
        with_post = bool(self.posting_cap)
        k_fetch = min(self.rescore_candidates, per + 1)

        def search(*args):
            *arrs, q_idx, q_val, k = args
            k_local = min(k, k_fetch)

            def shard_search(sl):
                if with_post:
                    summary, cluster_docs, p0, p1, p2, dt, dv, ds = sl
                    post = (p0, p1, p2)
                else:
                    summary, cluster_docs, dt, dv, ds = sl
                    post = None
                return cluster_search_topk(
                    summary, cluster_docs, post, dt, dv, ds, q_idx, q_val,
                    k_local, V, L, per, C_p,
                    posting_scoring=self.posting_scoring, vmapped=True)

            vals, idxs = jax.vmap(shard_search)(tuple(arrs))
            # one owner of the cross-shard merge contract (postings_index):
            # require_positive drops pad docs, whose global id collides
            # with the next shard's first real doc
            return merge_sharded_topk(vals, idxs, k, per, n,
                                      require_positive=True)

        axis = self.mesh.axis_names[0]
        sh3 = NamedSharding(self.mesh, P(axis, None, None))
        sh2 = NamedSharding(self.mesh, P(axis, None))
        arr_sh = (sh3, sh3) + ((sh3, sh3, sh2) if with_post else ()) + (
            sh3, sh3, sh2)
        return search, arr_sh

    def _make_search(self) -> None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        search, arr_sh = self.search_body_and_shardings()
        rep = NamedSharding(self.mesh, P())
        n_arr = len(arr_sh)
        jitted = jax.jit(search, static_argnums=n_arr + 2,
                         in_shardings=arr_sh + (rep, rep),
                         out_shardings=(rep, rep))
        self._search_jit = lambda qi, qv, k: jitted(
            *self._built, *self._doc_major, qi, qv, k)

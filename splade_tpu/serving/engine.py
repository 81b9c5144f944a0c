"""Fused encode→search engine.

The reference's query path is: GPU encode → host nonzero scan → JSON
rank_feature clauses → OpenSearch HTTPS round-trip (reference:
benchmark/searchers.py:130-186). Here the whole path is ONE jitted device
call: ModernBERT encode → banned-token zeroing → query top-k truncation →
impact-matrix matmul → top-k docs. Only token ids go up and [B, k]
(doc-index, score) pairs come back, so per-request latency is one dispatch.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _bucket_batch(n: int, pad: int) -> int:
    """Power-of-two bucketing above ``pad``: each distinct padded shape costs
    a fused-jit compile (~12 s on the remote backend), so the shape set must
    stay small — {pad, 2·pad, 4·pad, ...}."""
    b = pad
    while b < n:
        b *= 2
    return b


def make_fused_search_fn(model, banned, query_top_k: int, is_int8: bool):
    """Pure fused encode→search fn (un-jitted) shared by ServingEngine and
    the end-to-end latency bench: (params, mat, scale, ids, mask, n_valid, k)
    -> (scores [B,k], doc_indices [B,k])."""
    import jax
    import jax.numpy as jnp

    def fused_search(p, mat, scale, ids, mask, n_valid, k):
        repr_, _ = model.apply({"params": p}, ids, mask)   # [B, V]
        repr_ = repr_.astype(jnp.float32)
        if banned is not None:
            repr_ = jnp.where(banned[None, :], 0.0, repr_)
        if query_top_k:
            # keep the query_top_k strongest activations per query (static
            # shape: threshold-zeroing instead of gather)
            thr = jax.lax.top_k(repr_, query_top_k)[0][:, -1:]
            repr_ = jnp.where(repr_ >= jnp.maximum(thr, 1e-9), repr_, 0.0)
        if is_int8:
            scores = jax.lax.dot_general(
                repr_.astype(jnp.bfloat16), mat.astype(jnp.bfloat16).T,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale[None, :]
        else:
            scores = jax.lax.dot_general(
                repr_.astype(mat.dtype), mat.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        idx = jnp.arange(scores.shape[1])
        scores = jnp.where(idx[None, :] < n_valid, scores, -jnp.inf)
        return jax.lax.top_k(scores, k)

    return fused_search


def _make_encode_query(model, banned, top_t: int):
    """Shared query-encode closure for every fused serving path: ModernBERT
    forward, banned-token zeroing, top-T truncation -> ([B,T] vals, ids)."""
    import jax
    import jax.numpy as jnp

    def encode_query(p, ids, mask):
        repr_, _ = model.apply({"params": p}, ids, mask)    # [B, V]
        repr_ = repr_.astype(jnp.float32)
        if banned is not None:
            repr_ = jnp.where(banned[None, :], 0.0, repr_)
        return jax.lax.top_k(repr_, top_t)                   # [B, T] x2

    return encode_query


def make_fused_postings_search_fn(model, banned, top_t: int, n_docs: int,
                                  approx: bool = True, vocab_size: int = 0,
                                  n_candidates: int = 0, acc_dtype=None,
                                  scoring: str = "scatter"):
    """Fused encode→postings-search for TpuPostingsIndex-backed serving:
    one dispatch at million-doc scale.

    Single-phase (n_candidates=0):
      (params, post_docs, post_w, term_scale, ids, mask, k)
    Two-phase (n_candidates>0; 3.7x at 10^6 docs, exact final scores):
      (params, post_docs, post_w, term_scale, d_terms, d_vals, d_scale,
       ids, mask, k)
    both -> (scores [B,k], doc_indices [B,k])."""
    from splade_tpu.ops.postings_index import (postings_score_topk,
                                               postings_two_phase_topk)

    encode_query = _make_encode_query(model, banned, top_t)

    if n_candidates:
        def fused2(p, post_docs, post_w, term_scale, d_terms, d_vals,
                   d_scale, ids, mask, k):
            q_val, q_idx = encode_query(p, ids, mask)
            vals, idxs = postings_two_phase_topk(
                post_docs, post_w, term_scale, d_terms, d_vals, d_scale,
                q_idx, q_val, k, n_docs, vocab_size, n_candidates, approx,
                phase1_dtype=acc_dtype, scoring=scoring)
            # query vectors ride along so the LSM-delta merge can score the
            # delta segment without a second full encode
            return vals, idxs, q_val, q_idx

        return fused2

    def fused(p, post_docs, post_w, term_scale, ids, mask, k):
        q_val, q_idx = encode_query(p, ids, mask)
        vals, idxs = postings_score_topk(post_docs, post_w, term_scale,
                                         q_idx, q_val, k, n_docs, approx,
                                         acc_dtype=acc_dtype,
                                         scoring=scoring)
        return vals, idxs, q_val, q_idx

    return fused


def make_fused_mesh_tiered_jit(model, banned, index):
    """Fused encode→search over a MeshShardedTieredPostingsIndex:
    replicated query encode, per-shard tiered phase-1 (+ exact local
    rescore), one [D, B, k] merge — the mesh-postings contract with the
    7-array tiered structure."""
    import jax

    from splade_tpu.ops.tiered_postings import make_mesh_tiered_search_fns

    per = index._shard_size
    C = min(index.rescore_candidates, per) if index.rescore_candidates else 0
    search, search_two_phase = make_mesh_tiered_search_fns(
        n_shards=index.n_shards, shard_size=per, n_docs=len(index),
        vocab_size=index.vocab_size, n_candidates=C, approx=index.approx,
        acc_dtype=index._acc_dtype(), scoring=index.resolved_scoring())
    encode_query = _make_encode_query(model, banned, index.query_top_t)
    arrs, rep = index.jit_shardings(two_phase=bool(C))

    if C:
        def fused2(p, cd, cw, cs, hs, hd, hw, hsc, dt, dv, dsc,
                   ids, mask, k):
            q_val, q_idx = encode_query(p, ids, mask)
            return search_two_phase(cd, cw, cs, hs, hd, hw, hsc, dt, dv,
                                    dsc, q_idx, q_val, k)

        return jax.jit(fused2, static_argnums=(13,),
                       in_shardings=(rep,) + arrs + (rep, rep),
                       out_shardings=(rep, rep))

    def fused(p, cd, cw, cs, hs, hd, hw, hsc, ids, mask, k):
        q_val, q_idx = encode_query(p, ids, mask)
        return search(cd, cw, cs, hs, hd, hw, hsc, q_idx, q_val, k)

    return jax.jit(fused, static_argnums=(10,),
                   in_shardings=(rep,) + arrs + (rep, rep),
                   out_shardings=(rep, rep))


def make_fused_tiered_search_fn(model, banned, top_t: int, n_docs: int,
                                approx: bool, vocab_size: int,
                                n_candidates: int, acc_dtype,
                                scoring: str):
    """Fused encode→search for TieredPostingsIndex-backed serving: same
    one-dispatch contract as the uniform-postings fn, with the 7-array
    tiered phase-1 structure (cold tier + hot-slot remap + hot tier).

    Single-phase: (params, cd, cw, cs, hs, hd, hw, hsc, ids, mask, k)
    Two-phase (+d_terms, d_vals, d_scale before ids)."""
    from splade_tpu.ops.tiered_postings import (tiered_score_topk,
                                                tiered_two_phase_topk)

    encode_query = _make_encode_query(model, banned, top_t)

    if n_candidates:
        def fused2(p, cd, cw, cs, hs, hd, hw, hsc, d_terms, d_vals,
                   d_scale, ids, mask, k):
            q_val, q_idx = encode_query(p, ids, mask)
            vals, idxs = tiered_two_phase_topk(
                cd, cw, cs, hs, hd, hw, hsc, d_terms, d_vals, d_scale,
                q_idx, q_val, k, n_docs, vocab_size, n_candidates,
                approx, phase1_dtype=acc_dtype, scoring=scoring)
            return vals, idxs, q_val, q_idx

        return fused2

    def fused(p, cd, cw, cs, hs, hd, hw, hsc, ids, mask, k):
        q_val, q_idx = encode_query(p, ids, mask)
        vals, idxs = tiered_score_topk(
            cd, cw, cs, hs, hd, hw, hsc, q_idx, q_val, k, n_docs,
            approx, acc_dtype=acc_dtype, scoring=scoring)
        return vals, idxs, q_val, q_idx

    return fused


def make_fused_cluster_search_fn(model, banned, top_t: int, n_docs: int,
                                 vocab_size: int, n_probes: int,
                                 posting_candidates: int, with_post: bool,
                                 posting_scoring: str = "sort"):
    """Fused encode→cluster-union-search for TpuClusterIndex-backed
    serving: (params, summary, cluster_docs, [post_docs, post_w, p_scale,]
    d_terms, d_vals, d_scale, ids, mask, k) -> (vals, idxs, q_val, q_idx).
    Final scores are exact (phase 2 rescores from the doc-major CSR)."""
    from splade_tpu.ops.cluster_index import cluster_search_topk

    encode_query = _make_encode_query(model, banned, top_t)

    def fused(p, summary, cluster_docs, *rest):
        *mid, ids, mask, k = rest
        if with_post:
            post = tuple(mid[:3])
            d_terms, d_vals, d_scale = mid[3:6]
        else:
            post = None
            d_terms, d_vals, d_scale = mid[:3]
        q_val, q_idx = encode_query(p, ids, mask)
        vals, idxs = cluster_search_topk(
            summary, cluster_docs, post, d_terms, d_vals, d_scale,
            q_idx, q_val, k, vocab_size, n_probes, n_docs,
            posting_candidates, posting_scoring=posting_scoring)
        return vals, idxs, q_val, q_idx

    return fused


def make_fused_mesh_cluster_jit(model, banned, index):
    """Fused encode→cluster-union-search over a MeshShardedClusterIndex:
    replicated query encode, per-shard phase0+union+exact rescore, one
    [D, B, k] merge. Arg order matches the other fused fns
    ((params, *arrs, ids, mask, k) -> (vals, idxs)); shardings baked in."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    search, arr_sh = index.search_body_and_shardings()
    encode_query = _make_encode_query(model, banned, index.query_top_t)
    rep = NamedSharding(index.mesh, P())
    n_arr = len(arr_sh)

    def fused(p, *rest):
        *arrs, ids, mask, k = rest
        q_val, q_idx = encode_query(p, ids, mask)
        return search(*arrs, q_idx, q_val, k)

    return jax.jit(fused, static_argnums=n_arr + 3,
                   in_shardings=(rep,) + arr_sh + (rep, rep),
                   out_shardings=(rep, rep))


def make_fused_mesh_postings_jit(model, banned, index):
    """Fused encode→search over a MeshShardedPostingsIndex: the query
    encode runs replicated on every device, each shard scores its doc
    range, and only the [D, B, k] partial top-k merge crosses devices —
    pod-scale serving with the same one-dispatch contract. Returns the
    jitted fn (shardings baked in); arg order matches the single-device
    fused fns so ServingEngine.search_batch is backend-agnostic."""
    import jax

    from splade_tpu.ops.postings_index import make_mesh_postings_search_fns

    per = index._shard_size
    C = min(index.rescore_candidates, per) if index.rescore_candidates else 0
    search, search_two_phase = make_mesh_postings_search_fns(
        n_shards=index.n_shards, shard_size=per, n_docs=len(index),
        vocab_size=index.vocab_size, n_candidates=C, approx=index.approx,
        acc_dtype=index._acc_dtype(), scoring=index.resolved_scoring())
    encode_query = _make_encode_query(model, banned, index.query_top_t)
    # the index owns the sharding contract of (*_built, *_doc_major?)
    arrs, rep = index.jit_shardings(two_phase=bool(C))

    if C:
        def fused2(p, post_docs, post_w, term_scale, d_terms, d_vals,
                   d_scale, ids, mask, k):
            q_val, q_idx = encode_query(p, ids, mask)
            return search_two_phase(post_docs, post_w, term_scale, d_terms,
                                    d_vals, d_scale, q_idx, q_val, k)

        return jax.jit(fused2, static_argnums=(9,),
                       in_shardings=(rep,) + arrs + (rep, rep),
                       out_shardings=(rep, rep))

    def fused(p, post_docs, post_w, term_scale, ids, mask, k):
        q_val, q_idx = encode_query(p, ids, mask)
        return search(post_docs, post_w, term_scale, q_idx, q_val, k)

    return jax.jit(fused, static_argnums=(6,),
                   in_shardings=(rep,) + arrs + (rep, rep),
                   out_shardings=(rep, rep))


class ServingEngine:
    """Owns device-pinned params + a built TpuImpactIndex.

    query_top_k mirrors the reference's top-64 rank_feature clause cap
    (reference: searchers.py:161-170); measured lossless at >=32 on the
    10K-doc benchmarks (docs/INDEX_EXPERIMENTS.json).
    """

    def __init__(
        self,
        model,
        params,
        tokenizer,
        index,
        query_max_length: int = 64,
        query_top_k: int = 64,
        batch_pad: int = 8,
        max_k: int = 100,
        k_tiers: Sequence[int] = (10, 100),
        delta_compact_threshold: int = 1024,
    ):
        import jax
        import jax.numpy as jnp

        from splade_tpu.benchmark.encoders import SparseEncoderV33

        self.tokenizer = tokenizer
        self.index = index
        self.query_max_length = query_max_length
        self.batch_pad = batch_pad
        self.max_k = max_k
        self.k_tiers = tuple(sorted(k_tiers))
        self.delta_compact_threshold = delta_compact_threshold
        # CRUD (add/delete/compact) and search touch shared index state
        # from different threads (HTTP handlers vs the batcher): one lock
        # makes mutation + the host side of search atomic.
        import threading

        self._index_lock = threading.RLock()
        self.params = jax.device_put(params)
        # Reused for /encode and for indexing new documents.
        self.encoder = SparseEncoderV33(
            model, self.params, tokenizer, query_max_length=query_max_length,
            query_top_k=query_top_k)

        banned = jnp.asarray(self.encoder._banned) if (
            self.encoder._banned is not None) else None
        from splade_tpu.ops.postings_index import TpuPostingsIndex

        self._postings = isinstance(index, TpuPostingsIndex)
        self._model = model
        self._banned = banned
        if self._postings:
            self._build_postings_fused()
        else:
            fused = make_fused_search_fn(
                model, banned, query_top_k,
                is_int8=getattr(index, "quantize_int8", False))
            self._fused_jit = jax.jit(fused, static_argnums=(6,))

    def _build_postings_fused(self) -> None:
        """(Re)build the fused postings executable. The accumulator width is
        the doc count, a static shape — so adding documents to the index
        requires re-making the jit, not just rebuilding the index."""
        import jax

        from splade_tpu.ops.postings_index import MeshShardedPostingsIndex

        if self.index._built is None:
            self.index.build()
        self._postings_n = len(self.index)
        C = min(self.index.rescore_candidates, self._postings_n)
        self._postings_two_phase = bool(C)
        # largest honorable k: the candidate-pool size — for a mesh index
        # that is D * min(rescore, shard_size), NOT rescore (each shard
        # rescores its own pool)
        self._postings_C = self.index.max_results() if C else 0
        from splade_tpu.ops.cluster_index import (MeshShardedClusterIndex,
                                                  TpuClusterIndex)

        if isinstance(self.index, MeshShardedClusterIndex):
            self._fused_jit = make_fused_mesh_cluster_jit(
                self._model, self._banned, self.index)
            return
        if isinstance(self.index, TpuClusterIndex):
            with_post = bool(self.index.posting_cap)
            fused = make_fused_cluster_search_fn(
                self._model, self._banned, top_t=self.index.query_top_t,
                n_docs=self._postings_n, vocab_size=self.index.vocab_size,
                n_probes=self.index.n_probes,
                posting_candidates=self.index.posting_candidates,
                with_post=with_post,
                posting_scoring=self.index.posting_scoring)
            self._fused_jit = jax.jit(
                fused, static_argnums=(11 if with_post else 8,))
            return
        if isinstance(self.index, MeshShardedPostingsIndex):
            self._fused_jit = make_fused_mesh_postings_jit(
                self._model, self._banned, self.index)
            return
        from splade_tpu.ops.tiered_postings import (
            MeshShardedTieredPostingsIndex, TieredPostingsIndex)

        if isinstance(self.index, MeshShardedTieredPostingsIndex):
            self._fused_jit = make_fused_mesh_tiered_jit(
                self._model, self._banned, self.index)
            return
        if isinstance(self.index, TieredPostingsIndex):
            fused = make_fused_tiered_search_fn(
                self._model, self._banned, top_t=self.index.query_top_t,
                n_docs=self._postings_n, approx=self.index.approx,
                vocab_size=self.index.vocab_size, n_candidates=C,
                acc_dtype=self.index._acc_dtype(),
                scoring=self.index.resolved_scoring())
            self._fused_jit = jax.jit(fused,
                                      static_argnums=(13 if C else 10,))
            return
        fused = make_fused_postings_search_fn(
            self._model, self._banned, top_t=self.index.query_top_t,
            n_docs=self._postings_n, approx=self.index.approx,
            vocab_size=self.index.vocab_size, n_candidates=C,
            acc_dtype=self.index._acc_dtype(),
            scoring=self.index.resolved_scoring())
        self._fused_jit = jax.jit(fused,
                                  static_argnums=(9 if C else 6,))

    # ------------------------------------------------------------- search
    def _quantize_k(self, k: int) -> int:
        """top_k's k is a static jit arg: each distinct value compiles a new
        executable, so round up to a fixed tier and slice host-side."""
        from splade_tpu.utils.text import quantize_to_tier

        k = min(max(k, 1), self.max_k, len(self.index))
        return quantize_to_tier(k, self.k_tiers, cap=len(self.index))

    def search_batch(
        self, queries: Sequence[str], k: int = 10
    ) -> List[List[Tuple[str, float]]]:
        """Encode + retrieve for a batch of query strings in one dispatch."""
        with self._index_lock:
            return self._search_batch_locked(queries, k)

    def _search_batch_locked(
        self, queries: Sequence[str], k: int = 10
    ) -> List[List[Tuple[str, float]]]:
        import jax.numpy as jnp

        if len(self.index) == 0:
            # empty (or compacted-to-empty) corpus: no results, no error —
            # and no fused build attempt, which requires >= 1 document
            return [[] for _ in queries]
        if self._postings:
            if self.index._built is None:
                self._build_postings_fused()
            elif (getattr(self.index, "delta_count", 0)
                  or getattr(self.index, "deleted_count", 0)):
                # LSM path: small deltas are scored host-side and merged,
                # deletes are tombstone-filtered — no rebuild, no fused-jit
                # recompile. Past the threshold, compact and re-jit once.
                # Deletes ALSO compact once they approach max_k: the
                # tombstone over-fetch is clamped at max_k, so past that
                # point a query whose top base hits are all tombstoned
                # could return fewer than k results.
                delete_cap = min(self.delta_compact_threshold,
                                 max(self.max_k // 2, 1))
                if (self.index.delta_count + self.index.deleted_count
                        > self.delta_compact_threshold
                        or self.index.deleted_count > delete_cap):
                    self.index.compact()
                    if len(self.index):
                        self._build_postings_fused()
            elif len(self.index) != self._postings_n:
                self._build_postings_fused()  # non-delta index mutated
        if len(self.index) == 0:
            # every document deleted/compacted away: no results, no error
            return [[] for _ in queries]
        # over-fetch by the tombstone count (deletes are filtered AFTER the
        # device top-k; without slack they shrink results below k). Tier
        # quantization bounds the shape set.
        deleted = getattr(self.index, "deleted_count", 0)
        live = len(self.index) - deleted
        if live <= 0:
            return [[] for _ in queries]
        # clamp k to the LIVE doc count: asking for more than live results
        # is unsatisfiable, and counting the impossible tail as shortfall
        # would trigger needless synchronous compactions below
        k = min(max(k, 1), self.max_k, live)
        # Fetch ceiling of the CURRENT fused executable: its top_k width is
        # the BASE segment size (delta docs are scored host-side, so
        # len(index) overstates it), further clamped to the candidate pool
        # in two-phase mode.
        fetch_cap = self.max_k
        if self._postings:
            fetch_cap = min(fetch_cap, self._postings_n)
            if self._postings_two_phase:
                fetch_cap = min(fetch_cap, self._postings_C)
        if self._postings and deleted and k + deleted > fetch_cap:
            # The over-fetch ceiling cannot cover the tombstones for THIS
            # k — in the worst case every tombstoned doc outranks the k-th
            # live hit and the query returns fewer than k results. The
            # amortized delete_cap above keeps this rare; when it does
            # happen, pay one synchronous compaction for a hard guarantee.
            self.index.compact()
            self._build_postings_fused()
            deleted = 0
            fetch_cap = min(self.max_k, self._postings_n)
            if self._postings_two_phase:
                fetch_cap = min(fetch_cap, self._postings_C)
        k_eff = self._quantize_k(min(k + deleted, fetch_cap))
        if self._postings:
            # tier rounding may exceed the executable's width (e.g. a
            # 60-doc base rounds k=20 up to the 100 tier): clamp the DEVICE
            # fetch back, matching TpuPostingsIndex.search_topk's
            # min(tier, _base_n). The user's k is NOT clamped here — when
            # k exceeds the base segment, the LSM-delta merge below tops
            # results up from delta docs.
            k_eff = min(k_eff, fetch_cap)
            if self._postings_two_phase:
                # documented ceiling: two-phase can honor at most the
                # candidate-pool size (index.max_results())
                k = min(k, self._postings_C)
        B = len(queries)
        padded = list(queries) + [""] * (
            _bucket_batch(max(B, 1), self.batch_pad) - B)
        enc = self.tokenizer(
            padded, padding="max_length", truncation=True,
            max_length=self.query_max_length, return_tensors="np")
        ids = jnp.asarray(enc["input_ids"].astype(np.int32))
        mask = jnp.asarray(enc["attention_mask"].astype(np.int32))
        q_cached = None
        if self._postings:
            # _built holds the phase-1 structure (3 postings arrays, or
            # summary+cluster_docs(+postings) for the cluster index); the
            # index owns that layout, the engine just forwards it
            if self._postings_two_phase:
                fused_out = self._fused_jit(
                    self.params, *self.index._built,
                    *self.index._doc_major, ids, mask, k_eff)
            else:
                fused_out = self._fused_jit(
                    self.params, *self.index._built, ids, mask, k_eff)
            vals, idxs = fused_out[0], fused_out[1]
            if len(fused_out) > 2:  # mesh fused fn returns only (vals, idxs)
                q_cached = fused_out[2], fused_out[3]
        else:
            mat, scale, n_valid = self.index.device_arrays()
            vals, idxs = self._fused_jit(
                self.params, mat, scale, ids, mask, n_valid, k_eff)
        vals = np.asarray(vals)[:B]
        idxs = np.asarray(idxs)[:B]
        doc_ids = self.index.doc_ids
        # dense pads rows with -inf; postings no-overlap docs score 0 — both
        # are non-results. Tombstoned (deleted) docs are filtered here.
        tomb = getattr(self.index, "_tombstones", None) or frozenset()
        keep = ((lambda v, i: v > 0 and i not in tomb) if self._postings
                else (lambda v, i: np.isfinite(v)))
        out = [[(doc_ids[int(i)], float(v))
                for v, i in zip(vals[b], idxs[b]) if keep(v, int(i))][:k]
               for b in range(B)]
        if self._postings and getattr(self.index, "delta_count", 0):
            if q_cached is not None:
                # the fused fn already computed the top-T query vectors —
                # reuse them (a second full encode used to double device
                # time for every search during the delta lifetime)
                q_val = np.asarray(q_cached[0])[:B]
                q_idx = np.asarray(q_cached[1])[:B]
                q_vecs = [(q_idx[b], q_val[b]) for b in range(B)]
            else:
                # mesh fused path (returns no cached query vectors) or
                # fallback: separate encode, truncated to the SAME top-T
                # the base path uses so base/delta scores stay comparable
                top_t = self.index.query_top_t
                q_vecs = []
                for qi, qv in self.encoder.encode_queries(list(queries)):
                    if len(qv) > top_t:
                        keep_t = np.argsort(-np.asarray(qv))[:top_t]
                        qi, qv = np.asarray(qi)[keep_t], np.asarray(qv)[keep_t]
                    q_vecs.append((qi, qv))
            d_scores = self.index.score_delta([v[0] for v in q_vecs],
                                              [v[1] for v in q_vecs])
            out = self.index.merge_delta(out, d_scores, k)
        return out

    def warmup(self, max_batch_size: int = 32) -> int:
        """Compile the fused executable for every (batch-bucket, k-tier)
        shape the server can hit, so no request pays a compile. Returns the
        number of shapes warmed."""
        shapes = 0
        b = self.batch_pad
        buckets = []
        while b < max_batch_size:
            buckets.append(b)
            b *= 2
        buckets.append(b)
        for bucket in buckets:
            for tier in self.k_tiers:
                self.search_batch([""] * bucket, k=min(tier, len(self.index)))
                shapes += 1
        logger.info("warmed %d fused-search shapes (buckets %s x k tiers %s)",
                    shapes, buckets, list(self.k_tiers))
        return shapes

    def search(self, query: str, k: int = 10) -> List[Tuple[str, float]]:
        return self.search_batch([query], k)[0]

    # ------------------------------------------------------------- encode
    def encode(self, texts: Sequence[str], queries: bool = False):
        """Sparse vectors [(indices, values), ...] for external indexing."""
        if queries:
            return self.encoder.encode_queries(list(texts))
        return self.encoder.encode_documents(list(texts))

    # --------------------------------------------------------- index CRUD
    def add_documents(self, docs: Sequence[Tuple[str, str]]) -> int:
        """Encode and index (doc_id, text) pairs live (postings backends
        serve them from the LSM delta with no recompile)."""
        vecs = self.encoder.encode_documents([t for _, t in docs])
        with self._index_lock:
            self.index.add_batch([d for d, _ in docs], vecs)
        return len(docs)

    def delete_documents(self, doc_ids: Sequence[str]) -> int:
        """Tombstone documents (dense backends drop rows physically)."""
        if not hasattr(self.index, "delete"):
            raise NotImplementedError(
                f"{type(self.index).__name__} does not support deletes")
        with self._index_lock:
            return self.index.delete(doc_ids)

    @property
    def num_docs(self) -> int:
        return len(self.index)


def build_engine_from_docs(
    model, params, tokenizer,
    docs: Sequence[Tuple[str, str]],
    int8: bool = True,
    doc_top_k: int = 0,
    mesh=None,
    index_type: str = "dense",
    n_postings: Optional[int] = None,
    rescore_candidates: Optional[int] = None,
    cluster_size: int = 64,
    n_probes: int = 32,
    hot_terms: int = 2048,
    hot_postings: int = 8192,
    posting_scoring: str = "auto",
    **engine_kw,
) -> ServingEngine:
    """Encode (doc_id, text) pairs on device and build a served index.

    index_type: 'dense' ([N,V] matmul index — best to a few 10^5 docs),
    'postings' (impact-ordered truncated postings — million-doc corpora;
    rescore_candidates>0 adds the two-phase exact-rescoring path — use a
    short cap like n_postings=64 with it), 'tiered' (DF-tiered postings
    — per-term budgets via a hot-term continuation tier; the production
    answer for hot-term corpora where uniform truncation collapses,
    ops/tiered_postings.py), or 'cluster' (cluster-summary union index —
    FROZEN design, kept for comparability: docs/ARCHITECTURE.md §5a
    decision).

    ``n_postings``/``rescore_candidates`` are per-backend: for 'postings'
    they default to 2048/0 (single-phase deep lists); for 'cluster' they
    size the union's postings side (posting_cap/posting_candidates,
    defaults 64/128; n_postings=0 disables the postings side).
    ``cluster_size``/``n_probes`` apply to 'cluster' only."""
    from splade_tpu.benchmark.encoders import SparseEncoderV33

    enc = SparseEncoderV33(model, params, tokenizer, doc_top_k=doc_top_k)
    if index_type == "cluster":
        from splade_tpu.ops.cluster_index import TpuClusterIndex

        index = TpuClusterIndex(
            len(tokenizer),
            query_top_t=engine_kw.get("query_top_k", 64) or 32,
            cluster_size=cluster_size, n_probes=n_probes,
            posting_cap=64 if n_postings is None else n_postings,
            # the union's phase 2 always rescores exactly, so 0 here is
            # meaningless — fall back to the default pool width
            posting_candidates=rescore_candidates or 128)
    elif index_type == "tiered":
        from splade_tpu.ops.tiered_postings import TieredPostingsIndex

        index = TieredPostingsIndex(
            len(tokenizer),
            n_postings=256 if n_postings is None else n_postings,
            hot_terms=hot_terms, hot_postings=hot_postings,
            query_top_t=engine_kw.get("query_top_k", 64) or 32,
            rescore_candidates=rescore_candidates or 0,
            scoring=posting_scoring)
    elif index_type == "postings":
        from splade_tpu.ops.postings_index import TpuPostingsIndex

        index = TpuPostingsIndex(
            len(tokenizer),
            n_postings=2048 if n_postings is None else n_postings,
            query_top_t=engine_kw.get("query_top_k", 64) or 32,
            rescore_candidates=rescore_candidates or 0,
            scoring=posting_scoring)
    else:
        from splade_tpu.ops.impact_index import TpuImpactIndex

        index = TpuImpactIndex(len(tokenizer), quantize_int8=int8, mesh=mesh)
    ids = [d for d, _ in docs]
    vecs = enc.encode_documents([t for _, t in docs])
    index.add_batch(ids, vecs)
    index.build()
    return ServingEngine(model, params, tokenizer, index, **engine_kw)

"""DF-tiered postings: per-term posting budgets at TPU-regular shapes.

Uniform truncation (TpuPostingsIndex) collapses in the hot-term regime:
on the 1M-doc topical corpus at the published ~54-nnz sparsity, P=512
drops 83% of all postings and recall@10 vs exact measured 0.502
(docs/POSTINGS_BENCH.json ``r4_lambda_complete_1m_topical_*``). The
cause is document-frequency skew — topic-block terms fire in 10^4-10^5
docs, so a uniform cap keeps <1% of exactly the lists that carry the
topical signal.

The classical fix is a per-term budget P_t ∝ df_t (impact-ordered lists
sized by document frequency — what the reference's SEISMIC sweep calls
``n_postings`` is also uniform, but its OpenSearch backend stores true
variable-length lists; methodology reference:
/root/reference/scripts/neural_sparse_search_aws.py:1314-1434). Fully
variable budgets mean ragged CSR — dynamic shapes and scalar gathers,
exactly what XLA/TPU punishes. This module keeps the budgets *discrete*
instead: two rectangular tiers —

- **cold tier** ``[V, P_cold]``: every term's top-``P_cold`` postings
  (identical to the uniform index),
- **hot tier** ``[H, P_hot]``: for the ``H`` highest-df terms, the
  CONTINUATION of their impact-ordered list (ranks ``P_cold ..
  P_cold+P_hot``), indexed through a ``hot_slot [V]`` remap whose pad
  row (slot ``H``) is all-zero for cold terms.

A hot term's effective depth is ``P_cold + P_hot`` while memory stays
``V*P_cold + H*P_hot`` — e.g. V=50K/P_cold=256 + H=2048/P_hot=16384 is
~230 MB where uniform P=4096 needs ~1 GB for LESS hot-term depth. Both
tiers are plain 2-D gathers feeding the same aggregation kernels as the
uniform index (sort / select / scatter), so the search stays
fixed-shape and fusion-friendly.
"""

from __future__ import annotations

import logging
from typing import Tuple

import numpy as np

from splade_tpu.ops.postings_index import (
    TpuPostingsIndex, _select_sum_topk, _select_topk_candidates,
    _sorted_segment_topk, dispatch_rescore, flatten_csr, invert_flat,
    quantize_postings)

logger = logging.getLogger(__name__)


def select_hot_terms(df: np.ndarray, p_cold: int, hot_terms: int
                     ) -> np.ndarray:
    """Term ids that get a hot-tier row: the ``hot_terms`` highest-df
    terms among those that actually overflow the cold tier (df >
    p_cold). May return fewer than ``hot_terms`` ids."""
    over = np.flatnonzero(df > p_cold)
    if len(over) > hot_terms:
        top = np.argpartition(-df[over], hot_terms - 1)[:hot_terms]
        over = over[top]
    return np.sort(over).astype(np.int32)


def build_tiered(doc_idx, doc_val, vocab_size: int, p_cold: int,
                 hot_terms: int, p_hot: int
                 ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                            np.ndarray, np.ndarray, int]:
    """Build both tiers from per-doc CSR lists.

    Returns (cold_docs [V,Pc] i32, cold_w [V,Pc] f32,
             hot_slot [V] i32 (== H for cold terms),
             hot_docs [H,Ph] i32, hot_w [H,Ph] f32, n_truncated).
    H is the *realized* hot count (<= hot_terms); all-zero rows pad
    terms whose list ends inside the hot window."""
    all_terms, all_vals, all_docs = flatten_csr(doc_idx, doc_val)
    df = np.bincount(all_terms, minlength=vocab_size)
    cold_docs, cold_w, trunc_cold = invert_flat(
        all_terms, all_vals, all_docs, vocab_size, p_cold)
    hot_ids = select_hot_terms(df, p_cold, hot_terms)
    H = len(hot_ids)
    hot_slot = np.full(vocab_size, H, np.int32)
    if H == 0:
        return (cold_docs, cold_w, hot_slot,
                np.zeros((0, p_hot), np.int32),
                np.zeros((0, p_hot), np.float32), trunc_cold)
    hot_slot[hot_ids] = np.arange(H, dtype=np.int32)
    # invert ONLY the hot terms' postings, remapped to [0, H), at depth
    # P_cold + P_hot; the hot tier keeps the continuation slice
    is_hot = hot_slot[all_terms] < H
    full_docs, full_w, trunc_hot = invert_flat(
        hot_slot[all_terms[is_hot]], all_vals[is_hot], all_docs[is_hot],
        max(H, 1), p_cold + p_hot)
    hot_docs = np.ascontiguousarray(full_docs[:, p_cold:])
    hot_w = np.ascontiguousarray(full_w[:, p_cold:])
    # truncation accounting: a hot term's postings past P_cold are NOT
    # truncated (they live in the hot tier) unless past P_cold + P_hot
    kept_by_hot = int((hot_w > 0).sum())
    return (cold_docs, cold_w, hot_slot, hot_docs, hot_w,
            trunc_cold - kept_by_hot)


def tiered_score_topk(cold_docs, cold_w, cold_scale, hot_slot, hot_docs,
                      hot_w, hot_scale, q_idx, q_val, k: int, n_docs: int,
                      approx: bool, acc_dtype=None,
                      scoring: str = "sort"):
    """Tiered analogue of ``postings_score_topk``: gather BOTH tiers'
    rows for the query terms, concatenate on the postings axis
    ([B, T, P_cold + P_hot]), aggregate with the shared kernels. The
    hot gather routes through ``hot_slot`` — cold terms hit the all-zero
    pad row (slot H), contributing nothing."""
    import jax
    import jax.numpy as jnp

    if acc_dtype is None:
        acc_dtype = jnp.float32
    rows_c = cold_docs[q_idx]                              # [B, T, Pc]
    qw_c = q_val * cold_scale[q_idx]
    slot = hot_slot[q_idx]                                 # [B, T]
    rows_h = hot_docs[slot]                                # [B, T, Ph]
    qw_h = q_val * hot_scale[slot]
    if scoring == "scatter":
        B = q_idx.shape[0]
        acc = jnp.zeros((B, n_docs), acc_dtype)
        for rows, w8, qw in ((rows_c, cold_w[q_idx], qw_c),
                             (rows_h, hot_w[slot], qw_h)):
            contrib = (w8.astype(jnp.bfloat16)
                       * qw[:, :, None].astype(jnp.bfloat16))
            b_ix = jnp.broadcast_to(
                jnp.arange(B, dtype=jnp.int32)[:, None, None], rows.shape)
            acc = acc.at[b_ix, rows].add(contrib.astype(acc_dtype),
                                         mode="drop")
        if approx:
            return jax.lax.approx_max_k(acc, k)
        return jax.lax.top_k(acc, k)
    contrib_c = cold_w[q_idx].astype(jnp.float32) * qw_c[:, :, None]
    contrib_h = hot_w[slot].astype(jnp.float32) * qw_h[:, :, None]
    rows_d = jnp.concatenate([rows_c, rows_h], axis=2)
    contrib = jnp.concatenate([contrib_c, contrib_h], axis=2)
    if scoring == "select":
        return _select_topk_candidates(rows_d, contrib, k, approx)
    if scoring == "select_sum":
        return _select_sum_topk(rows_d, contrib, k, approx)
    return _sorted_segment_topk(rows_d, contrib, k)


def tiered_two_phase_topk(cold_docs, cold_w, cold_scale, hot_slot,
                          hot_docs, hot_w, hot_scale, d_terms, d_vals,
                          d_scale, q_idx, q_val, k: int, n_docs: int,
                          vocab_size: int, n_candidates: int, approx: bool,
                          phase1_dtype=None, scoring: str = "sort",
                          rescore: str = "auto", vmapped: bool = False):
    """Two-phase search with a tiered phase 1 and the shared exact
    phase-2 rescore (same contract as ``postings_two_phase_topk``)."""
    import jax
    import jax.numpy as jnp

    if phase1_dtype is None:
        phase1_dtype = jnp.bfloat16
    p1_vals, cand = tiered_score_topk(
        cold_docs, cold_w, cold_scale, hot_slot, hot_docs, hot_w,
        hot_scale, q_idx, q_val, n_candidates, n_docs, approx,
        acc_dtype=phase1_dtype, scoring=scoring)
    scores = dispatch_rescore(d_terms, d_vals, d_scale, q_idx, q_val,
                              cand, vocab_size, mode=rescore,
                              vmapped=vmapped)
    scores = jnp.where(p1_vals == -jnp.inf, -jnp.inf, scores)
    vals, pos = jax.lax.top_k(scores, min(k, scores.shape[1]))
    return vals, jnp.take_along_axis(cand, pos, axis=1)


def make_mesh_tiered_search_fns(n_shards: int, shard_size: int,
                                n_docs: int, vocab_size: int,
                                n_candidates: int, approx: bool,
                                acc_dtype, scoring: str):
    """Search bodies for doc-sharded TIERED postings under GSPMD: vmap
    the 7-array per-shard tiered kernel over the leading shard axis,
    merge the [D, B, k] partials (the only cross-device traffic). Same
    contract as ``make_mesh_postings_search_fns``."""
    import jax

    from splade_tpu.ops.postings_index import merge_sharded_topk

    D, per, n, V, C = n_shards, shard_size, n_docs, vocab_size, n_candidates

    def search(cd, cw, cs, hs, hd, hw, hsc, q_idx, q_val, k):
        k_local = min(k, per)

        def shard_search(cd_, cw_, cs_, hs_, hd_, hw_, hsc_):
            return tiered_score_topk(cd_, cw_, cs_, hs_, hd_, hw_, hsc_,
                                     q_idx, q_val, k_local, per, approx,
                                     acc_dtype=acc_dtype, scoring=scoring)

        vals, idxs = jax.vmap(shard_search)(cd, cw, cs, hs, hd, hw, hsc)
        return merge_sharded_topk(vals, idxs, k, per, n)

    def search_two_phase(cd, cw, cs, hs, hd, hw, hsc, dt, dv, dsc,
                         q_idx, q_val, k):
        k_local = min(k, per, C)

        def shard_search(cd_, cw_, cs_, hs_, hd_, hw_, hsc_, dt_, dv_,
                         dsc_):
            return tiered_two_phase_topk(
                cd_, cw_, cs_, hs_, hd_, hw_, hsc_, dt_, dv_, dsc_,
                q_idx, q_val, k_local, per, V, C, approx,
                phase1_dtype=acc_dtype, scoring=scoring, vmapped=True)

        vals, idxs = jax.vmap(shard_search)(cd, cw, cs, hs, hd, hw, hsc,
                                            dt, dv, dsc)
        return merge_sharded_topk(vals, idxs, k, per, n)

    return search, search_two_phase


class TieredPostingsIndex(TpuPostingsIndex):
    """Two-tier DF-budgeted postings index (see module docstring).

    Extra knobs over TpuPostingsIndex: ``hot_terms`` (max hot rows H)
    and ``hot_postings`` (hot-tier continuation depth P_hot). With
    hot_terms=0 it degenerates to the uniform index's structure (but
    keeps this class's search path)."""

    _SAVE_KIND = "tiered"

    def __init__(self, vocab_size: int, n_postings: int = 256,
                 hot_terms: int = 2048, hot_postings: int = 8192,
                 query_top_t: int = 32, batch_pad: int = 8,
                 approx: bool = True, rescore_candidates: int = 0,
                 phase1_acc: str = "auto", scoring: str = "auto"):
        super().__init__(vocab_size, n_postings=n_postings,
                         query_top_t=query_top_t, batch_pad=batch_pad,
                         approx=approx,
                         rescore_candidates=rescore_candidates,
                         phase1_acc=phase1_acc, scoring=scoring)
        self.hot_terms = hot_terms
        self.hot_postings = hot_postings
        self.n_hot = 0  # realized H, set at build

    def resolved_scoring(self) -> str:
        """Same auto rule as the base, on the tiered pool size
        E = T * (P_cold + P_hot): sort through 32K on TPU, scatter
        beyond (the tiered pool usually IS beyond — measured on chip
        this round, docs/POSTINGS_BENCH.json r5_tiered_*)."""
        if self.scoring != "auto":
            return self.scoring
        try:
            import jax
            on_tpu = jax.default_backend() == "tpu"
        except Exception:  # noqa: BLE001
            on_tpu = False
        bound = 32768 if on_tpu else 4096
        E = self.query_top_t * (self.n_postings + self.hot_postings)
        return "sort" if E <= bound else "scatter"

    def build(self) -> None:
        import jax

        n = len(self.doc_ids)
        if n == 0:
            raise ValueError("empty index")
        (cold_docs, cold_w, hot_slot, hot_docs, hot_w,
         self.truncated_postings) = build_tiered(
            self._doc_idx, self._doc_val, self.vocab_size,
            self.n_postings, self.hot_terms, self.hot_postings)
        self.n_hot = H = hot_docs.shape[0]
        cold_q, cold_scale = quantize_postings(cold_w)
        # pad row (slot H): zero weights, unit scale — cold terms route
        # here and contribute nothing
        hot_q, hot_scale = quantize_postings(
            np.vstack([hot_w, np.zeros((1, self.hot_postings),
                                       np.float32)])
            if H else np.zeros((1, self.hot_postings), np.float32))
        hot_docs_pad = (np.vstack([hot_docs,
                                   np.zeros((1, self.hot_postings),
                                            np.int32)])
                        if H else np.zeros((1, self.hot_postings),
                                           np.int32))
        self._built = tuple(jax.device_put(a) for a in (
            cold_docs, cold_q, cold_scale, hot_slot, hot_docs_pad, hot_q,
            hot_scale))
        if self.rescore_candidates:
            self._doc_major = self._build_doc_major()
        self._base_n = n
        self._delta_cache = None
        self._make_search()
        logger.info(
            "tiered postings index: %d docs, cold P=%d + hot %d x P=%d "
            "(truncated %.2f%% of postings), %.0f MB on device",
            n, self.n_postings, H, self.hot_postings,
            100.0 * self.truncated_postings / max(self.nnz, 1),
            self.memory_bytes() / 1e6)

    def _make_search(self) -> None:
        import jax

        n = len(self.doc_ids)
        approx = self.approx
        V = self.vocab_size
        C = (min(self.rescore_candidates, n)
             if self.rescore_candidates else 0)
        acc_dtype = self._acc_dtype()
        scoring = self.resolved_scoring()

        def search(cd, cw, cs, hs, hd, hw, hsc, q_idx, q_val, k):
            return tiered_score_topk(cd, cw, cs, hs, hd, hw, hsc, q_idx,
                                     q_val, k, n, approx,
                                     acc_dtype=acc_dtype, scoring=scoring)

        def search_two_phase(cd, cw, cs, hs, hd, hw, hsc, dt, dv, dsc,
                             q_idx, q_val, k):
            return tiered_two_phase_topk(
                cd, cw, cs, hs, hd, hw, hsc, dt, dv, dsc, q_idx, q_val,
                k, n, V, C, approx, phase1_dtype=acc_dtype,
                scoring=scoring)

        if C:
            jitted2 = jax.jit(search_two_phase, static_argnums=12)
            self._search_jit = lambda qi, qv, k: jitted2(
                *self._built, *self._doc_major, qi, qv, k)
        else:
            jitted = jax.jit(search, static_argnums=9)
            self._search_jit = lambda qi, qv, k: jitted(*self._built,
                                                        qi, qv, k)

    # --------------------------------------------------------- persistence
    def _config_array(self) -> np.ndarray:
        return np.asarray([self.vocab_size, self.n_postings,
                           self.query_top_t, self.rescore_candidates,
                           self.hot_terms, self.hot_postings], np.int64)

    def config_summary(self) -> str:
        return (f"n_postings={self.n_postings} hot={self.n_hot}"
                f"x{self.hot_postings} query_top_t={self.query_top_t} "
                f"rescore={self.rescore_candidates}")

    @classmethod
    def _config_kwargs(cls, cfg: np.ndarray):
        vocab, P, top_t, C, H, Ph = (int(x) for x in cfg)
        return vocab, dict(n_postings=P, query_top_t=top_t,
                           rescore_candidates=C, hot_terms=H,
                           hot_postings=Ph)


class MeshShardedTieredPostingsIndex(TieredPostingsIndex):
    """Doc-sharded DF-tiered postings over a device mesh: each shard
    builds its OWN tiers (hot-term selection adapts to the shard's df
    distribution), searches locally, and only the [D, B, k] partial
    top-k merge crosses devices — the 10M-doc design point where both
    capacity (linear in devices) and hot-term depth matter.

    Hot rows are padded to exactly ``hot_terms`` per shard so the
    stacked [D, H+1, Ph] arrays are rectangular (the +1 is the all-zero
    pad row cold terms route to)."""

    def __init__(self, vocab_size: int, mesh, n_postings: int = 256,
                 hot_terms: int = 2048, hot_postings: int = 8192,
                 query_top_t: int = 32, batch_pad: int = 8,
                 approx: bool = True, rescore_candidates: int = 0,
                 phase1_acc: str = "auto", scoring: str = "auto"):
        super().__init__(vocab_size, n_postings=n_postings,
                         hot_terms=hot_terms, hot_postings=hot_postings,
                         query_top_t=query_top_t, batch_pad=batch_pad,
                         approx=approx,
                         rescore_candidates=rescore_candidates,
                         phase1_acc=phase1_acc, scoring=scoring)
        self.mesh = mesh
        self.n_shards = int(mesh.devices.size)

    def max_results(self) -> int:
        n = len(self.doc_ids)
        if not self.rescore_candidates:
            return n
        return min(n, self.n_shards *
                   min(self.rescore_candidates, self._shard_size))

    def jit_shardings(self, two_phase: bool):
        """NamedShardings of (*_built, *_doc_major?) in search-arg order
        — 7 phase-1 arrays + optionally 3 doc-major arrays, all sharded
        on the leading (shard) axis."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = self.mesh.axis_names[0]
        rep = NamedSharding(self.mesh, P())
        sh3 = NamedSharding(self.mesh, P(axis, None, None))
        sh2 = NamedSharding(self.mesh, P(axis, None))
        arrs = (sh3, sh3, sh2, sh2, sh3, sh3, sh2)
        if two_phase:
            arrs = arrs + (sh3, sh3, sh2)
        return arrs, rep

    def build(self) -> None:
        import jax

        n = len(self.doc_ids)
        if n == 0:
            raise ValueError("empty index")
        D = self.n_shards
        per = -(-n // D)
        self._shard_size = per
        Hmax, Ph = self.hot_terms, self.hot_postings
        stacks = {k: [] for k in ("cd", "cw", "cs", "hs", "hd", "hw",
                                  "hsc")}
        self.truncated_postings = 0
        n_hot_total = 0
        for d in range(D):
            lo, hi = d * per, min((d + 1) * per, n)
            if lo >= hi:  # empty tail shard
                cold_docs = np.zeros((self.vocab_size, self.n_postings),
                                     np.int32)
                cold_w = np.zeros_like(cold_docs, np.float32)
                hot_slot = np.full(self.vocab_size, Hmax, np.int32)
                hot_docs = np.zeros((0, Ph), np.int32)
                hot_w = np.zeros((0, Ph), np.float32)
                trunc = 0
            else:
                (cold_docs, cold_w, hot_slot, hot_docs, hot_w,
                 trunc) = build_tiered(
                    self._doc_idx[lo:hi], self._doc_val[lo:hi],
                    self.vocab_size, self.n_postings, Hmax, Ph)
            H = hot_docs.shape[0]
            n_hot_total += H
            self.truncated_postings += trunc
            # pad hot rows to exactly Hmax (+1 pad row) and repoint the
            # cold-term pad slot H -> Hmax so shards stack rectangular
            hot_slot = np.where(hot_slot == H, Hmax, hot_slot)
            pad_rows = Hmax + 1 - H
            hot_docs = np.vstack([hot_docs,
                                  np.zeros((pad_rows, Ph), np.int32)])
            hot_w = np.vstack([hot_w,
                               np.zeros((pad_rows, Ph), np.float32)])
            cold_q, cold_scale = quantize_postings(cold_w)
            hot_q, hot_scale = quantize_postings(hot_w)
            for k, v in (("cd", cold_docs), ("cw", cold_q),
                         ("cs", cold_scale), ("hs", hot_slot),
                         ("hd", hot_docs), ("hw", hot_q),
                         ("hsc", hot_scale)):
                stacks[k].append(v)
        self.n_hot = n_hot_total
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = self.mesh.axis_names[0]
        sh3 = NamedSharding(self.mesh, P(axis, None, None))
        sh2 = NamedSharding(self.mesh, P(axis, None))
        sh = {"cd": sh3, "cw": sh3, "cs": sh2, "hs": sh2, "hd": sh3,
              "hw": sh3, "hsc": sh2}
        self._built = tuple(
            jax.device_put(np.stack(stacks[k]), sh[k])
            for k in ("cd", "cw", "cs", "hs", "hd", "hw", "hsc"))
        self._base_n = n
        if self.rescore_candidates:
            M = max((len(x) for x in self._doc_idx), default=1)
            t_stack, v_stack, s_stack = [], [], []
            for d in range(D):
                lo, hi = d * per, min((d + 1) * per, n)
                t, v, s = self._doc_major_arrays(
                    self._doc_idx[lo:hi], self._doc_val[lo:hi], per, M=M)
                t_stack.append(t)
                v_stack.append(v)
                s_stack.append(s)
            self._doc_major = (
                jax.device_put(np.stack(t_stack), sh3),
                jax.device_put(np.stack(v_stack), sh3),
                jax.device_put(np.stack(s_stack), sh2),
            )
        self._delta_cache = None
        self._make_search()
        logger.info(
            "mesh tiered index: %d docs over %d shards (%d/shard), cold "
            "P=%d + hot %dx%d/shard, %.0f MB total",
            n, D, per, self.n_postings, Hmax, Ph,
            self.memory_bytes() / 1e6)

    def _make_search(self) -> None:
        import jax

        per = self._shard_size
        C = (min(self.rescore_candidates, per)
             if self.rescore_candidates else 0)
        search, search_two_phase = make_mesh_tiered_search_fns(
            n_shards=self.n_shards, shard_size=per,
            n_docs=len(self.doc_ids), vocab_size=self.vocab_size,
            n_candidates=C, approx=self.approx,
            acc_dtype=self._acc_dtype(), scoring=self.resolved_scoring())
        arrs, rep = self.jit_shardings(two_phase=bool(C))
        if C:
            jitted2 = jax.jit(
                search_two_phase, static_argnums=12,
                in_shardings=arrs + (rep, rep), out_shardings=(rep, rep))
            self._search_jit = lambda qi, qv, k: jitted2(
                *self._built, *self._doc_major, qi, qv, k)
        else:
            jitted = jax.jit(
                search, static_argnums=9,
                in_shardings=arrs + (rep, rep), out_shardings=(rep, rep))
            self._search_jit = lambda qi, qv, k: jitted(*self._built,
                                                        qi, qv, k)

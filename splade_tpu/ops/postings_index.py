"""Postings-list sparse index for large corpora (>~300K docs/chip).

The dense ``TpuImpactIndex`` stores the corpus as an [N, V] matrix — ideal up
to a few 10^5 docs (int8 at N=300K x V=50K is ~15 GB HBM), impossible at
N=10^6+. This index is the classic impact-ordered postings design mapped to
XLA (reference methodology: the SEISMIC experiments in
scripts/neural_sparse_search_aws.py:1314-1434 sweep exactly this structure's
``n_postings`` / truncation parameters against an exact baseline):

- **Build**: per vocab term, keep the ``n_postings`` highest-impact
  (doc, weight) pairs, quantized int8 with a per-term scale, padded to one
  rectangular [V, P] pair of arrays (regular shapes; the MXU-hostile ragged
  CSR never reaches the device).
- **Query**: gather the posting rows of the query's top-T terms
  ([B, T, P]), multiply by query weights, scatter-add into a [B, N]
  accumulator, then ``lax.approx_max_k`` (the TPU-native partial sort) or
  exact ``top_k``. Work per batch is O(B·T·P) gathered elements —
  independent of V and linear in the truncation cap, vs O(B·N·V) MACs for
  the dense matmul.
- Memory is O(total truncated postings): at N=10^6, ~54 nnz/doc and
  P=2048 it is ~0.5 GB where the dense int8 matrix would need 50 GB.

Truncation is lossy for very common terms (their tail postings are
dropped), which is exactly the SEISMIC trade; recall-vs-exact is measured in
tests and in ``scripts/run_index_experiments.py``.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def flatten_csr(doc_idx: Sequence[np.ndarray], doc_val: Sequence[np.ndarray]
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-doc CSR lists -> flat (terms, vals, doc_of) posting triples."""
    n = len(doc_idx)
    all_terms = np.concatenate(doc_idx)
    all_vals = np.ascontiguousarray(np.concatenate(doc_val), np.float32)
    lens = np.fromiter(map(len, doc_idx), np.int64, count=n)
    all_docs = np.repeat(np.arange(n, dtype=np.int32), lens)
    return all_terms, all_vals, all_docs


def invert_flat(
    all_terms: np.ndarray, all_vals: np.ndarray, all_docs: np.ndarray,
    vocab_size: int, n_postings: int,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Flat posting triples -> impact-ordered truncated postings (the
    shared body of invert_to_postings; also used directly by the tiered
    index on its hot-term subset, ops/tiered_postings.py)."""
    V, P = vocab_size, n_postings
    assert V < (1 << 16), "packed uint64 key needs vocab < 65536"
    assert len(all_vals) < (1 << 32), "packed position field is 32-bit"
    # Multithreaded C++ builder when available (tools/postings_build):
    # same contract, O(nnz) bucketing instead of a global sort.
    from splade_tpu.ops.postings_native import build_postings_native

    native = build_postings_native(all_terms, all_vals, all_docs, V, P)
    if native is not None:
        return native
    key = all_terms.astype(np.uint64)
    key <<= np.uint64(48)
    key |= (np.uint16(0xFFFF) -
            all_vals.astype(np.float16).view(np.uint16)
            ).astype(np.uint64) << np.uint64(32)
    key |= np.arange(len(key), dtype=np.uint64)
    key.sort()
    bounds = np.arange(V + 1, dtype=np.uint64) << np.uint64(48)
    starts = np.searchsorted(key, bounds[:-1])
    ends = np.searchsorted(key, bounds[1:])
    df = (ends - starts).astype(np.int64)
    kept = np.minimum(df, P)
    post_docs = np.zeros((V, P), np.int32)   # pad doc 0 w/ weight 0
    post_w = np.zeros((V, P), np.float32)
    rows = np.repeat(np.arange(V, dtype=np.int64), kept)
    offs = (np.arange(len(rows)) -
            np.repeat(np.cumsum(kept) - kept, kept))
    src = (key[np.repeat(starts, kept) + offs]
           & np.uint64(0xFFFFFFFF)).astype(np.int64)
    post_docs[rows, offs] = all_docs[src]
    post_w[rows, offs] = all_vals[src]
    return post_docs, post_w, int((df - kept).sum())


def invert_to_postings(
    doc_idx: Sequence[np.ndarray], doc_val: Sequence[np.ndarray],
    vocab_size: int, n_postings: int,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """CSR docs -> impact-ordered truncated postings.

    Returns (post_docs [V, P] int32, post_w [V, P] float32, n_truncated).

    Fully vectorized and built for one host core at 10^7-doc scale (540M
    postings, where a two-pass lexsort blows the build budget): every
    posting packs into ONE uint64 — term id (16 bits; the 50K vocab fits),
    complemented float16 impact bits (16; SPLADE impacts are non-negative,
    so float bit patterns compare monotonically), posting position (32) —
    and a single in-place np.sort orders by (term asc, impact desc) while
    carrying the provenance, ~3x faster than argsort + gathers. Impact
    order within a term is float16-approximate: top-P SELECTION at the cap
    boundary can differ for impacts closer than f16 resolution (~0.1%),
    far below the int8 quantization noise; stored values are exact float32
    (recovered through the packed position)."""
    all_terms, all_vals, all_docs = flatten_csr(doc_idx, doc_val)
    return invert_flat(all_terms, all_vals, all_docs, vocab_size,
                       n_postings)


def quantize_postings(post_w: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-term int8 quantization against each term's true max impact
    (NOT slot 0: within-term order is float16-approximate since the
    composite-key build). Returns (q [V,P] int8, scale [V] f32)."""
    scale = np.maximum(post_w.max(axis=1), 1e-6) / 127.0
    q = np.clip(np.round(post_w / scale[:, None]), 0, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def _sorted_segment_topk(rows_d, contrib, k: int):
    """Corpus-size-independent aggregation of gathered postings.

    rows_d [B, T, P] doc ids, contrib [B, T, P] per-posting scores.
    A query's candidate pool is at most E = T*P postings (~2K at the
    two-phase cap P=64), so instead of scatter-adding into a [B, N]
    accumulator — O(N) HBM traffic per batch, the wall at N=10^7 — sort
    the (doc_id, contribution) pairs per query and sum runs of equal ids
    with a segmented scan. O(B*E log E) work, independent of corpus size.
    Returns (scores [B, k], doc_ids [B, k]); missing slots score 0 at doc
    0, matching the scatter kernel's docs-absent-from-postings semantics.
    """
    import jax
    import jax.numpy as jnp

    B = rows_d.shape[0]
    E = rows_d.shape[1] * rows_d.shape[2]
    ids = rows_d.reshape(B, E)
    c = contrib.reshape(B, E).astype(jnp.float32)
    ids, c = jax.lax.sort((ids, c), dimension=-1, num_keys=1)
    edge = ids[:, 1:] != ids[:, :-1]
    one = jnp.ones((B, 1), bool)

    def combine(a, b):  # segmented inclusive cumsum: reset at run starts
        a_start, a_sum = a
        b_start, b_sum = b
        return a_start | b_start, jnp.where(b_start, b_sum, a_sum + b_sum)

    _, seg = jax.lax.associative_scan(
        combine, (jnp.concatenate([one, edge], 1), c), axis=1)
    # a run's inclusive segmented sum at its END is the doc's total score
    scores = jnp.where(jnp.concatenate([edge, one], 1), seg, -jnp.inf)
    vals, pos = jax.lax.top_k(scores, min(k, E))
    out_ids = jnp.take_along_axis(ids, pos, axis=1)
    # slots beyond the distinct-doc count keep val=-inf (id 0): callers can
    # tell fillers from real zero-score docs — two-phase must NOT rescore
    # fillers (each would resurface as a duplicate of doc 0 with doc 0's
    # genuine score), and search_topk's `v > 0` filter drops them.
    return vals, jnp.where(vals > -jnp.inf, out_ids, 0)


def _select_topk_candidates(rows_d, contrib, k: int, approx: bool):
    """Sort-free phase-1 CANDIDATE SELECTION (no per-doc aggregation).

    rows_d [B, T, P] doc ids, contrib [B, T, P] per-posting scores.
    Picks the top-k posting ENTRIES per query by single-posting
    contribution — no sort+segment-sum over the full E = T*P pool — then
    dedups the k survivors with a k-sized single-key id sort. The round-4
    chip profile showed phase-1's E-sized aggregation dominating e2e once
    the match rescore made phase 2 ~free (docs/PHASE0_COST_MODEL.md
    round-4d: 3,777 QPS with sort phase-1 at P=256); since phase-2
    re-scores candidates EXACTLY, aggregated phase-1 scores only affect
    *selection* quality — which a larger candidate pool recovers at the
    now-cheap rescore price.

    Semantics vs _sorted_segment_topk: a doc enters the pool iff one of
    its individual postings ranks in the per-entry top-k (vs its summed
    contribution ranking in the per-doc top-k). With k >= the distinct-doc
    pool both select the same set, so two-phase results are identical
    (tests/test_postings_index.py). Returns (vals, ids) in the same
    contract: duplicate/filler slots are marked val=-inf, id 0 — two-phase
    must not rescore them (they'd resurface as doc-0 duplicates) and
    search_topk's `v > 0` filter drops them.
    """
    import jax
    import jax.numpy as jnp

    B = rows_d.shape[0]
    E = rows_d.shape[1] * rows_d.shape[2]
    ids = rows_d.reshape(B, E)
    c = contrib.reshape(B, E).astype(jnp.float32)
    k = min(k, E)
    if approx and k < E:
        vals, pos = jax.lax.approx_max_k(c, k)
    else:
        vals, pos = jax.lax.top_k(c, k)
    cand = jnp.take_along_axis(ids, pos, axis=1)
    # dedup: sort the k survivors by id, keep each run's first slot.
    # Within a run order is arbitrary — all slots of a doc rescore to the
    # same exact score, so ANY representative is equivalent downstream.
    sid, sval = jax.lax.sort((cand, vals), dimension=-1, num_keys=1)
    first = jnp.concatenate(
        [jnp.ones((B, 1), bool), sid[:, 1:] != sid[:, :-1]], axis=1)
    # contribution <= 0 means a pad query slot (q_val 0) or a padded
    # posting slot — never a real candidate (impacts are positive)
    keep = first & (sval > 0)
    return (jnp.where(keep, sval, -jnp.inf),
            jnp.where(keep, sid, 0))


def _select_sum_topk(rows_d, contrib, k: int, approx: bool,
                     pool_mult: int = 4):
    """Phase-1 CANDIDATE SELECTION by partial sums over a pre-selected
    entry pool — the middle ground between ``_select_topk_candidates``
    (a doc needs one top-k posting; cheap, loses summed-evidence docs:
    −0.066 recall on real vectors, round-4f post-mortem) and
    ``_sorted_segment_topk`` (exact sums over all E entries; the
    E·log E sort is the QPS wall at deep P).

    Picks the top ``pool_mult * k`` entries by single-posting
    contribution (approx_max_k — the TPU-native partial reduction),
    then sorts only that small pool by doc id, segment-sums runs, and
    ranks docs by their PARTIAL sums (sum over selected entries). A doc
    enters iff one posting ranks top-(m·k); it is ranked by all its
    pooled evidence — so selection strictly dominates ``select`` at
    equal k, approaching ``sort`` as m grows, at sort cost O(mk·log mk)
    instead of O(E·log E). Same output contract as the other phase-1
    kernels (fillers: val=-inf, id 0; two-phase must not rescore them).
    """
    import jax
    import jax.numpy as jnp

    B = rows_d.shape[0]
    E = rows_d.shape[1] * rows_d.shape[2]
    ids = rows_d.reshape(B, E)
    c = contrib.reshape(B, E).astype(jnp.float32)
    kp = min(pool_mult * k, E)
    if approx and kp < E:
        vals, pos = jax.lax.approx_max_k(c, kp)
    else:
        vals, pos = jax.lax.top_k(c, kp)
    cand = jnp.take_along_axis(ids, pos, axis=1)
    # pads / non-positive contributions must not form candidate runs:
    # divert them to a sentinel id that sorts last and is filtered below
    valid = vals > 0
    cand = jnp.where(valid, cand, jnp.iinfo(jnp.int32).max)
    vals = jnp.where(valid, vals, 0.0)
    sid, sval = jax.lax.sort((cand, vals), dimension=-1, num_keys=1)
    edge = sid[:, 1:] != sid[:, :-1]
    one = jnp.ones((B, 1), bool)

    def combine(a, b):
        a_start, a_sum = a
        b_start, b_sum = b
        return a_start | b_start, jnp.where(b_start, b_sum, a_sum + b_sum)

    _, seg = jax.lax.associative_scan(
        combine, (jnp.concatenate([one, edge], 1), sval), axis=1)
    is_end = jnp.concatenate([edge, one], 1)
    sentinel = sid == jnp.iinfo(jnp.int32).max
    totals = jnp.where(is_end & ~sentinel, seg, -jnp.inf)
    out_vals, pos2 = jax.lax.top_k(totals, min(k, kp))
    out_ids = jnp.take_along_axis(sid, pos2, axis=1)
    return out_vals, jnp.where(out_vals > -jnp.inf, out_ids, 0)


def postings_score_topk(post_docs, post_w, scale, q_idx, q_val, k: int,
                        n_docs: int, approx: bool, acc_dtype=None,
                        scoring: str = "scatter"):
    """The one postings scoring kernel: gather the query terms' rows,
    int8-dequantized contributions, aggregate per doc, partial top-k.
    Shared by TpuPostingsIndex.search, the serving engine's fused path,
    and the QPS bench — fix scoring here once.

    ``scoring``: "scatter" adds contributions into a [B, n_docs]
    accumulator (O(N) traffic; right when T*P is huge or N is small);
    "sort" aggregates the gathered [B, T*P] postings by sort+segment-sum
    — corpus-size-independent, the short-cap/two-phase fast path;
    "select" skips aggregation entirely (top-k posting ENTRIES, deduped)
    — phase-1-of-two-phase ONLY: its scores are single-posting
    contributions, not doc totals, so they must never be final scores.

    ``acc_dtype`` (scatter only): accumulator dtype. float32 (default)
    for exact scores; bfloat16 halves the dominant [B, N] buffer — use it
    for the candidate phase of two-phase search, where scores are
    discarded after ranking (phase 2 re-scores exactly) and the quantized
    contributions carry at most 7 significant bits anyway.
    """
    import jax
    import jax.numpy as jnp

    if acc_dtype is None:
        acc_dtype = jnp.float32
    rows_d = post_docs[q_idx]                       # [B, T, P] gather
    qw = q_val * scale[q_idx]                       # [B, T]
    if scoring in ("sort", "select", "select_sum"):
        contrib = post_w[q_idx].astype(jnp.float32) * qw[:, :, None]
        if scoring == "select":
            return _select_topk_candidates(rows_d, contrib, k, approx)
        if scoring == "select_sum":
            return _select_sum_topk(rows_d, contrib, k, approx)
        return _sorted_segment_topk(rows_d, contrib, k)
    rows_w = post_w[q_idx].astype(jnp.bfloat16)
    contrib = rows_w * qw[:, :, None].astype(jnp.bfloat16)
    B = q_idx.shape[0]
    acc = jnp.zeros((B, n_docs), acc_dtype)
    b_ix = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None, None], rows_d.shape)
    acc = acc.at[b_ix, rows_d].add(contrib.astype(acc_dtype), mode="drop")
    if approx:
        return jax.lax.approx_max_k(acc, k)
    return jax.lax.top_k(acc, k)


def sparse_query_dense(q_idx, q_val, vocab_size: int):
    """[B, T] sparse query -> [B, V+1] dense (column V: pad terms -> 0).
    Shared by the exact rescore and the cluster-summary phase 1."""
    import jax.numpy as jnp

    B = q_idx.shape[0]
    qd = jnp.zeros((B, vocab_size + 1), jnp.float32)
    return qd.at[jnp.arange(B)[:, None], q_idx].add(q_val)


def exact_rescore(d_terms, d_vals, d_scale, qd, cand):
    """EXACT f32 scores of candidate docs from the doc-major CSR block.

    d_terms [N, M] (uint16/int32, pad id = V -> zero column of qd),
    d_vals [N, M] int8 with per-doc d_scale [N]; qd [B, V+1] dense query;
    cand [B, C] doc ids. Returns scores [B, C]. The one phase-2 kernel,
    shared by the postings two-phase, the cluster index, and the serving
    engine's fused paths."""
    import jax.numpy as jnp

    B = cand.shape[0]
    terms = d_terms[cand].astype(jnp.int32)  # [B, C, M]
    w = d_vals[cand].astype(jnp.float32) * d_scale[cand][:, :, None]
    qv = qd[jnp.arange(B)[:, None, None], terms]                   # [B, C, M]
    return (qv * w).sum(-1)                                        # [B, C]


def resolve_rescore_mode(mode: str = "auto", vmapped: bool = False) -> str:
    """Pick the phase-2 rescore implementation.

    "gather": the original qd[b, terms] element-gather (fast on CPU, where
    scalar gathers are cheap; pathological on TPU — measured ~0.74M
    candidate-rescores/s at 1M docs, docs/PHASE0_COST_MODEL.md).
    "match": the gather-free Pallas equality-match kernel
    (ops/rescore_kernel.py) — the TPU path.
    "match_rows": the match kernel without the [B,C,M]->[B,M,C]
    transpose (candidates on sublanes) — round-5 candidate TPU path.
    "match_xla": the same formulation in plain XLA — used under vmap
    (mesh shard loops), where pallas_call batching is not guaranteed.
    Env SPLADE_RESCORE overrides everything (benchmark A/B switch)."""
    import os

    import jax

    env = os.environ.get("SPLADE_RESCORE", "").lower()
    if env in ("gather", "match", "match_rows", "match_xla"):
        mode = env
    if mode != "auto":
        return mode
    if jax.default_backend() == "tpu":
        return "match_xla" if vmapped else "match"
    return "gather"


def dispatch_rescore(d_terms, d_vals, d_scale, q_idx, q_val, cand,
                     vocab_size: int, mode: str = "auto",
                     vmapped: bool = False, qd=None):
    """The one phase-2 entry point: exact f32 candidate scores via the mode
    chosen by resolve_rescore_mode. All implementations are bit-compatible
    (tests/test_rescore_kernel.py)."""
    mode = resolve_rescore_mode(mode, vmapped)
    if mode == "gather":
        if qd is None:
            qd = sparse_query_dense(q_idx, q_val, vocab_size)
        return exact_rescore(d_terms, d_vals, d_scale, qd, cand)
    from splade_tpu.ops.rescore_kernel import (rescore_match,
                                               rescore_match_rows,
                                               rescore_match_xla)

    if mode == "match":
        return rescore_match(d_terms, d_vals, d_scale, q_idx, q_val, cand)
    if mode == "match_rows":
        return rescore_match_rows(d_terms, d_vals, d_scale, q_idx, q_val,
                                  cand)
    return rescore_match_xla(d_terms, d_vals, d_scale, q_idx, q_val, cand)


def postings_two_phase_topk(post_docs, post_w, scale, d_terms, d_vals,
                            d_scale, q_idx, q_val, k: int, n_docs: int,
                            vocab_size: int, n_candidates: int, approx: bool,
                            phase1_dtype=None, scoring: str = "scatter",
                            rescore: str = "auto", vmapped: bool = False):
    """Two-phase kernel: short-cap postings rank ``n_candidates``, then the
    doc-major CSR re-scores them exactly. Shared by the index and benches.

    Phase-1 scores only pick candidates (phase 2 re-scores in f32), so the
    [B, N] accumulator defaults to bfloat16 — the memory wall at N=10^7 —
    and scoring="sort" removes the [B, N] buffer entirely."""
    import jax
    import jax.numpy as jnp

    if phase1_dtype is None:
        phase1_dtype = jnp.bfloat16
    p1_vals, cand = postings_score_topk(post_docs, post_w, scale, q_idx,
                                        q_val, n_candidates, n_docs, approx,
                                        acc_dtype=phase1_dtype,
                                        scoring=scoring)           # [B, C]
    scores = dispatch_rescore(d_terms, d_vals, d_scale, q_idx, q_val, cand,
                              vocab_size, mode=rescore, vmapped=vmapped)
    # sort-mode phase 1 marks filler slots (beyond the distinct-doc pool)
    # with -inf and doc id 0; rescoring them would duplicate doc 0 with its
    # genuine score, so keep them -inf (scatter-mode vals are finite: no-op)
    scores = jnp.where(p1_vals == -jnp.inf, -jnp.inf, scores)
    # under sort scoring the candidate pool is capped at T*P, which may be
    # smaller than n_candidates — clamp k to what phase 1 actually returned
    vals, pos = jax.lax.top_k(scores, min(k, scores.shape[1]))
    return vals, jnp.take_along_axis(cand, pos, axis=1)


def merge_sharded_topk(vals, idxs, k, shard_size, n_docs,
                       require_positive: bool = False):
    """Merge [D, B, k_local] per-shard exact partial top-ks into a global
    [B, min(k, D*k_local)]: local -> global doc ids, transpose, one
    top_k, then invalid-row masking. The only cross-device traffic on
    the mesh search paths — ONE owner of the cross-shard merge contract,
    shared by MeshShardedPostingsIndex and MeshShardedClusterIndex.

    ``require_positive`` additionally drops 0-score rows: the cluster
    index's pad docs live at local id ``shard_size`` whose GLOBAL id
    collides with a real doc of the next shard, so the id bound alone
    cannot filter them — their 1e-6-scale zero score can.
    """
    import jax
    import jax.numpy as jnp

    D, B, k_local = vals.shape
    idxs = idxs + (jnp.arange(D, dtype=jnp.int32)
                   * shard_size)[:, None, None]
    vals = jnp.transpose(vals, (1, 0, 2)).reshape(B, D * k_local)
    idxs = jnp.transpose(idxs, (1, 0, 2)).reshape(B, D * k_local)
    mvals, mpos = jax.lax.top_k(vals, min(k, D * k_local))
    mids = jnp.take_along_axis(idxs, mpos, axis=1)
    valid = mids < n_docs
    if require_positive:
        valid = valid & (mvals > 0)
    return jnp.where(valid, mvals, 0.0), jnp.where(valid, mids, 0)


def make_mesh_postings_search_fns(n_shards: int, shard_size: int, n_docs: int,
                                  vocab_size: int, n_candidates: int,
                                  approx: bool, acc_dtype, scoring: str):
    """Search bodies for doc-sharded postings under GSPMD: vmap the
    per-shard kernel over the leading shard axis, then merge the [D, B, k]
    partial top-ks (the only cross-device traffic). Shared by
    MeshShardedPostingsIndex and the serving engine's mesh-fused path.
    Returns (search, search_two_phase); two-phase rescoring is exact per
    shard, so the merged scores are exact."""
    import jax
    import jax.numpy as jnp

    D, per, n, V, C = n_shards, shard_size, n_docs, vocab_size, n_candidates

    def search(post_docs, post_w, scale, q_idx, q_val, k):
        k_local = min(k, per)  # a shard can contribute at most `per` docs

        def shard_search(pd, pw, sc):
            return postings_score_topk(pd, pw, sc, q_idx, q_val, k_local,
                                       per, approx, acc_dtype=acc_dtype,
                                       scoring=scoring)

        vals, idxs = jax.vmap(shard_search)(post_docs, post_w, scale)
        # sort scoring caps a shard's output at its T*P pool, which can be
        # below k_local — merge on the width actually returned
        return merge_sharded_topk(vals, idxs, k, per, n)

    def search_two_phase(post_docs, post_w, scale, d_terms, d_vals,
                         d_scale, q_idx, q_val, k):
        # each shard ranks C local candidates and rescores them EXACTLY
        # from its doc-major block; the merge of exact scores is exact
        k_local = min(k, per, C)

        def shard_search(pd, pw, sc, dt, dv, ds):
            return postings_two_phase_topk(
                pd, pw, sc, dt, dv, ds, q_idx, q_val, k_local, per, V, C,
                approx, phase1_dtype=acc_dtype, scoring=scoring,
                vmapped=True)

        vals, idxs = jax.vmap(shard_search)(post_docs, post_w, scale,
                                            d_terms, d_vals, d_scale)
        return merge_sharded_topk(vals, idxs, k, per, n)

    return search, search_two_phase


class TpuPostingsIndex:
    """Impact-ordered truncated postings on device.

    API mirrors TpuImpactIndex where it can (add/add_batch/build/__len__/
    memory_bytes); queries are sparse (indices, values) pairs — use
    ``search_topk`` for batches or ``search_vector`` for one query.
    """

    def __init__(
        self,
        vocab_size: int,
        n_postings: int = 2048,
        query_top_t: int = 32,
        batch_pad: int = 8,
        approx: bool = True,
        rescore_candidates: int = 0,
        phase1_acc: str = "auto",
        scoring: str = "auto",
    ):
        """rescore_candidates > 0 enables two-phase search: phase 1 ranks
        ``rescore_candidates`` candidates from the (short-cap) postings,
        phase 2 re-scores them EXACTLY from a doc-major CSR kept on device.
        The scatter — the single-phase bottleneck — then only runs over the
        short caps (use n_postings≈64), while final scores are exact, so
        recall is limited only by candidate coverage. This is the SEISMIC
        two-level design (reference: neural_sparse_search_aws.py's
        n_postings/heap_factor sweep) mapped to XLA.

        phase1_acc: "f32" | "bf16" | "auto" — dtype of the [B, N] scoring
        accumulator, THE memory wall at N=10^7 (f32 at B=256, N=10^7 is
        10 GB). "auto" = bf16 when two-phase (scores are only used to rank
        candidates; phase 2 re-scores in f32), f32 when single-phase.
        Only used under scatter scoring.

        scoring: "scatter" | "sort" | "select" | "auto" — how gathered
        postings aggregate per doc. "scatter" adds into a [B, N]
        accumulator (O(N) HBM traffic per batch); "sort" sorts the
        [B, T*P] gathered pairs and segment-sums runs — corpus-size-
        INDEPENDENT, the right choice whenever T*P is small (short caps /
        two-phase); "select" skips per-doc aggregation entirely — top-k
        posting ENTRIES by single-posting contribution, deduped — valid
        ONLY with rescore_candidates > 0 (phase-1 scores are then
        selection-only; phase 2 produces the exact finals). "auto" picks
        per backend + pool size (see resolved_scoring)."""
        self.vocab_size = vocab_size
        self.n_postings = n_postings
        self.query_top_t = query_top_t
        self.batch_pad = batch_pad
        self.approx = approx
        self.rescore_candidates = rescore_candidates
        if phase1_acc not in ("auto", "f32", "bf16"):
            raise ValueError(f"phase1_acc: {phase1_acc!r}")
        self.phase1_acc = phase1_acc
        if scoring not in ("auto", "scatter", "sort", "select",
                           "select_sum"):
            raise ValueError(f"scoring: {scoring!r}")
        if scoring in ("select", "select_sum") and not rescore_candidates:
            raise ValueError(
                f"scoring={scoring!r} returns candidate-selection "
                "scores (single-posting contributions / partial sums), "
                "not per-doc totals — it requires the two-phase exact "
                "rescore (rescore_candidates > 0)")
        self.scoring = scoring
        self.doc_ids: List[str] = []
        self.nnz = 0
        # staged CSR (host): per-doc arrays
        self._doc_idx: List[np.ndarray] = []
        self._doc_val: List[np.ndarray] = []
        self._built = None  # (post_docs [V,P] i32, post_w [V,P] i8, scale [V] f32)
        self._doc_major = None  # (terms [N,M] i32, vals [N,M] i8, scale [N] f32)
        self._search_jit = None
        self.truncated_postings = 0  # dropped by the n_postings cap
        self._base_n = 0  # docs covered by _built; the rest are the delta
        self._delta_cache = None
        self._tombstones: set = set()  # deleted doc positions (see delete)
        self._id_pos: Optional[Dict[str, int]] = None

    #: static-k tiers for the jitted base search (see search_topk)
    _K_TIERS = (10, 20, 50, 100, 200, 500, 1000)

    #: LSM-style incremental adds: documents added AFTER build() become a
    #: host-side delta segment scored exactly and merged into results, so
    #: serving never pays a full rebuild (or a fused-jit recompile) per
    #: add — call compact() to fold the delta in. The mesh subclass opts
    #: out (per-shard segments would change shard assignment).
    supports_delta = True

    # ---------------------------------------------------------------- build
    def add(self, doc_id: str, indices: np.ndarray, values: np.ndarray) -> None:
        self.doc_ids.append(doc_id)
        idx = np.asarray(indices, np.int32)
        self._doc_idx.append(idx)
        self._doc_val.append(np.asarray(values, np.float32))
        self.nnz += len(idx)
        if self._id_pos is not None:  # keep the lookup map incremental
            self._id_pos[doc_id] = len(self.doc_ids) - 1
        self._on_add()

    def _on_add(self) -> None:
        if not self.supports_delta:
            self._built = None
        self._delta_cache = None

    def add_batch(self, doc_ids: Sequence[str],
                  vecs: Sequence[Tuple[np.ndarray, np.ndarray]]) -> None:
        for did, (idx, val) in zip(doc_ids, vecs):
            self.add(did, idx, val)

    def add_csr(self, doc_ids: Sequence[str], indices: np.ndarray,
                values: np.ndarray) -> None:
        """Bulk staging: [N, nnz] rectangular term-id/weight blocks (million-
        doc corpora skip the per-doc python loop)."""
        assert len(doc_ids) == len(indices) == len(values)
        start = len(self.doc_ids)
        self.doc_ids.extend(doc_ids)
        self._doc_idx.extend(np.asarray(indices, np.int32))
        self._doc_val.extend(np.asarray(values, np.float32))
        self.nnz += int(np.prod(np.asarray(indices).shape))
        if self._id_pos is not None:
            for i, d in enumerate(doc_ids):
                self._id_pos[d] = start + i
        self._on_add()

    @property
    def delta_count(self) -> int:
        if not self.supports_delta or self._built is None:
            return 0
        return len(self.doc_ids) - self._base_n

    # -------------------------------------------------------- delete/update
    def _positions(self) -> Dict[str, int]:
        """doc_id -> position (last-wins on duplicates), built once and then
        maintained incrementally by add()/add_csr() — delete/update at
        10^7-doc scale must not rebuild the whole map per request."""
        if self._id_pos is None:
            self._id_pos = {d: i for i, d in enumerate(self.doc_ids)}
        return self._id_pos

    def delete(self, doc_ids: Sequence[str]) -> int:
        """Tombstone documents (OpenSearch-style delete): they stop
        appearing in results immediately; compact() reclaims their space.
        Returns the number of documents actually deleted."""
        pos = self._positions()
        hit = [pos[d] for d in doc_ids
               if d in pos and pos[d] not in self._tombstones]
        self._tombstones.update(hit)
        return len(hit)

    def update(self, doc_id: str, indices: np.ndarray,
               values: np.ndarray) -> None:
        """Replace a document's vector: tombstone the old version, stage
        the new one (served from the delta segment until compaction)."""
        self.delete([doc_id])
        self.add(doc_id, indices, values)

    @property
    def deleted_count(self) -> int:
        return len(self._tombstones)

    def compact(self) -> None:
        """Fold the delta segment into the main postings structure and
        physically drop tombstoned documents. Compacting away EVERY
        document leaves a consistent empty index (searches return no
        results; the next add/build repopulates) rather than raising —
        build()'s 'empty index' error is for never-populated indexes."""
        if self._tombstones:
            keep = [i for i in range(len(self.doc_ids))
                    if i not in self._tombstones]
            self.doc_ids = [self.doc_ids[i] for i in keep]
            self._doc_idx = [self._doc_idx[i] for i in keep]
            self._doc_val = [self._doc_val[i] for i in keep]
            self.nnz = int(sum(len(x) for x in self._doc_idx))
            self._tombstones = set()
            self._id_pos = None
        if not self.doc_ids:
            self._built = None
            self._doc_major = None
            self._base_n = 0
            self._delta_cache = None
            self._search_jit = None
            return
        self.build()

    def score_delta(self, q_indices: np.ndarray,
                    q_values: np.ndarray) -> np.ndarray:
        """Exact f32 scores of the delta docs: [B, delta_count] (host-side
        — the delta is small by policy; compact() when it grows)."""
        B = len(q_indices)
        D = self.delta_count
        if D == 0:
            return np.zeros((B, 0), np.float32)
        if getattr(self, "_delta_cache", None) is None:
            terms, q, dscale = self._doc_major_arrays(
                self._doc_idx[self._base_n:], self._doc_val[self._base_n:], D)
            self._delta_cache = (terms.astype(np.int64),
                                 q.astype(np.float32) * dscale[:, None])
        terms, vals = self._delta_cache
        qd = np.zeros((B, self.vocab_size + 1), np.float32)
        for b in range(B):
            np.add.at(qd[b], np.asarray(q_indices[b], np.int64),
                      np.asarray(q_values[b], np.float32))
        return np.einsum("bdm,dm->bd", qd[:, terms], vals, optimize=True)

    def merge_delta(self, out: List[List[Tuple[str, float]]],
                    d_scores: np.ndarray, k: int
                    ) -> List[List[Tuple[str, float]]]:
        """Merge delta-segment scores ([B, delta_count], from score_delta)
        into per-query result lists — the ONE place delta/tombstone merge
        semantics live (used by search_topk and the serving engine)."""
        base_n = self._base_n
        d_ids = self.doc_ids[base_n:]
        tomb = self._tombstones
        for b in range(len(out)):
            extra = [(d_ids[j], float(s))
                     for j, s in enumerate(d_scores[b])
                     if s > 0 and (base_n + j) not in tomb]
            if extra:
                out[b] = sorted(out[b] + extra, key=lambda t: -t[1])[:k]
        return out

    def build(self) -> None:
        import jax

        n = len(self.doc_ids)
        if n == 0:
            raise ValueError("empty index")
        post_docs, post_w, self.truncated_postings = invert_to_postings(
            self._doc_idx, self._doc_val, self.vocab_size, self.n_postings)
        q, scale = quantize_postings(post_w)
        self._built = (jax.device_put(post_docs), jax.device_put(q),
                       jax.device_put(scale))
        if self.rescore_candidates:
            self._doc_major = self._build_doc_major()
        self._base_n = n
        self._delta_cache = None
        self._make_search()
        logger.info(
            "postings index: %d docs, cap P=%d (truncated %.2f%% of "
            "postings), %.0f MB on device",
            n, self.n_postings,
            100.0 * self.truncated_postings / max(self.nnz, 1),
            self.memory_bytes() / 1e6)

    def _doc_major_arrays(self, doc_idx, doc_val, n_rows: int, M: int = 0):
        """Host-side doc-major CSR block: [n_rows, M] term ids (pad id = V,
        which maps to a zero column in the query lookup), int8 weights with
        per-doc scales. Term ids are uint16 when the vocab fits (50K does):
        O(total nnz) memory — ~160 MB at N=10^6, nnz 54; 1.6 GB at 10^7.
        ``n_rows`` may exceed len(doc_idx) (shard padding): extra rows are
        all-pad with score 0."""
        lens = [len(x) for x in doc_idx]
        M = max(M, max(lens, default=1))
        tdtype = np.uint16 if self.vocab_size < 2 ** 16 else np.int32
        if len(doc_idx) == n_rows and lens and min(lens) == M:
            # uniform rows (add_csr bulk path): one stack
            terms = np.stack(doc_idx).astype(tdtype)
            vals = np.stack(doc_val).astype(np.float32)
        else:
            terms = np.full((n_rows, M), self.vocab_size, tdtype)
            vals = np.zeros((n_rows, M), np.float32)
            for i, (ti, tv) in enumerate(zip(doc_idx, doc_val)):
                terms[i, :len(ti)] = ti
                vals[i, :len(tv)] = tv
        dscale = np.maximum(np.abs(vals).max(axis=1), 1e-6) / 127.0
        q = np.clip(np.round(vals / dscale[:, None]), -127, 127).astype(np.int8)
        return terms, q, dscale.astype(np.float32)

    def _build_doc_major(self):
        import jax

        terms, q, dscale = self._doc_major_arrays(
            self._doc_idx, self._doc_val, len(self.doc_ids))
        return (jax.device_put(terms), jax.device_put(q),
                jax.device_put(dscale))

    def _acc_dtype(self):
        import jax.numpy as jnp

        if self.phase1_acc == "bf16":
            return jnp.bfloat16
        if self.phase1_acc == "f32":
            return jnp.float32
        # auto: bf16 is safe when exact rescoring follows; single-phase
        # scores ARE the final scores, keep them f32.
        return jnp.bfloat16 if self.rescore_candidates else jnp.float32

    def resolved_scoring(self) -> str:
        """'scatter' or 'sort' — 'auto' resolves on backend + gathered pool
        size T*P. Measured on v5e (docs/POSTINGS_BENCH.json): sort wins at
        the two-phase short cap (T*P ~2K: 7,096 vs 5,155 QPS at 1M docs,
        7.8x at 10M) AND at deep caps once the match rescore removed the
        dense-qd buffer from the fused program (r4_sort_phase1_c1000_*:
        E=8.4K -> 3,777 vs 3,187 QPS, E=16.9K -> 2,725 vs 2,536; the old
        'E=8K does not finish' observation was the gather rescore poisoning
        the whole program, docs/PHASE0_COST_MODEL.md round-4b). On TPU sort
        is corpus-size-independent and measured-faster through E=16.9K, so
        scatter remains only past 32K where it's unmeasured; off-TPU keep
        the conservative 4096 bound (1-core CPU sorts are the test path,
        not a serving path)."""
        if self.scoring != "auto":
            return self.scoring
        try:
            import jax
            on_tpu = jax.default_backend() == "tpu"
        except Exception:
            on_tpu = False
        bound = 32768 if on_tpu else 4096
        return ("sort" if self.query_top_t * self.n_postings <= bound
                else "scatter")

    # ---------------------------------------------------------------- search
    def _make_search(self) -> None:
        import jax
        import jax.numpy as jnp

        n = len(self.doc_ids)
        approx = self.approx
        V = self.vocab_size
        C = min(self.rescore_candidates, n) if self.rescore_candidates else 0
        acc_dtype = self._acc_dtype()
        scoring = self.resolved_scoring()

        # Arrays are arguments, not closures (closure constants ship inside
        # the remote compile request — HTTP 413 at ~1 GB).
        def search(post_docs, post_w, scale, q_idx, q_val, k):
            return postings_score_topk(post_docs, post_w, scale, q_idx,
                                       q_val, k, n, approx,
                                       acc_dtype=acc_dtype, scoring=scoring)

        def search_two_phase(post_docs, post_w, scale, d_terms, d_vals,
                             d_scale, q_idx, q_val, k):
            return postings_two_phase_topk(
                post_docs, post_w, scale, d_terms, d_vals, d_scale,
                q_idx, q_val, k, n, V, C, approx, phase1_dtype=acc_dtype,
                scoring=scoring)

        if C:
            jitted2 = jax.jit(search_two_phase, static_argnums=8)
            self._search_jit = lambda qi, qv, k: jitted2(
                *self._built, *self._doc_major, qi, qv, k)
        else:
            jitted = jax.jit(search, static_argnums=5)
            self._search_jit = lambda qi, qv, k: jitted(*self._built, qi, qv, k)

    def search_topk(
        self, q_indices: np.ndarray, q_values: np.ndarray, k: int = 10
    ) -> List[List[Tuple[str, float]]]:
        """Batched sparse queries: [B, T] term ids + weights (pad with
        weight 0). T is truncated/padded to ``query_top_t``."""
        import jax.numpy as jnp

        if not self.doc_ids:
            # compacted-to-empty (every doc deleted): no results, no error
            return [[] for _ in range(len(np.asarray(q_indices)))]
        if (self.rescore_candidates and self._tombstones
                and k + len(self._tombstones) > self.rescore_candidates):
            # two-phase clamps the fetch at the candidate pool C, so the
            # tombstone over-fetch cannot cover this many deletes — compact
            # (drops tombstones + rebuilds) for a hard k-results guarantee
            self.compact()
        if self._built is None:
            self.build()
        k = min(k, len(self.doc_ids))
        q_indices = np.asarray(q_indices, np.int32)
        q_values = np.asarray(q_values, np.float32)
        B, T = q_indices.shape
        Tt = self.query_top_t
        if T > Tt:  # keep strongest T terms
            keep = np.argsort(-q_values, axis=1)[:, :Tt]
            q_indices = np.take_along_axis(q_indices, keep, axis=1)
            q_values = np.take_along_axis(q_values, keep, axis=1)
        elif T < Tt:
            q_indices = np.pad(q_indices, ((0, 0), (0, Tt - T)))
            q_values = np.pad(q_values, ((0, 0), (0, Tt - T)))
        pad_b = -B % self.batch_pad
        if pad_b:
            q_indices = np.pad(q_indices, ((0, pad_b), (0, 0)))
            q_values = np.pad(q_values, ((0, pad_b), (0, 0)))
        # the jitted base search only covers the built segment; over-fetch
        # by the tombstone count so deletes don't shrink results below k.
        # k is a STATIC arg of the jitted search: quantize to a tier so a
        # changing tombstone count doesn't recompile per delete (the serving
        # engine does the same via _quantize_k).
        from splade_tpu.utils.text import quantize_to_tier

        k_base = quantize_to_tier(k + len(self._tombstones), self._K_TIERS,
                                  cap=self._base_n)
        vals, idxs = self._search_jit(
            jnp.asarray(q_indices), jnp.asarray(q_values), k_base)
        vals = np.asarray(vals)[:B]
        idxs = np.asarray(idxs)[:B]
        tomb = self._tombstones
        out = [[(self.doc_ids[int(i)], float(v))
                for v, i in zip(vals[b], idxs[b])
                if v > 0 and int(i) not in tomb][:k]
               for b in range(B)]
        if self.delta_count:
            # merge the exactly-scored delta segment (docs added since the
            # last build/compact) into the base results
            d_scores = self.score_delta(q_indices[:B], q_values[:B])
            out = self.merge_delta(out, d_scores, k)
        return out

    def search_vector(
        self, indices: np.ndarray, values: np.ndarray, k: int = 10
    ) -> List[Tuple[str, float]]:
        return self.search_topk(np.asarray(indices)[None],
                                np.asarray(values)[None], k)[0]

    # --------------------------------------------------------- persistence
    #: archive format discriminator — subclasses with a different config
    #: layout MUST override, so loading a cache with the wrong class fails
    #: with a clear message instead of an opaque unpack error
    _SAVE_KIND = "postings"

    def _config_array(self) -> np.ndarray:
        """Index hyperparameters persisted alongside the corpus; paired
        with ``_config_kwargs`` (subclasses override both)."""
        return np.asarray([self.vocab_size, self.n_postings,
                           self.query_top_t, self.rescore_candidates],
                          np.int64)

    def config_summary(self) -> str:
        """Human-readable shape line for operator logs."""
        return (f"n_postings={self.n_postings} "
                f"query_top_t={self.query_top_t} "
                f"rescore={self.rescore_candidates}")

    @classmethod
    def _config_kwargs(cls, cfg: np.ndarray):
        vocab, P, top_t, C = (int(x) for x in cfg)
        return vocab, dict(n_postings=P, query_top_t=top_t,
                           rescore_candidates=C)

    def save(self, path: str) -> None:
        """Persist the staged corpus (CSR + ids + config) so a server
        restart skips corpus re-encoding — the startup cost at million-doc
        scale is the encoder, not the build. Tombstones/delta compact into
        the saved state."""
        from pathlib import Path

        if self._tombstones:
            self.compact()
        lens = np.fromiter((len(x) for x in self._doc_idx), np.int64,
                           count=len(self._doc_idx))
        out = Path(path)
        out.parent.mkdir(parents=True, exist_ok=True)
        tmp = out.with_suffix(out.suffix + ".tmp")
        with open(tmp, "wb") as f:
            np.savez_compressed(
                f,
                # fixed-width unicode, NOT dtype=object: the archive must
                # load with allow_pickle=False (an object array would make
                # --index-cache files a pickle-execution vector)
                doc_ids=np.asarray(self.doc_ids, dtype=np.str_),
                lens=lens,
                terms=np.concatenate(self._doc_idx) if len(lens) else
                np.zeros(0, np.int32),
                vals=np.concatenate(self._doc_val) if len(lens) else
                np.zeros(0, np.float32),
                config=self._config_array(),
                kind=np.asarray(self._SAVE_KIND),
            )
        import os

        os.replace(tmp, out)
        logger.info("saved index corpus (%d docs) -> %s",
                    len(self.doc_ids), path)

    @staticmethod
    def sniff_kind(z) -> str:
        """Archive-kind discriminator for an OPEN npz: the single owner of
        the kind contract (load() and the server's cache dispatch both call
        this). `kind` names the format directly; archives from before the
        field infer it from the config width so the error stays explicit."""
        if "kind" in z.files:
            return str(z["kind"])
        return {4: "postings", 6: "cluster", 7: "cluster"}.get(
            len(z["config"]), "?")

    @classmethod
    def load(cls, path: str, **overrides) -> "TpuPostingsIndex":
        """Restore a saved corpus and build the device structures. Saved
        config (vocab/cap/top-T/rescore) applies unless overridden."""
        try:
            z_ctx = np.load(path, allow_pickle=False)
        except ValueError as e:
            if "pickle" in str(e).lower():
                # Archives written before doc_ids moved to fixed-width
                # unicode stored an object array; loading those would need
                # allow_pickle=True, which executes arbitrary payloads from
                # an untrusted file — refuse with a migration path instead.
                raise ValueError(
                    f"{path} is a legacy index cache (pickled doc_ids). "
                    "Rebuild it once with the current code: load the corpus "
                    "source and call save(), or re-run the indexer; new "
                    "caches load with allow_pickle=False.") from e
            raise
        with z_ctx as z:
            kind = cls.sniff_kind(z)
            if kind != cls._SAVE_KIND:
                raise ValueError(
                    f"{path} is a {kind!r} index cache but "
                    f"{cls.__name__}.load expects {cls._SAVE_KIND!r} — "
                    "load it with the matching index class (server: "
                    f"--index {kind})")
            vocab, kw = cls._config_kwargs(z["config"])
            kw.update(overrides)
            index = cls(vocab, **kw)
            lens = z["lens"]
            bounds = np.cumsum(lens)[:-1]
            index.add_batch(
                [str(d) for d in z["doc_ids"]],
                list(zip(np.split(z["terms"], bounds),
                         np.split(z["vals"], bounds))))
        index.build()
        return index

    # ---------------------------------------------------------------- info
    def max_results(self) -> int:
        """Largest k a search can honor (two-phase caps it at the
        candidate-pool size)."""
        n = len(self.doc_ids)
        return min(n, self.rescore_candidates) if self.rescore_candidates else n

    def __len__(self) -> int:
        return len(self.doc_ids)

    def memory_bytes(self) -> int:
        if self._built is None:
            return 0
        arrays = list(self._built) + list(self._doc_major or ())
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in arrays)


class MeshShardedPostingsIndex(TpuPostingsIndex):
    """Doc-sharded postings over a device mesh.

    Device d holds the postings of its contiguous doc shard (local doc
    numbering); a search runs every shard's gather+scatter+local-top-k in
    parallel under GSPMD and merges the [D, B, k] partial results — the only
    cross-device traffic. Capacity scales linearly with device count
    (v5e-8: ~8M docs at P=2048).

    Same truncation semantics as TpuPostingsIndex, applied per shard (the
    cap is per term PER SHARD, so a D-way index truncates slightly less
    than a single-device one with the same P). Subclassing matters: callers
    (e.g. the serving engine) route on ``isinstance(x, TpuPostingsIndex)``.
    """

    # LSM deltas are shard-agnostic: documents added after build() live in
    # the HOST-side delta segment (scored exactly, merged into results) and
    # deletes are tombstones — neither touches the device shards, so no
    # per-mutation rebuild or fused-jit recompile. Shard assignment only
    # changes at compact(), which folds the delta via a full (re)build.
    # Round 2 disabled this out of caution ("adds would change shard
    # assignment mid-flight"); that concern only ever applied to compaction.
    supports_delta = True

    def __init__(self, vocab_size: int, mesh, n_postings: int = 2048,
                 query_top_t: int = 32, batch_pad: int = 8,
                 approx: bool = True, rescore_candidates: int = 0,
                 phase1_acc: str = "auto", scoring: str = "auto"):
        super().__init__(vocab_size, n_postings=n_postings,
                         query_top_t=query_top_t, batch_pad=batch_pad,
                         approx=approx, rescore_candidates=rescore_candidates,
                         phase1_acc=phase1_acc, scoring=scoring)
        self.mesh = mesh
        self.n_shards = int(mesh.devices.size)

    def max_results(self) -> int:
        """Largest k a search can honor: D shards each rescore at most
        min(rescore_candidates, shard_size) candidates (vs the base class's
        single pool of rescore_candidates)."""
        n = len(self.doc_ids)
        if not self.rescore_candidates:
            return n
        return min(n, self.n_shards *
                   min(self.rescore_candidates, self._shard_size))

    def jit_shardings(self, two_phase: bool):
        """NamedShardings of (*_built, *_doc_major?) in search-arg order —
        the single owner of the array-layout/sharding contract, consumed by
        _make_search and the serving engine's mesh-fused path."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = self.mesh.axis_names[0]
        rep = NamedSharding(self.mesh, P())
        sh3 = NamedSharding(self.mesh, P(axis, None, None))
        sh2 = NamedSharding(self.mesh, P(axis, None))
        arrs = (sh3, sh3, sh2) + ((sh3, sh3, sh2) if two_phase else ())
        return arrs, rep

    def build(self) -> None:
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = len(self.doc_ids)
        if n == 0:
            raise ValueError("empty index")
        D = self.n_shards
        per = -(-n // D)  # ceil: shard size
        self._shard_size = per
        docs_stack, w_stack, scale_stack = [], [], []
        self.truncated_postings = 0
        for d in range(D):
            lo, hi = d * per, min((d + 1) * per, n)
            if lo >= hi:  # empty tail shard
                pd = np.zeros((self.vocab_size, self.n_postings), np.int32)
                pw = np.zeros((self.vocab_size, self.n_postings), np.float32)
                trunc = 0
            else:
                pd, pw, trunc = invert_to_postings(
                    self._doc_idx[lo:hi], self._doc_val[lo:hi],
                    self.vocab_size, self.n_postings)
            q, scale = quantize_postings(pw)
            docs_stack.append(pd)
            w_stack.append(q)
            scale_stack.append(scale)
            self.truncated_postings += trunc
        axis = self.mesh.axis_names[0]
        sh3 = NamedSharding(self.mesh, P(axis, None, None))
        sh2 = NamedSharding(self.mesh, P(axis, None))
        self._built = (
            jax.device_put(np.stack(docs_stack), sh3),
            jax.device_put(np.stack(w_stack), sh3),
            jax.device_put(np.stack(scale_stack), sh2),
        )
        self._base_n = n
        if self.rescore_candidates:
            # per-shard doc-major CSR for exact local rescoring: [D, per, M]
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
        self._make_search()
        logger.info(
            "mesh postings index: %d docs over %d shards (%d/shard), P=%d, "
            "%.0f MB total",
            n, D, per, self.n_postings, self.memory_bytes() / 1e6)

    def _make_search(self) -> None:
        import jax

        per = self._shard_size
        C = min(self.rescore_candidates, per) if self.rescore_candidates else 0
        search, search_two_phase = make_mesh_postings_search_fns(
            n_shards=self.n_shards, shard_size=per, n_docs=len(self.doc_ids),
            vocab_size=self.vocab_size, n_candidates=C, approx=self.approx,
            acc_dtype=self._acc_dtype(), scoring=self.resolved_scoring())

        arrs, rep = self.jit_shardings(two_phase=bool(C))
        if C:
            jitted2 = jax.jit(
                search_two_phase, static_argnums=8,
                in_shardings=arrs + (rep, rep), out_shardings=(rep, rep))
            self._search_jit = lambda qi, qv, k: jitted2(
                *self._built, *self._doc_major, qi, qv, k)
        else:
            jitted = jax.jit(
                search, static_argnums=5,
                in_shardings=arrs + (rep, rep), out_shardings=(rep, rep))
            self._search_jit = lambda qi, qv, k: jitted(*self._built,
                                                        qi, qv, k)


"""Randomized CRUD exactness: the served indexes vs a brute-force reference.

test_serving.py checks well-formedness under concurrent mutation; this
pins EXACTNESS under arbitrary sequential interleavings of add / delete /
update / compact / search. In a lossless configuration (postings: cap >=
live docs; cluster: probes covering every cluster — both rescore exactly
from the doc-major CSR), every search must return the same top-k (ids and
scores) as a dense brute-force dot product over the currently-live
documents — regardless of how the state was reached (base segment + LSM
delta + tombstones + last-wins updates).

Reference semantics being modeled: OpenSearch-style index CRUD
(/root/reference/benchmark/index_manager.py create/delete; bulk indexing
in indexer.py) which the serving tier replaces with an in-process index.
"""

from __future__ import annotations

import numpy as np
import pytest

from splade_tpu.ops.cluster_index import TpuClusterIndex
from splade_tpu.ops.postings_index import TpuPostingsIndex

VOCAB = 64


def _make_index(kind: str):
    if kind == "postings":
        return TpuPostingsIndex(VOCAB, n_postings=128, query_top_t=16,
                                approx=False, batch_pad=1)
    # lossless cluster config: n_probes far above the cluster count the
    # fuzz corpus can ever reach (<=70 docs / G=8 => K<=9; probes clamp
    # to K), so phase 0 candidates always cover every live doc and the
    # exact rescore makes results brute-force-comparable
    return TpuClusterIndex(VOCAB, cluster_size=8, n_probes=32,
                           query_top_t=16, batch_pad=1, approx=False,
                           posting_cap=16, posting_candidates=64)


def _rand_vec(rng):
    n_terms = int(rng.integers(2, 9))
    idx = rng.choice(VOCAB, size=n_terms, replace=False).astype(np.int32)
    val = rng.uniform(0.1, 3.0, size=n_terms).astype(np.float32)
    return idx, val


def _brute_topk(live: dict, q_idx, q_val, k: int):
    qd = np.zeros(VOCAB, np.float32)
    qd[q_idx] = q_val
    scored = []
    for doc_id, (idx, val) in live.items():
        s = float((qd[idx] * val).sum())
        if s > 0:
            scored.append((doc_id, s))
    scored.sort(key=lambda t: (-t[1], t[0]))
    return scored[:k]


@pytest.mark.parametrize("kind", ["postings", "cluster"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_crud_matches_brute_force(seed, kind):
    rng = np.random.default_rng(seed)
    index = _make_index(kind)
    live: dict = {}
    next_id = 0

    # seed corpus so the base segment is non-trivial
    ids, vecs = [], []
    for _ in range(20):
        idx, val = _rand_vec(rng)
        doc_id = f"d{next_id}"
        next_id += 1
        live[doc_id] = (idx, val)
        ids.append(doc_id)
        vecs.append((idx, val))
    index.add_batch(ids, vecs)
    index.build()

    searches = 0
    for op_i in range(60):
        op = rng.choice(["add", "delete", "update", "search", "compact"],
                        p=[0.3, 0.15, 0.15, 0.3, 0.1])
        if op == "add":
            idx, val = _rand_vec(rng)
            doc_id = f"d{next_id}"
            next_id += 1
            live[doc_id] = (idx, val)
            index.add(doc_id, idx, val)
        elif op == "delete" and live:
            doc_id = str(rng.choice(sorted(live)))
            del live[doc_id]
            assert index.delete([doc_id]) == 1
        elif op == "update" and live:
            doc_id = str(rng.choice(sorted(live)))
            idx, val = _rand_vec(rng)
            live[doc_id] = (idx, val)
            index.update(doc_id, idx, val)
        elif op == "compact":
            index.compact()
        else:  # search
            q_idx, q_val = _rand_vec(rng)
            k = int(rng.integers(1, 8))
            got = index.search_vector(q_idx, q_val, k=k)
            want = _brute_topk(live, q_idx, q_val, k)
            assert len(got) == len(want), (op_i, got, want)
            # The base segment stores int8-quantized impacts: scores carry
            # quantization error, so the oracle is tolerance-aware — every
            # returned score must match the brute-force score of ITS OWN
            # id within QTOL, and the returned set may differ from the
            # brute top-k only across a QTOL-wide boundary band (near-ties
            # can legitimately swap). Postings quantize per TERM row
            # (~1% on these vectors); the cluster doc-major CSR quantizes
            # per DOC, so small terms in a wide-range doc see a coarser
            # step (observed up to ~2.3%, bound ~n_terms*max/254/score).
            QTOL = 0.02 if kind == "postings" else 0.06
            brute_all = dict(_brute_topk(live, q_idx, q_val, len(live)))
            for gid, gs in got:
                assert gid in brute_all, (op_i, gid, got, want)
                assert gs == pytest.approx(brute_all[gid], rel=QTOL), (
                    op_i, gid, gs, brute_all[gid])
            if want:
                boundary = want[-1][1]
                got_ids = {d for d, _ in got}
                for gid, _ in got:
                    assert brute_all[gid] >= boundary * (1 - QTOL), (
                        op_i, got, want)
                for wid, ws in want:
                    if ws > boundary * (1 + QTOL):
                        assert wid in got_ids, (op_i, got, want)
            searches += 1
    assert searches >= 10  # the draw actually exercised search


def test_delete_everything_then_readd():
    """Edge: tombstone the whole base segment, then serve only from the
    delta; compaction of an all-deleted index stays sane."""
    rng = np.random.default_rng(7)
    index = TpuPostingsIndex(VOCAB, n_postings=64, query_top_t=16,
                             approx=False, batch_pad=1)
    vecs = [_rand_vec(rng) for _ in range(6)]
    index.add_batch([f"d{i}" for i in range(6)], vecs)
    index.build()
    assert index.delete([f"d{i}" for i in range(6)]) == 6
    q_idx, q_val = vecs[0]
    assert index.search_vector(q_idx, q_val, k=5) == []
    idx, val = _rand_vec(rng)
    index.add("fresh", idx, val)
    got = index.search_vector(idx, val, k=3)
    assert got and got[0][0] == "fresh"
    index.compact()
    got = index.search_vector(idx, val, k=3)
    assert [d for d, _ in got] == ["fresh"]

"""Data layer tests: JSONL loading, fixed-shape collation, sharded iteration."""

import json

import numpy as np
import pytest

from splade_tpu.data import (
    ShardedBatchIterator,
    TripletCollator,
    load_training_data,
)


class FakeTokenizer:
    """Deterministic char-code tokenizer with the HF call signature
    (honors padding='max_length' vs True = pad-to-batch-max)."""

    pad_token_id = 0

    def __call__(self, texts, padding="max_length", truncation=True,
                 max_length=16, return_tensors=None):
        all_codes = [[ord(c) % 97 + 3 for c in t][:max_length] for t in texts]
        width = (max_length if padding == "max_length"
                 else max(max(map(len, all_codes), default=1), 1))
        ids = np.zeros((len(texts), width), np.int64)
        mask = np.zeros((len(texts), width), np.int64)
        for i, codes in enumerate(all_codes):
            ids[i, : len(codes)] = codes
            mask[i, : len(codes)] = 1
        return {"input_ids": ids, "attention_mask": mask}


@pytest.fixture
def jsonl_dir(tmp_path):
    rows0 = [
        {"query": "q0", "positive": "p0", "negative": "n0",
         "teacher_pos_score": 0.9, "teacher_neg_score": 0.2,
         "pair_type": "qa", "difficulty": "hard"},
        {"query": "q1", "positive": "p1", "negative": "n1",
         "teacher_pos_score": 0.8, "teacher_neg_score": 0.1},
    ]
    rows1 = [
        {"query": "q2", "positive": "p2",
         "negatives": ["n2a", "n2b", "n2c"],
         "teacher_pos_score": 0.7, "teacher_neg_scores": [0.3, 0.2, 0.1]},
        {"query": "q3", "positive": "p3", "negatives": ["n3a"],
         "teacher_pos_score": 0.6, "teacher_neg_scores": [0.25]},
        {"bad": "row"},
        {"query": "", "positive": "x"},
    ]
    (tmp_path / "train_000.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows0))
    (tmp_path / "train_001.jsonl").write_text(
        "\n".join(json.dumps(r) for r in rows1))
    return tmp_path


def test_load_training_data_globs_and_filters(jsonl_dir):
    ds = load_training_data(str(jsonl_dir / "train_*.jsonl"))
    assert len(ds) == 4  # two malformed rows skipped
    assert ds[0]["query"] == "q0"
    ds_cap = load_training_data([str(jsonl_dir / "train_*.jsonl")], max_samples=3)
    assert len(ds_cap) == 3


def test_load_training_data_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_training_data(str(tmp_path / "nope_*.jsonl"))


def test_collator_static_shapes_single_neg(jsonl_dir):
    ds = load_training_data(str(jsonl_dir / "train_000.jsonl"))
    col = TripletCollator(FakeTokenizer(), query_max_length=8, doc_max_length=16)
    out = col([ds[0], ds[1]])
    assert out["query_input_ids"].shape == (2, 8)
    assert out["positive_input_ids"].shape == (2, 16)
    assert out["negative_input_ids"].shape == (2, 16)
    assert out["query_input_ids"].dtype == np.int32
    assert out["teacher_pos_scores"].shape == (2,)
    assert out["teacher_neg_scores"].shape == (2, 1)
    assert out["pair_types"] == ["qa", ""]


def test_collator_multi_neg_padding_semantics(jsonl_dir):
    ds = load_training_data(str(jsonl_dir / "train_001.jsonl"))
    tok = FakeTokenizer()
    col = TripletCollator(tok, query_max_length=8, doc_max_length=16,
                          num_hard_negatives=3)
    out = col([ds[0], ds[1]])
    # [B*k, S] flattening.
    assert out["negative_input_ids"].shape == (6, 16)
    # Row 1 has one neg 'n3a' -> repeated to fill k=3 (reference
    # dataloader.py:75-92 pads with the last negative).
    n3a = tok(["n3a"], padding="max_length", max_length=16)["input_ids"][0]
    np.testing.assert_array_equal(out["negative_input_ids"][4], n3a)
    np.testing.assert_array_equal(out["negative_input_ids"][5], n3a)
    # Teacher neg scores repeat likewise.
    np.testing.assert_allclose(out["teacher_neg_scores"][1], [0.25, 0.25, 0.25])
    np.testing.assert_allclose(out["teacher_neg_scores"][0], [0.3, 0.2, 0.1])


def test_collator_empty_neg_scores_list_uses_scalar():
    """A row with teacher_neg_scores=[] plus a scalar teacher_neg_score
    passes the completeness gate AND pads from the scalar — never from a
    fabricated 0.0 (advisor r2: the gate treated [] as falsy but the
    scoring loop only checked None)."""
    col = TripletCollator(FakeTokenizer(), query_max_length=4,
                          doc_max_length=8, num_hard_negatives=2)
    out = col([{"query": "q", "positive": "p", "negative": "n",
                "teacher_pos_score": 0.9, "teacher_neg_scores": [],
                "teacher_neg_score": 0.4}])
    np.testing.assert_allclose(out["teacher_neg_scores"][0], [0.4, 0.4])


def test_collator_no_neg_falls_back_to_positive():
    col = TripletCollator(FakeTokenizer(), query_max_length=4, doc_max_length=8)
    out = col([{"query": "q", "positive": "pos-text"}])
    np.testing.assert_array_equal(
        out["negative_input_ids"], out["positive_input_ids"])


def test_sharded_iterator_partition_and_determinism(jsonl_dir):
    ds = load_training_data(str(jsonl_dir / "train_*.jsonl"))
    ident = lambda rows: [r["query"] for r in rows]
    seen = []
    for p in range(2):
        it = ShardedBatchIterator(ds, ident, batch_size=1, seed=7, epoch=0,
                                  process_index=p, process_count=2,
                                  prefetch_depth=2)
        assert len(it) == 2
        batches = list(it)
        assert batches == list(it)  # deterministic re-iteration
        seen.extend(q for b in batches for q in b)
    assert sorted(seen) == ["q0", "q1", "q2", "q3"]

    it = ShardedBatchIterator(ds, ident, batch_size=1, seed=7, epoch=0,
                              process_index=0, process_count=2)
    first = list(it)
    it.set_epoch(1)
    assert list(it) != first or len(first) <= 1  # epoch reshuffles


def test_sharded_iterator_propagates_worker_errors(jsonl_dir):
    ds = load_training_data(str(jsonl_dir / "train_*.jsonl"))

    def boom(rows):
        raise ValueError("collate failed")

    it = ShardedBatchIterator(ds, boom, batch_size=1, prefetch_depth=2)
    with pytest.raises(ValueError, match="collate failed"):
        list(it)


def test_real_tokenizer_roundtrip_if_available():
    from splade_tpu.utils.tokenizer import create_tokenizer, resolve_tokenizer_path
    from pathlib import Path

    path = resolve_tokenizer_path()
    if not Path(path).exists():
        pytest.skip("no local tokenizer artifact")
    tok = create_tokenizer()
    col = TripletCollator(tok, query_max_length=16, doc_max_length=32)
    out = col([{"query": "한국어 검색", "positive": "스파스 검색 모델", "negative": "무관한 문서"}])
    assert out["query_input_ids"].shape == (1, 16)
    assert out["query_attention_mask"].sum() > 2


def test_length_bucketing():
    col = TripletCollator(FakeTokenizer(), query_max_length=32,
                          doc_max_length=64, length_buckets=(0.25, 0.5, 1.0))
    short = col([{"query": "ab", "positive": "cdef", "negative": "gh"}])
    # longest doc text is 4 chars -> smallest doc bucket (64*0.25=16)
    assert short["positive_input_ids"].shape[1] == 16
    assert short["query_input_ids"].shape[1] == 8  # 32*0.25
    long = col([{"query": "q" * 30, "positive": "p" * 60, "negative": "n"}])
    assert long["positive_input_ids"].shape[1] == 64
    # masks still align with content
    assert short["positive_attention_mask"][0].sum() == 4


def test_stack_microbatches_pads_mixed_buckets():
    from splade_tpu.train.trainer import stack_microbatches

    col = TripletCollator(FakeTokenizer(), query_max_length=32,
                          doc_max_length=64, length_buckets=(0.25, 1.0))
    mb1 = col([{"query": "ab", "positive": "cd", "negative": "ef"}])
    mb2 = col([{"query": "q" * 30, "positive": "p" * 60, "negative": "n" * 60}])
    macro = stack_microbatches([mb1, mb2])
    assert macro["positive_input_ids"].shape == (2, 1, 64)
    # padded region of the short micro-batch is fully masked
    assert macro["positive_attention_mask"][0, 0, 16:].sum() == 0


def test_sharded_iterator_skip_batches_fast_forward(jsonl_dir):
    """set_epoch(skip_batches=k): yields exactly the tail of the epoch and
    never collates the skipped batches (mid-epoch resume must not pay
    tokenization for work already done)."""
    ds = load_training_data(str(jsonl_dir / "train_*.jsonl"))
    collated = []
    def spy(rows):
        out = [r["query"] for r in rows]
        collated.append(out)
        return out

    it = ShardedBatchIterator(ds, spy, batch_size=1, seed=7, epoch=0,
                              prefetch_depth=0)
    full = list(it)
    collated.clear()
    it.set_epoch(0, skip_batches=2)
    tail = list(it)
    assert tail == full[2:]
    assert collated == full[2:]  # skipped batches were never collated
    it.set_epoch(1)  # plain set_epoch resets the skip
    assert len(list(it)) == len(full)


def test_sharded_iterator_pad_when_shorter_than_process_count(jsonl_dir):
    """n < process_count: every process must still see the same batch count
    (a one-slice pad falls short and would deadlock pod collectives)."""
    ds = load_training_data(str(jsonl_dir / "train_*.jsonl"))  # 4 rows
    lens = []
    for p in range(8):
        it = ShardedBatchIterator(ds, lambda r: r, batch_size=1, seed=0,
                                  epoch=0, process_index=p, process_count=8)
        lens.append(len(it))
    assert len(set(lens)) == 1 and lens[0] == 1


def test_sharded_iterator_abandoned_epoch_releases_producer(jsonl_dir):
    """Breaking out of iteration mid-epoch (preemption/max_steps) must not
    leave the prefetch producer blocked on the full queue forever."""
    import threading
    import time as _t

    ds = load_training_data(str(jsonl_dir / "train_*.jsonl"))
    it = ShardedBatchIterator(ds, lambda r: r, batch_size=1, seed=0, epoch=0,
                              prefetch_depth=1)
    before = threading.active_count()
    g = iter(it)
    next(g)
    g.close()  # abandon mid-epoch
    deadline = _t.time() + 5
    while threading.active_count() > before and _t.time() < deadline:
        _t.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_collator_tokenizer_calls_serialized():
    """HF fast tokenizers are not thread-safe ('Already borrowed'); the
    collator serializes every tokenizer call so the prefetch producer and
    the mid-training evaluator can share one tokenizer (the round-5
    max_steps finalization crash)."""
    import threading
    import time as _t

    class ReentrancyProbe(FakeTokenizer):
        def __init__(self):
            self.busy = False
            self.overlaps = 0

        def __call__(self, *a, **kw):
            if self.busy:
                self.overlaps += 1
            self.busy = True
            _t.sleep(0.002)  # widen the race window
            try:
                return super().__call__(*a, **kw)
            finally:
                self.busy = False

    tok = ReentrancyProbe()
    col = TripletCollator(tok, query_max_length=8, doc_max_length=8)
    errs = []

    def worker():
        try:
            for _ in range(20):
                col._tokenize(["가나다", "검색"], 8)
        except Exception as e:  # pragma: no cover - fails the assert below
            errs.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert tok.overlaps == 0, f"{tok.overlaps} concurrent tokenizer entries"

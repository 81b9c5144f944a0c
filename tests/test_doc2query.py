"""doc2query expansion tests (generator is pluggable; T5 wrapper is gated
on a local checkpoint, so tests use a deterministic fake generator)."""

import json

import pytest

from splade_tpu.preprocessing.doc2query import expand_documents, expand_shard


def fake_generator(texts):
    return [[f"{t.split()[0]} 질문 {i}" for i in range(3)] for t in texts]


@pytest.fixture
def shards(tmp_path):
    paths = []
    for s in range(2):
        rows = [{"query": f"q{s}{i}", "positive": f"문서{s}{i} 본문 내용"}
                for i in range(5)]
        p = tmp_path / f"shard{s}.jsonl"
        p.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in rows))
        paths.append(str(p))
    return paths


def test_expand_shard_appends_queries(shards):
    n = expand_shard(shards[0], fake_generator, num_queries=2)
    assert n == 5
    rows = [json.loads(l) for l in open(shards[0], encoding="utf-8")]
    for r in rows:
        assert " [SEP] " in r["positive"]
        # exactly 2 generated queries appended
        tail = r["positive"].split(" [SEP] ")[1]
        assert tail.count("질문") == 2
        assert r["query"].startswith("q0")  # queries untouched


def test_expand_documents_threaded(shards):
    total = expand_documents(shards, fake_generator, num_queries=3, max_workers=2)
    assert total == 10
    for p in shards:
        rows = [json.loads(l) for l in open(p, encoding="utf-8")]
        assert all("[SEP]" in r["positive"] for r in rows)


def test_empty_generation_leaves_doc_unchanged(tmp_path):
    p = tmp_path / "s.jsonl"
    p.write_text(json.dumps({"query": "q", "positive": "본문"}, ensure_ascii=False))
    n = expand_shard(str(p), lambda texts: [[""] for _ in texts])
    assert n == 0
    row = json.loads(p.read_text())
    assert row["positive"] == "본문"

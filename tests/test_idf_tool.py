"""C++ idf_compute tool: build, run, and verify against the HF tokenizer
python reference (same counting unit + smoothing)."""

import json
import math
import subprocess
from pathlib import Path

import numpy as np
import pytest

from splade_tpu.utils.idf import compute_idf, load_idf, triplet_texts

TOOL_DIR = Path(__file__).resolve().parent.parent / "tools" / "idf_compute"


@pytest.fixture(scope="module")
def tool():
    r = subprocess.run(["make", "-C", str(TOOL_DIR)], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return TOOL_DIR / "idf_compute"


@pytest.fixture(scope="module")
def tokenizer():
    from splade_tpu.utils.tokenizer import create_tokenizer, resolve_tokenizer_path

    if not Path(resolve_tokenizer_path()).exists():
        pytest.skip("no local tokenizer artifact")
    return create_tokenizer()


def test_idf_formulas():
    # deterministic token ids: python's str hash is per-process randomized
    # (PYTHONHASHSEED), and `hash(w) % 10` collides between tokens ~28% of
    # the time, silently changing document frequencies -> flaky
    vocab = {"a": 0, "b": 1, "c": 2}

    class Tok:
        def __call__(self, text, **kw):
            return {"input_ids": [vocab[w] for w in text.split()]}

    texts = ["a b", "a", "c"]
    idf, meta = compute_idf(texts, Tok(), 10, mode="bm25")
    assert meta["num_docs"] == 3
    ida = idf[vocab["a"]]
    assert ida == pytest.approx(math.log(1 + (3 - 2 + 0.5) / 2.5))
    idf_std, _ = compute_idf(texts, Tok(), 10, mode="standard")
    assert idf_std[vocab["a"]] == pytest.approx(math.log(3 / 3))


def test_cpp_tool_matches_python_reference(tool, tokenizer, tmp_path):
    rows = [
        {"query": "한국어 검색 모델", "positive": "신경 희소 검색을 위한 문서",
         "negative": "무관한 내용의 텍스트"},
        {"query": "서울 여행 맛집, 추천!", "positive": "서울의 유명한 음식점 목록",
         "negatives": ["부산 여행 정보", "제주도 관광 안내"]},
        {"query": "machine learning 기초", "positive": "머신러닝(ML) 입문 강의: 1장"},
        # adversarial parity rows (code-review findings): NBSP between
        # words (HF = whitespace), fullwidth punctuation ！，, an EMPTY
        # field (must not count as a document), and a >100-char word (HF
        # -> [UNK])
        {"query": "공백 문자 테스트", "positive": "전각！문장，부호 검사",
         "negative": ""},
        {"query": "가" * 120, "positive": "긴 단어 처리"},
    ]
    shard = tmp_path / "train.jsonl"
    shard.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in rows),
                     encoding="utf-8")

    from splade_tpu.utils.tokenizer import resolve_tokenizer_path

    vocab = Path(resolve_tokenizer_path()) / "vocab.txt"
    out = tmp_path / "idf"
    r = subprocess.run(
        [str(tool), "--vocab", str(vocab), "--output", str(out),
         "--mode", "bm25", "--threads", "2", str(shard)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    idf_cpp, meta_cpp = load_idf(str(out))

    texts = triplet_texts([str(shard)])
    assert meta_cpp["num_docs"] == len(texts) == 13
    idf_py, meta_py = compute_idf(texts, tokenizer, meta_cpp["vocab_size"])
    # Document frequencies must match exactly -> identical IDF arrays.
    mismatch = np.flatnonzero(np.abs(idf_cpp - idf_py) > 1e-5)
    assert mismatch.size == 0, (
        f"{mismatch.size} vocab ids differ, e.g. "
        f"{[(int(i), tokenizer.decode([int(i)])) for i in mismatch[:10]]}")
    assert meta_cpp["df_nonzero"] == meta_py["df_nonzero"]


def test_cpp_tool_standard_mode_and_multifile(tool, tokenizer, tmp_path):
    r1 = {"query": "하나", "positive": "둘 셋"}
    r2 = {"query": "넷", "positive": "다섯"}
    (tmp_path / "a.jsonl").write_text(json.dumps(r1, ensure_ascii=False))
    (tmp_path / "b.jsonl").write_text(json.dumps(r2, ensure_ascii=False))
    from splade_tpu.utils.tokenizer import resolve_tokenizer_path

    vocab = Path(resolve_tokenizer_path()) / "vocab.txt"
    out = tmp_path / "idf_std"
    r = subprocess.run(
        [str(tool), "--vocab", str(vocab), "--output", str(out),
         "--mode", "standard", str(tmp_path / "a.jsonl"), str(tmp_path / "b.jsonl")],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    idf, meta = load_idf(str(out))
    assert meta["num_docs"] == 4
    # a never-seen token gets ln(N/1)
    assert idf[0] == pytest.approx(math.log(4.0 / 1.0), rel=1e-6) or meta["df_nonzero"] > 0


@pytest.mark.parametrize("variant", ["tsan", "asan"])
def test_sanitizer_builds_run_clean(variant, tokenizer, tmp_path):
    """Thread/address-sanitized builds process a shard with zero reports
    (the per-thread-accumulate + mutex-merge design is race-free)."""
    r = subprocess.run(["make", "-C", str(TOOL_DIR), f"idf_compute_{variant}"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"{variant} build unavailable: {r.stderr[-200:]}")
    rows = [{"query": f"질문 {i}", "positive": f"문서 본문 {i} 내용"} for i in range(50)]
    shard = tmp_path / "s.jsonl"
    shard.write_text("\n".join(json.dumps(x, ensure_ascii=False) for x in rows),
                     encoding="utf-8")
    from splade_tpu.utils.tokenizer import resolve_tokenizer_path

    vocab = Path(resolve_tokenizer_path()) / "vocab.txt"
    out = tmp_path / "idf"
    r = subprocess.run(
        [str(TOOL_DIR / f"idf_compute_{variant}"), "--vocab", str(vocab),
         "--output", str(out), "--threads", "4", str(shard)],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    assert "WARNING: ThreadSanitizer" not in r.stderr
    assert "ERROR: AddressSanitizer" not in r.stderr
    assert (tmp_path / "idf.bin").exists()

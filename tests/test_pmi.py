"""PMI / co-occurrence / synonym-validation tests (reference test model:
tests/test_pmi.py — matrix construction, smoothing math, validation flow)."""

import math

import numpy as np
import pytest

from splade_tpu.pmi import (
    CooccurrenceBuilder,
    CooccurrenceMatrix,
    PMICalculator,
    PPMICalculator,
    SynonymValidator,
    compute_npmi,
)

CORPUS = [
    "인공지능 검색 모델. 검색 모델 학습.",
    "인공지능 모델 학습. 데이터 수집.",
    "검색 엔진 최적화. 검색 결과 개선.",
    "요리 레시피 모음. 김치 요리 방법.",
]


@pytest.fixture(scope="module")
def cooc():
    return CooccurrenceBuilder(window="sentence", min_count=1).build(CORPUS)


def test_cooccurrence_counts(cooc):
    # '검색'+'모델' co-occur in 2 sentences; symmetric.
    assert cooc.count("검색", "모델") == 2
    assert cooc.count("모델", "검색") == 2
    assert cooc.count("검색", "요리") == 0
    assert cooc.total_docs == 4
    assert cooc.term_freq[cooc.vocab["검색"]] == 4  # 4 sentences contain it


def test_vocab_min_count_and_cap():
    built = CooccurrenceBuilder(window="sentence", min_count=3).build(CORPUS)
    assert "검색" in built.vocab  # appears 4 times
    assert "김치" not in built.vocab  # appears once
    capped = CooccurrenceBuilder(window="sentence", min_count=1, max_vocab=3).build(CORPUS)
    assert len(capped.vocab) == 3


def test_sliding_window():
    built = CooccurrenceBuilder(window=2, min_count=1).build(["a b c d"])
    assert built.count("a", "b") == 1
    assert built.count("b", "c") == 1
    assert built.count("a", "c") == 0  # outside window 2


def test_pmi_smoothing_math(cooc):
    calc = PMICalculator(cooc, smoothing=1.0)
    V = len(cooc.vocab)
    N = cooc.total_windows
    ia, ib = cooc.vocab["검색"], cooc.vocab["모델"]
    p_pair = (cooc.matrix[ia, ib] + 1.0) / (N + V ** 2)
    p_a = (cooc.term_freq[ia] + 1.0) / (N + V)
    p_b = (cooc.term_freq[ib] + 1.0) / (N + V)
    want = math.log(p_pair / (p_a * p_b))
    assert calc.pmi("검색", "모델") == pytest.approx(want)
    # OOV -> None
    assert calc.pmi("검색", "없는말") is None


def test_pmi_matrix_matches_pointwise(cooc):
    calc = PMICalculator(cooc)
    m = calc.pmi_matrix()
    ia, ib = cooc.vocab["검색"], cooc.vocab["모델"]
    assert m[ia, ib] == pytest.approx(calc.pmi("검색", "모델"))
    thr = calc.percentile_threshold(50.0)
    assert np.isfinite(thr)


def test_ppmi_nonnegative(cooc):
    p = PPMICalculator(cooc)
    m = p.pmi_matrix()
    assert (m.data >= 0).all()


def test_npmi_bounds():
    assert compute_npmi(0.0, 0.5) == 0.0
    v = compute_npmi(-math.log(0.1), 0.1)
    assert v == pytest.approx(1.0)


def test_synonym_validator_flow(cooc, tmp_path):
    calc = PMICalculator(cooc)
    val = SynonymValidator(calc, threshold=calc.pmi("검색", "모델") - 0.1,
                           oov_strategy="reject")
    results = val.validate([("검색", "모델"), ("검색", "요리"), ("검색", "없는말")])
    assert results[0].valid
    assert not results[1].valid  # never co-occur -> low PMI
    assert results[2].reason == "oov_rejected"
    stats = val.stats(results)
    assert stats["total"] == 3 and stats["valid"] == 1
    report = val.report(results, str(tmp_path / "report.md"))
    assert "Synonym validation" in report
    assert (tmp_path / "report.md").exists()

    accept = SynonymValidator(calc, oov_strategy="accept")
    assert accept.validate_pair("검색", "없는말").valid


def test_cooccurrence_save_load(cooc, tmp_path):
    cooc.save(str(tmp_path / "cooc"))
    back = CooccurrenceMatrix.load(str(tmp_path / "cooc"))
    assert back.count("검색", "모델") == cooc.count("검색", "모델")
    assert back.total_windows == cooc.total_windows

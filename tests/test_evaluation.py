"""Graded token-level ranking metrics tests (reference §2.8)."""

import numpy as np
import pytest

from splade_tpu.evaluation import (
    EvaluationDataset,
    GradedRelevance,
    ModelComparison,
    RankingMetrics,
    builtin_korean_eval_set,
)


class TokMap:
    all_special_ids = [0]

    def decode(self, ids):
        return {1: "계약", 2: "해지", 3: "사유", 4: "날씨", 0: "<pad>"}.get(ids[0], f"t{ids[0]}")


def test_ranked_tokens_masks_special_and_orders():
    rm = RankingMetrics(TokMap())
    vec = np.array([9.0, 1.0, 3.0, 2.0, 0.0])  # idx0 special, idx4 zero
    ranked = rm.ranked_tokens(vec)
    assert ranked == [("해지", 3.0), ("사유", 2.0), ("계약", 1.0)]


def test_recall_mrr_golden():
    rm = RankingMetrics()
    assert rm.recall_at_k(["a", "b", "c"], ["b", "z"], 2) == pytest.approx(0.5)
    assert rm.mrr(["x", "y", "b"], ["b"]) == pytest.approx(1 / 3)
    assert rm.mrr(["x"], ["b"]) == 0.0


def test_graded_ndcg_golden():
    grades = {"a": 3, "b": 1}
    # ranked [b, a]: DCG = (2^1-1)/log2(2) + (2^3-1)/log2(3)
    dcg = 1 / np.log2(2) + 7 / np.log2(3)
    idcg = 7 / np.log2(2) + 1 / np.log2(3)
    assert RankingMetrics.ndcg(["b", "a"], grades, 10) == pytest.approx(dcg / idcg)
    assert RankingMetrics.ndcg(["a", "b"], grades, 10) == pytest.approx(1.0)
    assert RankingMetrics.ndcg(["z"], {"z": 0}, 10) == 0.0


def test_evaluate_with_domains_and_persistence(tmp_path):
    rm = RankingMetrics(TokMap())
    ds = EvaluationDataset("t")
    ds.add("q1", {"계약": 3, "해지": 2}, domain="legal")
    ds.add("q2", {"날씨": 2}, domain="weather")
    vecs = [np.array([0, 5.0, 4.0, 0, 0]), np.array([0, 0, 0, 0, 2.0])]
    out = rm.evaluate(vecs, ds)
    assert out["legal"]["recall@5"] == pytest.approx(1.0)
    assert out["weather"]["recall@5"] == pytest.approx(1.0)  # idx4 -> 날씨
    assert "overall" in out
    ds.save(str(tmp_path / "ds.json"))
    back = EvaluationDataset.load(str(tmp_path / "ds.json"))
    assert back.items[0].grades == {"계약": 3, "해지": 2}
    assert back.filter_domain("legal").items[0].query == "q1"


def test_model_comparison():
    rng = np.random.default_rng(0)
    a = (0.9 + rng.normal(scale=0.02, size=30)).tolist()
    b = (0.5 + rng.normal(scale=0.02, size=30)).tolist()
    t = ModelComparison.paired_t_test(a, b)
    assert t["p_value"] < 1e-6 and t["mean_diff"] > 0.3
    ci = ModelComparison.bootstrap_ci(a, n_boot=200)
    assert ci["lower"] <= np.mean(a) <= ci["upper"]


def test_builtin_set_shape():
    ds = builtin_korean_eval_set()
    assert len(ds.items) >= 5
    assert set(ds.domains()) >= {"legal", "medical"}

"""Benchmark harness tests: metrics golden values, fusion semantics, BM25,
exact indexes, searchers, and an end-to-end runner on synthetic data."""

import json
import zlib

import numpy as np
import pytest

from splade_tpu.benchmark.bm25 import BM25Index, whitespace_analyzer
from splade_tpu.benchmark.data import BenchmarkData, load_triplet_benchmark
from splade_tpu.benchmark.fusion import LinearFusion, RRFFusion, WeightedRRFFusion, create_fusion
from splade_tpu.benchmark.index import ExactDenseIndex, ExactSparseIndex
from splade_tpu.benchmark.metrics import (
    QueryResult,
    aggregate_metrics,
    bootstrap_ci,
    ndcg_at_k,
    paired_t_test,
)
from splade_tpu.benchmark.runner import BenchmarkRunner
from splade_tpu.benchmark.searchers import create_hybrid_searchers, create_searchers


def qr(retrieved, relevant, qid="q", lat=1.0):
    return QueryResult(qid, list(retrieved), set(relevant), lat)


class TestMetrics:
    def test_hit_rank_and_recall(self):
        r = qr(["a", "b", "c"], {"b"})
        assert r.hit_rank == 2
        results = [qr(["a"], {"a"}), qr(["x", "a"], {"a"}), qr(["x"], {"a"})]
        m = aggregate_metrics(results)
        assert m["recall@1"] == pytest.approx(1 / 3)
        assert m["recall@5"] == pytest.approx(2 / 3)
        assert m["mrr"] == pytest.approx((1 + 0.5 + 0) / 3)

    def test_ndcg_golden(self):
        # one relevant at rank 2 of 1 relevant: DCG=1/log2(3), IDCG=1.
        r = qr(["x", "a"], {"a"})
        assert ndcg_at_k(r, 10) == pytest.approx(1 / np.log2(3))

    def test_paired_t_matches_scipy(self):
        rng = np.random.default_rng(0)
        a = [qr(["a"], {"a"} if rng.random() < 0.7 else {"z"}, qid=str(i))
             for i in range(60)]
        b = [qr(["a"], {"a"} if rng.random() < 0.4 else {"z"}, qid=str(i))
             for i in range(60)]
        got = paired_t_test(a, b)
        from scipy import stats

        xa = [r.reciprocal_rank for r in a]
        xb = [r.reciprocal_rank for r in b]
        want = stats.ttest_rel(xa, xb)
        assert got["t_statistic"] == pytest.approx(want.statistic, rel=1e-6)
        assert got["p_value"] == pytest.approx(want.pvalue, rel=1e-4)

    def test_bootstrap_ci_brackets_mean(self):
        results = [qr(["a"], {"a"}, qid=str(i)) for i in range(30)] + [
            qr(["x"], {"a"}, qid=str(i + 30)) for i in range(10)]
        ci = bootstrap_ci(results, "recall@1", n_boot=200)
        assert ci["lower"] <= 0.75 <= ci["upper"]


class TestFusion:
    def test_rrf_prefers_consensus(self):
        l1 = [("a", 9.0), ("b", 8.0), ("c", 7.0)]
        l2 = [("b", 5.0), ("a", 4.0), ("d", 3.0)]
        fused = RRFFusion(k=60).fuse([l1, l2], top_k=4)
        docs = [d for d, _ in fused]
        assert set(docs[:2]) == {"a", "b"}
        assert fused[0][1] == pytest.approx(1 / 61 + 1 / 62)

    def test_linear_alpha_golden(self):
        l1 = [("a", 2.0), ("b", 1.0)]  # norm: a=1, b=0
        l2 = [("b", 4.0), ("a", 0.0)]  # norm: b=1, a=0
        fused = dict(LinearFusion(0.3).fuse([l1, l2], top_k=2))
        assert fused["a"] == pytest.approx(0.3)
        assert fused["b"] == pytest.approx(0.7)

    def test_weighted_rrf_and_factory(self):
        l1 = [("a", 1.0)]
        l2 = [("b", 1.0)]
        fused = dict(WeightedRRFFusion([0.9, 0.1]).fuse([l1, l2], top_k=2))
        assert fused["a"] > fused["b"]
        assert isinstance(create_fusion("rrf"), RRFFusion)
        assert isinstance(create_fusion("linear", alpha=0.4), LinearFusion)
        with pytest.raises(ValueError):
            create_fusion("nope")


class TestBM25:
    def test_scores_and_ranking(self):
        idx = BM25Index(analyzer=whitespace_analyzer)
        idx.add_documents([
            ("d1", "neural sparse retrieval korean"),
            ("d2", "dense vector retrieval"),
            ("d3", "korean cuisine recipes kimchi"),
        ])
        idx.finalize()
        res = idx.search("korean retrieval", k=3)
        assert res[0][0] == "d1"  # matches both terms
        assert all(s > 0 for _, s in res)

    def test_idf_formula_golden(self):
        # Lucene smoothing: ln(1 + (N - df + .5)/(df + .5))
        idx = BM25Index(analyzer=whitespace_analyzer)
        idx.add_documents([("d1", "x y"), ("d2", "x"), ("d3", "z")])
        idx.finalize()
        assert idx._idf["x"] == pytest.approx(np.log(1 + (3 - 2 + 0.5) / 2.5))
        assert idx._idf["z"] == pytest.approx(np.log(1 + (3 - 1 + 0.5) / 1.5))


class TestKoreanAnalyzers:
    def test_heuristic_strips_josa(self):
        from splade_tpu.benchmark.bm25 import korean_heuristic_analyzer as an

        assert an("한국어는 어렵다") == ["한국어", "어렵다"]
        assert an("검색엔진이 문서를 찾는다") == ["검색엔진", "문서", "찾는다"]
        # non-Korean tokens pass through lowercased, punctuation stripped
        assert an("JAX, rocks!") == ["jax", "rocks"]
        # a bare particle-like syllable is not stripped to empty
        assert an("은 는") == ["은", "는"]

    def test_heuristic_improves_bm25_on_inflected_docs(self):
        """Query with bare nouns must match josa-inflected document forms —
        the regime the nori analyzer wins at (reference:
        index_manager.py:47-79); whitespace matching fails here."""
        from splade_tpu.benchmark.bm25 import korean_heuristic_analyzer

        docs = [("pos", "검색엔진은 문서를 색인한다"),
                ("neg", "김치는 발효 음식이다")]
        q = "검색엔진 문서"
        ws = BM25Index(analyzer=whitespace_analyzer)
        ws.add_documents(docs)
        ws.finalize()
        assert ws.search(q, 2) == []  # no surface-form overlap at all
        ko = BM25Index(analyzer=korean_heuristic_analyzer)
        ko.add_documents(docs)
        ko.finalize()
        res = ko.search(q, 2)
        assert res and res[0][0] == "pos"

    def test_morphological_backend_gating(self):
        from splade_tpu.benchmark.bm25 import make_morphological_analyzer

        for backend in ("auto", "kiwi", "mecab"):
            try:
                make_morphological_analyzer(backend)
            except ImportError as e:
                assert "korean_heuristic_analyzer" in str(e) or "install" in str(e)

    def test_kiwi_backend_path_with_stub(self, monkeypatch):
        """The kiwipiepy code path is executable (VERDICT r2 #5: not dead
        code on hosts without the library): inject a stub module and check
        tag filtering + lowercasing."""
        import sys
        import types

        class Tok:
            def __init__(self, form, tag):
                self.form, self.tag = form, tag

        class FakeKiwi:
            def tokenize(self, text):
                return [Tok("검색", "NNG"), Tok("은", "JX"),
                        Tok("Engine", "SL"), Tok("하", "VV"),
                        Tok("ㅂ니다", "EF"), Tok("3", "SN")]

        mod = types.ModuleType("kiwipiepy")
        mod.Kiwi = FakeKiwi
        monkeypatch.setitem(sys.modules, "kiwipiepy", mod)
        from splade_tpu.benchmark.bm25 import make_morphological_analyzer

        an = make_morphological_analyzer("kiwi")
        # content morphemes kept (noun/verb/foreign/number), josa/endings
        # dropped, latin lowercased — nori stoptags behavior
        assert an("검색은 Engine 합니다 3") == ["검색", "engine", "하", "3"]

    def test_mecab_backend_path_with_stub(self, monkeypatch):
        import sys
        import types

        class FakeTagger:
            def __init__(self, *a):
                pass

            def parse(self, text):
                return ("검색\tNNG,*\n은\tJX,*\nengine\tSL,*\n"
                        "했\tVV+EP,*\n다\tEF,*\nEOS\n")

        mod = types.ModuleType("MeCab")
        mod.Tagger = FakeTagger
        monkeypatch.setitem(sys.modules, "MeCab", mod)
        monkeypatch.setitem(sys.modules, "kiwipiepy", None)
        from splade_tpu.benchmark.bm25 import make_morphological_analyzer

        an = make_morphological_analyzer("mecab")
        out = an("검색은 engine 했다")
        assert "검색" in out and "engine" in out and "은" not in out

    def test_resolve_analyzer(self):
        from splade_tpu.benchmark.bm25 import (
            korean_heuristic_analyzer, resolve_analyzer)

        assert resolve_analyzer("whitespace") is whitespace_analyzer
        assert resolve_analyzer("korean-heuristic") is korean_heuristic_analyzer
        with pytest.raises(ValueError):
            resolve_analyzer("wordpiece")  # needs a tokenizer
        with pytest.raises(ValueError):
            resolve_analyzer("nope")


class TestExactIndexes:
    def test_sparse_exact_dot(self):
        idx = ExactSparseIndex(vocab_size=10)
        idx.add("d1", np.array([1, 3]), np.array([2.0, 1.0]))
        idx.add("d2", np.array([3, 5]), np.array([3.0, 4.0]))
        res = idx.search_vector(np.array([3]), np.array([1.0]), k=2)
        assert res[0] == ("d2", pytest.approx(3.0))
        assert res[1] == ("d1", pytest.approx(1.0))

    def test_sparse_dense_roundtrip_topk(self):
        idx = ExactSparseIndex(vocab_size=8)
        vec = np.array([0, 5.0, 0, 1.0, 3.0, 0, 0, 2.0])
        idx.add_dense("d", vec, top_k=2)
        assert idx.nnz == 2  # kept the top-2 weights (dims 1 and 4)
        res = idx.search_dense(vec, k=1)
        assert res[0][0] == "d"
        assert res[0][1] == pytest.approx(5.0 * 5.0 + 3.0 * 3.0)

    def test_dense_exact(self):
        idx = ExactDenseIndex(3)
        idx.add("a", np.array([1.0, 0, 0]))
        idx.add("b", np.array([0.6, 0.8, 0]))
        res = idx.search(np.array([1.0, 0.0, 0.0]), k=2)
        assert res[0][0] == "a"


class ToyDense:
    """Deterministic dense encoder: hashed bag of chars, normalized."""

    dim = 16

    def encode(self, texts):
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            for c in t:
                out[i, ord(c) % self.dim] += 1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True) + 1e-9
        return out / norms


class ToySparse:
    """Word-hash sparse encoder mimicking the SparseEncoderV33 interface."""

    def __init__(self, vocab_size=64):
        self.V = vocab_size

    def _vec(self, text):
        v = np.zeros(self.V, np.float32)
        for w in text.split():
            # stable hash: builtin hash() is salted per process, which makes
            # word collisions (and recall asserts) PYTHONHASHSEED-flaky
            v[zlib.crc32(w.encode()) % self.V] += 1.0
        nz = np.flatnonzero(v)
        return nz.astype(np.int32), v[nz]

    def encode_documents(self, texts):
        return [self._vec(t) for t in texts]

    def encode_for_query(self, text):
        return self._vec(text)


def synthetic_benchmark(n=24):
    rng = np.random.default_rng(3)
    topics = ["alpha beta", "gamma delta", "epsilon zeta", "eta theta"]
    corpus, queries, qrels = {}, {}, {}
    for i in range(n):
        topic = topics[i % len(topics)]
        corpus[f"d{i}"] = f"{topic} doc{i} " + " ".join(
            rng.choice(["filler", "text", "word"], size=3))
    for i in range(8):
        topic = topics[i % len(topics)]
        queries[f"q{i}"] = topic
        qrels[f"q{i}"] = {f"d{j}" for j in range(n) if j % len(topics) == i % len(topics)}
    return BenchmarkData("synthetic", corpus, queries, qrels)


class TestRunnerEndToEnd:
    def test_full_run_with_all_methods(self, tmp_path):
        data = synthetic_benchmark()
        runner = BenchmarkRunner(
            data, sparse_encoder=ToySparse(), dense_encoder=ToyDense(),
            output_dir=str(tmp_path))
        summary = runner.run()
        # 3 base + 8 hybrids
        assert set(summary) >= {
            "bm25", "neural_sparse", "semantic", "bm25_semantic_rrf",
            "hybrid_rrf", "hybrid_linear_0.3", "hybrid_linear_0.4",
            "hybrid_linear_0.5", "hybrid_weighted_rrf", "bm25_sparse_rrf",
            "triple_rrf"}
        # Topic words are discriminative: every method should find them.
        assert summary["bm25"]["recall@1"] == 1.0
        assert summary["neural_sparse"]["recall@1"] == 1.0
        tests = runner.statistical_tests()
        runner.save(summary, tests)
        assert (tmp_path / "report.md").exists()
        m = json.loads((tmp_path / "metrics.json").read_text())
        assert m["dataset"] == "synthetic"
        assert "neural_sparse vs bm25" in m["statistical_tests"]

    def test_postings_index_method_row(self, tmp_path):
        """--postings-index adds the production serving-config row
        (P=256/C=1000/sort/match — VERDICT r4 #8) next to the exact
        neural_sparse row, and on discriminative fixtures it matches."""
        data = synthetic_benchmark()
        runner = BenchmarkRunner(
            data, sparse_encoder=ToySparse(), postings_index=True,
            output_dir=str(tmp_path))
        summary = runner.run()
        assert "neural_sparse_postings" in summary
        assert (summary["neural_sparse_postings"]["recall@1"]
                == summary["neural_sparse"]["recall@1"])

    def test_external_dense_model_and_cross_model_hybrids(self, tmp_path):
        """PrecomputedDenseEncoder joins as a 4th model with cross-model
        fusions (reference comprehensive-benchmark / Bedrock Titan path)."""
        from splade_tpu.benchmark.encoders import PrecomputedDenseEncoder

        data = synthetic_benchmark()
        texts = list(data.corpus.values()) + list(data.queries.values())
        emb = ToyDense().encode(texts) + 0.01  # a "different" external model
        path = tmp_path / "titan.npz"
        PrecomputedDenseEncoder.save_embeddings(str(path), texts, emb)
        ext = PrecomputedDenseEncoder(str(path))
        # lookup round-trips and normalizes
        got = ext.encode(texts[:3])
        np.testing.assert_allclose(np.linalg.norm(got, axis=1), 1.0, rtol=1e-5)
        with pytest.raises(KeyError):
            ext.encode(["never embedded"])

        runner = BenchmarkRunner(
            data, sparse_encoder=ToySparse(), dense_encoder=ToyDense(),
            external_dense_encoder=ext, output_dir=str(tmp_path))
        summary = runner.run()
        assert {"external_dense", "sparse_external_rrf", "dual_dense_rrf",
                "quad_rrf"} <= set(summary)
        assert summary["external_dense"]["recall@1"] > 0

    def test_query_failure_degrades_gracefully(self, tmp_path):
        data = synthetic_benchmark()

        class Bomb(ToySparse):
            def encode_for_query(self, text):
                raise RuntimeError("encoder down")

        runner = BenchmarkRunner(data, sparse_encoder=Bomb(),
                                 include_hybrid=False, output_dir=str(tmp_path))
        summary = runner.run()
        assert summary["neural_sparse"]["recall@1"] == 0.0  # empty results
        assert summary["bm25"]["recall@1"] > 0


def test_triplet_benchmark_construction(tmp_path):
    rows = [{"query": f"q{i}", "positive": f"pos text {i}",
             "negative": f"neg text {i}", "difficulty": "hard" if i % 2 else "easy"}
            for i in range(10)]
    f = tmp_path / "val.jsonl"
    f.write_text("\n".join(json.dumps(r) for r in rows))
    data = load_triplet_benchmark(str(f), sample_size=6, seed=42)
    assert len(data.queries) == 6
    for qid, rel in data.qrels.items():
        assert len(rel) == 1 and next(iter(rel)).endswith("_pos")
    assert len(data.corpus) == 12  # pos + neg per sampled triplet


def test_end_to_end_trained_tiny_model_beats_random(tmp_path):
    """Train the tiny SPLADE on synthetic triplets, then verify the trained
    encoder ranks positives above random on a held-out benchmark — the whole
    train->encode->index->search->metrics chain."""
    import jax
    import jax.numpy as jnp

    from splade_tpu.benchmark.encoders import SparseEncoderV33
    from splade_tpu.config.v33 import V33Config
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder
    from splade_tpu.train.trainer import Trainer
    from splade_tpu.data.collator import TripletCollator
    from test_data import FakeTokenizer

    class FakeTok(FakeTokenizer):
        all_special_ids = [0, 511]

        def __len__(self):
            return 512

        def get_vocab(self):
            return {}

        def __call__(self, texts, padding=None, truncation=None,
                     max_length=16, return_tensors=None, add_special_tokens=True):
            return super().__call__(texts, padding, truncation, max_length,
                                    return_tensors)

    rng = np.random.default_rng(11)
    topics = [f"topic{t} kw{t}a kw{t}b" for t in range(4)]
    samples = []
    for i in range(192):
        t = i % 4
        samples.append({
            "query": topics[t],
            "positive": topics[t] + f" body{i}",
            "negative": topics[(t + 1) % 4] + f" body{i}",
        })

    mcfg = ModernBertConfig.tiny(num_hidden_layers=2)
    model = SpladeEncoder(mcfg, pool_impl="streamed", pool_tile=128)
    tok = FakeTok()
    collator = TripletCollator(tok, query_max_length=12, doc_max_length=16)
    cfg = V33Config.from_dict({
        "data": {"batch_size": 4, "query_max_length": 12, "doc_max_length": 16},
        "loss": {"flops_warmup_steps": 20, "lambda_q": 1e-4, "lambda_d": 1e-4},
        "training": {"num_epochs": 3, "gradient_accumulation_steps": 1,
                     "learning_rate": 3e-3, "log_every_n_steps": 10,
                     "save_every_n_epochs": 99, "eval_every_n_epochs": 99,
                     "output_dir": str(tmp_path / "run")},
    })
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    trainer = Trainer(cfg, model, params, samples, collator)
    state = trainer.train()

    enc = SpladeEncoderV33 = SparseEncoderV33(
        model, state.params, tok, query_max_length=12, doc_max_length=16,
        batch_size=8, query_top_k=32, filter_special=False)
    corpus = {f"d{t}": topics[t] + " unique document" for t in range(4)}
    queries = {f"q{t}": topics[t] for t in range(4)}
    qrels = {f"q{t}": {f"d{t}"} for t in range(4)}
    data = BenchmarkData("tiny", corpus, queries, qrels)
    runner = BenchmarkRunner(data, sparse_encoder=enc, include_hybrid=False,
                             output_dir=str(tmp_path / "bench"))
    summary = runner.run()
    assert summary["neural_sparse"]["recall@1"] >= 0.75


def test_query_top_k_zero_keeps_full_vector():
    """--query-top-k 0 must disable the reference's top-64 truncation:
    encode_queries returns every positive dimension (needed when a model's
    query nnz exceeds 64, e.g. early-training checkpoints)."""
    import jax
    import jax.numpy as jnp

    from splade_tpu.benchmark.encoders import SparseEncoderV33
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder
    from test_data import FakeTokenizer

    class FakeTok(FakeTokenizer):
        all_special_ids = [0, 511]

        def __len__(self):
            return 512

        def get_vocab(self):
            return {}

        def __call__(self, texts, padding=None, truncation=None,
                     max_length=16, return_tensors=None, add_special_tokens=True):
            return super().__call__(texts, padding, truncation, max_length,
                                    return_tensors)

    mcfg = ModernBertConfig.tiny(num_hidden_layers=2)
    model = SpladeEncoder(mcfg, pool_impl="streamed", pool_tile=128)
    tok = FakeTok()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    texts = ["alpha beta gamma", "delta epsilon"]
    full = SparseEncoderV33(model, params, tok, query_max_length=12,
                            batch_size=4, query_top_k=0, filter_special=False)
    trunc = SparseEncoderV33(model, params, tok, query_max_length=12,
                             batch_size=4, query_top_k=3, filter_special=False)
    fv = full.encode_queries(texts)
    tv = trunc.encode_queries(texts)
    for (f_idx, f_val), (t_idx, t_val) in zip(fv, tv):
        assert len(t_idx) <= 3
        assert len(f_idx) >= len(t_idx)
        # the truncated vector is a subset of the full one
        fmap = dict(zip(f_idx.tolist(), f_val.tolist()))
        for i, v in zip(t_idx.tolist(), t_val.tolist()):
            assert abs(fmap[i] - v) < 1e-5


def test_encoding_cache_roundtrip(tmp_path):
    data = synthetic_benchmark()
    runner = BenchmarkRunner(data, sparse_encoder=ToySparse(),
                             include_hybrid=False, output_dir=str(tmp_path))
    runner.setup()
    enc_path = str(tmp_path / "enc.npz")
    runner.save_encodings(enc_path)

    class Bomb(ToySparse):
        def encode_documents(self, texts):
            raise AssertionError("should reuse cached encodings")

    runner2 = BenchmarkRunner(data, sparse_encoder=Bomb(),
                              include_hybrid=False, output_dir=str(tmp_path))
    runner2.load_encodings(enc_path)
    summary = runner2.run()
    assert summary["neural_sparse"]["recall@1"] == 1.0


def test_legacy_config_validate():
    from splade_tpu.config.legacy import LegacyLossConfig, LegacyTrainConfig

    assert LegacyTrainConfig().validate() == []
    bad = LegacyTrainConfig(batch_size=0)
    bad.loss.temperature = -1
    bad.loss.lambda_infonce = 0
    bad.loss.lambda_margin = 0
    problems = bad.validate()
    assert any("batch_size" in p for p in problems)
    assert any("temperature" in p for p in problems)
    assert any("ranking loss" in p for p in problems)


def test_rrf_missing_doc_penalty_is_order_symmetric():
    """A doc first seen in a LATER list must still pay every earlier
    list's missing-doc penalty: fused scores are invariant to the order
    result lists are passed (found by review: the one-pass form skewed
    rankings toward docs from earlier-listed searchers)."""
    l1, l2 = [("A", 1.0)], [("B", 1.0)]
    f = RRFFusion(k=60)
    ab = dict(f.fuse([l1, l2], top_k=4))
    ba = dict(f.fuse([l2, l1], top_k=4))
    assert ab == ba
    # both docs: one rank-1 contribution + the shared penalty rank
    # max(len+1, 100) = 100 (reference score_fusion.py:79-83)
    assert ab["A"] == pytest.approx(1 / 61 + 1 / 160)
    assert ab["B"] == pytest.approx(1 / 61 + 1 / 160)
    # weighted variant shares the penalty semantics
    w = dict(WeightedRRFFusion([0.5, 0.5]).fuse([l1, l2], top_k=4))
    assert w["A"] == pytest.approx(0.5 / 61 + 0.5 / 160)


def test_bootstrap_ci_metrics_variants():
    rng = __import__("random").Random(0)
    results = [
        QueryResult(f"q{i}", [f"d{i}" if rng.random() < 0.6 else "x"],
                    {f"d{i}"}, latency_ms=rng.random() * 10)
        for i in range(100)
    ]
    for metric in ("recall@1", "mrr", "ndcg@10", "latency_p50_ms"):
        ci = bootstrap_ci(results, metric, n_boot=100)
        assert ci["lower"] <= ci["mean"] <= ci["upper"]
    with pytest.raises(ValueError):
        bootstrap_ci(results, "nope")

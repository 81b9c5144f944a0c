"""Preprocessing tier tests: cleaners, dedup, converters, miners, pipeline."""

import json

import numpy as np
import pytest

from splade_tpu.preprocessing import (
    ExactDeduplicator,
    KoreanTextCleaner,
    MinHashDeduplicator,
    PipelineConfig,
    PreprocessingPipeline,
    RawSample,
    Triplet,
)
from splade_tpu.preprocessing.converters import get_converter
from splade_tpu.preprocessing.miners import EncoderHardNegativeMiner, TfidfHardNegativeMiner


class TestCleaner:
    def test_normalize_strips_urls_html_email(self):
        c = KoreanTextCleaner()
        out = c.normalize("한국어  텍스트 https://x.co/a <b>tag</b> a@b.com 끝")
        assert "http" not in out and "<b>" not in out and "@" not in out
        assert "  " not in out

    def test_hangul_ratio_filter(self):
        c = KoreanTextCleaner(min_hangul_ratio=0.5)
        assert c.clean("this is english only text") is None
        assert c.clean("한국어 비율이 높은 문장입니다") is not None

    def test_special_char_filter_and_length(self):
        c = KoreanTextCleaner(max_special_char_ratio=0.2, min_length=5)
        assert c.clean("@@@###!!! 한국") is None
        assert c.clean("짧다") is None
        assert c.stats.seen == 2 and c.stats.kept == 0


class TestDedup:
    def test_exact(self):
        d = ExactDeduplicator()
        assert not d.is_duplicate("같은 문장")
        assert d.is_duplicate("같은 문장")
        assert d.is_duplicate(" 같은 문장 ")  # normalized

    def test_minhash_near_duplicates(self):
        d = MinHashDeduplicator(threshold=0.7)
        base = "한국어 신경 희소 검색 모델을 위한 학습 데이터 구축 파이프라인"
        assert not d.is_duplicate(base)
        assert d.is_duplicate(base + "!")  # near-identical
        assert not d.is_duplicate("완전히 다른 주제의 요리 레시피 모음집입니다")

    def test_minhash_jaccard_estimate_sane(self):
        d = MinHashDeduplicator()
        s1 = d.signature("가나다라마바사아자차")
        s2 = d.signature("가나다라마바사아자차")
        assert d.jaccard_estimate(s1, s2) == 1.0
        s3 = d.signature("zzzz completely different")
        assert d.jaccard_estimate(s1, s3) < 0.3


class TestConverters:
    def test_nli(self):
        samples = [
            RawSample("t", "nli", {"premise": "P1", "hypothesis": "E1", "label": "entailment"}),
            RawSample("t", "nli", {"premise": "P1", "hypothesis": "C1", "label": "contradiction"}),
            RawSample("t", "nli", {"premise": "P1", "hypothesis": "N1", "label": "neutral"}),
        ]
        out = get_converter("nli").convert(samples)
        assert len(out) == 1
        assert out[0].query == "P1" and out[0].positive == "E1" and out[0].negative == "C1"

    def test_sts_thresholds(self):
        samples = [
            RawSample("t", "sts", {"sentence1": "A", "sentence2": "B", "score": 4.5}),
            RawSample("t", "sts", {"sentence1": "C", "sentence2": "D", "score": 1.0}),
            RawSample("t", "sts", {"sentence1": "E", "sentence2": "F", "score": 3.0}),
        ]
        out = get_converter("sts").convert(samples)
        assert len(out) == 1
        assert (out[0].query, out[0].positive, out[0].negative) == ("A", "B", "D")

    def test_sts_scale_autodetect_guards(self):
        from splade_tpu.preprocessing.converters import STSConverter

        def mk(scores):
            return [RawSample("t", "sts",
                              {"sentence1": f"A{i}", "sentence2": f"B{i}",
                               "score": s})
                    for i, s in enumerate(scores)]

        # a SMALL all-low batch of a genuine 0-5 dataset (all-dissimilar
        # shard) must NOT be rescaled into positives
        small_low = mk([1.0, 0.0, 1.0])
        assert STSConverter().convert(small_low) == []
        # nor a large batch whose scores are all integers 0/1 (no
        # fractional evidence of a normalized scale)
        int_low = mk([1.0, 0.0] * 15)
        assert STSConverter().convert(int_low) == []
        # a real normalized batch (large, fractional) IS rescaled
        norm = mk([0.95, 0.1, 0.9] * 10)
        out = STSConverter().convert(norm)
        assert len(out) == 20  # 0.95 and 0.9 -> 4.75/4.5 >= 4.0
        # explicit flag overrides autodetect in both directions
        assert STSConverter(normalized=True).convert(small_low) != []
        assert STSConverter(normalized=False).convert(norm) == []

    def test_classification_pairs_same_label(self):
        samples = [RawSample("t", "classification", {"text": f"t{lab}{i}", "label": lab})
                   for lab in ("x", "y") for i in range(3)]
        out = get_converter("classification").convert(samples)
        assert all(t.negative for t in out)
        assert any(t.query == "tx0" and t.positive == "tx1" for t in out)

    def test_qa_and_dialog_and_pair(self):
        qa = get_converter("qa").convert(
            [RawSample("t", "qa", {"question": "Q?", "context": "CTX"})])
        assert qa[0].query == "Q?" and qa[0].positive == "CTX"
        dl = get_converter("dialog").convert(
            [RawSample("t", "dialog", {"instruction": "I", "output": "O"})])
        assert dl[0].positive == "O"
        pr = get_converter("pair").convert(
            [RawSample("t", "pair", {"query": "q", "positive": "p", "negative": "n"})])
        assert pr[0].negative == "n"


class TestTfidfMiner:
    def test_mines_lexically_similar_negative(self):
        corpus = [
            "서울 여행 맛집 추천 가이드",
            "부산 여행 숙소 추천 정보",
            "파이썬 프로그래밍 입문 강의",
            "머신러닝 모델 학습 방법",
        ]
        miner = TfidfHardNegativeMiner(top_k=2)
        mined = miner.mine(["서울 여행 일정 추천"], corpus)
        # the lexically closest docs are the travel ones
        assert set(mined[0][:2]) <= {0, 1}

    def test_fill_missing_negatives_atomic(self, tmp_path):
        rows = [
            {"query": "서울 여행 추천", "positive": "서울 여행 맛집 가이드"},
            {"query": "파이썬 학습", "positive": "파이썬 프로그래밍 강의",
             "negative": "이미 있음"},
        ]
        p = tmp_path / "shard.jsonl"
        p.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in rows))
        corpus = [r["positive"] for r in rows] + ["부산 여행 숙소 정보"]
        n = TfidfHardNegativeMiner(top_k=3).fill_missing_negatives(str(p), corpus)
        assert n == 1
        back = [json.loads(l) for l in p.read_text().splitlines()]
        assert back[0]["negative"] and back[0]["negative"] != back[0]["positive"]
        assert back[1]["negative"] == "이미 있음"


class ToyEmb:
    def encode(self, texts):
        out = np.zeros((len(texts), 16), np.float32)
        for i, t in enumerate(texts):
            for w in t.split():
                out[i, hash(w) % 16] += 1.0
        return out


class TestEncoderMiner:
    def test_band_and_rank_window(self):
        corpus = ["a b c", "a b d", "x y z", "a c e", "p q r"]
        queries = ["a b q"]
        m = EncoderHardNegativeMiner(ToyEmb())
        band = m.mine_band(queries, corpus, min_score=0.1, max_score=0.95, k=3)
        assert band[0]  # finds mid-similarity docs
        window = m.mine_rank_window(queries, corpus, positives=["a b c"],
                                    rank_lo=1, rank_hi=4, k=2)
        assert "a b c" not in [corpus[j] for j in window[0]]


class TestPipeline:
    def test_end_to_end_with_injected_samples(self, tmp_path):
        rng = np.random.default_rng(5)
        words = ("검색 모델 학습 서울 부산 여행 음식 역사 과학 기술 의료 법률 "
                 "경제 주식 음악 영화 스포츠 날씨 환경 교육").split()
        samples = []
        for i in range(30):
            q = " ".join(rng.choice(words, size=5, replace=False))
            c = " ".join(rng.choice(words, size=8, replace=False))
            samples.append(RawSample("synth", "qa", {
                "question": f"{q} 질문", "context": f"{c} 문서 본문"}))
        # exact duplicate of the first row, to be removed
        samples.append(RawSample("synth", "qa", dict(samples[0].fields)))
        # non-korean junk to be cleaned
        samples.append(RawSample("synth", "qa", {
            "question": "english only question",
            "context": "english only context"}))
        cfg = PipelineConfig(output_dir=str(tmp_path / "out"),
                             shard_size=20, train_val_split=0.8, min_length=4)
        pipe = PreprocessingPipeline(cfg, miner=EncoderHardNegativeMiner(ToyEmb()))
        meta = pipe.run(samples=samples)
        assert meta["converted"] == 32
        assert meta["after_clean"] == 31      # english dropped
        assert meta["after_dedup"] == 30      # dup dropped
        assert meta["train"] + meta["val"] == 30
        out = tmp_path / "out"
        assert (out / "train_shard_000.jsonl").exists()
        assert (out / "val.jsonl").exists()
        meta2 = json.loads((out / "metadata.json").read_text())
        assert meta2["with_negative"] > 0  # miner filled some
        # shards parse as valid triplets
        row = json.loads((out / "train_shard_000.jsonl").read_text().splitlines()[0])
        assert row["query"] and row["positive"]


class TestTermPairs:
    """MUSE/Wikidata/Wikipedia term-pair mining (reference:
    collect_term_data_v19.py) — parsers, filtering, cache gating."""

    def test_parse_muse_both_directions(self):
        from splade_tpu.preprocessing.term_pairs import parse_muse_lines

        ko_first = ["서버 server", "검색 search", "bad", "x y"]
        got = parse_muse_lines(ko_first, "ko")
        assert {(p["ko"], p["en"]) for p in got} == {("서버", "server"),
                                                    ("검색", "search")}
        en_first = ["server 서버", "Search 검색엔진"]
        got = parse_muse_lines(en_first, "en")
        assert {(p["ko"], p["en"]) for p in got} == {("서버", "server"),
                                                    ("검색엔진", "search")}
        assert all(p["source"] == "muse" for p in got)

    def test_parse_wikidata_bindings(self):
        from splade_tpu.preprocessing.term_pairs import parse_wikidata_bindings

        payload = {"results": {"bindings": [
            {"koLabel": {"value": "데이터베이스"},
             "enLabel": {"value": "Database"}},
            {"koLabel": {"value": "서버 (컴퓨터)"},
             "enLabel": {"value": "Server (computing)"}},
            {"koLabel": {"value": "no korean"},
             "enLabel": {"value": "nothing"}},
        ]}}
        got = parse_wikidata_bindings(payload)
        assert {(p["ko"], p["en"]) for p in got} == {
            ("데이터베이스", "database"), ("서버", "server")}

    def test_parse_wikipedia_langlinks(self):
        from splade_tpu.preprocessing.term_pairs import parse_wikipedia_langlinks

        payload = {"query": {"pages": {
            "1": {"title": "알고리즘",
                  "langlinks": [{"lang": "en", "*": "Algorithm"},
                                {"lang": "ja", "*": "アルゴリズム"}]},
            "2": {"title": "English title", "langlinks": [
                {"lang": "en", "*": "Ignored"}]},
            "3": {"title": "링크없음"},
        }}}
        got = parse_wikipedia_langlinks(payload)
        assert got == [{"ko": "알고리즘", "en": "algorithm",
                        "source": "wikipedia"}]

    def test_filter_and_dedup_accounting(self):
        from splade_tpu.preprocessing.term_pairs import filter_and_deduplicate

        pairs = [
            {"ko": "서버", "en": "server", "source": "a"},
            {"ko": "서버", "en": "Server", "source": "b"},     # dup (case)
            {"ko": "짧", "en": "server", "source": "a"},       # ko too short
            {"ko": "서버", "en": "s", "source": "a"},          # en too short
            {"ko": "서버" * 20, "en": "server", "source": "a"},  # ko too long
            {"ko": "abcd", "en": "server", "source": "a"},     # no korean
            {"ko": "서버", "en": "ABCDEFGH", "source": "a"},   # long all-caps
            {"ko": "서버", "en": "a-", "source": "a"},         # <2 letters
        ]
        unique, rejected = filter_and_deduplicate(pairs)
        assert len(unique) == 1 and unique[0]["ko"] == "서버"
        for reason in ("ko_too_short", "en_too_short", "ko_too_long",
                       "no_korean", "invalid_english", "en_no_letters",
                       "duplicates"):
            assert rejected[reason] == 1, reason

    def test_collectors_use_local_cache(self, tmp_path, monkeypatch):
        import json as _json

        from splade_tpu.preprocessing.term_pairs import (
            collect_muse, collect_wikidata, collect_wikipedia)

        root = tmp_path / "terms"
        (root / "muse").mkdir(parents=True)
        (root / "muse" / "ko-en.txt").write_text("서버 server\n검색 search\n")
        (root / "muse" / "en-ko.txt").write_text("index 색인\n")
        (root / "wikidata.json").write_text(_json.dumps(
            {"results": {"bindings": [
                {"koLabel": {"value": "암호화"},
                 "enLabel": {"value": "Encryption"}}]}}))
        (root / "wikipedia_langlinks.jsonl").write_text(_json.dumps(
            {"query": {"pages": {"1": {
                "title": "신경망",
                "langlinks": [{"lang": "en", "*": "Neural network"}]}}}}))
        monkeypatch.setenv("SPLADE_TERM_DATA", str(root))

        def no_fetch(*a, **k):
            raise AssertionError("must not hit the network with a cache")

        assert len(collect_muse(no_fetch)) == 3
        assert collect_wikidata(no_fetch)[0]["ko"] == "암호화"
        assert collect_wikipedia(no_fetch)[0]["en"] == "neural network"

    def test_collectors_degrade_offline(self, monkeypatch):
        from splade_tpu.preprocessing.term_pairs import (
            collect_muse, collect_wikidata, collect_wikipedia)

        monkeypatch.delenv("SPLADE_TERM_DATA", raising=False)

        def dead_fetch(*a, **k):
            raise OSError("no route to host")

        assert collect_muse(dead_fetch) == []
        assert collect_wikidata(dead_fetch) == []
        assert collect_wikipedia(dead_fetch) == []


class TestNewConverters:
    """Reference collect_korean_datasets.py's remaining source types:
    direct triplets, web passages, translation pairs."""

    def test_triplet_direct(self):
        from splade_tpu.preprocessing.converters import get_converter
        from splade_tpu.preprocessing.types import RawSample

        conv = get_converter("triplet")
        out = conv.convert([
            RawSample("ko-triplet", "triplet", {
                "query": "질문", "document": "문서 본문",
                "hard_negative": "다른 문서"}),
            RawSample("ko-triplet", "triplet", {"query": "", "document": "x"}),
        ])
        assert len(out) == 1
        t = out[0]
        assert (t.query, t.positive, t.negative) == ("질문", "문서 본문",
                                                     "다른 문서")
        assert t.difficulty == "hard" and t.pair_type == "retrieval_triplet"

    def test_web_passage(self):
        from splade_tpu.preprocessing.converters import get_converter
        from splade_tpu.preprocessing.types import RawSample

        conv = get_converter("web_passage")
        ko_para = "한국어 문장입니다 " * 10  # >=50 hangul chars
        long_first = ko_para * 3            # over the 200-char query cap
        out = conv.convert([
            RawSample("mc4", "web_passage",
                      {"text": f"{ko_para}\n\n{ko_para} 두번째 문단"}),
            RawSample("mc4", "web_passage",
                      {"text": f"{long_first}\n\n{ko_para}"}),  # query too long
            RawSample("mc4", "web_passage", {"text": "english only\n\nmore"}),
            RawSample("mc4", "web_passage", {"text": ko_para}),  # 1 para
        ])
        assert len(out) == 1
        assert out[0].pair_type == "web_passage"

    def test_translation(self):
        from splade_tpu.preprocessing.converters import get_converter
        from splade_tpu.preprocessing.types import RawSample

        conv = get_converter("translation")
        out = conv.convert([
            RawSample("opus", "translation",
                      {"translation": {"ko": "서버가 죽었다",
                                       "en": "the server died"}}),
            RawSample("opus", "translation",
                      {"translation": {"ko": "", "en": "empty"}}),
        ])
        assert len(out) == 1
        assert out[0].query == "서버가 죽었다"
        assert "the server died" in out[0].positive

    def test_registry_covers_reference_sources(self):
        from splade_tpu.preprocessing.downloaders import REGISTRY

        assert {"korquad2", "openorca-ko", "ko-alpaca", "ko-wikidata-qa",
                "ko-triplet-v1", "opus-100-en-ko", "mc4-ko",
                "wikipedia-ko"} <= set(REGISTRY)
        assert len(REGISTRY) >= 13  # the reference's 13-source breadth

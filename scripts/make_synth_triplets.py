"""Synthetic topical Korean-like training triplets (committed reproduction
of the round-2 production-shape corpus, which lived in /tmp and was wiped).

Each triplet shares a topic (3-5 stems) between query and positive; the
negative is drawn from a different topic, with a hard-negative fraction
sharing ONE topic stem. Stems mix a small real-Korean wordlist with random
Hangul noun roots so the 50K WordPiece tokenizer sees both in-vocab words
and subword-split forms — activations spread realistically instead of
collapsing onto a handful of token ids.

    python scripts/make_synth_triplets.py --out /tmp/vdata --n 60000
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
from pathlib import Path

import numpy as np

WORDS = ("검색 모델 한국어 문서 질의 벡터 학습 평가 색인 엔진 형태소 분석 "
         "신경망 희소 임베딩 질문 답변 전략 여행 음식 역사 과학 기술 경제 "
         "의료 법률 교육 스포츠 날씨 금융 부동산 교통 환경 에너지 문화 "
         "예술 음악 영화 게임 소설 시장 산업 정책 통계 데이터 알고리즘").split()


def build_stems(rng: np.random.Generator, n_random: int) -> list:
    from splade_tpu.utils.synth import random_hangul_stems

    return random_hangul_stems(rng, n_random, seed_words=WORDS)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/vdata")
    p.add_argument("--n", type=int, default=60000)
    p.add_argument("--val", type=int, default=512)
    p.add_argument("--topics", type=int, default=4000)
    p.add_argument("--stems", type=int, default=2000,
                   help="random Hangul stems added to the real wordlist")
    p.add_argument("--shard-size", type=int, default=20000)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    rng = np.random.default_rng(args.seed)
    stems = build_stems(rng, args.stems)
    n_stems = len(stems)
    topics = [rng.choice(n_stems, size=int(rng.integers(3, 6)),
                         replace=False) for _ in range(args.topics)]

    def sent(topic, n_extra, topic_take):
        take = rng.permutation(topic)[:topic_take]
        extra = rng.integers(0, n_stems, size=n_extra)
        words = [stems[int(w)] for w in np.concatenate([take, extra])]
        rng.shuffle(words)
        return " ".join(words)

    def triplet():
        ti = int(rng.integers(args.topics))
        topic = topics[ti]
        q = sent(topic, n_extra=1, topic_take=3)
        pos = sent(topic, n_extra=int(rng.integers(6, 14)), topic_take=4)
        nj = int(rng.integers(args.topics))
        while nj == ti:
            nj = int(rng.integers(args.topics))
        neg_topic = topics[nj]
        if rng.random() < 0.3:  # hard negative: shares one stem
            neg_topic = np.concatenate([neg_topic[:-1], topic[:1]])
        neg = sent(neg_topic, n_extra=int(rng.integers(6, 14)), topic_take=4)
        return {"query": q, "positive": pos, "negative": neg}

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    shard, idx = [], 0
    for i in range(args.n):
        shard.append(json.dumps(triplet(), ensure_ascii=False))
        if len(shard) == args.shard_size:
            (out / f"train_{idx:03d}.jsonl").write_text("\n".join(shard))
            shard, idx = [], idx + 1
    if shard:
        (out / f"train_{idx:03d}.jsonl").write_text("\n".join(shard))
    (out / "val.jsonl").write_text(
        "\n".join(json.dumps(triplet(), ensure_ascii=False)
                  for _ in range(args.val)))
    print(f"wrote {args.n} train + {args.val} val triplets -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

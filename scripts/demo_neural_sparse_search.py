"""End-to-end local demo: encode a few Korean docs, index, search, print
top tokens (reference: scripts/demo_neural_sparse_search.py --no-opensearch
local mode — here fully in-process, no external cluster at all).

Usage: python scripts/demo_neural_sparse_search.py [--checkpoint DIR]
Without a checkpoint a random-init model is used (structure demo only).
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import argparse

import jax
import jax.numpy as jnp

from splade_tpu.benchmark.encoders import SparseEncoderV33
from splade_tpu.benchmark.index import ExactSparseIndex
from splade_tpu.models.modernbert import ModernBertConfig
from splade_tpu.models.splade import SpladeEncoder, top_k_tokens
from splade_tpu.utils.logging import setup_logging
from splade_tpu.utils.tokenizer import create_tokenizer

DOCS = [
    ("doc1", "서울은 대한민국의 수도이며 경복궁과 남산타워 같은 명소가 있다"),
    ("doc2", "부산은 해운대 해수욕장으로 유명한 항구 도시이다"),
    ("doc3", "김치는 배추와 고춧가루로 만드는 한국의 전통 발효 음식이다"),
    ("doc4", "머신러닝 모델은 데이터로부터 패턴을 학습한다"),
]
QUERIES = ["한국의 수도는 어디인가", "유명한 한국 음식"]

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    args = p.parse_args()
    setup_logging()
    tokenizer = create_tokenizer()
    if args.checkpoint:
        enc = SparseEncoderV33.from_checkpoint(args.checkpoint, tokenizer)
    else:
        cfg = ModernBertConfig(vocab_size=len(tokenizer), dtype=jnp.bfloat16,
                               pad_token_id=tokenizer.pad_token_id)
        model = SpladeEncoder(cfg)
        ids = jnp.zeros((1, 8), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))["params"]
        enc = SparseEncoderV33(model, params, tokenizer, batch_size=4)
        print("NOTE: random-init model (pass --checkpoint for real rankings)")

    index = ExactSparseIndex(len(tokenizer))
    for (did, text), (idx, vals) in zip(DOCS, enc.encode_documents([t for _, t in DOCS])):
        index.add(did, idx, vals)
        print(f"{did}: {len(idx)} active dims")
    for q in QUERIES:
        qi, qv = enc.encode_for_query(q)
        print(f"\nquery: {q}  ({len(qi)} active dims)")
        import numpy as np
        vec = np.zeros(len(tokenizer), np.float32)
        vec[qi] = qv
        print("  top tokens:", dict(list(top_k_tokens(vec, tokenizer, 5).items())))
        for did, score in index.search_vector(qi, qv, k=3):
            print(f"  {did}  score={score:.3f}")

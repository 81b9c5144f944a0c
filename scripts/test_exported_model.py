"""Validate an exported HF-format artifact: loads config + safetensors +
tokenizer, runs inference, checks sparsity properties
(reference: huggingface_tests/test_model.py:22-40)."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import argparse

import numpy as np
import jax.numpy as jnp

from splade_tpu.benchmark.encoders import SparseEncoderV33
from splade_tpu.models.splade import top_k_tokens
from splade_tpu.utils.logging import setup_logging

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", required=True)
    args = p.parse_args()
    setup_logging()
    enc = SparseEncoderV33.from_hf_dir(args.model_dir)
    texts = ["한국어 신경 희소 검색 모델", "서울의 유명한 관광 명소"]
    vecs = enc.encode_documents(texts)
    ok = True
    for t, (idx, vals) in zip(texts, vecs):
        nnz = len(idx)
        print(f"'{t}': {nnz} active dims, max {vals.max() if nnz else 0:.3f}")
        ok &= nnz > 0 and (vals > 0).all()
        vec = np.zeros(len(enc.tokenizer), np.float32)
        vec[idx] = vals
        print("  top tokens:", list(top_k_tokens(vec, enc.tokenizer, 5)))
    q_idx, q_vals = enc.encode_for_query(texts[0])
    ok &= len(q_idx) <= enc.query_top_k
    score = float(np.intersect1d(q_idx, vecs[0][0]).size)
    print(f"query/doc shared dims: {score:.0f}")
    print("PASS" if ok else "FAIL")
    raise SystemExit(0 if ok else 1)

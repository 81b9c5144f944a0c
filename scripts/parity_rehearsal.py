"""Artifacts-landed rehearsal (VERDICT r1 item 4).

The real quality-parity run needs the reference checkpoint and the three
benchmark datasets — neither reachable from a zero-egress host. This script
rehearses that exact pipeline end-to-end TODAY on stand-ins, so the day the
artifacts land the single command below produces the 62.2/62.0/73.4
comparison with no new code:

    make parity-rehearsal            # or: python scripts/parity_rehearsal.py

Steps:
  1. model: use --checkpoint if given; otherwise build a FAKE
     flagship-shaped HF dir (22L/768/50K random safetensors + the real 50K
     tokenizer) — the same port/load path the real checkpoint will take.
  2. data: use $SPLADE_BENCH_DATA/<name>/ when present; otherwise write
     small synthetic BEIR-style fixtures for ko-strategyqa / miracl-ko /
     mrtydi-ko.
  3. run the benchmark CLI over all three datasets with the FULL method
     matrix: bm25 + neural_sparse + semantic + all 8 hybrids (a fake
     random XLM-R stands in for BGE-M3 when --dense-checkpoint is absent,
     taking the same TeacherDenseEncoder load path).
  4. write outputs/parity_rehearsal/REPORT.md: measured vs BASELINE.md
     numbers, stamped SYNTHETIC WEIGHTS when stand-ins were used.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))

import argparse
import json
import os
import time
from pathlib import Path

import numpy as np

BASELINE_R1 = {  # BASELINE.md retrieval table (reference published numbers)
    "ko-strategyqa": {"bm25": 0.537, "neural_sparse": 0.622,
                      "semantic": 0.735,
                      # model card :231-239 — the highlighted best hybrid
                      # (linear fusion, sparse 0.3 / dense 0.7)
                      "hybrid_linear_0.3": 0.723},
    "miracl-ko": {"bm25": 0.441, "neural_sparse": 0.620, "semantic": 0.709},
    "mrtydi-ko": {"bm25": 0.556, "neural_sparse": 0.734, "semantic": 0.841},
}

WORDS = ("검색 모델 한국어 문서 질의 벡터 학습 평가 색인 엔진 형태소 분석 "
         "신경망 희소 임베딩 질문 답변 전략 여행 음식 역사 과학 기술 경제").split()


def make_fake_model(model_dir: Path, tiny: bool) -> None:
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from splade_tpu.export.hf_export import _hf_config_dict
    from splade_tpu.models.hf_port import export_to_hf_state_dict
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder
    from splade_tpu.utils.tokenizer import create_tokenizer

    tokenizer = create_tokenizer()
    if tiny:
        cfg = ModernBertConfig.tiny(
            vocab_size=len(tokenizer), num_hidden_layers=2,
            pad_token_id=tokenizer.pad_token_id)
    else:
        cfg = ModernBertConfig(vocab_size=len(tokenizer),
                               pad_token_id=tokenizer.pad_token_id)
    model = SpladeEncoder(cfg, pool_impl="streamed")
    ids = jnp.zeros((1, 8), jnp.int32)
    t0 = time.time()
    params = model.init(jax.random.PRNGKey(0), ids, jnp.ones_like(ids))["params"]
    state = export_to_hf_state_dict(
        jax.tree_util.tree_map(np.asarray, params["mlm"]), cfg)
    state.pop("decoder.weight", None)
    model_dir.mkdir(parents=True, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
              str(model_dir / "model.safetensors"), metadata={"format": "pt"})
    (model_dir / "config.json").write_text(
        json.dumps(_hf_config_dict(cfg), indent=2))
    tokenizer.save_pretrained(str(model_dir))
    print(f"fake model ({cfg.num_hidden_layers}L/{cfg.hidden_size}H) "
          f"-> {model_dir} in {time.time()-t0:.0f}s", flush=True)


def make_fake_dense_model(dense_dir: Path, tiny: bool) -> None:
    """Random XLM-R HF dir standing in for BGE-M3 (the dense baseline /
    hybrid partner) so the rehearsal ALWAYS exercises semantic + all 8
    hybrid methods (VERDICT r2 #9) — the same TeacherDenseEncoder load
    path the real BGE-M3 weights will take. Architecture is scaled down
    (the sparse side carries the parity burden; the dense side here proves
    the plumbing): 2L/32H tiny, 4L/256H otherwise."""
    import torch
    from transformers import XLMRobertaConfig, XLMRobertaModel

    from splade_tpu.utils.tokenizer import create_tokenizer

    tokenizer = create_tokenizer()
    if tiny:
        dims = dict(hidden_size=32, intermediate_size=64,
                    num_hidden_layers=2, num_attention_heads=4)
    else:
        dims = dict(hidden_size=256, intermediate_size=512,
                    num_hidden_layers=4, num_attention_heads=4)
    # pad_token_id=1 is the XLM-R CONVENTION (it doubles as the position-
    # embedding padding_idx, so it must be < max_position_embeddings; our
    # tokenizer pads with 49999). Harmless for a random stand-in: the
    # encoder masks pads via attention_mask, not the embedding row.
    cfg = XLMRobertaConfig(
        vocab_size=len(tokenizer), max_position_embeddings=514,
        type_vocab_size=1, pad_token_id=1,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0, **dims)
    torch.manual_seed(0)
    t0 = time.time()
    XLMRobertaModel(cfg, add_pooling_layer=False).eval().save_pretrained(
        str(dense_dir), safe_serialization=True)
    tokenizer.save_pretrained(str(dense_dir))
    print(f"fake dense model ({dims['num_hidden_layers']}L/"
          f"{dims['hidden_size']}H) -> {dense_dir} in {time.time()-t0:.0f}s",
          flush=True)


def make_fixture(data_dir: Path, name: str, n_docs: int, n_queries: int) -> None:
    rng = np.random.default_rng(hash(name) % 2**31)
    d = data_dir / name
    d.mkdir(parents=True, exist_ok=True)
    topics = [" ".join(rng.choice(WORDS, size=3, replace=False))
              for _ in range(n_queries)]
    corpus, queries, qrels = [], [], []
    for i, topic in enumerate(topics):
        queries.append({"_id": f"q{i}", "text": topic})
        corpus.append({"_id": f"d{i}_pos",
                       "text": f"{topic} 관련 문서 " +
                               " ".join(rng.choice(WORDS, size=6))})
        qrels.append((f"q{i}", f"d{i}_pos", 1))
    for j in range(n_docs - n_queries):
        corpus.append({"_id": f"dx{j}",
                       "text": " ".join(rng.choice(WORDS, size=9))})
    (d / "corpus.jsonl").write_text(
        "\n".join(json.dumps(r, ensure_ascii=False) for r in corpus))
    (d / "queries.jsonl").write_text(
        "\n".join(json.dumps(r, ensure_ascii=False) for r in queries))
    (d / "qrels.tsv").write_text(
        "\n".join(f"{q}\t{doc}\t{r}" for q, doc, r in qrels))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="/tmp/parity_rehearsal")
    p.add_argument("--checkpoint", default=None,
                   help="real checkpoint/HF dir (default: build fake "
                        "flagship-shaped artifacts)")
    p.add_argument("--dense-checkpoint", default=None,
                   help="dense (BGE-M3) HF dir — adds semantic + hybrids")
    p.add_argument("--sample-size", type=int, default=64)
    p.add_argument("--fixture-docs", type=int, default=200)
    p.add_argument("--tiny", action="store_true",
                   help="tiny architecture (CI smoke; CPU-friendly)")
    p.add_argument("--out", default="outputs/parity_rehearsal")
    args = p.parse_args()

    from splade_tpu.utils.runtime import force_cpu_if_requested

    force_cpu_if_requested()

    work = Path(args.workdir)
    synthetic_weights = args.checkpoint is None
    model_dir = Path(args.checkpoint) if args.checkpoint else work / "hf_model"
    if synthetic_weights and not (model_dir / "model.safetensors").exists():
        make_fake_model(model_dir, args.tiny)
    elif synthetic_weights:
        print(f"reusing fake model at {model_dir}", flush=True)
    if not args.dense_checkpoint:
        # the published table's semantic + hybrid rows must always appear:
        # stand in a fake dense model when no real BGE-M3 dir is given
        dense_dir = work / "dense_hf"
        if not (dense_dir / "model.safetensors").exists():
            make_fake_dense_model(dense_dir, args.tiny)
        args.dense_checkpoint = str(dense_dir)

    datasets = ["ko-strategyqa", "miracl-ko", "mrtydi-ko"]
    data_root = os.environ.get("SPLADE_BENCH_DATA")
    synthetic_data = []
    if not data_root or not all(
            (Path(data_root) / n).exists() for n in datasets):
        data_root = str(work / "data")
        for n in datasets:
            if not (Path(data_root) / n).exists():
                make_fixture(Path(data_root), n, args.fixture_docs,
                             max(args.sample_size // 2, 16))
            synthetic_data.append(n)
        os.environ["SPLADE_BENCH_DATA"] = data_root
    print(f"data root: {data_root} "
          f"(synthetic: {synthetic_data or 'none'})", flush=True)

    from splade_tpu.benchmark import runner as runner_mod

    out_root = Path(args.out)
    results = {}
    for name in datasets:
        out_dir = out_root / name
        argv = ["--dataset", name, "--checkpoint", str(model_dir),
                "--sample-size", str(args.sample_size),
                "--output-dir", str(out_dir),
                # serving-grade ANN rides along (VERDICT r3 #8): the drill
                # also proves the cluster-union index path end-to-end,
                # plus the PRODUCTION postings serving config
                # P=256/C=1000/sort/match (VERDICT r4 #8)
                "--cluster-index", "--postings-index"]
        argv += ["--dense-checkpoint", args.dense_checkpoint]
        print(f"== benchmark {name}", flush=True)
        rc = runner_mod.main(argv)
        assert rc == 0, f"benchmark {name} failed"
        results[name] = json.loads(
            (out_dir / "metrics.json").read_text())["methods"]

    # ---- comparison table vs BASELINE.md
    stamp = ("**SYNTHETIC WEIGHTS — numbers are NOT comparable to the "
             "baseline; this run proves the pipeline, not the quality.**"
             if synthetic_weights else "real checkpoint")
    lines = [
        "# Parity rehearsal vs BASELINE.md", "",
        f"Generated by scripts/parity_rehearsal.py. Weights: {stamp}",
        f"Data: synthetic fixtures for {synthetic_data}" if synthetic_data
        else "Data: real ($SPLADE_BENCH_DATA)", "",
        "| Dataset | Method | Measured R@1 | Baseline R@1 |",
        "|---|---|---|---|",
    ]
    for name in datasets:
        # every method the runner produced (bm25/neural_sparse/semantic +
        # all hybrids), published rows first, baseline column where known
        known = [m for m in BASELINE_R1[name] if m in results[name]]
        rest = sorted(m for m in results[name] if m not in BASELINE_R1[name])
        for method in known + rest:
            got = results[name][method]["recall@1"]
            want = BASELINE_R1[name].get(method)
            lines.append(f"| {name} | {method} | {got:.3f} | "
                         f"{want:.3f} |" if want is not None else
                         f"| {name} | {method} | {got:.3f} | — |")
    out_root.mkdir(parents=True, exist_ok=True)
    (out_root / "REPORT.md").write_text("\n".join(lines) + "\n")
    (out_root / "summary.json").write_text(json.dumps({
        "synthetic_weights": synthetic_weights,
        "synthetic_data": synthetic_data,
        "results": {n: {m: results[n][m]["recall@1"] for m in results[n]}
                    for n in results},
        "baseline": BASELINE_R1,
    }, indent=2))
    print("\n".join(lines))
    print(f"\nwrote {out_root}/REPORT.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

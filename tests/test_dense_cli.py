"""End-to-end CLI test: the runnable dense (BGE-M3) baseline.

Covers the reference wiring of benchmark/encoders.py:24-69 (BgeM3Encoder)
and :405-422 (create_encoders_v33): one CLI command with --checkpoint and
--dense-checkpoint must produce the semantic baseline plus every
sparse+dense hybrid — previously dead code paths from the CLI.
"""

import json

import numpy as np
import pytest


WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
         "theta", "doc", "body", "filler", "text"]


@pytest.fixture(scope="module")
def artifact_dirs(tmp_path_factory):
    """Build a tiny shared tokenizer + sparse HF dir + dense HF dir."""
    torch = pytest.importorskip("torch")
    from transformers import BertTokenizerFast

    root = tmp_path_factory.mktemp("artifacts")

    # --- tokenizer: real WordPiece over a tiny vocab, fully offline
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + WORDS + [
        "##" + c for c in "abcdefghijklmnopqrstuvwxyz"] + list(
        "abcdefghijklmnopqrstuvwxyz")
    vocab_file = root / "vocab.txt"
    vocab_file.write_text("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=str(vocab_file), do_lower_case=True)
    tok_dir = root / "tokenizer"
    tok.save_pretrained(str(tok_dir))

    # --- sparse model: tiny ModernBERT exported to HF format
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from splade_tpu.export.hf_export import _hf_config_dict
    from splade_tpu.models.hf_port import export_to_hf_state_dict
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder

    cfg = ModernBertConfig.tiny(
        vocab_size=len(tok), num_hidden_layers=2,
        pad_token_id=tok.pad_token_id)
    model = SpladeEncoder(cfg, pool_impl="streamed")
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(3), ids, jnp.ones_like(ids))["params"]
    sparse_dir = root / "sparse_hf"
    sparse_dir.mkdir()
    state = export_to_hf_state_dict(params["mlm"], cfg)
    state.pop("decoder.weight", None)  # tied; the port re-ties
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
              str(sparse_dir / "model.safetensors"), metadata={"format": "pt"})
    (sparse_dir / "config.json").write_text(
        json.dumps(_hf_config_dict(cfg), indent=2))

    # --- dense model: tiny random XLM-R saved by HF itself
    from transformers import XLMRobertaConfig as HFXlmrConfig, XLMRobertaModel

    hf_cfg = HFXlmrConfig(
        vocab_size=len(tok), hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=80, type_vocab_size=1,
        pad_token_id=tok.pad_token_id, hidden_act="gelu",
        layer_norm_eps=1e-5, attention_probs_dropout_prob=0.0,
        hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    dense_dir = root / "dense_hf"
    XLMRobertaModel(hf_cfg, add_pooling_layer=False).eval().save_pretrained(
        str(dense_dir), safe_serialization=True)
    tok.save_pretrained(str(dense_dir))  # teacher loads its own tokenizer

    return tok_dir, sparse_dir, dense_dir


def _val_jsonl(tmp_path):
    rng = np.random.default_rng(5)
    topics = [WORDS[i:i + 2] for i in range(0, 8, 2)]
    rows = []
    for i in range(12):
        t = topics[i % 4]
        o = topics[(i + 1) % 4]
        rows.append({
            "query": " ".join(t),
            "positive": " ".join(t) + " doc body " + rng.choice(WORDS),
            "negative": " ".join(o) + " filler text",
            "difficulty": "easy" if i % 2 else "hard",
        })
    f = tmp_path / "val.jsonl"
    f.write_text("\n".join(json.dumps(r) for r in rows))
    return str(f)


def test_cli_dense_checkpoint_all_methods(artifact_dirs, tmp_path, monkeypatch):
    """One CLI invocation -> 11+ methods including semantic + all hybrids."""
    from splade_tpu.benchmark import runner as runner_mod

    tok_dir, sparse_dir, dense_dir = artifact_dirs
    monkeypatch.setenv("SPLADE_TOKENIZER_PATH", str(tok_dir))
    val = _val_jsonl(tmp_path)
    out = tmp_path / "bench_out"
    rc = runner_mod.main([
        "--dataset", "triplet-val", "--val-files", val,
        "--checkpoint", str(sparse_dir),
        "--dense-checkpoint", str(dense_dir),
        "--dense-max-length", "24", "--dense-batch-size", "4",
        "--sample-size", "8", "--output-dir", str(out)])
    assert rc == 0
    m = json.loads((out / "metrics.json").read_text())
    methods = set(m["methods"])
    assert {"bm25", "neural_sparse", "semantic",
            "bm25_semantic_rrf", "hybrid_rrf", "hybrid_linear_0.3",
            "hybrid_linear_0.4", "hybrid_linear_0.5", "hybrid_weighted_rrf",
            "bm25_sparse_rrf", "triple_rrf"} <= methods
    for name, metrics in m["methods"].items():
        assert 0.0 <= metrics["recall@1"] <= 1.0, name


def test_teacher_dense_encoder_from_hf_dir(artifact_dirs):
    """TeacherDenseEncoder loads an HF dir and emits normalized [N, dim]."""
    from splade_tpu.benchmark.encoders import TeacherDenseEncoder

    _, _, dense_dir = artifact_dirs
    enc = TeacherDenseEncoder.from_hf_dir(
        str(dense_dir), max_length=16, batch_size=2)
    assert enc.dim == 32
    mat = enc.encode(["alpha beta doc", "gamma delta", "epsilon"])
    assert mat.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(mat, axis=1), 1.0, rtol=1e-3)
    # identical texts embed identically; different texts don't
    again = enc.encode(["alpha beta doc"])
    np.testing.assert_allclose(mat[0], again[0], rtol=1e-5)
    assert not np.allclose(mat[0], mat[1])

"""Teacher-score precompute, multi-negative mining, and HF export tests."""

import json

import numpy as np
import pytest

from splade_tpu.mining import mine_multi_negatives, precompute_teacher_scores


class ToyTeacher:
    """Deterministic normalized embeddings from word hashes."""

    def encode(self, texts):
        out = np.zeros((len(texts), 32), np.float32)
        for i, t in enumerate(texts):
            for w in t.split():
                out[i, hash(w) % 32] += 1.0
        n = np.linalg.norm(out, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return out / n


@pytest.fixture
def shard(tmp_path):
    rng = np.random.default_rng(0)
    words = "서울 부산 대구 검색 모델 학습 여행 음식 역사 과학".split()
    rows = []
    for i in range(24):
        mk = lambda n: " ".join(rng.choice(words, size=n, replace=False))
        rows.append({"query": mk(3), "positive": mk(5), "negative": mk(5)})
    p = tmp_path / "train.jsonl"
    p.write_text("\n".join(json.dumps(r, ensure_ascii=False) for r in rows))
    return p


def test_precompute_then_mine_pipeline(shard, tmp_path):
    scored = tmp_path / "scored.jsonl"
    meta = precompute_teacher_scores(str(shard), str(scored), ToyTeacher(),
                                     cache_dir=str(tmp_path / "cache"))
    assert meta["scored"] == 24
    rows = [json.loads(l) for l in scored.read_text().splitlines()]
    assert all("teacher_pos_score" in r and "teacher_neg_score" in r for r in rows)
    # cosine bounds
    assert all(-1.01 <= r["teacher_pos_score"] <= 1.01 for r in rows)

    # idempotent cache reuse: second call must not re-encode
    class Boom:
        def encode(self, texts):
            raise AssertionError("should have used the cache")

    meta2 = precompute_teacher_scores(str(shard), str(scored), Boom(),
                                      cache_dir=str(tmp_path / "cache"))
    assert meta2["scored"] == 24

    mined = tmp_path / "mined.jsonl"
    m = mine_multi_negatives(str(scored), str(mined), str(tmp_path / "cache"),
                             num_negatives=3, rank_lo=1, rank_hi=10, search_k=20)
    assert m["mined"] > 0
    rows = [json.loads(l) for l in mined.read_text().splitlines()]
    with_negs = [r for r in rows if "negatives" in r]
    assert with_negs
    for r in with_negs:
        assert len(r["negatives"]) == 3
        assert len(r["teacher_neg_scores"]) == 3
        assert r["positive"] not in r["negatives"]
        assert "negative" not in r  # single-neg fields replaced


def test_hf_export_roundtrip(tmp_path):
    """Export a tiny trained-ish checkpoint to HF format and load it back
    through the HF-port loader; representations must match."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from splade_tpu.export.hf_export import export_checkpoint_to_hf
    from splade_tpu.models.hf_port import load_hf_checkpoint
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder
    from splade_tpu.utils.tokenizer import resolve_tokenizer_path
    from pathlib import Path

    tok_path = resolve_tokenizer_path()
    if not Path(tok_path).exists():
        pytest.skip("no local tokenizer artifact")
    from splade_tpu.utils.tokenizer import create_tokenizer

    tokenizer = create_tokenizer()
    cfg = ModernBertConfig(vocab_size=len(tokenizer), num_hidden_layers=4,
                           hidden_size=64, intermediate_size=96,
                           num_attention_heads=4,
                           pad_token_id=tokenizer.pad_token_id)
    model = SpladeEncoder(cfg, pool_impl="streamed", pool_tile=6250)
    ids = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(7), ids, jnp.ones_like(ids))["params"]
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "model.msgpack").write_bytes(serialization.to_bytes(
        jax.tree_util.tree_map(np.asarray, params)))

    # monkeypatch the export's default full-size config by exporting with the
    # same tokenizer but a tiny architecture: export reads config from
    # ModernBertConfig defaults, so drive the module-level fn pieces directly.
    from splade_tpu.models.hf_port import export_to_hf_state_dict
    from safetensors.numpy import save_file
    import json as _json
    from splade_tpu.export.hf_export import _hf_config_dict

    out = tmp_path / "hf"
    out.mkdir()
    state = export_to_hf_state_dict(params["mlm"], cfg)
    state.pop("decoder.weight")
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
              str(out / "model.safetensors"), metadata={"format": "pt"})
    (out / "config.json").write_text(_json.dumps(_hf_config_dict(cfg), indent=2))

    cfg2, params2 = load_hf_checkpoint(str(out))
    assert cfg2.num_hidden_layers == 4
    # decoder.weight was tied; port re-ties from the embedding.
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, (2, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    r1, _ = model.apply({"params": params}, ids, mask)
    model2 = SpladeEncoder(cfg2, pool_impl="streamed", pool_tile=6250)
    r2, _ = model2.apply({"params": {"mlm": params2}}, ids, mask)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_export_public_fn_non_default_architecture(tmp_path):
    """export_checkpoint_to_hf derives the architecture from the checkpoint
    weights (a template from default ModernBertConfig would reject any
    non-default checkpoint — found by review)."""
    import json

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from splade_tpu.export.hf_export import export_checkpoint_to_hf
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder

    class Tok:
        pad_token_id = 511
        all_special_ids = [0, 1]

        def __len__(self):
            return 512

        def save_pretrained(self, d):
            pass

    cfg = ModernBertConfig.tiny(num_hidden_layers=7)  # layer0 + 2 groups
    model = SpladeEncoder(cfg, pool_impl="streamed")
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    (ckpt / "model.msgpack").write_bytes(serialization.to_bytes(params))

    import splade_tpu.utils.tokenizer as tokmod
    orig = tokmod.create_tokenizer
    tokmod.create_tokenizer = lambda *a, **k: Tok()
    try:
        out = export_checkpoint_to_hf(str(ckpt), str(tmp_path / "hf"),
                                      num_attention_heads=4)
    finally:
        tokmod.create_tokenizer = orig
    hf_cfg = json.loads((tmp_path / "hf" / "config.json").read_text())
    assert hf_cfg["num_hidden_layers"] == 7
    assert hf_cfg["hidden_size"] == 64
    assert hf_cfg["intermediate_size"] == 96
    assert hf_cfg["vocab_size"] == 512
    assert (tmp_path / "hf" / "model.safetensors").exists()

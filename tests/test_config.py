"""Config system tests: defaults < YAML < env < explicit overrides."""

import textwrap

from splade_tpu.config import V33Config, load_config, save_config


def test_defaults_match_reference_recipe():
    cfg = V33Config()
    # Reference defaults: src/train/config/v33.py:32-104.
    assert cfg.loss.lambda_q == 1e-2
    assert cfg.loss.lambda_d == 3e-3
    assert cfg.loss.flops_warmup_steps == 20000
    assert cfg.loss.lambda_initial_ratio == 0.1
    assert cfg.data.batch_size == 64
    assert cfg.data.query_max_length == 64
    assert cfg.data.doc_max_length == 256
    assert cfg.training.num_epochs == 25
    assert cfg.training.learning_rate == 5e-5
    assert cfg.training.gradient_accumulation_steps == 4
    assert cfg.training.warmup_ratio == 0.06
    assert cfg.training.seed == 42


def test_yaml_env_cli_precedence(tmp_path):
    yaml_path = tmp_path / "cfg.yaml"
    yaml_path.write_text(textwrap.dedent("""
        loss:
          lambda_q: 0.03
        training:
          num_epochs: 15
          learning_rate: 1.0e-5
    """))
    env = {
        "TRAIN_TRAINING__LEARNING_RATE": "2e-5",
        "TRAIN_LOSS__LAMBDA_D": "0.01",
        "TRAIN_MODEL__REMAT": "false",
        "UNRELATED": "x",
        "TRAIN_NOSECTION__FOO": "1",
    }
    cfg = load_config(str(yaml_path), overrides={"training": {"num_epochs": 3}}, environ=env)
    assert cfg.loss.lambda_q == 0.03            # yaml
    assert cfg.loss.lambda_d == 0.01            # env (typed float)
    assert cfg.model.remat is False             # env (typed bool)
    assert cfg.training.learning_rate == 2e-5   # env beats yaml
    assert cfg.training.num_epochs == 3         # explicit beats env/yaml
    assert cfg.training.weight_decay == 0.01    # default preserved


def test_save_and_reload_roundtrip(tmp_path):
    cfg = load_config(None, overrides={"loss": {"lambda_kd": 0.5}}, environ={})
    out = tmp_path / "resolved.yaml"
    save_config(cfg, str(out))
    cfg2 = load_config(str(out), environ={})
    assert cfg2.to_dict() == cfg.to_dict()


def test_from_dict_ignores_unknown_keys():
    cfg = V33Config.from_dict({"loss": {"lambda_q": 0.5}, "legacy_section": {"x": 1}})
    assert cfg.loss.lambda_q == 0.5

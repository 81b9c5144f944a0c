"""MetricWriter parity tests: scalars, histograms, text, hparams, and the
reference logger's step/epoch wrappers (reference:
src/train/utils/logging.py:124-319) — all verified through the always-on
JSONL sink so they hold with or without TensorBoard installed."""

import json

import numpy as np

from splade_tpu.utils.logging import MetricWriter, setup_logging


def _events(log_dir):
    lines = (log_dir / "events.jsonl").read_text().splitlines()
    return [json.loads(ln) for ln in lines]


def test_scalars_jsonl(tmp_path):
    with MetricWriter(str(tmp_path)) as w:
        w.scalars({"loss": 1.5, "lr": 0.01, "skipme": "text"}, step=3,
                  prefix="train/")
    ev = _events(tmp_path)
    tags = {k for e in ev for k in e if k not in ("t", "step")}
    assert {"train/loss", "train/lr"} <= tags
    assert all("train/skipme" not in e for e in ev)


def test_histogram_stats_and_bins(tmp_path):
    rng = np.random.default_rng(0)
    vals = rng.normal(2.0, 0.5, size=1000)
    with MetricWriter(str(tmp_path)) as w:
        w.histogram("act/nonzero", vals, step=7, bins=16)
    ev = [e for e in _events(tmp_path) if "histogram" in e]
    assert len(ev) == 1
    h = ev[0]["histogram"]["act/nonzero"]
    assert h["count"] == 1000
    assert abs(h["mean"] - 2.0) < 0.1
    assert len(h["bin_counts"]) == 16
    assert len(h["bin_edges"]) == 17
    assert sum(h["bin_counts"]) == 1000
    assert h["min"] <= h["p50"] <= h["p95"] <= h["max"]


def test_text_and_hparams(tmp_path):
    with MetricWriter(str(tmp_path)) as w:
        w.text("notes", "v33 recipe", step=1)
        w.hparams({"lr": 5e-5, "epochs": 25, "obj": object()},
                  metrics={"final_loss": 0.3})
    ev = _events(tmp_path)
    texts = [e for e in ev if "text" in e]
    assert texts and texts[0]["text"]["notes"] == "v33 recipe"
    hp = [e for e in ev if "hparams" in e]
    assert hp and hp[0]["hparams"]["lr"] == 5e-5
    assert isinstance(hp[0]["hparams"]["obj"], str)  # non-primitive stringified
    assert hp[0]["hparam_metrics"]["final_loss"] == 0.3


def test_training_step_and_epoch_wrappers(tmp_path):
    with MetricWriter(str(tmp_path)) as w:
        w.log_training_step(10, loss=2.5, learning_rate=1e-4,
                            loss_components={"infonce": 2.0, "flops_q": 0.5})
        w.log_epoch(2, train_loss=2.2, val_loss=2.4, metrics={"recall@1": 0.6})
    ev = _events(tmp_path)
    tags = {k for e in ev for k in e if k not in ("t", "step")}
    assert {"train/loss", "train/learning_rate", "train/loss_infonce",
            "train/loss_flops_q", "epoch/train_loss", "epoch/val_loss",
            "epoch/recall@1"} <= tags


def test_disabled_writer_writes_nothing(tmp_path):
    w = MetricWriter(str(tmp_path / "x"), enabled=False)
    w.scalar("a", 1.0, 0)
    w.histogram("h", [1, 2, 3], 0)
    w.hparams({"a": 1})
    w.text("t", "x")
    w.close()
    assert not (tmp_path / "x").exists()


def test_empty_histogram_is_noop(tmp_path):
    with MetricWriter(str(tmp_path)) as w:
        w.histogram("h", [], step=0)
    assert all("histogram" not in e for e in _events(tmp_path))


def test_setup_logging_nonmain_quiet(capsys):
    root = setup_logging(is_main_process=False)
    assert root.level == 30  # WARNING
    root = setup_logging(is_main_process=True)
    assert root.level == 20  # INFO

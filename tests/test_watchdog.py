"""HangWatchdog: stalled-device detection (splade_tpu/train/preemption.py).

A wedged accelerator transport blocks device calls forever with no
exception and no signal (observed live on the dev host); the watchdog is
the only recovery path — it trips when no completed step beats within the
window, and the restart supervisor resumes from the latest checkpoint.
"""

from __future__ import annotations

import threading
import time

from splade_tpu.train.preemption import HangWatchdog


def test_watchdog_trips_without_beats():
    tripped = threading.Event()
    wd = HangWatchdog(0.2, on_trip=tripped.set)
    try:
        assert tripped.wait(3.0), "watchdog never tripped"
    finally:
        wd.stop()


def test_watchdog_stays_quiet_while_beating():
    tripped = threading.Event()
    wd = HangWatchdog(0.5, on_trip=tripped.set)
    try:
        for _ in range(8):
            time.sleep(0.1)
            wd.beat()
        assert not tripped.is_set()
    finally:
        wd.stop()
    # after stop() no trip fires even once beats cease
    time.sleep(0.8)
    assert not tripped.is_set()


def test_watchdog_disabled_at_zero():
    tripped = threading.Event()
    wd = HangWatchdog(0.0, on_trip=tripped.set)
    time.sleep(0.3)
    assert not tripped.is_set()
    assert not wd._thread.is_alive()
    wd.stop()


def test_trainer_wires_watchdog_and_completes(tmp_path):
    """A tiny real Trainer run with the watchdog armed: beats keep it
    quiet, training completes, and the watchdog thread is stopped."""
    import numpy as np

    from splade_tpu.config.v33 import V33Config
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder
    from splade_tpu.train.trainer import Trainer
    from splade_tpu.data.collator import TripletCollator

    from test_data import FakeTokenizer

    cfg = V33Config.from_dict({
        "data": {"batch_size": 4, "query_max_length": 8, "doc_max_length": 16},
        "training": {"num_epochs": 1, "gradient_accumulation_steps": 2,
                     "output_dir": str(tmp_path), "log_every_n_steps": 1,
                     "watchdog_timeout_s": 120.0},
    })
    mcfg = ModernBertConfig.tiny(num_hidden_layers=2)
    model = SpladeEncoder(mcfg, pool_impl="streamed", pool_tile=128)
    import jax
    import jax.numpy as jnp

    ids0 = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))["params"]
    rng = np.random.default_rng(0)
    words = ["가나", "나다", "다라", "라마", "마바"]
    data = [{"query": " ".join(rng.choice(words, 3)),
             "positive": " ".join(rng.choice(words, 6)),
             "negative": " ".join(rng.choice(words, 6))} for _ in range(32)]
    trainer = Trainer(cfg, model, params, data,
                      TripletCollator(FakeTokenizer(), 8, 16))
    trainer.train()
    assert trainer._watchdog.timeout_s == 120.0
    assert not trainer._watchdog._thread.is_alive()  # stopped in finally

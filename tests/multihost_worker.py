"""Worker process for the two-process multi-host training test.

Run by tests/test_multihost.py via subprocess:

    python tests/multihost_worker.py PORT PROCESS_ID NUM_PROCESSES OUTDIR

Each process owns 4 virtual CPU devices (8 global) and exercises the real
pod code path: ``jax.distributed.initialize`` -> per-process loader shard ->
``make_array_from_process_local_data`` -> GSPMD train step -> single-writer
checkpoint (reference: the 8-GPU DDP run, train_v33_ddp.py:105-120; rebuild:
splade_tpu/train/trainer.py:196-252).

The module also exports the deterministic builders (`FakeTok`,
`build_samples`, `build_cfg_model`) that the in-test single-process
reference run reuses, so both runs see identical data and init.
"""

import json
import os
import sys


class FakeTok:
    """Deterministic char-code tokenizer with the HF call signature."""

    pad_token_id = 0

    def __call__(self, texts, padding="max_length", truncation=True,
                 max_length=16, return_tensors=None):
        import numpy as np

        all_codes = [[ord(c) % 97 + 3 for c in t][:max_length] for t in texts]
        width = (max_length if padding == "max_length"
                 else max(max(map(len, all_codes), default=1), 1))
        ids = np.zeros((len(texts), width), np.int64)
        mask = np.zeros((len(texts), width), np.int64)
        for i, codes in enumerate(all_codes):
            ids[i, : len(codes)] = codes
            mask[i, : len(codes)] = 1
        return {"input_ids": ids, "attention_mask": mask}


def build_samples(n=128):
    import numpy as np

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "eta", "theta"]

    def mk():
        return " ".join(rng.choice(words, size=3))

    return [{"query": mk(), "positive": mk(), "negative": mk()}
            for _ in range(n)]


def build_cfg_model(outdir):
    import jax
    import jax.numpy as jnp

    from splade_tpu.config.v33 import V33Config
    from splade_tpu.data.collator import TripletCollator
    from splade_tpu.models.modernbert import ModernBertConfig
    from splade_tpu.models.splade import SpladeEncoder

    cfg = V33Config.from_dict({
        "data": {"batch_size": 4, "query_max_length": 8, "doc_max_length": 12},
        "loss": {"flops_warmup_steps": 10},
        "training": {"num_epochs": 1, "gradient_accumulation_steps": 2,
                     "learning_rate": 1e-3, "log_every_n_steps": 1,
                     "save_every_n_epochs": 1, "eval_every_n_epochs": 99,
                     "output_dir": str(outdir)},
    })
    model = SpladeEncoder(ModernBertConfig.tiny(num_hidden_layers=2),
                          pool_impl="streamed", pool_tile=128)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32),
                        jnp.ones((1, 8), jnp.int32))["params"]
    collator = TripletCollator(FakeTok(), query_max_length=8, doc_max_length=12)
    return cfg, model, params, collator


def main() -> int:
    port, pid, nproc, outdir = (sys.argv[1], int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    # This host's sitecustomize imports jax before we run: override platform
    # via jax.config and clear any created backends (same as tests/conftest).
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception:
        pass
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * nproc

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from splade_tpu.train.checkpoint import wait_for_pending_saves
    from splade_tpu.train.trainer import Trainer

    cfg, model, params, collator = build_cfg_model(outdir)
    samples = build_samples()
    trainer = Trainer(cfg, model, params, samples, collator)
    losses = []
    for macro in trainer._macro_batches(1):
        device_batch = trainer._shard_batch(macro)
        p2, o2, step, metrics = trainer.step_fn(
            trainer.state.params, trainer.state.opt_state,
            trainer.state.step, device_batch)
        trainer.state = trainer.state.replace(params=p2, opt_state=o2, step=step)
        losses.append(float(metrics["loss"]))
        if int(step) >= 2:
            break

    from splade_tpu.train.checkpoint import save_checkpoint

    # Per-process target dir: if the single-writer guard works, only
    # ckpt_p0 ever materializes on disk (process 1 returns before mkdir).
    save_checkpoint(os.path.join(outdir, f"ckpt_p{pid}"), trainer.state, cfg,
                    epoch=1, best=None)
    wait_for_pending_saves()
    print("RESULT " + json.dumps({
        "process": pid, "losses": losses,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

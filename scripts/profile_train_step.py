"""Capture a jax.profiler trace of one V33 train step (SURVEY §5.1 upgrade).

Writes the trace + step-time stats under outputs/profile/.
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))  # run without install
import numpy as np
import jax
import jax.numpy as jnp

from splade_tpu.config.v33 import V33Config
from splade_tpu.models.modernbert import ModernBertConfig
from splade_tpu.models.splade import SpladeEncoder
from splade_tpu.parallel.mesh import make_mesh
from splade_tpu.train.state import create_train_state
from splade_tpu.train.trainer import make_train_step, stack_microbatches
from splade_tpu.utils.profiling import profile_fn
from splade_tpu.utils.logging import setup_logging

setup_logging()
mesh = make_mesh()
cfg = V33Config.from_dict({"training": {"gradient_accumulation_steps": 4},
                           "data": {"batch_size": 16}})
mcfg = ModernBertConfig(dtype=jnp.bfloat16, remat=False)
model = SpladeEncoder(mcfg)
ids0 = jnp.zeros((1, 16), jnp.int32)
params = model.init(jax.random.PRNGKey(0), ids0, jnp.ones_like(ids0))["params"]
state = create_train_state(params, cfg.training, total_steps=100)
step_fn = make_train_step(model, cfg, mesh, state.tx)

rng = np.random.default_rng(0)
B = 16
def tok(n, L):
    return rng.integers(3, 49000, size=(n, L)).astype(np.int32), np.ones((n, L), np.int32)
micro = []
for _ in range(4):
    qi, qm = tok(B, 64); pi, pm = tok(B, 256); ni, nm = tok(B, 256)
    micro.append({"query_input_ids": qi, "query_attention_mask": qm,
                  "positive_input_ids": pi, "positive_attention_mask": pm,
                  "negative_input_ids": ni, "negative_attention_mask": nm})
batch = jax.device_put(stack_microbatches(micro))

params, opt_state, step = state.params, state.opt_state, state.step
def one_step(b):
    global params, opt_state, step
    params, opt_state, step, m = step_fn(params, opt_state, step, b)
    return m["loss"]

stats = profile_fn(one_step, (batch,), "outputs/profile", steps=3)
print(stats)

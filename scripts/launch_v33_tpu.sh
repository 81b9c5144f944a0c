#!/usr/bin/env bash
# Full V33 recipe launcher (reference counterpart: scripts/launch_v33_b200.sh
# torchrun over 8 GPUs). On TPU pods: run this once per host; JAX picks up
# the pod topology via jax.distributed.initialize (--distributed).
set -euo pipefail
export TOKENIZERS_PARALLELISM=false
ARGS=""
if [ "${NUM_HOSTS:-1}" -gt 1 ]; then ARGS="--distributed"; fi
python -m splade_tpu.train v33 --config configs/train_v33.yaml $ARGS "$@"

#!/usr/bin/env bash
# λ-warmup-completion run at production shapes (VERDICT r2 #4): generate the
# committed synthetic corpus if absent, then train under the restart
# supervisor + hang watchdog until max_steps (configs/prod_shape_run.yaml).
set -euo pipefail
DATA=${DATA:-/tmp/vdata}
if [ ! -f "$DATA/train_000.jsonl" ]; then
  JAX_PLATFORMS=cpu python scripts/make_synth_triplets.py --out "$DATA" --n 60000
fi
CONFIG=${CONFIG:-configs/prod_shape_run.yaml} MAX_RESTARTS=${MAX_RESTARTS:-8} \
  exec bash scripts/train_with_restart.sh

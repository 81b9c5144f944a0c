#!/usr/bin/env bash
# Poll for the final checkpoint, then run the 3 benchmarks
# (reference: scripts/run_v33_benchmarks.sh:14-17).
set -euo pipefail
MODEL=${MODEL:-outputs/train_v33/final_model}
until [ -f "$MODEL/model.msgpack" ]; do
  echo "waiting for $MODEL ..."; sleep 60
done
for ds in ko-strategyqa miracl-ko mrtydi-ko; do
  python -m splade_tpu.benchmark.runner --dataset "$ds" --checkpoint "$MODEL" || true
done

#!/usr/bin/env bash
# V35 two-phase: learn ranking via KD (zero FLOPS), then compress (FLOPS only).
# Idempotent phase skipping (reference: scripts/run_v35_pipeline.sh:23-45).
set -euo pipefail
V33_MODEL=${V33_MODEL:-outputs/train_v33/final_model}
P1=outputs/train_v35_phase1
P2=outputs/train_v35_phase2

if [ ! -d "$P1/final_model" ]; then
  python -m splade_tpu.train v33 --config configs/train_v35_phase1.yaml \
    --checkpoint "$V33_MODEL"
else
  echo "[skip] phase 1 complete"
fi
if [ ! -d "$P2/final_model" ]; then
  python -m splade_tpu.train v33 --config configs/train_v35_phase2.yaml \
    --checkpoint "$P1/final_model"
else
  echo "[skip] phase 2 complete"
fi

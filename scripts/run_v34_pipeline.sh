#!/usr/bin/env bash
# V34 pipeline: precompute teacher scores -> mine multi-negatives -> train.
# Idempotent phase skipping (reference: scripts/run_v34_pipeline.sh:16-19).
set -euo pipefail
DATA=${DATA:-data/v29.0}
TEACHER=${TEACHER:?set TEACHER to a local BGE-M3 checkpoint dir}
V33_MODEL=${V33_MODEL:-outputs/train_v33/final_model}
OUT=${OUT:-data/v29.0_multineg}

mkdir -p "$OUT"
if [ ! -f "$OUT/scored.jsonl" ]; then
  python scripts/precompute_teacher_scores.py \
    --input "$DATA"/train_*.jsonl --output "$OUT/scored.jsonl" \
    --teacher-model "$TEACHER" --cache-dir "$OUT/teacher_cache"
else
  echo "[skip] teacher scores cached"
fi
if [ ! -f "$OUT/train_000.jsonl" ]; then
  python scripts/mine_multi_negatives.py \
    --input "$OUT/scored.jsonl" --output "$OUT/train_000.jsonl" \
    --cache-dir "$OUT/teacher_cache"
else
  echo "[skip] multi-negatives mined"
fi
python -m splade_tpu.train v33 --config configs/train_v34_multi_neg.yaml \
  --checkpoint "$V33_MODEL"

#!/usr/bin/env bash
# Supervised training with automatic resume-on-failure — an upgrade over the
# reference's manual `make train-resume` recovery (SURVEY §5.3: the reference
# has no elastic restart). Retries from the latest checkpoint up to
# MAX_RESTARTS times; respects clean exits.
set -uo pipefail
CONFIG=${CONFIG:-configs/train_v33.yaml}
MAX_RESTARTS=${MAX_RESTARTS:-5}
attempt=0
args=("$@")
while true; do
  if [ "$attempt" -eq 0 ]; then
    python -m splade_tpu.train v33 --config "$CONFIG" "${args[@]}"
  else
    echo "[restart $attempt/$MAX_RESTARTS] resuming from latest checkpoint"
    python -m splade_tpu.train v33 --config "$CONFIG" --resume "${args[@]}"
  fi
  code=$?
  [ "$code" -eq 0 ] && echo "training completed" && exit 0
  attempt=$((attempt+1))
  if [ "$attempt" -gt "$MAX_RESTARTS" ]; then
    echo "giving up after $MAX_RESTARTS restarts (last exit $code)" >&2
    exit "$code"
  fi
  # 90s, not 30: after an UNCLEAN death the single-tenant device grant
  # takes ~60-90s to release, and a successor that starts earlier blocks
  # forever on the grant (observed 3x, docs/TRAINING_DYNAMICS.md round 5)
  sleep 90
done

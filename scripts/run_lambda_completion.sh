#!/usr/bin/env bash
# λ-warmup-completion run at production shapes (VERDICT r2 #4): generate the
# committed synthetic corpus if absent, then train under the restart
# supervisor + hang watchdog until max_steps (configs/prod_shape_run.yaml).
set -euo pipefail
# zero-egress host: fail HF-hub lookups fast instead of 5 DNS retries
# (~60-90 s wasted per supervisor restart before the local fallback)
export HF_HUB_OFFLINE=${HF_HUB_OFFLINE:-1} TRANSFORMERS_OFFLINE=${TRANSFORMERS_OFFLINE:-1}
DATA=${DATA:-/tmp/vdata}
# regenerate unless a production-size corpus is already there — the same
# path may hold the 64-triplet verify-skill smoke data, whose presence
# must not satisfy this check (observed round 3: it did)
# `|| true`: with no shards the cat fails, and under pipefail+errexit the
# failed substitution would abort the script before it ever generates data
lines=$(cat "$DATA"/train_*.jsonl 2>/dev/null | wc -l || true)
lines=${lines:-0}
if [ "$lines" -lt 50000 ]; then
  JAX_PLATFORMS=cpu python scripts/make_synth_triplets.py --out "$DATA" --n 60000
fi
CONFIG=${CONFIG:-configs/prod_shape_run.yaml} MAX_RESTARTS=${MAX_RESTARTS:-8} \
  exec bash scripts/train_with_restart.sh

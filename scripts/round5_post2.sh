#!/usr/bin/env bash
# Round-5 POST-2: the last cell of the phase-1-policy x regime matrix —
# select_sum over the DF-TIERED pool in the TOPICAL regime. select
# collapsed there (0.4909 vs scatter 0.7902 at P=2048: per-entry
# contributions are non-discriminative on topic-mixed hot lists);
# select_sum ranks by PARTIAL sums over a 4C pool, so it sits between.
# Pre-registered prediction (docs/PHASE0_COST_MODEL.md round-5 topical
# addendum): BELOW 0.90 (the 8K-entry pool covers 2.8% of the E=286K
# gathered entries; summed-evidence docs still drop), i.e. selsum does
# NOT rescue the topical regime — aggregation over the tiered pool
# (scatter) remains the production path there. QPS lands >=2x scatter's
# 262 (approx_max_k replaces the [B,1M] scatter accumulator).
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/r5_post2.log
DEADLINE=${DEADLINE:-1787288522}
log() { echo "[r5post2] $* $(date -u +%T)" >>"$LOG"; }
left() { echo $(( DEADLINE - $(date +%s) )); }
log "start (left $(left)s)"
# gate: serving_tuned finished (or the post agenda died) and the lock holder is gone
while :; do
  holder=$(cat /tmp/r5_agenda.pid 2>/dev/null)
  alive=0; kill -0 "$holder" 2>/dev/null && alive=1
  [ -f /tmp/r5post_done_serving_tuned ] && [ "$alive" = 0 ] && break
  # fallback: lock holder dead and little time left -> take what remains
  [ "$alive" = 0 ] && [ "$(left)" -lt 2400 ] && { log "fallback takeover"; break; }
  [ "$(left)" -lt 900 ] && { log "no time; exiting"; exit 0; }
  sleep 45
done
[ "$(left)" -lt 1800 ] && { log "not enough time for the stage; exiting"; exit 0; }
echo $$ > /tmp/r5_agenda.pid
log "chip handover (left $(left)s)"
sleep 75
timeout $(( $(left) > 2400 ? 2400 : $(left) - 300 )) \
  python scripts/recall_encoder_1m.py --index tiered --corpus topical \
  --enc-cache artifacts/enc_r5_topical.npz --queries 1024 \
  --n-postings 512 --hot-terms 4096 --hot-postings 8192 \
  --rescore 2000 --posting-scoring select_sum --search-batch 256 \
  --key r5_topical_tiered_selsum_h4096 >/tmp/r5_ttselsum.log 2>&1
tail -3 /tmp/r5_ttselsum.log >>"$LOG"
git add docs/POSTINGS_BENCH.json 2>/dev/null || true
git diff --cached --quiet || git commit -q -m "Tiered+select_sum in the topical regime (last cell of the policy x regime matrix)" || true
log "done (left $(left)s)"

#!/usr/bin/env bash
# Round-3 TPU agenda (VERDICT r2 #1-#4), run unattended once the tunnel
# revives. The axon relay dies from time to time and only infrastructure
# brings it back, so the agenda self-gates on a liveness probe and then
# runs the round's chip-bound evidence, ONE process at a time (the TPU is
# single-tenant):
#
#   bench    bench.py cold-process confirmation (#1)  -> /tmp/r3_bench.json
#   cluster  cluster recall+QPS curve at 1M real encoder vectors (#2)
#   cluster_deep  the >=0.95-recall union operating point (#2)
#   postings_qps  honest-operating-point postings QPS (#2)
#   topical  structured-corpus encode + sweep (bonus regime)
#   lambda   warmup-completion run under the restart supervisor (#3+#4)
#
# Ordering is decided at revival time from the remaining round budget:
# with plenty of time the QPS stages go first (cheap, high evidence
# density); when late, the lambda run (TWO verdict items) preempts all
# QPS stages and they fill whatever is left. Stages log to
# /tmp/r3_<stage>.log and mark completion in /tmp/r3_done_<stage>, so
# relaunching after a mid-agenda relay death resumes where it left off.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/r3_agenda.log
ROUND_END=${ROUND_END:-1787082253}
mark() { touch "/tmp/r3_done_$1"; }
done_() { [ -f "/tmp/r3_done_$1" ]; }
echo "[agenda] start $(date -u +%F-%T)" >>"$LOG"

# --- stage 0: wait for the tunnel (a cold first matmul can take 200+ s)
alive=0
for i in $(seq 1 100); do
  if timeout 300 python -c '
import jax, jax.numpy as jnp
print("health:", (jnp.ones((8,8)) @ jnp.ones((8,8))).sum(), jax.devices())
' >>"$LOG" 2>&1; then
    echo "[agenda] tunnel alive after probe $i $(date -u +%T)" >>"$LOG"
    alive=1
    break
  fi
  echo "[agenda] probe $i: tunnel dead, sleeping 120s" >>"$LOG"
  sleep 120
done
[ "$alive" = 1 ] || { echo "[agenda] gave up waiting" >>"$LOG"; exit 3; }

stage_bench() {
  done_ bench && return 0
  echo "[agenda] stage bench $(date -u +%T)" >>"$LOG"
  timeout 2400 python bench.py >/tmp/r3_bench.json 2>/tmp/r3_bench.log \
    && mark bench
  cat /tmp/r3_bench.json >>"$LOG" 2>/dev/null
}

stage_cluster() {
  # recall/QPS trade-off curve on the structureless (worst-case) corpus;
  # ONE build, probes swept via set_probes
  done_ cluster && return 0
  echo "[agenda] stage cluster $(date -u +%T)" >>"$LOG"
  timeout 5400 python scripts/recall_encoder_1m.py --index cluster \
    --enc-cache /tmp/enc_run2.npz --probes 32,64,128,256 \
    --key encoder_vectors_1m_cluster \
    >/tmp/r3_cluster.log 2>&1 && mark cluster
  tail -10 /tmp/r3_cluster.log >>"$LOG"
}

stage_cluster_deep() {
  # deep-union operating point: scatter-mode postings side at P=1024 /
  # C_p=1000 under the cluster union — recall 0.956 (CPU-measured);
  # this stage adds the chip QPS
  done_ cluster_deep && return 0
  echo "[agenda] stage cluster_deep $(date -u +%T)" >>"$LOG"
  timeout 3600 python scripts/recall_encoder_1m.py --index cluster \
    --enc-cache /tmp/enc_run2.npz --probes 64,128 \
    --posting-cap 1024 --posting-candidates 1000 \
    --key encoder_vectors_1m_cluster_deep \
    >/tmp/r3_cluster_deep.log 2>&1 && mark cluster_deep
  tail -6 /tmp/r3_cluster_deep.log >>"$LOG"
}

stage_postings_qps() {
  done_ postings_qps && return 0
  echo "[agenda] stage postings_qps $(date -u +%T)" >>"$LOG"
  timeout 2400 python scripts/recall_encoder_1m.py --index postings \
    --enc-cache /tmp/enc_run2.npz --n-postings 512 --rescore 1000 \
    --key encoder_vectors_1m_nnz600_p512_c1000 >/tmp/r3_postings.log 2>&1 \
  && timeout 2400 python scripts/recall_encoder_1m.py --index postings \
    --enc-cache /tmp/enc_run2.npz --n-postings 1024 --rescore 1000 \
    --key encoder_vectors_1m_nnz600_p1024_c1000 >>/tmp/r3_postings.log 2>&1 \
    && mark postings_qps
  tail -4 /tmp/r3_postings.log >>"$LOG"
}

stage_topical() {
  # topically-structured corpus (what real text looks like; the regime
  # cluster summaries exploit) — fresh 1M-doc encode (~18 min) + sweep
  done_ topical && return 0
  echo "[agenda] stage topical $(date -u +%T)" >>"$LOG"
  timeout 4800 python scripts/recall_encoder_1m.py --index cluster \
    --corpus topical --enc-cache /tmp/enc_topical.npz \
    --checkpoint /tmp/sparse_run2/final_model --probes 16,32,64 \
    --key encoder_vectors_1m_topical_cluster \
    >/tmp/r3_topical.log 2>&1 \
  && timeout 2400 python scripts/recall_encoder_1m.py --index postings \
    --enc-cache /tmp/enc_topical.npz --n-postings 128 --rescore 200 \
    --key encoder_vectors_1m_topical_postings_p128 \
    >>/tmp/r3_topical.log 2>&1 && mark topical
  tail -8 /tmp/r3_topical.log >>"$LOG"
}

stage_lambda() {
  done_ lambda && return 0
  # scale the run to the remaining budget, never below the 2,000-step
  # warmup + margin (the whole point is landing PAST warmup); e2e rate
  # ~120 triplets/s -> ~1.07 steps/s at eff. batch 128, plus ~10 min
  # of corpus gen + compile
  rem=$((ROUND_END - $(date +%s)))
  steps=$(( (rem - 900) / 1 ))   # ~1 step/s, keep 15 min slack
  [ "$steps" -gt 4000 ] && steps=4000
  [ "$steps" -lt 2400 ] && steps=2400
  echo "[agenda] stage lambda max_steps=$steps rem=${rem}s $(date -u +%T)" >>"$LOG"
  TRAIN_TRAINING__OUTPUT_DIR=/tmp/lrun3 TRAIN_TRAINING__MAX_STEPS=$steps \
    bash scripts/run_lambda_completion.sh >/tmp/r3_lambda.log 2>&1 \
    && mark lambda
  echo "[agenda] lambda exited rc=$? $(date -u +%T)" >>"$LOG"
}

rem=$((ROUND_END - $(date +%s)))
echo "[agenda] remaining ${rem}s at revival" >>"$LOG"
stage_bench
if [ "$rem" -ge 10000 ]; then
  stage_cluster
  stage_cluster_deep
  stage_postings_qps
  [ "$((ROUND_END - $(date +%s)))" -ge 9000 ] && stage_topical
  stage_lambda
else
  # late revival: lambda (two verdict items) first, QPS stages fill the rest
  stage_lambda
  stage_cluster_deep
  stage_cluster
  stage_postings_qps
fi
echo "[agenda] done $(date -u +%F-%T)" >>"$LOG"

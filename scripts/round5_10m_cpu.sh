#!/usr/bin/env bash
# Round-5 10M-doc CPU campaign (VERDICT r4 #3: reconcile the 10M story).
# All runs: the round-4 synthetic generator (zipf 0.9 token sampling,
# per-term IDF-like base x lognormal-jitter weights, 64 nnz/doc — the
# generator whose weight model was validated against the collapse of
# fully-i.i.d. weights), 512 queries (r4 used 32 — VERDICT weak #3),
# shared corpus + exact-reference caches. CPU-only (SPLADE_FORCE_CPU);
# runs niced so the chip agenda's host work preempts it.
# Markers /tmp/r5cpu_done_<stage>; relaunch resumes.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/r5_10m.log
CACHE=/tmp/r5_10m_cache.npz
R=scripts/recall_encoder_1m.py
MESH_FLAGS=--xla_force_host_platform_device_count=8
mark() { touch "/tmp/r5cpu_done_$1"; }
done_() { [ -f "/tmp/r5cpu_done_$1" ]; }
log() { echo "[r5cpu] $* $(date -u +%T)" >>"$LOG"; }
commit_rows() {
  git add docs/POSTINGS_BENCH.json 2>/dev/null || true
  git diff --cached --quiet || git commit -q -m "$1" || true
}
run() { # run <stage> <mesh|nomesh> <timeout> <message> <args...>
  local stage=$1 mesh=$2 to=$3 msg=$4; shift 4
  done_ "$stage" && return 0
  log "stage $stage"
  local xla=""
  [ "$mesh" = mesh ] && xla=$MESH_FLAGS
  JAX_PLATFORMS=cpu SPLADE_FORCE_CPU=1 XLA_FLAGS="$xla" \
    nice -n 19 timeout "$to" python "$R" "$@" \
    >"/tmp/r5cpu_$stage.log" 2>&1 && mark "$stage"
  tail -3 "/tmp/r5cpu_$stage.log" >>"$LOG"
  commit_rows "$msg"
}
log start

# stage 1: corpus gen + exact reference + the disputed control point at
# 512 queries (the r4 run had 32). ~60-90 min on this 1-core host.
run single_p128 nomesh 9000 \
  "10M reconciliation: P=128/C=1000 control at 512 queries (r4 generator)" \
  --index postings --vectors synth --docs 10000000 --queries 512 \
  --enc-cache "$CACHE" --n-postings 128 --rescore 1000 \
  --posting-scoring sort --key r5_single10m_p128

# stage 2: the mesh row at a real sample size (r4: 32 queries)
run mesh_p128 mesh 9000 \
  "10M mesh postings at 512 queries (r4 row had 32)" \
  --index mesh_postings --enc-cache "$CACHE" --queries 512 \
  --n-postings 128 --rescore 1000 --posting-scoring sort \
  --key r5_mesh10m_p128

# stage 3: deeper per-shard P — the ">=0.9 at 10M" candidate
run mesh_p512 mesh 9000 \
  "10M mesh postings, per-shard P=512 (deeper-P candidate for >=0.9)" \
  --index mesh_postings --enc-cache "$CACHE" --queries 512 \
  --n-postings 512 --rescore 1000 --posting-scoring sort \
  --key r5_mesh10m_p512

# stage 4: single-index deep P (depth-matched to the mesh's effective 8xP)
run single_p512 nomesh 9000 \
  "10M single-index P=512 control (depth-matched to the mesh's effective 8xP)" \
  --index postings --enc-cache "$CACHE" --queries 512 \
  --n-postings 512 --rescore 1000 --posting-scoring sort \
  --search-batch 128 --key r5_single10m_p512

# stage 5: DF-tiered at 10M — per-term budgets at the scale that matters
run tiered10m nomesh 9000 \
  "10M DF-tiered postings (cold 128 + hot 4096x8192)" \
  --index tiered --enc-cache "$CACHE" --queries 512 \
  --n-postings 128 --hot-terms 4096 --hot-postings 8192 --rescore 1000 \
  --search-batch 128 --key r5_tiered10m_h4096_ph8192

log "all stages attempted"

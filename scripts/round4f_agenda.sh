#!/usr/bin/env bash
# Round-4f agenda: real-encoder-vector rows for the sort-free 'select'
# phase-1 (pre-registered in docs/PHASE0_COST_MODEL.md round 4f), run
# against the REGENERATED λ-complete checkpoint (artifacts/lrun4 — the
# original was lost with /tmp in a machine reset).
#
# Self-driving: waits for the training run to release the chip (its pid
# file), then runs the stages in value order. Each stage marks
# /tmp/r4f_done_<stage>; relaunch resumes. Run me under nohup at session
# start — sessions have died mid-round to API errors before.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/r4f_agenda.log
CKPT=${CKPT:-artifacts/lrun4/final_model}
ENC=${ENC:-artifacts/enc_r4f.npz}
QUERIES=${QUERIES:-1024}
mark() { touch "/tmp/r4f_done_$1"; }
done_() { [ -f "/tmp/r4f_done_$1" ]; }
echo "[r4f] start $(date -u +%F-%T)" >>"$LOG"

# stage 0: wait for the λ run to finish and release the chip. The loop
# is uncapped on the training pid (ADVICE r4: a 100-min cap barely
# cleared the 76-min training wall clock); only the checkpoint-missing
# case is bounded.
for i in $(seq 1 200); do
  [ -d "$CKPT" ] && break
  sleep 30
done
[ -d "$CKPT" ] || { echo "[r4f] no checkpoint after wait" >>"$LOG"; exit 3; }
while kill -0 "$(cat /tmp/lrun4.pid 2>/dev/null)" 2>/dev/null; do
  sleep 30   # checkpoint exists but the trainer still holds the chip
done
echo "[r4f] checkpoint ready $(date -u +%T)" >>"$LOG"

# a truncated encode cache (timeout/reset mid-savez) must not wedge the
# later stages — validate before trusting it (ADVICE r4 #2)
cache_ok() {
  [ -s "$1" ] && python -c "import numpy,sys; numpy.load(sys.argv[1])['d_idx']" "$1" >/dev/null 2>&1
}

# stage 1: encode 1M docs with the new checkpoint; the sort P=256 point
# rides along so the encode pass isn't wasted if the relay dies after
stage_encode() {
  done_ encode && return 0
  cache_ok "$ENC" && { mark encode; return 0; }
  rm -f "$ENC"   # a truncated cache must be rebuilt, not trusted
  echo "[r4f] stage encode $(date -u +%T)" >>"$LOG"
  timeout 3600 python scripts/recall_encoder_1m.py --index postings \
    --checkpoint "$CKPT" --enc-cache "$ENC" --queries "$QUERIES" \
    --n-postings 256 --rescore 1000 --posting-scoring sort \
    --key r4f_sort >/tmp/r4f_encode.log 2>&1 && cache_ok "$ENC" \
    && mark encode
  tail -4 /tmp/r4f_encode.log >>"$LOG"
}

# stage 2: the headline — select at the serving operating point
stage_select() {
  done_ select && return 0
  echo "[r4f] stage select $(date -u +%T)" >>"$LOG"
  timeout 2400 python scripts/recall_encoder_1m.py --index postings \
    --enc-cache "$ENC" --queries "$QUERIES" \
    --n-postings 256 --rescore 1000 --posting-scoring select \
    --key r4f_select >/tmp/r4f_select.log 2>&1 && mark select
  tail -4 /tmp/r4f_select.log >>"$LOG"
}

# stage 3: quality mode P=512 under select
stage_select512() {
  done_ select512 && return 0
  echo "[r4f] stage select512 $(date -u +%T)" >>"$LOG"
  timeout 2400 python scripts/recall_encoder_1m.py --index postings \
    --enc-cache "$ENC" --queries "$QUERIES" \
    --n-postings 512 --rescore 1000 --posting-scoring select \
    --key r4f_select512 >/tmp/r4f_select512.log 2>&1 && mark select512
  tail -4 /tmp/r4f_select512.log >>"$LOG"
}

# stage 4: cold-process bench capture (LAST: its value is already known)
stage_bench() {
  done_ bench && return 0
  echo "[r4f] stage bench $(date -u +%T)" >>"$LOG"
  timeout 2400 python bench.py >/tmp/r4f_bench.json 2>/tmp/r4f_bench.log \
    && mark bench
  cat /tmp/r4f_bench.json >>"$LOG" 2>/dev/null
}

stage_encode
stage_select
stage_select512
stage_bench
echo "[r4f] all stages attempted $(date -u +%T)" >>"$LOG"

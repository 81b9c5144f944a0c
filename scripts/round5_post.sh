#!/usr/bin/env bash
# Round-5 POST agenda: the profile stage's pre-registered prediction 4
# (docs/PHASE0_COST_MODEL.md "phase decomposition by finite differences")
# says the [B,C,M]->[B,M,C] transpose feeding the match kernel is the
# rescore wall; `match_rows` removes it. If that is right, the C=4000
# QUALITY point (recall 0.9753 in the C sweep) should run near the old
# C=2000 throughput point's QPS — measured here as single-program B=1024
# headline rows once the main agenda is done with the chip.
#
# Mutual exclusion with the main agenda + its supervisor: waits for the
# main agenda's high-value markers (or a low-time fallback), then takes
# over /tmp/r5_agenda.pid — a supervisor-relaunched agenda sees a live
# pid there and exits immediately (round5_agenda.sh's own lock check).
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/r5_post.log
DEADLINE=${DEADLINE:-1787288522}
ENC=${ENC:-artifacts/enc_r4f.npz}
R=scripts/recall_encoder_1m.py
log() { echo "[r5post] $* $(date -u +%T)" >>"$LOG"; }
mark() { touch "/tmp/r5post_done_$1"; }
done_() { [ -f "/tmp/r5post_done_$1" ]; }
left() { echo $(( DEADLINE - $(date +%s) )); }
commit_rows() {
  git add docs/POSTINGS_BENCH.json 2>/dev/null || true
  git diff --cached --quiet || git commit -q -m "$1" || true
}
log "start (deadline in $(left)s)"

# wait for the main agenda: all post-worthy markers OR its pid gone with
# <75 min left (don't strand the chip idle at round end)
while :; do
  alldone=1
  for s in selsum topenc topsweep toptiered headline profile serving serving2; do
    [ -f "/tmp/r5_done_$s" ] || alldone=0
  done
  agenda_alive=0
  kill -0 "$(cat /tmp/r5_agenda.pid 2>/dev/null)" 2>/dev/null && agenda_alive=1
  [ "$alldone" = 1 ] && [ "$agenda_alive" = 0 ] && break
  if [ "$agenda_alive" = 0 ] && [ "$(left)" -lt 4500 ]; then
    log "low-time fallback: agenda dead, $(left)s left, taking over"
    break
  fi
  [ "$(left)" -lt 600 ] && { log "deadline too close; exiting"; exit 0; }
  sleep 60
done
echo $$ > /tmp/r5_agenda.pid   # take the agenda lock (see header)
log "chip handover (left $(left)s)"
sleep 75   # grant-release gap (see round5_agenda.sh grant_gap)

# stage matchrows: select P=512, C in {2000,4000}, single B=1024
# program, match_rows rescore — prediction 4's operating-point payoff
stage_matchrows() {
  done_ matchrows && return 0
  [ "$(left)" -lt 1500 ] && { log "matchrows: no time"; return 1; }
  log "stage matchrows"
  SPLADE_RESCORE=match_rows timeout 3600 python "$R" --index postings \
    --enc-cache "$ENC" --queries 1024 --n-postings 512 \
    --rescore 2000,4000 --posting-scoring select \
    --key r5_matchrows_select >/tmp/r5_matchrows.log 2>&1 && mark matchrows
  tail -4 /tmp/r5_matchrows.log >>"$LOG"
  commit_rows "match_rows headline rows: select P=512 C=2000/4000, single B=1024 program (prediction 4 payoff)"
}

# stage matchrows_selsum: if select_sum's small-C selection held up
# (r5_selsum rows), its C=1000 point with the cheap rescore is the best
# 10k-north-star candidate
stage_matchrows_selsum() {
  done_ matchrows_selsum && return 0
  [ "$(left)" -lt 1500 ] && { log "matchrows_selsum: no time"; return 1; }
  log "stage matchrows_selsum"
  sleep 75   # grant-release gap
  SPLADE_RESCORE=match_rows timeout 3600 python "$R" --index postings \
    --enc-cache "$ENC" --queries 1024 --n-postings 512 \
    --rescore 1000,2000 --posting-scoring select_sum \
    --key r5_matchrows_selsum >/tmp/r5_matchrows_selsum.log 2>&1 \
    && mark matchrows_selsum
  tail -4 /tmp/r5_matchrows_selsum.log >>"$LOG"
  commit_rows "match_rows + select_sum headline rows at C=1000/2000 (north-star candidate)"
}

stage_matchrows
stage_matchrows_selsum
log "post stages attempted (left $(left)s)"

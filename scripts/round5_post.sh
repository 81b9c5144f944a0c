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

# stage serving_tuned: the daemon at the frontier config with the
# batcher sized for the load (128 clients but max_batch 32 in the
# serving/serving2 stages → 65 fixed-cost-dominated dispatches and
# 284 QPS; the device loop sustains 5,300 at B=1024). One knob, same
# everything else: does batch 128 close the daemon↔microbench gap?
stage_serving_tuned() {
  done_ serving_tuned && return 0
  [ "$(left)" -lt 1500 ] && { log "serving_tuned: no time"; return 1; }
  log "stage serving_tuned"
  sleep 75   # grant-release gap
  timeout 2700 python scripts/bench_serving.py \
    --checkpoint artifacts/lrun4/final_model --synthetic-docs 1000000 \
    --index postings --n-postings 512 --rescore 2000 \
    --posting-scoring select --clients 128 --requests 2048 \
    --max-batch-size 128 --max-wait-ms 20 \
    >/tmp/r5_serving_tuned.log 2>&1
  python - <<'EOF' && mark serving_tuned
import json, pathlib
log = pathlib.Path("/tmp/r5_serving_tuned.log").read_text().splitlines()
rows = [json.loads(x) for x in log if x.startswith("{")]
assert rows, "no JSON line"
row = rows[-1]
row["note"] = ("round-5 frontier config (P=512/C=2000/select/match) with "
               "the batcher sized for the load: max_batch 128, wait 20 ms "
               "(serving/serving2 ran max_batch 32). 1M synthetic-zipf "
               "docs, real 149M encoder per query, 128 clients")
p = pathlib.Path("docs/SERVING_LOAD.json")
d = json.loads(p.read_text())
d["r5_frontier_select_1m_batch128"] = row
p.write_text(json.dumps(d, indent=2))
print("wrote docs/SERVING_LOAD.json [r5_frontier_select_1m_batch128]")
EOF
  tail -3 /tmp/r5_serving_tuned.log >>"$LOG"
  git add docs/SERVING_LOAD.json 2>/dev/null || true
  git diff --cached --quiet || git commit -q -m "Serving daemon with batch-128 batcher at the frontier point (r5_frontier_select_1m_batch128)" || true
}

stage_matchrows
stage_serving_tuned
log "post stages attempted (left $(left)s)"

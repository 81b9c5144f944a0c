#!/usr/bin/env bash
# Round-5 chip agenda, in value order (VERDICT r4 "next round" #1-#6):
#   ab_sort/ab_select  — the same-checkpoint sort-vs-select A/B round 4f
#                        owed (same encode cache artifacts/enc_r4f.npz,
#                        unique keys, pre-registered in
#                        docs/PHASE0_COST_MODEL.md round-5 section)
#   csweep             — select's C sweep 2000-8000 (north-star lever a)
#   topenc/topsweep    — the topical ~54-nnz regime at 1M: control row +
#                        deep-P sweep (P 1024-4096) + select/big-C point
#   serving            — daemon load test at the round-4 operating point
#   bench              — cold-process bench.py capture (value known; last)
#
# Every stage that lands a row COMMITS it (VERDICT r4 #7: a relay death
# must not strand evidence). Markers /tmp/r5_done_<stage>; relaunch
# resumes. Run under scripts/agenda_supervisor.sh with PREFIX=r5.
set -uo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/r5_agenda.log
# single-instance lock: the TPU is single-tenant — a second concurrent
# agenda (e.g. a restarted supervisor while the old instance still runs)
# would wedge both on the device grant
PIDFILE=/tmp/r5_agenda.pid
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null \
   && [ "$(cat "$PIDFILE")" != "$$" ]; then
  echo "[r5] another agenda instance ($(cat "$PIDFILE")) is live; exiting" >>"$LOG"
  exit 9
fi
echo $$ > "$PIDFILE"
CKPT=${CKPT:-artifacts/lrun4/final_model}
ENC=${ENC:-artifacts/enc_r4f.npz}
ENCT=${ENCT:-artifacts/enc_r5_topical.npz}
QUERIES=${QUERIES:-1024}
R=scripts/recall_encoder_1m.py
mark() { touch "/tmp/r5_done_$1"; }
done_() { [ -f "/tmp/r5_done_$1" ]; }
log() { echo "[r5] $* $(date -u +%T)" >>"$LOG"; }
# single-tenant grant handoff: a chip process launched seconds after the
# previous one exits can block FOREVER on the device grant (observed
# 00:08–00:27 this round: the selsum->topenc 9s handoff wedged on a
# futex with the relay healthy; same failure mode as the operational
# lesson in docs/TRAINING_DYNAMICS.md). Pause before every chip-process
# launch that follows another chip process.
grant_gap() { log "grant gap 75s"; sleep 75; }
cache_ok() {
  [ -s "$1" ] && python - "$1" >/dev/null 2>&1 <<'EOF'
import numpy, sys
numpy.load(sys.argv[1])["d_idx"]
EOF
}
commit_rows() { # commit_rows <message>
  git add docs/POSTINGS_BENCH.json docs/SERVING_LOAD.json 2>/dev/null || true
  git diff --cached --quiet || git commit -q -m "$1" || true
}
log start

# trainer-release gate (second machine reset wiped artifacts/lrun4; the
# regeneration run holds the single-tenant chip — probing JAX while it
# trains would contend for the device grant): wait on its pid first
while kill -0 "$(cat /tmp/lrun4.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done
if [ ! -d "$CKPT" ]; then
  log "trainer gone but no checkpoint at $CKPT; exiting for supervisor retry"
  exit 8
fi

# chip liveness gate: a dead relay means every stage would hang — probe
# once; the supervisor relaunches us, so exiting is the retry loop
if ! timeout 420 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  log "chip probe failed; exiting for supervisor retry"
  exit 7
fi
log "chip up"
grant_gap

# -- stage encode: the reset also wiped the 1M zipf encode cache; rebuild
#    it from the regenerated checkpoint. The csweep sort control that
#    never landed (r4f/r5 timeouts) rides the encode pass so it isn't
#    wasted if the relay dies after.
stage_encode() {
  done_ encode && return 0
  cache_ok "$ENC" && { mark encode; return 0; }
  rm -f "$ENC"
  log "stage encode (~30 min) + sort C=2000 control"
  timeout 5400 python "$R" --index postings --checkpoint "$CKPT" \
    --enc-cache "$ENC" --queries "$QUERIES" --n-postings 512 --rescore 2000 \
    --posting-scoring sort --search-batch 256 --key r5_sort_p512_c2000 \
    >/tmp/r5_encode.log 2>&1
  cache_ok "$ENC" && mark encode
  tail -4 /tmp/r5_encode.log >>"$LOG"
  commit_rows "Sort C=2000 control at P=512 (rides the regenerated 1M encode)"
}

# -- stage ab_sort: the same-checkpoint sort control (r4f's sort stage
#    timed out; these rows pair with r5_ab_select_* on the SAME encode)
stage_ab_sort() {
  done_ ab_sort && return 0
  cache_ok "$ENC" || { log "ab_sort: no encode cache"; return 1; }
  log "stage ab_sort"
  timeout 3600 python "$R" --index postings --enc-cache "$ENC" \
    --queries "$QUERIES" --n-postings 256,512 --rescore 1000 \
    --posting-scoring sort --search-batch 256 --key r5_ab_sort \
    >/tmp/r5_ab_sort.log 2>&1 && mark ab_sort
  tail -4 /tmp/r5_ab_sort.log >>"$LOG"
  commit_rows "Same-checkpoint sort control for the round-4f select A/B (r5_ab_sort_p256/p512)"
}

stage_ab_select() {
  done_ ab_select && return 0
  cache_ok "$ENC" || { log "ab_select: no encode cache"; return 1; }
  log "stage ab_select"
  timeout 3600 python "$R" --index postings --enc-cache "$ENC" \
    --queries "$QUERIES" --n-postings 256,512 --rescore 1000 \
    --posting-scoring select --search-batch 256 --key r5_ab_select \
    >/tmp/r5_ab_select.log 2>&1 && mark ab_select
  tail -4 /tmp/r5_ab_select.log >>"$LOG"
  commit_rows "Select re-run with unique keys (r5_ab_select_p256/p512), same encode as the sort control"
}

# -- stage csweep: does a larger candidate pool buy select's recall back?
#    (pre-registered prediction 2, docs/PHASE0_COST_MODEL.md round 5)
stage_csweep() {
  done_ csweep && return 0
  cache_ok "$ENC" || { log "csweep: no encode cache"; return 1; }
  log "stage csweep"
  local ok=1
  # one process sweeps all three C values (the ~15-min per-process
  # compile overhead through the tunnel is paid once, not 3x)
  timeout 5400 python "$R" --index postings --enc-cache "$ENC" \
    --queries "$QUERIES" --n-postings 512 --rescore 2000,4000,8000 \
    --posting-scoring select --search-batch 256 \
    --key r5_select >/tmp/r5_csel.log 2>&1 || ok=0
  tail -6 /tmp/r5_csel.log >>"$LOG"
  # sort control at C=2000 for the pareto (same chunking)
  timeout 3600 python "$R" --index postings --enc-cache "$ENC" \
    --queries "$QUERIES" --n-postings 512 --rescore 2000 \
    --posting-scoring sort --search-batch 256 \
    --key r5_sort_p512_c2000 >/tmp/r5_csort_2000.log 2>&1 || ok=0
  tail -2 /tmp/r5_csort_2000.log >>"$LOG"
  [ "$ok" = 1 ] && mark csweep
  commit_rows "Select C sweep 2000-8000 at P=512 + sort C=2000 control (north-star lever a)"
}

# -- stage selsum: the designed response to the r4f refutation —
#    partial-sum selection over a 4C entry pool (pre-registered in
#    docs/PHASE0_COST_MODEL.md round-5 select_sum section)
stage_selsum() {
  done_ selsum && return 0
  cache_ok "$ENC" || { log "selsum: no encode cache"; return 1; }
  log "stage selsum"
  timeout 3600 python "$R" --index postings --enc-cache "$ENC" \
    --queries "$QUERIES" --n-postings 256,512 --rescore 1000 \
    --posting-scoring select_sum --search-batch 256 --key r5_selsum \
    >/tmp/r5_selsum.log 2>&1 && mark selsum
  tail -4 /tmp/r5_selsum.log >>"$LOG"
  commit_rows "select_sum phase-1 on the zipf cache (partial-sum selection, P=256/512)"
}

# -- stage zipf_tiered: DF-tiered postings on the zipf cache — hot terms
#    hold 97.5% of zipf postings too, so the hot tier may dominate the
#    (recall, QPS) pareto at lower memory than uniform deep P
stage_zipf_tiered() {
  done_ zipf_tiered && return 0
  cache_ok "$ENC" || { log "zipf_tiered: no encode cache"; return 1; }
  log "stage zipf_tiered"
  local ok=1
  timeout 3600 python "$R" --index tiered --enc-cache "$ENC" \
    --queries "$QUERIES" --n-postings 256 --hot-terms 4096 \
    --hot-postings 8192 --rescore 1000 --search-batch 256 \
    --key r5_zipf_tiered_h4096_ph8192 >/tmp/r5_ztier.log 2>&1 || ok=0
  tail -2 /tmp/r5_ztier.log >>"$LOG"
  [ "$ok" = 1 ] && mark zipf_tiered
  commit_rows "Tiered postings on 1M zipf encoder vectors (hot tier depth 8.4K)"
}

# -- stage topenc: encode the 1M TOPICAL corpus (the published ~54-nnz
#    regime where round-4 measured postings 0.502 / cluster 0.316) with
#    the lrun4 checkpoint; the P=512 sort control row rides the encode
stage_topenc() {
  done_ topenc && return 0
  if ! cache_ok "$ENCT"; then
    rm -f "$ENCT"
    log "stage topenc (encode ~30 min)"
    grant_gap
    timeout 5400 python "$R" --index postings --corpus topical \
      --checkpoint "$CKPT" --enc-cache "$ENCT" --queries "$QUERIES" \
      --n-postings 512 --rescore 1000 --posting-scoring sort --search-batch 256 \
      --key r5_topical_sort_p512 >/tmp/r5_topenc.log 2>&1
    tail -4 /tmp/r5_topenc.log >>"$LOG"
  fi
  cache_ok "$ENCT" && mark topenc
  commit_rows "Topical 1M control row on the lrun4 checkpoint (r5_topical_sort_p512)"
}

# -- stage topsweep: deep P + select/big-C in the hot-term regime
#    (VERDICT r4 #2: the most important open design problem)
stage_topsweep() {
  done_ topsweep && return 0
  cache_ok "$ENCT" || { log "topsweep: no topical cache"; return 1; }
  log "stage topsweep"
  local ok=1
  # scatter phase-1: recall-identical to sort, but the compile is a
  # simple [B,N] scatter-add — the E=33K-135K bitonic-sort programs at
  # deep P take 20+ min EACH to compile through the tunnel (measured on
  # the P=512/E=16.9K control this round)
  grant_gap
  timeout 5400 python "$R" --index postings --enc-cache "$ENCT" \
    --queries "$QUERIES" --n-postings 1024,2048,4096 --rescore 1000 \
    --posting-scoring scatter --search-batch 256 \
    --key r5_topical_scatter >/tmp/r5_topsweep.log 2>&1 || ok=0
  tail -6 /tmp/r5_topsweep.log >>"$LOG"
  grant_gap
  timeout 3600 python "$R" --index postings --enc-cache "$ENCT" \
    --queries "$QUERIES" --n-postings 2048 --rescore 4000 \
    --posting-scoring select --search-batch 256 \
    --key r5_topical_select_p2048_c4000 >/tmp/r5_topsel.log 2>&1 || ok=0
  tail -2 /tmp/r5_topsel.log >>"$LOG"
  [ "$ok" = 1 ] && mark topsweep
  commit_rows "Topical 1M deep-P sweep (P=1024-4096) + select/C=4000 point"
}

# -- stage toptiered: the design answer for the hot-term regime —
#    per-term budgets concentrate depth where df demands it
stage_toptiered() {
  done_ toptiered && return 0
  cache_ok "$ENCT" || { log "toptiered: no topical cache"; return 1; }
  log "stage toptiered"
  local ok=1
  grant_gap
  timeout 3600 python "$R" --index tiered --enc-cache "$ENCT" \
    --queries "$QUERIES" --n-postings 512 --hot-terms 4096 \
    --hot-postings 8192 --rescore 2000 --search-batch 256 \
    --key r5_topical_tiered_h4096_ph8192 >/tmp/r5_ttier1.log 2>&1 || ok=0
  tail -2 /tmp/r5_ttier1.log >>"$LOG"
  grant_gap
  timeout 3600 python "$R" --index tiered --enc-cache "$ENCT" \
    --queries "$QUERIES" --n-postings 512 --hot-terms 8192 \
    --hot-postings 16384 --rescore 2000 --search-batch 256 \
    --key r5_topical_tiered_h8192_ph16384 >/tmp/r5_ttier2.log 2>&1 || ok=0
  tail -2 /tmp/r5_ttier2.log >>"$LOG"
  [ "$ok" = 1 ] && mark toptiered
  commit_rows "Tiered postings in the topical hot-term regime (H=4K/8K, P_hot=8K/16K)"
}

# -- stage headline: the north-star capstone at B=1024 in ONE program
#    (the r5 sweep rows ran --search-batch 256 to bound tunnel compiles;
#    the r4f single-program select measured ~2x the chunked QPS, so the
#    pareto's frontier points deserve their unchunked numbers)
stage_headline() {
  done_ headline && return 0
  cache_ok "$ENC" || { log "headline: no encode cache"; return 1; }
  log "stage headline"
  local ok=1
  grant_gap
  timeout 3600 python "$R" --index postings --enc-cache "$ENC" \
    --queries "$QUERIES" --n-postings 512 --rescore 2000 \
    --posting-scoring select \
    --key r5_headline_select_p512_c2000 >/tmp/r5_headline1.log 2>&1 || ok=0
  tail -2 /tmp/r5_headline1.log >>"$LOG"
  grant_gap
  timeout 3600 python "$R" --index postings --enc-cache "$ENC" \
    --queries "$QUERIES" --n-postings 512 --rescore 2000 \
    --posting-scoring select_sum \
    --key r5_headline_selsum_p512_c2000 >/tmp/r5_headline2.log 2>&1 || ok=0
  tail -2 /tmp/r5_headline2.log >>"$LOG"
  [ "$ok" = 1 ] && mark headline
  commit_rows "B=1024 single-program headline rows: select and select_sum at P=512/C=2000"
}

# -- stage profile: phase decomposition at the frontier operating point
#    (VERDICT r4 #4 'Done' criterion: pareto WITH the phase breakdown)
stage_profile() {
  done_ profile && return 0
  cache_ok "$ENC" || { log "profile: no encode cache"; return 1; }
  log "stage profile"
  grant_gap
  timeout 3600 python scripts/profile_search_phases.py --enc-cache "$ENC" \
    --n-postings 512 --rescore 2000 --scoring select \
    --key-suffix select_c2000 >/tmp/r5_profile.log 2>&1 && mark profile
  tail -6 /tmp/r5_profile.log >>"$LOG"
  git add docs/STEP_BREAKDOWN.json 2>/dev/null || true
  git diff --cached --quiet || git commit -q -m "Phase decomposition at the select P=512/C=2000 frontier point" || true
}

# -- stage serving: daemon load test at the round-4 operating point
#    (VERDICT r4 #6: the 3,777 QPS needs a server-level counterpart)
stage_serving() {
  done_ serving && return 0
  log "stage serving"
  grant_gap
  timeout 3000 python scripts/bench_serving.py --checkpoint "$CKPT" \
    --synthetic-docs 1000000 --index postings --n-postings 256 \
    --rescore 1000 --clients 128 --requests 2048 \
    >/tmp/r5_serving.log 2>&1
  # persist the JSON line under its own key
  python - <<'EOF' && mark serving
import json, pathlib
log = pathlib.Path("/tmp/r5_serving.log").read_text().strip().splitlines()
rows = [json.loads(x) for x in log if x.startswith("{")]
assert rows, "no JSON line in serving log"
row = rows[-1]
row["note"] = ("round-5 re-measure at the round-4 operating point "
               "P=256/C=1000/sort/match, 1M synthetic-zipf docs, real "
               "149M encoder per query, 128 clients")
p = pathlib.Path("docs/SERVING_LOAD.json")
d = json.loads(p.read_text())
d["r5_operating_point_1m"] = row
p.write_text(json.dumps(d, indent=2))
print("wrote docs/SERVING_LOAD.json [r5_operating_point_1m]")
EOF
  tail -3 /tmp/r5_serving.log >>"$LOG"
  commit_rows "Serving-daemon load test at the round-4 operating point (r5_operating_point_1m)"
}

# -- stage serving2: the same daemon at the round-5 frontier point
#    (select P=512/C=2000 — the best >=0.95-recall config from the C
#    sweep), so the headline pareto has a server-level counterpart too
stage_serving2() {
  done_ serving2 && return 0
  log "stage serving2"
  grant_gap
  timeout 3000 python scripts/bench_serving.py --checkpoint "$CKPT" \
    --synthetic-docs 1000000 --index postings --n-postings 512 \
    --rescore 2000 --posting-scoring select --clients 128 --requests 2048 \
    >/tmp/r5_serving2.log 2>&1
  python - <<'EOF' && mark serving2
import json, pathlib
log = pathlib.Path("/tmp/r5_serving2.log").read_text().strip().splitlines()
rows = [json.loads(x) for x in log if x.startswith("{")]
assert rows, "no JSON line in serving2 log"
row = rows[-1]
row["note"] = ("round-5 frontier operating point P=512/C=2000/select/"
               "match (0.9555 recall vs exact in the C sweep), 1M "
               "synthetic-zipf docs, real 149M encoder per query, "
               "128 clients")
p = pathlib.Path("docs/SERVING_LOAD.json")
d = json.loads(p.read_text())
d["r5_frontier_select_1m"] = row
p.write_text(json.dumps(d, indent=2))
print("wrote docs/SERVING_LOAD.json [r5_frontier_select_1m]")
EOF
  tail -3 /tmp/r5_serving2.log >>"$LOG"
  commit_rows "Serving-daemon load test at the round-5 frontier point (r5_frontier_select_1m)"
}

# -- stage bench: cold-process bench.py capture (LAST: value already known)
stage_bench() {
  done_ bench && return 0
  log "stage bench"
  grant_gap
  timeout 2400 python bench.py >/tmp/r5_bench.json 2>/tmp/r5_bench.log \
    && mark bench
  cat /tmp/r5_bench.json >>"$LOG" 2>/dev/null
}

stage_encode
stage_ab_sort
stage_ab_select
stage_csweep
stage_selsum
stage_zipf_tiered
stage_topenc
stage_topsweep
stage_toptiered
stage_headline
stage_profile
stage_serving
stage_serving2
stage_bench
log "all stages attempted"

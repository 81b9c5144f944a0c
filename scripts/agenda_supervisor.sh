#!/usr/bin/env bash
# Self-starting chip-agenda supervisor (VERDICT r3 #5): launch at session
# start, keep relaunching the round agenda until every stage has its done
# marker or the deadline passes. The agenda itself gates on a tunnel
# liveness probe, so during an outage this just cycles probes; when the
# relay revives mid-round the stages fire with no builder interaction.
#
#   bash scripts/agenda_supervisor.sh [AGENDA] [DEADLINE_EPOCH]
set -uo pipefail
cd "$(dirname "$0")/.."
AGENDA=${1:-scripts/round4_tpu_agenda.sh}
DEADLINE=${2:-$(($(date +%s) + 39600))}   # default: 11h from launch
STAGES=${STAGES:-"encode postings_deep cluster_deep cluster_sweep topical bench"}
PREFIX=${PREFIX:-r4}   # done-marker prefix: /tmp/${PREFIX}_done_<stage>
LOG=/tmp/agenda_supervisor.log
echo "[supervisor] start $(date -u +%F-%T) agenda=$AGENDA deadline=$DEADLINE" >>"$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  all_done=1
  for s in $STAGES; do [ -f "/tmp/${PREFIX}_done_$s" ] || all_done=0; done
  if [ "$all_done" = 1 ]; then
    echo "[supervisor] all stages done $(date -u +%F-%T)" >>"$LOG"
    exit 0
  fi
  bash "$AGENDA"
  rc=$?
  echo "[supervisor] agenda exited rc=$rc $(date -u +%F-%T); sleeping 60s" >>"$LOG"
  sleep 60
done
echo "[supervisor] deadline reached $(date -u +%F-%T)" >>"$LOG"

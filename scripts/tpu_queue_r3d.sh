#!/bin/bash
# Round-3 survey-demo refresh, cut-tolerant ordering: one invocation per
# method, most-stale/most-volatile rows first (HAT's r1 10.00 row is the
# one VERDICT Weak #1 flags), so a deadline cut still refreshes the rows
# that matter. SUCCESS flags make later invocations skip the shared SI
# base dump. Render + capability sweep at the end.
#
# Usage: bash scripts/tpu_queue_r3d.sh <deadline_epoch_secs>
set -u
cd /root/repo
LOGDIR=clsurvey_runs/logs
mkdir -p "$LOGDIR"
DEADLINE=${1:?pass absolute deadline epoch}
QLOG="$LOGDIR/r3d_queue.jsonl"

relay_ok() {
  ss -ltn 2>/dev/null | grep -q ':8082 ' || return 1
  timeout 180 python -c 'import jax; jax.devices()' >/dev/null 2>&1
}

run_item() {  # name cap_secs cmd...
  local name="$1" cap="$2"; shift 2
  local now; now=$(date +%s)
  if (( now + 300 >= DEADLINE )); then
    echo "{\"item\": \"$name\", \"status\": \"skipped_deadline\", \"t\": $now}" >> "$QLOG"
    return 1
  fi
  local remain=$(( DEADLINE - now - 240 ))
  (( cap > remain )) && cap=$remain
  for _ in 1 2 3 4 5 6; do relay_ok && break || sleep 300; done
  if ! relay_ok; then
    echo "{\"item\": \"$name\", \"status\": \"relay_down\", \"t\": $(date +%s)}" >> "$QLOG"
    return 1
  fi
  echo "{\"item\": \"$name\", \"status\": \"start\", \"t\": $(date +%s), \"cap\": $cap}" >> "$QLOG"
  timeout "$cap" "$@" > "$LOGDIR/r3d_${name}.log" 2>&1
  local rc=$?
  echo "{\"item\": \"$name\", \"status\": \"done\", \"rc\": $rc, \"t\": $(date +%s)}" >> "$QLOG"
  sleep 180
  return 0
}

DEMO="--tasks 10 --classes 10 --epochs 12 --batch_size 100 --out docs/survey_demo"

# volatile rows first, then the cheap stable ones, then the slow mask pair
for m in HAT SI GEM packnet EBLL LWF finetuning EWC MAS ICARL \
         finetuning_rehearsal_partial_mem finetuning_rehearsal_full_mem \
         mean_IMM mode_IMM joint pathnet; do
  run_item "refresh_$m" 3600 python scripts/run_survey_demo.py $DEMO \
    --methods "$m"
done

run_item demo_render 900 python scripts/run_survey_demo.py $DEMO \
  --postprocess_only

run_item capability 1500 python scripts/bench_capability.py

echo "{\"item\": \"_queue\", \"status\": \"complete\", \"t\": $(date +%s)}" >> "$QLOG"

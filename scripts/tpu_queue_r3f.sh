#!/bin/bash
# Round-3 stretch queue (launch only if r3e drains early): distillation
# family at the hard-mode protocol budget (VERDICT r2 Weak #7 — LwF/EBLL
# have never been shown in their good regime). Same protocol + hyperparams
# as the hd200 core study (tpu_queue_r3.sh); artifacts merge into
# docs/soak_hd200 via the status-merge path in run_survey_demo.py.
#
# Usage: bash scripts/tpu_queue_r3f.sh <deadline_epoch>
set -u
cd /root/repo
LOGDIR=clsurvey_runs/logs
mkdir -p "$LOGDIR"
DEADLINE=${1:?pass absolute deadline epoch}
QLOG="$LOGDIR/r3f_queue.jsonl"

relay_ok() {
  ss -ltn 2>/dev/null | grep -q ':8082 ' || return 1
  timeout 180 python -c 'import jax; jax.devices()' >/dev/null 2>&1
}

commit_docs() {
  git add docs/ 2>/dev/null || return 0
  git diff --cached --quiet 2>/dev/null && return 0
  git commit -q -m "TPU queue artifact: $1

No-Verification-Needed: run-artifact/docs-only commit from the serialized TPU queue" \
    2>/dev/null || true
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
  timeout "$cap" "$@" > "$LOGDIR/r3f_${name}.log" 2>&1
  local rc=$?
  echo "{\"item\": \"$name\", \"status\": \"done\", \"rc\": $rc, \"t\": $(date +%s)}" >> "$QLOG"
  commit_docs "$name"
  sleep 180
  return 0
}

PROTO="--tasks 10 --classes 20 --n 400 --epochs 70 --batch_size 200 \
 --max_attempts 10 --lr_grid 1e-2,5e-3,1e-3,5e-4,1e-4 \
 --boot_lr_grid 1e-1,5e-2,1e-2,5e-3,1e-3,5e-4,1e-4"

run_item hd200_lwf 4500 python scripts/run_survey_demo.py $PROTO \
  --ds_suffix _hd200 --methods LWF --out docs/soak_hd200
run_item hd200_ebll 6000 python scripts/run_survey_demo.py $PROTO \
  --ds_suffix _hd200 --shp 'EBLL=0.01;50;1e-1,1e-2;100,300' \
  --methods EBLL --out docs/soak_hd200

echo "{\"item\": \"_queue\", \"status\": \"complete\", \"t\": $(date +%s)}" >> "$QLOG"

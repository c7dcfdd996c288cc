#!/bin/bash
# Round-4 opening TPU queue: complete the 16-row hard-mode protocol
# table (VERDICT r2 Missing #4 / r3 handoff). Runs the methods that
# still lack a `_hd200` 70-epoch protocol-budget row, value-ordered:
# distillation first (the family with no good-regime datapoint), then
# replay, masks, IMM, joint. Every item merges into docs/soak_hd200 via
# run_survey_demo.py's per-method status merge, commits as it lands,
# and resumes from SUCCESS flags if a cap or the driver cuts it.
#
# Cost model (measured r3, uncontended chip): ~1.5-4 ks/method at this
# budget (SI 1,468 s; GEM 5,169 s on the separable set). With an ~4 h
# session, expect 4-7 items; relaunch for the tail.
#
# Usage: bash scripts/tpu_queue_r4.sh <deadline_epoch> [wait_pid]
set -u
cd /root/repo
LOGDIR=clsurvey_runs/logs
mkdir -p "$LOGDIR"
DEADLINE=${1:?pass absolute deadline epoch}
WAITPID=${2:-}
QLOG="$LOGDIR/r4_queue.jsonl"

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
  timeout "$cap" "$@" > "$LOGDIR/r4_${name}.log" 2>&1
  local rc=$?
  echo "{\"item\": \"$name\", \"status\": \"done\", \"rc\": $rc, \"t\": $(date +%s)}" >> "$QLOG"
  commit_docs "$name"
  sleep 180
  return 0
}

if [[ -n "$WAITPID" ]]; then
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 30; done
fi

# Same flags as the r3 hd200 core study so rows merge into one table.
PROTO="--tasks 10 --classes 20 --n 400 --epochs 70 --batch_size 200 \
 --max_attempts 10 --lr_grid 1e-2,5e-3,1e-3,5e-4,1e-4 \
 --boot_lr_grid 1e-1,5e-2,1e-2,5e-3,1e-3,5e-4,1e-4 \
 --ds_suffix _hd200 --out docs/soak_hd200"

# Distillation family (no good-regime datapoint anywhere yet). LWF is
# near-free if the r3j queue already landed it (SUCCESS-flag resume).
run_item hd200_lwf 5000 python scripts/run_survey_demo.py $PROTO --methods LWF
run_item hd200_ebll 6500 python scripts/run_survey_demo.py $PROTO \
  --shp 'EBLL=0.01;50;1e-1,1e-2;100,300' --methods EBLL

# Replay family.
run_item hd200_icarl 6500 python scripts/run_survey_demo.py $PROTO --methods ICARL
run_item hd200_gem 7000 python scripts/run_survey_demo.py $PROTO --methods GEM
run_item hd200_rehearsal 6500 python scripts/run_survey_demo.py $PROTO \
  --methods finetuning_rehearsal_full_mem
run_item hd200_render1 600 python scripts/run_survey_demo.py $PROTO --postprocess_only

# Mask family.
run_item hd200_packnet 6000 python scripts/run_survey_demo.py $PROTO --methods packnet
run_item hd200_hat 6500 python scripts/run_survey_demo.py $PROTO --methods HAT
run_item hd200_pathnet 6500 python scripts/run_survey_demo.py $PROTO --methods pathnet

# IMM + remaining baselines + joint upper bound.
run_item hd200_imm 6500 python scripts/run_survey_demo.py $PROTO \
  --methods mean_IMM,mode_IMM
run_item hd200_partial 6500 python scripts/run_survey_demo.py $PROTO \
  --methods finetuning_rehearsal_partial_mem
run_item hd200_joint 5000 python scripts/run_survey_demo.py $PROTO --methods joint

run_item hd200_render2 600 python scripts/run_survey_demo.py $PROTO --postprocess_only

echo "{\"item\": \"_queue\", \"status\": \"complete\", \"t\": $(date +%s)}" >> "$QLOG"

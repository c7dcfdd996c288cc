#!/bin/bash
# Round-3 fourth-session TPU queue. Chains after r3i (which stops at its
# 07:00 deadline) with the session-4 budget: the two remaining SURVEY
# coverage items first (streaming-224 proof -> item 34, RecogSeq scale
# -> item 35; both framework runs resume from SUCCESS flags so a cap cut
# loses little), then the survey-demo tail (pathnet + partial-mem) and a
# finisher pass for any method the r3i cheap block's cap cut, then the
# distillation-family protocol-budget run (VERDICT r2 Weak #7), renders
# between the big items so the committed table reflects whatever landed.
#
# Usage: bash scripts/tpu_queue_r3j.sh <deadline_epoch> [wait_pid]
set -u
cd /root/repo
LOGDIR=clsurvey_runs/logs
mkdir -p "$LOGDIR"
DEADLINE=${1:?pass absolute deadline epoch}
WAITPID=${2:-}
QLOG="$LOGDIR/r3j_queue.jsonl"

relay_ok() {
  ss -ltn 2>/dev/null | grep -q ':8082 ' || return 1
  timeout 180 python -c 'import jax; jax.devices()' >/dev/null 2>&1
}

commit_docs() {  # narrow, race-tolerant artifact commit
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
  timeout "$cap" "$@" > "$LOGDIR/r3j_${name}.log" 2>&1
  local rc=$?
  echo "{\"item\": \"$name\", \"status\": \"done\", \"rc\": $rc, \"t\": $(date +%s)}" >> "$QLOG"
  commit_docs "$name"
  sleep 180   # tunnel-release gap before the next chip process
  return 0
}

# 0. Wait for r3i to finish/stop at its own deadline.
if [[ -n "$WAITPID" ]]; then
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 30; done
fi
commit_docs "r3i_leftovers"
sleep 120

DEMO="--tasks 10 --classes 10 --epochs 12 --batch_size 100 --out docs/survey_demo"

# 1. Streaming-224 proof (coverage item 34): resumes the 4-epoch run
#    whose task 1 is already trained; ~2 min/epoch contended.
if [[ ! -f docs/streaming224.json ]]; then
  run_item streaming224 4200 python scripts/demo_streaming_224.py --epochs 4
fi

# 2. Finisher for the cheap-block methods r3i's cap cut (SUCCESS flags
#    make already-refreshed methods near-free) — VERDICT r2's #1 item is
#    a truthful, complete survey-demo table.
run_item refresh_cheap_finish 2400 python scripts/run_survey_demo.py $DEMO \
  --methods EWC,MAS,mean_IMM,mode_IMM,LWF,EBLL,ICARL,packnet,finetuning,finetuning_rehearsal_full_mem,joint

# 3. Survey-demo tail: the two rows the r3i queue never reached.
run_item refresh_tail 2400 python scripts/run_survey_demo.py $DEMO \
  --methods pathnet,finetuning_rehearsal_partial_mem

# 4. Render the complete 16-row table.
run_item demo_render 600 python scripts/run_survey_demo.py $DEMO --postprocess_only

# 5. RecogSeq at-scale demo (coverage item 35; framework SUCCESS flags
#    make a deadline-clamped partial run resumable next session).
run_item recogseq 3600 python scripts/demo_recogseq_scale.py --epochs 8

# 6. Streaming-vs-resident overlap micro-bench on the chip (Weak #4),
#    in case r3i's deadline-clamped attempt was cut.
run_item bench_streaming 900 python scripts/bench_streaming.py

# 7. Distillation family at the hd200 protocol budget (Weak #7; same
#    flags as the r3 core study so the row merges into docs/soak_hd200).
PROTO="--tasks 10 --classes 20 --n 400 --epochs 70 --batch_size 200 \
 --max_attempts 10 --lr_grid 1e-2,5e-3,1e-3,5e-4,1e-4 \
 --boot_lr_grid 1e-1,5e-2,1e-2,5e-3,1e-3,5e-4,1e-4"
run_item hd200_lwf 5000 python scripts/run_survey_demo.py $PROTO \
  --ds_suffix _hd200 --methods LWF --out docs/soak_hd200

# 8. Capability sweep (stretch item 8) + final render.
run_item capability 1500 python scripts/bench_capability.py
run_item demo_render2 600 python scripts/run_survey_demo.py $DEMO --postprocess_only

echo "{\"item\": \"_queue\", \"status\": \"complete\", \"t\": $(date +%s)}" >> "$QLOG"

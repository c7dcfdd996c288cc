#!/bin/bash
# Round-3 second-session TPU queue (fresh VM: the earlier session's run
# state is gone; only committed artifacts survive). Serialized items,
# relay health gate, timeout caps, 180 s tunnel-release gaps, absolute
# deadline so the driver's end-of-round bench.py can always get the chip.
#
# Priorities (VERDICT r2 "Next round" #1 and #5):
#   smoke gate -> timing_mode -> streaming-224 -> recogseq-scale ->
#   16-method survey-demo refresh (split: volatile rows first, rest
#   second, render third, so a deadline cut still leaves usable rows).
#
# Usage: bash scripts/tpu_queue_r3c.sh <deadline_epoch_secs>
set -u
cd /root/repo
LOGDIR=clsurvey_runs/logs
mkdir -p "$LOGDIR"
DEADLINE=${1:?pass absolute deadline epoch}
QLOG="$LOGDIR/r3c_queue.jsonl"

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
  timeout "$cap" "$@" > "$LOGDIR/r3c_${name}.log" 2>&1
  local rc=$?
  echo "{\"item\": \"$name\", \"status\": \"done\", \"rc\": $rc, \"t\": $(date +%s)}" >> "$QLOG"
  sleep 180   # tunnel-release gap before the next chip process
  return 0
}

# 0. TPU smoke subset at HEAD (incl. the Pallas normalize kernel) —
#    cheap insurance before committing 3 h of chip time to this tree.
run_item smoke 1200 env CLSURVEY_TEST_TPU=1 python -m pytest -m smoke -q

# 1. timing_mode per-phase wall-clock (VERDICT Missing #5; the reference's
#    timing protocol, ref:src/framework/main.py:289-300).
run_item timing_mode 4500 python scripts/run_timing_mode.py
run_item timing_render 300 python scripts/run_timing_mode.py --collect_only

# 2-3. 224px at-scale demos (flip SURVEY coverage items 34/35 to full).
run_item streaming224 3600 python scripts/demo_streaming_224.py
run_item recogseq 4200 python scripts/demo_recogseq_scale.py --epochs 12

# 4-6. 16-method survey-demo refresh at HEAD (kills the stale HAT 10.00
#    row; VERDICT Weak #1). Volatile rows first so a deadline cut still
#    refreshes the rows that changed since r1; SUCCESS flags make the
#    second invocation skip nothing it needs.
run_item demo_refresh_a 10800 python scripts/run_survey_demo.py \
  --tasks 10 --classes 10 --epochs 12 --batch_size 100 \
  --methods HAT,SI,GEM,packnet,pathnet,EBLL --out docs/survey_demo
run_item demo_refresh_b 10800 python scripts/run_survey_demo.py \
  --tasks 10 --classes 10 --epochs 12 --batch_size 100 \
  --methods EWC,MAS,mean_IMM,mode_IMM,LWF,ICARL,finetuning,finetuning_rehearsal_partial_mem,finetuning_rehearsal_full_mem,joint \
  --out docs/survey_demo
run_item demo_render 600 python scripts/run_survey_demo.py \
  --tasks 10 --classes 10 --epochs 12 --batch_size 100 \
  --postprocess_only --out docs/survey_demo

# 7. Capability sweep refresh (short; PERF.md table) if time remains.
run_item capability 1500 python scripts/bench_capability.py

echo "{\"item\": \"_queue\", \"status\": \"complete\", \"t\": $(date +%s)}" >> "$QLOG"

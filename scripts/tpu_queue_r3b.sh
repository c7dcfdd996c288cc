#!/bin/bash
# Round-3 second-half TPU queue (reprioritized after hd200_core hit its
# cap): resume hd200_core's finetuning tail, then the two 224px-at-scale
# demos (SURVEY coverage items 34/35), the 16-method survey-demo refresh
# (kills the stale HAT 10.00 row), timing_mode, and finally the hd200
# replay/distillation batch with whatever chip time remains.
#
# Same discipline as tpu_queue_r3.sh: serialized items, relay health
# gate, timeout caps, 180 s tunnel-release gaps, absolute deadline so the
# driver's end-of-round bench.py can always get the chip.
#
# Usage: bash scripts/tpu_queue_r3b.sh <deadline_epoch_secs>
set -u
cd /root/repo
LOGDIR=clsurvey_runs/logs
mkdir -p "$LOGDIR"
DEADLINE=${1:?pass absolute deadline epoch}
QLOG="$LOGDIR/r3b_queue.jsonl"

PROTO="--tasks 10 --classes 20 --n 400 --epochs 70 --batch_size 200 \
 --max_attempts 10 --lr_grid 1e-2,5e-3,1e-3,5e-4,1e-4 \
 --boot_lr_grid 1e-1,5e-2,1e-2,5e-3,1e-3,5e-4,1e-4"
HD_HP='--hp HAT=800,2.5 --hp packnet=0.9 --shp GEM=1024 --shp ICARL=1024
 --shp finetuning_rehearsal_partial_mem=1024
 --shp finetuning_rehearsal_full_mem=1024
 --shp EBLL=0.01;50;1e-1,1e-2;100,300 --shp pathnet=20;35'

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
  timeout "$cap" "$@" > "$LOGDIR/r3b_${name}.log" 2>&1
  local rc=$?
  echo "{\"item\": \"$name\", \"status\": \"done\", \"rc\": $rc, \"t\": $(date +%s)}" >> "$QLOG"
  sleep 180
  return 0
}

# 1. Resume hd200_core's cap-cut tail (SUCCESS flags skip finished work;
#    finishes finetuning tasks 7-10 + the 4-method eval matrices + doc).
run_item hd200_core_resume 5400 python scripts/run_survey_demo.py $PROTO \
  --ds_suffix _hd200 $HD_HP \
  --methods finetuning,SI,EWC,MAS --out docs/soak_hd200

# 2-3. 224px at-scale demos (flip SURVEY coverage items 34/35 to full).
run_item streaming224 5400 python scripts/demo_streaming_224.py
run_item recogseq 6000 python scripts/demo_recogseq_scale.py

# 4. 16-method survey demo refresh at HEAD (kills the stale HAT 10.00 row).
run_item demo_refresh 9600 python scripts/run_survey_demo.py \
  --tasks 10 --classes 10 --epochs 12 --batch_size 100 \
  --out docs/survey_demo

# 5. timing_mode per-phase wall-clock (the reference's timing protocol).
run_item timing_mode 4500 python scripts/run_timing_mode.py

# 6. Capability table: bs in {200,256,512} with MFU (short; PERF.md).
run_item capability 1500 python scripts/bench_capability.py

# 7. hd200 replay + distillation batch with whatever remains.
run_item hd200_b2 14400 python scripts/run_survey_demo.py $PROTO \
  --ds_suffix _hd200 $HD_HP \
  --methods GEM,LWF,EBLL,ICARL --out docs/soak_hd200

# 8. hd200 mask batch (almost certainly deadline-skipped; kept for resume).
run_item hd200_b3 14400 python scripts/run_survey_demo.py $PROTO \
  --ds_suffix _hd200 $HD_HP \
  --methods packnet,HAT,finetuning_rehearsal_partial_mem,finetuning_rehearsal_full_mem \
  --out docs/soak_hd200

echo "{\"item\": \"_queue\", \"status\": \"complete\", \"t\": $(date +%s)}" >> "$QLOG"

#!/bin/bash
# Round-3 serialized TPU work queue (one chip process at a time —
# CLAUDE.md: two processes can't share the chip). Each item:
#   relay health gate -> timeout-capped run -> 180 s tunnel-release gap.
# A global deadline stops new launches so the end-of-round bench.py can
# always get the chip.
#
# Usage: bash scripts/tpu_queue_r3.sh [deadline_hours]
set -u
cd /root/repo
LOGDIR=clsurvey_runs/logs
mkdir -p "$LOGDIR"
DEADLINE=$(( $(date +%s) + ${1:-9}*3600 + 30*60 ))   # default 9.5 h
QLOG="$LOGDIR/r3_queue.jsonl"

PROTO="--tasks 10 --classes 20 --n 400 --epochs 70 --batch_size 200 \
 --max_attempts 10 --lr_grid 1e-2,5e-3,1e-3,5e-4,1e-4 \
 --boot_lr_grid 1e-1,5e-2,1e-2,5e-3,1e-3,5e-4,1e-4"
# reference-parity hyperparams for the protocol-budget hd200 sweep
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
  # relay health gate (retry for up to 30 min)
  for _ in 1 2 3 4 5 6; do relay_ok && break || sleep 300; done
  if ! relay_ok; then
    echo "{\"item\": \"$name\", \"status\": \"relay_down\", \"t\": $(date +%s)}" >> "$QLOG"
    return 1
  fi
  echo "{\"item\": \"$name\", \"status\": \"start\", \"t\": $(date +%s), \"cap\": $cap}" >> "$QLOG"
  timeout "$cap" "$@" > "$LOGDIR/r3_${name}.log" 2>&1
  local rc=$?
  echo "{\"item\": \"$name\", \"status\": \"done\", \"rc\": $rc, \"t\": $(date +%s)}" >> "$QLOG"
  sleep 180   # tunnel-release gap before the next chip process
  return 0
}

# 1. SI protocol-budget rerun on the default synthetic set (refreshes the
#    flagged 20.02 row; post-divergence-guard).
run_item si_rerun 7200 python scripts/run_survey_demo.py $PROTO \
  --methods SI --out docs/soak_si_rerun

# 2. hd200 ordering study, core families first (importance vs baseline —
#    the rows that rehabilitate importance > finetune).
run_item hd200_core 16200 python scripts/run_survey_demo.py $PROTO \
  --ds_suffix _hd200 $HD_HP \
  --methods finetuning,SI,EWC,MAS --out docs/soak_hd200

# 3. 16-method survey demo refresh at HEAD (kills the stale HAT 10.00 row).
run_item demo_refresh 10800 python scripts/run_survey_demo.py \
  --tasks 10 --classes 10 --epochs 12 --batch_size 100 \
  --out docs/survey_demo

# 4. timing_mode per-phase wall-clock (the reference's timing protocol).
run_item timing_mode 5400 python scripts/run_timing_mode.py

# 5. 224px at-scale demos (streaming epochs > HBM budget; RecogSeq shape).
run_item streaming224 5400 python scripts/demo_streaming_224.py
run_item recogseq 7200 python scripts/demo_recogseq_scale.py

# 6. hd200 study: remaining methods in family-priority order.
run_item hd200_b2 14400 python scripts/run_survey_demo.py $PROTO \
  --ds_suffix _hd200 $HD_HP \
  --methods LWF,GEM,ICARL,EBLL --out docs/soak_hd200

run_item hd200_b3 14400 python scripts/run_survey_demo.py $PROTO \
  --ds_suffix _hd200 $HD_HP \
  --methods packnet,HAT,finetuning_rehearsal_partial_mem,finetuning_rehearsal_full_mem \
  --out docs/soak_hd200

run_item hd200_b4 14400 python scripts/run_survey_demo.py $PROTO \
  --ds_suffix _hd200 $HD_HP \
  --methods mean_IMM,mode_IMM,pathnet,joint --out docs/soak_hd200

echo "{\"item\": \"_queue\", \"status\": \"complete\", \"t\": $(date +%s)}" >> "$QLOG"

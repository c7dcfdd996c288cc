#!/bin/bash
# Parameterized serialized TPU queue runner (replaces the ten one-shot
# tpu_queue_r3*.sh scripts — VERDICT r3 #8 / ADVICE consolidation).
#
# Usage: bash scripts/tpu_queue.sh <deadline_epoch> <queue_file> [wait_pid]
#
# queue_file lines:   <name>|<cap_secs>|<shell command>
#   - consumed strictly in order; the file MAY BE APPENDED while the
#     queue runs (new work without restarting the runner)
#   - blank lines / leading-# comments are skipped
#   - a line consisting of "END" terminates the queue when reached;
#     until then an exhausted file polls for appended items
#   - items named cpu_* or *render* are chip-free (commands must force
#     CPU, e.g. run_survey_demo --cpu): they skip the relay gate + tunnel
#     gap AND still run inside the deadline-300 window, so a deadline cut
#     can't lose a completed method's rows for want of a render
#
# Caps are budgeted off measured-CONTENDED costs (2-2.5x uncontended —
# CLAUDE.md queue-cap sizing lesson); prefer many small items, each of
# which merges its artifact on partial completion.
set -u
cd /root/repo
DEADLINE=${1:?pass absolute deadline epoch}
QFILE=${2:?pass queue file}
WAITPID=${3:-}
QTAG=$(basename "$QFILE" .queue)
QLOG=clsurvey_runs/logs/${QTAG}.jsonl
source scripts/tpu_queue_lib.sh
IDX_FILE=$LOGDIR/${QTAG}.idx
[[ -f "$IDX_FILE" ]] || echo 0 > "$IDX_FILE"

if [[ -n "$WAITPID" ]]; then
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 30; done
fi

while :; do
  now=$(date +%s)
  if (( now >= DEADLINE )); then
    echo "{\"item\": \"_queue\", \"status\": \"deadline\", \"t\": $now}" >> "$QLOG"
    break
  fi
  idx=$(cat "$IDX_FILE")
  total=$(wc -l < "$QFILE")
  if (( idx >= total )); then
    sleep 30
    continue
  fi
  line=$(sed -n "$((idx + 1))p" "$QFILE")
  echo $((idx + 1)) > "$IDX_FILE"
  [[ "$line" == "END" ]] && {
    echo "{\"item\": \"_queue\", \"status\": \"complete\", \"t\": $(date +%s)}" >> "$QLOG"
    break
  }
  [[ -z "$line" || "$line" == \#* ]] && continue
  name=${line%%|*}; rest=${line#*|}; cap=${rest%%|*}; cmd=${rest#*|}
  if (( now + 300 >= DEADLINE )) && ! is_cpu_item "$name"; then
    # rewind the idx so this TPU item stays PENDING for a relaunched
    # runner with an extended deadline (ADVICE r4: advancing here
    # silently consumed every remaining TPU line), then idle out the
    # deadline window — any later CPU/render items are covered by the
    # end-of-session out-of-band render
    echo "$idx" > "$IDX_FILE"
    echo "{\"item\": \"$name\", \"status\": \"skipped_deadline\", \"t\": $now}" >> "$QLOG"
    sleep 60
    continue
  fi
  run_item "$name" "$cap" bash -c "$cmd"
  rc=$?
  if (( rc == 2 )); then
    # run_item hit the deadline window after its relay wait: same rewind
    echo "$idx" > "$IDX_FILE"
    sleep 60
  elif (( rc == 1 )); then
    # relay/chip down after the full retry budget: keep the item PENDING
    # and keep gating — the relay can only be restored externally (r2),
    # and consuming items while the chip is dead churns the whole queue
    # into relay_down lines (r5 wedge)
    echo "$idx" > "$IDX_FILE"
    sleep 120
  elif (( rc == 3 )); then
    # wedge_kill: the payload froze at first compute (intermittent r5
    # wedge) and was killed after 10 min — retry the same item
    echo "$idx" > "$IDX_FILE"
  fi
done

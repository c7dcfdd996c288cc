# Shared helpers for the serialized TPU queues (sourced, not executed).
#
# The chip admits ONE process at a time (CLAUDE.md: a second process
# stalls ~4 min then dies), so all TPU work runs through run_item:
# relay health-gate -> capped run -> docs commit -> 180 s tunnel-release
# gap. Callers must set DEADLINE (absolute epoch) and QLOG (jsonl path)
# before sourcing; QTAG names the per-item logs.

LOGDIR=clsurvey_runs/logs
mkdir -p "$LOGDIR"

# The axon relay pumps local port 8082 to the external orchestrator and
# cannot be restarted from inside the VM — gate every item on a live
# port + a tiny jax probe (r2: the relay died mid-round and every new
# client stalled forever in connect backoff).
relay_ok() {
  # Cheap liveness only (port + handshake). The r5 wedge strikes
  # individual clients at first COMPUTE (futex-wait on an RPC reply,
  # intermittent — one client hangs while a concurrently-started one
  # succeeds), so no pre-flight probe can clear an item: the payload
  # itself is watchdogged instead (see run_item).
  ss -ltn 2>/dev/null | grep -q ':8082 ' || return 1
  timeout 120 python -c 'import jax; jax.devices()' >/dev/null 2>&1
}

commit_docs() {
  git add docs/ 2>/dev/null || return 0
  git diff --cached --quiet 2>/dev/null && return 0
  git commit -q -m "TPU queue artifact: $1

No-Verification-Needed: run-artifact/docs-only commit from the serialized TPU queue" \
    2>/dev/null || true
}

# Items that never touch the chip (renders forced to CPU via
# run_survey_demo --cpu) are named cpu_* or *render*: they skip the relay
# gate and the tunnel-release gap, and — unlike TPU items — still run
# inside the deadline-300 window, so a deadline cut can't lose a
# completed method's rows for want of a render (r5 lesson).
is_cpu_item() { [[ "$1" == cpu_* || "$1" == *render* ]]; }

run_item() {  # name cap_secs cmd...
  local name="$1" cap="$2"; shift 2
  local now; now=$(date +%s)
  if ! is_cpu_item "$name"; then
    if (( now + 300 >= DEADLINE )); then
      echo "{\"item\": \"$name\", \"status\": \"skipped_deadline\", \"t\": $now}" >> "$QLOG"
      return 2
    fi
    for _ in 1 2 3 4 5 6; do relay_ok && break || sleep 300; done
    if ! relay_ok; then
      echo "{\"item\": \"$name\", \"status\": \"relay_down\", \"t\": $(date +%s)}" >> "$QLOG"
      return 1
    fi
    # Recompute the remaining budget AFTER the relay wait (it can sleep up
    # to ~25 min): an item started late must still respect the deadline —
    # the driver gets the chip back no matter what (ADVICE r3).
    now=$(date +%s)
    if (( now + 300 >= DEADLINE )); then
      echo "{\"item\": \"$name\", \"status\": \"skipped_deadline\", \"t\": $now}" >> "$QLOG"
      return 2
    fi
  fi
  local slack=240; is_cpu_item "$name" && slack=30
  local remain=$(( DEADLINE - now - slack ))
  (( remain < 1 )) && remain=1
  (( cap > remain )) && cap=$remain
  echo "{\"item\": \"$name\", \"status\": \"start\", \"t\": $now, \"cap\": $cap}" >> "$QLOG"
  local log="$LOGDIR/${QTAG}_${name}.log"
  # Wedge watchdog (r5): run the payload unbuffered in its own process
  # group; if the log stays FROZEN for 600 s the client has hit the
  # intermittent first-compute wedge (a healthy protocol run prints an
  # epoch line every few seconds and its silent phases — datagen,
  # remote compile — are minutes, not ten). Kill the group and return 3
  # so the caller rewinds and retries the item instead of burning the
  # full cap on a dead client.
  PYTHONUNBUFFERED=1 setsid timeout "$cap" "$@" > "$log" 2>&1 &
  local pay=$!
  local frozen=0 last=-1 sz rc
  while kill -0 "$pay" 2>/dev/null; do
    sleep 30
    sz=$(stat -c%s "$log" 2>/dev/null || echo 0)
    if (( sz == last )); then frozen=$(( frozen + 30 )); else frozen=0; last=$sz; fi
    if (( frozen >= 600 )) && ! is_cpu_item "$name"; then
      kill -TERM -- -"$pay" 2>/dev/null; sleep 5
      kill -KILL -- -"$pay" 2>/dev/null
      echo "{\"item\": \"$name\", \"status\": \"wedge_kill\", \"t\": $(date +%s)}" >> "$QLOG"
      commit_docs "$name"
      sleep 60
      return 3
    fi
  done
  wait "$pay"; rc=$?
  echo "{\"item\": \"$name\", \"status\": \"done\", \"rc\": $rc, \"t\": $(date +%s)}" >> "$QLOG"
  commit_docs "$name"
  if is_cpu_item "$name"; then sleep 5; else sleep 180; fi
  return 0
}

#!/bin/bash
# h2h tail, reprioritized for the round budget (replaces run_all.sh's
# tail): the ~90 min ours-ds2 leg is deferred below the measured
# seed-noise control, which is what lets the report attribute the
# cross-framework cell deltas. Waits for the in-flight ours-ds1 and
# ref-GEM legs, then: hd150 reference legs (cheap) -> early diff commit
# -> ours seed-8 control -> seed_control.py -> final diff -> commit ->
# (only if time allows) ours-ds2.
#
# Usage: bash scripts/h2h/phase2.sh <ours_ds1_pid> <ref_gem_pid> <deadline_epoch>
set -u
cd /root/repo
LOG=clsurvey_runs/logs
N="nice -n 19"
OURS1=${1:?}; REFGEM=${2:?}; DEADLINE=${3:?}

commit_doc() {
  git add docs/ref_head_to_head.md docs/h2h_seed_control.json 2>/dev/null
  git diff --cached --quiet 2>/dev/null && return 0
  git commit -q -m "h2h artifact refresh: $1

No-Verification-Needed: run-artifact/docs-only commit from the h2h background suite" \
    2>/dev/null || true
}

left() { echo $(( DEADLINE - $(date +%s) )); }

while kill -0 "$OURS1" 2>/dev/null || kill -0 "$REFGEM" 2>/dev/null; do
  sleep 60
done
echo "legs done $(date +%s)" >> "$LOG/h2h_phase2.log"

ds2=synthetic_3t_4c_32px_80n_hd150
if (( $(left) > 1800 )); then
  $N python scripts/h2h/run_ref.py --ds "$ds2" --method_name SI \
    --runmode first_task_basemodel_dump >> "$LOG/h2h_ref_$ds2.log" 2>&1
  for m in finetuning EWC; do
    $N python scripts/h2h/run_ref.py --ds "$ds2" --method_name $m --test \
      >> "$LOG/h2h_ref_$ds2.log" 2>&1
  done
  $N python scripts/h2h/run_ref.py --ds "$ds2" --method_name GEM --test \
    --mem 80 >> "$LOG/h2h_ref_$ds2.log" 2>&1
fi

$N python scripts/h2h/diff.py > "$LOG/h2h_diff.log" 2>&1
commit_doc "ds1 complete (incl GEM) + hd150 ref legs"

if (( $(left) > 4800 )); then
  $N python scripts/h2h/run_ours.py --ds synthetic_3t_4c_32px_80n --seed 8 \
    --root clsurvey_runs/h2h_ours_s8 --methods finetuning,EWC \
    > "$LOG/h2h_ours_s8.log" 2>&1
  $N python scripts/h2h/seed_control.py > "$LOG/h2h_seed_control.log" 2>&1
  $N python scripts/h2h/diff.py >> "$LOG/h2h_diff.log" 2>&1
  commit_doc "measured seed-noise control"
fi

if (( $(left) > 6000 )); then
  $N python scripts/h2h/run_ours.py --ds "$ds2" > "$LOG/h2h_ours_$ds2.log" 2>&1
  $N python scripts/h2h/diff.py >> "$LOG/h2h_diff.log" 2>&1
  commit_doc "hd150 ours leg"
fi
echo "phase2 complete $(date +%s)" >> "$LOG/h2h_phase2.log"

#!/bin/bash
# Full head-to-head recipe (VERDICT r2 #2): CPU-patched reference clone
# vs clsurvey_tpu on bit-identical data, finetuning + EWC + GEM over the
# separable and hd150 sequences, plus the within-framework seed-noise
# control. Everything runs on the host CPU (run_ours.py forces the CPU
# backend) so it can ride alongside a TPU queue.
#
# Usage: bash scripts/h2h/run_all.sh
set -u
cd /root/repo
LOG=clsurvey_runs/logs
mkdir -p "$LOG"
N="nice -n 19"

$N python scripts/h2h/prepare_clone.py > "$LOG/h2h_prepare.log" 2>&1 || exit 1
$N python scripts/h2h/export_dataset.py > "$LOG/h2h_export.log" 2>&1 || exit 1

for ds in synthetic_3t_4c_32px_80n synthetic_3t_4c_32px_80n_hd150; do
  # reference side: one subprocess per run (clean module state, like the
  # reference's shell scripts)
  $N python scripts/h2h/run_ref.py --ds "$ds" --method_name SI \
    --runmode first_task_basemodel_dump >> "$LOG/h2h_ref_$ds.log" 2>&1
  for m in finetuning EWC; do
    $N python scripts/h2h/run_ref.py --ds "$ds" --method_name $m --test \
      >> "$LOG/h2h_ref_$ds.log" 2>&1
  done
  $N python scripts/h2h/run_ref.py --ds "$ds" --method_name GEM --test \
    --mem 80 >> "$LOG/h2h_ref_$ds.log" 2>&1
  # our side: one process per sequence
  $N python scripts/h2h/run_ours.py --ds "$ds" \
    > "$LOG/h2h_ours_$ds.log" 2>&1
done

# seed-noise control: ours alone, seed 8, separable sequence
$N python scripts/h2h/run_ours.py --ds synthetic_3t_4c_32px_80n --seed 8 \
  --root clsurvey_runs/h2h_ours_s8 --methods finetuning,EWC \
  > "$LOG/h2h_ours_s8.log" 2>&1
$N python scripts/h2h/seed_control.py > "$LOG/h2h_seed_control.log" 2>&1

$N python scripts/h2h/diff.py > "$LOG/h2h_diff.log" 2>&1
echo h2h complete

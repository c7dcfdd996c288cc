#!/usr/bin/env bash
# RecogSeq 8-task pipeline (ref:src/main_recogseq.sh:16-29).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

METHOD="${1:-SI}"
MODEL="${2:-alexnet_pretrained}"

python -m clsurvey_tpu.framework.main "$MODEL" \
  --method_name SI --ds_name recogseq --runmode first_task_basemodel_dump \
  --num_epochs 100 --batch_size 200 --gridsearch_name reproduce

python -m clsurvey_tpu.framework.main "$MODEL" \
  --method_name "$METHOD" --ds_name recogseq \
  --num_epochs 100 --batch_size 200 --gridsearch_name reproduce --test

#!/usr/bin/env bash
# iNaturalist 10-supercategory pipeline (ref:src/main_inaturalist.sh:16-26).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

METHOD="${1:-SI}"
MODEL="${2:-alexnet_pretrained}"

python -m clsurvey_tpu.framework.main "$MODEL" \
  --method_name SI --ds_name inat --runmode first_task_basemodel_dump \
  --num_epochs 70 --batch_size 200 --gridsearch_name reproduce

python -m clsurvey_tpu.framework.main "$MODEL" \
  --method_name "$METHOD" --ds_name inat \
  --num_epochs 70 --batch_size 200 --gridsearch_name reproduce --test

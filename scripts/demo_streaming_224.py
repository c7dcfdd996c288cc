"""224px streaming-path demo at iNaturalist task scale.

The r1 engine materialized every split in HBM, capping tasks at the
device-data budget; real iNaturalist supercategories (10^4-10^5 images
at 224x224x3) need the chunked streaming path (engine/train.py
``train_epoch_chunked``), our TPU-native analog of the reference's
DataLoader streaming (ref:src/methods/rehearsal/main_rehearsal.py:
181-184).

This demo trains AlexNet-224 with the full framework (LR grid + eval
matrix) on a synthetic 2-task sequence whose train split -- 20 classes
x 1250 = 25,000 images = 3.76 GB uint8 -- exceeds the 2 GB budget, so
every epoch streams double-buffered host chunks into the one compiled
step. It then re-runs one task at a resident-mode size and reports the
streaming overhead.

Run (TPU): python scripts/demo_streaming_224.py [--epochs 8]
Writes docs/streaming224.json + prints a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n", type=int, default=1250,
                    help="train imgs per class (1250 -> 3.76 GB/task)")
    ap.add_argument("--tasks", type=int, default=2)
    ap.add_argument("--batch_size", type=int, default=200)
    ap.add_argument("--cmp_n", type=int, default=300,
                    help="imgs/class for the resident-mode comparison task")
    ap.add_argument("--out", default="docs/streaming224.json")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (JAX_PLATFORMS is ignored "
                         "on the axon-tunneled machines)")
    a = ap.parse_args(argv)

    if a.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main

    ds_name = f"synthetic_{a.tasks}t_20c_224px_{a.n}n"
    common = dict(model_name="alexnet", ds_name=ds_name,
                  num_epochs=a.epochs, batch_size=a.batch_size,
                  lr_grid=(5e-3, 1e-3), gridsearch_name="streaming224",
                  max_attempts_per_task=3)

    t0 = time.time()
    run_main(RunArgs(method_name="finetuning", test=True, **common))
    stream_secs = time.time() - t0

    # resident-mode comparison point: same shapes, split under the budget
    small_ds = f"synthetic_1t_20c_224px_{a.cmp_n}n"  # 300n: 6k imgs = 0.9 GB
    t1 = time.time()
    run_main(RunArgs(method_name="finetuning", test=True,
                     **{**common, "ds_name": small_ds}))
    resident_secs = time.time() - t1

    result = {
        "ds": ds_name,
        "train_imgs_per_task": 20 * a.n,
        "task_train_bytes": 20 * a.n * 224 * 224 * 3,
        "epochs": a.epochs,
        "streaming_total_secs": round(stream_secs, 1),
        "resident_cmp_secs": round(resident_secs, 1),
        "note": "streaming selected automatically: split > "
                "CLSURVEY_DATA_BUDGET_MB (default 2048)",
    }
    os.makedirs(os.path.dirname(a.out) or ".", exist_ok=True)
    with open(a.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

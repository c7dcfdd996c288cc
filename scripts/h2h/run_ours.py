"""Drive the clsurvey_tpu side of the head-to-head (CPU backend).

Mirrors scripts/h2h/run_ref.py's protocol exactly (small_VGG9_cl_128_128,
10 epochs, batch 20, lr grid {1e-2, 5e-3, 1e-3}, max 5 attempts,
gridsearch ``h2h``) on the SAME synthetic sequences the exporter wrote
for the reference clone (the generator is deterministic in
(ds_name, seed), so no data files change hands). ``--no-augment`` parity:
the reference's framework path trains on the non-flip dataset variant
(ref:src/framework/main.py:163,197), so augmentation is off here too.

Run (one process per sequence; results land where scripts/h2h/diff.py
reads them):
    python scripts/h2h/run_ours.py --ds synthetic_3t_4c_32px_80n
    python scripts/h2h/run_ours.py --ds synthetic_3t_4c_32px_80n_hd150
    python scripts/h2h/run_ours.py --ds synthetic_3t_4c_32px_80n \
        --seed 8 --root clsurvey_runs/h2h_ours_s8 --methods finetuning,EWC
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="clsurvey_runs/h2h_ours")
    ap.add_argument("--ds", required=True)
    ap.add_argument("--methods", default="finetuning,EWC,GEM")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--mem", type=int, default=80,
                    help="GEM mem_per_task (matches run_ref.py --mem; the "
                         "1024 default exceeds the tiny h2h tasks)")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=20)
    ap.add_argument("--lr_grid", default="1e-2,5e-3,1e-3")
    ap.add_argument("--max_attempts", type=int, default=5)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default backend (the real chip) "
                         "instead of forcing CPU — behavioral parity "
                         "does not care which device ours runs on, and "
                         "each leg is minutes on the chip vs ~40 min "
                         "niced on the 1-core host (serialize with the "
                         "TPU queue!)")
    a = ap.parse_args(argv)

    results = os.path.join(REPO, a.root, "results")
    os.environ["CLSURVEY_TR_RESULTS_ROOT_PATH"] = os.path.join(
        results, "train")
    os.environ["CLSURVEY_TEST_RESULTS_ROOT_PATH"] = os.path.join(
        results, "test")
    os.environ["CLSURVEY_MODELS_ROOT_PATH"] = os.path.join(
        REPO, a.root, "models")

    if not a.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")  # never touch the chip

    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main

    common = dict(model_name="small_VGG9_cl_128_128", ds_name=a.ds,
                  num_epochs=a.epochs, batch_size=a.batch_size,
                  lr_grid=tuple(float(x) for x in a.lr_grid.split(",")),
                  max_attempts_per_task=a.max_attempts, seed=a.seed,
                  augment=False)

    print("== ours: first-task base model (SI dump) ==", flush=True)
    run_main(RunArgs(method_name="SI",
                     runmode="first_task_basemodel_dump", **common))

    for m in a.methods.split(","):
        shp = str(a.mem) if m in ("GEM", "ICARL") else None
        print(f"\n== ours: {m} ({a.ds}, seed {a.seed}) ==", flush=True)
        t0 = time.time()
        try:
            run_main(RunArgs(method_name=m, test=True,
                             static_hyperparams=shp,
                             gridsearch_name="h2h", **common))
            print(f"== ours: {m} ok ({time.time() - t0:.0f}s)", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"== ours: {m} FAILED", flush=True)


if __name__ == "__main__":
    main()

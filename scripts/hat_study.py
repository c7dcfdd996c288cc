"""HAT at a reference-scale budget: learning proof + momentum A/B.

VERDICT r1 #1: HAT demoed at chance in the 16-method smoke demo
(640 imgs/task, 60 epochs). This study runs HAT *alone* at the
reference's protocol scale (ref:src/main_tinyimagenet.sh:16-25 — 70-200
epochs/task, ~5k imgs/task, smax=800/c=2.5) on a synthetic 10-task
sequence and A/Bs SGD momentum 0.9 (what the reference's Appr actually
uses, ref:src/methods/HAT/approaches/hat.py:21) against 0.0 (what its
stale HAT_SGD docstring claims, ref:HAT_utils.py:196).

Usage:
  python scripts/hat_study.py --out /tmp/hat_study \
      --ds synthetic_10t_10c_64px_500n --epochs 150 --lr 0.05
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def run_sequence(ds_name: str, model_name: str,
                 momentum: float, epochs: int, lr: float, smax: float,
                 lamb: float, batch_size: int, seed: int) -> dict:
    import numpy as np

    from clsurvey_tpu import methods as methods_lib
    from clsurvey_tpu.data import registry as data_lib
    from clsurvey_tpu.framework.common import Manager, RunArgs
    from clsurvey_tpu.models import registry as models_lib
    from clsurvey_tpu.utils.config import load_config

    cfg = load_config(refresh=True)
    method = methods_lib.parse("HAT")
    method.momentum = momentum
    dataset = data_lib.parse(ds_name)
    spec = models_lib.parse_model_name(cfg.models_root_path, model_name,
                                       dataset.input_size)
    args = RunArgs(model_name=model_name, ds_name=ds_name,
                   method_name="HAT", num_epochs=epochs,
                   batch_size=batch_size, seed=seed,
                   gridsearch_name=f"hat_study_m{momentum:g}",
                   exp_name=f"smax={smax:g}_c={lamb:g}")
    manager = Manager(args=args, dataset=dataset, method=method,
                      model_spec=spec,
                      gridsearch_name=args.gridsearch_name,
                      exp_name=args.exp_name)

    T = dataset.task_count
    model_paths = []
    task_wall = []
    for t in range(1, T + 1):
        manager.set_dataset(t)
        exp_dir = manager.task_training_dir(t)
        os.makedirs(exp_dir, exist_ok=True)
        start = time.time()
        out, best_acc = method._run(
            manager, lr, smax=smax, lamb=lamb, exp_dir=exp_dir,
            finetune_mode=False, seed=seed, num_epochs=epochs)
        task_wall.append(time.time() - start)
        from clsurvey_tpu.utils.paths import BEST_MODEL_FILENAME
        best_path = os.path.join(exp_dir, BEST_MODEL_FILENAME)
        manager.previous_task_model_path = best_path
        model_paths.append(best_path)
        print(f"[m={momentum:g}] task {t}: best val acc {best_acc:.4f} "
              f"({task_wall[-1]:.0f}s)")

    # (ref task x model) accuracy matrix via the method's own eval hook
    matrix = np.full((T, T), np.nan)
    for ref_task in range(1, T + 1):
        for trained in range(ref_task, T + 1):
            acc = method.inference_eval(manager, model_paths[trained - 1],
                                        ref_task, trained)
            matrix[ref_task - 1, trained - 1] = acc * 100.0
    final = matrix[:, -1]
    first = np.array([matrix[i, i] for i in range(T)])
    forgetting = first[:-1] - final[:-1]
    return {
        "momentum": momentum, "matrix": matrix.tolist(),
        "avg_final_acc": float(np.mean(final)),
        "avg_first_acc": float(np.mean(first)),
        "avg_forgetting": float(np.mean(forgetting)),
        "final_per_task": final.tolist(),
        "first_per_task": first.tolist(),
        "task_wall_s": task_wall,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/hat_study")
    ap.add_argument("--ds", default="synthetic_10t_10c_64px_500n")
    ap.add_argument("--model", default="small_VGG9_cl_128_128")
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--smax", type=float, default=800.0)
    ap.add_argument("--c", type=float, default=2.5)
    ap.add_argument("--batch_size", type=int, default=200)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--momenta", default="0.9,0.0")
    ap.add_argument("--cpu", action="store_true")
    ns = ap.parse_args()

    os.makedirs(ns.out, exist_ok=True)
    os.environ["CLSURVEY_ROOT"] = ns.out
    if ns.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    results = {}
    for m in (float(x) for x in ns.momenta.split(",")):
        results[f"momentum_{m:g}"] = run_sequence(
            ns.ds, ns.model, m, ns.epochs, ns.lr, ns.smax, ns.c,
            ns.batch_size, ns.seed)
        with open(os.path.join(ns.out, "hat_study.json"), "w") as f:
            json.dump({"config": vars(ns), "results": results}, f, indent=1)

    for key, r in results.items():
        print(f"\n=== {key}: avg final acc {r['avg_final_acc']:.2f} "
              f"avg forgetting {r['avg_forgetting']:.2f}")
        print("  first-model accs:",
              [f"{x:.1f}" for x in r["first_per_task"]])
        print("  final-model accs:",
              [f"{x:.1f}" for x in r["final_per_task"]])


if __name__ == "__main__":
    main()

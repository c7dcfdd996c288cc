"""Shared host-side plumbing between Method lifecycle hooks and the Engine.

Equivalent role to the reference's per-method ``main_*.py`` setup scripts
(load previous model, replace last classifier layer, build optimizer, call
the train loop — e.g. ref:src/methods/Finetune/main_SGD.py:13-82), factored
once instead of eleven times."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from clsurvey_tpu.engine.train import (
    Engine, TrainJob, TrainState, make_context, train_task,
    tree_zeros_like)
from clsurvey_tpu.methods.base import UpdateRule
from clsurvey_tpu.models import heads as heads_lib
from clsurvey_tpu.utils import io


def load_model(path_or_dict) -> dict:
    if isinstance(path_or_dict, dict):
        return path_or_dict
    return io.load(path_or_dict)


def prepare_trainable(model: dict, task: int, head_key=None,
                      reinit_head: bool = True) -> dict:
    """Model dict -> trainable pytree, with the current task's head freshly
    initialised (the reference's replace-last-classifier-layer,
    ref:src/methods/Finetune/main_SGD.py:50-70)."""
    # copy=True: the engine donates these buffers into the epoch jit, so we
    # must never alias a caller-held array (e.g. an in-memory model dict)
    copy = lambda x: jnp.array(x, copy=True)
    trainable = {
        "params": jax.tree_util.tree_map(copy, model["params"]),
        "heads": {"kernel": copy(model["heads"]["kernel"]),
                  "bias": copy(model["heads"]["bias"])},
    }
    if reinit_head:
        key = head_key if head_key is not None else jax.random.PRNGKey(0)
        trainable["heads"] = heads_lib.reinit_head(trainable["heads"],
                                                   task, key)
    return trainable


def rebuild_head_bank(old_bank: dict, head_key, n_tasks: int,
                      class_counts: np.ndarray) -> dict:
    """Rebuild the stacked head bank at a new width/task count, preserving
    every already-trained slot (analog of the reference's
    replace-last-classifier-layer with ``len(dset_classes)`` outputs,
    ref:src/methods/Finetune/main_SGD.py:50-70 — but the bank carries ALL
    tasks' heads, so a mid-sequence width change must never wipe the other
    tasks' trained heads). The current task's slot is freshly initialised
    by ``prepare_trainable`` afterwards regardless."""
    kern = np.asarray(old_bank["kernel"])
    old_bias = np.asarray(old_bank["bias"])
    needed_width = int(np.max(class_counts))
    bank = heads_lib.init_head_bank(
        head_key, max(n_tasks, kern.shape[0]), kern.shape[1],
        needed_width, class_counts)
    w = min(kern.shape[-1], needed_width)
    nt = min(kern.shape[0], np.asarray(bank["kernel"]).shape[0])
    kernel = np.array(bank["kernel"])
    bias = np.array(bank["bias"])
    kernel[:nt, :, :w] = kern[:nt, :, :w]
    bias[:nt, :w] = old_bias[:nt, :w]
    return {**bank, "kernel": jnp.asarray(kernel),
            "bias": jnp.asarray(bias)}


def build_engine(manager, update_rule: UpdateRule, task_counter: int,
                 augment: bool = True, freeze_backbone: bool = False,
                 class_counts=None, n_tasks: int | None = None,
                 l1_decay: bool = False) -> Engine:
    """EngineContext from framework state. ``task_counter`` is 1-based."""
    # global --no_augment gate (parity runs); method-level augment=False
    # (eval, Fisher sweeps, replay buffers) always wins
    augment = augment and getattr(manager.args, "augment", True)
    seq = manager.dataset
    counts = class_counts
    if counts is None:
        max_tasks = manager.max_tasks
        counts = np.zeros(max_tasks, np.int32)
        for t in range(1, seq.task_count + 1):
            counts[t - 1] = seq.classes_per_task[seq.get_taskname(t)]
    ctx = make_context(
        spec=manager.model_spec,
        task=task_counter - 1,
        n_tasks=n_tasks if n_tasks is not None else task_counter,
        class_counts=counts,
        mean=seq.mean, std=seq.std,
        update_rule=update_rule,
        augment=augment,
        weight_decay=manager.args.weight_decay,
        freeze_backbone=freeze_backbone,
        l1_decay=l1_decay,
    )
    return Engine(ctx)


def run_training(manager, update_rule: UpdateRule, lr: float,
                 hyperparams: dict, exp_dir: str, start_model,
                 num_epochs: int | None = None, seed: int = 7,
                 augment: bool = True, reinit_head: bool = True,
                 task_data=None, mstate: Any = None,
                 freeze_backbone: bool = False,
                 class_counts=None, n_tasks: int | None = None,
                 engine: Engine | None = None, l1_decay: bool = False):
    """One full task training: the engine-driven equivalent of each
    reference method-main. Returns (best_model_dict, best_val_acc)."""
    args = manager.args
    model = load_model(start_model)
    if engine is None:
        engine = build_engine(manager, update_rule,
                              manager.task_counter, augment=augment,
                              freeze_backbone=freeze_backbone,
                              class_counts=class_counts, n_tasks=n_tasks,
                              l1_decay=l1_decay)
    ctx = engine.ctx
    head_key = jax.random.fold_in(jax.random.PRNGKey(seed), 17)
    # If the needed head width differs from the stored bank (e.g. Joint's
    # merged label space), rebuild the bank — the analog of the reference's
    # replace_last_classifier_layer with len(dset_classes) outputs
    # (ref:src/methods/Finetune/main_SGD.py:50-70).
    needed_width = int(np.max(ctx.class_counts))
    kern = np.asarray(model["heads"]["kernel"])
    if kern.shape[-1] != needed_width or kern.shape[0] < ctx.n_tasks:
        model = dict(model)
        model["heads"] = rebuild_head_bank(
            model["heads"], head_key, ctx.n_tasks,
            np.asarray(ctx.class_counts))
    trainable = prepare_trainable(model, ctx.task, head_key,
                                  reinit_head=reinit_head)
    if mstate is None:
        mstate = update_rule.init_state(trainable, hyperparams, ctx)
    batch_stats = jax.tree_util.tree_map(
        jnp.asarray, model.get("batch_stats", {}))
    state = TrainState(trainable, batch_stats, tree_zeros_like(trainable),
                       mstate)
    job = TrainJob(
        exp_dir=exp_dir,
        num_epochs=num_epochs if num_epochs is not None else args.num_epochs,
        batch_size=args.batch_size,
        lr=lr, seed=seed,
        saving_freq=args.saving_freq,
        save_models_mode=args.save_models_mode,
    )
    data = task_data if task_data is not None else \
        manager.current_task_dataset
    best_model, best_acc, final_state = train_task(
        engine, job, state, data, log=manager.log)
    return best_model, best_acc, final_state, engine


def current_task_head_grads(tree, task: int):
    """Zero every head-bank slot's gradient except the current task's
    (the shared 'only the current task's head trains' rule)."""
    def per_leaf(h):
        keep = (jnp.arange(h.shape[0]) == task).reshape(
            (-1,) + (1,) * (h.ndim - 1))
        return jnp.where(keep, h, 0.0)

    return jax.tree_util.tree_map(per_leaf, tree)

def get_task_engine(manager, slot: str):
    """Single engine slot per method, overwritten across tasks — a
    per-task cache key would pin every finished task's compiled
    executables (train epoch + eval jit caches) for the whole run."""
    if manager.extras.get(slot + "_task") == manager.task_counter:
        return manager.extras.get(slot)
    return None


def set_task_engine(manager, slot: str, engine) -> None:
    manager.extras[slot] = engine
    manager.extras[slot + "_task"] = manager.task_counter

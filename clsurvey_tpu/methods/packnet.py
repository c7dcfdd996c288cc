"""PackNet — iterative pruning with per-weight task ownership masks
(ref:src/methods/packnet/{main,prune,networks,packnetSGD}.py,
wrapper ref:src/methods/method.py:417-556).

Lifecycle mapped onto the framework exactly like the reference:

- Phase 1 (``grid_train``, the reference's *finetune* mode): free weights
  are claimed for the current task (``make_finetuning_mask``) and only the
  current task's kernel weights receive updates; biases/BN are frozen
  (train_bias/train_bn = False protocol).
- Phase 2 (``train``, the reference's *prune* mode): starting from the
  Phase-1 model, prune ``prune_perc_per_layer`` of the current task's
  weights per layer (kth-|w| cutoff), then retrain the survivors at
  ``lr * 0.1`` (ref:method.py:509-536). Each decay attempt re-prunes the
  same Phase-1 model with the decayed percentage.
- Eval: weights not yet trained at the evaluated task (mask == 0 or
  mask > task) are zeroed before the forward (``apply_mask``).

TPU design: ownership masks are uint8 pytrees inside the compiled step's
method state; gradient masking and the exact-zero guarantee (the reference's
PacknetSGD masks weight decay, ref:packnetSGD.py:39-43) are both enforced by
masking the final update direction, so frozen/pruned weights are bit-stable
under momentum and weight decay."""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from clsurvey_tpu.methods import common
from clsurvey_tpu.methods.base import Category, Method, UpdateRule
from clsurvey_tpu.ops import masks as masks_lib
from clsurvey_tpu.utils import io
from clsurvey_tpu.utils.paths import BEST_MODEL_FILENAME


class PackNetRule(UpdateRule):
    """Grad + update masking for one task's training run. ``masks`` is
    static for the run (pruning happens on the host between runs)."""

    def __init__(self, task_id: int, train_bn: bool = False):
        self.task_id = int(task_id)  # 1-based ownership id
        # ref trains BN params whenever the model has batchnorm
        # (ref:src/methods/method.py:538, prune.py:93-97)
        self.train_bn = bool(train_bn)

    def init_state(self, trainable, hyperparams, ctx, masks=None):
        state = super().init_state(trainable, hyperparams, ctx)
        assert masks is not None
        state["masks"] = masks
        return state

    def _mask_tree(self, tree, mstate):
        params = masks_lib.mask_grads(tree["params"], mstate["masks"],
                                      self.task_id,
                                      train_bn=self.train_bn)
        # only the current task's head trains
        heads = common.current_task_head_grads(tree["heads"],
                                               self.task_id - 1)
        return {"params": params, "heads": heads}

    def transform_grads(self, ctx, grads, trainable, mstate):
        return self._mask_tree(grads, mstate)

    def mask_updates(self, ctx, updates, mstate):
        # post-momentum/post-decay: frozen + pruned weights move exactly 0
        return self._mask_tree(updates, mstate)

    def export_aux(self, mstate):
        return {"masks": mstate["masks"]}


@dataclass
class PackNet(Method):
    name: str = "packnet"
    category: Category = Category.MASK_BASED
    start_scratch: bool = True
    hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict(
            {"prune_perc_per_layer": 0.9}))
    static_hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"post_prune_epochs": 10}))

    # ---- helpers -------------------------------------------------------------
    def _load_with_masks(self, path_or_model):
        model = io.load(path_or_model) if isinstance(path_or_model, str) \
            else path_or_model
        aux = model.get("method_aux") or {}
        if "masks" in aux:
            masks = jax.tree_util.tree_map(jnp.asarray, aux["masks"])
        else:  # first task: everything free
            masks = masks_lib.init_masks(
                jax.tree_util.tree_map(jnp.asarray, model["params"]),
                owner=0)
        return model, masks

    # ---- Phase 1: finetune mode ----------------------------------------------
    def grid_train(self, args, manager, lr):
        t = manager.task_counter
        prev_model, masks = self._load_with_masks(
            manager.previous_task_model_path)
        masks = masks_lib.claim_free(masks, t)
        rule = PackNetRule(t, train_bn=manager.model_spec.batch_norm)
        proto = {"params": jax.tree_util.tree_map(jnp.asarray,
                                                  prev_model["params"]),
                 "heads": None}
        mstate = rule.init_state(proto, {}, None, masks=masks)
        exp_dir = manager.extras["gridsearch_exp_dir"]
        seed = manager.extras.get("grid_seed", 0)
        best_model, best_acc, _, _ = common.run_training(
            manager, rule, lr=lr, hyperparams={}, exp_dir=exp_dir,
            start_model=prev_model, seed=seed, mstate=mstate)
        return best_model, best_acc

    def grid_poststep(self, args, manager):
        best_dir = manager.extras.get("best_exp_grid_node_dirname")
        manager.extras["packnet_ft_model_path"] = (
            f"{best_dir}/{BEST_MODEL_FILENAME}" if best_dir else None)

    # ---- Phase 2: prune + retrain at lr*0.1 ----------------------------------
    def train(self, args, manager, hyperparams):
        t = manager.task_counter
        ft_path = manager.extras.get("packnet_ft_model_path")
        if not ft_path or not io.exists(ft_path):
            # a silent fallback to the previous task's model would train
            # only the head (its masks hold no task-t claims)
            raise FileNotFoundError(
                f"PackNet Phase-1 model missing: {ft_path!r} — Phase 1 "
                "must run first and its grid storage must keep the best "
                "model (policy only_keep_best/all)")
        model, masks = self._load_with_masks(ft_path)
        params = jax.tree_util.tree_map(jnp.asarray, model["params"])
        prune_perc = float(hyperparams["prune_perc_per_layer"])
        pruned_params, pruned_masks = masks_lib.prune_masks(
            params, masks, t, prune_perc)
        model = dict(model)
        model["params"] = pruned_params
        rule = PackNetRule(t, train_bn=manager.model_spec.batch_norm)
        proto = {"params": pruned_params, "heads": None}
        mstate = rule.init_state(proto, dict(hyperparams), None,
                                 masks=pruned_masks)
        best_model, best_acc, _, _ = common.run_training(
            manager, rule, lr=manager.extras["lr"] * 0.1,
            hyperparams=dict(hyperparams),
            exp_dir=manager.extras["heuristic_exp_dir"],
            num_epochs=int(self.static_hyperparams["post_prune_epochs"]),
            start_model=model, seed=args.seed, mstate=mstate,
            reinit_head=False)  # keep the Phase-1 trained head
        return best_model, best_acc

    # ---- eval: apply the task's subnetwork -----------------------------------
    def inference_eval(self, manager, model_path, ref_task, trained_idx):
        from clsurvey_tpu.framework.evaluate import default_inference_eval

        model = io.load(model_path) if isinstance(model_path, str) \
            else model_path
        model, masks = self._load_with_masks(model)
        params = masks_lib.apply_eval_mask(
            jax.tree_util.tree_map(jnp.asarray, model["params"]),
            masks, ref_task)
        model = dict(model)
        model["params"] = params
        return default_inference_eval(manager, model, ref_task)

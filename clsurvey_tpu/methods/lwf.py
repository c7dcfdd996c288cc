"""LwF — Learning without Forgetting (ref:src/methods/LwF/main_LWF.py,
ref:src/methods/method.py:940-989).

Training = CE on the new task + ``lambda * sum_over_prev_heads`` of the
temperature-2 distillation loss between the current model's old-head outputs
and the frozen previous model's outputs on the same batch. All heads
(old + new) are trainable; the teacher is frozen.

TPU design: the teacher forward runs inside the same jitted step (one extra
backbone pass fused by XLA), and all previous heads distill with a single
(B, n_prev, C) einsum via the stacked head bank — the reference loops python
lists of head modules (ref:src/methods/LwF/AlexNet_LwF.py:14-38)."""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from clsurvey_tpu.methods import common
from clsurvey_tpu.methods.base import Category, Method, UpdateRule
from clsurvey_tpu.methods.finetune import finetune_grid_train
from clsurvey_tpu.models import heads as heads_lib
from clsurvey_tpu.ops.distill import lwf_distill_multi
from clsurvey_tpu.utils import io

TEMPERATURE = 2.0


class LwFRule(UpdateRule):
    """extra_loss = lambda * distillation over all previous heads."""

    def init_state(self, trainable, hyperparams, ctx, prev_model=None):
        state = super().init_state(trainable, hyperparams, ctx)
        assert prev_model is not None
        state["teacher"] = {
            "params": jax.tree_util.tree_map(jnp.asarray,
                                             prev_model["params"]),
            "batch_stats": jax.tree_util.tree_map(
                jnp.asarray, prev_model.get("batch_stats", {})),
            "kernel": jnp.asarray(prev_model["heads"]["kernel"]),
            "bias": jnp.asarray(prev_model["heads"]["bias"]),
        }
        return state

    # hyperparam key holding the distillation strength (EBLL reuses this
    # whole term under its own key)
    LAMBDA_KEY = "lambda"

    def distill_term(self, ctx, trainable, feats, batch, mstate, rng):
        """lambda * sum of temperature-softened distillation losses over
        all previous heads (ref:main_LWF.py:177-201)."""
        n_prev = ctx.n_tasks - 1
        x, _ = batch
        teacher = mstate["teacher"]
        t_feats, _ = ctx.forward_feats(teacher["params"],
                                       teacher["batch_stats"], x,
                                       train=False, rng=rng)
        t_bank = {"kernel": teacher["kernel"], "bias": teacher["bias"],
                  "class_counts": ctx.class_counts}
        t_logits = jax.lax.stop_gradient(
            heads_lib.forward_all(t_bank, t_feats, n_prev))
        s_logits = heads_lib.forward_all(ctx.bank(trainable), feats, n_prev)
        dist = lwf_distill_multi(s_logits, t_logits, TEMPERATURE)
        return mstate["hyper"][self.LAMBDA_KEY] * dist

    def extra_loss(self, ctx, trainable, feats, batch, mstate, rng,
                   batch_stats=None):
        if ctx.n_tasks - 1 == 0:
            return jnp.float32(0.0)
        return self.distill_term(ctx, trainable, feats, batch, mstate, rng)


@dataclass
class LWF(Method):
    name: str = "LWF"
    category: Category = Category.DATA_BASED
    hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"lambda": 10}))
    static_hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"head_warmup_epochs": 0}))

    def make_update_rule(self) -> UpdateRule:
        return LwFRule()

    def grid_train(self, args, manager, lr):
        return finetune_grid_train(args, manager, lr)

    def train(self, args, manager, hyperparams):
        prev_model = io.load(manager.previous_task_model_path)
        # optional head-only warmup before the distillation training
        # (ref:src/methods/LwF/main_LWF.py:322-362 fine_tune_freeze)
        warmup = int(self.static_hyperparams.get("head_warmup_epochs", 0))
        if warmup > 0:
            warm_dir = manager.extras["heuristic_exp_dir"] + "_head_warmup"
            prev_model, _, _, _ = common.run_training(
                manager, UpdateRule(), lr=manager.extras["lr"],
                hyperparams={}, exp_dir=warm_dir, start_model=prev_model,
                seed=args.seed, num_epochs=warmup, freeze_backbone=True)
        rule = self.make_update_rule()
        proto = {"params": jax.tree_util.tree_map(jnp.asarray,
                                                  prev_model["params"]),
                 "heads": None}
        mstate = rule.init_state(proto, dict(hyperparams), None,
                                 prev_model=prev_model)
        engine = common.get_task_engine(manager, "lwf_engine")
        best_model, best_acc, _, engine = common.run_training(
            manager, rule, lr=manager.extras["lr"],
            hyperparams=dict(hyperparams),
            exp_dir=manager.extras["heuristic_exp_dir"],
            start_model=prev_model, seed=args.seed, mstate=mstate,
            engine=engine,
            reinit_head=(warmup == 0))  # keep the warmed-up head
        common.set_task_engine(manager, "lwf_engine", engine)
        return best_model, best_acc

"""Importance-weight regularization methods: EWC, MAS, SI.

Shared mechanism (the reference's signature "regularizer inside
optimizer.step" design, ref:src/methods/EWC/train_EWC.py:23-86,
ref:src/methods/SI/train_SI.py:40-126): the compiled step adds
``2*lambda*omega*(theta - theta_star)`` to the raw CE gradients *before*
weight decay and momentum, on backbone params only (each task's replaced
head drops out of the reg set in the reference).

Per-method importance:

- **EWC**  omega accumulates the empirical diagonal Fisher of each finished
  task, estimated on that task's train split with the model that finished it
  (ref:src/methods/EWC/main_EWC.py:79-157,177-232).
- **MAS**  omega accumulates the mean |per-sample grad of ||f(x)||^2|
  over the previous task's data, batch-size-1 online mode
  (ref:src/methods/MAS/main_MAS.py:34-153, train_MAS.py:128-181,505-567).
- **SI**   omega is built *during* training from the path integral
  ``w += -delta_theta * g_unreg`` updated every optimizer step
  (ref:src/methods/SI/train_SI.py:98-126), consolidated at the next task's
  start as ``omega += max(w / ((theta - theta_init)^2 + xi), 0)``, xi=1e-3
  (ref:src/methods/SI/train_SI.py:301-364, main_SI.py:73-94).

TPU notes: omega/theta_star/w live as replicated device pytrees inside the
method state of the jitted step — the penalty fuses into the update kernel
(no separate pass), and the estimators in ops/importance.py are jitted
scans / chunked vmaps instead of python batch loops.
"""

from __future__ import annotations

from collections import OrderedDict
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from clsurvey_tpu.methods import common
from clsurvey_tpu.methods.base import Category, Method, UpdateRule
from clsurvey_tpu.methods.finetune import finetune_grid_train
from clsurvey_tpu.ops import importance as imp_lib
from clsurvey_tpu.utils import io

SI_XI = 1e-3  # slack (ref:src/methods/SI/train_SI.py:302 slak=1e-3)


def tree_copy(t):
    return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), t)


class QuadRegRule(UpdateRule):
    """penalty = 2*lambda*omega*(theta - theta_star) on backbone params."""

    def init_state(self, trainable, hyperparams, ctx, omega=None,
                   theta_star=None):
        params = trainable["params"]
        return {
            "hyper": {k: jnp.asarray(v, jnp.float32)
                      for k, v in hyperparams.items()},
            "omega": (omega if omega is not None
                      else jax.tree_util.tree_map(jnp.zeros_like, params)),
            "theta_star": (theta_star if theta_star is not None
                           else tree_copy(params)),
        }

    def penalty_grads(self, trainable, mstate):
        lam = mstate["hyper"]["lambda"]
        pen = jax.tree_util.tree_map(
            lambda th, om, st: 2.0 * lam * om * (th - st),
            trainable["params"], mstate["omega"], mstate["theta_star"])
        zeros_heads = jax.tree_util.tree_map(jnp.zeros_like,
                                             trainable["heads"])
        return {"params": pen, "heads": zeros_heads}

    def export_aux(self, mstate):
        return {"omega": mstate["omega"],
                "theta_star": mstate["theta_star"]}


class SIRule(QuadRegRule):
    """Adds the per-step path integral w += -(theta_new-theta_old)*g_raw."""

    def init_state(self, trainable, hyperparams, ctx, omega=None,
                   theta_star=None, w=None):
        state = super().init_state(trainable, hyperparams, ctx, omega,
                                   theta_star)
        state["w"] = (w if w is not None else jax.tree_util.tree_map(
            jnp.zeros_like, trainable["params"]))
        return state

    def post_step(self, ctx, mstate, old_trainable, new_trainable,
                  raw_grads, batch, raw_images=None):
        w = jax.tree_util.tree_map(
            lambda wi, new, old, g: wi - (new - old) * g,
            mstate["w"], new_trainable["params"], old_trainable["params"],
            raw_grads["params"])
        return {**mstate, "w": w}

    def export_aux(self, mstate):
        return {**super().export_aux(mstate), "w": mstate["w"]}


def si_consolidate(prev_params, aux):
    """omega += max(w / ((theta_end - theta_init)^2 + xi), 0); reset w;
    theta_star moves to the finished task's params
    (ref:src/methods/SI/train_SI.py:301-364).

    Non-finite contributions are dropped: the reference's NaN guard kills
    the whole process instead (train_SI.py:242-244 exit(-1)); our decay
    framework retries with smaller lambda, which only helps if the carried
    omega stays finite."""
    def upd(om, w, th_end, th_init):
        this = w / ((th_end - th_init) ** 2 + SI_XI)
        this = jnp.where(jnp.isfinite(this), this, 0.0)
        om = jnp.where(jnp.isfinite(om), om, 0.0)  # carried state too
        return om + jnp.maximum(this, 0.0)

    omega = jax.tree_util.tree_map(
        upd, jax.tree_util.tree_map(jnp.asarray, aux["omega"]),
        jax.tree_util.tree_map(jnp.asarray, aux["w"]),
        prev_params, jax.tree_util.tree_map(jnp.asarray, aux["theta_star"]))
    return omega


def orth_reg_grad(kernel: jnp.ndarray, beta: float,
                  orth_lambda: float = 10.0, eps: float = 1e-10
                  ) -> jnp.ndarray:
    """Orthogonality-regularization gradient for a conv kernel — the MAS
    extra hook (ref:src/methods/MAS/train_MAS.py:100-125 orth_org_hook;
    beta = weight_decay like the reference's caller at :79-80).

    Torch views the (out,in,kh,kw) weight as (out, -1) filters; our flax
    kernel is (kh,kw,in,out), so filters = moveaxis(-1,0).reshape(out,-1).
    """
    out_c = kernel.shape[-1]
    filters = jnp.moveaxis(kernel, -1, 0).reshape(out_c, -1)
    norms = jnp.linalg.norm(filters, axis=1, keepdims=True)
    f = filters / (norms + eps)
    g = f @ f.T
    g = jnp.exp(g * orth_lambda)
    g = (g * orth_lambda) / (g + jnp.exp(jnp.float32(orth_lambda)))
    g = g * (1.0 - jnp.eye(out_c, dtype=g.dtype))  # zero diagonal
    grad = (g @ f) * beta
    return jnp.moveaxis(grad.reshape((out_c,) + kernel.shape[:-1]), 0, -1)


class MASRule(QuadRegRule):
    """QuadReg + the optional orth-reg hook on conv kernels
    (ref:src/methods/MAS/train_MAS.py:79-80: ``if self.orth_reg:
    d_p.add_(orth_org_hook(p, {'beta': weight_decay}))``, applied after
    decay, before momentum; off by default like the reference — no caller
    ever passes orth_reg=True)."""

    def __init__(self, orth_reg: bool = False):
        self.orth_reg = orth_reg

    def transform_grads(self, ctx, grads, trainable, mstate):
        if not self.orth_reg:
            return grads
        beta = ctx.weight_decay  # reference passes beta=weight_decay

        def per_leaf(g, p):
            if p.ndim == 4:  # conv kernels only (ref hook returns 0 else)
                return g + orth_reg_grad(p, beta)
            return g

        return {**grads, "params": jax.tree_util.tree_map(
            per_leaf, grads["params"], trainable["params"])}


def _bank_from_model(model):
    return {"kernel": jnp.asarray(model["heads"]["kernel"]),
            "bias": jnp.asarray(model["heads"]["bias"]),
            "class_counts": np.asarray(model["heads"]["class_counts"])}


@dataclass
class _RegMethodBase(Method):
    """Shared host lifecycle of the three reg methods."""

    category: Category = Category.MODEL_BASED

    def make_update_rule(self) -> UpdateRule:
        return QuadRegRule()

    def _l1_decay(self) -> bool:
        return False

    def grid_train(self, args, manager, lr):
        """Phase 1 is plain finetuning (maximal plasticity)."""
        return finetune_grid_train(args, manager, lr)

    # -- importance preparation, once per task (cached across attempts) -----
    def _prepare(self, args, manager):
        raise NotImplementedError

    def train(self, args, manager, hyperparams):
        from clsurvey_tpu.utils import timing

        cache_key = ("reg_prep", self.name, manager.task_counter)
        if cache_key not in manager.extras:
            import time

            t0 = time.perf_counter()
            manager.extras[cache_key] = self._prepare(args, manager)
            prep_secs = time.perf_counter() - t0
            manager.extras[(cache_key, "secs")] = prep_secs
        # telemetry per exp (ref:src/utilities/utils.py:100-105, caller
        # main_EWC.py:43-46) — (re)written every attempt: the failed-
        # attempt cleanup wipes the exp dir between decay retries
        timing.save_preprocessing_time(
            manager.extras["heuristic_exp_dir"],
            manager.extras.get((cache_key, "secs"), 0.0))
        omega, theta_star, extra = manager.extras[cache_key]
        rule = self.make_update_rule()
        exp_dir = manager.extras["heuristic_exp_dir"]
        # one engine slot, overwritten per task (a per-task key would pin
        # every finished task's compiled executable for the whole run)
        engine = common.get_task_engine(manager, "reg_engine")
        prev_model = io.load(manager.previous_task_model_path)

        # trainable must be built before mstate (shapes); run_training does
        # the head reinit — we hand it a ready mstate built from cached
        # importance tensors
        init_kwargs = {}
        if isinstance(rule, SIRule):
            init_kwargs["w"] = extra.get("w")
        mstate = None  # built inside via closure below

        # build mstate with copies so decay attempts never alias donated bufs
        def make_mstate(trainable):
            return rule.init_state(
                trainable, dict(hyperparams), None,
                omega=tree_copy(omega), theta_star=tree_copy(theta_star),
                **({k: tree_copy(v) if v is not None else None
                    for k, v in init_kwargs.items()} if init_kwargs else {}))

        # run_training builds trainable internally; we pre-build mstate from
        # the prev model's params (same tree structure as trainable params)
        proto_trainable = {"params": jax.tree_util.tree_map(
            jnp.asarray, prev_model["params"]), "heads": None}
        mstate = make_mstate(proto_trainable)

        best_model, best_acc, _, engine = common.run_training(
            manager, rule, lr=manager.extras["lr"],
            hyperparams=dict(hyperparams), exp_dir=exp_dir,
            start_model=prev_model, seed=args.seed, mstate=mstate,
            engine=engine, l1_decay=self._l1_decay())
        common.set_task_engine(manager, "reg_engine", engine)
        return best_model, best_acc


@dataclass
class EWC(_RegMethodBase):
    name: str = "EWC"
    hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"lambda": 400}))

    def _prepare(self, args, manager):
        """Fisher of the finished (previous) task, accumulated onto the
        omega carried in the prev model's aux."""
        prev_model = io.load(manager.previous_task_model_path)
        prev_params = jax.tree_util.tree_map(jnp.asarray,
                                             prev_model["params"])
        prev_task = manager.task_counter - 1
        prev_data = manager.dataset.get_task_dataset(prev_task)
        engine = common.build_engine(manager, UpdateRule(),
                                     manager.task_counter, augment=False)
        fisher = imp_lib.ewc_fisher(
            engine.ctx, prev_params,
            jax.tree_util.tree_map(jnp.asarray,
                                   prev_model.get("batch_stats", {})),
            _bank_from_model(prev_model), prev_task - 1,
            np.asarray(prev_data.train.images),
            np.asarray(prev_data.train.labels), args.batch_size)
        aux = prev_model.get("method_aux")
        if aux and "omega" in aux:
            omega = jax.tree_util.tree_map(
                lambda o, f: jnp.asarray(o) + f, aux["omega"], fisher)
        else:
            omega = fisher
        return omega, prev_params, {}


@dataclass
class MAS(_RegMethodBase):
    """MAS b1 online mode. The reference's auxiliary knobs ride as static
    hyperparams, both off by default exactly like the reference
    (ref:src/methods/MAS/main_MAS.py:36 L1_decay=False;
    train_MAS.py:23 orth_reg=False, no caller enables it):
    ``--static_hyperparams "l1;orth"`` with 0/1 values."""

    name: str = "MAS"
    hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"lambda": 3}))
    static_hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict(
            {"l1_decay": 0, "orth_reg": 0}))

    def make_update_rule(self) -> UpdateRule:
        return MASRule(orth_reg=bool(self.static_hyperparams["orth_reg"]))

    def _l1_decay(self) -> bool:
        return bool(self.static_hyperparams["l1_decay"])

    def _prepare(self, args, manager):
        prev_model = io.load(manager.previous_task_model_path)
        prev_params = jax.tree_util.tree_map(jnp.asarray,
                                             prev_model["params"])
        prev_task = manager.task_counter - 1
        prev_data = manager.dataset.get_task_dataset(prev_task)
        engine = common.build_engine(manager, UpdateRule(),
                                     manager.task_counter, augment=False)
        omega_new = imp_lib.mas_importance(
            engine.ctx, prev_params,
            jax.tree_util.tree_map(jnp.asarray,
                                   prev_model.get("batch_stats", {})),
            _bank_from_model(prev_model), prev_task - 1,
            np.asarray(prev_data.train.images))
        aux = prev_model.get("method_aux")
        if aux and "omega" in aux:
            omega = jax.tree_util.tree_map(
                lambda o, f: jnp.asarray(o) + f, aux["omega"], omega_new)
        else:
            omega = omega_new
        return omega, prev_params, {}


@dataclass
class SI(_RegMethodBase):
    """SI trains with the path integral live in the update rule; at each new
    task start, the previous model's (omega, w, theta_star) consolidate.
    SI is also the method that produces the shared first-task base model
    (ref:src/framework/main.py first_task_basemodel_dump)."""

    name: str = "SI"
    hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"lambda": 400}))

    def make_update_rule(self) -> UpdateRule:
        return SIRule()

    def _prepare(self, args, manager):
        prev_model = io.load(manager.previous_task_model_path)
        prev_params = jax.tree_util.tree_map(jnp.asarray,
                                             prev_model["params"])
        aux = prev_model.get("method_aux")
        if aux and "w" in aux:
            omega = si_consolidate(prev_params, aux)
        else:  # task 1 (basemodel dump): start from zeros
            omega = jax.tree_util.tree_map(jnp.zeros_like, prev_params)
        w0 = jax.tree_util.tree_map(jnp.zeros_like, prev_params)
        return omega, prev_params, {"w": w0}

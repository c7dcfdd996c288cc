"""EBLL — Encoder-Based Lifelong Learning
(ref:src/methods/EBLL/{Finetune_SGD_EBLL,AlexNet_EBLL}.py,
wrapper ref:src/methods/method.py:822-937).

Extends LwF: besides distilling previous heads, the conv-feature codes of
every previous task's undercomplete autoencoder are anchored:

- ``prestep`` grid-trains an autoencoder (Linear+Sigmoid encoder / Linear
  decoder over the flattened conv features) on the *previous* task's data
  with Adadelta, loss ``alpha*MSE(recon, feats) + CE(classifier(recon))``
  (ref:Finetune_SGD_EBLL.py:398-447,93-205); grid over
  encoder_dims x encoder_alphas x autoencoder_lr with checkpoint/resume.
- ``train`` = LwF distillation + ``ebll_reg_alpha * sum_t
  MSE(enc_t(conv_feats_cur), enc_t(conv_feats_frozen))``
  (ref:Finetune_SGD_EBLL.py:230-395).

TPU design: autoencoder training is its own small jitted scan (conv features
precomputed once for the whole task dataset — the frozen extractor never
reruns); the code-anchoring MSE shares the student/teacher conv passes with
the LwF term inside the compiled step (XLA CSEs the duplicate forward)."""

from __future__ import annotations

import itertools
import os
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from clsurvey_tpu.methods import common
from clsurvey_tpu.methods.base import Category, Method
from clsurvey_tpu.methods.lwf import LwFRule
from clsurvey_tpu.models import heads as heads_lib
from clsurvey_tpu.models.backbones import VGGFeatures, VGG_CFG
from clsurvey_tpu.ops import preprocess as pp
from clsurvey_tpu.ops.distill import lwf_distill_multi
from clsurvey_tpu.utils import io


# ---------------------------------------------------------------------------
# autoencoder
# ---------------------------------------------------------------------------

def init_autoencoder(key, x_dim: int, h_dim: int) -> dict:
    k1, k2 = jax.random.split(key)
    glorot = jax.nn.initializers.glorot_uniform()
    return {
        "enc": {"kernel": glorot(k1, (x_dim, h_dim)),
                "bias": jnp.zeros((h_dim,))},
        "dec": {"kernel": glorot(k2, (h_dim, x_dim)),
                "bias": jnp.zeros((x_dim,))},
    }


def encode(ae: dict, x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.sigmoid(x @ ae["enc"]["kernel"] + ae["enc"]["bias"])


def decode(ae: dict, h: jnp.ndarray) -> jnp.ndarray:
    return h @ ae["dec"]["kernel"] + ae["dec"]["bias"]


class _AlexConvs(nn.Module):
    """AlexNet conv stack alone (param names match AlexNetBackbone)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from clsurvey_tpu.models.backbones import conv_init

        conv = lambda f, k, s, p, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
            dtype=self.dtype, kernel_init=conv_init, name=name)
        x = nn.relu(conv(64, 11, 4, 2, "conv_0")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(conv(192, 5, 1, 2, "conv_1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(conv(384, 3, 1, 1, "conv_2")(x))
        x = nn.relu(conv(256, 3, 1, 1, "conv_3")(x))
        x = nn.relu(conv(256, 3, 1, 1, "conv_4")(x))
        return nn.max_pool(x, (3, 3), strides=(2, 2))


class _AlexTrunk(nn.Module):
    """AlexNet FC trunk alone (param names match AlexNetBackbone)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from clsurvey_tpu.models.backbones import dense_init

        for j in (0, 1):
            x = nn.Dense(4096, dtype=self.dtype, kernel_init=dense_init,
                         name=f"fc_{j}")(x)
            x = nn.relu(x)
        return x


def conv_feats(spec, params, x, train=False, batch_stats=None):
    """Flattened conv-extractor output — the autoencoder's input space
    (the reference inserts the AE right after ``features``). Supports the
    VGG family (nested features/trunk params, optional BN stats) and
    AlexNet (flat conv_*/fc_* params, the arch the reference's own EBLL
    runs on)."""
    if spec.arch == "alexnet":
        sub = {k: v for k, v in params.items() if k.startswith("conv_")}
        out = _AlexConvs(spec.compute_dtype).apply({"params": sub}, x)
    else:
        mod = VGGFeatures(VGG_CFG[spec.arch], spec.batch_norm,
                          spec.compute_dtype)
        variables = {"params": params["features"]}
        if spec.batch_norm:
            variables["batch_stats"] = (batch_stats or {}).get(
                "features", {})
        out = mod.apply(variables, x, train=False)
    return out.reshape(out.shape[0], -1).astype(jnp.float32)


def trunk_head_logits(spec, ctx_bank, params, flat, task):
    """classifier trunk + task head on (possibly reconstructed) conv feats."""
    from clsurvey_tpu.models.backbones import ClassifierTrunk

    if spec.arch == "alexnet":
        sub = {k: v for k, v in params.items() if k.startswith("fc_")}
        feats = _AlexTrunk(spec.compute_dtype).apply(
            {"params": sub}, flat).astype(jnp.float32)
        return heads_lib.forward(ctx_bank, feats, task)
    init_mode = "torch" if spec.arch != "tiny_CNN" else "kaiming"
    trunk = ClassifierTrunk(spec.classifier_dims, spec.dropout,
                            spec.compute_dtype, init_mode=init_mode)
    feats = trunk.apply({"params": params["trunk"]}, flat,
                        train=False).astype(jnp.float32)
    return heads_lib.forward(ctx_bank, feats, task)


def train_autoencoder(spec, model, bank, task, images_u8, labels,
                      val_images_u8, val_labels, mean, std, h_dim,
                      alpha, lr, epochs, batch_size, seed=7):
    """Adadelta AE training; returns (ae_params, best_val_acc) where acc is
    the frozen classifier's accuracy on the reconstruction
    (ref:Finetune_SGD_EBLL.py:93-205)."""
    params = jax.tree_util.tree_map(jnp.asarray, model["params"])

    @jax.jit
    def feats_of(x_u8):
        x = pp.normalize(x_u8, mean, std)
        return conv_feats(spec, params, x)

    def feats_all(images, bs=256):
        return jnp.concatenate([
            feats_of(jnp.asarray(images[i:i + bs]))
            for i in range(0, len(images), bs)])

    tr_feats = feats_all(images_u8)
    va_feats = feats_all(val_images_u8)
    tr_labels = jnp.asarray(labels)
    va_labels = jnp.asarray(val_labels)
    x_dim = int(tr_feats.shape[-1])

    ae = init_autoencoder(jax.random.PRNGKey(seed), x_dim, h_dim)
    opt = optax.adadelta(lr)
    opt_state = opt.init(ae)

    def loss_fn(ae, f, y):
        recon = decode(ae, encode(ae, f))
        mse = jnp.mean((recon - f) ** 2)
        logits = trunk_head_logits(spec, bank, params, recon, task)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()
        return alpha * mse + ce

    @jax.jit
    def epoch(ae, opt_state, perm, key):
        bsz = min(batch_size, tr_feats.shape[0])
        steps = perm.shape[0] // bsz

        def body(carry, i):
            ae, opt_state = carry
            idx = jax.lax.dynamic_slice_in_dim(perm, i * bsz, bsz)
            f = jnp.take(tr_feats, idx, 0)
            y = jnp.take(tr_labels, idx, 0)
            g = jax.grad(loss_fn)(ae, f, y)
            updates, opt_state = opt.update(g, opt_state, ae)
            ae = optax.apply_updates(ae, updates)
            return (ae, opt_state), None

        (ae, opt_state), _ = jax.lax.scan(body, (ae, opt_state),
                                          jnp.arange(steps))
        return ae, opt_state

    @jax.jit
    def val_acc_of(ae):
        recon = decode(ae, encode(ae, va_feats))
        logits = trunk_head_logits(spec, bank, params, recon, task)
        return jnp.mean((jnp.argmax(logits, -1) == va_labels).astype(
            jnp.float32))

    best_acc, best_ae = 0.0, io.to_host(ae)
    root = jax.random.PRNGKey(seed + 1)
    for e in range(epochs):
        key = jax.random.fold_in(root, e)
        perm = jax.random.permutation(key, tr_feats.shape[0])
        ae, opt_state = epoch(ae, opt_state, perm, key)
        acc = float(val_acc_of(ae))
        if acc > best_acc:
            best_acc, best_ae = acc, io.to_host(ae)
    return best_ae, best_acc


# ---------------------------------------------------------------------------
# update rule: LwF distillation + code anchoring
# ---------------------------------------------------------------------------

class EBLLRule(LwFRule):
    def init_state(self, trainable, hyperparams, ctx, prev_model=None,
                   encoders=None):
        state = super().init_state(trainable, hyperparams, ctx,
                                   prev_model=prev_model)
        state["encoders"] = [jax.tree_util.tree_map(jnp.asarray, e)
                             for e in (encoders or [])]
        return state

    def __init__(self, spec):
        self.spec = spec

    LAMBDA_KEY = "reg_lambda"

    def extra_loss(self, ctx, trainable, feats, batch, mstate, rng,
                   batch_stats=None):
        n_prev = ctx.n_tasks - 1
        if n_prev == 0:
            return jnp.float32(0.0)
        x, _ = batch
        teacher = mstate["teacher"]
        # LwF distillation part, shared with LwFRule (its lambda key is
        # EBLL's reg_lambda)
        loss = self.distill_term(ctx, trainable, feats, batch, mstate, rng)

        if mstate["encoders"]:
            cur_conv = conv_feats(self.spec, trainable["params"], x,
                                  batch_stats=batch_stats)
            frz_conv = jax.lax.stop_gradient(
                conv_feats(self.spec, teacher["params"], x,
                           batch_stats=teacher["batch_stats"]))
            code_loss = jnp.float32(0.0)
            for ae in mstate["encoders"]:
                c_cur = encode(ae, cur_conv)
                c_frz = jax.lax.stop_gradient(encode(ae, frz_conv))
                code_loss = code_loss + jnp.mean((c_cur - c_frz) ** 2)
            loss = loss + mstate["hyper"]["ebll_reg_alpha"] * code_loss
        return loss

    def export_aux(self, mstate):
        return {"encoders": mstate["encoders"]}


# ---------------------------------------------------------------------------
# method
# ---------------------------------------------------------------------------

@dataclass
class EBLL(Method):
    name: str = "EBLL"
    category: Category = Category.DATA_BASED
    extra_hyperparams_count: int = 2
    hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict(
            {"reg_lambda": 10, "ebll_reg_alpha": 1}))
    static_hyperparams: "OrderedDict[str, object]" = field(
        default_factory=lambda: OrderedDict({
            "autoencoder_lr": [0.01], "autoencoder_epochs": 50,
            "encoder_alphas": [1e-1, 1e-2], "encoder_dims": [100, 300]}))

    def grid_train(self, args, manager, lr):
        from clsurvey_tpu.methods.finetune import finetune_grid_train

        return finetune_grid_train(args, manager, lr)

    def prestep(self, args, manager):
        """Autoencoder gridsearch on the previous task
        (ref:method.py:835-908)."""
        t_prev = manager.task_counter - 1
        parent = os.path.join(manager.task_dir(t_prev), "ENCODER_TRAINING")
        os.makedirs(parent, exist_ok=True)
        ckpt_file = os.path.join(parent, "grid_checkpoint.pth")
        processed = io.load(ckpt_file) if io.exists(ckpt_file) else {}

        prev_model = io.load(manager.previous_task_model_path)
        bank = {"kernel": jnp.asarray(prev_model["heads"]["kernel"]),
                "bias": jnp.asarray(prev_model["heads"]["bias"]),
                "class_counts": np.asarray(
                    prev_model["heads"]["class_counts"])}
        td = manager.dataset.get_task_dataset(t_prev)
        sh = self.static_hyperparams
        lrs = sh["autoencoder_lr"]
        lrs = lrs if isinstance(lrs, (list, tuple)) else [lrs]
        dims = sh["encoder_dims"]
        dims = dims if isinstance(dims, (list, tuple)) else [dims]
        alphas = sh["encoder_alphas"]
        alphas = alphas if isinstance(alphas, (list, tuple)) else [alphas]

        best_acc, best_ae = -1.0, None
        for dim, alpha, lr in itertools.product(dims, alphas, lrs):
            key = (float(dim), float(alpha), float(lr))
            exp_name = f"dim={dim}_alpha={alpha}_lr={lr}"
            if key in processed:
                acc = processed[key]["acc"]
                ae = processed[key]["ae"]
            else:
                ae, acc = train_autoencoder(
                    manager.model_spec, prev_model, bank, t_prev - 1,
                    td.train.images, td.train.labels,
                    td.val.images, td.val.labels,
                    manager.dataset.mean, manager.dataset.std,
                    h_dim=int(dim), alpha=float(alpha), lr=float(lr),
                    epochs=int(sh["autoencoder_epochs"]),
                    batch_size=args.batch_size, seed=args.seed)
                processed[key] = {"acc": acc, "ae": ae}
                io.save(processed, ckpt_file)
            manager.log(f"AE {exp_name}: acc={acc:.4f}")
            if acc > best_acc:
                best_acc, best_ae = acc, ae
        if best_acc < 0.40:
            manager.log(f"[WARNING] AE grid max acc = {best_acc:.3f}")
        io.save(best_ae, os.path.join(parent, "best_model.pth.tar"))
        manager.extras["ebll_new_encoder"] = best_ae

    def train(self, args, manager, hyperparams):
        prev_model = io.load(manager.previous_task_model_path)
        aux = prev_model.get("method_aux") or {}
        encoders = list(aux.get("encoders", []))
        new_enc = manager.extras.get("ebll_new_encoder")
        if new_enc is not None and len(encoders) < manager.task_counter - 1:
            encoders.append(new_enc)
        rule = EBLLRule(manager.model_spec)
        proto = {"params": jax.tree_util.tree_map(jnp.asarray,
                                                  prev_model["params"]),
                 "heads": None}
        mstate = rule.init_state(proto, dict(hyperparams), None,
                                 prev_model=prev_model, encoders=encoders)
        engine = common.get_task_engine(manager, "ebll_engine")
        best_model, best_acc, _, engine = common.run_training(
            manager, rule, lr=manager.extras["lr"],
            hyperparams=dict(hyperparams),
            exp_dir=manager.extras["heuristic_exp_dir"],
            start_model=prev_model, seed=args.seed, mstate=mstate,
            engine=engine)
        common.set_task_engine(manager, "ebll_engine", engine)
        return best_model, best_acc

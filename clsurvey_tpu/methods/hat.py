"""HAT — Hard Attention to the Task
(ref:src/methods/HAT/{approaches/hat.py, HAT_utils.py, networks/vgg_hat.py},
wrapper ref:src/methods/method.py:600-627).

Mechanism: per-layer task embeddings e_t gate every conv/FC output with
``m = sigmoid(s * e_t)``; s anneals ``1/smax -> smax`` across each epoch's
batches (ref:hat.py:216-219); the loss adds the sparsity term
``c * sum(m * (1 - m_prev)) / sum(1 - m_prev)`` (L1/count for task 0,
ref:hat.py:285-299); gradients of weights used by previous tasks are blocked
with ``mask_back = 1 - a^{<t}`` expanded per weight (ref:HAT_utils.py:
185-250, vgg_hat.py:258-295); embedding gradients are cosh-compensated,
clipped, and the embeddings clamped to +-6 after each step
(ref:hat.py:236-239).

HAT keeps its own training controller, like the reference's ``Appr``
(patience 10, lr/3 at half patience, stop at 0, warmup at lr 0.01 with
lambda=0 on task 0 — exited AFTER epoch ``warmup_epochs`` like the
reference's post-epoch `e >= warmup_epochs` check, i.e. warmup_epochs+1
epochs — and a min-epoch guard, ref:hat.py:139-199,174-179)
— it does NOT share the generic engine's x0.1-at-5 schedule.

TPU design: the whole epoch (s-annealing included) is one jitted lax.scan;
mask_back is a static device pytree recomputed from the embeddings at task
start; gates/masks are computed inside the differentiated forward so XLA
fuses them with the convs."""

from __future__ import annotations

import os
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clsurvey_tpu.methods import common
from clsurvey_tpu.methods.base import Category, Method
from clsurvey_tpu.models import heads as heads_lib
from clsurvey_tpu.models.backbones import VGG_CFG, conv_init, dense_init
from clsurvey_tpu.ops import pool_pallas
from clsurvey_tpu.ops import preprocess as pp
from clsurvey_tpu.parallel import mesh as mesh_lib
from clsurvey_tpu.utils import io
from clsurvey_tpu.utils.paths import BEST_MODEL_FILENAME, EPOCH_CKPT_FILENAME

THRES_COSH = 50.0
THRES_EMB = 6.0
CLIPGRAD = 10000.0
# uniform(0, 2): every gate starts OPEN (sigmoid(s*e) >= 0.5, ~1 at smax)
# so the full network trains from step one and the sparsity term closes
# capacity selectively; a zero-mean init shuts half the gates at random,
# attenuating activations ~0.5^L and stalling training
# (ref:src/methods/HAT/networks/vgg_hat.py:75-80 uniform_init lo,hi=0,2)
emb_init = nn.initializers.uniform(scale=2.0)


class HATVGG(nn.Module):
    """VGG backbone with per-layer task-embedding gates.

    Returns (features, masks): masks is the list of per-layer gate vectors
    for the requested task (conv layers first, then fc trunk layers),
    matching ref:vgg_hat.py:90-127."""

    cfg_name: str
    classifier_dims: Sequence[int]
    n_tasks: int
    dropout: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, task, s, train: bool = False,
                 ones_gates: bool = False):
        cfg = VGG_CFG[self.cfg_name]
        masks = []
        conv_idx = 0
        for v in cfg:
            if v == "M":
                x = pool_pallas.pool2x2(x)
                continue
            x = nn.Conv(int(v), (3, 3), padding="SAME", dtype=self.dtype,
                        kernel_init=conv_init,
                        name=f"conv_{conv_idx}")(x)
            x = nn.relu(x)
            emb = self.param(f"emb_conv_{conv_idx}", emb_init,
                             (self.n_tasks, int(v)), jnp.float32)
            gate = jax.nn.sigmoid(s * emb[task])
            if ones_gates:
                gate = jnp.ones_like(gate)
            masks.append(gate)
            x = x * gate.reshape(1, 1, 1, -1).astype(x.dtype)
            conv_idx += 1
        x = x.reshape((x.shape[0], -1))
        kinit = dense_init if self.cfg_name != "tiny_CNN" else conv_init
        for j, d in enumerate(self.classifier_dims):
            x = nn.Dense(int(d), dtype=self.dtype, kernel_init=kinit,
                         name=f"fc_{j}")(x)
            x = nn.relu(x)
            if self.dropout:
                x = nn.Dropout(rate=0.5, deterministic=not train)(x)
            emb = self.param(f"emb_fc_{j}", emb_init,
                             (self.n_tasks, int(d)), jnp.float32)
            gate = jax.nn.sigmoid(s * emb[task])
            if ones_gates:
                gate = jnp.ones_like(gate)
            masks.append(gate)
            x = x * gate.astype(x.dtype)
        return x.astype(jnp.float32), masks

    def conv_channels(self):
        return [int(v) for v in VGG_CFG[self.cfg_name] if v != "M"]

    def smid_hw(self, input_size):
        """Feature-map spatial dims at the conv->fc boundary."""
        n_pools = sum(1 for v in VGG_CFG[self.cfg_name] if v == "M")
        return (input_size[0] // (2 ** n_pools),
                input_size[1] // (2 ** n_pools))


def _alexnet_smid(n: int) -> int:
    """Spatial extent after AlexNet's conv/pool stack (torch arithmetic)."""
    n = (n + 2 * 2 - 11) // 4 + 1   # conv 11x11 s4 p2
    n = (n - 3) // 2 + 1            # maxpool 3x3 s2
    #                                 conv 5x5 s1 p2 keeps size
    n = (n - 3) // 2 + 1            # maxpool
    #                                 3x 3x3 s1 p1 convs keep size
    n = (n - 3) // 2 + 1            # maxpool
    return n


class HATAlexNet(nn.Module):
    """AlexNet backbone with per-layer task-embedding gates
    (ref:src/methods/HAT/networks/alexnet_hat.py — vgg_hat.Net over the
    torchvision AlexNet with the dropout-FIRST FC order, ``first_drop=True``).

    Same interface as HATVGG: returns (features, masks) with conv gates
    first, then fc-trunk gates. Param names match HATVGG's scheme
    (conv_i / fc_j / emb_*) so ``compute_mask_back`` applies unchanged."""

    n_tasks: int
    dtype: Any = jnp.float32
    ALEX_CONVS = ((64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
                  (256, 3, 1, 1), (256, 3, 1, 1))
    POOL_AFTER = (0, 1, 4)  # maxpool 3x3 s2 after these conv indices
    FC_DIMS = (4096, 4096)

    @nn.compact
    def __call__(self, x, task, s, train: bool = False,
                 ones_gates: bool = False):
        masks = []
        for i, (f, k, st, p) in enumerate(self.ALEX_CONVS):
            x = nn.Conv(f, (k, k), strides=(st, st),
                        padding=[(p, p), (p, p)], dtype=self.dtype,
                        kernel_init=conv_init, name=f"conv_{i}")(x)
            x = nn.relu(x)
            if i in self.POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            emb = self.param(f"emb_conv_{i}", emb_init,
                             (self.n_tasks, f), jnp.float32)
            gate = jax.nn.sigmoid(s * emb[task])
            if ones_gates:
                gate = jnp.ones_like(gate)
            masks.append(gate)
            x = x * gate.reshape(1, 1, 1, -1).astype(x.dtype)
        x = x.reshape((x.shape[0], -1))
        for j, d in enumerate(self.FC_DIMS):
            # AlexNet order: relu(fc(drop(x))) (ref:alexnet_hat.py forward)
            x = nn.Dropout(rate=0.5, deterministic=not train)(x)
            x = nn.Dense(d, dtype=self.dtype, kernel_init=dense_init,
                         name=f"fc_{j}")(x)
            x = nn.relu(x)
            emb = self.param(f"emb_fc_{j}", emb_init,
                             (self.n_tasks, d), jnp.float32)
            gate = jax.nn.sigmoid(s * emb[task])
            if ones_gates:
                gate = jnp.ones_like(gate)
            masks.append(gate)
            x = x * gate.astype(x.dtype)
        return x.astype(jnp.float32), masks

    def conv_channels(self):
        return [f for f, _, _, _ in self.ALEX_CONVS]

    def smid_hw(self, input_size):
        return (_alexnet_smid(input_size[0]), _alexnet_smid(input_size[1]))


def compute_mask_pre(model, params, task: int, smax: float):
    """a^{<t}: elementwise max of previous tasks' gates at s=smax
    (ref:hat.py:57-89 ``init_masks``)."""
    if task == 0:
        return None
    masks_pre = None
    for t in range(task):
        _, masks = model.apply({"params": params},
                               jnp.zeros((1,) + _dummy_hw(model), jnp.float32),
                               t, jnp.float32(smax))
        masks = [jax.lax.stop_gradient(m) for m in masks]
        if masks_pre is None:
            masks_pre = masks
        else:
            masks_pre = [jnp.maximum(a, b) for a, b in zip(masks_pre, masks)]
    return masks_pre


def _dummy_hw(model):
    # input spatial size is only needed to trace; stored on the instance
    return model._input_hw  # set by make_hat_model


def make_hat_model(spec, n_tasks: int):
    if spec.arch == "alexnet":
        model = HATAlexNet(n_tasks=n_tasks, dtype=spec.compute_dtype)
    else:
        model = HATVGG(cfg_name=spec.arch,
                       classifier_dims=spec.classifier_dims,
                       n_tasks=n_tasks, dropout=spec.dropout,
                       dtype=spec.compute_dtype)
    object.__setattr__(model, "_input_hw",
                       (spec.input_size[0], spec.input_size[1], 3))
    return model


def compute_mask_back(model, params, mask_pre, input_size):
    """1 - get_view_for(a^{<t}) per weight (ref:vgg_hat.py:258-295).

    Returns a pytree matching ``params`` with entries for conv/fc kernels
    and biases; embedding leaves get ones (never blocked)."""
    if mask_pre is None:
        return jax.tree_util.tree_map(jnp.ones_like, params)
    n_conv = len(model.conv_channels())
    conv_masks = mask_pre[:n_conv]
    fc_masks = mask_pre[n_conv:]
    # spatial size after the pools, for the conv->fc boundary expansion
    smid_h, smid_w = model.smid_hw(input_size)

    out = {}
    for name, leaf in params.items():
        if name.startswith("conv_"):
            i = int(name.split("_")[1])
            post = conv_masks[i]
            kern_view = post.reshape(1, 1, 1, -1)
            if i == 0:
                view = jnp.broadcast_to(kern_view, leaf["kernel"].shape)
            else:
                pre = conv_masks[i - 1].reshape(1, 1, -1, 1)
                view = jnp.minimum(
                    jnp.broadcast_to(kern_view, leaf["kernel"].shape),
                    jnp.broadcast_to(pre, leaf["kernel"].shape))
            out[name] = {"kernel": 1.0 - view, "bias": 1.0 - post}
        elif name.startswith("fc_"):
            j = int(name.split("_")[1])
            post = fc_masks[j]
            post_view = post.reshape(1, -1)
            if j == 0:
                # NHWC flatten: channel-fastest -> tile conv mask spatially
                pre = jnp.tile(conv_masks[-1], smid_h * smid_w)
            else:
                pre = fc_masks[j - 1]
            pre_view = pre.reshape(-1, 1)
            view = jnp.minimum(
                jnp.broadcast_to(post_view, leaf["kernel"].shape),
                jnp.broadcast_to(pre_view, leaf["kernel"].shape))
            out[name] = {"kernel": 1.0 - view, "bias": 1.0 - post}
        else:  # embeddings: never blocked
            out[name] = jnp.ones_like(leaf)
    return out


def capacity_report(model, params, task: int, smax: float,
                    mask_back=None, log=print) -> dict:
    """Per-layer gate/capacity summary (ref:vgg_hat.py:129-256
    premask_summary + backmask_summary): embedding mean/std, saturated-gate
    counts (<0.1 / >0.9) for the current task, and — when mask_back is
    given — the % of weight capacity still trainable per layer."""
    report = {}
    log("=" * 70)
    log(f"Task {task}: HAT CAPACITY SUMMARY (smax={smax})")
    for name in sorted(params):
        if not name.startswith("emb_"):
            continue
        emb = np.asarray(params[name][task])
        gates = 1.0 / (1.0 + np.exp(-smax * emb))
        stats = {"emb_mean": float(emb.mean()), "emb_std": float(emb.std()),
                 "gates_off": int((gates < 0.1).sum()),
                 "gates_on": int((gates > 0.9).sum()), "units": emb.size}
        report[name] = stats
        log(f"  {name}: u={stats['emb_mean']:.4f} std={stats['emb_std']:.4f}"
            f" gates<0.1: {stats['gates_off']}/{stats['units']}"
            f" gates>0.9: {stats['gates_on']}/{stats['units']}")
    if mask_back is not None:
        caps = []
        for name, leaf in mask_back.items():
            if not isinstance(leaf, dict):
                continue
            cap = 100.0 * float(np.asarray(leaf["kernel"]).mean())
            caps.append(cap)
            report[f"capacity_left/{name}"] = cap
            log(f"  capacity left {name}: {cap:.1f}%")
        if caps:
            report["capacity_left/avg"] = float(np.mean(caps))
            log(f"  capacity left avg: {np.mean(caps):.1f}%")
    log("=" * 70)
    return report


def sparsity_reg(masks, mask_pre):
    """ref:hat.py:285-299."""
    if mask_pre is None:
        num = sum(jnp.sum(m) for m in masks)
        den = sum(m.size for m in masks)
        return num / den
    num = sum(jnp.sum(m * (1 - mp)) for m, mp in zip(masks, mask_pre))
    den = sum(jnp.sum(1 - mp) for mp in mask_pre)
    return num / jnp.maximum(den, 1e-8)


# ---------------------------------------------------------------------------
# HAT engine (own compiled step + controller, like the reference's Appr)
# ---------------------------------------------------------------------------

class HATEngine:
    def __init__(self, model: HATVGG, spec, task: int, class_counts,
                 mean, std, smax: float, lamb_holder, mask_pre, mask_back,
                 momentum: float = 0.9, weight_decay: float = 0.0,
                 finetune_mode: bool = False, mesh=None,
                 augment: bool = True):
        self.model = model
        self.spec = spec
        self.task = task
        self.class_counts = np.asarray(class_counts, np.int32)
        self.mean, self.std = tuple(mean), tuple(std)
        self.smax = float(smax)
        self.momentum = momentum
        self.augment = augment
        self.weight_decay = weight_decay
        self.finetune_mode = finetune_mode
        self.mask_pre = mask_pre
        self.mask_back = mask_back
        # Data-parallel mesh (SURVEY §2.7): batches sharded over the data
        # axis, weights/embeddings/masks replicated; GSPMD inserts the
        # gradient psums. Same design as engine/train.py's Engine.
        self.mesh = mesh if mesh is not None else mesh_lib.get_mesh()
        self._train_epoch = jax.jit(self._train_epoch_impl,
                                    static_argnums=(7,),
                                    donate_argnums=(0,))
        self._eval = jax.jit(self._eval_impl)

    def bank(self, trainable):
        return {"kernel": trainable["heads"]["kernel"],
                "bias": trainable["heads"]["bias"],
                "class_counts": self.class_counts}

    def _is_emb(self, path):
        name = getattr(path[0], "key", "")
        return str(name).startswith("emb_")

    def _train_step(self, state, x_u8, y, rng, lr, s, lamb):
        import optax

        trainable, momentum = state
        rng_pre, rng_d = jax.random.split(rng)
        x = pp.preprocess(rng_pre, x_u8, self.mean, self.std,
                          augment=self.augment)
        x = mesh_lib.constrain_batch(x, self.mesh)

        def loss_fn(tr):
            feats, masks = self.model.apply(
                {"params": tr["params"]}, x, self.task, s, train=True,
                rngs={"dropout": rng_d} if self.spec.uses_dropout else None,
                ones_gates=self.finetune_mode)
            logits = heads_lib.forward(self.bank(tr), feats, self.task)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            reg = sparsity_reg(masks, self.mask_pre) \
                if not self.finetune_mode else 0.0
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            return ce + lamb * reg, (ce, acc)

        (loss, (ce, acc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(trainable)

        def proc_param(path, g, p):
            is_emb = self._is_emb(path)
            if self.weight_decay and not is_emb:
                g = g + self.weight_decay * p
            if not self.finetune_mode:
                if is_emb:
                    num = jnp.cosh(jnp.clip(s * p, -THRES_COSH,
                                            THRES_COSH)) + 1
                    den = jnp.cosh(p) + 1
                    g = g * (self.smax / s) * num / den
                # clip per-param grad norm (ref clipgrad)
                norm = jnp.linalg.norm(g)
                g = g * jnp.minimum(1.0, CLIPGRAD / jnp.maximum(norm, 1e-12))
            return g

        grads_params = jax.tree_util.tree_map_with_path(
            proc_param, grads["params"], trainable["params"])
        # mask_back constrains previous-task weights in BOTH modes
        # (ref:HAT_utils.py:220-222: applied whenever t > 0; only the
        # cosh compensation and clipping are finetune-gated)
        if self.task > 0 and self.mask_back is not None:
            grads_params = jax.tree_util.tree_map(
                jnp.multiply, grads_params, self.mask_back)
        # heads: only the current task's head trains
        grads_heads = common.current_task_head_grads(grads["heads"],
                                                     self.task)
        grads = {"params": grads_params, "heads": grads_heads}

        momentum = jax.tree_util.tree_map(
            lambda b, g: self.momentum * b + g, momentum, grads)
        trainable = jax.tree_util.tree_map(
            lambda p, u: p - lr * u, trainable, momentum)
        # clamp embeddings (ref:hat.py:238-239)
        trainable["params"] = jax.tree_util.tree_map_with_path(
            lambda path, p: jnp.clip(p, -THRES_EMB, THRES_EMB)
            if self._is_emb(path) else p, trainable["params"])
        return (trainable, momentum), {"loss": ce, "acc": acc}

    def _train_epoch_impl(self, state, images, labels, perm, rng, lr,
                          lamb, bsz):
        steps = perm.shape[0] // bsz

        from clsurvey_tpu.engine.train import gather_rows_u8

        def body(carry, i):
            st, r = carry
            r, sub = jax.random.split(r)
            idx = jax.lax.dynamic_slice_in_dim(perm, i * bsz, bsz)
            x = gather_rows_u8(images, idx)
            y = jnp.take(labels, idx, axis=0)
            progress = i.astype(jnp.float32) / jnp.maximum(steps - 1, 1)
            s = (self.smax - 1 / self.smax) * progress + 1 / self.smax
            st, metrics = self._train_step(st, x, y, sub, lr, s, lamb)
            return (st, r), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng),
                                           jnp.arange(steps))
        return state, jax.tree_util.tree_map(jnp.mean, metrics)

    def _eval_impl(self, trainable, images, labels, idx, weights):
        from clsurvey_tpu.engine.train import gather_rows_u8

        def body(carry, inp):
            c, t_ = carry
            bidx, w = inp
            x = pp.preprocess(jax.random.PRNGKey(0),
                              gather_rows_u8(images, bidx), self.mean,
                              self.std, augment=False)
            x = mesh_lib.constrain_batch(x, self.mesh)
            feats, _ = self.model.apply(
                {"params": trainable["params"]}, x, self.task,
                jnp.float32(self.smax), ones_gates=self.finetune_mode)
            logits = heads_lib.forward(self.bank(trainable), feats,
                                       self.task)
            y = jnp.take(labels, bidx, 0)
            hit = (jnp.argmax(logits, -1) == y).astype(jnp.float32) * w
            return (c + hit.sum(), t_ + w.sum()), None

        (c, t_), _ = jax.lax.scan(body, (jnp.float32(0), jnp.float32(0)),
                                  (idx, weights))
        return c / jnp.maximum(t_, 1.0)

    def _round_batch(self, batch_size: int, n: int) -> int:
        """Clamp to the dataset and round to a mesh-size multiple so
        ``constrain_batch`` never sees non-divisible shards."""
        batch_size = min(int(batch_size), int(n))
        nd = self.mesh.devices.size
        if nd > 1 and batch_size % nd:
            batch_size = max((batch_size // nd) * nd, nd)
        return batch_size

    def evaluate(self, trainable, images, labels, batch_size):
        n = images.shape[0]
        batch_size = self._round_batch(batch_size, n)
        n_batches = -(-n // batch_size)
        pad = n_batches * batch_size - n
        idx = np.concatenate([np.arange(n), np.zeros(pad, np.int64)])
        w = np.concatenate([np.ones(n, np.float32),
                            np.zeros(pad, np.float32)])
        return float(self._eval(
            trainable, images, labels,
            jnp.asarray(idx.reshape(n_batches, batch_size)),
            jnp.asarray(w.reshape(n_batches, batch_size))))


def hat_train_task(engine: HATEngine, exp_dir: str, trainable, task_data,
                   nepochs: int, batch_size: int, lr: float, lamb: float,
                   seed: int = 7, lr_patience: int = 10,
                   lr_factor: float = 3.0, warmup: bool = False,
                   warmup_lr: float = 0.01, warmup_epochs: int = 10,
                   min_epochs: int = 0, save_models: bool = True,
                   log=print):
    """The reference Appr.train controller (ref:hat.py:96-199), including
    epoch-checkpoint resume (ref:hat.py:100-121)."""
    os.makedirs(exp_dir, exist_ok=True)
    mesh = getattr(engine, "mesh", None)  # host-loop tests stub the engine
    nd = mesh.devices.size if mesh is not None else 1
    rep = mesh_lib.replicated(mesh) if nd > 1 else None

    def place(tree):
        return jax.device_put(tree, rep) if rep is not None else tree

    train_images = place(jnp.asarray(task_data.train.images))
    train_labels = place(jnp.asarray(task_data.train.labels))
    val_images = place(jnp.asarray(task_data.val.images))
    val_labels = place(jnp.asarray(task_data.val.labels))
    n_train = int(train_images.shape[0])
    bsz = min(batch_size, n_train)
    if nd > 1 and bsz % nd:  # mesh-divisible shards for constrain_batch
        bsz = max((bsz // nd) * nd, nd)
    if n_train < bsz:
        raise ValueError(
            f"dataset of {n_train} samples cannot fill one batch of "
            f"{bsz} on a {nd}-device mesh")

    # finite task-start snapshot BEFORE the donating jit consumes the
    # buffers: the fallback for runs that never improve (a NaN-aborted
    # final state must not chain into the next task — same hardening as
    # engine/train.train_task)
    task_start = io.to_host(trainable)
    momentum = jax.tree_util.tree_map(jnp.zeros_like, trainable)
    state = place((trainable, momentum))
    patience = lr_patience
    cur_lr = warmup_lr if warmup else lr
    best_acc, best_model = 0.0, None
    in_warmup = warmup
    start_epoch = 0
    ckpt_path = os.path.join(exp_dir, EPOCH_CKPT_FILENAME)
    if save_models and io.exists(ckpt_path):
        ck = io.load(ckpt_path)
        if (abs(ck.get("smax", engine.smax) - engine.smax) < 1e-6
                and abs(ck.get("lamb", lamb) - lamb) < 1e-6):
            state = place(
                (jax.tree_util.tree_map(jnp.asarray, ck["trainable"]),
                 jax.tree_util.tree_map(jnp.asarray, ck["momentum"])))
            start_epoch = ck["epoch"] + 1
            cur_lr, patience = ck["lr"], ck["patience"]
            best_acc, in_warmup = ck["best_acc"], ck["warmup"]
            best_path = os.path.join(exp_dir, BEST_MODEL_FILENAME)
            if io.exists(best_path):
                best_model = io.load(best_path)
            log(f"HAT resumed epoch {start_epoch} lr={cur_lr:g}")
    root = jax.random.PRNGKey(seed)
    best_loss = float("inf")
    contained_lr_cap = lr  # lowered whenever divergence containment fires
    for e in range(start_epoch, nepochs):
        cur_lamb = 0.0 if in_warmup else lamb
        ekey = jax.random.fold_in(root, e)
        pkey, skey = jax.random.split(ekey)
        perm = jax.random.permutation(pkey, n_train)
        perm = perm[: (n_train // bsz) * bsz]
        state, metrics = engine._train_epoch(
            state, train_images, train_labels, perm, skey,
            jnp.float32(cur_lr), jnp.float32(cur_lamb), bsz)
        val_acc = engine.evaluate(state[0], val_images, val_labels, bsz)
        train_loss = float(metrics["loss"])
        log(f"HAT epoch {e}: loss={train_loss:.4f} "
            f"val={val_acc:.4f} lr={cur_lr:g} lamb={cur_lamb}")
        diverged = (not np.isfinite(train_loss)
                    or train_loss > 2.0 * best_loss + 2.0)
        if diverged:
            # Divergence containment: the Phase-1 lr is selected with
            # all-ones gates (hat_finetune) and can be unstable for the
            # gated net; a diverged state would poison this and every
            # later task (the reference's patience lr/3 cannot rescue
            # already-exploded weights — a loss jump slams embeddings to
            # the +-6 clamp, permanently closing gates). Restore the last
            # good weights, cut the lr, keep training — same policy as
            # our PathNet NaN containment (docs/DEVIATIONS.md). The
            # adaptive threshold (2x best CE + 2) catches soft collapses
            # that stay finite.
            cur_lr /= lr_factor
            if cur_lr < 1e-5:
                log("diverged below lr floor — stopping")
                break
            contained_lr_cap = cur_lr
            restore = best_model if best_model is not None else task_start
            state = place(
                (jax.tree_util.tree_map(jnp.asarray, restore),
                 jax.tree_util.tree_map(
                     lambda x: jnp.zeros_like(jnp.asarray(x)), restore)))
            patience = lr_patience
            log(f"diverged — restored best weights, lr={cur_lr:g}")
        else:
            best_loss = min(best_loss, train_loss)
            if val_acc > best_acc:
                best_acc = val_acc
                best_model = io.to_host(state[0])
                patience = lr_patience
                if save_models:
                    io.save(best_model, os.path.join(exp_dir,
                                                     BEST_MODEL_FILENAME))
            elif not in_warmup:
                patience -= 1
                if patience == lr_patience // 2:
                    cur_lr /= lr_factor
                elif patience <= 0:
                    if e < min_epochs:
                        pass  # min-epoch guard for the first task
                    else:
                        break
        if in_warmup and e >= warmup_epochs:
            # a contained divergence must not be undone by the
            # warmup-exit lr reset: cap at the containment-cut lr
            in_warmup = False
            patience = lr_patience
            cur_lr = min(lr, contained_lr_cap)
        if save_models and (e % 5 == 0 or e == nepochs - 1):
            io.save({"epoch": e, "lr": cur_lr, "patience": patience,
                     "best_acc": best_acc, "warmup": in_warmup,
                     "smax": engine.smax, "lamb": lamb,
                     "trainable": io.to_host(state[0]),
                     "momentum": io.to_host(state[1])}, ckpt_path)
    if best_model is None:
        best_model = task_start
    return best_model, best_acc


# ---------------------------------------------------------------------------
# Method
# ---------------------------------------------------------------------------

@dataclass
class HAT(Method):
    name: str = "HAT"
    category: Category = Category.MASK_BASED
    start_scratch: bool = True
    hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"smax": 800, "c": 2.5}))
    # SGD momentum: the reference's Appr hardcodes 0.9 ("Prev 0.9 req to
    # train", ref:src/methods/HAT/approaches/hat.py:21) and HAT_SGD's
    # momentum branch executes with it (ref:HAT_utils.py:233-245) — the
    # step docstring's "Momentum is disregarded" is stale. Exposed as a
    # knob for the A/B study (docs/hat_study.md).
    momentum: float = 0.9

    def _model_and_state(self, manager, n_tasks_total):
        spec = manager.model_spec
        model = make_hat_model(spec, n_tasks_total)
        return model

    def _load_or_init(self, manager, model):
        """Load the previous HAT model dict, or wrap-init on task 1
        (ref:HAT/run.py wraps the raw model with embeddings)."""
        path = manager.previous_task_model_path
        prev = io.load(path) if path and io.exists(path) else None
        if prev is not None and prev.get("meta", {}).get("hat"):
            return prev
        # task 1: fresh init (embeddings + convs/fcs)
        spec = manager.model_spec
        key = jax.random.PRNGKey(manager.args.seed)
        dummy = jnp.zeros((2, spec.input_size[0], spec.input_size[1], 3))
        variables = model.init({"params": key, "dropout": key}, dummy, 0,
                               jnp.float32(1.0))
        counts = np.zeros(manager.max_tasks, np.int32)
        seq = manager.dataset
        for t in range(1, seq.task_count + 1):
            counts[t - 1] = seq.classes_per_task[seq.get_taskname(t)]
        bank = heads_lib.init_head_bank(
            jax.random.fold_in(key, 5), manager.max_tasks,
            spec.feature_dim, int(counts.max()), counts)
        return {
            "params": io.to_host(variables["params"]),
            "batch_stats": {},
            "heads": io.to_host({"kernel": bank["kernel"],
                                 "bias": bank["bias"],
                                 "class_counts": counts}),
            "meta": {"hat": True},
        }

    def _run(self, manager, lr, smax, lamb, exp_dir, finetune_mode,
             seed, num_epochs):
        args = manager.args
        t = manager.task_counter - 1
        model_mod = self._model_and_state(manager, manager.max_tasks)
        model = self._load_or_init(manager, model_mod)
        params = jax.tree_util.tree_map(jnp.asarray, model["params"])
        # masks are derived in BOTH modes: the reference's hat_finetune
        # also constrains previous tasks' weights via mask_back
        # (ref:hat_finetune.py + HAT_utils.py:220-222 apply mask_back
        # whenever t > 0, not gated on finetune)
        mask_pre = compute_mask_pre(model_mod, params, t, smax)
        mask_back = compute_mask_back(model_mod, params, mask_pre,
                                      manager.model_spec.input_size)
        if not finetune_mode:
            capacity_report(model_mod, params, t, smax, mask_back,
                            log=manager.log)
        engine = HATEngine(
            model_mod, manager.model_spec, t,
            np.asarray(model["heads"]["class_counts"]),
            manager.dataset.mean, manager.dataset.std, smax,
            None, mask_pre, mask_back, momentum=self.momentum,
            weight_decay=args.weight_decay, finetune_mode=finetune_mode,
            augment=getattr(args, "augment", True))
        head_key = jax.random.fold_in(jax.random.PRNGKey(seed), 17)
        trainable = common.prepare_trainable(model, t, head_key,
                                             reinit_head=True)
        warmup = (t == 0) and not finetune_mode
        best_model, best_acc = hat_train_task(
            engine, exp_dir, trainable, manager.current_task_dataset,
            nepochs=num_epochs, batch_size=args.batch_size, lr=lr,
            lamb=lamb, seed=seed, warmup=warmup,
            min_epochs=num_epochs // 2 if t == 0 else 0,
            save_models=args.save_models_mode, log=manager.log)
        out = {
            "params": best_model["params"],
            "batch_stats": {},
            "heads": {"kernel": best_model["heads"]["kernel"],
                      "bias": best_model["heads"]["bias"],
                      "class_counts": np.asarray(
                          model["heads"]["class_counts"])},
            "meta": {"hat": True, "smax": smax, "task": t},
        }
        io.save(out, os.path.join(exp_dir, BEST_MODEL_FILENAME))
        return out, best_acc

    def grid_train(self, args, manager, lr):
        """Phase 1: hat_finetune — all-ones gates, full capacity
        (ref:HAT/approaches/hat_finetune.py:26-33)."""
        exp_dir = manager.extras["gridsearch_exp_dir"]
        seed = manager.extras.get("grid_seed", 0)
        return self._run(manager, lr, smax=float(self.hyperparams["smax"]),
                         lamb=0.0, exp_dir=exp_dir, finetune_mode=True,
                         seed=seed, num_epochs=args.num_epochs)

    def train(self, args, manager, hyperparams):
        exp_dir = manager.extras["heuristic_exp_dir"]
        return self._run(manager, manager.extras["lr"],
                         smax=float(hyperparams["smax"]),
                         lamb=float(hyperparams["c"]), exp_dir=exp_dir,
                         finetune_mode=False, seed=args.seed,
                         num_epochs=args.num_epochs)

    def inference_eval(self, manager, model_path, ref_task, trained_idx):
        from clsurvey_tpu.framework.evaluate import _eval_split

        model = io.load(model_path) if isinstance(model_path, str) \
            else model_path
        smax = float(model["meta"].get("smax", self.hyperparams["smax"]))
        # cache eval engines like default_inference_eval does — a fresh
        # HATEngine per call would recompile its jitted eval for every
        # cell of the (task x model) matrix
        cache_key = ("hat_eval_engine", ref_task, smax)
        engine = manager.extras.get(cache_key)
        if engine is None:
            model_mod = self._model_and_state(manager, manager.max_tasks)
            engine = HATEngine(
                model_mod, manager.model_spec, ref_task - 1,
                np.asarray(model["heads"]["class_counts"]),
                manager.dataset.mean, manager.dataset.std, smax,
                None, None, None, finetune_mode=False)
            manager.extras[cache_key] = engine
        trainable = jax.tree_util.tree_map(jnp.asarray, {
            "params": model["params"],
            "heads": {"kernel": model["heads"]["kernel"],
                      "bias": model["heads"]["bias"]}})
        td = manager.dataset.get_task_dataset(ref_task)
        split = _eval_split(manager, td)
        return engine.evaluate(trainable, jnp.asarray(split.images),
                               jnp.asarray(split.labels),
                               manager.args.batch_size)

"""PathNet — evolutionary module-path selection
(ref:src/methods/HAT/approaches/pathnet.py, networks/vgg_pathnet.py,
wrapper ref:src/methods/method.py:559-597; present in the reference but not
wired into its ``parse()`` — we expose it as ``pathnet``).

Each conv/FC layer is divided into M modules of width ``out/M``; a path
picks N modules per layer and sums their outputs. A binary tournament
(P=2) evolves the path: both candidates train for a few epochs, the winner
survives and the loser is re-seeded as a mutation of the winner (per gene,
prob 1/(N*L), +=randint(-2,2) mod M, ref:pathnet.py:186-199). Modules used
by previous tasks' best paths are frozen; unused modules are re-initialised
at task start (ref:pathnet.py:83-99).

TPU insight: the N selected modules run as ONE conv/matmul whose output
channels are the concatenation of the modules' channels (gather the N
kernels, stack along the output-channel axis); relu/dropout/maxpool are
channelwise, so applying them on the concatenated tensor and then summing
the N channel groups reproduces the reference's post-activation module sum
(ref:vgg_pathnet.py forward: ``sum_j maxpool(drop(relu(conv_j(x))))``)
exactly — no ragged module lists, one MXU launch per layer.

Deviation: the Phase-1 maximal-plasticity variant trains a fixed path with
all its modules unfrozen (the reference's pathnet_finetune uses full-capacity
masks)."""

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
from clsurvey_tpu.ops import preprocess as pp
from clsurvey_tpu.parallel import mesh as mesh_lib
from clsurvey_tpu.utils import io
from clsurvey_tpu.utils.paths import BEST_MODEL_FILENAME


def _stacked(base_init):
    """Init an (M, ...)-stacked module bank as M independent layers: fan
    computation must see the per-module shape, not the stacked one (the
    reference creates M separate torch layers, each with standalone init;
    variance_scaling over the 5D stack makes weights sqrt(M) too small)."""
    def init(key, shape, dtype=jnp.float32):
        keys = jax.random.split(key, shape[0])
        return jnp.stack([base_init(k, shape[1:], dtype) for k in keys])
    return init


class PathNetVGG(nn.Module):
    """Stacked-module VGG. Layer widths are divided by M
    (ref:vgg_pathnet.py:36-90)."""

    cfg_name: str
    classifier_dims: Sequence[int]
    M: int
    N: int
    dtype: Any = jnp.float32

    def layer_sizes(self):
        convs = [int(v) for v in VGG_CFG[self.cfg_name] if v != "M"]
        fcs = [int(d) for d in self.classifier_dims]
        return convs, fcs

    @nn.compact
    def __call__(self, x, path, train: bool = False):
        """path: (L, N) int32 module indices per layer."""
        cfg = VGG_CFG[self.cfg_name]
        conv_idx = 0
        for ci, v in enumerate(cfg):
            if v == "M":
                continue  # handled as pool_after on the preceding conv
            pool_after = ci + 1 < len(cfg) and cfg[ci + 1] == "M"
            out_w = max(int(v) // self.M, 1)
            in_w = x.shape[-1]
            kernel = self.param(f"conv_{conv_idx}_kernel",
                                _stacked(conv_init),
                                (self.M, 3, 3, in_w, out_w), jnp.float32)
            bias = self.param(f"conv_{conv_idx}_bias",
                              nn.initializers.zeros,
                              (self.M, out_w), jnp.float32)
            x = _module_conv(x, kernel, bias, path[conv_idx], out_w,
                             self.dtype, strides=(1, 1), padding="SAME",
                             pool=(2, 2) if pool_after else None)
            conv_idx += 1
        x = x.reshape((x.shape[0], -1))
        n_convs = conv_idx
        kinit = dense_init if self.cfg_name != "tiny_CNN" else conv_init
        for j, d in enumerate(self.classifier_dims):
            out_w = max(int(d) // self.M, 1)
            in_w = x.shape[-1]
            kernel = self.param(f"fc_{j}_kernel", _stacked(kinit),
                                (self.M, in_w, out_w), jnp.float32)
            bias = self.param(f"fc_{j}_bias", nn.initializers.zeros,
                              (self.M, out_w), jnp.float32)
            x = _module_dense(x, kernel, bias, path[n_convs + j], out_w,
                              self.dtype)
        return x.astype(jnp.float32)

    @property
    def n_layers(self):
        convs, fcs = self.layer_sizes()
        return len(convs) + len(fcs)

    @property
    def feature_dim(self):
        return max(int(self.classifier_dims[-1]) // self.M, 1)


def _module_conv(x, kernel, bias, sel, out_w, dtype, strides, padding,
                 pool, drop_rate=0.0, drop_rng=None, pool_shape=(2, 2)):
    """N selected conv modules as one conv with concatenated output
    channels, then channelwise relu[/dropout][/pool] and a sum over the N
    channel groups — exact post-activation module sum
    (ref:vgg_pathnet.py / alexnet_pathnet.py forward)."""
    n = sel.shape[0]
    k = kernel[sel]                       # (N, kh, kw, in, out)
    k = jnp.moveaxis(k, 0, -2).reshape(k.shape[1:3] + (k.shape[3],
                                                       n * out_w))
    b = bias[sel].reshape(n * out_w)
    x = jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype), strides, padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = nn.relu(x + b.astype(x.dtype))
    if drop_rate and drop_rng is not None:
        keep = jax.random.bernoulli(drop_rng, 1 - drop_rate, x.shape)
        x = jnp.where(keep, x / (1 - drop_rate), 0.0).astype(x.dtype)
    if pool is not None:
        x = nn.max_pool(x, pool_shape, strides=pool_shape)
    return x.reshape(x.shape[:-1] + (n, out_w)).sum(-2)


def _module_dense(x, kernel, bias, sel, out_w, dtype, drop_rate=0.0,
                  drop_rng=None):
    n = sel.shape[0]
    k = kernel[sel]                       # (N, in, out)
    k = jnp.moveaxis(k, 0, -2).reshape(k.shape[1], n * out_w)
    b = bias[sel].reshape(n * out_w)
    x = nn.relu(x.astype(dtype) @ k.astype(dtype) + b.astype(dtype))
    if drop_rate and drop_rng is not None:
        keep = jax.random.bernoulli(drop_rng, 1 - drop_rate, x.shape)
        x = jnp.where(keep, x / (1 - drop_rate), 0.0).astype(x.dtype)
    return x.reshape(x.shape[:-1] + (n, out_w)).sum(-2)


class PathNetAlexNet(nn.Module):
    """The reference's standalone 5-layer AlexNet-budget PathNet
    (ref:src/methods/HAT/networks/alexnet_pathnet.py): 3 convs + 2 FCs,
    module widths ``int(0.258 * base)`` ("better config found by us",
    expand_factor matching AlexNet's parameter count), kernel sizes
    ``size//8, size//10, 2``, 2x2 maxpool after every conv, dropout 0.2 on
    the first two convs and 0.5 from conv3 on. Same interface as
    PathNetVGG."""

    input_px: int
    M: int
    N: int
    dtype: Any = jnp.float32
    EXPAND = 0.258

    def layer_sizes(self):
        e = self.EXPAND
        return ([int(e * 64), int(e * 128), int(e * 256)],
                [int(e * 2048), int(e * 2048)])

    @nn.compact
    def __call__(self, x, path, train: bool = False):
        convs, fcs = self.layer_sizes()
        size = self.input_px
        ksizes = (size // 8, size // 10, 2)
        drops = (0.2, 0.2, 0.5)
        make_rng = (lambda i: self.make_rng("dropout")) if train else \
            (lambda i: None)
        for i, (out_w, k, dr) in enumerate(zip(convs, ksizes, drops)):
            in_w = x.shape[-1]
            kernel = self.param(f"conv_{i}_kernel", _stacked(conv_init),
                                (self.M, k, k, in_w, out_w), jnp.float32)
            bias = self.param(f"conv_{i}_bias", nn.initializers.zeros,
                              (self.M, out_w), jnp.float32)
            x = _module_conv(x, kernel, bias, path[i], out_w, self.dtype,
                             strides=(1, 1), padding="VALID", pool=(2, 2),
                             drop_rate=dr if train else 0.0,
                             drop_rng=make_rng(i))
        x = x.reshape((x.shape[0], -1))
        for j, out_w in enumerate(fcs):
            in_w = x.shape[-1]
            kernel = self.param(f"fc_{j}_kernel", _stacked(dense_init),
                                (self.M, in_w, out_w), jnp.float32)
            bias = self.param(f"fc_{j}_bias", nn.initializers.zeros,
                              (self.M, out_w), jnp.float32)
            x = _module_dense(x, kernel, bias, path[3 + j], out_w,
                              self.dtype,
                              drop_rate=0.5 if train else 0.0,
                              drop_rng=make_rng(3 + j))
        return x.astype(jnp.float32)

    @property
    def n_layers(self):
        return 5

    @property
    def feature_dim(self):
        return self.layer_sizes()[1][-1]


def module_train_mask(params, path: np.ndarray, frozen: np.ndarray,
                      n_convs: int):
    """(M,)-per-layer gradient gate: 1 for modules in the current path and
    not frozen by previous best paths (ref ``unfreeze_path``)."""
    L = frozen.shape[0]
    per_layer = np.zeros_like(frozen, dtype=np.float32)  # (L, M)
    for l in range(L):
        per_layer[l, path[l]] = 1.0
    per_layer = per_layer * (1.0 - frozen)

    out = {}
    for name, leaf in params.items():
        layer = _layer_index(name, n_convs)
        gate = jnp.asarray(per_layer[layer])
        out[name] = gate.reshape((-1,) + (1,) * (leaf.ndim - 1))
    return out


def _layer_index(name: str, n_convs: int) -> int:
    """conv_i_* come first, then fc_j_* — offset by the model's own conv
    count (passed explicitly: a process interleaving two PathNet configs
    must not share a global)."""
    kind, idx, _ = name.split("_", 2)
    return int(idx) if kind == "conv" else n_convs + int(idx)


@dataclass
class PathNet(Method):
    name: str = "pathnet"
    category: Category = Category.MASK_BASED
    start_scratch: bool = True
    hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"N": 3}))
    static_hyperparams: "OrderedDict[str, float]" = field(
        default_factory=lambda: OrderedDict({"M": 20, "generations": 35}))

    P: int = 2
    lr_patience: int = 10
    lr_factor: float = 3.0

    def decay_operator(self, value, factor):
        """PathNet 'decays' by ADDING a module per layer
        (ref:src/methods/method.py:565-593)."""
        return int(value) + 1

    # ---- model plumbing -----------------------------------------------------
    def _module(self, manager, N):
        spec = manager.model_spec
        if spec.arch == "alexnet":
            model = PathNetAlexNet(input_px=int(spec.input_size[0]),
                                   M=int(self.static_hyperparams["M"]),
                                   N=int(N), dtype=spec.compute_dtype)
        else:
            model = PathNetVGG(cfg_name=spec.arch,
                               classifier_dims=spec.classifier_dims,
                               M=int(self.static_hyperparams["M"]),
                               N=int(N), dtype=spec.compute_dtype)
        return model

    def _load_or_init(self, manager, model, N):
        path0 = np.zeros((model.n_layers, int(N)), np.int32)
        prev = None
        p = manager.previous_task_model_path
        if p and io.exists(p):
            prev = io.load(p)
        if prev is not None and prev.get("meta", {}).get("pathnet"):
            return prev
        spec = manager.model_spec
        key = jax.random.PRNGKey(manager.args.seed)
        dummy = jnp.zeros((2, spec.input_size[0], spec.input_size[1], 3))
        variables = model.init({"params": key}, dummy, jnp.asarray(path0))
        feat_dim = model.feature_dim
        counts = np.zeros(manager.max_tasks, np.int32)
        seq = manager.dataset
        for t in range(1, seq.task_count + 1):
            counts[t - 1] = seq.classes_per_task[seq.get_taskname(t)]
        bank = heads_lib.init_head_bank(
            jax.random.fold_in(key, 5), manager.max_tasks, feat_dim,
            int(counts.max()), counts)
        return {
            "params": io.to_host(variables["params"]),
            "init_params": io.to_host(variables["params"]),  # for reinit
            "batch_stats": {},
            "heads": io.to_host({"kernel": bank["kernel"],
                                 "bias": bank["bias"],
                                 "class_counts": counts}),
            "meta": {"pathnet": True},
            "method_aux": {"best_paths": []},  # list: N may grow per task
        }

    # ---- compiled pieces ------------------------------------------------------
    def _make_fns(self, model, mean, std, class_counts, task,
                  augment: bool = True):
        import optax

        # Data-parallel mesh (SURVEY §2.7): candidate-path batches sharded
        # over the data axis, module weights/paths/gates replicated.
        mesh = mesh_lib.get_mesh()
        nd = mesh.devices.size

        def round_batch(batch_size, n):
            batch_size = min(int(batch_size), int(n))
            if nd > 1 and batch_size % nd:
                batch_size = max((batch_size // nd) * nd, nd)
            return batch_size

        def bank(tr):
            return {"kernel": tr["heads"]["kernel"],
                    "bias": tr["heads"]["bias"],
                    "class_counts": class_counts}

        from clsurvey_tpu.engine.train import gather_rows_u8

        @jax.jit
        def train_epoch(trainable, momentum, images, labels, perm, path,
                        gates, rng, lr):
            bsz = round_batch(64, perm.shape[0])
            steps = perm.shape[0] // bsz

            def step(carry, i):
                tr, mom, r = carry
                r, sub, pre = jax.random.split(r, 3)
                idx = jax.lax.dynamic_slice_in_dim(perm, i * bsz, bsz)
                x = pp.preprocess(pre, gather_rows_u8(images, idx), mean,
                                  std, augment)
                x = mesh_lib.constrain_batch(x, mesh)
                y = jnp.take(labels, idx, 0)

                def loss_fn(tr):
                    feats = model.apply({"params": tr["params"]}, x, path,
                                        train=True, rngs={"dropout": sub})
                    logits = heads_lib.forward(bank(tr), feats, task)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, y).mean()

                grads = jax.grad(loss_fn)(tr)
                # hard select, NOT multiply: a NaN grad (diverged lr) times
                # a 0-gate is NaN and would poison frozen modules through
                # momentum, destroying every previous task's subnetwork
                gp = {n: jnp.where(gates[n] > 0, g, 0.0)
                      for n, g in grads["params"].items()}
                gh = common.current_task_head_grads(grads["heads"], task)
                g = {"params": gp, "heads": gh}
                mom = jax.tree_util.tree_map(
                    lambda b, gi: 0.9 * b + gi, mom, g)
                tr = jax.tree_util.tree_map(
                    lambda p, u: p - lr * u, tr, mom)
                return (tr, mom, r), None

            (trainable, momentum, _), _ = jax.lax.scan(
                step, (trainable, momentum, rng), jnp.arange(steps))
            return trainable, momentum

        @jax.jit
        def eval_counts(trainable, images, labels, path, idx, weights):
            """Padded batched eval: weight-masked hit/total counters over
            a scan of fixed-size batches — no full-split jit (OOM at
            224px) and one compile per batch shape."""
            def body(carry, inp):
                c, t_ = carry
                bidx, w = inp
                x = pp.preprocess(jax.random.PRNGKey(0),
                                  gather_rows_u8(images, bidx), mean, std,
                                  False)
                x = mesh_lib.constrain_batch(x, mesh)
                feats = model.apply({"params": trainable["params"]}, x,
                                    path)
                logits = heads_lib.forward(bank(trainable), feats, task)
                y = jnp.take(labels, bidx, 0)
                hit = (jnp.argmax(logits, -1) == y).astype(
                    jnp.float32) * w
                return (c + hit.sum(), t_ + w.sum()), None

            (c, t_), _ = jax.lax.scan(
                body, (jnp.float32(0), jnp.float32(0)), (idx, weights))
            return c / jnp.maximum(t_, 1.0)

        def eval_acc(trainable, images, labels, path,
                     batch_size: int = 256):
            n = int(images.shape[0])
            batch_size = round_batch(batch_size, n)
            n_batches = -(-n // batch_size)
            pad = n_batches * batch_size - n
            idx = np.concatenate([np.arange(n), np.zeros(pad, np.int64)])
            w = np.concatenate([np.ones(n, np.float32),
                                np.zeros(pad, np.float32)])
            return float(eval_counts(
                trainable, images, labels, path,
                jnp.asarray(idx.reshape(n_batches, batch_size)),
                jnp.asarray(w.reshape(n_batches, batch_size))))

        return train_epoch, eval_acc

    # ---- evolutionary training (ref:pathnet.py:101-207) -----------------------
    def _evolve(self, args, manager, N, generations, nepochs_per_gen,
                exp_dir, seed, n_candidates: int | None = None):
        P = self.P if n_candidates is None else int(n_candidates)
        t = manager.task_counter - 1
        model = self._module(manager, N)
        state = self._load_or_init(manager, model, N)
        L, M = model.n_layers, int(self.static_hyperparams["M"])
        n_convs = len(model.layer_sizes()[0])
        aux = state.get("method_aux") or {}
        best_paths = [np.asarray(bp) for bp in aux.get("best_paths", [])]
        frozen = np.zeros((L, M), np.float32)
        for bp in best_paths:
            for l in range(L):
                frozen[l, bp[l] % M] = 1.0

        params = jax.tree_util.tree_map(jnp.asarray, state["params"])
        # reinit non-frozen modules from the stored init (ref:pathnet.py:83)
        if t > 0 and "init_params" in state:
            init_p = jax.tree_util.tree_map(jnp.asarray,
                                            state["init_params"])
            new_params = {}
            for name, leaf in params.items():
                l = _layer_index(name, n_convs)
                gate = jnp.asarray(frozen[l]).reshape(
                    (-1,) + (1,) * (leaf.ndim - 1))
                new_params[name] = leaf * gate + init_p[name] * (1 - gate)
            params = new_params

        rng = np.random.default_rng(seed)
        N = int(N)
        paths = np.zeros((P, L, N), np.int32)
        for p in range(P):
            for l in range(L):
                # distinct modules while they fit; with repetition once the
                # decay operator has grown N past M (the reference indexes
                # module lists with arbitrary ints, repeats allowed)
                paths[p, l] = rng.choice(M, N, replace=N > M)

        trainable = {
            "params": params,
            "heads": {"kernel": jnp.asarray(state["heads"]["kernel"]),
                      "bias": jnp.asarray(state["heads"]["bias"])},
        }
        mesh = mesh_lib.get_mesh()
        rep = mesh_lib.replicated(mesh) if mesh.devices.size > 1 else None
        if rep is not None:
            trainable = jax.device_put(trainable, rep)
        class_counts = np.asarray(state["heads"]["class_counts"])
        td = manager.current_task_dataset
        images = jnp.asarray(td.train.images)
        labels = jnp.asarray(td.train.labels)
        val_images = jnp.asarray(td.val.images)
        val_labels = jnp.asarray(td.val.labels)
        if rep is not None:
            images, labels, val_images, val_labels = jax.device_put(
                (images, labels, val_images, val_labels), rep)
        train_epoch, eval_acc = self._make_fns(
            model, manager.dataset.mean, manager.dataset.std, class_counts,
            t, augment=getattr(manager.args, "augment", True))

        momenta = [jax.tree_util.tree_map(jnp.zeros_like, trainable)
                   for _ in range(P)]
        lrs = [manager.extras.get("lr", args.lr_grid[0])] * P
        patience = [self.lr_patience] * P
        best_acc_p = [0.0] * P
        best_overall, best_state, winner = 0.0, io.to_host(trainable), 0
        key = jax.random.PRNGKey(seed)
        n_train = int(images.shape[0])
        for g in range(generations):
            for p in range(P):
                gates = module_train_mask(trainable["params"], paths[p],
                                          frozen, n_convs)
                for e in range(nepochs_per_gen):
                    key, pk, sk = jax.random.split(key, 3)
                    perm = jax.random.permutation(pk, n_train)
                    bsz = min(64, n_train)
                    nd = mesh_lib.num_devices()
                    if nd > 1 and bsz % nd:  # match train_epoch's rounding
                        bsz = max((bsz // nd) * nd, nd)
                    perm = perm[: (n_train // bsz) * bsz]
                    trainable, momenta[p] = train_epoch(
                        trainable, momenta[p], images, labels, perm,
                        jnp.asarray(paths[p]), gates, sk,
                        jnp.float32(lrs[p]))
                    # NaN guard (the engine's equivalent is its abort at
                    # train.py; a diverged candidate must not poison the
                    # shared weights): restore last finite snapshot, drop
                    # this candidate's lr, reset its momentum
                    tot = sum(jnp.sum(leaf) for leaf in
                              jax.tree_util.tree_leaves(trainable))
                    if not np.isfinite(float(tot)):
                        trainable = jax.tree_util.tree_map(jnp.asarray,
                                                           best_state)
                        momenta[p] = jax.tree_util.tree_map(
                            jnp.zeros_like, trainable)
                        lrs[p] /= self.lr_factor
                        continue
                    acc = float(eval_acc(trainable, val_images, val_labels,
                                         jnp.asarray(paths[p])))
                    if acc > best_overall:
                        best_overall, best_state, winner = (
                            acc, io.to_host(trainable), p)
                    if acc > best_acc_p[p]:
                        best_acc_p[p] = acc
                        patience[p] = self.lr_patience
                    else:
                        patience[p] -= 1
                        if patience[p] == self.lr_patience // 2:
                            lrs[p] /= self.lr_factor
            # restore overall winner, mutate losers (ref:pathnet.py:186-199)
            trainable = jax.tree_util.tree_map(jnp.asarray, best_state)
            prob = 1.0 / (N * L)
            for p in range(P):
                if p == winner:
                    continue
                best_acc_p[p] = 0.0
                lrs[p] = lrs[winner]
                patience[p] = self.lr_patience
                # renew the loser's optimizer state (ref:pathnet.py:132-134
                # rebuilds the loser's optimizer every generation): stale
                # momentum from the old path would keep dragging modules
                # that are no longer on the mutated path
                momenta[p] = jax.tree_util.tree_map(jnp.zeros_like,
                                                    trainable)
                for l in range(L):
                    for k in range(N):
                        paths[p, l, k] = paths[winner, l, k]
                        if rng.random() < prob:
                            paths[p, l, k] = (paths[p, l, k]
                                              + rng.integers(-2, 2)) % M

        new_best_paths = best_paths + [paths[winner]]
        out = {
            "params": io.to_host(best_state["params"]),
            "init_params": state.get("init_params", state["params"]),
            "batch_stats": {},
            "heads": {"kernel": np.asarray(best_state["heads"]["kernel"]),
                      "bias": np.asarray(best_state["heads"]["bias"]),
                      "class_counts": class_counts},
            "meta": {"pathnet": True, "task": t, "N": N},
            "method_aux": {"best_paths": new_best_paths},
        }
        io.save(out, os.path.join(exp_dir, BEST_MODEL_FILENAME))
        return out, best_overall

    # ---- framework hooks -------------------------------------------------------
    def grid_train(self, args, manager, lr):
        manager.extras["lr"] = lr
        exp_dir = manager.extras["gridsearch_exp_dir"]
        seed = manager.extras.get("grid_seed", 0)
        gens = 1  # Phase-1: single fixed path, full epochs
        return self._evolve(args, manager, int(self.hyperparams["N"]),
                            gens, args.num_epochs, exp_dir, seed,
                            n_candidates=1)

    def train(self, args, manager, hyperparams):
        gens = int(self.static_hyperparams["generations"])
        nepochs_per_gen = max(args.num_epochs // gens, 1)
        return self._evolve(args, manager, int(hyperparams["N"]), gens,
                            nepochs_per_gen,
                            manager.extras["heuristic_exp_dir"], args.seed)

    def inference_eval(self, manager, model_path, ref_task, trained_idx):
        from clsurvey_tpu.framework.evaluate import _eval_split

        model = io.load(model_path) if isinstance(model_path, str) \
            else model_path
        aux = model.get("method_aux") or {}
        path = np.asarray(aux["best_paths"][ref_task - 1])
        N = path.shape[-1]
        td = manager.dataset.get_task_dataset(ref_task)
        class_counts = np.asarray(model["heads"]["class_counts"])
        # cache compiled eval fns per (ref task, N) like the other methods
        # do — the (task x model) matrix revisits each ref task repeatedly
        cache_key = ("pathnet_eval_fns", ref_task, int(N))
        fns = manager.extras.get(cache_key)
        if fns is None:
            module = self._module(manager, N)
            fns = self._make_fns(module, manager.dataset.mean,
                                 manager.dataset.std, class_counts,
                                 ref_task - 1)
            manager.extras[cache_key] = fns
        _, eval_acc = fns
        trainable = jax.tree_util.tree_map(jnp.asarray, {
            "params": model["params"],
            "heads": {"kernel": model["heads"]["kernel"],
                      "bias": model["heads"]["bias"]}})
        split = _eval_split(manager, td)  # honors --test_set
        return float(eval_acc(trainable, jnp.asarray(split.images),
                              jnp.asarray(split.labels),
                              jnp.asarray(path),
                              batch_size=manager.args.batch_size))

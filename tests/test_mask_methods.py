"""PackNet + HAT tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clsurvey_tpu.ops import masks as masks_lib


def _fake_params(key):
    k1, k2 = jax.random.split(key)
    return {
        "conv_0": {"kernel": jax.random.normal(k1, (3, 3, 3, 8)),
                   "bias": jnp.zeros(8)},
        "fc_0": {"kernel": jax.random.normal(k2, (32, 16)),
                 "bias": jnp.zeros(16)},
    }


def test_packnet_mask_lifecycle():
    params = _fake_params(jax.random.PRNGKey(0))
    masks = masks_lib.init_masks(params, owner=0)
    # biases get the 0-d sentinel
    assert masks["conv_0"]["bias"].ndim == 0
    masks = masks_lib.claim_free(masks, 1)
    assert np.all(np.asarray(masks["conv_0"]["kernel"]) == 1)

    # prune 50% of task-1 weights
    new_params, new_masks = masks_lib.prune_masks(params, masks, 1, 0.5)
    km = np.asarray(new_masks["conv_0"]["kernel"])
    kw = np.asarray(new_params["conv_0"]["kernel"])
    frac_pruned = (km == 0).mean()
    assert abs(frac_pruned - 0.5) < 0.02
    assert np.all(kw[km == 0] == 0.0)
    # pruned weights were the smallest |w|
    assert np.abs(kw[km == 1]).min() >= 0 and \
        np.abs(np.asarray(params["conv_0"]["kernel"]))[km == 0].max() <= \
        np.abs(np.asarray(params["conv_0"]["kernel"]))[km == 1].min() + 1e-6

    # task 2 claims the freed weights
    masks2 = masks_lib.claim_free(new_masks, 2)
    km2 = np.asarray(masks2["conv_0"]["kernel"])
    assert set(np.unique(km2)) == {1, 2}

    # grads: task 2 training must not touch task-1 weights or biases
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    masked = masks_lib.mask_grads(grads, masks2, 2)
    gm = np.asarray(masked["conv_0"]["kernel"])
    assert np.all(gm[km2 == 1] == 0) and np.all(gm[km2 == 2] == 1)
    assert np.all(np.asarray(masked["conv_0"]["bias"]) == 0)

    # eval mask for task 1: only task-1 weights survive
    eval_params = masks_lib.apply_eval_mask(new_params, masks2, 1)
    ew = np.asarray(eval_params["conv_0"]["kernel"])
    assert np.all(ew[km2 == 2] == 0)
    np.testing.assert_array_equal(ew[km2 == 1], kw[km2 == 1])


COMMON = dict(
    model_name="tiny_CNN_cl_32_32",
    ds_name="synthetic_2t_4c_32px",
    num_epochs=4, batch_size=32, lr_grid=(1e-2,),
    gridsearch_name="testgrid", max_attempts_per_task=2,
)


def test_packnet_sequence(fresh_config):
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from clsurvey_tpu.utils import io, paths as paths_lib

    manager = run_main(RunArgs(method_name="packnet", test=True,
                               hyperparams="0.5", **COMMON))
    best = io.load(manager.previous_task_model_path)
    assert "method_aux" in best and "masks" in best["method_aux"]
    report = masks_lib.capacity_report(
        jax.tree_util.tree_map(jnp.asarray, best["method_aux"]["masks"]), 2)
    assert report[1] > 0 and report[2] > 0  # both tasks own weights
    out_dir = paths_lib.get_test_results_path(
        COMMON["ds_name"], "packnet", COMMON["model_name"], "testgrid",
        manager.exp_name, create=False)
    from tests.helpers import load_seq_forgetting, load_seq_res

    assert len(load_seq_res(out_dir, "packnet", 1)) == 2
    # PackNet guarantees ZERO forgetting: task-1 subnetwork is frozen
    f = load_seq_forgetting(out_dir, "packnet", 1)[0]
    assert abs(f) < 1e-6, f


def test_hat_sequence(fresh_config):
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from clsurvey_tpu.utils import io, paths as paths_lib

    kwargs = dict(COMMON)
    # HAT's task-0 warmup runs 10 epochs; give it room to converge
    kwargs["num_epochs"] = 14
    kwargs["max_attempts_per_task"] = 1
    manager = run_main(RunArgs(method_name="HAT", test=True,
                               hyperparams="100,0.5", **kwargs))
    best = io.load(manager.previous_task_model_path)
    assert best["meta"].get("hat")
    # embeddings exist and are clamped
    for name, leaf in best["params"].items():
        if name.startswith("emb_"):
            assert np.abs(np.asarray(leaf)).max() <= 6.0 + 1e-5
    out_dir = paths_lib.get_test_results_path(
        COMMON["ds_name"], "HAT", COMMON["model_name"], "testgrid",
        manager.exp_name, create=False)
    from tests.helpers import load_seq_res

    seq = load_seq_res(out_dir, "HAT", 1)
    assert len(seq) == 2
    assert seq[0] > 60.0  # HAT must actually learn


def test_hat_mask_back_blocks_prev_capacity():
    """Weights gated ON by task 0 (a^{<1}=1) must receive zero gradient
    when training task 1."""
    from clsurvey_tpu.methods.hat import (
        compute_mask_back, compute_mask_pre, make_hat_model)
    from clsurvey_tpu.models.registry import parse_model_name

    spec = parse_model_name("/tmp/m", "tiny_CNN_cl_16_16", (16, 16))
    model = make_hat_model(spec, n_tasks=2)
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key}, jnp.zeros((1, 16, 16, 3)), 0,
                           jnp.float32(1.0))
    params = variables["params"]
    # make task-0 embeddings strongly positive -> gates ~1 at smax
    params = dict(params)
    for name in list(params):
        if name.startswith("emb_"):
            params[name] = params[name].at[0].set(6.0)
    mask_pre = compute_mask_pre(model, params, task=1, smax=100.0)
    for mp in mask_pre:
        assert float(jnp.min(mp)) > 0.99
    mask_back = compute_mask_back(model, params, mask_pre, (16, 16))
    # all conv/fc weights blocked (mask_back ~ 0), embeddings open (1)
    for name, leaf in mask_back.items():
        if name.startswith("emb_"):
            assert float(jnp.min(leaf)) == 1.0
        else:
            assert float(jnp.max(leaf["kernel"])) < 0.01


def test_hat_gates_start_open():
    """Embeddings init uniform(0,2): every gate >= 0.5 at any s and ~1 at
    smax, so a fresh HAT net trains at full capacity and the sparsity term
    closes gates selectively (ref:vgg_hat.py:75-80). A zero-mean init
    attenuates activations ~0.5^L and stalls training (regression)."""
    from clsurvey_tpu.methods.hat import make_hat_model
    from clsurvey_tpu.models.registry import parse_model_name

    spec = parse_model_name("/tmp/m", "tiny_CNN_cl_16_16", (16, 16))
    model = make_hat_model(spec, n_tasks=3)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 16, 16, 3)), 0, jnp.float32(1.0))
    for s in (0.01, 1.0, 400.0):
        _, masks = model.apply({"params": variables["params"]},
                               jnp.zeros((1, 16, 16, 3)), 0,
                               jnp.float32(s))
        for m in masks:
            assert float(jnp.min(m)) >= 0.5
    # at smax the fresh net is fully open
    assert all(float(jnp.min(m)) > 0.97 for m in masks)


def test_hat_mask_back_unions_multiple_prev_tasks():
    """a^{<t} is the elementwise max over ALL previous tasks' gates
    (ref:src/methods/HAT/approaches/hat.py:57-89): at task 2 a unit claimed
    by either task 0 or task 1 is blocked, and the conv/fc weight views
    block exactly the claimed-in x claimed-out region
    (ref:src/methods/HAT/networks/vgg_hat.py:258-295)."""
    from clsurvey_tpu.methods.hat import (
        compute_mask_back, compute_mask_pre, make_hat_model)
    from clsurvey_tpu.models.registry import parse_model_name

    spec = parse_model_name("/tmp/m", "tiny_CNN_cl_16_16", (16, 16))
    model = make_hat_model(spec, n_tasks=3)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 16, 16, 3)), 0, jnp.float32(1.0))

    def claim(params, t0_half, t1_half):
        """Task 0 claims one half of every layer's units, task 1 the
        other (or the same) half; task 2 left untouched."""
        params = dict(params)
        for name in list(params):
            if not name.startswith("emb_"):
                continue
            e = params[name]
            n = e.shape[-1]
            sl0 = slice(0, n // 2) if t0_half == 0 else slice(n // 2, n)
            sl1 = slice(0, n // 2) if t1_half == 0 else slice(n // 2, n)
            e = e.at[0].set(-6.0).at[0, sl0].set(6.0)
            e = e.at[1].set(-6.0).at[1, sl1].set(6.0)
            params[name] = e
        return params

    # disjoint halves: the union covers every unit -> everything blocked,
    # even though each single previous task leaves half the net free
    params = claim(variables["params"], 0, 1)
    pre_t0_only = compute_mask_pre(model, params, task=1, smax=100.0)
    assert all(float(jnp.min(mp)) < 0.01 for mp in pre_t0_only)
    mask_pre = compute_mask_pre(model, params, task=2, smax=100.0)
    for mp in mask_pre:
        assert float(jnp.min(mp)) > 0.99
    mask_back = compute_mask_back(model, params, mask_pre, (16, 16))
    for name, leaf in mask_back.items():
        if not name.startswith("emb_"):
            assert float(jnp.max(leaf["kernel"])) < 0.01

    # overlapping halves: both tasks claim the first half -> only
    # first-half-in x first-half-out weights are blocked
    params = claim(variables["params"], 0, 0)
    mask_pre = compute_mask_pre(model, params, task=2, smax=100.0)
    mask_back = compute_mask_back(model, params, mask_pre, (16, 16))
    convs = sorted(n for n in mask_back if n.startswith("conv_")
                   and int(n.split("_")[1]) > 0)
    assert convs, "need a conv layer with a predecessor"
    k = mask_back[convs[0]]["kernel"]  # (h, w, in, out)
    n_in, n_out = k.shape[2], k.shape[3]
    blocked = k[:, :, : n_in // 2, : n_out // 2]
    free_out = k[:, :, :, n_out // 2:]  # unclaimed outputs: trainable
    free_in = k[:, :, n_in // 2:, : n_out // 2]  # unclaimed inputs
    assert float(jnp.max(blocked)) < 0.01
    assert float(jnp.min(free_out)) > 0.99
    assert float(jnp.min(free_in)) > 0.99


ALEX_COMMON = dict(
    model_name="alexnet",
    ds_name="synthetic_2t_4c_64px",
    num_epochs=3, batch_size=32, lr_grid=(1e-3,),
    gridsearch_name="testgrid", max_attempts_per_task=1,
)


def test_hat_alexnet_sequence(fresh_config):
    """HAT on the AlexNet backbone end-to-end (the iNaturalist/RecogSeq
    protocol arch, ref:src/methods/HAT/networks/alexnet_hat.py)."""
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from clsurvey_tpu.utils import io, paths as paths_lib

    manager = run_main(RunArgs(method_name="HAT", test=True,
                               hyperparams="50,0.5", **ALEX_COMMON))
    best = io.load(manager.previous_task_model_path)
    assert best["meta"].get("hat")
    # AlexNet HAT params: 5 gated convs + 2 gated fcs
    emb_names = {n for n in best["params"] if n.startswith("emb_")}
    assert emb_names == {f"emb_conv_{i}" for i in range(5)} | {
        "emb_fc_0", "emb_fc_1"}, emb_names
    out_dir = paths_lib.get_test_results_path(
        ALEX_COMMON["ds_name"], "HAT", "alexnet", "testgrid",
        manager.exp_name, create=False)
    from tests.helpers import load_seq_res

    assert len(load_seq_res(out_dir, "HAT", 1)) == 2


def test_pathnet_alexnet_sequence(fresh_config):
    """PathNet's standalone AlexNet-budget net end-to-end
    (ref:src/methods/HAT/networks/alexnet_pathnet.py)."""
    from clsurvey_tpu.framework.common import RunArgs
    from clsurvey_tpu.framework.main import main as run_main
    from clsurvey_tpu.utils import io, paths as paths_lib

    kwargs = dict(ALEX_COMMON)
    # 32px keeps the CPU cost down; the net derives its kernel sizes from
    # the input size (ref:alexnet_pathnet.py kernel_size=size//8, size//10)
    kwargs["ds_name"] = "synthetic_2t_4c_32px"
    kwargs["num_epochs"] = 2
    manager = run_main(RunArgs(method_name="pathnet", test=True,
                               hyperparams="2", static_hyperparams="4,2",
                               **kwargs))
    best = io.load(manager.previous_task_model_path)
    assert best["meta"].get("pathnet")
    aux = best["method_aux"]
    assert len(aux["best_paths"]) == 2  # one winning path per task
    assert np.asarray(aux["best_paths"][0]).shape == (5, 2)  # L=5, N=2
    out_dir = paths_lib.get_test_results_path(
        kwargs["ds_name"], "pathnet", "alexnet", "testgrid",
        manager.exp_name, create=False)
    from tests.helpers import load_seq_res

    assert len(load_seq_res(out_dir, "pathnet", 1)) == 2


def test_pathnet_module_sum_is_post_activation():
    """The concatenated-channels trick must equal the reference's
    per-module sum: sum_j maxpool(relu(conv_j(x)))
    (ref:vgg_pathnet.py forward)."""
    from clsurvey_tpu.methods.pathnet import PathNetVGG

    model = PathNetVGG(cfg_name="tiny_CNN", classifier_dims=(16, 16),
                       M=4, N=2)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, (2, 32, 32, 3)).astype(np.float32))
    path = jnp.asarray([[0, 2]] * model.n_layers, jnp.int32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, path)
    out = model.apply(v, x, path)

    # manual per-module forward of the first conv layer
    p = v["params"]
    k, b = p["conv_0_kernel"], p["conv_0_bias"]

    def one_module(m):
        h = jax.lax.conv_general_dilated(
            x, k[m], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h + b[m])
        import flax.linen as fnn
        return fnn.max_pool(h, (2, 2), strides=(2, 2))

    expected_l0 = one_module(0) + one_module(2)

    # recompute via a 1-layer probe: run the model's first layer only by
    # zeroing everything else is complex; instead check a single conv layer
    # model end-to-end
    single = PathNetVGG(cfg_name="tiny_CNN", classifier_dims=(16,),
                        M=4, N=2)
    # reuse conv_0 params, fresh fc
    path1 = jnp.asarray([[0, 2]] * single.n_layers, jnp.int32)
    v1 = single.init({"params": jax.random.PRNGKey(0)}, x, path1)
    params1 = dict(v1["params"])
    params1["conv_0_kernel"], params1["conv_0_bias"] = k, b
    # the second tiny_CNN conv consumes layer-0 output; verify layer-0 by
    # comparing the model's intermediate via linearity is overkill — assert
    # the direct helper instead
    from clsurvey_tpu.methods.pathnet import _module_conv
    got_l0 = _module_conv(x, k, b, jnp.asarray([0, 2]), k.shape[-1],
                          jnp.float32, strides=(1, 1), padding="SAME",
                          pool=(2, 2))
    np.testing.assert_allclose(np.asarray(got_l0),
                               np.asarray(expected_l0), rtol=1e-5,
                               atol=1e-5)
    assert np.isfinite(np.asarray(out)).all()


def test_hat_containment_preserves_warmup_exit_and_ckpt(tmp_path):
    """A contained (diverged) epoch must still run the warmup-exit block
    and the periodic checkpoint, and the warmup-exit lr reset must not
    undo the containment cut (regression for the early `continue`)."""
    import types

    from clsurvey_tpu.methods.hat import hat_train_task
    from clsurvey_tpu.utils import io
    from clsurvey_tpu.utils.paths import EPOCH_CKPT_FILENAME

    losses = [1.0, 0.9, float("nan"), 0.8, 0.8, 0.8]
    vals = [0.5, 0.6, 0.0, 0.55, 0.55, 0.55]
    calls = {"e": 0}

    class StubEngine:
        smax = 400.0

        def _train_epoch(self, state, images, labels, perm, key, lr,
                         lamb, bsz):
            e = calls["e"]
            return state, {"loss": jnp.float32(losses[e])}

        def evaluate(self, params, images, labels, bsz):
            v = vals[calls["e"]]
            calls["e"] += 1
            return v

    data = np.zeros((8, 4, 4, 3), np.uint8)
    labels = np.zeros(8, np.int32)
    td = types.SimpleNamespace(
        train=types.SimpleNamespace(images=data, labels=labels),
        val=types.SimpleNamespace(images=data, labels=labels))
    trainable = {"w": jnp.ones(3)}

    hat_train_task(StubEngine(), str(tmp_path), trainable, td,
                   nepochs=6, batch_size=4, lr=1.0, lamb=0.1,
                   warmup=True, warmup_lr=0.01, warmup_epochs=2,
                   save_models=True)

    ck = io.load(str(tmp_path / EPOCH_CKPT_FILENAME))
    assert ck["epoch"] == 5
    # warmup exited ON the contained epoch (e=2), not a step later
    assert ck["warmup"] is False
    # the containment lr cut (0.01/3) survived the warmup-exit reset
    assert ck["lr"] == pytest.approx(0.01 / 3.0)

"""Numerical parity vs a PyTorch transcription of the reference's math.

The reference is PyTorch; torch(cpu) is available here, so we can check our
compiled step against an independently-built torch model with IDENTICAL
weights and inputs:

1. forward logits agree (conv padding/pooling/flatten semantics),
2. one SGD(momentum 0.9) step with the EWC penalty injected pre-momentum
   (the reference's Weight_Regularized_SGD order,
   ref:src/methods/EWC/train_EWC.py:23-86) produces the same update.

This pins the engine's training math to the reference's, independent of our
own JAX code paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from clsurvey_tpu.engine.train import Engine, TrainState, make_context, \
    tree_zeros_like
from clsurvey_tpu.methods.base import UpdateRule
from clsurvey_tpu.methods.reg_based import QuadRegRule
from clsurvey_tpu.models.backbones import VGG_CFG
from clsurvey_tpu.models.registry import init_model_state, parse_model_name

CFG = "tiny_CNN"  # (8,'M',16,'M') + trunk (32,32): small enough for CPU


def _build_torch_model(params, kernel, bias, n_classes):
    """Torch twin of VGGBackbone(tiny_CNN) + one head, weights copied from
    the JAX pytree (HWIO -> OIHW for convs, (in,out) -> (out,in) for FCs)."""
    import torch.nn as nn

    layers = []
    conv_names = []
    # VGGFeatures names convs conv_<cfg_index> (pool entries consume an
    # index too)
    for i, v in enumerate(VGG_CFG[CFG]):
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(3 if not conv_names else prev, int(v),
                                    3, padding=1))
            layers.append(nn.ReLU())
            conv_names.append(f"conv_{i}")
            prev = int(v)
    features = nn.Sequential(*layers)
    trunk = nn.Sequential(nn.Linear(16 * 8 * 8, 32), nn.ReLU(),
                          nn.Linear(32, 32), nn.ReLU())
    head = nn.Linear(32, n_classes)

    with torch.no_grad():
        conv_idx = 0
        for mod in features:
            if isinstance(mod, nn.Conv2d):
                name = conv_names[conv_idx]
                w = np.asarray(params["features"][name]["kernel"])
                mod.weight.copy_(torch.tensor(w.transpose(3, 2, 0, 1)))
                mod.bias.copy_(torch.tensor(
                    np.asarray(params["features"][name]["bias"])))
                conv_idx += 1
        for j, mod in enumerate([trunk[0], trunk[2]]):
            w = np.asarray(params["trunk"][f"fc_{j}"]["kernel"])
            mod.weight.copy_(torch.tensor(w.T))
            mod.bias.copy_(torch.tensor(
                np.asarray(params["trunk"][f"fc_{j}"]["bias"])))
        head.weight.copy_(torch.tensor(np.asarray(kernel).T))
        head.bias.copy_(torch.tensor(np.asarray(bias)))
    return features, trunk, head


def _torch_forward(features, trunk, head, x_nhwc):
    x = torch.tensor(np.asarray(x_nhwc).transpose(0, 3, 1, 2))
    f = features(x)
    # NHWC flatten order (channel-fastest) to match the JAX reshape
    f = f.permute(0, 2, 3, 1).reshape(f.shape[0], -1)
    return head(trunk(f))


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("models")
    spec = parse_model_name(str(root), "tiny_CNN_cl_32_32", (32, 32))
    sd = init_model_state(spec, jax.random.PRNGKey(3), max_tasks=1,
                          classes_per_task=4)
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (8, 32, 32, 3)).astype(np.float32)
    y = rng.integers(0, 4, (8,)).astype(np.int64)
    return spec, sd, x, y


def test_forward_parity(setup):
    spec, sd, x, y = setup
    backbone = spec.make_backbone()
    feats = backbone.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, sd["params"])},
        jnp.asarray(x), train=False)
    logits_jax = np.asarray(
        feats @ jnp.asarray(sd["heads"]["kernel"][0])
        + jnp.asarray(sd["heads"]["bias"][0]))
    features, trunk, head = _build_torch_model(
        sd["params"], sd["heads"]["kernel"][0], sd["heads"]["bias"][0], 4)
    with torch.no_grad():
        logits_torch = _torch_forward(features, trunk, head,
                                      x).numpy()
    np.testing.assert_allclose(logits_jax, logits_torch, rtol=1e-4,
                               atol=1e-5)


def test_sgd_ewc_step_parity(setup):
    """One regularized SGD step: ours vs torch with the reference's update
    order (reg grads -> momentum buf -> theta -= lr*buf)."""
    spec, sd, x, y = setup
    lam, lr, mom = 3.0, 0.05, 0.9

    # --- our engine step (bypassing preprocess: feed raw floats) ----------
    rule = QuadRegRule()
    ctx = make_context(spec, task=0, n_tasks=1, class_counts=[4],
                       mean=(0, 0, 0), std=(1 / 255.0,) * 3,  # identity-ish
                       update_rule=rule, augment=False, mesh=None)
    # identity preprocessing: normalize(x*255 scaled back) == x
    x_u8_like = jnp.asarray(x)  # preprocess: x*(1/(255*std)) - mean/std = x
    trainable = jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True),
        {"params": sd["params"],
         "heads": {"kernel": sd["heads"]["kernel"],
                   "bias": sd["heads"]["bias"]}})
    theta_star = jax.tree_util.tree_map(
        lambda p: p * 0.9, trainable["params"])  # displaced anchor
    omega = jax.tree_util.tree_map(
        lambda p: jnp.abs(p) + 0.1, trainable["params"])
    mstate = rule.init_state(trainable, {"lambda": lam}, ctx,
                             omega=omega, theta_star=theta_star)
    engine = Engine(ctx)
    state = TrainState(trainable, {}, tree_zeros_like(trainable), mstate)
    new_state, _ = engine._train_step(
        state, x_u8_like, jnp.asarray(y.astype(np.int32)),
        jax.random.PRNGKey(0), jnp.float32(lr))

    # --- torch step --------------------------------------------------------
    features, trunk, head = _build_torch_model(
        sd["params"], sd["heads"]["kernel"][0], sd["heads"]["bias"][0], 4)
    logits = _torch_forward(features, trunk, head, x)
    loss = torch.nn.functional.cross_entropy(logits,
                                             torch.tensor(y))
    loss.backward()

    # map torch modules back to pytree paths for omega/theta_star lookup
    def np_of(t):
        return t.detach().numpy()

    import torch.nn as nn

    pairs = []  # (torch_param, omega_np, star_np, transpose_spec)
    conv_cfg_names = [f"conv_{i}" for i, v in enumerate(VGG_CFG[CFG])
                      if v != "M"]
    conv_idx = 0
    for mod in features:
        if isinstance(mod, nn.Conv2d):
            name = conv_cfg_names[conv_idx]
            pairs.append((mod.weight,
                          np.asarray(omega["features"][name]["kernel"]),
                          np.asarray(theta_star["features"][name]["kernel"]),
                          "conv"))
            pairs.append((mod.bias,
                          np.asarray(omega["features"][name]["bias"]),
                          np.asarray(theta_star["features"][name]["bias"]),
                          None))
            conv_idx += 1
    for j, mod in enumerate([trunk[0], trunk[2]]):
        name = f"fc_{j}"
        pairs.append((mod.weight, np.asarray(omega["trunk"][name]["kernel"]),
                      np.asarray(theta_star["trunk"][name]["kernel"]), "fc"))
        pairs.append((mod.bias, np.asarray(omega["trunk"][name]["bias"]),
                      np.asarray(theta_star["trunk"][name]["bias"]), None))

    with torch.no_grad():
        for p, om, star, tspec in pairs:
            if tspec == "conv":
                om = om.transpose(3, 2, 0, 1)
                star = star.transpose(3, 2, 0, 1)
            elif tspec == "fc":
                om, star = om.T, star.T
            d_p = p.grad + 2 * lam * torch.tensor(om) * (
                p - torch.tensor(star))
            # first step: momentum buffer = d_p
            p -= lr * d_p
        # head: no penalty (heads excluded from reg), plain SGD
        for p in (head.weight, head.bias):
            p -= lr * p.grad

    # --- compare -----------------------------------------------------------
    new_p = new_state.trainable["params"]
    conv_idx = 0
    for mod in features:
        if isinstance(mod, nn.Conv2d):
            name = conv_cfg_names[conv_idx]
            ours = np.asarray(new_p["features"][name]["kernel"])
            theirs = np_of(mod.weight).transpose(2, 3, 1, 0)
            np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)
            conv_idx += 1
    for j, mod in enumerate([trunk[0], trunk[2]]):
        ours = np.asarray(new_p["trunk"][f"fc_{j}"]["kernel"])
        np.testing.assert_allclose(ours, np_of(mod.weight).T, rtol=1e-4,
                                   atol=1e-6)
    ours_head = np.asarray(new_state.trainable["heads"]["kernel"][0])
    np.testing.assert_allclose(ours_head, np_of(head.weight).T, rtol=1e-4,
                               atol=1e-6)


def test_alexnet_converter_parity(tmp_path):
    """The torchvision->npz converter preserves the forward function: a
    torch AlexNet (torchvision layout, random weights) and our flax
    AlexNetBackbone loaded from the converted npz produce the same
    features (ref:src/models/net.py:101-106 pretrained AlexNet)."""
    import sys

    import torch.nn as nn

    sys.path.insert(0, "scripts")
    from dump_torchvision_alexnet import convert_state_dict

    from clsurvey_tpu.models.registry import (
        init_model_state, load_pretrained, parse_model_name)

    # torchvision AlexNet twin (same Sequential indices as its state_dict)
    torch_model = nn.Sequential()
    features = nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
        nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(3, 2))
    classifier = nn.Sequential(
        nn.Dropout(), nn.Linear(256 * 6 * 6, 4096), nn.ReLU(),
        nn.Dropout(), nn.Linear(4096, 4096), nn.ReLU(),
        nn.Linear(4096, 1000))
    torch_model.add_module("features", features)
    torch_model.add_module("classifier", classifier)
    torch_model.eval()

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    flat = convert_state_dict(sd)
    assert "fc_0/kernel" in flat and "conv_4/bias" in flat
    np.savez(str(tmp_path / "alexnet_imagenet.npz"), **flat)

    spec = parse_model_name(str(tmp_path), "alexnet_pretrained", (224, 224))
    assert spec.pretrained
    state = init_model_state(spec, jax.random.PRNGKey(0), max_tasks=2,
                             classes_per_task=4)

    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        t_in = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t_feats = classifier[:6](
            torch.flatten(features(t_in), 1)).numpy()
    backbone = spec.make_backbone()
    j_feats = np.asarray(backbone.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, state["params"])},
        jnp.asarray(x), train=False))
    np.testing.assert_allclose(j_feats, t_feats, rtol=1e-3, atol=1e-4)


def test_icarl_distill_matches_torch_batchmean():
    """icarl_distill == torch KLDivLoss(reduction='batchmean') on
    T-softened log/softmax pairs (ref:icarl.py:64,578-582)."""
    from clsurvey_tpu.ops.distill import icarl_distill

    rng = np.random.default_rng(0)
    s = rng.normal(0, 2, (8, 20)).astype(np.float32)
    t = rng.normal(0, 2, (8, 20)).astype(np.float32)
    T = 2.0
    with torch.no_grad():
        kl = torch.nn.KLDivLoss(reduction="batchmean")
        lsm = torch.nn.LogSoftmax(dim=1)
        sm = torch.nn.Softmax(dim=1)
        expected = float(kl(lsm(torch.from_numpy(s) / T),
                            sm(torch.from_numpy(t) / T)) * (T ** 2))
    got = float(icarl_distill(jnp.asarray(s), jnp.asarray(t), T))
    np.testing.assert_allclose(got, expected, rtol=1e-5)

    # masked-region variant: NEG_INF outside a 5-class region must equal
    # torch on the sliced region (the reference slices, we mask)
    NEG_INF = -1e10
    mask = np.full((8, 20), NEG_INF, np.float32)
    mask[:, 5:10] = 0.0
    with torch.no_grad():
        expected_sl = float(kl(lsm(torch.from_numpy(s[:, 5:10]) / T),
                               sm(torch.from_numpy(t[:, 5:10]) / T))
                            * (T ** 2))
    got_masked = float(icarl_distill(jnp.asarray(s + mask),
                                     jnp.asarray(t + mask), T))
    np.testing.assert_allclose(got_masked, expected_sl, rtol=1e-5)

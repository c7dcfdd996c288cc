"""EWC Fisher estimator parity vs a torch transcription of the reference.

The update STEP is pinned by tests/test_torch_parity.py; this pins the
importance ESTIMATOR: the reference accumulates, per batch, the squared
gradient of the sum-reduced NLL divided by the dataset length
(ref:src/methods/EWC/main_EWC.py:138-157). Our `ops.importance.ewc_fisher`
must produce the same omega on identical weights, data, and batching —
ruling the estimator out as a source of cross-framework EWC divergence
(the r4 shared-init h2h saw different lambda-collapse boundaries).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from clsurvey_tpu.engine.train import make_context
from clsurvey_tpu.methods.base import UpdateRule
from clsurvey_tpu.models.registry import init_model_state, parse_model_name
from clsurvey_tpu.ops import importance as imp_lib
from tests.test_torch_parity import _build_torch_model, _torch_forward


def test_ewc_fisher_matches_torch_reference(tmp_path):
    spec = parse_model_name(str(tmp_path), "tiny_CNN_cl_32_32", (32, 32))
    sd = init_model_state(spec, jax.random.PRNGKey(5), max_tasks=1,
                          classes_per_task=4)
    rng = np.random.default_rng(1)
    images_u8 = rng.integers(0, 256, (32, 32, 32, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, (32,)).astype(np.int32)
    bs = 8

    # identity-ish preprocessing (mean 0, std 1/255): normalize(u8) == u8
    ctx = make_context(spec, task=0, n_tasks=1, class_counts=[4],
                       mean=(0.0, 0.0, 0.0), std=(1 / 255.0,) * 3,
                       update_rule=UpdateRule(), augment=False, mesh=None)
    params = jax.tree_util.tree_map(jnp.asarray, sd["params"])
    bank = {"kernel": jnp.asarray(sd["heads"]["kernel"]),
            "bias": jnp.asarray(sd["heads"]["bias"]),
            "class_counts": np.asarray([4])}
    omega = imp_lib.ewc_fisher(ctx, params, {}, bank, 0,
                               jnp.asarray(images_u8),
                               jnp.asarray(labels), batch_size=bs)

    # torch transcription of diag_fisher
    features, trunk, head = _build_torch_model(
        sd["params"], sd["heads"]["kernel"][0], sd["heads"]["bias"][0], 4)
    t_params = [p for p in list(features.parameters())
                + list(trunk.parameters()) + list(head.parameters())]
    t_omega = [torch.zeros_like(p) for p in t_params]
    n = len(labels)
    x_f = images_u8.astype(np.float32)
    for i in range(0, n, bs):
        for p in t_params:
            p.grad = None
        logits = _torch_forward(features, trunk, head, x_f[i:i + bs])
        loss = torch.nn.functional.nll_loss(
            torch.nn.functional.log_softmax(logits, dim=1),
            torch.tensor(labels[i:i + bs].astype(np.int64)),
            reduction="sum")
        loss.backward()
        for p, om in zip(t_params, t_omega):
            om += p.grad.data ** 2 / n

    # map torch omegas back onto the pytree layout and compare
    from clsurvey_tpu.models.backbones import VGG_CFG
    conv_names = [f"conv_{i}" for i, v in enumerate(VGG_CFG["tiny_CNN"])
                  if v != "M"]
    it = iter(t_omega)

    def nxt():
        return next(it).numpy()

    for name in conv_names:
        np.testing.assert_allclose(
            np.asarray(omega["features"][name]["kernel"]),
            nxt().transpose(2, 3, 1, 0), rtol=2e-3, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(omega["features"][name]["bias"]), nxt(),
            rtol=2e-3, atol=1e-7)
    for j in range(2):
        np.testing.assert_allclose(
            np.asarray(omega["trunk"][f"fc_{j}"]["kernel"]),
            nxt().T, rtol=2e-3, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(omega["trunk"][f"fc_{j}"]["bias"]), nxt(),
            rtol=2e-3, atol=1e-7)

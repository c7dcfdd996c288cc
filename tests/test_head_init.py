"""Head-bank init schemes (models/heads.py CLSURVEY_HEAD_INIT).

The reference replaces each task's head with a *default* ``nn.Linear``
(kaiming_uniform(a=√5) weights = U(±√(1/fan_in)), bias U(±1/√fan_in) —
ref:src/utilities/utils.py:68-71, ref:src/methods/Finetune/
main_SGD.py:59-63). ``torch_default`` must reproduce that distribution;
``legacy`` (the r1-r3 scheme) must stay bit-stable for artifact
continuity.
"""

import jax
import numpy as np

from clsurvey_tpu.models import heads


FEAT, CLASSES, TASKS = 128, 4, 3


def _bank(scheme):
    return heads.init_head_bank(jax.random.PRNGKey(0), TASKS, FEAT,
                                CLASSES, scheme=scheme)


def test_default_scheme_is_legacy():
    assert heads.HEAD_INIT_SCHEME == "legacy"
    a = _bank(None)
    b = _bank("legacy")
    np.testing.assert_array_equal(a["kernel"], b["kernel"])
    assert not a["bias"].any()


def test_torch_default_matches_nn_linear_distribution():
    bank = _bank("torch_default")
    k = np.asarray(bank["kernel"])
    b = np.asarray(bank["bias"])
    bound = np.sqrt(1.0 / FEAT)
    assert np.abs(k).max() <= bound and np.abs(b).max() <= bound
    # uniform over ±bound: std ≈ bound/√3, far above the legacy 0.01·N
    assert np.isclose(k.std(), bound / np.sqrt(3), rtol=0.15)
    assert b.any()  # legacy zeroes the bias; torch default does not


def test_torch_pinned_bitmatches_reference_draw():
    """torch_pinned:<base> must reproduce BYTE-identically what the
    pinned clone draws (prepare_clone.py h2h_pinned_linear: nn.Linear
    default init from a private Generator(base + task_counter), weight
    then bias — the nn.Linear.reset_parameters call order)."""
    import torch

    base = 1000
    bank = _bank(f"torch_pinned:{base}")
    for task0 in range(TASKS):
        g = torch.Generator().manual_seed(base + task0 + 1)
        bound = 1.0 / np.sqrt(FEAT)
        w = torch.empty(CLASSES, FEAT).uniform_(-bound, bound, generator=g)
        b = torch.empty(CLASSES).uniform_(-bound, bound, generator=g)
        np.testing.assert_array_equal(np.asarray(bank["kernel"][task0]),
                                      w.numpy().T)
        np.testing.assert_array_equal(np.asarray(bank["bias"][task0]),
                                      b.numpy())
    # reinit of a slot restores the same pinned draw (idempotent — the
    # property that keeps both sides aligned across attempt-count
    # divergence)
    out = heads.reinit_head(bank, 1, jax.random.PRNGKey(99),
                            scheme=f"torch_pinned:{base}")
    np.testing.assert_array_equal(out["kernel"][1], bank["kernel"][1])
    # a different base gives a different draw
    other = _bank(f"torch_pinned:{base + 1}")
    assert not np.array_equal(other["kernel"][0], bank["kernel"][0])


def test_reinit_head_touches_one_slot_per_scheme():
    for scheme in ("legacy", "torch_default"):
        bank = _bank(scheme)
        out = heads.reinit_head(bank, 1, jax.random.PRNGKey(7),
                                scheme=scheme)
        np.testing.assert_array_equal(out["kernel"][0], bank["kernel"][0])
        np.testing.assert_array_equal(out["kernel"][2], bank["kernel"][2])
        assert not np.array_equal(out["kernel"][1], bank["kernel"][1])
        if scheme == "torch_default":
            assert np.asarray(out["bias"][1]).any()
        else:
            assert not np.asarray(out["bias"][1]).any()

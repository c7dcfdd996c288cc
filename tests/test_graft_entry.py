"""Driver-contract guard: __graft_entry__ must keep exporting a jittable
(entry) forward step and an n-device dry run. The driver invokes both
out-of-band; this pins the interface in-suite so a refactor can't break
it silently. entry() is abstractly traced (fast); the full
dryrun_multichip(8) execution is exercised by the driver and mirrored by
the dp-parity tests in test_models_bn_dp."""

import os
import sys

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import __graft_entry__ as graft  # noqa: E402


def test_entry_traces():
    fn, args = graft.entry()
    out = jax.eval_shape(fn, *args)
    # flagship forward: batch logits over the padded head width
    assert out.shape[0] == args[-1].shape[0]
    assert out.ndim == 2


def test_dryrun_multichip_exists():
    assert callable(graft.dryrun_multichip)

"""Inject clsurvey_tpu's initial weight draw into the reference clone.

VERDICT r3 #2: the h2h report blamed cell deltas on unshareable weight
draws. The draw IS shareable in one direction: ours' init-model dump
(models root, `small_VGG9_cl_128_128.pth.tar`, flax pytree) converts
into the clone's init-model pickle (a whole `VGGSlim` nn.Module —
ref:src/models/net.py:15-37 creates it once and every run reloads it).
This script writes a clone models root whose module carries OUR conv +
trunk weights (HWIO->OIHW / (in,out)->(out,in) transposes, the
test_torch_parity.py mapping), so a `run_ref.py --runs <fresh>` leg
trains the reference from the SAME backbone init as ours' seed-7 legs.

What stays unshared: the per-task classifier head. The reference
re-draws it at every task training with torch's *default* nn.Linear
init (kaiming_uniform(a=sqrt(5)) + uniform bias,
ref:src/utilities/utils.py:68-71) from global RNG state we cannot
reproduce in JAX's explicit-key model. The backbone + trunk is 334k of
the 351k shared parameters (95%); the head draw distribution now
matches on both sides (methods/..heads.py torch-default init).

Run:
    python scripts/h2h/share_init.py \
        --runs clsurvey_runs/refclone/runs_sharedinit
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

OURS_INIT = os.path.join(
    REPO, "clsurvey_runs", "h2h_ours", "models",
    "customVGG_input=32x32", "small_VGG9_cl_128_128.pth.tar")
CLONE = os.path.join(REPO, "clsurvey_runs", "refclone")


def _create_ours_init(path: str, ds_name: str = "synthetic_3t_4c_32px_80n",
                      seed: int = 7):
    """Self-heal the ours-side h2h init model (the runtime models root
    dies with the VM; the draw is deterministic in (model, seed) — same
    PRNGKey(seed) split as framework/main.py's create_init_model, so a
    recreated file is bit-identical to what any h2h ours leg creates)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from clsurvey_tpu.data import registry as data_registry
    from clsurvey_tpu.models import registry as models_registry

    models_root = os.path.dirname(os.path.dirname(path))
    dataset = data_registry.parse(ds_name)
    spec = models_registry.parse_model_name(
        models_root, "small_VGG9_cl_128_128",
        input_size=dataset.input_size)
    max_tasks = dataset.task_count
    models_registry.create_init_model(
        spec, jax.random.PRNGKey(seed), max_tasks=max_tasks,
        classes_per_task=dataset.max_classes_per_task,
        class_counts=dataset.class_count_list())


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours_init", default=OURS_INIT)
    ap.add_argument("--clone", default=CLONE)
    ap.add_argument("--runs", required=True,
                    help="fresh clone runs root to write the shared-init "
                         "model into (pass the same path to run_ref.py "
                         "--runs)")
    a = ap.parse_args(argv)

    sys.path.insert(0, os.path.join(a.clone, "shims"))
    sys.path.insert(0, os.path.join(a.clone, "src"))

    import numpy as np
    import torch

    from clsurvey_tpu.utils import io

    if not os.path.exists(a.ours_init):
        _create_ours_init(a.ours_init)
    ours = io.load(a.ours_init)
    params = ours["params"]

    # load the clone's existing init module (keeps VGGSlim class wiring)
    src_pickle = os.path.join(
        a.clone, "runs", "models", "customVGG_input=32x32",
        "small_VGG9_cl_128_128.pth.tar")
    module = torch.load(src_pickle, weights_only=False, map_location="cpu")

    convs = [m for m in module.features if isinstance(m, torch.nn.Conv2d)]
    ours_convs = sorted(params["features"].items(),
                        key=lambda kv: int(kv[0].split("_")[1]))
    assert len(convs) == len(ours_convs), (len(convs), len(ours_convs))
    with torch.no_grad():
        for tmod, (name, leaf) in zip(convs, ours_convs):
            w = np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1)
            assert tuple(tmod.weight.shape) == w.shape, (name, w.shape)
            tmod.weight.copy_(torch.tensor(w))
            tmod.bias.copy_(torch.tensor(np.asarray(leaf["bias"])))
        fcs = [m for m in module.classifier
               if isinstance(m, torch.nn.Linear)]
        # trunk fc_0/fc_1 -> classifier.0/.2; classifier.4 (the init-time
        # head) is dead weight — every task training replaces it.
        # fc_0 consumes the flattened conv features: ours flattens NHWC
        # (channel-fastest), torch flattens NCHW — permute its input dim
        # so the two inits are FUNCTIONALLY identical, not just same-draw
        # (the test_torch_parity.py forward permutes activations instead).
        c_last = np.asarray(ours_convs[-1][1]["bias"]).shape[0]
        for j, tmod in enumerate(fcs[:2]):
            w = np.asarray(params["trunk"][f"fc_{j}"]["kernel"])
            if j == 0:
                hw = int(round((w.shape[0] / c_last) ** 0.5))
                assert hw * hw * c_last == w.shape[0], (w.shape, c_last)
                w = w.reshape(hw, hw, c_last, w.shape[1]) \
                     .transpose(2, 0, 1, 3).reshape(w.shape[0], w.shape[1])
            w = w.T
            assert tuple(tmod.weight.shape) == w.shape
            tmod.weight.copy_(torch.tensor(w))
            tmod.bias.copy_(torch.tensor(
                np.asarray(params["trunk"][f"fc_{j}"]["bias"])))

    out_dir = os.path.join(a.runs, "models", "customVGG_input=32x32")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "small_VGG9_cl_128_128.pth.tar")
    torch.save(module, out)
    print("wrote shared-init clone model:", out)


if __name__ == "__main__":
    main()

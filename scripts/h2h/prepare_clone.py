"""Build the CPU-patched scratch clone of /root/reference for the
behavioral head-to-head (VERDICT r2 #2).

The reference mount is read-only and must not be modified; this script
copies ``src/`` into ``clsurvey_runs/refclone/``, applies MECHANICAL
CPU patches (documented below — no behavioral edits beyond device
placement and loader worker counts), installs the torchvision/quadprog/
torchnet shims from scripts/h2h/shims, and drops ``data/h2h.py`` (the
shared-dataset module whose pickles both sides consume).

Patches (all regex-mechanical):
- ``.cuda()`` / ``.cuda(non_blocking=True)`` stripped (the reference
  hardcodes CUDA, ref:src/framework/inference.py:22).
- ``torch.cuda.memory_*`` telemetry reads -> 0 (CPU build).
- ``num_workers=N`` -> 0 and ``pin_memory=True`` -> False (single-core
  VM; worker forks only add overhead and nondeterministic interleaving).
- ``'cuda': True`` overwrite-dict entries -> False (rehearsal/packnet/
  HAT engines take a cuda flag instead of hardcoding).

Plus ONE targeted behavioral fix (documented in docs/PARITY.md): the
reference's wrap-first-task path (``skip_to_post`` in
ref:src/framework/framework_train.py:226) never sets
``manager.best_model_path`` NOR ``args.lr`` — both are only assigned
inside the skipped Phase-2 (``stabilityDecay``,
ref:src/framework/framework_train.py:78) — so GEM/iCaRL task-1
poststep crashes with AttributeError in the pristine source
(h2h-verified, two distinct crashes). The clone inserts the same path
assignment ``stabilityDecay`` would have made plus ``args.lr = 1e-3``
(the rehearsal trainer's own default; the value is unused on this path
— task-1 rehearsal runs postprocess-only, asserted at
ref:src/methods/rehearsal/main_rehearsal.py:170), enabling the GEM
h2h leg; it changes no trained values.

Run: python scripts/h2h/prepare_clone.py [--dest clsurvey_runs/refclone]
"""

from __future__ import annotations

import argparse
import os
import re
import shutil

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
REF_SRC = "/root/reference/src"

PATCHES = [
    (re.compile(r"\.cuda\(non_blocking=True\)"), ""),
    (re.compile(r"\.cuda\(\)"), ""),
    (re.compile(r"torch\.cuda\.memory_allocated\(device=None\)"), "0"),
    (re.compile(r"torch\.cuda\.memory_cached\(device=None\)"), "0"),
    (re.compile(r"torch\.cuda\.max_memory_allocated\(\)"), "0"),
    (re.compile(r"torch\.cuda\.max_memory_cached\(\)"), "0"),
    (re.compile(r"num_workers=\d+"), "num_workers=0"),
    (re.compile(r"pin_memory=True"), "pin_memory=False"),
    (re.compile(r"'cuda': True"), "'cuda': False"),
]


# The wrap-first-task fix (see module docstring): insert the path setup
# stabilityDecay would have made, right after skip_to_post is computed.
WRAP_ANCHOR = ("    skip_to_post = args.wrap_first_task_model and "
               "args.task_counter == 1")
WRAP_FIX = """
    if skip_to_post:  # H2H FIX: upstream never sets these on the wrap path
        manager.heuristic_exp_dir = os.path.join(
            manager.parent_exp_dir, 'task_1', 'TASK_TRAINING')
        os.makedirs(manager.heuristic_exp_dir, exist_ok=True)
        manager.best_model_path = os.path.join(
            manager.heuristic_exp_dir, 'best_model.pth.tar')
        args.lr = 1e-3  # unused: task-1 rehearsal is postprocess-only
"""


def apply_wrap_fix(text: str) -> str:
    if "H2H FIX" in text:
        return text
    lines = text.split("\n")
    for i, line in enumerate(lines):
        if line.startswith(WRAP_ANCHOR):
            lines.insert(i + 1, WRAP_FIX.strip("\n"))
            return "\n".join(lines)
    raise RuntimeError("wrap-fix anchor not found in framework_train.py")


def patch_text(text: str) -> str:
    for rx, repl in PATCHES:
        text = rx.sub(repl, text)
    return text


# --- pinned-head patches (VERDICT r4 #2) ---------------------------------
# Inert unless H2H_PIN_HEADS=<base_seed> is set at run time: every
# replaced task head is then drawn from a private
# torch.Generator(base + task_counter) instead of torch's global RNG —
# the bit-identical-init control for the shared-init EWC study. Ours'
# side replicates the draw in models/heads.py ("torch_pinned:<base>").
# Covered sites: utilities.utils.replace_last_classifier_layer (the
# Finetune/Phase-1 path) and EWC's inline head replacement
# (ref:src/methods/EWC/main_EWC.py:52). Other methods' inline
# replacements (LwF, rehearsal nets) are NOT pinned — the pinned study
# runs finetuning + EWC only.
PIN_HELPER = '''

def h2h_pinned_linear(num_ftrs, out_dim):  # H2H PIN (prepare_clone.py)
    import math as _math
    import os as _os

    import torch as _torch
    lin = nn.Linear(num_ftrs, out_dim)
    base = _os.environ.get("H2H_PIN_HEADS")
    if base:
        task = int(_os.environ.get("H2H_TASK_COUNTER", "1"))
        g = _torch.Generator().manual_seed(int(base) + task)
        bound = 1.0 / _math.sqrt(num_ftrs)
        with _torch.no_grad():
            lin.weight.uniform_(-bound, bound, generator=g)
            lin.bias.uniform_(-bound, bound, generator=g)
    return lin
'''

PIN_EDITS = {
    # (file relpath): [(old_exact, new), ...]
    os.path.join("utilities", "utils.py"): [(
        "    model.classifier._modules[last_layer_index] = "
        "nn.Linear(num_ftrs, out_dim)",
        "    model.classifier._modules[last_layer_index] = "
        "h2h_pinned_linear(num_ftrs, out_dim)",
    )],
    os.path.join("methods", "EWC", "main_EWC.py"): [(
        "        model_ft.classifier._modules[last_layer_index] = "
        "nn.Linear(num_ftrs, len(dset_classes))",
        "        model_ft.classifier._modules[last_layer_index] = "
        "utils.h2h_pinned_linear(num_ftrs, len(dset_classes))",
    )],
    os.path.join("framework", "main.py"): [(
        "        args.task_counter = task_counter",
        "        args.task_counter = task_counter\n"
        "        os.environ['H2H_TASK_COUNTER'] = str(task_counter)"
        "  # H2H PIN",
    )],
}


def apply_pin_patches(src_dst: str) -> None:
    for rel, edits in PIN_EDITS.items():
        path = os.path.join(src_dst, rel)
        with open(path) as f:
            text = f.read()
        if "H2H PIN" in text:
            continue
        for old, new in edits:
            if old not in text:
                raise RuntimeError(f"pin-patch anchor not found in {rel}")
            text = text.replace(old, new)
        if rel.endswith(os.path.join("utilities", "utils.py")):
            text += PIN_HELPER
        with open(path, "w") as f:
            f.write(text)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest",
                    default=os.path.join(REPO, "clsurvey_runs", "refclone"))
    a = ap.parse_args(argv)

    src_dst = os.path.join(a.dest, "src")
    if os.path.exists(src_dst):
        shutil.rmtree(src_dst)
    os.makedirs(a.dest, exist_ok=True)
    shutil.copytree(REF_SRC, src_dst)

    n_patched = 0
    for dirpath, _, fnames in os.walk(src_dst):
        for fname in fnames:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            with open(path) as f:
                text = f.read()
            patched = patch_text(text)
            if fname == "framework_train.py" and "framework" in dirpath:
                patched = apply_wrap_fix(patched)
            if patched != text:
                with open(path, "w") as f:
                    f.write(patched)
                n_patched += 1
    apply_pin_patches(src_dst)

    here = os.path.dirname(os.path.abspath(__file__))
    shims_dst = os.path.join(a.dest, "shims")
    if os.path.exists(shims_dst):
        shutil.rmtree(shims_dst)
    shutil.copytree(os.path.join(here, "shims"), shims_dst)
    shutil.copy(os.path.join(here, "h2h_dataset.py"),
                os.path.join(src_dst, "data", "h2h.py"))

    print(f"clone ready at {a.dest} ({n_patched} files patched)")
    return a.dest


if __name__ == "__main__":
    main()

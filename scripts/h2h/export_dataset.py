"""Export the shared head-to-head task sequences for the reference clone.

Arrays come from clsurvey_tpu's deterministic synthetic generator — the
SAME (ds_name, seed=7) our framework will regenerate bit-identically —
and are pickled as the per-task ``{train, val, test}`` dataset dicts the
reference's task loop consumes (ref:src/data/tinyimgnet_dataprep.py:
154-174, torch.save of the dict).

Run AFTER prepare_clone.py:
    python scripts/h2h/export_dataset.py [--dest clsurvey_runs/refclone]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)

# the two sequences: trivially-separable (machinery diff, deterministic
# convergence) and Bayes-limited hard mode (behavior diff where accuracy
# is information-limited)
SEQUENCES = ("synthetic_3t_4c_32px_80n", "synthetic_3t_4c_32px_80n_hd150")


def _write_split_imagefolder(imgfolder_cls, transforms_mod, root,
                             images_u8, labels, classes):
    """Lossless PNG tree + an ImageFolderTrainVal over it. Real on-disk
    files (not the in-memory H2HSplit) because the reference's rehearsal
    path stores exemplar PATHS and reloads them through ImagePathlist
    (ref:src/methods/rehearsal/model/common.py:57-72) — exactly its
    disk-round-trip behavior. PNG is lossless, so both frameworks still
    consume bit-identical uint8 images."""
    from PIL import Image

    imgs = []
    for c_idx, c in enumerate(classes):
        cdir = os.path.join(root, c)
        os.makedirs(cdir, exist_ok=True)
        for j in np.flatnonzero(np.asarray(labels) == c_idx):
            path = os.path.join(cdir, f"{j:05d}.png")
            if not os.path.exists(path):
                Image.fromarray(images_u8[j]).save(path)
            imgs.append((path, c_idx))
    transform = transforms_mod.Compose([
        transforms_mod.ToTensor(),
        transforms_mod.Normalize([0.485, 0.456, 0.406],
                                 [0.229, 0.224, 0.225]),
    ])
    return imgfolder_cls(root, None, transform=transform,
                         classes=list(classes),
                         class_to_idx={c: i for i, c in enumerate(classes)},
                         imgs=imgs)


def export(dest: str):
    import torch

    from clsurvey_tpu.data.registry import parse

    clone_src = os.path.join(dest, "src")
    sys.path.insert(0, os.path.join(dest, "shims"))
    sys.path.insert(0, clone_src)
    from data.h2h import H2HDataset  # noqa: E402
    from data.imgfolder import ImageFolderTrainVal  # noqa: E402
    from torchvision import transforms  # noqa: E402 (the clone shim)

    out = {}
    for ds_name in SEQUENCES:
        seq = parse(ds_name)
        ds_dir = os.path.join(dest, "datasets", ds_name)
        os.makedirs(ds_dir, exist_ok=True)
        paths = []
        for t in range(1, seq.task_count + 1):
            td = seq.get_task_dataset(t)
            img_root = os.path.join(ds_dir, "imgs", f"task_{t}")
            dsets = {
                split: _write_split_imagefolder(
                    ImageFolderTrainVal, transforms,
                    os.path.join(img_root, split),
                    getattr(td, split).images, getattr(td, split).labels,
                    td.classes)
                for split in ("train", "val", "test")
            }
            path = os.path.join(ds_dir, f"task_{t}.pth.tar")
            torch.save(dsets, path)
            paths.append(path)
            print(f"{ds_name} task {t}: train={len(dsets['train'])} "
                  f"val={len(dsets['val'])} test={len(dsets['test'])}")
        counts = [seq.classes_per_task[str(t)]
                  for t in range(1, seq.task_count + 1)]
        ds = H2HDataset(ds_name, seq.task_count, counts, seq.input_size,
                        paths)
        torch.save(ds, os.path.join(ds_dir, "dataset.pth.tar"))
        out[ds_name] = ds_dir
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dest",
                    default=os.path.join(REPO, "clsurvey_runs", "refclone"))
    a = ap.parse_args(argv)
    export(a.dest)


if __name__ == "__main__":
    main()

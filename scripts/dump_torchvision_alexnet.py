"""Convert torch AlexNet ImageNet weights to the framework's npz format.

The reference loads torchvision's pretrained AlexNet
(ref:src/models/net.py:101-106); iNaturalist and RecogSeq are meaningless
from scratch. This script writes ``<models_root>/alexnet_imagenet.npz`` in
the flat ``{'/'.join(param_path): array}`` layout consumed by
``clsurvey_tpu.models.registry.load_pretrained``.

Sources, in order of preference:
  1. torchvision (if installed and its weight cache / egress is available):
       python scripts/dump_torchvision_alexnet.py --out <models_root>
  2. a local torch checkpoint (state_dict or {'state_dict': ...}):
       python scripts/dump_torchvision_alexnet.py --from alexnet.pth --out <models_root>

Layout conversion torch -> flax (NHWC):
  - conv weights (O,I,H,W) -> (H,W,I,O)
  - linear weights (out,in) -> (in,out)
  - the conv->fc boundary (classifier.1): torch flattens C,H,W
    (channel-major), flax NHWC flattens H,W,C (channel-fastest) — the
    first FC's input axis is permuted accordingly.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

# torch state_dict key -> our flax param name
_CONV_KEYS = {f"features.{i}": f"conv_{j}"
              for j, i in enumerate((0, 3, 6, 8, 10))}
_FC_KEYS = {"classifier.1": "fc_0", "classifier.4": "fc_1"}
ALEX_SMID = 6          # 6x6 feature map at 224px input
ALEX_CHANNELS = 256    # final conv width


def convert_state_dict(sd) -> dict:
    """torch AlexNet ``state_dict`` -> flat ``{name/kernel|bias: np}`` dict.

    Accepts tensors or numpy arrays. The final classification head
    (classifier.6) is intentionally dropped — task heads live in the head
    bank, not the backbone."""
    out = {}
    for tk, name in _CONV_KEYS.items():
        w = np.asarray(sd[f"{tk}.weight"])          # (O, I, H, W)
        out[f"{name}/kernel"] = w.transpose(2, 3, 1, 0)  # (H, W, I, O)
        out[f"{name}/bias"] = np.asarray(sd[f"{tk}.bias"])
    for tk, name in _FC_KEYS.items():
        w = np.asarray(sd[f"{tk}.weight"])          # (out, in)
        if name == "fc_0":
            # torch input index = c*smid*smid + y*smid + x;
            # flax  input index = y*smid*ch + x*ch + c
            o = w.shape[0]
            w = w.reshape(o, ALEX_CHANNELS, ALEX_SMID, ALEX_SMID)
            w = w.transpose(0, 2, 3, 1).reshape(o, -1)
        out[f"{name}/kernel"] = w.T                 # (in, out)
        out[f"{name}/bias"] = np.asarray(sd[f"{tk}.bias"])
    return out


def _load_source(ckpt_path: str | None):
    if ckpt_path:
        import torch

        obj = torch.load(ckpt_path, map_location="cpu")
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
        return {k: v.numpy() for k, v in sd.items()}
    import torchvision.models as tvm

    model = tvm.alexnet(weights=tvm.AlexNet_Weights.IMAGENET1K_V1)
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--from", dest="ckpt", default=None,
                    help="local torch checkpoint instead of torchvision")
    ap.add_argument("--out", required=True,
                    help="models_root_path to write alexnet_imagenet.npz in")
    args = ap.parse_args()
    flat = convert_state_dict(_load_source(args.ckpt))
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "alexnet_imagenet.npz")
    np.savez(path, **flat)
    print(f"wrote {path}: {len(flat)} arrays, "
          f"{sum(a.size for a in flat.values()):,} params")


if __name__ == "__main__":
    main()

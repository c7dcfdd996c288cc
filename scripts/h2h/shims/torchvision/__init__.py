"""Minimal torchvision shim for the reference head-to-head clone.

torchvision is not installed in this environment; the reference imports
it in every method engine (ref:src/methods/*/train_*.py). The CPU-patched
scratch clone only exercises code paths whose torchvision usage is:

- ``datasets.ImageFolder`` as a base class (data/imgfolder.py:86) —
  provided functionally (PIL loader) though the head-to-head feeds
  pre-tensorized datasets that never hit it;
- ``transforms`` Compose/ToTensor/Normalize/RandomHorizontalFlip/Resize
  — functional equivalents;
- ``models.VGG`` as the VGGSlim base class (models/VGGSlim.py:43) and
  ``models.alexnet`` (unused by the VGG9 head-to-head; raises if hit);
- ``get_image_backend()`` — always "PIL".
"""

from . import datasets, models, transforms  # noqa: F401


def get_image_backend():
    return "PIL"


def set_image_backend(backend):  # pragma: no cover - parity stub
    if backend != "PIL":
        raise ValueError("shim supports only the PIL backend")

"""torchvision.datasets.folder shim: module-level helpers some reference
code imports (ref:src/data/imgfolder.py default_loader pattern)."""

from . import IMG_EXTENSIONS, ImageFolder, _pil_loader  # noqa: F401


def pil_loader(path):
    return _pil_loader(path)


def default_loader(path):
    return _pil_loader(path)

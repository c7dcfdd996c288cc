"""torchvision.transforms shim: functional equivalents of the transforms
the reference composes (ref:src/data/tinyimgnet_dataprep.py:168,
methods/*/main_*.py imports). The head-to-head datasets pre-tensorize, so
these mostly exist so imports resolve; ToTensor/Normalize are real."""

import random

import numpy as np
import torch


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x

    def __repr__(self):
        return f"Compose({self.transforms})"


class ToTensor:
    def __call__(self, pic):
        arr = np.asarray(pic, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return torch.from_numpy(arr.transpose(2, 0, 1)).contiguous()


class Normalize:
    def __init__(self, mean, std):
        self.mean = torch.tensor(mean).view(-1, 1, 1)
        self.std = torch.tensor(std).view(-1, 1, 1)

    def __call__(self, t):
        return (t - self.mean) / self.std


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if random.random() < self.p:
            import PIL.Image
            if isinstance(img, PIL.Image.Image):
                return img.transpose(PIL.Image.FLIP_LEFT_RIGHT)
            return torch.flip(img, dims=[-1])
        return img


class Resize:
    def __init__(self, size, interpolation=None):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        return img.resize(self.size[::-1])


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else tuple(size)

    def __call__(self, img):
        w, h = img.size
        th, tw = self.size
        left, top = (w - tw) // 2, (h - th) // 2
        return img.crop((left, top, left + tw, top + th))


class RandomResizedCrop:  # pragma: no cover - import-resolution stub
    def __init__(self, *a, **k):
        raise NotImplementedError("torchvision shim: RandomResizedCrop")


# torchvision<0.8 alias the reference uses (ref:src/methods/EWC/
# main_EWC.py:88); constructed even on the pre-tensorized path
Scale = Resize

"""torchvision.datasets shim: a functional minimal ImageFolder — the base
class of the reference's imgfolder variants (ref:src/data/imgfolder.py:86).
The head-to-head feeds pre-tensorized H2HSplit datasets, so this exists so
subclass definitions import and unrelated code paths keep working."""

import os

import torch.utils.data as data

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp")


def _pil_loader(path):
    from PIL import Image

    with open(path, "rb") as f:
        with Image.open(f) as img:
            return img.convert("RGB")


class ImageFolder(data.Dataset):
    def __init__(self, root, transform=None, target_transform=None,
                 loader=_pil_loader):
        classes = sorted(d for d in os.listdir(root)
                         if os.path.isdir(os.path.join(root, d)))
        class_to_idx = {c: i for i, c in enumerate(classes)}
        samples = []
        for c in classes:
            cdir = os.path.join(root, c)
            for dirpath, _, fnames in sorted(os.walk(cdir)):
                for fname in sorted(fnames):
                    if fname.lower().endswith(IMG_EXTENSIONS):
                        samples.append((os.path.join(dirpath, fname),
                                        class_to_idx[c]))
        self.root = root
        self.classes = classes
        self.class_to_idx = class_to_idx
        self.samples = samples
        self.imgs = samples
        self.transform = transform
        self.target_transform = target_transform
        self.loader = loader

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index):
        path, target = self.samples[index]
        sample = self.loader(path)
        if self.transform is not None:
            sample = self.transform(sample)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return sample, target


from . import folder  # noqa: E402,F401  (after names exist: folder imports them)

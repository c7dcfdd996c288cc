"""Head-to-head dataset module — installed into the reference clone as
``data/h2h.py`` so its pickled dataset objects unpickle there.

The head-to-head feeds BOTH frameworks bit-identical images: arrays come
from clsurvey_tpu's deterministic synthetic generator, exported once by
scripts/h2h/export_dataset.py as (a) these pickled per-task dicts for the
reference clone and (b) nothing for our side — our framework regenerates
the same arrays from the same (ds_name, seed).

H2HSplit pre-tensorizes: __getitem__ returns (normalized float tensor
CHW, int label), exactly ToTensor+Normalize(ImageNet stats) of the uint8
image (ref:src/data/tinyimgnet_dataprep.py:168), the same normalization
clsurvey_tpu applies on device (clsurvey_tpu/data/registry.py mean/std).
"""

from collections import OrderedDict

import numpy as np
import torch
import torch.utils.data

_MEAN = np.array([0.485, 0.456, 0.406], np.float32).reshape(3, 1, 1)
_STD = np.array([0.229, 0.224, 0.225], np.float32).reshape(3, 1, 1)


class H2HSplit(torch.utils.data.Dataset):
    def __init__(self, images_u8, labels, classes):
        self.images = np.ascontiguousarray(images_u8)
        self.labels = np.asarray(labels, np.int64)
        self.classes = list(classes)
        self.class_to_idx = {c: i for i, c in enumerate(self.classes)}
        # path-style sample list for code that inspects .samples/.imgs
        self.samples = [(f"mem://{i}", int(t))
                        for i, t in enumerate(self.labels)]
        self.imgs = self.samples
        self.transform = None
        self.target_transform = None
        self.root = "mem://h2h"

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, index):
        x = self.images[index].astype(np.float32).transpose(2, 0, 1) / 255.0
        x = (x - _MEAN) / _STD
        return torch.from_numpy(x), int(self.labels[index])


class H2HDataset:
    """CustomDataset-compatible registry entry (duck-typed against
    ref:src/data/dataset.py:43-82; not a subclass so this module stays
    importable without the dataprep imports data.dataset pulls in)."""

    def __init__(self, name, task_count, classes_per_task_counts,
                 input_size, pickle_paths):
        self.name = name
        self.argname = name
        self.test_results_dir = name
        self.train_exp_results_dir = name
        self.task_count = task_count
        self.classes_per_task = OrderedDict(
            (str(t), [f"c{i}" for i in range(classes_per_task_counts[t - 1])])
            for t in range(1, task_count + 1))
        self.input_size = tuple(input_size)
        self._pickle_paths = list(pickle_paths)
        # unused-by-h2h knobs some framework code reads
        self.unrel_to_rel_transition = False

    def get_task_dataset_path(self, task_name=None, rnd_transform=False):
        if task_name is None:
            return None
        return self._pickle_paths[int(task_name) - 1]

    def get_taskname(self, task_index):
        return str(task_index)

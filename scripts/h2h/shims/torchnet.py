"""torchnet shim: the ClassErrorMeter PackNet imports at module load
(ref:src/methods/packnet/main.py:9). Functional top-k error meter."""

import numpy as np
import torch


class _ClassErrorMeter:
    def __init__(self, topk=(1,), accuracy=False):
        self.topk = sorted(topk)
        self.accuracy = accuracy
        self.reset()

    def reset(self):
        self._correct = {k: 0 for k in self.topk}
        self._n = 0

    def add(self, output, target):
        output = output.detach().cpu() if torch.is_tensor(output) \
            else torch.as_tensor(np.asarray(output))
        target = target.detach().cpu() if torch.is_tensor(target) \
            else torch.as_tensor(np.asarray(target))
        maxk = max(self.topk)
        pred = output.topk(maxk, dim=1)[1]
        correct = pred.eq(target.view(-1, 1).expand_as(pred))
        for k in self.topk:
            self._correct[k] += int(correct[:, :k].any(dim=1).sum())
        self._n += target.numel()

    def value(self, k=None):
        if k is not None:
            acc = 100.0 * self._correct[k] / max(self._n, 1)
            return acc if self.accuracy else 100.0 - acc
        return [self.value(k) for k in self.topk]


class meter:
    ClassErrorMeter = _ClassErrorMeter

"""torchvision.models shim: the VGG base class VGGSlim subclasses
(ref:src/models/VGGSlim.py:43) with torchvision's forward semantics
(features -> avgpool -> flatten -> classifier), plus an alexnet stub."""

import torch
import torch.nn as nn


class VGG(nn.Module):
    def __init__(self, features, num_classes=1000, init_weights=True):
        super().__init__()
        self.features = features
        # torchvision >=0.3 inserts an avgpool; VGGSlim immediately
        # replaces it with Identity (VGGSlim.py "Compat Pytorch>1.0.0")
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, num_classes))
        if init_weights:
            self._initialize_weights()

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x)
        x = torch.flatten(x, 1)
        x = self.classifier(x)
        return x

    def _initialize_weights(self):
        # torchvision's reference init (kaiming conv / normal(0,0.01) fc)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")
                if m.bias is not None:
                    nn.init.constant_(m.bias, 0)
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.constant_(m.weight, 1)
                nn.init.constant_(m.bias, 0)
            elif isinstance(m, nn.Linear):
                nn.init.normal_(m.weight, 0, 0.01)
                nn.init.constant_(m.bias, 0)


def alexnet(pretrained=False, **kwargs):  # pragma: no cover
    raise NotImplementedError(
        "torchvision shim: alexnet is not provided (the head-to-head "
        "drives the custom VGG9 path only)")


def vgg11(*a, **k):  # pragma: no cover
    raise NotImplementedError("torchvision shim: vgg11 not provided")

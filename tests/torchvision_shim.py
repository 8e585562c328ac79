"""Minimal torchvision / chumpy / mano stand-ins for executing the
reference models in this image (torchvision is not installed, and the
MANO pickle references chumpy).

The ResNet here follows the standard torchvision architecture with
torchvision's exact module naming (conv1/bn1/layerX.Y.convZ/downsample/fc)
so ``state_dict()`` keys match what tools/convert_torch_resnet.py expects.
``install()`` registers ``torchvision`` (with working ``models.resnet18/50``
factories that ignore ``pretrained`` -- zero egress) plus the unpickling
stubs, then returns the torchvision module.  Import this BEFORE importing
anything from /root/reference.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn as tnn


class TorchBasic(tnn.Module):
    expansion = 1

    def __init__(self, inp, planes, stride=1, down=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.downsample = down

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + r)


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inp, planes, stride=1, down=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.downsample = down

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + r)


class TorchResNet(tnn.Module):
    """torchvision-naming-compatible ResNet (1000-class head)."""

    def __init__(self, block, layers, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make(block, 64, layers[0])
        self.layer2 = self._make(block, 128, layers[1], 2)
        self.layer3 = self._make(block, 256, layers[2], 2)
        self.layer4 = self._make(block, 512, layers[3], 2)
        self.fc = tnn.Linear(512 * block.expansion, num_classes)

    def _make(self, block, planes, n, stride=1):
        down = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            down = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * block.expansion, 1,
                           stride, bias=False),
                tnn.BatchNorm2d(planes * block.expansion))
        blocks = [block(self.inplanes, planes, stride, down)]
        self.inplanes = planes * block.expansion
        blocks += [block(self.inplanes, planes) for _ in range(1, n)]
        return tnn.Sequential(*blocks)

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def resnet18(pretrained=False, **kw):
    return TorchResNet(TorchBasic, [2, 2, 2, 2])


def resnet50(pretrained=False, **kw):
    return TorchResNet(TorchBottleneck, [3, 4, 6, 3])


class _FakeCh:
    """Minimal chumpy.Ch stand-in: unpickles to expose the wrapped array."""

    def __setstate__(self, state):
        self.__dict__.update(state if isinstance(state, dict) else {})

    def __array__(self, dtype=None):
        x = np.asarray(self.__dict__.get("x"))
        return x.astype(dtype) if dtype is not None else x


class _FakeSelect(_FakeCh):
    """chumpy.reordering.Select: a.ravel()[idxs] reshaped."""

    def __array__(self, dtype=None):
        a = np.asarray(self.__dict__["a"])
        x = a.ravel()[np.asarray(self.__dict__["idxs"])]
        shape = self.__dict__.get("preferred_shape")
        if shape is not None:
            x = x.reshape(shape)
        return x.astype(dtype) if dtype is not None else x


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def install():
    """Register torchvision + chumpy/mano stubs in sys.modules."""
    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tv.__path__ = []
        tv.models = _stub("torchvision.models", resnet18=resnet18,
                          resnet50=resnet50)
        tv.transforms = _stub("torchvision.transforms", Resize=object)
        _stub("torchvision.transforms.functional")
        tv.datasets = _stub("torchvision.datasets")
    if "chumpy" not in sys.modules:
        chp = _stub("chumpy", Ch=_FakeCh)
        chp.__path__ = []
        _stub("chumpy.ch", Ch=_FakeCh)
        _stub("chumpy.reordering", Select=_FakeSelect)
    if "mano" not in sys.modules:
        _stub("mano")
        _stub("mano.utils", Mesh=object)
    return sys.modules["torchvision"]

"""Standard ResNet18 as a torch nn.Module with torchvision parameter naming
and the (feature, logits) forward contract the reference call sites assume
(SURVEY.md §0 quirk; reference utils/local_training.py:657,937).

torchvision itself is not installed in this environment, so the classic
BasicBlock topology (He et al. 2016) is written out here; parameter names
(conv1/bn1/layer{i}.{j}.conv{k}/downsample.{0,1}/fc) match torchvision so
the state_dict flows through tools/convert_torch_weights.convert_resnet
and forward agreement with fedmlp_tpu.models.resnet is already covered by
tests/test_pretrained_effnet.py::torch_resnet18_forward.
"""

from __future__ import annotations

import torch
from torch import nn


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return self.relu(h + r)


class TorchResNet18(nn.Module):
    def __init__(self, num_classes):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        widths = [64, 128, 256, 512]
        cin = 64
        for li, w in enumerate(widths):
            blocks = []
            for bi in range(2):
                stride = 2 if (li > 0 and bi == 0) else 1
                blocks.append(BasicBlock(cin, w, stride))
                cin = w
            setattr(self, f"layer{li + 1}", nn.Sequential(*blocks))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(512, num_classes)

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        y = self.layer4(self.layer3(self.layer2(self.layer1(y))))
        feature = torch.flatten(self.avgpool(y), 1)
        logits = self.fc(feature)
        return feature, logits

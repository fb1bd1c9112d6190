"""Test-only torch oracle: detectron2-style ResNet-50-C4 backbone up to
res4 with the 1024->11 compression BasicBlock, hand-written with
detectron2 state_dict key names (conv weights + '<conv>.norm.*' frozen
BN, 'shortcut[.norm]', stride on the 1x1 conv)."""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ConvNorm(nn.Module):
    """Conv2d (no bias) with an attached frozen BN named '.norm'."""

    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.weight = nn.Parameter(torch.randn(cout, cin, k, k) * 0.05)
        self.stride = stride
        self.padding = padding
        self.norm = nn.BatchNorm2d(cout)
        self.norm.eval()  # FrozenBN

    def forward(self, x):
        y = F.conv2d(x, self.weight, None, self.stride, self.padding)
        return self.norm(y)


class D2Bottleneck(nn.Module):
    def __init__(self, cin, planes, cout, stride=1):
        super().__init__()
        self.conv1 = ConvNorm(cin, planes, 1, stride)  # stride_in_1x1
        self.conv2 = ConvNorm(planes, planes, 3, 1, 1)
        self.conv3 = ConvNorm(planes, cout, 1)
        self.shortcut = ConvNorm(cin, cout, 1, stride) if cin != cout else None

    def forward(self, x):
        out = F.relu(self.conv1(x))
        out = F.relu(self.conv2(out))
        out = self.conv3(out)
        sc = self.shortcut(x) if self.shortcut is not None else x
        return F.relu(out + sc)


class D2BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = ConvNorm(cin, cout, 3, stride, 1)
        self.conv2 = ConvNorm(cout, cout, 3, 1, 1)
        self.shortcut = ConvNorm(cin, cout, 1, stride) if cin != cout else None

    def forward(self, x):
        out = F.relu(self.conv1(x))
        out = self.conv2(out)
        sc = self.shortcut(x) if self.shortcut is not None else x
        return F.relu(out + sc)


class C4Backbone(nn.Module):
    def __init__(self):
        super().__init__()
        self.stem = nn.Module()
        self.stem.conv1 = ConvNorm(3, 64, 7, 2, 3)
        self.res2 = nn.Sequential(
            D2Bottleneck(64, 64, 256),
            D2Bottleneck(256, 64, 256),
            D2Bottleneck(256, 64, 256))
        self.res3 = nn.Sequential(
            D2Bottleneck(256, 128, 512, 2),
            *[D2Bottleneck(512, 128, 512) for _ in range(3)])
        res4 = [D2Bottleneck(512, 256, 1024, 2)]
        res4 += [D2Bottleneck(1024, 256, 1024) for _ in range(5)]
        res4 += [D2BasicBlock(1024, 11), nn.Sequential()]  # res4.7 emptied
        self.res4 = nn.Sequential(*res4)

    def eval(self):
        super().eval()
        return self

    def forward(self, x):
        x = F.relu(self.stem.conv1(x))
        x = F.max_pool2d(x, 3, 2, 1)
        x = self.res2(x)
        x = self.res3(x)
        x = self.res4(x)
        return torch.flatten(x, 1)

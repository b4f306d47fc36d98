"""Torch oracle of the MonoRec network architecture, for converter/parity
tests only.

Independently written from the architecture description (SURVEY.md §2 #3-8);
attribute names match the reference module attributes so ``state_dict()``
keys coincide with real reference checkpoints (``conv``, ``conv_y``/``conv_x``,
``conv2d_t``, ``enc``/``dec``/``predictors``/``classifier``,
``_feature_extractor.encoder``). Runs on CPU torch; NOT part of the package.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


def _same_pad(x, k, s):
    ky, kx = k if isinstance(k, tuple) else (k, k)
    sy, sx = s if isinstance(s, tuple) else (s, s)
    h, w = x.shape[-2:]
    py = (sy * (math.ceil(h / sy) - 1) + ky - h) / 2
    px = (sx * (math.ceil(w / sx) - 1) + kx - w) / 2
    return F.pad(x, [math.floor(px), math.ceil(px), math.floor(py), math.ceil(py)])


class ConvReLU(nn.Module):
    def __init__(self, cin, cout, k, s=1):
        super().__init__()
        self.k, self.s = k, s
        self.conv = nn.Conv2d(cin, cout, k, s)

    def forward(self, x):
        return F.leaky_relu(self.conv(_same_pad(x, self.k, self.s)), 0.1)


class ConvReLU2(nn.Module):
    def __init__(self, cin, cout, k, s=1):
        super().__init__()
        self.k, self.s = k, s
        self.conv_y = nn.Conv2d(cin, cout, (k, 1), (s, 1))
        self.conv_x = nn.Conv2d(cout, cout, (1, k), (1, s))

    def forward(self, x):
        t = F.leaky_relu(self.conv_y(_same_pad(x, (self.k, 1), (self.s, 1))), 0.1)
        return F.leaky_relu(self.conv_x(_same_pad(t, (1, self.k), (1, self.s))), 0.1)


class Upconv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 2, 1)

    def forward(self, x):
        x = F.interpolate(x, scale_factor=2)
        return self.conv(_same_pad(x, 2, 1))


class Refine(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv2d_t = nn.ConvTranspose2d(cin, cout, 4, 2)

    def forward(self, x):
        y = F.leaky_relu(self.conv2d_t(x), 0.1)
        return y[:, :, 1:-1, 1:-1]


class DepthModule(nn.Module):
    def __init__(self, depth_steps=32, feat=(64, 64, 128, 256, 512)):
        super().__init__()
        cin = depth_steps + 3
        e = (48, 64, 128, 192, 256)
        d = (256, 128, 64, 48, 32, 24)
        self.enc = nn.ModuleList(
            [
                nn.Sequential(ConvReLU2(cin, e[0], 7), ConvReLU2(e[0], e[0], 3)),
                nn.Sequential(ConvReLU2(e[0], e[1], 7, 2), ConvReLU2(e[1], e[1], 3)),
                nn.Sequential(ConvReLU2(e[1], e[2], 5, 2), ConvReLU2(e[2], e[2], 3)),
                nn.Sequential(ConvReLU2(e[2], e[3], 5, 2), ConvReLU2(e[3], e[3], 3)),
                nn.Sequential(ConvReLU2(e[3], e[4], 3, 2), ConvReLU2(e[4], e[4], 3)),
            ]
        )
        self.dec = nn.ModuleList(
            [
                Refine(e[4], d[0]),
                nn.Sequential(
                    Refine(e[3] + feat[2] + d[0], d[1]), ConvReLU2(d[1], d[1], 3)
                ),
                nn.Sequential(
                    Refine(e[2] + feat[1] + d[1], d[2]), ConvReLU2(d[2], d[2], 3)
                ),
                Refine(e[1] + feat[0] + d[2], d[3]),
                nn.Sequential(
                    ConvReLU2(e[0] + d[3], d[4], 3),
                    nn.Identity(),
                    nn.Conv2d(d[4], d[5], 3),
                    nn.LeakyReLU(0.1),
                ),
            ]
        )
        self.predictors = nn.ModuleList(
            [
                nn.Sequential(nn.Identity(), nn.Conv2d(c, 1, 3))
                for c in (d[0], d[1], d[2], d[5])
            ]
        )

    def _predict(self, x, scale):
        x = _same_pad(x, 3, 1)
        return torch.abs(torch.tanh(self.predictors[scale][1](x)))

    def forward(self, cost_volume, keyframe, image_features):
        x = torch.cat([cost_volume, keyframe], dim=1)
        feats = []
        for layer in self.enc:
            x = layer(x)
            feats.append(x)
        preds = []
        x = self.dec[0](feats[4])
        preds.insert(0, self._predict(x, 0))
        x = self.dec[1][0](torch.cat([feats[3], image_features[2], x], 1))
        x = self.dec[1][1](x)
        preds.insert(0, self._predict(x, 1))
        x = self.dec[2][0](torch.cat([feats[2], image_features[1], x], 1))
        x = self.dec[2][1](x)
        preds.insert(0, self._predict(x, 2))
        x = self.dec[3](torch.cat([feats[1], image_features[0], x], 1))
        x = self.dec[4][0](torch.cat([feats[0], x], 1))
        x = self.dec[4][3](self.dec[4][2](_same_pad(x, 3, 1)))
        preds.insert(0, self._predict(x, 3))
        return preds


class MaskModule(nn.Module):
    def __init__(self, depth_steps=32, feat=(64, 64, 128, 256, 512)):
        super().__init__()
        c = (depth_steps, 48, 64, 96, 96)
        d = (96, 96, 64, 48)
        self.enc = nn.ModuleList(
            [
                nn.Sequential(ConvReLU(c[0], c[0], 3), ConvReLU(c[0], c[0], 3)),
                nn.Sequential(nn.MaxPool2d(2), ConvReLU(c[0], c[1], 3), ConvReLU(c[1], c[1], 3)),
                nn.Sequential(nn.MaxPool2d(2), ConvReLU(c[1], c[2], 3), ConvReLU(c[2], c[2], 3)),
                nn.Sequential(nn.MaxPool2d(2), ConvReLU(c[2], c[3], 3), ConvReLU(c[3], c[3], 3)),
                nn.Sequential(nn.MaxPool2d(2), ConvReLU(c[3], c[4], 3), ConvReLU(c[4], c[4], 3)),
            ]
        )
        self.dec = nn.ModuleList(
            [
                nn.Sequential(
                    Upconv(c[4] + feat[3], d[0]),
                    ConvReLU(d[0] + c[3] + feat[2], d[0], 3),
                    ConvReLU(d[0], d[0], 3),
                ),
                nn.Sequential(
                    Upconv(d[0], d[0]),
                    ConvReLU(d[0] + c[2] + feat[1], d[1], 3),
                    ConvReLU(d[1], d[1], 3),
                ),
                nn.Sequential(
                    Upconv(d[1], d[1]),
                    ConvReLU(d[1] + c[1] + feat[0], d[2], 3),
                    ConvReLU(d[2], d[2], 3),
                ),
                nn.Sequential(
                    Upconv(d[2], d[2]),
                    ConvReLU(d[2] + c[0], d[3], 3),
                    ConvReLU(d[3], d[3], 3),
                ),
            ]
        )
        self.classifier = nn.Sequential(nn.Conv2d(d[3], 1, 1), nn.Sigmoid())

    def forward(self, single_frame_cvs, image_features):
        cv_feats = []
        for cv in single_frame_cvs:
            x = cv
            for i, layer in enumerate(self.enc):
                x = layer(x)
                if len(cv_feats) == i:
                    cv_feats.append(x)
                else:
                    cv_feats[i] = torch.max(cv_feats[i], x)
        x = torch.cat([cv_feats[-1], image_features[3]], 1)
        x = self.dec[0][0](x)
        x = torch.cat([cv_feats[-2], image_features[2], x], 1)
        x = self.dec[0][2](self.dec[0][1](x))
        x = self.dec[1][0](x)
        x = torch.cat([cv_feats[-3], image_features[1], x], 1)
        x = self.dec[1][2](self.dec[1][1](x))
        x = self.dec[2][0](x)
        x = torch.cat([cv_feats[-4], image_features[0], x], 1)
        x = self.dec[2][2](self.dec[2][1](x))
        x = self.dec[3][0](x)
        x = torch.cat([cv_feats[0], x], 1)
        x = self.dec[3][2](self.dec[3][1](x))
        return self.classifier(x)


class SimpleMaskModule(nn.Module):
    """Reference SimpleMaskModule (monorec_model.py:388-473): per-frame CVs
    averaged over nonzero entries, conditioned on keyframe + detached depth;
    same encoder/decoder wiring as MaskModule with in_channels = D + 3 + 1."""

    def __init__(self, depth_steps=32, feat=(64, 64, 128, 256, 512)):
        super().__init__()
        cin = depth_steps + 3 + 1
        c = (cin, 48, 64, 96, 96)
        d = (96, 96, 64, 48)
        self.enc = nn.ModuleList(
            [
                nn.Sequential(ConvReLU(cin, c[0], 3), ConvReLU(c[0], c[0], 3)),
                nn.Sequential(nn.MaxPool2d(2), ConvReLU(c[0], c[1], 3), ConvReLU(c[1], c[1], 3)),
                nn.Sequential(nn.MaxPool2d(2), ConvReLU(c[1], c[2], 3), ConvReLU(c[2], c[2], 3)),
                nn.Sequential(nn.MaxPool2d(2), ConvReLU(c[2], c[3], 3), ConvReLU(c[3], c[3], 3)),
                nn.Sequential(nn.MaxPool2d(2), ConvReLU(c[3], c[4], 3), ConvReLU(c[4], c[4], 3)),
            ]
        )
        self.dec = nn.ModuleList(
            [
                nn.Sequential(
                    Upconv(c[4] + feat[3], d[0]),
                    ConvReLU(d[0] + c[3] + feat[2], d[0], 3),
                    ConvReLU(d[0], d[0], 3),
                ),
                nn.Sequential(
                    Upconv(d[0], d[0]),
                    ConvReLU(d[0] + c[2] + feat[1], d[1], 3),
                    ConvReLU(d[1], d[1], 3),
                ),
                nn.Sequential(
                    Upconv(d[1], d[1]),
                    ConvReLU(d[1] + c[1] + feat[0], d[2], 3),
                    ConvReLU(d[2], d[2], 3),
                ),
                nn.Sequential(
                    Upconv(d[2], d[2]),
                    ConvReLU(d[2] + c[0], d[3], 3),
                    ConvReLU(d[3], d[3], 3),
                ),
            ]
        )
        self.classifier = nn.Sequential(nn.Conv2d(d[3], 1, 1), nn.Sigmoid())

    def forward(self, single_frame_cvs, keyframe, pred_inv_depth, image_features):
        stacked = torch.stack(single_frame_cvs, dim=0)
        counts = (stacked != 0).to(torch.float32).sum(dim=0).clamp_min(1)
        avg = stacked.sum(dim=0) / counts
        x = torch.cat([avg, keyframe, pred_inv_depth.detach()], dim=1)
        cv_feats = []
        for layer in self.enc:
            x = layer(x)
            cv_feats.append(x)
        x = torch.cat([cv_feats[-1], image_features[3]], 1)
        x = self.dec[0][0](x)
        x = torch.cat([cv_feats[-2], image_features[2], x], 1)
        x = self.dec[0][2](self.dec[0][1](x))
        x = self.dec[1][0](x)
        x = torch.cat([cv_feats[-3], image_features[1], x], 1)
        x = self.dec[1][2](self.dec[1][1](x))
        x = self.dec[2][0](x)
        x = torch.cat([cv_feats[-4], image_features[0], x], 1)
        x = self.dec[2][2](self.dec[2][1](x))
        x = self.dec[3][0](x)
        x = torch.cat([cv_feats[0], x], 1)
        x = self.dec[3][2](self.dec[3][1](x))
        return self.classifier(x)


class BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride, bias=False), nn.BatchNorm2d(cout)
            )

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return F.relu(y + r)


class ResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
        self.layer2 = nn.Sequential(BasicBlock(64, 128, 2), BasicBlock(128, 128))
        self.layer3 = nn.Sequential(BasicBlock(128, 256, 2), BasicBlock(256, 256))
        self.layer4 = nn.Sequential(BasicBlock(256, 512, 2), BasicBlock(512, 512))

    def forward(self, x):
        feats = []
        x = (x - 0.45) / 0.225
        feats.append(F.relu(self.bn1(self.conv1(x))))
        feats.append(self.layer1(self.maxpool(feats[-1])))
        feats.append(self.layer2(feats[-1]))
        feats.append(self.layer3(feats[-1]))
        feats.append(self.layer4(feats[-1]))
        return feats


class FeatureExtractorWrapper(nn.Module):
    """Matches the reference's '_feature_extractor.encoder.*' key prefix."""

    def __init__(self):
        super().__init__()
        self.encoder = ResNet18()

    def forward(self, x):
        return self.encoder(x)


class MonoRecTorch(nn.Module):
    """Container producing reference-shaped state_dict keys."""

    def __init__(self, depth_steps=32):
        super().__init__()
        self._feature_extractor = FeatureExtractorWrapper()
        self.att_module = MaskModule(depth_steps)
        self.depth_module = DepthModule(depth_steps)

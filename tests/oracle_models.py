"""Pure-torch re-implementations of the canonical torchvision model
factories the reference wraps (resnet*, mobilenet_v2) — torchvision is not
in this image, so these provide the oracle with EXACT torchvision module
naming (state_dict keys and child slicing match upstream), letting the
reference's wrapper backbones (src/models/backbones/resnet.py:46-78,
mobilenet_v2.py:33-52) slice children exactly as they do in production.
"""
from __future__ import annotations

import torch
import torch.nn as nn


# ----------------------------- ResNet --------------------------------------
class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 groups=1, base_width=64):
        super().__init__()
        width = int(planes * (base_width / 64.0)) * groups
        self.conv1 = nn.Conv2d(inplanes, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride, 1, groups=groups,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, block, layers, num_classes=1000, groups=1,
                 width_per_group=64):
        super().__init__()
        self.inplanes = 64
        self.groups = groups
        self.base_width = width_per_group
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1,
                          stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        kw = ({"groups": self.groups, "base_width": self.base_width}
              if block is Bottleneck else {})
        layers = [block(self.inplanes, planes, stride, downsample, **kw)]
        self.inplanes = planes * block.expansion
        layers += [block(self.inplanes, planes, **kw)
                   for _ in range(1, blocks)]
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet18(**kw):
    return ResNet(BasicBlock, [2, 2, 2, 2], **kw)


def resnet34(**kw):
    return ResNet(BasicBlock, [3, 4, 6, 3], **kw)


def resnet50(**kw):
    return ResNet(Bottleneck, [3, 4, 6, 3], **kw)


def resnet101(**kw):
    return ResNet(Bottleneck, [3, 4, 23, 3], **kw)


def resnet152(**kw):
    return ResNet(Bottleneck, [3, 8, 36, 3], **kw)


def resnext50_32x4d(**kw):
    return ResNet(Bottleneck, [3, 4, 6, 3], groups=32, width_per_group=4,
                  **kw)


def resnext101_32x8d(**kw):
    return ResNet(Bottleneck, [3, 4, 23, 3], groups=32, width_per_group=8,
                  **kw)


def wide_resnet50_2(**kw):
    return ResNet(Bottleneck, [3, 4, 6, 3], width_per_group=128, **kw)


def wide_resnet101_2(**kw):
    return ResNet(Bottleneck, [3, 4, 23, 3], width_per_group=128, **kw)


# --------------------------- MobileNetV2 -----------------------------------
def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBNReLU(nn.Sequential):
    def __init__(self, in_planes, out_planes, kernel_size=3, stride=1,
                 groups=1):
        padding = (kernel_size - 1) // 2
        super().__init__(
            nn.Conv2d(in_planes, out_planes, kernel_size, stride, padding,
                      groups=groups, bias=False),
            nn.BatchNorm2d(out_planes),
            nn.ReLU6(inplace=True),
        )


class InvertedResidual(nn.Module):
    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        self.stride = stride
        hidden_dim = int(round(inp * expand_ratio))
        self.use_res_connect = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers.append(ConvBNReLU(inp, hidden_dim, kernel_size=1))
        layers.extend([
            ConvBNReLU(hidden_dim, hidden_dim, stride=stride,
                       groups=hidden_dim),
            nn.Conv2d(hidden_dim, oup, 1, 1, 0, bias=False),
            nn.BatchNorm2d(oup),
        ])
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.use_res_connect else self.conv(x)


class MobileNetV2(nn.Module):
    def __init__(self, num_classes=1000, width_mult=1.0):
        super().__init__()
        input_channel = _make_divisible(32 * width_mult)
        last_channel = _make_divisible(1280 * max(1.0, width_mult))
        setting = [
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]
        features = [ConvBNReLU(3, input_channel, stride=2)]
        for t, c, n, s in setting:
            output_channel = _make_divisible(c * width_mult)
            for i in range(n):
                features.append(InvertedResidual(
                    input_channel, output_channel, s if i == 0 else 1, t))
                input_channel = output_channel
        features.append(ConvBNReLU(input_channel, last_channel,
                                   kernel_size=1))
        self.features = nn.Sequential(*features)
        self.classifier = nn.Sequential(
            nn.Dropout(0.2),
            nn.Linear(last_channel, num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        x = x.mean([2, 3])
        return self.classifier(x)


def mobilenet_v2(**kw):
    return MobileNetV2(**kw)


# --------------------------------------------------------------------------
# ShuffleNetV2 — faithful pure-torch re-implementation of
# torchvision.models.shufflenetv2 (structure + names), so the reference
# wrapper (src/models/backbones/shufflenet_v2.py) can slice its children.
def channel_shuffle(x, groups):
    b, c, h, w = x.size()
    x = x.view(b, groups, c // groups, h, w)
    x = torch.transpose(x, 1, 2).contiguous()
    return x.view(b, -1, h, w)


class ShuffleInvertedResidual(nn.Module):
    def __init__(self, inp, oup, stride):
        super().__init__()
        self.stride = stride
        branch_features = oup // 2
        if self.stride > 1:
            self.branch1 = nn.Sequential(
                nn.Conv2d(inp, inp, 3, stride, 1, groups=inp, bias=False),
                nn.BatchNorm2d(inp),
                nn.Conv2d(inp, branch_features, 1, 1, 0, bias=False),
                nn.BatchNorm2d(branch_features),
                nn.ReLU(inplace=True),
            )
        else:
            self.branch1 = nn.Sequential()
        self.branch2 = nn.Sequential(
            nn.Conv2d(inp if stride > 1 else branch_features,
                      branch_features, 1, 1, 0, bias=False),
            nn.BatchNorm2d(branch_features),
            nn.ReLU(inplace=True),
            nn.Conv2d(branch_features, branch_features, 3, stride, 1,
                      groups=branch_features, bias=False),
            nn.BatchNorm2d(branch_features),
            nn.Conv2d(branch_features, branch_features, 1, 1, 0, bias=False),
            nn.BatchNorm2d(branch_features),
            nn.ReLU(inplace=True),
        )

    def forward(self, x):
        if self.stride == 1:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat((x1, self.branch2(x2)), dim=1)
        else:
            out = torch.cat((self.branch1(x), self.branch2(x)), dim=1)
        return channel_shuffle(out, 2)


class ShuffleNetV2(nn.Module):
    def __init__(self, stages_repeats, stages_out_channels,
                 num_classes=1000):
        super().__init__()
        input_channels = 3
        output_channels = stages_out_channels[0]
        self.conv1 = nn.Sequential(
            nn.Conv2d(input_channels, output_channels, 3, 2, 1, bias=False),
            nn.BatchNorm2d(output_channels),
            nn.ReLU(inplace=True),
        )
        input_channels = output_channels
        self.maxpool = nn.MaxPool2d(kernel_size=3, stride=2, padding=1)
        stage_names = ["stage{}".format(i) for i in [2, 3, 4]]
        for name, repeats, output_channels in zip(
                stage_names, stages_repeats, stages_out_channels[1:]):
            seq = [ShuffleInvertedResidual(input_channels, output_channels, 2)]
            for _ in range(repeats - 1):
                seq.append(ShuffleInvertedResidual(output_channels,
                                            output_channels, 1))
            setattr(self, name, nn.Sequential(*seq))
            input_channels = output_channels
        output_channels = stages_out_channels[-1]
        self.conv5 = nn.Sequential(
            nn.Conv2d(input_channels, output_channels, 1, 1, 0, bias=False),
            nn.BatchNorm2d(output_channels),
            nn.ReLU(inplace=True),
        )
        self.fc = nn.Linear(output_channels, num_classes)

    def forward(self, x):
        x = self.maxpool(self.conv1(x))
        x = self.stage4(self.stage3(self.stage2(x)))
        x = self.conv5(x)
        x = x.mean([2, 3])
        return self.fc(x)


def shufflenet_v2_x0_5(**kw):
    return ShuffleNetV2([4, 8, 4], [24, 48, 96, 192, 1024], **kw)


def shufflenet_v2_x1_0(**kw):
    return ShuffleNetV2([4, 8, 4], [24, 116, 232, 464, 1024], **kw)


def shufflenet_v2_x1_5(**kw):
    return ShuffleNetV2([4, 8, 4], [24, 176, 352, 704, 1024], **kw)


def shufflenet_v2_x2_0(**kw):
    return ShuffleNetV2([4, 8, 4], [24, 244, 488, 976, 2048], **kw)


# ---------------------------------------------------------------- VGG
# torchvision-layout VGG: the reference wrapper (src/models/backbones/
# vgg.py:41-151) slices ``features.children()`` by exact child index, so
# the Sequential layout (Conv[,BN],ReLU per conv; MaxPool between
# groups) must match torchvision's make_layers precisely.

_VGG_CFGS = {
    "A": [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"],
    "B": [64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M",
          512, 512, "M"],
    "D": [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512,
          "M", 512, 512, 512, "M"],
    "E": [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M", 512, 512,
          512, 512, "M", 512, 512, 512, 512, "M"],
}


def _vgg_features(cfg, batch_norm):
    layers, in_ch = [], 3
    for v in cfg:
        if v == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(in_ch, v, kernel_size=3, padding=1))
            if batch_norm:
                layers.append(nn.BatchNorm2d(v))
            layers.append(nn.ReLU(inplace=True))
            in_ch = v
    return nn.Sequential(*layers)


class TVVGG(nn.Module):
    def __init__(self, cfg, batch_norm=False, num_classes=1000):
        super().__init__()
        self.features = _vgg_features(_VGG_CFGS[cfg], batch_norm)
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, 4096), nn.ReLU(True), nn.Dropout(),
            nn.Linear(4096, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x)
        x = torch.flatten(x, 1)
        return self.classifier(x)


def vgg11(**kw):
    return TVVGG("A", False, **kw)


def vgg13(**kw):
    return TVVGG("B", False, **kw)


def vgg16(**kw):
    return TVVGG("D", False, **kw)


def vgg19(**kw):
    return TVVGG("E", False, **kw)


def vgg11_bn(**kw):
    return TVVGG("A", True, **kw)


def vgg13_bn(**kw):
    return TVVGG("B", True, **kw)


def vgg16_bn(**kw):
    return TVVGG("D", True, **kw)


def vgg19_bn(**kw):
    return TVVGG("E", True, **kw)


# ------------------------------------------------------------ SqueezeNet
class TVFire(nn.Module):
    def __init__(self, inplanes, squeeze_planes, expand1x1_planes,
                 expand3x3_planes):
        super().__init__()
        self.squeeze = nn.Conv2d(inplanes, squeeze_planes, kernel_size=1)
        self.squeeze_activation = nn.ReLU(inplace=True)
        self.expand1x1 = nn.Conv2d(squeeze_planes, expand1x1_planes,
                                   kernel_size=1)
        self.expand1x1_activation = nn.ReLU(inplace=True)
        self.expand3x3 = nn.Conv2d(squeeze_planes, expand3x3_planes,
                                   kernel_size=3, padding=1)
        self.expand3x3_activation = nn.ReLU(inplace=True)

    def forward(self, x):
        x = self.squeeze_activation(self.squeeze(x))
        return torch.cat([
            self.expand1x1_activation(self.expand1x1(x)),
            self.expand3x3_activation(self.expand3x3(x))], 1)


class TVSqueezeNet(nn.Module):
    """torchvision SqueezeNet layout (exact child indices — the
    reference wrapper slices features by index)."""

    def __init__(self, version="1_1", num_classes=1000):
        super().__init__()
        if version == "1_0":
            self.features = nn.Sequential(
                nn.Conv2d(3, 96, kernel_size=7, stride=2),
                nn.ReLU(inplace=True),
                nn.MaxPool2d(kernel_size=3, stride=2, ceil_mode=True),
                TVFire(96, 16, 64, 64), TVFire(128, 16, 64, 64),
                TVFire(128, 32, 128, 128),
                nn.MaxPool2d(kernel_size=3, stride=2, ceil_mode=True),
                TVFire(256, 32, 128, 128), TVFire(256, 48, 192, 192),
                TVFire(384, 48, 192, 192), TVFire(384, 64, 256, 256),
                nn.MaxPool2d(kernel_size=3, stride=2, ceil_mode=True),
                TVFire(512, 64, 256, 256))
        else:
            self.features = nn.Sequential(
                nn.Conv2d(3, 64, kernel_size=3, stride=2),
                nn.ReLU(inplace=True),
                nn.MaxPool2d(kernel_size=3, stride=2, ceil_mode=True),
                TVFire(64, 16, 64, 64), TVFire(128, 16, 64, 64),
                nn.MaxPool2d(kernel_size=3, stride=2, ceil_mode=True),
                TVFire(128, 32, 128, 128), TVFire(256, 32, 128, 128),
                nn.MaxPool2d(kernel_size=3, stride=2, ceil_mode=True),
                TVFire(256, 48, 192, 192), TVFire(384, 48, 192, 192),
                TVFire(384, 64, 256, 256), TVFire(512, 64, 256, 256))
        self.classifier = nn.Sequential(
            nn.Dropout(p=0.5), nn.Conv2d(512, num_classes, kernel_size=1),
            nn.ReLU(inplace=True), nn.AdaptiveAvgPool2d((1, 1)))

    def forward(self, x):
        x = self.classifier(self.features(x))
        return torch.flatten(x, 1)


def squeezenet1_0(**kw):
    return TVSqueezeNet("1_0", **kw)


def squeezenet1_1(**kw):
    return TVSqueezeNet("1_1", **kw)


# ---------------------------------------------------------- MobileNetV3
# torchvision layout: features children sliced by index in the reference
# wrapper (mobilenet_v3.py:33-48); block internals follow torchvision's
# InvertedResidual (block Sequential: [expand], dw, [SE], project).

class _MBV3SE(nn.Module):
    def __init__(self, input_channels, squeeze_channels):
        super().__init__()
        self.fc1 = nn.Conv2d(input_channels, squeeze_channels, 1)
        self.relu = nn.ReLU(inplace=True)
        self.fc2 = nn.Conv2d(squeeze_channels, input_channels, 1)

    def forward(self, x):
        s = torch.nn.functional.adaptive_avg_pool2d(x, 1)
        s = self.fc2(self.relu(self.fc1(s)))
        return x * torch.nn.functional.hardsigmoid(s)


def _cba(in_ch, out_ch, k, stride, groups, act):
    pad = (k - 1) // 2
    layers = [nn.Conv2d(in_ch, out_ch, k, stride, pad, groups=groups,
                        bias=False),
              nn.BatchNorm2d(out_ch, eps=0.001, momentum=0.01)]
    if act == "HS":
        layers.append(nn.Hardswish(inplace=True))
    elif act == "RE":
        layers.append(nn.ReLU(inplace=True))
    else:
        layers.append(nn.Identity())
    return nn.Sequential(*layers)


class _MBV3Block(nn.Module):
    def __init__(self, in_ch, k, exp, out_ch, se, act, stride):
        super().__init__()
        self.use_res = stride == 1 and in_ch == out_ch
        layers = []
        if exp != in_ch:
            layers.append(_cba(in_ch, exp, 1, 1, 1, act))
        layers.append(_cba(exp, exp, k, stride, exp, act))
        if se:
            layers.append(_MBV3SE(exp, _make_divisible(exp // 4, 8)))
        layers.append(_cba(exp, out_ch, 1, 1, 1, None))
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


_MBV3_SMALL = [  # (k, exp, out, se, act, stride)
    (3, 16, 16, True, "RE", 2), (3, 72, 24, False, "RE", 2),
    (3, 88, 24, False, "RE", 1), (5, 96, 40, True, "HS", 2),
    (5, 240, 40, True, "HS", 1), (5, 240, 40, True, "HS", 1),
    (5, 120, 48, True, "HS", 1), (5, 144, 48, True, "HS", 1),
    (5, 288, 96, True, "HS", 2), (5, 576, 96, True, "HS", 1),
    (5, 576, 96, True, "HS", 1)]
_MBV3_LARGE = [
    (3, 16, 16, False, "RE", 1), (3, 64, 24, False, "RE", 2),
    (3, 72, 24, False, "RE", 1), (5, 72, 40, True, "RE", 2),
    (5, 120, 40, True, "RE", 1), (5, 120, 40, True, "RE", 1),
    (3, 240, 80, False, "HS", 2), (3, 200, 80, False, "HS", 1),
    (3, 184, 80, False, "HS", 1), (3, 184, 80, False, "HS", 1),
    (3, 480, 112, True, "HS", 1), (3, 672, 112, True, "HS", 1),
    (5, 672, 160, True, "HS", 2), (5, 960, 160, True, "HS", 1),
    (5, 960, 160, True, "HS", 1)]


class TVMobileNetV3(nn.Module):
    def __init__(self, cfg, last_mult=6, last_fc=1024, num_classes=1000):
        super().__init__()
        layers = [_cba(3, 16, 3, 2, 1, "HS")]
        in_ch = 16
        for (k, exp, out_ch, se, act, stride) in cfg:
            layers.append(_MBV3Block(in_ch, k, exp, out_ch, se, act, stride))
            in_ch = out_ch
        last_conv = in_ch * last_mult
        layers.append(_cba(in_ch, last_conv, 1, 1, 1, "HS"))
        self.features = nn.Sequential(*layers)
        self.classifier = nn.Sequential(
            nn.Linear(last_conv, last_fc), nn.Hardswish(inplace=True),
            nn.Dropout(p=0.2), nn.Linear(last_fc, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = torch.nn.functional.adaptive_avg_pool2d(x, 1)
        return self.classifier(torch.flatten(x, 1))


def mobilenet_v3_small(**kw):
    return TVMobileNetV3(_MBV3_SMALL, last_mult=6, last_fc=1024, **kw)


def mobilenet_v3_large(**kw):
    return TVMobileNetV3(_MBV3_LARGE, last_mult=6, last_fc=1280, **kw)


# ------------------------------------------------------------- ConvNeXt
class _Permute(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return x.permute(self.dims)


class LayerNorm2d(nn.LayerNorm):
    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class CNBlock(nn.Module):
    def __init__(self, dim, layer_scale=1e-6):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(dim, dim, kernel_size=7, padding=3, groups=dim,
                      bias=True),
            _Permute([0, 2, 3, 1]),
            nn.LayerNorm(dim, eps=1e-6),
            nn.Linear(dim, 4 * dim),
            nn.GELU(),
            nn.Linear(4 * dim, dim),
            _Permute([0, 3, 1, 2]))
        self.layer_scale = nn.Parameter(torch.ones(dim, 1, 1) * layer_scale)

    def forward(self, x):
        return x + self.layer_scale * self.block(x)  # eval: no stoch depth


class TVConvNeXt(nn.Module):
    """torchvision ConvNeXt layout (features child indices are what the
    reference wrapper slices)."""

    def __init__(self, depths, dims, num_classes=1000):
        super().__init__()
        layers = [nn.Sequential(
            nn.Conv2d(3, dims[0], kernel_size=4, stride=4, bias=True),
            LayerNorm2d(dims[0], eps=1e-6))]
        for i, (d, dim) in enumerate(zip(depths, dims)):
            if i > 0:
                layers.append(nn.Sequential(
                    LayerNorm2d(dims[i - 1], eps=1e-6),
                    nn.Conv2d(dims[i - 1], dim, kernel_size=2, stride=2)))
            layers.append(nn.Sequential(*[CNBlock(dim) for _ in range(d)]))
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Sequential(
            LayerNorm2d(dims[-1], eps=1e-6), nn.Flatten(1),
            nn.Linear(dims[-1], num_classes))

    def forward(self, x):
        x = self.avgpool(self.features(x))
        return self.classifier(x)


def convnext_tiny(**kw):
    return TVConvNeXt((3, 3, 9, 3), (96, 192, 384, 768), **kw)


def convnext_small(**kw):
    return TVConvNeXt((3, 3, 27, 3), (96, 192, 384, 768), **kw)


def convnext_base(**kw):
    return TVConvNeXt((3, 3, 27, 3), (128, 256, 512, 1024), **kw)


def convnext_large(**kw):
    return TVConvNeXt((3, 3, 27, 3), (192, 384, 768, 1536), **kw)


# --------------------------------------------------------------- RegNet
# torchvision layout: stem + trunk_output.blockK.blockK-i with
# f = BottleneckTransform(a, b, [se], c); the reference wrapper grabs
# trunk_output.block1..4 directly (regnet.py:81-85).

class _RegSE(nn.Module):
    def __init__(self, input_channels, squeeze_channels):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(input_channels, squeeze_channels, 1)
        self.fc2 = nn.Conv2d(squeeze_channels, input_channels, 1)
        self.activation = nn.ReLU()
        self.scale_activation = nn.Sigmoid()

    def forward(self, x):
        s = self.avgpool(x)
        s = self.scale_activation(self.fc2(self.activation(self.fc1(s))))
        return x * s


def _reg_cna(w_in, w_out, k, stride, groups=1, act=True):
    layers = [nn.Conv2d(w_in, w_out, k, stride, (k - 1) // 2, groups=groups,
                        bias=False), nn.BatchNorm2d(w_out)]
    if act:
        layers.append(nn.ReLU(inplace=True))
    return nn.Sequential(*layers)


class _BottleneckTransform(nn.Module):
    def __init__(self, w_in, w_out, stride, group_width, se):
        super().__init__()
        groups = w_out // group_width
        self.a = _reg_cna(w_in, w_out, 1, 1)
        self.b = _reg_cna(w_out, w_out, 3, stride, groups=groups)
        if se:
            self.se = _RegSE(w_out, int(round(w_in * 0.25)))
        self.c = _reg_cna(w_out, w_out, 1, 1, act=False)

    def forward(self, x):
        x = self.b(self.a(x))
        if hasattr(self, "se"):
            x = self.se(x)
        return self.c(x)


class _ResBottleneckBlock(nn.Module):
    def __init__(self, w_in, w_out, stride, group_width, se):
        super().__init__()
        self.proj = None
        if w_in != w_out or stride != 1:
            self.proj = _reg_cna(w_in, w_out, 1, stride, act=False)
        self.f = _BottleneckTransform(w_in, w_out, stride, group_width, se)
        self.activation = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = self.proj(x) if self.proj is not None else x
        return self.activation(identity + self.f(x))


class TVRegNet(nn.Module):
    def __init__(self, depths, widths, group_width, se, num_classes=1000):
        super().__init__()
        self.stem = _reg_cna(3, 32, 3, 2)
        trunk = nn.Sequential()
        w_in = 32
        for si, (d, w) in enumerate(zip(depths, widths), start=1):
            stage = nn.Sequential()
            for bi in range(d):
                stage.add_module(
                    f"block{si}-{bi}",
                    _ResBottleneckBlock(w_in if bi == 0 else w, w,
                                        2 if bi == 0 else 1, group_width,
                                        se))
            trunk.add_module(f"block{si}", stage)
            w_in = w
        self.trunk_output = trunk
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(widths[-1], num_classes)

    def forward(self, x):
        x = self.trunk_output(self.stem(x))
        return self.fc(torch.flatten(self.avgpool(x), 1))


_REGNET_SPECS = {
    "regnet_x_400mf": ((1, 2, 7, 12), (32, 64, 160, 400), 16, False),
    "regnet_x_800mf": ((1, 3, 7, 5), (64, 128, 288, 672), 16, False),
    "regnet_x_1_6gf": ((2, 4, 10, 2), (72, 168, 408, 912), 24, False),
    "regnet_x_3_2gf": ((2, 6, 15, 2), (96, 192, 432, 1008), 48, False),
    "regnet_x_8gf": ((2, 5, 15, 1), (80, 240, 720, 1920), 120, False),
    "regnet_x_16gf": ((2, 6, 13, 1), (256, 512, 896, 2048), 128, False),
    "regnet_x_32gf": ((2, 7, 13, 1), (336, 672, 1344, 2520), 168, False),
    "regnet_y_400mf": ((1, 3, 6, 6), (48, 104, 208, 440), 8, True),
    "regnet_y_800mf": ((1, 3, 8, 2), (64, 144, 320, 784), 16, True),
    "regnet_y_1_6gf": ((2, 6, 17, 2), (48, 120, 336, 888), 24, True),
    "regnet_y_3_2gf": ((2, 5, 13, 1), (72, 216, 576, 1512), 24, True),
    "regnet_y_8gf": ((2, 4, 10, 1), (224, 448, 896, 2016), 56, True),
    "regnet_y_16gf": ((2, 4, 11, 1), (224, 448, 1232, 3024), 112, True),
    "regnet_y_32gf": ((2, 5, 12, 1), (232, 696, 1392, 3712), 232, True),
}


def _regnet_factory(name):
    def factory(**kw):
        d, w, g, se = _REGNET_SPECS[name]
        return TVRegNet(d, w, g, se, **kw)
    return factory


for _n in _REGNET_SPECS:
    globals()[_n] = _regnet_factory(_n)


# ----------------------------------------------------------- EfficientNet
# torchvision layout: features[0]=stem, [1..7]=stage Sequentials of
# MBConv, [8]=1280 head — the reference wrapper binds features[i] to
# stage_i directly (efficientnet.py:64-77).

class _EffSE(nn.Module):
    def __init__(self, input_channels, squeeze_channels):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(input_channels, squeeze_channels, 1)
        self.fc2 = nn.Conv2d(squeeze_channels, input_channels, 1)
        self.activation = nn.SiLU()
        self.scale_activation = nn.Sigmoid()

    def forward(self, x):
        s = self.avgpool(x)
        s = self.scale_activation(self.fc2(self.activation(self.fc1(s))))
        return x * s


def _eff_cna(in_ch, out_ch, k, stride, groups=1, act=True):
    layers = [nn.Conv2d(in_ch, out_ch, k, stride, (k - 1) // 2,
                        groups=groups, bias=False), nn.BatchNorm2d(out_ch)]
    if act:
        layers.append(nn.SiLU(inplace=True))
    return nn.Sequential(*layers)


class _EffMBConv(nn.Module):
    def __init__(self, in_ch, out_ch, expand, k, stride):
        super().__init__()
        self.use_res = stride == 1 and in_ch == out_ch
        hidden = _make_divisible(in_ch * expand, 8)
        layers = []
        if hidden != in_ch:
            layers.append(_eff_cna(in_ch, hidden, 1, 1))
        layers.append(_eff_cna(hidden, hidden, k, stride, groups=hidden))
        layers.append(_EffSE(hidden, max(1, in_ch // 4)))
        layers.append(_eff_cna(hidden, out_ch, 1, 1, act=False))
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y  # eval: no stochastic depth


_EFF_BASE = [  # (expand, channels, repeats, stride, kernel)
    (1, 16, 1, 1, 3), (6, 24, 2, 2, 3), (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3), (6, 112, 3, 1, 5), (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3)]


class TVEfficientNet(nn.Module):
    def __init__(self, width_mult, depth_mult, dropout=0.2,
                 num_classes=1000):
        super().__init__()
        import math as _math
        adj = lambda c: _make_divisible(c * width_mult, 8)
        layers = [_eff_cna(3, adj(32), 3, 2)]
        in_ch = adj(32)
        for (e, c, r, s, k) in _EFF_BASE:
            out_ch = adj(c)
            reps = int(_math.ceil(r * depth_mult))
            stage = []
            for j in range(reps):
                stage.append(_EffMBConv(in_ch, out_ch, e, k,
                                        s if j == 0 else 1))
                in_ch = out_ch
            layers.append(nn.Sequential(*stage))
        head = adj(1280)
        layers.append(_eff_cna(in_ch, head, 1, 1))
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Sequential(nn.Dropout(p=dropout),
                                        nn.Linear(head, num_classes))

    def forward(self, x):
        x = self.avgpool(self.features(x))
        return self.classifier(torch.flatten(x, 1))


_EFF_SCALING = {
    "efficientnet_b0": (1.0, 1.0, 0.2), "efficientnet_b1": (1.0, 1.1, 0.2),
    "efficientnet_b2": (1.1, 1.2, 0.3), "efficientnet_b3": (1.2, 1.4, 0.3),
    "efficientnet_b4": (1.4, 1.8, 0.4), "efficientnet_b5": (1.6, 2.2, 0.4),
    "efficientnet_b6": (1.8, 2.6, 0.5), "efficientnet_b7": (2.0, 3.1, 0.5),
}


def _eff_factory(name):
    def factory(**kw):
        wm, dm, dr = _EFF_SCALING[name]
        return TVEfficientNet(wm, dm, dr, **kw)
    return factory


for _n in _EFF_SCALING:
    globals()[_n] = _eff_factory(_n)


# --------------------------------------------------------------- DenseNet
# torchvision layout: features.{conv0,norm0,relu0,pool0,denseblock1,
# transition1,...,denseblock4,norm5}; the reference wrapper slices these
# attributes directly (densenet.py:42-60).

class _TVDenseLayer(nn.Module):
    def __init__(self, in_ch, growth, bn_size=4):
        super().__init__()
        self.norm1 = nn.BatchNorm2d(in_ch)
        self.relu1 = nn.ReLU(inplace=True)
        self.conv1 = nn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
        self.norm2 = nn.BatchNorm2d(bn_size * growth)
        self.relu2 = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                               bias=False)

    def forward(self, x):
        y = self.conv2(self.relu2(self.norm2(
            self.conv1(self.relu1(self.norm1(x))))))
        return torch.cat([x, y], 1)


class _TVDenseBlock(nn.Sequential):
    def __init__(self, num_layers, in_ch, growth):
        layers = {f"denselayer{i + 1}": _TVDenseLayer(in_ch + i * growth,
                                                      growth)
                  for i in range(num_layers)}
        super().__init__()
        for k, v in layers.items():
            self.add_module(k, v)


class _TVTransition(nn.Sequential):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.add_module("norm", nn.BatchNorm2d(in_ch))
        self.add_module("relu", nn.ReLU(inplace=True))
        self.add_module("conv", nn.Conv2d(in_ch, out_ch, 1, bias=False))
        self.add_module("pool", nn.AvgPool2d(2, 2))


class TVDenseNet(nn.Module):
    def __init__(self, growth, init_ch, reps, num_classes=1000):
        super().__init__()
        self.features = nn.Sequential()
        self.features.add_module(
            "conv0", nn.Conv2d(3, init_ch, 7, 2, 3, bias=False))
        self.features.add_module("norm0", nn.BatchNorm2d(init_ch))
        self.features.add_module("relu0", nn.ReLU(inplace=True))
        self.features.add_module("pool0", nn.MaxPool2d(3, 2, 1))
        ch = init_ch
        for i, n in enumerate(reps, start=1):
            self.features.add_module(f"denseblock{i}",
                                     _TVDenseBlock(n, ch, growth))
            ch += n * growth
            if i < len(reps):
                self.features.add_module(f"transition{i}",
                                         _TVTransition(ch, ch // 2))
                ch //= 2
        self.features.add_module("norm5", nn.BatchNorm2d(ch))
        self.classifier = nn.Linear(ch, num_classes)

    def forward(self, x):
        f = torch.relu(self.features(x))
        f = torch.nn.functional.adaptive_avg_pool2d(f, 1)
        return self.classifier(torch.flatten(f, 1))


_DENSE_CFGS = {
    "densenet121": (32, 64, (6, 12, 24, 16)),
    "densenet161": (48, 96, (6, 12, 36, 24)),
    "densenet169": (32, 64, (6, 12, 32, 32)),
    "densenet201": (32, 64, (6, 12, 48, 32)),
}


def _dense_factory(name):
    # pretrained accepted silently: the reference wrapper hardcodes
    # pretrained=True (densenet.py:28) and then crashes on its own
    # missing load_pretrained_weights — the quirk test needs to reach it.
    def factory(pretrained=False, **kw):
        g, c, r = _DENSE_CFGS[name]
        return TVDenseNet(g, c, r, **kw)
    return factory


for _n in _DENSE_CFGS:
    globals()[_n] = _dense_factory(_n)


# -------------------------------------------------------------------- ViT
# torchvision layout: conv_proj, class_token, encoder.{pos_embedding,
# dropout,layers.encoder_layer_i.{ln_1,self_attention,dropout,ln_2,mlp},
# ln}, heads.head — reference wrapper binds these (vision_transformer.py:46-51)
# and drives them via self.vit in _process_input/forward.

class _TVEncoderBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_dim):
        super().__init__()
        self.ln_1 = nn.LayerNorm(dim, eps=1e-6)
        self.self_attention = nn.MultiheadAttention(dim, num_heads,
                                                    batch_first=True)
        self.dropout = nn.Dropout(0.0)
        self.ln_2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Sequential(nn.Linear(dim, mlp_dim), nn.GELU(),
                                 nn.Dropout(0.0), nn.Linear(mlp_dim, dim),
                                 nn.Dropout(0.0))

    def forward(self, x):
        h = self.ln_1(x)
        h, _ = self.self_attention(h, h, h, need_weights=False)
        x = x + self.dropout(h)
        return x + self.mlp(self.ln_2(x))


class _TVViTEncoder(nn.Module):
    def __init__(self, seq_len, dim, depth, num_heads, mlp_dim):
        super().__init__()
        self.pos_embedding = nn.Parameter(
            torch.empty(1, seq_len, dim).normal_(std=0.02))
        self.dropout = nn.Dropout(0.0)
        self.layers = nn.Sequential()
        for i in range(depth):
            self.layers.add_module(f"encoder_layer_{i}",
                                   _TVEncoderBlock(dim, num_heads, mlp_dim))
        self.ln = nn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        return self.ln(self.layers(self.dropout(x + self.pos_embedding)))


class TVViT(nn.Module):
    def __init__(self, patch, dim, depth, num_heads, mlp_dim,
                 image_size=224, num_classes=1000):
        super().__init__()
        self.patch_size = patch
        self.hidden_dim = dim
        self.conv_proj = nn.Conv2d(3, dim, patch, patch)
        self.class_token = nn.Parameter(torch.zeros(1, 1, dim))
        seq_len = (image_size // patch) ** 2 + 1
        self.encoder = _TVViTEncoder(seq_len, dim, depth, num_heads,
                                     mlp_dim)
        import collections
        self.heads = nn.Sequential(collections.OrderedDict(
            head=nn.Linear(dim, num_classes)))

    def forward(self, x):  # classifier path, as torchvision
        n = x.shape[0]
        p = self.conv_proj(x)
        p = p.reshape(n, self.hidden_dim, -1).permute(0, 2, 1)
        x = torch.cat([self.class_token.expand(n, -1, -1), p], dim=1)
        return self.heads(self.encoder(x)[:, 0])


_VIT_CFGS = {
    "vit_b_16": (16, 768, 12, 12, 3072),
    "vit_b_32": (32, 768, 12, 12, 3072),
    "vit_l_16": (16, 1024, 24, 16, 4096),
    "vit_l_32": (32, 1024, 24, 16, 4096),
}


def _vit_factory(name):
    def factory(pretrained=False, **kw):
        if pretrained:
            raise RuntimeError("zero-egress: no pretrained weights")
        return TVViT(*_VIT_CFGS[name], **kw)
    return factory


for _n in _VIT_CFGS:
    globals()[_n] = _vit_factory(_n)

"""ResNet family (reference: src/models/backbones/resnet.py wrapping
torchvision; native Flax/NHWC here — He et al., arXiv:1512.03385).

Supports resnet18/34/50/101/152 + ResNeXt/wide variants via ``groups`` /
``width_per_group``, dilated stages for segmentation (replace-stride-with-
dilation, as the reference's seg ResNet does, backbones/seg/), stage
freezing and norm-eval for detection (reference: fcos.py:63-78).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..bricks import BatchNorm

from ...registry import BACKBONES


_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
    "resnet152": ("bottleneck", (3, 8, 36, 3)),
    "resnext50_32x4d": ("bottleneck", (3, 4, 6, 3)),
    "resnext101_32x8d": ("bottleneck", (3, 4, 23, 3)),
    "wide_resnet50_2": ("bottleneck", (3, 4, 6, 3)),
    "wide_resnet101_2": ("bottleneck", (3, 4, 23, 3)),
}


def _bn(train, name, momentum=0.9, eps=1e-5):
    return BatchNorm(use_running_average=not train, momentum=momentum,
                        epsilon=eps, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=self.stride,
                    padding=self.dilation, kernel_dilation=self.dilation,
                    use_bias=False, name="conv1")(x)
        y = _bn(train, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.planes, (3, 3), padding=self.dilation,
                    kernel_dilation=self.dilation, use_bias=False,
                    name="conv2")(y)
        y = _bn(train, "bn2")(y)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, name="ds_conv")(x)
            identity = _bn(train, "ds_bn")(identity)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4
        identity = x
        y = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        y = _bn(train, "bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), strides=self.stride, padding=self.dilation,
                    kernel_dilation=self.dilation,
                    feature_group_count=self.groups, use_bias=False,
                    name="conv2")(y)
        y = _bn(train, "bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = _bn(train, "bn3")(y)
        if self.downsample:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, name="ds_conv")(x)
            identity = _bn(train, "ds_bn")(identity)
        return nn.relu(y + identity)


@BACKBONES.register(name="ResNet", aliases=("resnet",))
class ResNet(nn.Module):
    subtype: str = "resnet50"
    out_stages: Sequence[int] = (2, 3, 4)   # C3, C4, C5 (1-based stage idx)
    classifier: bool = False
    num_classes: int = 1000
    output_stride: int = 32                  # 8/16 → dilate later stages (seg)
    frozen_stages: int = -1                  # parity slot; freezing via optax mask
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, rfp_feats=None):
        """``rfp_feats``: optional {stage_idx: (B,h,w,C) feature} injected
        after each stage's first block — the DetectoRS Recursive Feature
        Pyramid hook (reference necks/rfp.py:93; zero-init 1×1 conv so the
        recursion starts as identity)."""
        # v1c / v1d suffix → deep stem: three 3×3 convs replace the 7×7
        # (reference ResNetV1c as named by conf/seg/sfnet/*.yml)
        subtype = self.subtype
        deep_stem = subtype.endswith(("v1c", "v1d"))
        if deep_stem:
            subtype = subtype[:-3]
        block_type, layers = _SPECS[subtype]
        groups, base_width = 1, 64
        if "resnext50" in self.subtype:
            groups, base_width = 32, 4
        elif "resnext101" in self.subtype:
            groups, base_width = 32, 8
        elif "wide_" in self.subtype:
            base_width = 128

        # output_stride → which stages trade stride for dilation
        strides = [1, 2, 2, 2]
        dilations = [1, 1, 1, 1]
        if self.output_stride == 16:
            strides[3], dilations[3] = 1, 2
        elif self.output_stride == 8:
            strides[2], dilations[2] = 1, 2
            strides[3], dilations[3] = 1, 4

        if deep_stem:
            for i, (ch, s) in enumerate(((32, 2), (32, 1), (64, 1))):
                x = nn.Conv(ch, (3, 3), strides=s, padding=1, use_bias=False,
                            name=f"stem_conv{i}")(x)
                x = _bn(train, f"stem_bn{i}")(x)
                x = nn.relu(x)
        else:
            x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                        name="stem_conv")(x)
            x = _bn(train, "stem_bn")(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        planes = 64
        for si, (n_blocks, stride, dilation) in enumerate(
            zip(layers, strides, dilations), start=1
        ):
            for bi in range(n_blocks):
                first = bi == 0
                if block_type == "basic":
                    need_ds = first and (stride != 1 or x.shape[-1] != planes)
                    x = BasicBlock(
                        planes, stride if first else 1, dilation,
                        downsample=need_ds, name=f"layer{si}_block{bi}",
                    )(x, train)
                else:
                    need_ds = first and (stride != 1 or x.shape[-1] != planes * 4)
                    x = Bottleneck(
                        planes, stride if first else 1, dilation,
                        downsample=need_ds, groups=groups,
                        base_width=base_width, name=f"layer{si}_block{bi}",
                    )(x, train)
                if first and rfp_feats is not None and si in rfp_feats:
                    x = x + nn.Conv(x.shape[-1], (1, 1),
                                    kernel_init=nn.initializers.zeros,
                                    name=f"rfp_conv{si}")(rfp_feats[si])
            if si in self.out_stages and not self.classifier:
                feats.append(x)
            planes *= 2

        if self.classifier:
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(self.num_classes, name="fc")(x)
        return tuple(feats)

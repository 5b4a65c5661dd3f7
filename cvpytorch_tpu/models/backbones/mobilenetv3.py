"""MobileNetV3 small/large (reference: src/models/backbones/mobilenet_v3.py
wrapping torchvision; native Flax/NHWC — Howard et al., arXiv:1905.02244)."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import ConvBNAct, SqueezeExcite, make_divisible

# (kernel, expand_ch, out_ch, se, act, stride)
_LARGE = [
    (3, 16, 16, False, "relu", 1),
    (3, 64, 24, False, "relu", 2),
    (3, 72, 24, False, "relu", 1),
    (5, 72, 40, True, "relu", 2),
    (5, 120, 40, True, "relu", 1),
    (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hardswish", 2),
    (3, 200, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 480, 112, True, "hardswish", 1),
    (3, 672, 112, True, "hardswish", 1),
    (5, 672, 160, True, "hardswish", 2),
    (5, 960, 160, True, "hardswish", 1),
    (5, 960, 160, True, "hardswish", 1),
]
_SMALL = [
    (3, 16, 16, True, "relu", 2),
    (3, 72, 24, False, "relu", 2),
    (3, 88, 24, False, "relu", 1),
    (5, 96, 40, True, "hardswish", 2),
    (5, 240, 40, True, "hardswish", 1),
    (5, 240, 40, True, "hardswish", 1),
    (5, 120, 48, True, "hardswish", 1),
    (5, 144, 48, True, "hardswish", 1),
    (5, 288, 96, True, "hardswish", 2),
    (5, 576, 96, True, "hardswish", 1),
    (5, 576, 96, True, "hardswish", 1),
]


class Bneck(nn.Module):
    kernel: int
    expand_ch: int
    out_ch: int
    use_se: bool
    act: str
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = x
        if self.expand_ch != in_ch:
            h = ConvBNAct(self.expand_ch, 1, act=self.act, bn_momentum=0.99,
                          bn_eps=1e-3, name="expand")(h, train)
        h = ConvBNAct(self.expand_ch, self.kernel, self.stride,
                      groups=self.expand_ch, act=self.act, bn_momentum=0.99,
                      bn_eps=1e-3, name="dw")(h, train)
        if self.use_se:
            h = SqueezeExcite(reduce_ratio=4, gate="hsigmoid", name="se")(h)
        h = ConvBNAct(self.out_ch, 1, act=None, bn_momentum=0.99,
                      bn_eps=1e-3, name="project")(h, train)
        if self.stride == 1 and in_ch == self.out_ch:
            return x + h
        return h


@BACKBONES.register(name="MobileNetV3", aliases=("mobilenet_v3",))
class MobileNetV3(nn.Module):
    subtype: str = "mobilenet_v3_large"
    out_stages: Sequence[int] | None = None
    classifier: bool = False
    num_classes: int = 1000
    dropout: float = 0.2
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        small = "small" in self.subtype
        cfgs = _SMALL if small else _LARGE
        x = ConvBNAct(16, 3, 2, act="hardswish", bn_momentum=0.99,
                      bn_eps=1e-3, name="stem")(x, train)
        feats = []
        stride_now = 2
        # emit features at the last block of each stride scale 8/16/32
        for i, (k, e, c, se, act, s) in enumerate(cfgs):
            stride_now *= s
            x = Bneck(k, e, c, se, act, s, name=f"block{i}")(x, train)
            nxt = cfgs[i + 1][5] if i + 1 < len(cfgs) else 2
            if not self.classifier and nxt == 2 and stride_now in (8, 16, 32):
                feats.append(x)
        last_ch = 576 if small else 960
        if self.classifier:
            x = ConvBNAct(last_ch, 1, act="hardswish", bn_momentum=0.99,
                          bn_eps=1e-3, name="head_conv")(x, train)
            x = jnp.mean(x, axis=(1, 2))
            x = nn.Dense(1024 if small else 1280, name="fc1")(x)
            x = nn.hard_swish(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            return nn.Dense(self.num_classes, name="fc2")(x)
        return tuple(feats)

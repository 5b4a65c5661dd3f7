"""MobileNetV3 small/large (reference: src/models/backbones/mobilenet_v3.py
wrapping torchvision; native Flax/NHWC — Howard et al., arXiv:1905.02244).

Stage semantics follow the reference wrapper's feature slicing
(mobilenet_v3.py:33-48,62-69): stem = torchvision features[0]; the blocks
are grouped into stages 1..5 (small) / 1..6 (large) at the wrapper's child
boundaries, so ``out_stages`` index into out_channels [16,16,24,40,48,96]
(small) / [16,16,24,40,80,112,160] (large).  The wrapper's init_weights
resets every BN to eps 1e-5 / torch momentum 0.1 (mobilenet_v3.py:88-90 —
always taken in a zero-egress world, pretrained weights don't exist), so
those are the BN constants here.  SE squeeze widths use torchvision's
make_divisible(expand//4, 8)."""
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
# reference wrapper stage boundaries, as block-index groups
_SMALL_STAGES = ((0,), (1, 2), (3, 4, 5), (6, 7), (8, 9, 10))
_LARGE_STAGES = ((0,), (1, 2), (3, 4, 5), (6, 7, 8, 9), (10, 11),
                 (12, 13, 14))

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)  # wrapper init_weights override


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
            h = ConvBNAct(self.expand_ch, 1, act=self.act, **_BN,
                          name="expand")(h, train)
        h = ConvBNAct(self.expand_ch, self.kernel, self.stride,
                      groups=self.expand_ch, act=self.act, **_BN,
                      name="dw")(h, train)
        if self.use_se:
            h = SqueezeExcite(gate="hsigmoid",
                              squeeze_ch=make_divisible(self.expand_ch // 4),
                              name="se")(h)
        h = ConvBNAct(self.out_ch, 1, act=None, **_BN, name="project")(h, train)
        if self.stride == 1 and in_ch == self.out_ch:
            return x + h
        return h


@BACKBONES.register(name="MobileNetV3", aliases=("mobilenet_v3",))
class MobileNetV3(nn.Module):
    subtype: str = "mobilenet_v3_large"
    out_stages: Sequence[int] = (3, 4, 5)
    classifier: bool = False
    num_classes: int = 1000
    dropout: float = 0.2
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        small = "small" in self.subtype
        cfgs = _SMALL if small else _LARGE
        stages = _SMALL_STAGES if small else _LARGE_STAGES
        x = ConvBNAct(16, 3, 2, act="hardswish", **_BN, name="stem")(x, train)
        feats = []
        for si, blocks in enumerate(stages, start=1):
            for i in blocks:
                k, e, c, se, act, s = cfgs[i]
                x = Bneck(k, e, c, se, act, s, name=f"block{i}")(x, train)
            if si in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            last_ch = 576 if small else 960
            x = ConvBNAct(last_ch, 1, act="hardswish", **_BN,
                          name="head_conv")(x, train)
            x = jnp.mean(x, axis=(1, 2))
            x = nn.Dense(1024 if small else 1280, name="fc1")(x)
            x = nn.hard_swish(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            return nn.Dense(self.num_classes, name="fc2")(x)
        return tuple(feats)

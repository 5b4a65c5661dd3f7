"""EfficientNet B0-B7 (+Lite) (reference: src/models/backbones/efficientnet.py
wrapping torchvision; native Flax/NHWC — Tan & Le, arXiv:1905.11946).

torchvision numerics: BN eps 1e-5 (default BatchNorm2d — the TF-origin
1e-3 belongs to EfficientNetLite only), SE squeeze width
max(1, block_input_channels // 4) gated by sigmoid on SiLU."""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import ConvBNAct, DropPath, SqueezeExcite, make_divisible

# (expand, channels, repeats, stride, kernel)
_BASE = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]
# width_mult, depth_mult, dropout
_SCALING = {
    "efficientnet_b0": (1.0, 1.0, 0.2),
    "efficientnet_b1": (1.0, 1.1, 0.2),
    "efficientnet_b2": (1.1, 1.2, 0.3),
    "efficientnet_b3": (1.2, 1.4, 0.3),
    "efficientnet_b4": (1.4, 1.8, 0.4),
    "efficientnet_b5": (1.6, 2.2, 0.4),
    "efficientnet_b6": (1.8, 2.6, 0.5),
    "efficientnet_b7": (2.0, 3.1, 0.5),
    "efficientnet_lite0": (1.0, 1.0, 0.2),
}


class MBConv(nn.Module):
    out_channels: int
    expand: int
    kernel: int
    stride: int
    se: bool = True
    act: str = "silu"
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = x
        hidden = in_ch * self.expand
        if self.expand != 1:
            h = ConvBNAct(hidden, 1, act=self.act, bn_momentum=0.9,
                          bn_eps=1e-5, name="expand")(h, train)
        h = ConvBNAct(hidden, self.kernel, self.stride, groups=hidden,
                      act=self.act, bn_momentum=0.9, bn_eps=1e-5,
                      name="dw")(h, train)
        if self.se:
            h = SqueezeExcite(gate="sigmoid", act="silu",
                              squeeze_ch=max(1, in_ch // 4), name="se")(h)
        h = ConvBNAct(self.out_channels, 1, act=None, bn_momentum=0.9,
                      bn_eps=1e-5, name="project")(h, train)
        if self.stride == 1 and in_ch == self.out_channels:
            h = DropPath(self.drop_rate, name="drop")(h, train)
            return x + h
        return h


@BACKBONES.register(name="EfficientNet", aliases=("efficientnet",))
class EfficientNet(nn.Module):
    subtype: str = "efficientnet_b0"
    out_stages: Sequence[int] = (3, 5, 7)
    classifier: bool = False
    num_classes: int = 1000
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm, dm, dropout = _SCALING[self.subtype]
        lite = "lite" in self.subtype
        act = "relu6" if lite else "silu"
        ch = make_divisible(32 * wm)
        x = ConvBNAct(ch, 3, 2, act=act, bn_momentum=0.9, bn_eps=1e-5,
                      name="stem")(x, train)
        feats = []
        total_blocks = sum(math.ceil(r * dm) for _, _, r, _, _ in _BASE)
        bi = 0
        for gi, (e, c, r, s, k) in enumerate(_BASE, start=1):
            out_ch = make_divisible(c * wm)
            reps = math.ceil(r * dm) if not (lite and gi in (1, 7)) else r
            for j in range(reps):
                x = MBConv(out_ch, e, k, s if j == 0 else 1,
                           se=not lite, act=act,
                           drop_rate=0.2 * bi / max(total_blocks, 1),
                           name=f"stage{gi}_block{j}")(x, train)
                bi += 1
            if gi in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            head_ch = make_divisible(1280 * wm) if not lite else 1280
            x = ConvBNAct(head_ch, 1, act=act, bn_momentum=0.9, bn_eps=1e-5,
                          name="head_conv")(x, train)
            x = jnp.mean(x, axis=(1, 2))
            x = nn.Dropout(dropout, deterministic=not train)(x)
            return nn.Dense(self.num_classes, name="fc")(x)
        return tuple(feats)

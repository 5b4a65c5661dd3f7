"""MobileNetV2 backbone (reference: src/models/backbones/mobilenet_v2.py,
which wraps torchvision's pretrained model; here a native Flax/NHWC
implementation of the same architecture: Sandler et al., arXiv:1801.04381).

Usable either as a classifier (``classifier=True`` → logits) or a feature
extractor returning the stages named by ``out_stages`` (stride 4/8/16/32
feature maps), mirroring the reference backbone contract
(reference: backbones/__init__.py:60-135).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import ConvBNAct, make_divisible

# (expansion t, channels c, repeats n, stride s) — table 2 of the paper
_INVERTED_RESIDUAL_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]

# stage index (into the 7 blocks above) after which each stride scale ends
_STAGE_ENDS = {4: 1, 8: 2, 16: 4, 32: 6}  # stride → last block group idx


class InvertedResidual(nn.Module):
    out_channels: int
    stride: int
    expand_ratio: int
    bn_momentum: float = 0.9
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        hidden = int(round(in_ch * self.expand_ratio))
        use_res = self.stride == 1 and in_ch == self.out_channels
        y = x
        if self.expand_ratio != 1:
            y = ConvBNAct(hidden, 1, act="relu6",
                          bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                          name="expand")(y, train)
        y = ConvBNAct(hidden, 3, self.stride, groups=hidden, act="relu6",
                      bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                      name="dw")(y, train)
        y = ConvBNAct(self.out_channels, 1, act=None,
                      bn_momentum=self.bn_momentum, bn_eps=self.bn_eps,
                      name="project")(y, train)
        return x + y if use_res else y


@BACKBONES.register(name="MobileNetV2", aliases=("mobilenet_v2",))
class MobileNetV2(nn.Module):
    subtype: str = "mobilenet_v2"
    width_mult: float = 1.0
    out_stages: Sequence[int] = (3, 5, 7)   # block-group indices (1-based)
    classifier: bool = False
    num_classes: int = 1000
    dropout: float = 0.2
    pretrained: bool = False  # accepted for config compat; porting is separate

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm = self.width_mult
        ch = make_divisible(32 * wm)
        x = ConvBNAct(ch, 3, 2, act="relu6", bn_momentum=0.9, bn_eps=1e-5,
                      name="stem")(x, train)
        feats = []
        for gi, (t, c, n, s) in enumerate(_INVERTED_RESIDUAL_CFG, start=1):
            out_ch = make_divisible(c * wm)
            for bi in range(n):
                x = InvertedResidual(
                    out_ch, s if bi == 0 else 1, t,
                    name=f"stage{gi}_block{bi}",
                )(x, train)
            if gi in self.out_stages and not self.classifier:
                feats.append(x)
        last_ch = make_divisible(1280 * max(wm, 1.0))
        if self.classifier:
            x = ConvBNAct(last_ch, 1, act="relu6", bn_momentum=0.9,
                          bn_eps=1e-5, name="head_conv")(x, train)
            x = jnp.mean(x, axis=(1, 2))
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            return nn.Dense(self.num_classes, name="fc")(x)
        return tuple(feats)

"""EfficientNet-Lite (reference: src/models/backbones/efficientnet_lite.py
— the NanoDet variant: MBConv without SE, ReLU6, fixed stem/head widths,
no width-scaling of stage 0 / depth-scaling of first & last stages).
"""
from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import ConvBNAct

# torch BN(momentum=0.01, eps=1e-3) → flax momentum 0.99
_BN = dict(bn_momentum=0.99, bn_eps=1e-3)

_PARAMS = {  # width_mult, depth_mult (reference :16-23)
    "efficientnet_lite0": (1.0, 1.0),
    "efficientnet_lite1": (1.0, 1.1),
    "efficientnet_lite2": (1.1, 1.2),
    "efficientnet_lite3": (1.2, 1.4),
    "efficientnet_lite4": (1.4, 1.8),
}

# repeat, kernel, stride, expand, in, out  (reference :147-156; SE unused)
_STAGES = (
    (1, 3, 1, 1, 32, 16),
    (2, 3, 2, 6, 16, 24),
    (2, 5, 2, 6, 24, 40),
    (3, 3, 2, 6, 40, 80),
    (3, 5, 1, 6, 80, 112),
    (4, 5, 2, 6, 112, 192),
    (1, 3, 1, 6, 192, 320),
)


def _round_filters(filters, mult, divisor=8):
    filters *= mult
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


class _MBConv(nn.Module):
    out_channels: int
    kernel: int
    stride: int
    expand: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        y = x
        if self.expand != 1:
            y = ConvBNAct(inp * self.expand, 1, act="relu6", **_BN,
                          name="expand")(y, train)
        y = ConvBNAct(inp * self.expand, self.kernel, self.stride,
                      groups=inp * self.expand, act="relu6", **_BN,
                      name="dw")(y, train)
        y = ConvBNAct(self.out_channels, 1, act=None, **_BN,
                      name="project")(y, train)
        if self.stride == 1 and inp == self.out_channels:
            y = x + y
        return y


@BACKBONES.register(name="EfficientNetLite", aliases=("efficientnet_lite",))
class EfficientNetLite(nn.Module):
    subtype: str = "efficientnet_lite0"
    out_stages: Sequence[int] = (2, 4, 6)    # stage indices 0-6
    classifier: bool = False
    num_classes: int = 1000
    output_stride: int = 32   # parity slot
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        wm, dm = _PARAMS[self.subtype]
        x = ConvBNAct(32, 3, 2, act="relu6", **_BN, name="stem")(x, train)
        feats = []
        n_stages = len(_STAGES)
        for i, (rep, k, s, e, cin, cout) in enumerate(_STAGES):
            cout = _round_filters(cout, wm)
            rep = rep if i in (0, n_stages - 1) else \
                int(math.ceil(rep * dm))
            for bi in range(rep):
                x = _MBConv(cout, k, s if bi == 0 else 1, e,
                            name=f"stage{i}_block{bi}")(x, train)
            if i in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            x = ConvBNAct(1280, 1, act="relu6", **_BN, name="head")(x, train)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(self.num_classes, name="fc")(x)
        return tuple(feats)

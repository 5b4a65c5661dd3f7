"""RegNet X/Y (arXiv:2003.13678; reference:
src/models/backbones/regnet.py:19-130, which wraps torchvision — here the
architecture is native).

Per-variant stage parameters are the torchvision-generated constants (the
reference's ``out_channels`` lists match these widths).  X blocks are
1×1 → grouped 3×3 → 1×1 bottlenecks (ratio 1); Y adds SE(¼ of the *input*
width) between the group conv and the projection.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import ConvBNAct

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)

# subtype: (depths, widths, group_width, se)
_SPECS = {
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


class _SE(nn.Module):
    squeeze_channels: int

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.relu(nn.Conv(self.squeeze_channels, (1, 1), name="fc1")(s))
        s = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1), name="fc2")(s))
        return x * s


class _YBlock(nn.Module):
    width: int
    stride: int
    group_width: int
    se_in: int | None   # input width // 4 when SE enabled, else None

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = max(self.width // self.group_width, 1)
        identity = x
        y = ConvBNAct(self.width, 1, act="relu", **_BN, name="a")(x, train)
        y = ConvBNAct(self.width, 3, self.stride, groups=groups, act="relu",
                      **_BN, name="b")(y, train)
        if self.se_in is not None:
            y = _SE(self.se_in, name="se")(y)
        y = ConvBNAct(self.width, 1, act=None, **_BN, name="c")(y, train)
        if self.stride != 1 or x.shape[-1] != self.width:
            identity = ConvBNAct(self.width, 1, self.stride, act=None, **_BN,
                                 name="proj")(x, train)
        return nn.relu(y + identity)


@BACKBONES.register(name="RegNet", aliases=("regnet",))
class RegNet(nn.Module):
    subtype: str = "regnet_y_400mf"
    out_stages: Sequence[int] = (2, 3, 4)
    classifier: bool = False
    num_classes: int = 1000
    output_stride: int = 32      # parity slot
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        depths, widths, gw, se = _SPECS[self.subtype]
        x = ConvBNAct(32, 3, 2, act="relu", **_BN, name="stem")(x, train)
        feats = []
        for si, (d, w) in enumerate(zip(depths, widths), start=1):
            for bi in range(d):
                # torchvision Y: SE squeeze = block input width // 4
                se_ch = max(x.shape[-1] // 4, 1) if se else None
                x = _YBlock(w, 2 if bi == 0 else 1, gw, se_ch,
                            name=f"stage{si}_block{bi}")(x, train)
            if si in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(self.num_classes, name="fc")(x)
        return tuple(feats)

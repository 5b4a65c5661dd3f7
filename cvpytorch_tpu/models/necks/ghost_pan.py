"""GhostPAN neck (reference: src/models/necks/ghost_pan.py:14-160 —
NanoDet-Plus's lightweight PAN with GhostNet blocks).

Structure: 1×1 reduce each level → top-down (upsample+concat+GhostBlocks)
→ bottom-up (stride-2 DW conv + concat + GhostBlocks) → optional extra
level.  LeakyReLU + BN like the reference default."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import NECKS
from ..bricks import ConvBNAct, DepthwiseSeparableConv

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)


class GhostModule(nn.Module):
    out_channels: int
    kernel_size: int = 1
    ratio: int = 2
    dw_size: int = 3
    act: str = "leaky_relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        init_ch = -(-self.out_channels // self.ratio)
        new_ch = init_ch * (self.ratio - 1)
        primary = ConvBNAct(init_ch, self.kernel_size, act=self.act, **_BN,
                            name="primary")(x, train)
        cheap = ConvBNAct(new_ch, self.dw_size, groups=init_ch, act=self.act,
                          **_BN, name="cheap")(primary, train)
        return jnp.concatenate([primary, cheap], -1)[..., :self.out_channels]


class GhostBottleneck(nn.Module):
    out_channels: int
    mid_channels: int | None = None
    kernel_size: int = 5
    stride: int = 1
    act: str = "leaky_relu"
    use_res: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.mid_channels or self.out_channels
        y = GhostModule(mid, act=self.act, name="ghost1")(x, train)
        if self.stride > 1:
            y = ConvBNAct(mid, self.kernel_size, self.stride, groups=mid,
                          act=None, **_BN, name="dw")(y, train)
        y = GhostModule(self.out_channels, act=None, name="ghost2")(y, train)
        if self.use_res and self.stride == 1 and x.shape[-1] == self.out_channels:
            return x + y
        return y


@NECKS.register(name="GhostPAN")
class GhostPAN(nn.Module):
    in_channels: Sequence[int] = (116, 232, 464)
    out_channels: int = 96
    kernel_size: int = 5
    num_blocks: int = 1
    num_extra_levels: int = 1
    use_depthwise: bool = True
    act: str = "leaky_relu"

    @nn.compact
    def __call__(self, feats, train: bool = False):
        n = len(feats)
        # reduce
        laterals = [
            ConvBNAct(self.out_channels, 1, act=self.act, **_BN,
                      name=f"reduce{i}")(f, train)
            for i, f in enumerate(feats)
        ]
        # top-down
        from .yolov5_neck import upsample2x

        inner = list(laterals)
        for i in range(n - 1, 0, -1):
            up = upsample2x(inner[i])
            cat = jnp.concatenate([up, inner[i - 1]], -1)
            for b in range(self.num_blocks):
                cat = GhostBottleneck(
                    self.out_channels,
                    act=self.act, kernel_size=self.kernel_size,
                    name=f"td{i}_{b}")(cat, train)
            inner[i - 1] = cat
        # bottom-up
        outs = [inner[0]]
        for i in range(n - 1):
            down = ConvBNAct(self.out_channels, self.kernel_size, 2,
                             groups=self.out_channels if self.use_depthwise else 1,
                             act=self.act, **_BN, name=f"down{i}")(outs[-1], train)
            cat = jnp.concatenate([down, inner[i + 1]], -1)
            for b in range(self.num_blocks):
                cat = GhostBottleneck(
                    self.out_channels, act=self.act,
                    kernel_size=self.kernel_size,
                    name=f"bu{i}_{b}")(cat, train)
            outs.append(cat)
        # extra levels
        for e in range(self.num_extra_levels):
            outs.append(
                ConvBNAct(self.out_channels, self.kernel_size, 2,
                          act=self.act, **_BN,
                          name=f"extra{e}")(outs[-1], train))
        return tuple(outs)

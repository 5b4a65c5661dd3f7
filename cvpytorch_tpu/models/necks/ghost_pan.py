"""GhostPAN neck (reference: src/models/necks/ghost_pan.py:14-222 —
NanoDet-Plus's lightweight PAN with GhostNet blocks).

Structure (exact reference semantics): 1×1 reduce each level →
top-down (×2 bilinear align-corners upsample + concat + GhostBottleneck
with its dw+pw shortcut) → bottom-up (depthwise-separable stride-2 down +
concat + GhostBottleneck) → extra level = dw-sep(down of last lateral) +
dw-sep(down of last output).  LeakyReLU + BN like the reference default.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import NECKS
from ..bricks import ConvBNAct, DepthwiseSeparableConv

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)


def _align_corners_matrix(out_n: int, in_n: int) -> jnp.ndarray:
    """(out, in) bilinear weights with torch align_corners=True."""
    if in_n == 1:
        return jnp.ones((out_n, 1), jnp.float32)
    pos = np.arange(out_n) * (in_n - 1) / (out_n - 1)
    i0 = np.clip(np.floor(pos).astype(int), 0, in_n - 1)
    i1 = np.clip(i0 + 1, 0, in_n - 1)
    f = (pos - i0).astype(np.float32)
    w = np.zeros((out_n, in_n), np.float32)
    np.add.at(w, (np.arange(out_n), i0), 1.0 - f)
    np.add.at(w, (np.arange(out_n), i1), f)
    return jnp.asarray(w)


def upsample2x_bilinear_ac(x):
    """×2 bilinear upsample, align_corners=True (reference ghost_pan.py:101
    nn.Upsample) — two MXU contractions, no gather."""
    B, H, W, C = x.shape
    wy = _align_corners_matrix(2 * H, H)
    wx = _align_corners_matrix(2 * W, W)
    y = jnp.einsum("oh,bhwc->bowc", wy, x)
    return jnp.einsum("pw,bowc->bopc", wx, y)


class GhostModule(nn.Module):
    """(reference: backbones/ghostnet.py:83-106)"""

    out_channels: int
    kernel_size: int = 1
    ratio: int = 2
    dw_size: int = 3
    act: str | None = "leaky_relu"

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
    """(reference: backbones/ghostnet.py:109-165) — ghost expand, optional
    stride-dw, ghost project, ALWAYS summed with the shortcut branch
    (identity when shapes allow, else dw+bn+pw+bn)."""

    out_channels: int
    mid_channels: int | None = None
    kernel_size: int = 5
    stride: int = 1
    act: str = "leaky_relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = self.mid_channels or self.out_channels
        y = GhostModule(mid, act=self.act, name="ghost1")(x, train)
        if self.stride > 1:
            y = ConvBNAct(mid, self.kernel_size, self.stride, groups=mid,
                          act=None, **_BN, name="dw")(y, train)
        y = GhostModule(self.out_channels, act=None, name="ghost2")(y, train)
        if in_ch == self.out_channels and self.stride == 1:
            return y + x
        s = ConvBNAct(in_ch, self.kernel_size, self.stride, groups=in_ch,
                      act=None, **_BN, name="sc_dw")(x, train)
        s = ConvBNAct(self.out_channels, 1, act=None, **_BN,
                      name="sc_pw")(s, train)
        return y + s


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
        ks = self.kernel_size

        def dwsep(x, name):
            return DepthwiseSeparableConv(
                self.out_channels, ks, 2, act=self.act, **_BN,
                name=name)(x, train)

        laterals = [
            ConvBNAct(self.out_channels, 1, act=self.act, **_BN,
                      name=f"reduce{i}")(f, train)
            for i, f in enumerate(feats)
        ]
        # top-down
        inner = list(laterals)
        for i in range(n - 1, 0, -1):
            up = upsample2x_bilinear_ac(inner[i])
            cat = jnp.concatenate([up, inner[i - 1]], -1)
            for b in range(self.num_blocks):
                cat = GhostBottleneck(
                    self.out_channels, kernel_size=ks, act=self.act,
                    name=f"td{i}_b{b}")(cat, train)
            inner[i - 1] = cat
        # bottom-up
        outs = [inner[0]]
        for i in range(n - 1):
            down = dwsep(outs[-1], f"down{i}")
            cat = jnp.concatenate([down, inner[i + 1]], -1)
            for b in range(self.num_blocks):
                cat = GhostBottleneck(
                    self.out_channels, kernel_size=ks, act=self.act,
                    name=f"bu{i}_b{b}")(cat, train)
            outs.append(cat)
        # extra levels: downsampled last LATERAL + downsampled last OUTPUT
        # (reference ghost_pan.py:219-220)
        for e in range(self.num_extra_levels):
            outs.append(dwsep(laterals[-1], f"extra_in{e}") +
                        dwsep(outs[-1], f"extra_out{e}"))
        return tuple(outs)

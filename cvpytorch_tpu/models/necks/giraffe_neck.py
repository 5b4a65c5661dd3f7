"""GiraffeNeck — GFPN "heavy neck" with log2-n skip + queen-move
cross-scale connections (reference: src/models/necks/giraffeneck.py:16-295;
GiraffeDet paper arXiv:2202.04256).

The reference builds the node graph dynamically from ``fpn_config``
(giraffeneck.py:233-241); under jit the graph is static anyway, so the 9
nodes are unrolled explicitly with the same topology:

    inputs:  0 = P3 (/8), 1 = P4 (/16), 2 = P5 (/32)
    node 3 (/32) ← [2, 1]          node 6 (/8)  ← [5, 4]
    node 4 (/16) ← [1, 3, 2, 0]    node 7 (/16) ← [4, 6, 3, 5]
    node 5 (/8)  ← [0, 4, 1]       node 8 (/32) ← [3, 7, 4]
    out 9 (/8) ← [6]   out 10 (/16) ← [7]   out 11 (/32) ← [8]

Each node concatenates its (resampled) inputs and merges with a CSP layer
(weight_method='concat', merge_type='csp', the defaults the AIRDet config
exercises).  Resampling: stride-2ᵏ max-pool down / nearest up
(ResampleFeatureMap, giraffeneck.py:68-89)."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import NECKS
from ..bricks import ConvBNAct

_BN = dict(bn_momentum=0.97, bn_eps=1e-3)  # reference init_weights :270-274


def _resample(x, ratio):
    """ratio > 1: downsample by max-pool k3 s=ratio; ratio < 1: nearest up."""
    if ratio > 1:
        r = int(ratio)
        return nn.max_pool(x, (3, 3), strides=(r, r), padding=((1, 1), (1, 1)))
    if ratio < 1:
        f = int(round(1 / ratio))
        return jnp.repeat(jnp.repeat(x, f, axis=1), f, axis=2)
    return x


class GiraffeBottleneck(nn.Module):
    """1×1 → 3×3 with optional shortcut (reference giraffeneck.py:16-37)."""

    out_channels: int
    shortcut: bool = True
    expansion: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        y = ConvBNAct(hidden, 1, act="silu", **_BN, name="conv1")(x, train)
        y = ConvBNAct(self.out_channels, 3, act="silu", **_BN,
                      name="conv2")(y, train)
        if self.shortcut and x.shape[-1] == self.out_channels:
            y = y + x
        return y


class GiraffeCSP(nn.Module):
    """CSPLayer / C3 merge (reference giraffeneck.py:40-65), n=2."""

    out_channels: int
    n: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.out_channels // 2
        x1 = ConvBNAct(hidden, 1, act="silu", **_BN, name="conv1")(x, train)
        x2 = ConvBNAct(hidden, 1, act="silu", **_BN, name="conv2")(x, train)
        for i in range(self.n):
            x1 = GiraffeBottleneck(hidden, name=f"m{i}")(x1, train)
        return ConvBNAct(self.out_channels, 1, act="silu", **_BN,
                         name="conv3")(jnp.concatenate([x1, x2], -1), train)


@NECKS.register(name="GiraffeNeck")
class GiraffeNeck(nn.Module):
    """3-level in → 3-level out GFPN (reference fpn_config topology)."""

    fpn_channels: Sequence[int] = (96, 160, 384)   # inner, per /8 /16 /32
    out_channels: Sequence[int] = (96, 160, 384)   # outer, per /8 /16 /32

    @nn.compact
    def __call__(self, feats, train: bool = False):
        p3, p4, p5 = feats  # /8, /16, /32
        fc, oc = self.fpn_channels, self.out_channels

        def node(name, out_ch, inputs, ratios):
            xs = [_resample(x, r) for x, r in zip(inputs, ratios)]
            cat = jnp.concatenate(xs, -1)
            return GiraffeCSP(out_ch, name=name)(cat, train)

        n3 = node("node3", fc[2], [p5, p4], [1, 2])              # /32
        n4 = node("node4", fc[1], [p4, n3, p5, p3],
                  [1, 0.5, 0.5, 2])                              # /16
        n5 = node("node5", fc[0], [p3, n4, p4], [1, 0.5, 0.5])   # /8
        n6 = node("node6", fc[0], [n5, n4], [1, 0.5])            # /8
        n7 = node("node7", fc[1], [n4, n6, n3, n5],
                  [1, 2, 0.5, 2])                                # /16
        n8 = node("node8", fc[2], [n3, n7, n4], [1, 2, 2])       # /32
        o9 = GiraffeCSP(oc[0], name="out9")(n6, train)           # /8
        o10 = GiraffeCSP(oc[1], name="out10")(n7, train)         # /16
        o11 = GiraffeCSP(oc[2], name="out11")(n8, train)         # /32
        return [o9, o10, o11]

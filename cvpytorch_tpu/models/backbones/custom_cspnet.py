"""CustomCspNet — the NanoDet-g backbone (reference:
src/models/backbones/custom_cspnet.py:19-108; CSPNet arXiv:1911.11929).

Plan (strides): Conv s2 → MaxPool s2 → CspBlock(32,1) → CspBlock(64,2,s2)
→ CspBlock(128,2,s2) → CspBlock(256,3,s2); every CspBlock doubles its
channel count by concatenating the residual branch with its input path.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import ConvBNAct

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)


class _TinyRes(nn.Module):
    """halve channels → conv → concat back (reference :19-37, 'concat')."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        half = x.shape[-1] // 2
        y = ConvBNAct(half, 3, act="leaky_relu", **_BN,
                      name="in_conv")(x, train)
        y1 = ConvBNAct(half, 3, act="leaky_relu", **_BN,
                       name="mid_conv")(y, train)
        return jnp.concatenate([y1, y], -1)


class _CspBlock(nn.Module):
    channels: int
    num_res: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.channels, 3, self.stride, act="leaky_relu",
                      **_BN, name="in_conv")(x, train)
        y = x
        for i in range(self.num_res):
            y = _TinyRes(name=f"res{i}")(y, train)
        y = ConvBNAct(self.channels, 3, act="leaky_relu", **_BN,
                      name="res_out")(y, train)
        return jnp.concatenate([y, x], -1)


@BACKBONES.register(name="CustomCspNet", aliases=("custom_cspnet",))
class CustomCspNet(nn.Module):
    subtype: str = "cspnet"
    out_stages: Sequence[int] = (3, 4, 5)   # stage list indices
    output_stride: int = 32   # parity slot
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        stages = [
            ("conv", 32, 2),
            ("pool", None, 2),
            ("csp", (32, 1), 1),
            ("csp", (64, 2), 2),
            ("csp", (128, 2), 2),
            ("csp", (256, 3), 2),
        ]
        out_idx = set(self.out_stages)
        feats = []
        for i, (kind, arg, s) in enumerate(stages):
            if kind == "conv":
                x = ConvBNAct(arg, 3, s, act="leaky_relu", **_BN,
                              name=f"stage{i}")(x, train)
            elif kind == "pool":
                x = nn.max_pool(x, (3, 3), strides=(s, s),
                                padding=((1, 1), (1, 1)))
            else:
                ch, n = arg
                x = _CspBlock(ch, n, s, name=f"stage{i}")(x, train)
            if i in out_idx:
                feats.append(x)
        return tuple(feats)

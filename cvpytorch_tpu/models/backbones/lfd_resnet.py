"""LFD ResNet-style backbone (reference: src/models/backbones/lfd_resnet.py
— FastBlock :11, FasterBlock :66, FastestBlock :111, LFDResNet :135).

The reference class is partially dead code (``_make_layer`` references
``self._body_architecture``/``self._block`` that are never defined, and the
4-entry ``block_num`` disagrees with the 5/6-entry channel lists), so this
follows the runnable intent of the LFD design: a stride-4 conv stem
followed by one residual stage per pyramid level, built from the light
Fast/Faster/Fastest residual blocks, yielding 5 levels at strides
8/16/32/64/128 to feed the 5-level FCOS machinery named by
conf/coco_lfd.yml (strides [8,16,32,64,128])."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import ConvBNAct

_BN = dict(bn_momentum=0.9, bn_eps=1e-5, act="relu")

SUBTYPES = {
    # block_mode, per-stage block counts, per-stage channels (5 stages)
    "lfd_xs": ("faster", (4, 2, 2, 3, 2), (32, 64, 64, 64, 64)),
    "lfd_s": ("faster", (4, 2, 2, 3, 2), (64, 64, 64, 64, 128)),
    "lfd_m": ("faster", (3, 2, 1, 1, 1), (64, 64, 64, 64, 128)),
    "lfd_l": ("fast", (4, 2, 2, 1, 1), (64, 64, 64, 64, 128)),
}


class FastBlock(nn.Module):
    """3×3 → 1×1 → 3×3 residual (reference lfd_resnet.py:11-53)."""

    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBNAct(self.out_channels, 3, self.stride, **_BN,
                      name="conv1")(x, train)
        y = ConvBNAct(self.out_channels, 1, **_BN, name="conv2")(y, train)
        y = ConvBNAct(self.out_channels, 3, act=None, bn_momentum=0.9,
                      bn_eps=1e-5, name="conv3")(y, train)
        if self.stride > 1 or x.shape[-1] != self.out_channels:
            identity = ConvBNAct(self.out_channels, 3, self.stride, act=None,
                                 bn_momentum=0.9, bn_eps=1e-5,
                                 name="down")(x, train)
        return nn.relu(y + identity)


class FasterBlock(nn.Module):
    """3×3 → 3×3 residual (reference lfd_resnet.py:66-109)."""

    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBNAct(self.out_channels, 3, self.stride, **_BN,
                      name="conv1")(x, train)
        y = ConvBNAct(self.out_channels, 3, act=None, bn_momentum=0.9,
                      bn_eps=1e-5, name="conv2")(y, train)
        if self.stride > 1 or x.shape[-1] != self.out_channels:
            identity = ConvBNAct(self.out_channels, 3, self.stride, act=None,
                                 bn_momentum=0.9, bn_eps=1e-5,
                                 name="down")(x, train)
        return nn.relu(y + identity)


class FastestBlock(nn.Module):
    """half-width 3×3 → 3×3 residual (reference lfd_resnet.py:111-133)."""

    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = ConvBNAct(self.out_channels // 2, 3, self.stride, **_BN,
                      name="conv1")(x, train)
        y = ConvBNAct(self.out_channels, 3, act=None, bn_momentum=0.9,
                      bn_eps=1e-5, name="conv2")(y, train)
        if self.stride > 1 or x.shape[-1] != self.out_channels:
            identity = ConvBNAct(self.out_channels, 3, self.stride, act=None,
                                 bn_momentum=0.9, bn_eps=1e-5,
                                 name="down")(x, train)
        return nn.relu(y + identity)


_BLOCKS = {"fast": FastBlock, "faster": FasterBlock, "fastest": FastestBlock}


@BACKBONES.register(name="LFDResNet")
class LFDResNet(nn.Module):
    subtype: str = "lfd_s"
    out_stages: Sequence[int] = (0, 1, 2, 3, 4)

    @nn.compact
    def __call__(self, x, train: bool = False):
        mode, block_num, channels = SUBTYPES[self.subtype]
        block = _BLOCKS[mode]
        stem_ch = channels[0]
        # stride-4 stem: 3s2 → 1 → 3s2 → 1 (reference lfd_resnet.py:164-177)
        x = ConvBNAct(stem_ch, 3, 2, **_BN, use_bias=True, name="stem1")(x, train)
        x = ConvBNAct(stem_ch, 1, **_BN, use_bias=True, name="stem2")(x, train)
        x = ConvBNAct(stem_ch, 3, 2, **_BN, use_bias=True, name="stem3")(x, train)
        x = ConvBNAct(stem_ch, 1, **_BN, use_bias=True, name="stem4")(x, train)
        outs = []
        for i, (n, ch) in enumerate(zip(block_num, channels)):
            for j in range(n):
                x = block(ch, stride=2 if j == 0 else 1,
                          name=f"layer{i}_{j}")(x, train)
            if i in self.out_stages:
                outs.append(x)
        return outs

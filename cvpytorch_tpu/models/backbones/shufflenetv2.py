"""ShuffleNetV2 (reference: src/models/backbones/shufflenet_v2.py wrapping
torchvision; native Flax/NHWC — Ma et al., arXiv:1807.11164).

Also the NanoDet/NanoDet-Plus backbone (reference: nanodet_plus.py:17)."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import ConvBNAct

_STAGE_CH = {
    "shufflenetv2_x0.5": (24, 48, 96, 192, 1024),
    "shufflenetv2_x1.0": (24, 116, 232, 464, 1024),
    "shufflenetv2_x1.5": (24, 176, 352, 704, 1024),
    "shufflenetv2_x2.0": (24, 244, 488, 976, 2048),
}
_REPEATS = (4, 8, 4)


def channel_shuffle(x, groups: int = 2):
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(n, h, w, c)


class ShuffleUnit(nn.Module):
    out_channels: int
    stride: int = 1
    act: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        branch_ch = self.out_channels // 2
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            y2 = ConvBNAct(branch_ch, 1, act=self.act, bn_momentum=0.9,
                           bn_eps=1e-5, name="b2_pw1")(x2, train)
            y2 = ConvBNAct(branch_ch, 3, 1, groups=branch_ch, act=None,
                           bn_momentum=0.9, bn_eps=1e-5, name="b2_dw")(y2, train)
            y2 = ConvBNAct(branch_ch, 1, act=self.act, bn_momentum=0.9,
                           bn_eps=1e-5, name="b2_pw2")(y2, train)
            out = jnp.concatenate([x1, y2], axis=-1)
        else:
            in_ch = x.shape[-1]
            y1 = ConvBNAct(in_ch, 3, self.stride, groups=in_ch, act=None,
                           bn_momentum=0.9, bn_eps=1e-5, name="b1_dw")(x, train)
            y1 = ConvBNAct(branch_ch, 1, act=self.act, bn_momentum=0.9,
                           bn_eps=1e-5, name="b1_pw")(y1, train)
            y2 = ConvBNAct(branch_ch, 1, act=self.act, bn_momentum=0.9,
                           bn_eps=1e-5, name="b2_pw1")(x, train)
            y2 = ConvBNAct(branch_ch, 3, self.stride, groups=branch_ch,
                           act=None, bn_momentum=0.9, bn_eps=1e-5,
                           name="b2_dw")(y2, train)
            y2 = ConvBNAct(branch_ch, 1, act=self.act, bn_momentum=0.9,
                           bn_eps=1e-5, name="b2_pw2")(y2, train)
            out = jnp.concatenate([y1, y2], axis=-1)
        return channel_shuffle(out)


@BACKBONES.register(name="ShuffleNetV2", aliases=("shufflenetv2",))
class ShuffleNetV2(nn.Module):
    subtype: str = "shufflenetv2_x1.0"
    out_stages: Sequence[int] = (2, 3, 4)
    classifier: bool = False
    num_classes: int = 1000
    act: str = "relu"          # NanoDet uses LeakyReLU: act='leaky_relu'
    with_last_conv: bool = False
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        chs = _STAGE_CH[self.subtype]
        x = ConvBNAct(chs[0], 3, 2, act=self.act, bn_momentum=0.9,
                      bn_eps=1e-5, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for si, (reps, out_ch) in enumerate(zip(_REPEATS, chs[1:4]), start=2):
            for bi in range(reps):
                x = ShuffleUnit(out_ch, stride=2 if bi == 0 else 1,
                                act=self.act, name=f"stage{si}_unit{bi}")(x, train)
            if si == 4 and (self.with_last_conv or self.classifier):
                x = ConvBNAct(chs[4], 1, act=self.act, bn_momentum=0.9,
                              bn_eps=1e-5, name="last_conv")(x, train)
            if si in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(self.num_classes, name="fc")(x)
        return tuple(feats)

"""RepVGG (reference: src/models/backbones/repvgg.py and the RepVGGBlock in
src/models/modules/yolov6_modules.py:152 with deploy re-parameterization).

Train: 3×3 + 1×1 + identity(BN) branches summed; deploy: the three
branches fuse algebraically into one 3×3 conv (``fuse_repvgg_kernel``)."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..bricks import BatchNorm

from ...registry import BACKBONES

# layer indices (stage0=0, then blocks counted sequentially) that get
# grouped convs in the gN variants (reference repvgg.py:17-19)
_G_LAYERS = (2, 4, 6, 8, 10, 12, 14, 16, 18, 20, 22, 24, 26)

_SPECS = {  # num_blocks per stage, width multipliers, groups for _G_LAYERS
    "repvgg_a0": ((2, 4, 14, 1), (0.75, 0.75, 0.75, 2.5), 1),
    "repvgg_a1": ((2, 4, 14, 1), (1.0, 1.0, 1.0, 2.5), 1),
    "repvgg_a2": ((2, 4, 14, 1), (1.5, 1.5, 1.5, 2.75), 1),
    "repvgg_b0": ((4, 6, 16, 1), (1.0, 1.0, 1.0, 2.5), 1),
    "repvgg_b1": ((4, 6, 16, 1), (2.0, 2.0, 2.0, 4.0), 1),
    "repvgg_b1g2": ((4, 6, 16, 1), (2.0, 2.0, 2.0, 4.0), 2),
    "repvgg_b1g4": ((4, 6, 16, 1), (2.0, 2.0, 2.0, 4.0), 4),
    "repvgg_b2": ((4, 6, 16, 1), (2.5, 2.5, 2.5, 5.0), 1),
    "repvgg_b2g2": ((4, 6, 16, 1), (2.5, 2.5, 2.5, 5.0), 2),
    "repvgg_b2g4": ((4, 6, 16, 1), (2.5, 2.5, 2.5, 5.0), 4),
    "repvgg_b3": ((4, 6, 16, 1), (3.0, 3.0, 3.0, 5.0), 1),
    "repvgg_b3g2": ((4, 6, 16, 1), (3.0, 3.0, 3.0, 5.0), 2),
    "repvgg_b3g4": ((4, 6, 16, 1), (3.0, 3.0, 3.0, 5.0), 4),
}
_BASE = (64, 128, 256, 512)


class RepVGGBlock(nn.Module):
    out_channels: int
    stride: int = 1
    deploy: bool = False
    groups: int = 1
    bn_momentum: float = 0.9     # torch BN defaults; YOLOv6 inits use
    bn_eps: float = 1e-5         # momentum 0.03 / eps 1e-3 (repbipan.py:60)

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        if self.deploy:
            y = nn.Conv(self.out_channels, (3, 3), strides=self.stride,
                        padding=1, feature_group_count=self.groups,
                        name="reparam")(x)
            return nn.relu(y)
        bn = dict(use_running_average=not train, momentum=self.bn_momentum,
                  epsilon=self.bn_eps)
        y3 = nn.Conv(self.out_channels, (3, 3), strides=self.stride,
                     padding=1, use_bias=False,
                     feature_group_count=self.groups, name="conv3")(x)
        y3 = BatchNorm(**bn, name="bn3")(y3)
        y1 = nn.Conv(self.out_channels, (1, 1), strides=self.stride,
                     use_bias=False, feature_group_count=self.groups,
                     name="conv1")(x)
        y1 = BatchNorm(**bn, name="bn1")(y1)
        out = y3 + y1
        if self.stride == 1 and in_ch == self.out_channels:
            yid = BatchNorm(**bn, name="bnid")(x)
            out = out + yid
        return nn.relu(out)


def fuse_repvgg_kernel(params, batch_stats, in_ch, out_ch, has_identity,
                       eps: float = 1e-5):
    """Fuse 3×3/1×1/identity branches into one (3,3,in,out) kernel + bias
    (reference: yolov6_modules.py RepVGGBlock.switch_to_deploy).
    Pass eps=1e-3 for YOLOv6-family blocks (their BN uses 1e-3)."""
    def bn_fold(kernel, bn_p, bn_s):
        gamma, beta = bn_p["scale"], bn_p["bias"]
        mean, var = bn_s["mean"], bn_s["var"]
        std = np.sqrt(var + eps)
        k = kernel * (gamma / std)[None, None, None, :]
        b = beta - mean * gamma / std
        return k, b

    k3, b3 = bn_fold(np.asarray(params["conv3"]["kernel"]),
                     params["bn3"], batch_stats["bn3"])
    k1 = np.zeros_like(k3)
    k1[1:2, 1:2] = np.asarray(params["conv1"]["kernel"])
    k1, b1 = bn_fold(k1, params["bn1"], batch_stats["bn1"])
    k, b = k3 + k1, b3 + b1
    if has_identity:
        kid = np.zeros_like(k3)
        for c in range(in_ch):
            kid[1, 1, c, c] = 1.0
        kid, bid = bn_fold(kid, params["bnid"], batch_stats["bnid"])
        k, b = k + kid, b + bid
    return k, b


@BACKBONES.register(name="RepVGG", aliases=("repvgg",))
class RepVGG(nn.Module):
    subtype: str = "RepVGG-A0"
    out_stages: Sequence[int] = (2, 3, 4)
    classifier: bool = False
    num_classes: int = 1000
    deploy: bool = False
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        key = self.subtype.lower().replace("-", "_")
        blocks, widths, g = _SPECS[key]
        chs = [int(b * w) for b, w in zip(_BASE, widths)]
        # reference quirk (repvgg.py:167,184): `last_channel = 512` is
        # truthy, so stage4 is ALWAYS 512 channels — width_multiplier[3]
        # never applies upstream; replicated for weight-porting parity
        chs[3] = 512
        x = RepVGGBlock(min(64, chs[0]), 2, self.deploy, name="stem")(x, train)
        feats = []
        layer_idx = 1  # stem is layer 0 (reference cur_layer_idx=1)
        for si, (n, ch) in enumerate(zip(blocks, chs), start=1):
            for j in range(n):
                groups = g if (g > 1 and layer_idx in _G_LAYERS) else 1
                x = RepVGGBlock(ch, 2 if j == 0 else 1, self.deploy,
                                groups=groups,
                                name=f"stage{si}_block{j}")(x, train)
                layer_idx += 1
            if si in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(self.num_classes, name="fc")(x)
        return tuple(feats)

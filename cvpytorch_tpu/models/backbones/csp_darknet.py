"""YOLOv5 CSPDarknet backbone — native Flax/NHWC.

Architecture parity with the reference (reference:
src/models/backbones/det/yolov5_csp_darknet.py:17-91 and
src/models/modules/yolo_modules.py: CSPLayer :107, SPPF :165,
DarknetBottleneck :40): 6×6/2 stem, four (3×3/2 conv → C3) stages with
depth [3,6,9,3]·depth_mul and width [64,128,256,512,1024]·width_mul,
SPPF on the last stage, BN momentum 0.03 (torch) / eps 1e-3, SiLU.
Size table n/t/s/m/l/x matches yolov5_csp_darknet.py:18-23.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import ConvBNAct, make_divisible, make_round

SIZE_CFG = {  # subtype suffix → (depth_mul, width_mul)
    "n": (0.33, 0.25),
    "t": (0.33, 0.375),
    "s": (0.33, 0.5),
    "m": (0.67, 0.75),
    "l": (1.0, 1.0),
    "x": (1.33, 1.25),
}

_BN = dict(bn_momentum=0.97, bn_eps=1e-3)  # torch momentum 0.03


def space_to_depth2(x):
    """(B, H, W, C) → (B, H/2, W/2, 4C); channel = (2·dy + dx)·C + c."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


class DarknetBottleneck(nn.Module):
    out_channels: int
    shortcut: bool = True
    expansion: float = 1.0
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        y = ConvBNAct(hidden, 1, act=self.act, **_BN, name="conv1")(x, train)
        y = ConvBNAct(self.out_channels, 3, act=self.act, **_BN, name="conv2")(y, train)
        if self.shortcut and x.shape[-1] == self.out_channels:
            return x + y
        return y


class CSPLayer(nn.Module):
    """C3: CSP bottleneck with 3 convs (reference: yolo_modules.py:107)."""

    out_channels: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        x1 = ConvBNAct(hidden, 1, act=self.act, **_BN, name="conv1")(x, train)
        x2 = ConvBNAct(hidden, 1, act=self.act, **_BN, name="conv2")(x, train)
        for i in range(self.n):
            x1 = DarknetBottleneck(hidden, self.shortcut, 1.0, self.act,
                                   name=f"m{i}")(x1, train)
        y = jnp.concatenate([x1, x2], axis=-1)
        return ConvBNAct(self.out_channels, 1, act=self.act, **_BN,
                         name="conv3")(y, train)


class SPPF(nn.Module):
    """Serial 5×5 max-pool pyramid (reference: yolo_modules.py:165)."""

    out_channels: int
    kernel_size: int = 5
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvBNAct(hidden, 1, act=self.act, **_BN, name="conv1")(x, train)
        k = self.kernel_size
        pad = ((k // 2, k // 2), (k // 2, k // 2))
        pool = lambda t: nn.max_pool(t, (k, k), strides=(1, 1), padding=pad)
        y1 = pool(x)
        y2 = pool(y1)
        y3 = pool(y2)
        y = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBNAct(self.out_channels, 1, act=self.act, **_BN,
                         name="conv2")(y, train)


@BACKBONES.register(name="YOLOv5CSPDarknet", aliases=("cspdarknet",))
class YOLOv5CSPDarknet(nn.Module):
    subtype: str = "cspdark_s"
    out_channels: Sequence[int] = (64, 128, 256, 512, 1024)
    num_blocks: Sequence[int] = (3, 6, 9, 3)
    out_stages: Sequence[int] = (2, 3, 4)
    spp_ksize: int = 5
    act: str = "silu"
    depth_mul: float | None = None   # override; else from subtype
    width_mul: float | None = None
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dm, wm = SIZE_CFG[self.subtype.split("_")[-1]]
        dm = self.depth_mul if self.depth_mul is not None else dm
        wm = self.width_mul if self.width_mul is not None else wm
        chs = [make_divisible(c * wm) for c in self.out_channels]
        blocks = [make_round(n, dm) for n in self.num_blocks]

        # stem: the reference's 6×6/s2/p2 conv (yolov5_csp_darknet.py:36)
        # expressed as space-to-depth + 3×3/s1/p1 on 4× channels —
        # EXACTLY the same function under the kernel rearrangement
        # k3[a,b,(2dy+dx)C+c,o] = k6[2a+dy, 2b+dx, c, o]
        # (utils/porting.stem6_to_s2d_kernel).  Measured on the v5e at
        # bs128/640: 6.0 ms → 2.0 ms fwd+bwd — the 6×6 conv on a
        # 3-channel 640² map is MXU-hostile; the s2d form tiles cleanly.
        x = space_to_depth2(x)
        x = ConvBNAct(chs[0], 3, 1, padding=1, act=self.act, **_BN,
                      name="stem")(x, train)
        feats = []
        for i in range(4):  # stages 1..4, strides 4/8/16/32
            x = ConvBNAct(chs[i + 1], 3, 2, act=self.act, **_BN,
                          name=f"stage{i+1}_down")(x, train)
            x = CSPLayer(chs[i + 1], n=blocks[i], shortcut=(i != 3),
                         act=self.act, name=f"stage{i+1}_csp")(x, train)
            if i == 3:
                x = SPPF(chs[4], self.spp_ksize, act=self.act,
                         name="sppf")(x, train)
            if (i + 1) in self.out_stages:
                feats.append(x)
        return tuple(feats)

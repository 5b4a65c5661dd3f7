"""YOLOv5 PANet neck (reference: src/models/necks/det/yolov5_neck.py:15-62,
modules UpsamplingModule/DownsamplingModule yolo_modules.py:142-163).

Top-down: C5 →(1×1, up×2, concat C4, C3-block)→ P4' →(…, concat C3)→ P3;
bottom-up: P3 →(3×3/2, concat)→ P4 →(…)→ P5.  BN momentum 0.03/eps 1e-3,
SiLU — same as the backbone."""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...registry import NECKS
from ..backbones.csp_darknet import CSPLayer, SIZE_CFG
from ..bricks import ConvBNAct, make_round

_BN = dict(bn_momentum=0.97, bn_eps=1e-3)


def upsample2x(x):
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class UpsampleFuse(nn.Module):
    """1×1 reduce → nearest ×2 → concat skip → C3 (reference:
    yolo_modules.py:142 UpsamplingModule).  Returns (fused, reduced)."""

    out_channels: int
    n_blocks: int = 3

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        t = ConvBNAct(self.out_channels, 1, act="silu", **_BN,
                      name="reduce")(x, train)
        y = jnp.concatenate([upsample2x(t), skip], axis=-1)
        y = CSPLayer(self.out_channels, n=self.n_blocks, shortcut=False,
                     name="csp")(y, train)
        return y, t


class DownsampleFuse(nn.Module):
    """3×3/2 down → concat skip → C3 (reference: yolo_modules.py:155)."""

    out_channels: int
    n_blocks: int = 3

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        d = ConvBNAct(x.shape[-1], 3, 2, act="silu", **_BN,
                      name="down")(x, train)
        y = jnp.concatenate([d, skip], axis=-1)
        return CSPLayer(self.out_channels, n=self.n_blocks, shortcut=False,
                        name="csp")(y, train)


@NECKS.register(name="YOLOv5Neck")
class YOLOv5Neck(nn.Module):
    subtype: str = "yolov5_s"
    in_channels: Sequence[int] = (256, 512, 1024)
    num_blocks: Sequence[int] = (3, 3, 3, 3)
    depth_mul: float | None = None
    width_mul: float | None = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        dm, wm = SIZE_CFG[self.subtype.split("_")[-1]]
        dm = self.depth_mul if self.depth_mul is not None else dm
        wm = self.width_mul if self.width_mul is not None else wm
        chs = [max(round(c * wm), 1) for c in self.in_channels]
        blocks = [make_round(n, dm) for n in self.num_blocks]

        c3, c4, c5 = feats
        p4_up, t5 = UpsampleFuse(chs[1], blocks[0], name="up1")(c5, c4, train)
        p3, t4 = UpsampleFuse(chs[0], blocks[1], name="up2")(p4_up, c3, train)
        p4 = DownsampleFuse(chs[1], blocks[2], name="down1")(p3, t4, train)
        p5 = DownsampleFuse(chs[2], blocks[3], name="down2")(p4, t5, train)
        return (p3, p4, p5)

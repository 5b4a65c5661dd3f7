"""UNet semantic segmentation (reference: src/models/unet.py:91-165).

Architecture matches the reference exactly: DoubleConv stem (3→64),
four conv-then-pool DownConv stages (128/256/512/512), four UpConv stages
with bilinear align_corners=True ×2 upsampling (UpConv bilinear=True
default, unet.py:66-74) and skip concat, 1×1 outconv.  Loss =
per-class-weighted CE2d with optional dice/focal/lovasz extras chosen by
model_cfg LOSS.  The reference's hard-coded ``.cuda()`` weight tensors
(unet.py:112-117) are deliberately not replicated (SURVEY §7.4)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .bricks import BatchNorm

from ..config import dictionary_to_names_weights
from ..registry import MODELS
from .losses.seg_loss import build_seg_loss, cross_entropy_2d


def upsample2x_bilinear_align(x):
    """×2 bilinear upsample with torch align_corners=True semantics:
    out[i] maps to in position i·(H−1)/(2H−1)."""
    b, h, w, c = x.shape

    def axis_weights(n_in, n_out):
        pos = jnp.arange(n_out) * (n_in - 1) / max(n_out - 1, 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, n_in - 1)
        whi = pos - lo
        return lo, hi, whi.astype(x.dtype)

    lo_y, hi_y, wy = axis_weights(h, 2 * h)
    lo_x, hi_x, wx = axis_weights(w, 2 * w)
    top = x[:, lo_y] * (1 - wy)[None, :, None, None] + \
        x[:, hi_y] * wy[None, :, None, None]
    out = top[:, :, lo_x] * (1 - wx)[None, None, :, None] + \
        top[:, :, hi_x] * wx[None, None, :, None]
    return out


class DoubleConv(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.out_channels, (3, 3), padding=1,
                        name=f"conv{i}")(x)
            x = BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


@MODELS.register(name="UNet")
class UNet(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    base_channels: int = 64
    depth: int = 4  # reference fixed plan = depth 4 (unet.py:100-109)

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self._class_weights = tuple(weights)
        self.num_classes = len(names)
        b, d = self.base_channels, self.depth
        # generalizes the reference plan 64/128/256/512/512 → 256/128/64/64:
        # down_i = b·2^min(i, d−1), up_i mirrors with the last two equal
        self.conv = DoubleConv(b, name="conv")
        self.downs = [
            DoubleConv(b * 2 ** min(i, d - 1), name=f"down{i}")
            for i in range(1, d + 1)
        ]
        up_chs = [b * 2 ** max(d - 2 - i, 0) for i in range(d)]
        self.ups = [DoubleConv(c, name=f"up{i + 1}")
                    for i, c in enumerate(up_chs)]
        self.outconv = nn.Conv(self.num_classes, (1, 1), name="outconv")

        loss_cfg = (self.model_cfg.get("LOSS") if self.model_cfg else None) or {}
        extra = loss_cfg.get("EXTRA") if hasattr(loss_cfg, "get") else None
        self._extra_loss = build_seg_loss(extra) if extra else None

    def forward_logits(self, images, train: bool):
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))
        skips = [self.conv(images, train)]
        for down in self.downs:
            skips.append(pool(down(skips[-1], train)))
        xx = skips.pop()
        for up_block in self.ups:
            skip = skips.pop()
            x = upsample2x_bilinear_align(xx)
            # reference pads to the skip's size; with even inputs they match
            xx = up_block(jnp.concatenate([skip, x], axis=-1), train)
        return self.outconv(xx)

    def __call__(self, images, targets=None, mode: str = "infer"):
        logits = self.forward_logits(images, train=(mode == "train"))
        if mode == "infer":
            return jnp.argmax(logits, axis=-1)
        w = jnp.asarray(self._class_weights)
        ce = cross_entropy_2d(logits, targets, class_weights=w)
        losses = {"ce_loss": ce}
        total = ce
        if self._extra_loss is not None:
            e = self._extra_loss(logits, targets)
            losses["extra_loss"] = e
            total = total + e
        losses["loss"] = total
        if mode == "train":
            return total, losses
        return losses, jnp.argmax(logits, axis=-1)

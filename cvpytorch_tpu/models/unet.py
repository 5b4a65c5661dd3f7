"""UNet semantic segmentation (reference: src/models/unet.py:91-165).

Self-contained encoder/decoder; loss = per-class-weighted CE2d with
optional dice/focal/lovasz extras chosen by model_cfg LOSS.  The
reference's hard-coded ``.cuda()`` weight tensors (unet.py:112-117) are
deliberately not replicated (SURVEY §7.4)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import dictionary_to_names_weights
from ..registry import MODELS
from .losses.seg_loss import build_seg_loss, cross_entropy_2d


class DoubleConv(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(2):
            x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                        name=f"conv{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


@MODELS.register(name="UNet")
class UNet(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    base_channels: int = 64
    depth: int = 4

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self._class_weights = tuple(weights)
        self.num_classes = len(names)
        chs = [self.base_channels * (2 ** i) for i in range(self.depth + 1)]
        self.enc = [DoubleConv(c, name=f"enc{i}") for i, c in enumerate(chs)]
        self.dec = [DoubleConv(c, name=f"dec{i}")
                    for i, c in enumerate(reversed(chs[:-1]))]
        self.up = [nn.ConvTranspose(c, (2, 2), strides=(2, 2), name=f"up{i}")
                   for i, c in enumerate(reversed(chs[:-1]))]
        self.head = nn.Conv(self.num_classes, (1, 1), name="head")

        loss_cfg = (self.model_cfg.get("LOSS") if self.model_cfg else None) or {}
        extra = loss_cfg.get("EXTRA") if hasattr(loss_cfg, "get") else None
        self._extra_loss = build_seg_loss(extra) if extra else None

    def forward_logits(self, images, train: bool):
        x = images
        skips = []
        for i, enc in enumerate(self.enc):
            x = enc(x, train)
            if i < self.depth:
                skips.append(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        for up, dec, skip in zip(self.up, self.dec, reversed(skips)):
            x = up(x)
            x = jnp.concatenate([skip, x], axis=-1)
            x = dec(x, train)
        return self.head(x)

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

"""RFP — Recursive Feature Pyramid from DetectoRS (arXiv:2006.02334;
reference: src/models/necks/rfp.py:26-102).

FPN → feed ASPP-enriched pyramid levels back into the backbone's stages
(`rfp_feats`), rerun backbone+FPN, and fuse the two pyramids with a
learned per-pixel sigmoid gate.  The recursive backbone is owned by this
module (the reference builds a second backbone per step too,
rfp.py:75-79); its rfp injection convs are zero-initialised so step 0 is
exactly plain FPN.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import NECKS
from ..backbones import build_backbone
from .fcos_fpn import FPN


class ASPP(nn.Module):
    """DetectoRS ASPP: 3 dilated branches on x + a GAP branch, concat
    (reference rfp.py:22-66)."""

    out_channels: int = 64
    dilations: Sequence[int] = (1, 3, 6, 1)

    @nn.compact
    def __call__(self, x):
        gap = jnp.mean(x, axis=(1, 2), keepdims=True)
        outs = []
        for i, d in enumerate(self.dilations):
            k = 3 if d > 1 else 1
            inp = gap if i == len(self.dilations) - 1 else x
            y = nn.Conv(self.out_channels, (k, k), kernel_dilation=d,
                        padding=d if d > 1 else 0, name=f"aspp{i}")(inp)
            outs.append(nn.relu(y))
        outs[-1] = jnp.broadcast_to(outs[-1], outs[-2].shape)
        return jnp.concatenate(outs, -1)


@NECKS.register(name="RFP")
class RFP(nn.Module):
    rfp_steps: int = 2
    rfp_backbone: Any = None          # backbone cfg dict (ResNet family)
    aspp_out_channels: int = 64       # ×4 branches = FPN channels
    aspp_dilations: Sequence[int] = (1, 3, 6, 1)
    out_channels: int = 256
    num_outs: int = 5
    rfp_stages: Sequence[int] = (2, 3, 4)   # backbone stages fed rfp feats

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """``feats`` = (image, C3, C4, C5) — the reference's forward also
        carries the raw image first (rfp.py:89-92)."""
        img, *cs = feats
        fpn = FPN(self.out_channels, self.num_outs, name="fpn")
        out = list(fpn(tuple(cs), train))
        bb_cfg = dict(self.rfp_backbone.items()) if hasattr(
            self.rfp_backbone, "items") else (self.rfp_backbone or
                                              {"name": "ResNet",
                                               "subtype": "resnet50"})
        aspp = ASPP(self.aspp_out_channels, tuple(self.aspp_dilations),
                    name="rfp_aspp")
        for step in range(1, self.rfp_steps):
            rfp_feats = [out[0]] + [aspp(out[i]) for i in range(1, len(out))]
            bb = build_backbone(bb_cfg)  # flax auto-names per step
            cs2 = bb(img, train=train,
                     rfp_feats={s: rfp_feats[i] for i, s in
                                enumerate(self.rfp_stages)})
            out2 = fpn(tuple(cs2), train)
            fused = []
            for o_new, o_old in zip(out2, out):
                w = jax.nn.sigmoid(
                    nn.Conv(1, (1, 1), name=f"rfp_weight{step}_{len(fused)}",
                            kernel_init=nn.initializers.zeros)(o_new))
                fused.append(w * o_new + (1.0 - w) * o_old)
            out = fused
        return tuple(out)

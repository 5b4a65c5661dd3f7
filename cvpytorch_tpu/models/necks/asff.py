"""ASFF — adaptively spatial feature fusion neck
(reference: src/models/necks/asff.py; used by PAI-YOLOX,
reference pai_yolox.py:194)."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import NECKS
from ..bricks import ConvBNAct

_BN = dict(bn_momentum=0.97, bn_eps=1e-3)


def _resize_to(x, ref):
    return jax.image.resize(
        x, (x.shape[0], ref.shape[1], ref.shape[2], x.shape[3]), "nearest")


class ASFFBlock(nn.Module):
    """Fuse all levels into one target level with learned spatial weights."""

    channels: int

    @nn.compact
    def __call__(self, feats, target_idx: int, train: bool = False):
        ref = feats[target_idx]
        resized = []
        for i, f in enumerate(feats):
            y = ConvBNAct(self.channels, 1, act="silu", **_BN,
                          name=f"compress{i}")(f, train)
            resized.append(_resize_to(y, ref))
        ws = [ConvBNAct(8, 1, act="silu", **_BN,
                        name=f"w{i}")(r, train) for i, r in enumerate(resized)]
        attn = nn.Conv(len(feats), (1, 1), name="attn")(
            jnp.concatenate(ws, -1))
        attn = jax.nn.softmax(attn, -1)
        fused = sum(r * attn[..., i:i + 1] for i, r in enumerate(resized))
        return ConvBNAct(self.channels, 3, act="silu", **_BN,
                         name="expand")(fused, train)


@NECKS.register(name="ASFF")
class ASFF(nn.Module):
    channels: int = 128

    @nn.compact
    def __call__(self, feats, train: bool = False):
        return tuple(
            ASFFBlock(self.channels, name=f"asff{i}")(feats, i, train)
            for i in range(len(feats))
        )

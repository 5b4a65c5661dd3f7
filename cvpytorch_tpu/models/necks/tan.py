"""TAN — Transformer Attention Network neck (reference:
src/models/necks/tan.py:14-87 + modules/transformer.py:52-123; used by the
NanoDet-t config conf/ext/coco_nanodet_t.yml).

Three lateral 1×1 ConvBNLeaky projections; levels 0/2 are bilinear-resized
to the mid level and channel-concatenated; a small transformer encoder
(pre-LN MHA + MLP, learned positional embedding) runs over the mid-level
tokens; its output is added back to every lateral (resized per level).

TPU notes: tokens are (B, N, C) so the MHA lowers to batched matmuls on
the MXU; the positional embedding is bilinear-resized when the runtime
feature map differs from ``feature_hw`` (the reference would shape-error).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import NECKS
from ..bricks import ConvBNAct

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)


class TransformerEncoderLayer(nn.Module):
    """Pre-LN encoder (reference transformer.py:52-84).  ``mlp_act``
    follows the reference's configurable MLP activation (TAN passes
    'LeakyReLU', transformer default is GELU)."""

    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dropout_ratio: float = 0.0
    mlp_act: str = "gelu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        from ..bricks import get_activation

        y = nn.LayerNorm(name="norm1")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim,
            dropout_rate=self.dropout_ratio, deterministic=not train,
            name="attn")(y, y)
        x = x + y
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, name="fc1")(y)
        y = get_activation(self.mlp_act)(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + y


def _resize_bilinear(x, hw):
    # antialias=False matches torch F.interpolate(mode='bilinear'), which
    # never low-pass-filters on downsampling
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[3]), "bilinear",
        antialias=False)


@NECKS.register(name="TAN")
class TAN(nn.Module):
    out_channels: int = 128
    feature_hw: Sequence[int] = (20, 20)
    num_heads: int = 8
    num_encoders: int = 1
    mlp_ratio: int = 4
    dropout_ratio: float = 0.1
    in_channels: Sequence[int] | None = None   # parity slot (inferred)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == 3, "TAN expects exactly 3 input levels"
        laterals = [
            ConvBNAct(self.out_channels, 1, act="leaky_relu", **_BN,
                      name=f"lateral{i}")(f, train)
            for i, f in enumerate(feats)
        ]
        mid_hw = laterals[1].shape[1:3]
        mid = jnp.concatenate([
            _resize_bilinear(laterals[0], mid_hw),
            laterals[1],
            _resize_bilinear(laterals[2], mid_hw),
        ], -1)
        # TransformerBlock: ConvBNReLU 1×1 projection then encoders
        x = ConvBNAct(self.out_channels, 1, act="relu", **_BN,
                      name="tf_proj")(mid, train)
        b, h, w, c = x.shape
        fh, fw = self.feature_hw
        pos = self.param("pos_embed",
                         nn.initializers.truncated_normal(0.02),
                         (1, fh, fw, self.out_channels))
        if (fh, fw) != (h, w):
            pos = _resize_bilinear(pos, (h, w))
        tokens = (x + pos).reshape(b, h * w, c)
        for i in range(self.num_encoders):
            tokens = TransformerEncoderLayer(
                self.out_channels, self.num_heads, self.mlp_ratio,
                self.dropout_ratio, mlp_act="leaky_relu",
                name=f"encoder{i}")(tokens, train)
        mid_out = tokens.reshape(b, h, w, c)
        return (
            laterals[0] + _resize_bilinear(mid_out, laterals[0].shape[1:3]),
            laterals[1] + mid_out,
            laterals[2] + _resize_bilinear(mid_out, laterals[2].shape[1:3]),
        )

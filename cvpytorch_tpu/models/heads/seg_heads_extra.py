"""SegFormer + SegNeXt heads
(reference: src/models/heads/seg/segformer_head.py,
src/models/heads/seg/ham_head.py — LightHamHead with NMF 'Hamburger').

NMF runs a FIXED number of multiplicative-update iterations inside the
graph (lax-friendly; the reference's torch loop is also fixed-count)."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import HEADS
from ..bricks import ConvBNAct
from .seg_heads import resize_bilinear

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)


@HEADS.register(name="SegFormerHead")
class SegFormerHead(nn.Module):
    """All-MLP decoder: per-level linear proj → upsample → concat → fuse."""

    num_classes: int = 19
    channels: int = 256
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        size = feats[0].shape[1:3]
        outs = []
        for i, f in enumerate(feats):
            y = nn.Dense(self.channels, name=f"linear{i}")(f)
            outs.append(resize_bilinear(y, size))
        x = jnp.concatenate(outs[::-1], -1)
        x = ConvBNAct(self.channels, 1, act="relu", **_BN, name="fuse")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(x)


def nmf_attention(x, rank: int = 64, iters: int = 6, key=None):
    """2D NMF multiplicative updates (the reference Hamburger's core,
    ham_head.py).  x (B, N, C) nonnegative → low-rank reconstruction."""
    B, N, C = x.shape
    # deterministic init (uniform) — the reference samples once per forward
    d = jnp.ones((B, C, rank)) / rank
    s = jnp.ones((B, rank, N)) / rank
    xt = jnp.swapaxes(x, 1, 2)  # (B, C, N)

    def body(_, carry):
        d, s = carry
        # update s: s ∝ (dᵀx) / (dᵀd s)
        num = jnp.einsum("bcr,bcn->brn", d, xt)
        den = jnp.einsum("bcr,bcq->brq", d, d) @ s + 1e-6
        s = s * num / den
        num = jnp.einsum("bcn,brn->bcr", xt, s)
        den = d @ (s @ jnp.swapaxes(s, 1, 2)) + 1e-6
        d = d * num / den
        return d, s

    d, s = jax.lax.fori_loop(0, iters, body, (d, s))
    recon = jnp.einsum("bcr,brn->bcn", d, s)
    return jnp.swapaxes(recon, 1, 2)


@HEADS.register(name="LightHamHead")
class LightHamHead(nn.Module):
    """SegNeXt decoder (reference: heads/seg/ham_head.py)."""

    num_classes: int = 19
    channels: int = 256
    ham_channels: int = 256
    nmf_rank: int = 64
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        size = feats[0].shape[1:3]
        ups = [resize_bilinear(f, size) for f in feats]
        x = jnp.concatenate(ups, -1)
        x = ConvBNAct(self.ham_channels, 1, act="relu", **_BN,
                      name="squeeze")(x, train)
        B, H, W, C = x.shape
        t = nn.relu(x).reshape(B, H * W, C)
        ham = nmf_attention(t, rank=self.nmf_rank).reshape(B, H, W, C)
        x = nn.relu(x + ham)
        x = ConvBNAct(self.channels, 1, act="relu", **_BN,
                      name="align")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(x)

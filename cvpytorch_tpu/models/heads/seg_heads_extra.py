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


# ---------------------------------------------------------------- SFNet
# (reference: src/models/heads/seg/uper_align_head.py:15-181 — UPerNet with
# flow-aligned upsampling, "Semantic Flow for Fast and Accurate Scene
# Parsing" arXiv:2002.10120)

def grid_sample_bilinear(x, grid):
    """Bilinear sample NHWC ``x`` at ``grid`` (B,H,W,2) of normalized
    [-1,1] (x,y) coords, align_corners=True, border clamp.  The torch
    ``F.grid_sample`` equivalent, expressed as gathers (TPU-friendly:
    static shapes, vectorized gather)."""
    B, H, W, C = x.shape
    gx = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
    gy = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.clip(jnp.floor(gx), 0, W - 1)
    y0 = jnp.clip(jnp.floor(gy), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = gx - x0
    wy = gy - y0
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    def gather(yi, xi):
        flat = x.reshape(B, H * W, C)
        idx = yi * W + xi
        return jnp.take_along_axis(
            flat, idx.reshape(B, -1, 1), axis=1).reshape(yi.shape + (C,))

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    wx = wx[..., None]
    wy = wy[..., None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) +
            v10 * (1 - wx) * wy + v11 * wx * wy)


def _flow_warp(x, flow, size):
    """Warp ``x`` to ``size`` by a pixel-offset flow field (B,h,w,2)
    (reference uper_align_head.py:35-49)."""
    h, w = size
    B = x.shape[0]
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    grid = jnp.stack(jnp.meshgrid(xs, ys), -1)          # (h, w, 2) [x, y]
    norm = jnp.asarray([w, h], x.dtype)
    grid = grid[None] + flow / norm
    return grid_sample_bilinear(x, jnp.broadcast_to(grid, (B, h, w, 2)))


class AlignedModule(nn.Module):
    """Flow-aligned top-down fusion (reference uper_align_head.py:15-49)."""

    out_channels: int

    @nn.compact
    def __call__(self, low, high):
        size = low.shape[1:3]
        l_ = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                     name="down_l")(low)
        h_ = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                     name="down_h")(high)
        h_ = resize_bilinear(h_, size)
        flow = nn.Conv(2, (3, 3), padding=1, use_bias=False,
                       name="flow_make")(jnp.concatenate([h_, l_], -1))
        return _flow_warp(high, flow, size)


@HEADS.register(name="UperNetAlignHead", aliases=("SFNetHead",))
class UperNetAlignHead(nn.Module):
    """SFNet decoder: UPerHead whose top-down adds are flow-aligned."""

    num_classes: int = 19
    channels: int = 128
    bins: Sequence[int] = (1, 2, 3, 6)
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c5 = feats[-1]
        h, w = c5.shape[1:3]
        ppm = [c5]
        for i, s in enumerate(self.bins):
            p = jax.image.resize(c5, (c5.shape[0], s, s, c5.shape[-1]),
                                 "linear")
            p = ConvBNAct(self.channels, 1, act="relu", **_BN,
                          name=f"ppm{i}")(p, train)
            ppm.append(resize_bilinear(p, (h, w)))
        psp = ConvBNAct(self.channels, 3, act="relu", **_BN,
                        name="ppm_bottleneck")(
            jnp.concatenate(ppm, -1), train)

        laterals = [
            ConvBNAct(self.channels, 1, act="relu", **_BN,
                      name=f"lateral{i}")(f, train)
            for i, f in enumerate(feats[:-1])
        ] + [psp]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + AlignedModule(
                self.channels // 2, name=f"align{i - 1}")(
                laterals[i - 1], laterals[i])
        outs = [
            ConvBNAct(self.channels, 3, act="relu", **_BN,
                      name=f"fpn{i}")(laterals[i], train)
            for i in range(len(laterals) - 1)
        ] + [laterals[-1]]
        size = outs[0].shape[1:3]
        outs = [outs[0]] + [resize_bilinear(o, size) for o in outs[1:]]
        x = ConvBNAct(self.channels, 3, act="relu", **_BN,
                      name="fpn_bottleneck")(jnp.concatenate(outs, -1), train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(x)


@HEADS.register(name="UpConcatHead")
class UpConcatHead(nn.Module):
    """IncepFormer decoder: upsample-all → concat → 1×1 fuse
    (reference: src/models/heads/seg/up_concat_head.py:15-28)."""

    num_classes: int = 19
    channels: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, train: bool = False):
        size = feats[0].shape[1:3]
        x = jnp.concatenate(
            [feats[0]] + [resize_bilinear(f, size) for f in feats[1:]], -1)
        x = ConvBNAct(self.channels, 1, act="relu", **_BN,
                      name="linear_fuse")(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), name="cls")(x)

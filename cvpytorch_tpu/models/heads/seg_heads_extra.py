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


def nmf2d(x_cn, bases, steps: int = 7):
    """NMF2D multiplicative updates (reference lightham_head.py:103-145).

    x_cn (B, D, N) nonnegative, bases (B, D, R) (the reference samples
    uniform[0,1) L2-normalized over D fresh each forward) → low-rank
    reconstruction (B, D, N).  coef init = softmax(xᵀ·bases) (inv_t=1),
    then ``steps`` multiplicative updates + one final coef update."""
    xt = jnp.swapaxes(x_cn, 1, 2)                        # (B, N, D)
    coef = jax.nn.softmax(xt @ bases, -1)                # (B, N, R)

    def upd_coef(coef, bases):
        num = xt @ bases
        den = coef @ (jnp.swapaxes(bases, 1, 2) @ bases)
        return coef * num / (den + 1e-6)

    def body(_, carry):
        bases, coef = carry
        coef = upd_coef(coef, bases)
        num = x_cn @ coef
        den = bases @ (jnp.swapaxes(coef, 1, 2) @ coef)
        bases = bases * num / (den + 1e-6)
        return bases, coef

    bases, coef = jax.lax.fori_loop(0, steps, body, (bases, coef))
    coef = upd_coef(coef, bases)
    return bases @ jnp.swapaxes(coef, 1, 2)              # (B, D, N)


def _default_bases(B, D, R):
    """Deterministic stand-in for the reference's fresh-per-forward
    torch.rand bases (lightham_head.py:110-116): uniform values from a
    fixed key, L2-normalized over D.  NMF converges from any positive
    init; a fixed draw keeps eval deterministic under jit."""
    b = jax.random.uniform(jax.random.PRNGKey(0), (B, D, R))
    return b / jnp.maximum(jnp.linalg.norm(b, axis=1, keepdims=True), 1e-12)


class Hamburger(nn.Module):
    """ham_in (1×1, no norm/act) → relu → NMF → ham_out (1×1 + GN) →
    relu(x + ·) (reference lightham_head.py:148-166)."""

    ham_channels: int
    nmf_rank: int = 64
    eval_steps: int = 7
    train_steps: int = 6

    @nn.compact
    def __call__(self, x, train: bool = False, bases=None):
        B, H, W, C = x.shape
        enjoy = nn.Conv(self.ham_channels, (1, 1), name="ham_in")(x)
        enjoy = nn.relu(enjoy)
        cn = enjoy.reshape(B, H * W, C).swapaxes(1, 2)   # (B, D=C, N)
        if bases is None:
            bases = _default_bases(B, C, self.nmf_rank)
        steps = self.train_steps if train else self.eval_steps
        cn = nmf2d(cn, bases, steps)
        enjoy = cn.swapaxes(1, 2).reshape(B, H, W, C)
        enjoy = nn.Conv(self.ham_channels, (1, 1), use_bias=False,
                        name="ham_out")(enjoy)
        enjoy = nn.GroupNorm(num_groups=32, name="ham_out_gn")(enjoy)
        return nn.relu(x + enjoy)


@HEADS.register(name="LightHamHead")
class LightHamHead(nn.Module):
    """SegNeXt decoder (reference: heads/seg/lightham_head.py:169-216):
    bilinear-upsample all levels to the FIRST level, concat, squeeze
    (1×1 + GN32 + ReLU), Hamburger NMF attention, align (1×1 + GN32 +
    ReLU), dropout + classifier."""

    num_classes: int = 19
    channels: int = 256
    ham_channels: int = 256
    nmf_rank: int = 64
    dropout: float = 0.1

    @nn.compact
    def __call__(self, feats, train: bool = False, bases=None):
        size = feats[0].shape[1:3]
        ups = [resize_bilinear(f, size) for f in feats]
        x = jnp.concatenate(ups, -1)
        x = nn.Conv(self.ham_channels, (1, 1), use_bias=False,
                    name="squeeze")(x)
        x = nn.relu(nn.GroupNorm(num_groups=32, name="squeeze_gn")(x))
        x = Hamburger(self.ham_channels, self.nmf_rank,
                      name="hamburger")(x, train, bases=bases)
        x = nn.Conv(self.channels, (1, 1), use_bias=False, name="align")(x)
        x = nn.relu(nn.GroupNorm(num_groups=32, name="align_gn")(x))
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

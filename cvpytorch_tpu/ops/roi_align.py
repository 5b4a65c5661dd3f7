"""ROIAlign — TPU-native replacement for torchvision's C++/CUDA
``MultiScaleRoIAlign`` (reference: faster_rcnn.py:54, maskrcnn.py:32;
SURVEY §2.9 row 2).

Implementation: bilinear 4-tap gather at the standard ROIAlign sampling
grid (2×2 samples per output bin, averaged), fully vectorized — XLA lowers
it to gathers; a Pallas kernel variant lives in ops/pallas/.  Multi-scale
(FPN) assignment follows the torchvision heuristic
k = floor(4 + log2(sqrt(area)/224)) clamped to available levels.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def roi_align(features, boxes, output_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2,
              aligned: bool = True):
    """features (H, W, C); boxes (N, 4) xyxy in image pixels.
    Returns (N, output_size, output_size, C)."""
    H, W, C = features.shape
    off = 0.5 if aligned else 0.0
    b = boxes * spatial_scale
    x1, y1, x2, y2 = b[:, 0] - off, b[:, 1] - off, b[:, 2] - off, b[:, 3] - off
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)
    n = sampling_ratio
    # sample grid: output_size bins × n samples per bin per axis
    gy = (jnp.arange(output_size * n) + 0.5) / n  # in bin units
    gx = gy
    ys = y1[:, None] + bh[:, None] * gy[None, :] / output_size  # (N, S)
    xs = x1[:, None] + bw[:, None] * gx[None, :] / output_size

    def bilinear(img, ys, xs):
        y0 = jnp.floor(ys)
        x0 = jnp.floor(xs)
        fy = ys - y0
        fx = xs - x0

        def tap(yy, xx):
            # per-axis validity: grid index i's y-bound and index j's x-bound
            # are independent (a ROI can exit the map on one axis only)
            inb_y = (yy >= 0) & (yy < H)
            inb_x = (xx >= 0) & (xx < W)
            yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
            xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
            v = img[yi[:, None], xi[None, :]]  # (S, S, C)
            m = (inb_y[:, None] & inb_x[None, :])[..., None]
            return jnp.where(m, v, 0.0)

        v00 = tap(y0, x0)
        v01 = tap(y0, x0 + 1)
        v10 = tap(y0 + 1, x0)
        v11 = tap(y0 + 1, x0 + 1)
        wy = fy[:, None, None]
        wx = fx[None, :, None]
        return (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                v10 * wy * (1 - wx) + v11 * wy * wx)

    def one_roi(ys_i, xs_i):
        sampled = bilinear(features, ys_i, xs_i)  # (S, S, C)
        S = output_size
        return sampled.reshape(S, n, S, n, C).mean((1, 3))

    return jax.vmap(one_roi)(ys, xs)


def batched_roi_align(features, boxes, box_batch_idx, output_size: int = 7,
                      spatial_scale: float = 1.0, sampling_ratio: int = 2,
                      aligned: bool = True):
    """features (B, H, W, C); boxes (N, 4); box_batch_idx (N,) image index.

    Gathers ONLY the 4 bilinear tap points per sample, with the batch
    index folded into a flat (B·H·W) row index — never a per-ROI copy of
    the feature map.  (The earlier ``features[box_batch_idx]`` form
    materialized an (N, H, W, C) intermediate: 44 GB at 800²/bs8/272-roi
    Mask R-CNN — caught by the r4 milestone bench.)  Numerics identical
    to :func:`roi_align` per ROI (same taps, masks and bin averaging)."""
    B, H, W, C = features.shape
    N = boxes.shape[0]
    off = 0.5 if aligned else 0.0
    b = boxes * spatial_scale
    x1, y1 = b[:, 0] - off, b[:, 1] - off
    bw = jnp.maximum(b[:, 2] - off - x1, 1e-6)
    bh = jnp.maximum(b[:, 3] - off - y1, 1e-6)
    n = sampling_ratio
    g = (jnp.arange(output_size * n) + 0.5) / n  # bin units
    ys = y1[:, None] + bh[:, None] * g[None, :] / output_size  # (N, S)
    xs = x1[:, None] + bw[:, None] * g[None, :] / output_size
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0

    flat = features.reshape(B * H * W, C)
    base = box_batch_idx.astype(jnp.int32) * (H * W)  # (N,)

    def tap(yy, xx):  # yy, xx (N, S)
        inb_y = (yy >= 0) & (yy < H)
        inb_x = (xx >= 0) & (xx < W)
        yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        fidx = base[:, None, None] + yi[:, :, None] * W + xi[:, None, :]
        v = flat[fidx]  # (N, S, S, C)
        m = (inb_y[:, :, None] & inb_x[:, None, :])[..., None]
        return jnp.where(m, v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    wy = fy[:, :, None, None]
    wx = fx[:, None, :, None]
    sampled = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
               v10 * wy * (1 - wx) + v11 * wy * wx)  # (N, S, S, C)
    S0 = output_size
    return sampled.reshape(N, S0, n, S0, n, C).mean((2, 4))


def crop_resize_separable(planes, boxes, output_size: int = 28,
                          sampling_ratio: int = 2, aligned: bool = True):
    """ROIAlign on single-channel planes as two MXU matmuls.

    planes (N, H, W) — one plane per box; boxes (N, 4) xyxy in plane px.
    Bilinear sampling is separable: out = avgpool(Wy @ plane @ Wxᵀ) where
    Wy[n, s, h] holds row-tap weights (zeroed out-of-bounds, matching
    :func:`roi_align`'s per-axis tap masks exactly).  Replaces the mask
    target crop's 6.8M-element scalar gathers — ~620 ms/step of the Mask
    R-CNN 800² trace (PERF.md r5) — with ~4 GFLOP of einsum.
    Numerically identical to ``vmap(roi_align)`` on (H, W, 1) features.
    """
    N, H, W = planes.shape
    off = 0.5 if aligned else 0.0
    x1, y1 = boxes[:, 0] - off, boxes[:, 1] - off
    bw = jnp.maximum(boxes[:, 2] - off - x1, 1e-6)
    bh = jnp.maximum(boxes[:, 3] - off - y1, 1e-6)
    n = sampling_ratio
    g = (jnp.arange(output_size * n) + 0.5) / n
    ys = y1[:, None] + bh[:, None] * g[None, :] / output_size  # (N, S)
    xs = x1[:, None] + bw[:, None] * g[None, :] / output_size

    def axis_weights(coord, size):
        c0 = jnp.floor(coord)
        f = coord - c0
        idx = jnp.arange(size, dtype=jnp.float32)[None, None, :]
        w0 = jnp.where((c0 >= 0) & (c0 < size), 1.0 - f, 0.0)
        w1 = jnp.where((c0 + 1 >= 0) & (c0 + 1 < size), f, 0.0)
        return (w0[..., None] * (idx == c0[..., None]) +
                w1[..., None] * (idx == c0[..., None] + 1))  # (N, S, size)

    wy = axis_weights(ys, H)
    wx = axis_weights(xs, W)
    sampled = jnp.einsum("nsh,nhw,ntw->nst", wy, planes, wx,
                         precision=jax.lax.Precision.HIGHEST)
    S0 = output_size
    return sampled.reshape(N, S0, n, S0, n).mean((2, 4))


def _fpn_level_assign(fpn_feats, boxes, canonical_level, canonical_size,
                      min_level):
    areas = jnp.clip((boxes[:, 2] - boxes[:, 0]) *
                     (boxes[:, 3] - boxes[:, 1]), 1e-6)
    k = jnp.floor(canonical_level +
                  jnp.log2(jnp.sqrt(areas) / canonical_size))
    return jnp.clip(k - min_level, 0, len(fpn_feats) - 1).astype(jnp.int32)


def multiscale_roi_align(fpn_feats, strides, boxes, box_batch_idx,
                         output_size: int = 7, canonical_level: int = 4,
                         canonical_size: float = 224.0, min_level: int = 2):
    """FPN level assignment (torchvision heuristic) + ROIAlign at the
    assigned level only, in ONE gather pass.

    fpn_feats: list of (B, Hi, Wi, C); strides parallel list.
    Fixed-shape trick: all levels are flattened into one (Σ B·Hi·Wi, C)
    row buffer and the ROI's level becomes part of its gather base offset
    (level start + image index · Hi·Wi); the sampling-grid math runs with
    per-ROI stride/H/W picked from tiny static tables.  Numerically
    identical to aligning on every level and one-hot selecting (the r3
    form, kept as :func:`_multiscale_roi_align_masked` for the
    equivalence test) but with 1× instead of L× the tap-gather traffic —
    the Mask R-CNN 800² step's largest HBM bucket (PERF.md r5).
    """
    import numpy as np

    B, _, _, C = fpn_feats[0].shape
    L = len(fpn_feats)
    k = _fpn_level_assign(fpn_feats, boxes, canonical_level, canonical_size,
                          min_level)

    Hs = np.array([f.shape[1] for f in fpn_feats])
    Ws = np.array([f.shape[2] for f in fpn_feats])
    starts = np.concatenate([[0], np.cumsum(B * Hs * Ws)[:-1]])
    flat = jnp.concatenate(
        [f.reshape(B * f.shape[1] * f.shape[2], C) for f in fpn_feats], 0)

    scale_t = jnp.asarray([1.0 / s for s in strides], jnp.float32)
    H = jnp.asarray(Hs)[k]          # (N,) per-ROI level height
    W = jnp.asarray(Ws)[k]
    base = (jnp.asarray(starts)[k] +
            box_batch_idx.astype(jnp.int32) * (jnp.asarray(Hs * Ws)[k]))

    off = 0.5  # aligned=True
    b = boxes * scale_t[k][:, None]
    x1, y1 = b[:, 0] - off, b[:, 1] - off
    bw = jnp.maximum(b[:, 2] - off - x1, 1e-6)
    bh = jnp.maximum(b[:, 3] - off - y1, 1e-6)
    n = 2  # sampling_ratio
    g = (jnp.arange(output_size * n) + 0.5) / n
    ys = y1[:, None] + bh[:, None] * g[None, :] / output_size  # (N, S)
    xs = x1[:, None] + bw[:, None] * g[None, :] / output_size
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    fy = ys - y0
    fx = xs - x0

    def tap(yy, xx):  # (N, S) each
        inb_y = (yy >= 0) & (yy < H[:, None])
        inb_x = (xx >= 0) & (xx < W[:, None])
        yi = jnp.clip(yy, 0, (H - 1)[:, None]).astype(jnp.int32)
        xi = jnp.clip(xx, 0, (W - 1)[:, None]).astype(jnp.int32)
        fidx = (base[:, None, None] + yi[:, :, None] * W[:, None, None] +
                xi[:, None, :])
        v = flat[fidx]  # (N, S, S, C)
        m = (inb_y[:, :, None] & inb_x[:, None, :])[..., None]
        return jnp.where(m, v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    wy = fy[:, :, None, None]
    wx = fx[:, None, :, None]
    sampled = (v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
               v10 * wy * (1 - wx) + v11 * wy * wx)
    S0 = output_size
    return sampled.reshape(-1, S0, n, S0, n, C).mean((2, 4))


def _multiscale_roi_align_masked(fpn_feats, strides, boxes, box_batch_idx,
                                 output_size: int = 7,
                                 canonical_level: int = 4,
                                 canonical_size: float = 224.0,
                                 min_level: int = 2):
    """r3 reference form: align on EVERY level, one-hot select.  Kept as
    the equivalence oracle for the single-gather path above."""
    k = _fpn_level_assign(fpn_feats, boxes, canonical_level, canonical_size,
                          min_level)
    outs = []
    for li, (feat, stride) in enumerate(zip(fpn_feats, strides)):
        aligned = batched_roi_align(feat, boxes, box_batch_idx, output_size,
                                    1.0 / stride)
        outs.append(jnp.where((k == li)[:, None, None, None], aligned, 0.0))
    return sum(outs)

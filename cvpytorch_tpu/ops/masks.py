"""Instance-mask pasting (reference: the pycocotools/torchvision
``paste_masks_in_image`` step of Mask R-CNN eval, maskrcnn.py:32 +
eval_coco.py segm type).

TPU-native formulation: pasting a (mh, mw) ROI mask into an (oh, ow)
canvas is a separable bilinear resample, so it is computed as two
einsums with per-detection interpolation-weight matrices — batched
matmuls on the MXU, fixed shapes, no scatter.
"""
from __future__ import annotations

import jax.numpy as jnp


def _axis_weights(centers, lo, hi, m):
    """(..., out) canvas-pixel centers → (..., out, m) bilinear weights
    into a ROI axis of ``m`` bins spanning [lo, hi]; zero outside."""
    t = (centers - lo[..., None]) / jnp.maximum(hi - lo, 1e-6)[..., None]
    inside = (t >= 0.0) & (t <= 1.0)
    mc = t * m - 0.5                            # mask-bin coordinate
    idx = jnp.arange(m, dtype=jnp.float32)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(mc[..., None] - idx))
    # replicate-pad the border half-bin so boxes' edges stay solid
    w = w.at[..., 0].add(jnp.maximum(0.0, -mc) * (mc > -1.0))
    w = w.at[..., m - 1].add(jnp.maximum(0.0, mc - (m - 1)) * (mc < m))
    return w * inside[..., None]


def paste_masks(masks, boxes, heights, widths, out_size: int = 112,
                threshold: float = 0.5):
    """masks (B, K, mh, mw) in [0,1]; boxes (B, K, 4) xyxy in image px;
    heights/widths (B,) image extents → (B, K, out, out) binary canvas
    covering each full image."""
    B, K, mh, mw = masks.shape
    oh = ow = out_size
    hs = heights.astype(jnp.float32)[:, None]
    ws = widths.astype(jnp.float32)[:, None]
    ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5)[None, None] * \
        (hs[..., None] / oh)                       # (B, 1, oh)
    xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5)[None, None] * \
        (ws[..., None] / ow)
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    wy = _axis_weights(ys, y1, y2, mh)              # (B, K, oh, mh)
    wx = _axis_weights(xs, x1, x2, mw)              # (B, K, ow, mw)
    canvas = jnp.einsum("bkom,bkmn->bkon", wy, masks)
    canvas = jnp.einsum("bkon,bkpn->bkop", canvas, wx)
    return (canvas >= threshold).astype(jnp.float32)

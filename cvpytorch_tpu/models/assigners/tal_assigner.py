"""Task-Aligned assigner — fixed-shape TPU reformulation
(reference: src/models/assigners/tal_assigner.py:16, used by YOLOv6).

Alignment metric m = s^α · IoU^β (α=1, β=6); candidates are priors whose
center is inside the gt; per gt the top-13 candidates by metric are
positive; a prior claimed by several gts keeps the max-IoU one.  Soft cls
targets are the metric normalized per-gt to its max IoU."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.boxes import box_iou_matrix

INF = 1e8


def _topk_mask(values, k, axis):
    """Boolean mask of the top-k entries along axis (static k)."""
    kth = jax.lax.top_k(jnp.moveaxis(values, axis, -1), k)[0][..., -1:]
    kth = jnp.moveaxis(kth, -1, axis)
    return values >= kth


def tal_assign(cls_scores, priors, decoded_boxes, gt_boxes, gt_labels,
               gt_valid, topk: int = 13, alpha: float = 1.0,
               beta: float = 6.0):
    """Single image.  cls_scores (P, C) sigmoid probs; priors (P, 4)
    cx,cy,s,s; others as in the DSL assigner.

    Returns matched_gt (P,), matched_iou (P,), align_metric (P,)."""
    P, C = cls_scores.shape
    cx, cy = priors[:, 0], priors[:, 1]
    inside = ((cx[:, None] > gt_boxes[None, :, 0]) &
              (cx[:, None] < gt_boxes[None, :, 2]) &
              (cy[:, None] > gt_boxes[None, :, 1]) &
              (cy[:, None] < gt_boxes[None, :, 3]))
    candidate = inside & gt_valid[None, :]

    ious = box_iou_matrix(decoded_boxes, gt_boxes)
    ious = jnp.where(candidate, ious, 0.0)
    cls_at_gt = jnp.take_along_axis(
        cls_scores, jnp.where(gt_valid, gt_labels, 0)[None, :].repeat(P, 0),
        axis=1)  # (P, M): score of each gt's class at each prior
    metric = (cls_at_gt ** alpha) * (ious ** beta)
    metric = jnp.where(candidate, metric, -1.0)

    k = min(topk, P)
    top_mask = _topk_mask(metric, k, axis=0) & candidate & (metric > 0)

    # conflict: prior in several gts → keep max IoU
    n_match = top_mask.sum(-1)
    best_gt = jnp.argmax(jnp.where(top_mask, ious, -1.0), axis=-1)
    keep = jnp.zeros_like(top_mask).at[jnp.arange(P), best_gt].set(True)
    matching = jnp.where((n_match > 1)[:, None], top_mask & keep, top_mask)

    fg = matching.any(-1)
    matched_gt = jnp.where(fg, jnp.argmax(matching, -1), -1)
    take = lambda t: jnp.take_along_axis(
        t, jnp.maximum(matched_gt, 0)[:, None], axis=1)[:, 0]
    matched_iou = jnp.where(fg, take(ious), 0.0)
    raw_metric = jnp.where(fg, take(metric), 0.0)

    # normalize: per gt, metric scaled so its max equals the gt's max IoU
    pos_metric = jnp.where(matching, metric, 0.0)
    per_gt_max_m = pos_metric.max(0)  # (M,)
    per_gt_max_iou = jnp.where(matching, ious, 0.0).max(0)
    norm = per_gt_max_iou / jnp.maximum(per_gt_max_m, 1e-9)
    align = raw_metric * jnp.where(fg, take(
        jnp.broadcast_to(norm[None, :], matching.shape)), 0.0)
    return {"matched_gt": matched_gt, "matched_iou": matched_iou,
            "align_metric": jnp.clip(align, 0.0, 1.0)}

"""ATSS assigner — fixed-shape TPU reformulation
(reference: src/models/assigners/atss_assigner.py:20, atss.py:19 — used by
YOLOv6's warmup phase and GFL-family heads).

Adaptive Training Sample Selection: per gt, take the top-k closest priors
(center distance) per level as candidates; the IoU threshold is
mean+std of the candidates' IoUs; positives are candidates above the
threshold whose center lies inside the gt.  All steps are masked
static-shape ops."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.boxes import box_iou_matrix
from .dsl_assigner import _ranks

INF = 1e8


def atss_assign(priors, num_level_priors, cand_boxes, gt_boxes,
                gt_labels, gt_valid, topk: int = 9,
                center_eps: float = 0.01, strict_thr: bool = False,
                dedup_unmasked: bool = False):
    """Single image.  priors (P,4) cx,cy,s,s; num_level_priors: static
    tuple of per-level prior counts (sums to P); cand_boxes (P,4) xyxy —
    the boxes IoU'd against gt for candidate thresholding (GFL passes the
    octave grid cells, gfl_head.py:471).

    Exact reference numerics (atss.py:126-150): the per-gt threshold is
    mean + SAMPLE std (torch .std(0), Bessel n−1) of the candidates'
    IoUs, and center-in-gt uses min(l,t,r,b) > 0.01.

    The YOLOv6-warmup flavor (reference atss_assigner.py:33-98,
    assigner_utils.py:33-53) differs in ``center_eps=1e-9``, a strict
    ``iou > thr`` comparison (``strict_thr=True``), and its multi-gt
    dedup (``select_highest_overlaps``): an anchor positive for several
    gts is reassigned by *unmasked* argmax over ALL gts' IoUs
    (``dedup_unmasked=True``) — the mmdet/GFL flavor restricts the argmax
    to the anchor's own positives.

    Returns matched_gt (P,) (−1 background) and matched_iou (P,)."""
    P = priors.shape[0]
    M = gt_boxes.shape[0]
    cx, cy = priors[:, 0], priors[:, 1]
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    dist = jnp.sqrt((cx[:, None] - gcx[None, :]) ** 2 +
                    (cy[:, None] - gcy[None, :]) ** 2)  # (P, M)

    ious = box_iou_matrix(cand_boxes, gt_boxes)

    # per-level top-k closest candidates
    candidate = jnp.zeros((P, M), bool)
    start = 0
    for n in num_level_priors:
        d = dist[start:start + n]
        k = min(topk, n)
        rank = _ranks(d, axis=0)
        candidate = candidate.at[start:start + n].set(rank < k)
        start += n
    candidate = candidate & gt_valid[None, :]

    k_cand = candidate.sum(0).astype(jnp.float32)          # (M,)
    cand_ious = jnp.where(candidate, ious, 0.0)
    mean = cand_ious.sum(0) / jnp.maximum(k_cand, 1.0)
    var = jnp.where(candidate, (ious - mean[None, :]) ** 2, 0.0).sum(0) \
        / jnp.maximum(k_cand - 1.0, 1.0)                   # Bessel, torch .std
    thr = mean + jnp.sqrt(var)

    l = cx[:, None] - gt_boxes[None, :, 0]
    t = cy[:, None] - gt_boxes[None, :, 1]
    r = gt_boxes[None, :, 2] - cx[:, None]
    b = gt_boxes[None, :, 3] - cy[:, None]
    inside = jnp.minimum(jnp.minimum(l, t), jnp.minimum(r, b)) > center_eps
    above = (ious > thr[None, :]) if strict_thr else (ious >= thr[None, :])
    pos = candidate & inside & above

    # prior claimed by several gts keeps the max-IoU one
    if dedup_unmasked:
        # reference assigner_utils.py:56-76: multi-positive anchors take
        # the unmasked argmax over every gt's IoU (invalid gts are zero
        # boxes with IoU 0, never the max of a multi-positive anchor)
        multi = pos.sum(-1) > 1
        best_gt = jnp.where(
            multi,
            jnp.argmax(jnp.where(gt_valid[None, :], ious, -1.0), axis=-1),
            jnp.argmax(jnp.where(pos, ious, -1.0), axis=-1))
    else:
        best_gt = jnp.argmax(jnp.where(pos, ious, -1.0), axis=-1)
    fg = pos.any(-1)
    matched_gt = jnp.where(fg, best_gt, -1)
    matched_iou = jnp.where(
        fg, jnp.take_along_axis(ious, jnp.maximum(matched_gt, 0)[:, None],
                                axis=1)[:, 0], 0.0)
    return {"matched_gt": matched_gt, "matched_iou": matched_iou}

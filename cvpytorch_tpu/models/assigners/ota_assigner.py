"""SimOTA assigner — fixed-shape TPU reformulation
(reference: src/models/assigners/ota_assigner.py:310-470, used by YOLOX).

Same masked static-shape machinery as the DSL assigner (SURVEY §7.3 calls
out SimOTA's data-dependent k as a hard part): candidates are priors whose
center lies inside the gt box OR within a ``center_radius``·stride window
of the gt center; cost = cls-BCE(sqrt(cls·obj) one-hot) + 3·(−log IoU) +
a large penalty for candidates outside BOTH regions; dynamic-k = clamp(Σ
top-10 IoU, 1); selection by cost rank < k; conflicts keep the min-cost gt.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ...ops.boxes import box_iou_matrix
from .dsl_assigner import _ranks

INF = 1e8


def simota_assign(cls_scores, obj_scores, priors, decoded_boxes, gt_boxes,
                  gt_labels, gt_valid, topk: int = 10,
                  center_radius: float = 2.5, soft_label: bool = False):
    """Single image.

    cls_scores (P, C) sigmoid probabilities; obj_scores (P,) sigmoid;
    priors (P, 4) = cx, cy, stride, stride; decoded_boxes (P, 4) xyxy;
    gt (M, ...) padded.  Returns matched_gt (P,) and matched_iou (P,).

    The reference ships TWO SimOTA cost variants:
    * ``soft_label=False`` — YOLOX's ``BCE(sqrt(cls·obj), onehot)``
      (det/yolox_loss.py:329-332);
    * ``soft_label=True`` — the mm-style assigner used by GFocalHeadV2:
      ``BCE(p, onehot·IoU) · |onehot·IoU − p|²``
      (assigners/ota_assigner.py:448-466).
    Both: valid priors are those inside ANY gt box or center window; the
    IoU/dynamic-k statistics are computed over those rows unmasked, and the
    in-box-AND-center region gets the cost bonus (ota_assigner.py:335).
    """
    P, C = cls_scores.shape
    cx, cy, s = priors[:, 0], priors[:, 1], priors[:, 2]

    in_box = ((cx[:, None] > gt_boxes[None, :, 0]) &
              (cx[:, None] < gt_boxes[None, :, 2]) &
              (cy[:, None] > gt_boxes[None, :, 1]) &
              (cy[:, None] < gt_boxes[None, :, 3]))
    gcx = (gt_boxes[:, 0] + gt_boxes[:, 2]) / 2
    gcy = (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2
    r = center_radius * s[:, None]
    in_center = ((jnp.abs(cx[:, None] - gcx[None, :]) < r) &
                 (jnp.abs(cy[:, None] - gcy[None, :]) < r))
    pair_ok = (in_box | in_center) & gt_valid[None, :]
    row_valid = pair_ok.any(-1)           # reference valid_mask
    strong = in_box & in_center           # cost bonus region (reference :335)

    ious = box_iou_matrix(decoded_boxes, gt_boxes)
    ious = ious * row_valid[:, None] * gt_valid[None, :]
    iou_cost = -jnp.log(ious + 1e-7)

    onehot = jax.nn.one_hot(jnp.where(gt_valid, gt_labels, 0), C)
    if soft_label:
        p = jnp.clip(cls_scores, 1e-7, 1 - 1e-7)[:, None, :]  # (P,1,C)
        soft = onehot[None, :, :] * ious[..., None]           # (P,M,C)
        bce = -(soft * jnp.log(p) + (1 - soft) * jnp.log1p(-p))
        cls_cost = (bce * jnp.abs(soft - p) ** 2.0).sum(-1)
    else:
        joint = jnp.sqrt(jnp.clip(cls_scores, 1e-8) *
                         jnp.clip(obj_scores, 1e-8)[:, None])  # (P, C)
        pred = joint[:, None, :]
        t = onehot[None, :, :]
        bce = -(t * jnp.log(pred + 1e-8) + (1 - t) * jnp.log(1 - pred + 1e-8))
        cls_cost = bce.sum(-1)

    cost = cls_cost + 3.0 * iou_cost + INF * (~strong).astype(jnp.float32)
    cost = jnp.where(row_valid[:, None] & gt_valid[None, :], cost, INF)

    k = min(topk, P)
    topk_ious = jax.lax.top_k(ious.T, k)[0]
    dynamic_ks = jnp.clip(topk_ious.sum(-1).astype(jnp.int32), 1, None)

    rank = _ranks(cost, axis=0)
    matching = (rank < dynamic_ks[None, :]) & row_valid[:, None] \
        & gt_valid[None, :]

    n_match = matching.sum(-1)
    best_gt = jnp.argmin(jnp.where(matching, cost, INF), axis=-1)
    keep = jnp.zeros_like(matching).at[jnp.arange(P), best_gt].set(True)
    matching = jnp.where((n_match > 1)[:, None], matching & keep, matching)

    fg = matching.any(-1)
    matched_gt = jnp.where(fg, jnp.argmax(matching, axis=-1), -1)
    matched_iou = jnp.where(
        fg, jnp.take_along_axis(ious, jnp.maximum(matched_gt, 0)[:, None],
                                axis=1)[:, 0], 0.0)
    return {"matched_gt": matched_gt, "matched_iou": matched_iou}

"""Dynamic Soft Label assigner — fixed-shape TPU reformulation
(reference: src/models/assigners/dsl_assigner.py:15-160).

The reference boolean-filters valid priors and loops gts with per-gt
``topk(k=dynamic_k)`` (dynamic shapes + host ``.item()``).  Here everything
is a masked (P, M) cost problem of static shape:

* candidate mask  = prior-center-inside-gt ∧ gt_valid
* cost            = soft-label cls cost + 3·(−log IoU), +INF off-candidates
* dynamic_k per gt = clamp(Σ top-13 IoU, 1) — computed with a static top-k
* per-gt selection = rank of cost along P < dynamic_k (rank via argsort)
* conflicts (prior matched to several gts) resolved by min-cost gt
Outputs per prior: matched gt index (−1 = background) and matched IoU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

INF = 1e8


def _ranks(x, axis):
    """rank of each element in ascending order along axis (0 = smallest)."""
    order = jnp.argsort(x, axis=axis)
    ranks = jnp.empty_like(order)
    idx = jnp.arange(x.shape[axis])
    if axis == 0:
        ranks = jnp.zeros_like(order).at[order, jnp.arange(x.shape[1])[None, :]].set(
            idx[:, None])
    else:
        ranks = jnp.zeros_like(order).at[
            jnp.arange(x.shape[0])[:, None], order].set(idx[None, :])
    return ranks


def dsl_assign(pred_scores, priors, decoded_boxes, gt_boxes, gt_labels,
               gt_valid, topk: int = 13, iou_factor: float = 3.0):
    """Single image.  pred_scores (P, C) LOGITS; priors (P, 4) cx,cy,sw,sh;
    decoded_boxes (P, 4) xyxy; gt_boxes (M, 4) xyxy; gt_labels (M,);
    gt_valid (M,) bool.

    Returns dict: matched_gt (P,) int (−1 background), matched_iou (P,).

    Reference semantics (dsl_assigner.py:53-160): valid rows are priors
    whose center lies inside ANY gt; IoU/cost are computed over those rows
    vs ALL gts unmasked (cross-gt assignment is allowed).  The caller
    passes ``cls_preds.sigmoid()`` yet the cost applies
    ``binary_cross_entropy_with_logits`` to it (nanodetplus_head.py:329,
    dsl_assigner.py:103-104) — that probabilities-as-logits quirk is
    reproduced exactly here (``x = sigmoid(logits)`` then BCE-with-logits
    over x).
    """
    from ...ops.boxes import box_iou_matrix

    P, C = pred_scores.shape
    M = gt_boxes.shape[0]

    center = priors[:, :2]
    lt = center[:, None, :] - gt_boxes[None, :, :2]
    rb = gt_boxes[None, :, 2:] - center[:, None, :]
    inside = jnp.concatenate([lt, rb], -1).min(-1) > 0  # (P, M)
    row_valid = (inside & gt_valid[None, :]).any(-1)    # (P,)

    ious = box_iou_matrix(decoded_boxes, gt_boxes)  # (P, M)
    ious = ious * row_valid[:, None] * gt_valid[None, :]
    iou_cost = -jnp.log(ious + 1e-7)

    onehot = jax.nn.one_hot(jnp.where(gt_valid, gt_labels, 0), C)  # (M, C)
    soft = onehot[None, :, :] * ious[..., None]  # (P, M, C)
    x = jax.nn.sigmoid(pred_scores)[:, None, :]  # probabilities-as-logits
    bce = jnp.maximum(x, 0) - x * soft + jnp.log1p(jnp.exp(-jnp.abs(x)))
    cls_cost = (bce * jnp.abs(soft - x) ** 2.0).sum(-1)  # (P, M)

    cost = cls_cost + iou_cost * iou_factor
    cost = jnp.where(row_valid[:, None] & gt_valid[None, :], cost, INF)

    # dynamic k per gt
    k = min(topk, P)
    topk_ious = jax.lax.top_k(ious.T, k)[0]  # (M, k)
    dynamic_ks = jnp.clip(topk_ious.sum(-1).astype(jnp.int32), 1, None)  # (M,)

    # per-gt: select the dynamic_k lowest-cost priors
    rank = _ranks(cost, axis=0)  # (P, M) rank along priors
    matching = (rank < dynamic_ks[None, :]) & row_valid[:, None] \
        & gt_valid[None, :]

    # conflict resolution: prior matched to >1 gt is REASSIGNED to the
    # min-cost gt over ALL gts — the reference zeroes the row then sets
    # cost.argmin(dim=1), which may pick a gt outside the original match
    # (dsl_assigner.py:148-152)
    n_match = matching.sum(-1)
    best_gt = jnp.argmin(cost, axis=-1)  # (P,) over all gts
    keep = jnp.zeros_like(matching).at[jnp.arange(P), best_gt].set(True)
    matching = jnp.where((n_match > 1)[:, None], keep, matching)

    fg = matching.any(-1)
    matched_gt = jnp.where(fg, jnp.argmax(matching, axis=-1), -1)
    matched_iou = jnp.where(
        fg, jnp.take_along_axis(ious, jnp.maximum(matched_gt, 0)[:, None],
                                axis=1)[:, 0], 0.0)
    return {"matched_gt": matched_gt, "matched_iou": matched_iou}


dsl_assign_batch = jax.vmap(
    dsl_assign, in_axes=(0, None, 0, 0, 0, 0, None, None), out_axes=0)

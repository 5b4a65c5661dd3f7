"""NanoDet-Plus GFL head — fixed-shape TPU implementation
(reference: src/models/heads/nanodetplus_head.py:54-462).

Per level: ``stacked_convs`` depthwise conv blocks → 1×1 conv emitting
``C + 4·(reg_max+1)`` channels.  Decode: Integral projection of the ltrb
distributions × stride around center priors ``(x·stride, y·stride)``
(reference :441-462,:217-218).  Loss: DSL assignment on detached
predictions, then QFL + GIoU + DFL with the sigma-weighted avg factors of
reference :246-293 (global batch sums replace the reference's
``reduce_mean`` cross-rank averaging)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.boxes import box_iou_matrix
from ...registry import HEADS
from ..assigners.dsl_assigner import dsl_assign
from ..bricks import ConvBNAct
from ..losses.gfl_loss import (
    distribution_focal_loss,
    giou_loss,
    integral_project,
    quality_focal_loss,
)

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)


@HEADS.register(name="NanoDetPlusHead")
class NanoDetPlusHead(nn.Module):
    num_classes: int = 80
    feat_channels: int = 96
    stacked_convs: int = 2
    kernel_size: int = 5
    strides: Sequence[int] = (8, 16, 32, 64)
    reg_max: int = 7
    act: str = "leaky_relu"

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """Returns flat (B, P_total, C + 4*(reg_max+1))."""
        outs = []
        no = self.num_classes + 4 * (self.reg_max + 1)
        for i, x in enumerate(feats):
            for s in range(self.stacked_convs):
                # reference DepthwiseConvModule (modules/convs.py:136):
                # depthwise k×k + BN + act, then pointwise 1×1 + BN + act
                in_ch = x.shape[-1]
                x = ConvBNAct(in_ch, self.kernel_size, groups=in_ch,
                              act=self.act, **_BN,
                              name=f"convs{i}_{s}_dw")(x, train)
                x = ConvBNAct(self.feat_channels, 1, act=self.act, **_BN,
                              name=f"convs{i}_{s}_pw")(x, train)
            y = nn.Conv(no, (1, 1), name=f"gfl_cls{i}")(x)
            b, h, w, _ = y.shape
            outs.append(y.reshape(b, h * w, no))
        return jnp.concatenate(outs, axis=1)


def center_priors(featmap_sizes, strides):
    """(P, 4): x·s, y·s, s, s (reference :441-462)."""
    priors = []
    for (h, w), s in zip(featmap_sizes, strides):
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) * s
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) * s
        p = jnp.stack([xs, ys, jnp.full_like(xs, s), jnp.full_like(xs, s)],
                      axis=-1)
        priors.append(p.reshape(-1, 4))
    return jnp.concatenate(priors, axis=0)


def decode_nanodet(preds, priors, num_classes, reg_max):
    """preds (B,P,no) → cls logits (B,P,C) + decoded boxes (B,P,4) xyxy."""
    cls_logits = preds[..., :num_classes]
    reg = preds[..., num_classes:].reshape(
        *preds.shape[:-1], 4, reg_max + 1)
    dist = integral_project(reg) * priors[None, :, 2, None]  # ltrb pixels
    cx, cy = priors[None, :, 0], priors[None, :, 1]
    boxes = jnp.stack([cx - dist[..., 0], cy - dist[..., 1],
                       cx + dist[..., 2], cy + dist[..., 3]], axis=-1)
    return cls_logits, boxes, reg


def center_priors_v1(featmap_sizes, strides):
    """v1 GFL priors: centers at (i + 0.5)·stride (reference
    gfl_head.py:614-631) — NanoDet-Plus drops the +0.5 (its
    get_single_level_center_priors uses i·stride); (P,4) cx,cy,s,s."""
    priors = []
    for (h, w), s in zip(featmap_sizes, strides):
        ys = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) * s
        xs = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) * s
        p = jnp.stack([xs, ys, jnp.full_like(xs, s), jnp.full_like(xs, s)],
                      axis=-1)
        priors.append(p.reshape(-1, 4))
    return jnp.concatenate(priors, axis=0)


def _aligned_iou(a, b):
    """Elementwise IoU of aligned xyxy boxes (..., 4)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(
        a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(
        b[..., 3] - b[..., 1], 0)
    return inter / jnp.maximum(area_a + area_b - inter, 1e-6)


def nanodet_v1_loss(preds, priors, targets, num_classes, reg_max,
                    num_level_priors, octave_base_scale: int = 5,
                    topk: int = 9):
    """NanoDet v1 GFL loss (reference gfl_head.py:264-385): ATSS
    assignment on octave grid cells (scale·stride squares around the
    +0.5 centers, gfl_head.py:633-650) instead of Plus's DSL, and the
    QFL quality target is the ALIGNED IoU of the decoded prediction vs
    its target box (gfl_head.py:352-356), not the assignment IoU.
    Weighting/normalization match gfl_head.py: QFL / num_pos, GIoU and
    DFL sigma-weighted by detached max-sigmoid scores / Σweights."""
    from ..assigners.atss_assigner import atss_assign

    cls_logits, decoded, reg = decode_nanodet(preds, priors, num_classes,
                                              reg_max)
    B, P, C = cls_logits.shape

    half = 0.5 * octave_base_scale * priors[:, 2]
    cells = jnp.stack([priors[:, 0] - half, priors[:, 1] - half,
                       priors[:, 0] + half, priors[:, 1] + half], axis=-1)
    assign = jax.vmap(
        lambda gb, gl, gv: atss_assign(
            priors, tuple(num_level_priors), cells, gb, gl, gv, topk)
    )(targets["boxes"], targets["labels"], targets["valid"])
    matched_gt = assign["matched_gt"]          # (B, P)

    pos = matched_gt >= 0
    safe_gt = jnp.maximum(matched_gt, 0)
    gt_boxes = jnp.take_along_axis(
        targets["boxes"], safe_gt[..., None], axis=1)  # (B,P,4)
    gt_labels = jnp.take_along_axis(targets["labels"], safe_gt, axis=1)

    labels = jnp.where(pos, gt_labels, num_classes)  # bg = C
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    score = jax.lax.stop_gradient(
        _aligned_iou(decoded, gt_boxes)) * pos   # (B,P)
    qfl = quality_focal_loss(
        cls_logits.reshape(-1, C), labels.reshape(-1), score.reshape(-1))
    loss_qfl = qfl.sum() / num_pos

    weight = jax.lax.stop_gradient(
        jax.nn.sigmoid(cls_logits).max(-1)) * pos  # (B,P)
    bbox_avg = jnp.maximum(weight.sum(), 1.0)
    l_giou = giou_loss(decoded.reshape(-1, 4), gt_boxes.reshape(-1, 4))
    loss_bbox = (l_giou * weight.reshape(-1) * 2.0).sum() / bbox_avg

    cx, cy, s = priors[None, :, 0], priors[None, :, 1], priors[None, :, 2]
    dist_t = jnp.stack([cx - gt_boxes[..., 0], cy - gt_boxes[..., 1],
                        gt_boxes[..., 2] - cx, gt_boxes[..., 3] - cy],
                       axis=-1) / s[..., None]
    dist_t = jnp.clip(dist_t, 0, reg_max - 0.1)
    dfl = distribution_focal_loss(
        reg.reshape(-1, reg_max + 1), dist_t.reshape(-1))
    w4 = jnp.repeat(weight.reshape(-1), 4)
    loss_dfl = (dfl * w4 * 0.25).sum() / (4.0 * bbox_avg)

    total = loss_qfl + loss_bbox + loss_dfl
    return total, {"qfl_loss": loss_qfl, "bbox_loss": loss_bbox,
                   "dfl_loss": loss_dfl}


def nanodet_loss(preds, priors, targets, num_classes, reg_max,
                 topk: int = 13, assign_preds=None):
    """Full GFL loss over a padded-target batch.

    ``assign_preds``: optional predictions to COMPUTE THE ASSIGNMENT from
    (the NanoDet-Plus aux-head training assist, reference
    nanodet_plus.py:93-100 — the stronger aux head's detached outputs
    drive matching for both heads)."""
    cls_logits, decoded, reg = decode_nanodet(preds, priors, num_classes,
                                              reg_max)
    B, P, C = cls_logits.shape

    a_cls, a_dec = cls_logits, decoded
    if assign_preds is not None:
        a_cls, a_dec, _ = decode_nanodet(assign_preds, priors, num_classes,
                                         reg_max)
    assign = jax.vmap(
        lambda sc, db, gb, gl, gv: dsl_assign(
            sc, priors, db, gb, gl, gv, topk, 3.0)
    )(jax.lax.stop_gradient(a_cls), jax.lax.stop_gradient(a_dec),
      targets["boxes"], targets["labels"], targets["valid"])
    matched_gt = assign["matched_gt"]          # (B, P)
    matched_iou = assign["matched_iou"]

    pos = matched_gt >= 0
    safe_gt = jnp.maximum(matched_gt, 0)
    gt_boxes = jnp.take_along_axis(
        targets["boxes"], safe_gt[..., None], axis=1)  # (B,P,4)
    gt_labels = jnp.take_along_axis(targets["labels"], safe_gt, axis=1)

    labels = jnp.where(pos, gt_labels, num_classes)  # bg = C
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    qfl = quality_focal_loss(
        cls_logits.reshape(-1, C), labels.reshape(-1),
        matched_iou.reshape(-1))
    loss_qfl = qfl.sum() / num_pos

    weight = jax.lax.stop_gradient(
        jax.nn.sigmoid(cls_logits).max(-1)) * pos  # (B,P)
    bbox_avg = jnp.maximum(weight.sum(), 1.0)
    l_giou = giou_loss(decoded.reshape(-1, 4), gt_boxes.reshape(-1, 4))
    loss_bbox = (l_giou * weight.reshape(-1) * 2.0).sum() / bbox_avg

    # DFL on ltrb distances / stride, clamped to reg_max − 0.1
    cx, cy, s = priors[None, :, 0], priors[None, :, 1], priors[None, :, 2]
    dist_t = jnp.stack([cx - gt_boxes[..., 0], cy - gt_boxes[..., 1],
                        gt_boxes[..., 2] - cx, gt_boxes[..., 3] - cy],
                       axis=-1) / s[..., None]
    dist_t = jnp.clip(dist_t, 0, reg_max - 0.1)
    dfl = distribution_focal_loss(
        reg.reshape(-1, reg_max + 1), dist_t.reshape(-1))
    w4 = jnp.repeat(weight.reshape(-1), 4)
    loss_dfl = (dfl * w4 * 0.25).sum() / (4.0 * bbox_avg)

    total = loss_qfl + loss_bbox + loss_dfl
    return total, {"qfl_loss": loss_qfl, "bbox_loss": loss_bbox,
                   "dfl_loss": loss_dfl}

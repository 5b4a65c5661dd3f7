"""GFocalHeadV2 (GFLv2) head + AIRDet loss
(reference: src/models/heads/gflv2_head.py:221-660).

GFLv2 adds the Distribution-Guided Quality Predictor: per-edge top-k (+
mean) statistics of the regression distribution feed a tiny conv net whose
sigmoid output scales the classification score (gflv2_head.py:387-414).
The head is therefore a *probability* head — ``cls_score = sigmoid(cls) ·
quality`` — and the QFL criterion runs in probability space
(use_sigmoid=False, gflv2_head.py:257).

Loss (gflv2_head.py:438-511): SimOTA assignment (center_radius 2.5,
cls 1.0 / iou 3.0) on the integral-decoded boxes, QFL(beta 2) normalized
by num_pos, GIoU (weight 2.0) and DFL (weight 0.25) weighted by the
detached max class probability.  All fixed-shape via the masked SimOTA
assigner (assigners/ota_assigner.py).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import HEADS
from ..assigners.ota_assigner import simota_assign
from ..bricks import ConvBNAct
from ..losses.gfl_loss import (
    distribution_focal_loss, giou_loss, integral_project,
)
from .nanodet_head import center_priors

_BN = dict(bn_momentum=0.97, bn_eps=1e-3)  # reference init_weights :327-331


class ScaleLayer(nn.Module):
    init: float = 1.0

    @nn.compact
    def __call__(self, x):
        return x * self.param("scale", lambda k: jnp.asarray(self.init))


@HEADS.register(name="GFocalHeadV2")
class GFocalHeadV2(nn.Module):
    num_classes: int = 80
    feat_channels: Sequence[int] = (96, 160, 384)  # per level (in == feat)
    stacked_convs: int = 4
    reg_max: int = 14
    reg_topk: int = 4
    reg_channels: int = 64
    add_mean: bool = True
    conv_groups: int = 2
    strides: Sequence[int] = (8, 16, 32)
    prior: float = 0.01

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """→ (cls_probs (B,P,C), reg_logits (B,P,4,reg_max+1)) flattened
        over all levels, plus priors (P,4)."""
        total_dim = self.reg_topk + (1 if self.add_mean else 0)
        cls_all, reg_all = [], []
        for i, x in enumerate(feats):
            ch = self.feat_channels[i]
            c = r = x
            for j in range(self.stacked_convs):
                c = ConvBNAct(ch, 3, groups=self.conv_groups, act="silu",
                              **_BN, name=f"cls{i}_{j}")(c, train)
                r = ConvBNAct(ch, 3, groups=self.conv_groups, act="silu",
                              **_BN, name=f"reg{i}_{j}")(r, train)
            bias_cls = -math.log((1 - self.prior) / self.prior)
            cls_logits = nn.Conv(
                self.num_classes, (3, 3), padding=1,
                bias_init=nn.initializers.constant(bias_cls),
                name=f"gfl_cls{i}")(c)
            reg_logits = ScaleLayer(name=f"scale{i}")(nn.Conv(
                4 * (self.reg_max + 1), (3, 3), padding=1,
                name=f"gfl_reg{i}")(r))
            B, H, W, _ = reg_logits.shape
            reg4 = reg_logits.reshape(B, H, W, 4, self.reg_max + 1)
            # DGQP: top-k (+mean) of the per-edge distribution → quality
            prob = jax.nn.softmax(reg4, axis=-1)
            topk = jax.lax.top_k(prob, self.reg_topk)[0]  # (B,H,W,4,topk)
            if self.add_mean:
                stat = jnp.concatenate(
                    [topk, topk.mean(-1, keepdims=True)], -1)
            else:
                stat = topk
            stat = stat.reshape(B, H, W, 4 * total_dim)
            q = nn.Conv(self.reg_channels, (1, 1),
                        name=f"reg_conf{i}_0")(stat)
            q = nn.relu(q)
            q = jax.nn.sigmoid(nn.Conv(1, (1, 1), name=f"reg_conf{i}_1")(q))
            cls_prob = jax.nn.sigmoid(cls_logits) * q
            cls_all.append(cls_prob.reshape(B, H * W, self.num_classes))
            reg_all.append(reg4.reshape(B, H * W, 4, self.reg_max + 1))
        priors = center_priors([f.shape[1:3] for f in feats], self.strides)
        return jnp.concatenate(cls_all, 1), jnp.concatenate(reg_all, 1), priors


def qfl_probability(probs, labels, scores, beta: float = 2.0):
    """QFL in probability space (use_sigmoid=False,
    reference general_focal_losses.py QualityFocalLoss)."""
    C = probs.shape[-1]
    p = jnp.clip(probs, 1e-6, 1 - 1e-6)
    pos = labels < C
    onehot = jax.nn.one_hot(jnp.where(pos, labels, 0), C) * pos[:, None]
    t = onehot * scores[:, None]
    bce = -(t * jnp.log(p) + (1 - t) * jnp.log1p(-p))
    mod = jnp.abs(t - p) ** beta
    return (bce * mod).sum(-1)


def gflv2_decode(cls_probs, reg_logits, priors):
    """→ decoded boxes (B,P,4) xyxy network pixels."""
    dist = integral_project(reg_logits) * priors[None, :, 2, None]
    cx, cy = priors[None, :, 0], priors[None, :, 1]
    return jnp.stack([cx - dist[..., 0], cy - dist[..., 1],
                      cx + dist[..., 2], cy + dist[..., 3]], -1)


def gflv2_loss(cls_probs, reg_logits, priors, targets, num_classes,
               reg_max):
    """(reference gflv2_head.py:438-511)."""
    decoded = gflv2_decode(cls_probs, reg_logits, priors)
    B, P, C = cls_probs.shape

    assign = jax.vmap(
        lambda sc, db, gb, gl, gv: simota_assign(
            sc, jnp.ones(P), priors, db, gb, gl, gv, topk=10,
            center_radius=2.5, soft_label=True)
    )(jax.lax.stop_gradient(cls_probs), jax.lax.stop_gradient(decoded),
      targets["boxes"], targets["labels"], targets["valid"])
    matched_gt = assign["matched_gt"]
    pos = matched_gt >= 0
    safe_gt = jnp.maximum(matched_gt, 0)
    gt_boxes = jnp.take_along_axis(targets["boxes"], safe_gt[..., None], 1)
    gt_labels = jnp.take_along_axis(targets["labels"], safe_gt, 1)
    labels = jnp.where(pos, gt_labels, num_classes)
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    # quality target = IoU of the decoded box with its gt
    from ...ops.boxes import bbox_iou
    iou_q = jnp.clip(bbox_iou(jax.lax.stop_gradient(decoded), gt_boxes), 0)

    loss_qfl = qfl_probability(
        cls_probs.reshape(-1, C), labels.reshape(-1),
        (iou_q * pos).reshape(-1)).sum() / num_pos

    weight = jax.lax.stop_gradient(cls_probs.max(-1)) * pos
    norm = jnp.maximum(weight.sum(), 1.0)
    l_giou = giou_loss(decoded.reshape(-1, 4), gt_boxes.reshape(-1, 4))
    loss_bbox = (l_giou * weight.reshape(-1) * 2.0).sum() / norm

    cx, cy, s = priors[None, :, 0], priors[None, :, 1], priors[None, :, 2]
    dist_t = jnp.stack([cx - gt_boxes[..., 0], cy - gt_boxes[..., 1],
                        gt_boxes[..., 2] - cx, gt_boxes[..., 3] - cy],
                       -1) / s[..., None]
    dist_t = jnp.clip(dist_t, 0, reg_max - 0.1)
    dfl = distribution_focal_loss(
        reg_logits.reshape(-1, reg_max + 1), dist_t.reshape(-1))
    w4 = jnp.repeat(weight.reshape(-1), 4)
    loss_dfl = (dfl * w4 * 0.25).sum() / (4.0 * norm)

    total = loss_qfl + loss_bbox + loss_dfl
    return total, {"qfl_loss": loss_qfl, "bbox_loss": loss_bbox,
                   "dfl_loss": loss_dfl}

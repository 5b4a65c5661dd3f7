"""FCOS head + loss — fixed-shape TPU implementation
(reference: src/models/heads/fcos_head.py, src/losses/fcos_loss.py:155-340,
src/models/detects/fcos_detect.py:34-155).

Head: shared 4-layer cls/reg towers (GN + ReLU), per-level learnable Scale
on the reg output, exp() decode; centerness branch on the reg tower;
prior-prob bias on the cls conv.

Targets (GenTargets, fcos_loss.py:155): the reference is already
tensorized over (batch, location, gt); the only fixed-shape change is
padded gts with a validity mask folded into ``mask_pos``."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.boxes import bbox_iou
from ...registry import HEADS

LIMIT_RANGES = ((-1, 64), (64, 128), (128, 256), (256, 512), (512, 999999))
STRIDES = (8, 16, 32, 64, 128)


class Scale(nn.Module):
    init: float = 1.0

    @nn.compact
    def __call__(self, x):
        # shape (1,) like the reference ScaleExp parameter
        s = self.param("scale", lambda k: jnp.full((1,), self.init))
        return x * s


@HEADS.register(name="FCOSHead")
class FCOSHead(nn.Module):
    num_classes: int = 80
    channels: int = 256
    stacked_convs: int = 4
    prior: float = 0.01
    cnt_on_reg: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = False):
        """Returns per-level (cls_logits, cnt_logits, reg_preds) NHWC."""
        import math

        cls_tower = [
            (nn.Conv(self.channels, (3, 3), padding=1, name=f"cls_conv{i}"),
             nn.GroupNorm(num_groups=32, epsilon=1e-5,
                          name=f"cls_gn{i}"))
            for i in range(self.stacked_convs)
        ]
        reg_tower = [
            (nn.Conv(self.channels, (3, 3), padding=1, name=f"reg_conv{i}"),
             nn.GroupNorm(num_groups=32, epsilon=1e-5,
                          name=f"reg_gn{i}"))
            for i in range(self.stacked_convs)
        ]
        cls_out = nn.Conv(
            self.num_classes, (3, 3), padding=1,
            bias_init=nn.initializers.constant(
                -math.log((1 - self.prior) / self.prior)),
            name="cls_out")
        cnt_out = nn.Conv(1, (3, 3), padding=1, name="cnt_out")
        reg_out = nn.Conv(4, (3, 3), padding=1, name="reg_out")
        scales = [Scale(name=f"scale{i}") for i in range(len(feats))]

        outs = []
        for i, x in enumerate(feats):
            c = x
            for conv, gn in cls_tower:
                c = nn.relu(gn(conv(c)))
            r = x
            for conv, gn in reg_tower:
                r = nn.relu(gn(conv(r)))
            cls_logits = cls_out(c)
            cnt_logits = cnt_out(r if self.cnt_on_reg else c)
            reg = jnp.exp(scales[i](reg_out(r)))
            outs.append((cls_logits, cnt_logits, reg))
        return outs


def level_coords(h, w, stride):
    """Location centers (reference coords_fmap2orig): (x+0.5)·s? The
    reference uses ``arange·s + s//2``."""
    ys = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)) * stride + stride // 2
    xs = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)) * stride + stride // 2
    return jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)  # (hw, 2)


def gen_fcos_targets(level_shapes, gt_boxes, gt_labels, gt_valid,
                     strides=STRIDES, limit_ranges=LIMIT_RANGES,
                     radius_ratio: float = 1.5):
    """Fixed-shape GenTargets (reference fcos_loss.py:194-282).

    gt_boxes (B,M,4) xyxy; returns concat over levels:
    cls_targets (B,L) int (−1 = background), cnt_targets (B,L),
    reg_targets (B,L,4), plus coords (L,2) and strides_per_loc (L,).
    """
    B, M, _ = gt_boxes.shape
    cls_all, cnt_all, reg_all, coords_all, stride_all = [], [], [], [], []
    for (h, w), stride, (lo, hi) in zip(level_shapes, strides, limit_ranges):
        coords = level_coords(h, w, stride)  # (hw, 2)
        x, y = coords[:, 0], coords[:, 1]
        l_off = x[None, :, None] - gt_boxes[:, None, :, 0]
        t_off = y[None, :, None] - gt_boxes[:, None, :, 1]
        r_off = gt_boxes[:, None, :, 2] - x[None, :, None]
        b_off = gt_boxes[:, None, :, 3] - y[None, :, None]
        ltrb = jnp.stack([l_off, t_off, r_off, b_off], -1)  # (B,hw,M,4)
        areas = (ltrb[..., 0] + ltrb[..., 2]) * (ltrb[..., 1] + ltrb[..., 3])
        in_box = ltrb.min(-1) > 0
        in_level = (ltrb.max(-1) > lo) & (ltrb.max(-1) <= hi)
        cxg = (gt_boxes[..., 0] + gt_boxes[..., 2]) / 2
        cyg = (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2
        c_off = jnp.maximum(
            jnp.maximum(jnp.abs(x[None, :, None] - cxg[:, None, :]),
                        jnp.abs(y[None, :, None] - cyg[:, None, :])), 0)
        in_center = c_off < stride * radius_ratio
        pos = in_box & in_level & in_center & gt_valid[:, None, :]

        masked_areas = jnp.where(pos, areas, 1e9)
        best = jnp.argmin(masked_areas, -1)  # (B,hw)
        any_pos = pos.any(-1)
        take = lambda t: jnp.take_along_axis(
            t, best[..., None, None] if t.ndim == 4 else best[..., None],
            axis=2)
        reg_t = jnp.take_along_axis(
            ltrb, best[..., None, None], axis=2)[:, :, 0, :]  # (B,hw,4)
        cls_t = jnp.take_along_axis(gt_labels[:, None, :].repeat(
            reg_t.shape[1], 1), best[..., None], axis=2)[..., 0]
        lr_min = jnp.minimum(reg_t[..., 0], reg_t[..., 2])
        lr_max = jnp.maximum(reg_t[..., 0], reg_t[..., 2])
        tb_min = jnp.minimum(reg_t[..., 1], reg_t[..., 3])
        tb_max = jnp.maximum(reg_t[..., 1], reg_t[..., 3])
        cnt_t = jnp.sqrt(jnp.clip(
            (lr_min * tb_min) / (lr_max * tb_max + 1e-10), 0, None))
        cls_all.append(jnp.where(any_pos, cls_t, -1))
        cnt_all.append(jnp.where(any_pos, cnt_t, -1.0))
        reg_all.append(jnp.where(any_pos[..., None], reg_t, -1.0))
        coords_all.append(coords)
        stride_all.append(jnp.full((coords.shape[0],), stride, jnp.float32))
    return (jnp.concatenate(cls_all, 1), jnp.concatenate(cnt_all, 1),
            jnp.concatenate(reg_all, 1), jnp.concatenate(coords_all, 0),
            jnp.concatenate(stride_all, 0))


def fcos_loss(outs, gt_boxes, gt_labels, gt_valid, num_classes):
    """Focal cls + BCE centerness + GIoU reg (reference fcos_loss.py:284-340)."""
    level_shapes = [c[0].shape[1:3] for c in outs]
    cls_t, cnt_t, reg_t, coords, _ = gen_fcos_targets(
        level_shapes, gt_boxes, gt_labels, gt_valid)
    B = gt_boxes.shape[0]
    cls_logits = jnp.concatenate(
        [o[0].reshape(B, -1, num_classes) for o in outs], 1)
    cnt_logits = jnp.concatenate([o[1].reshape(B, -1) for o in outs], 1)
    reg_preds = jnp.concatenate([o[2].reshape(B, -1, 4) for o in outs], 1)

    pos = cls_t >= 0
    # reference normalization: per-image num_pos, mean over the batch
    # (fcos_loss.py compute_*_loss: loss_i / num_pos_i then .mean())
    num_pos_i = jnp.maximum(pos.sum(-1).astype(jnp.float32), 1.0)  # (B,)

    # focal loss over all locations (alpha 0.25, gamma 2)
    onehot = jax.nn.one_hot(jnp.where(pos, cls_t, 0), num_classes) * \
        pos[..., None]
    p = jax.nn.sigmoid(cls_logits)
    alpha, gamma = 0.25, 2.0
    pt = jnp.where(onehot > 0, p, 1 - p)
    alpha_t = jnp.where(onehot > 0, alpha, 1 - alpha)
    bce = jnp.maximum(cls_logits, 0) - cls_logits * onehot + \
        jnp.log1p(jnp.exp(-jnp.abs(cls_logits)))
    focal = ((alpha_t * (1 - pt) ** gamma * bce).sum((1, 2))
             / num_pos_i).mean()

    # centerness BCE on positives
    cnt_bce = jnp.maximum(cnt_logits, 0) - cnt_logits * jnp.clip(cnt_t, 0) + \
        jnp.log1p(jnp.exp(-jnp.abs(cnt_logits)))
    cnt_loss = ((cnt_bce * pos).sum(-1) / num_pos_i).mean()

    # GIoU on positives, decoded from ltrb around coords
    # (reference compute_reg_loss mode='giou': plain sum over positives
    # per image / num_pos_i, not centerness-weighted)
    x, y = coords[None, :, 0], coords[None, :, 1]
    pb = jnp.stack([x - reg_preds[..., 0], y - reg_preds[..., 1],
                    x + reg_preds[..., 2], y + reg_preds[..., 3]], -1)
    tb = jnp.stack([x - reg_t[..., 0], y - reg_t[..., 1],
                    x + reg_t[..., 2], y + reg_t[..., 3]], -1)
    giou = 1.0 - bbox_iou(pb, tb, iou_type="giou")
    reg_loss = ((giou * pos).sum(-1) / num_pos_i).mean()

    total = focal + cnt_loss + reg_loss
    return total, {"cls_loss": focal, "cnt_loss": cnt_loss,
                   "reg_loss": reg_loss}


def decode_fcos(outs, num_classes):
    """→ boxes (B,L,4), scores (B,L), labels (B,L): score = sqrt(cls·cnt)
    (reference fcos_detect.py:34-107)."""
    B = outs[0][0].shape[0]
    level_shapes = [o[0].shape[1:3] for o in outs]
    coords, strides = [], []
    for (h, w), s in zip(level_shapes, STRIDES):
        coords.append(level_coords(h, w, s))
    coords = jnp.concatenate(coords, 0)
    cls_logits = jnp.concatenate(
        [o[0].reshape(B, -1, num_classes) for o in outs], 1)
    cnt_logits = jnp.concatenate([o[1].reshape(B, -1) for o in outs], 1)
    reg_preds = jnp.concatenate([o[2].reshape(B, -1, 4) for o in outs], 1)
    cls_p = jax.nn.sigmoid(cls_logits)
    cnt_p = jax.nn.sigmoid(cnt_logits)
    scores = jnp.sqrt(cls_p.max(-1) * cnt_p)
    labels = cls_p.argmax(-1)
    x, y = coords[None, :, 0], coords[None, :, 1]
    boxes = jnp.stack([x - reg_preds[..., 0], y - reg_preds[..., 1],
                       x + reg_preds[..., 2], y + reg_preds[..., 3]], -1)
    return boxes, scores, labels

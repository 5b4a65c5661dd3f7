"""RetinaNet (reference: src/models/retinanet.py:19 — a thin wrapper over
torchvision's retinanet; native here: ResNet+FPN P3-P7, 9 anchors/cell,
shared focal cls head + box head)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..ops.boxes import box_iou_matrix, clip_boxes, unletterbox_boxes
from ..ops.nms import batched_nms
from ..registry import MODELS
from .backbones import build_backbone
from .necks.fcos_fpn import FCOSFPN
from .rcnn import decode_deltas, encode_deltas, smooth_l1

STRIDES = (8, 16, 32, 64, 128)
SIZES = (32, 64, 128, 256, 512)
SCALES = (1.0, 2 ** (1 / 3), 2 ** (2 / 3))
ASPECTS = (0.5, 1.0, 2.0)


def retina_anchors(level_shapes):
    out = []
    for (h, w), s, size in zip(level_shapes, STRIDES, SIZES):
        cy = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) * s
        cx = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) * s
        centers = jnp.stack([cx, cy], -1).reshape(-1, 2)
        whs = []
        for sc in SCALES:
            for a in ASPECTS:
                aw = size * sc * (a ** 0.5)
                ah = size * sc / (a ** 0.5)
                whs.append((aw, ah))
        whs = jnp.asarray(whs)  # (9, 2)
        c = jnp.repeat(centers, 9, axis=0)
        wh = jnp.tile(whs, (centers.shape[0], 1))
        out.append(jnp.concatenate([c - wh / 2, c + wh / 2], -1))
    return jnp.concatenate(out, 0)


class RetinaHead(nn.Module):
    num_classes: int
    num_anchors: int = 9
    channels: int = 256

    @nn.compact
    def __call__(self, feats):
        import math

        cls_tower = [nn.Conv(self.channels, (3, 3), padding=1,
                             name=f"cls{i}") for i in range(4)]
        reg_tower = [nn.Conv(self.channels, (3, 3), padding=1,
                             name=f"reg{i}") for i in range(4)]
        cls_out = nn.Conv(self.num_anchors * self.num_classes, (3, 3),
                          padding=1,
                          bias_init=nn.initializers.constant(
                              -math.log((1 - 0.01) / 0.01)),
                          name="cls_out")
        reg_out = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                          name="reg_out")
        cls_all, reg_all = [], []
        for f in feats:
            c = f
            for conv in cls_tower:
                c = nn.relu(conv(c))
            r = f
            for conv in reg_tower:
                r = nn.relu(conv(r))
            B = f.shape[0]
            cls_all.append(cls_out(c).reshape(B, -1, self.num_classes))
            reg_all.append(reg_out(r).reshape(B, -1, 4))
        return jnp.concatenate(cls_all, 1), jnp.concatenate(reg_all, 1)


@MODELS.register(name="RetinaNet")
class RetinaNet(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    pos_iou: float = 0.5
    neg_iou: float = 0.4
    score_threshold: float = 0.05
    iou_threshold: float = 0.5
    max_det: int = 100

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        bb = get("BACKBONE") or {"name": "ResNet", "subtype": "resnet50",
                                 "out_stages": (2, 3, 4)}
        self.backbone = build_backbone(
            dict(bb.items()) if hasattr(bb, "items") else bb)
        self.fpn = FCOSFPN()
        self.head = RetinaHead(self.num_classes)

    def _forward(self, images, train: bool):
        feats = self.fpn(self.backbone(images, train=train), train=train)
        cls_logits, reg = self.head(feats)
        anchors = retina_anchors([f.shape[1:3] for f in feats])
        return cls_logits, reg, anchors

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        cls_logits, reg, anchors = self._forward(images, train=train)
        if mode == "infer":
            return self._predict(cls_logits, reg, anchors, images, None)

        gt, gl, gv = targets["boxes"], targets["labels"], targets["valid"]
        ious = jax.vmap(lambda g: box_iou_matrix(anchors, g))(gt)
        ious = jnp.where(gv[:, None, :], ious, 0.0)
        best_iou = ious.max(-1)
        best_gt = ious.argmax(-1)
        pos = best_iou >= self.pos_iou
        ignore = (best_iou > self.neg_iou) & ~pos
        n_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

        matched_labels = jnp.take_along_axis(gl, best_gt, axis=1)
        onehot = jax.nn.one_hot(matched_labels, self.num_classes) * \
            pos[..., None]
        p = jax.nn.sigmoid(cls_logits)
        alpha, gamma = 0.25, 2.0
        pt = jnp.where(onehot > 0, p, 1 - p)
        alpha_t = jnp.where(onehot > 0, alpha, 1 - alpha)
        bce = optax.sigmoid_binary_cross_entropy(cls_logits, onehot)
        focal = alpha_t * (1 - pt) ** gamma * bce
        cls_loss = (focal * (~ignore)[..., None]).sum() / n_pos

        matched = jnp.take_along_axis(gt, best_gt[..., None], axis=1)
        t_deltas = encode_deltas(matched, anchors[None])
        reg_loss = (smooth_l1(reg - t_deltas).sum(-1) * pos).sum() / n_pos

        total = cls_loss + reg_loss
        losses = {"cls_loss": cls_loss, "reg_loss": reg_loss, "loss": total}
        if mode == "train":
            return total, losses
        return losses, self._predict(cls_logits, reg, anchors, images,
                                     targets)

    def _predict(self, cls_logits, reg, anchors, images, targets):
        boxes = decode_deltas(reg, anchors[None])
        scores = jax.nn.sigmoid(cls_logits)
        best, labels = scores.max(-1), scores.argmax(-1)
        h, w = images.shape[1:3]
        boxes = clip_boxes(boxes, h, w)
        dets = batched_nms(boxes, best, labels, max_det=self.max_det,
                           iou_threshold=self.iou_threshold,
                           score_threshold=self.score_threshold)
        out_boxes = dets["boxes"]
        if targets is not None and "pads" in targets:
            out_boxes = unletterbox_boxes(
                out_boxes, targets["pads"][:, None, :],
                targets["scales"][:, None, :])
        return {**dets, "boxes": out_boxes}

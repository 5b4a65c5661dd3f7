"""YOLOv6 (reference: src/models/yolov6.py:110, backbones EfficientRep
(RepVGG blocks), neck RepBiPAN, head Effidehead, loss yolov6_loss.py:18 —
TAL assignment + VarifocalLoss + IoU(+DFL)).

The ATSS→TAL warmup switch (reference yolov6_loss.py warmup_epoch) is
simplified to TAL-from-start (the stable post-warmup configuration)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from ..ops.boxes import bbox_iou, clip_boxes, unletterbox_boxes
from ..ops.nms import batched_nms
from ..registry import MODELS
from .assigners.tal_assigner import tal_assign
from .backbones.csp_darknet import SIZE_CFG
from .backbones.repvgg import RepVGGBlock
from .bricks import ConvBNAct, make_divisible, make_round
from .heads.nanodet_head import center_priors

_BN = dict(bn_momentum=0.97, bn_eps=1e-3)
STRIDES = (8, 16, 32)


class EfficientRep(nn.Module):
    """(reference: backbones/det/yolov6_efficientrep.py)"""

    depth_mul: float = 0.33
    width_mul: float = 0.5
    out_channels: Sequence[int] = (64, 128, 256, 512, 1024)
    num_blocks: Sequence[int] = (6, 12, 18, 6)

    @nn.compact
    def __call__(self, x, train: bool = False):
        chs = [make_divisible(c * self.width_mul) for c in self.out_channels]
        blocks = [make_round(n, self.depth_mul) for n in self.num_blocks]
        x = RepVGGBlock(chs[0], 2, name="stem")(x, train)
        feats = []
        for i in range(4):
            x = RepVGGBlock(chs[i + 1], 2, name=f"stage{i+1}_down")(x, train)
            for j in range(blocks[i]):
                x = RepVGGBlock(chs[i + 1], 1,
                                name=f"stage{i+1}_block{j}")(x, train)
            if i == 3:  # SimSPPF
                from .backbones.csp_darknet import SPPF

                x = SPPF(chs[4], 5, act="relu", name="sppf")(x, train)
            if i + 1 >= 2:
                feats.append(x)
        return tuple(feats)


class RepPAN(nn.Module):
    """(reference: necks/det/yolov6_repbipan.py — simplified Rep-PAN)"""

    width_mul: float = 0.5
    depth_mul: float = 0.33

    @nn.compact
    def __call__(self, feats, train: bool = False):
        from .necks.yolov5_neck import upsample2x

        c3, c4, c5 = feats
        wm = self.width_mul
        n = make_round(4, self.depth_mul)

        def rep_blocks(x, ch, name):
            for j in range(n):
                x = RepVGGBlock(ch, 1, name=f"{name}_{j}")(x, train)
            return x

        ch4 = make_divisible(256 * wm)
        ch3 = make_divisible(128 * wm)
        t5 = ConvBNAct(ch4, 1, act="relu", **_BN, name="reduce5")(c5, train)
        p4 = rep_blocks(jnp.concatenate([upsample2x(t5), c4], -1), ch4, "td4")
        t4 = ConvBNAct(ch3, 1, act="relu", **_BN, name="reduce4")(p4, train)
        p3 = rep_blocks(jnp.concatenate([upsample2x(t4), c3], -1), ch3, "td3")
        d3 = ConvBNAct(ch3, 3, 2, act="relu", **_BN, name="down3")(p3, train)
        p4o = rep_blocks(jnp.concatenate([d3, t4], -1), ch4, "bu4")
        d4 = ConvBNAct(ch4, 3, 2, act="relu", **_BN, name="down4")(p4o, train)
        p5o = rep_blocks(jnp.concatenate([d4, t5], -1),
                         make_divisible(512 * wm), "bu5")
        return (p3, p4o, p5o)


class Effidehead(nn.Module):
    """Decoupled anchor-free head (reference: heads/det/yolov6_effidehead.py)."""

    num_classes: int

    @nn.compact
    def __call__(self, feats, train: bool = False):
        outs = []
        for i, x in enumerate(feats):
            ch = x.shape[-1]
            x = ConvBNAct(ch, 1, act="silu", **_BN, name=f"stem{i}")(x, train)
            c = ConvBNAct(ch, 3, act="silu", **_BN, name=f"cls_conv{i}")(x, train)
            r = ConvBNAct(ch, 3, act="silu", **_BN, name=f"reg_conv{i}")(x, train)
            import math

            cls = nn.Conv(self.num_classes, (1, 1),
                          bias_init=nn.initializers.constant(
                              -math.log((1 - 0.01) / 0.01)),
                          name=f"cls_out{i}")(c)
            reg = nn.Conv(4, (1, 1), name=f"reg_out{i}")(r)
            B, h, w, _ = cls.shape
            outs.append(jnp.concatenate([reg, cls], -1).reshape(B, h * w, -1))
        return jnp.concatenate(outs, 1)  # (B, P, 4+C)


def decode_yolov6(preds, priors):
    """ltrb distances (in stride units) around prior centers → xyxy
    (reference dist2bbox, yolov6_loss.py:205)."""
    d = jax.nn.relu(preds[..., :4]) * priors[None, :, 2:3]
    cx, cy = priors[None, :, 0], priors[None, :, 1]
    return jnp.stack([cx - d[..., 0], cy - d[..., 1],
                      cx + d[..., 2], cy + d[..., 3]], -1)


def varifocal_loss(logits, targets, labels_onehot, alpha=0.75, gamma=2.0):
    """(reference: yolov6_loss.py:237)"""
    p = jax.nn.sigmoid(logits)
    weight = alpha * (p ** gamma) * (1 - labels_onehot) + targets
    bce = optax.sigmoid_binary_cross_entropy(logits, targets)
    return bce * weight


def yolov6_loss(preds, priors, targets, num_classes):
    reg = preds[..., :4]
    cls_logits = preds[..., 4:]
    boxes = decode_yolov6(preds, priors)
    B, P = cls_logits.shape[:2]

    assign = jax.vmap(
        lambda cs, db, gb, gl, gv: tal_assign(cs, priors, db, gb, gl, gv)
    )(jax.lax.stop_gradient(jax.nn.sigmoid(cls_logits)),
      jax.lax.stop_gradient(boxes),
      targets["boxes"], targets["labels"], targets["valid"])
    matched_gt = assign["matched_gt"]
    align = assign["align_metric"]
    pos = matched_gt >= 0
    safe = jnp.maximum(matched_gt, 0)
    gt_boxes = jnp.take_along_axis(targets["boxes"], safe[..., None], axis=1)
    gt_labels = jnp.take_along_axis(targets["labels"], safe, axis=1)

    onehot = jax.nn.one_hot(gt_labels, num_classes) * pos[..., None]
    soft = onehot * align[..., None]
    vfl = varifocal_loss(cls_logits, soft, onehot)
    denom = jnp.maximum(soft.sum(), 1.0)
    cls_loss = vfl.sum() / denom

    giou = 1.0 - bbox_iou(boxes, gt_boxes, iou_type="giou")
    box_loss = (giou * align * pos).sum() / denom * 2.5

    total = cls_loss + box_loss
    return total, {"cls_loss": cls_loss, "box_loss": box_loss}


@MODELS.register(name="YOLOv6")
class YOLOv6(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    conf_threshold: float = 0.03
    iou_threshold: float = 0.65
    max_det: int = 300

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        subtype = get("TYPE") or "yolov6_s"
        size = subtype.split("_")[-1]
        dm, wm = SIZE_CFG.get(size, (0.33, 0.5))
        self.backbone = EfficientRep(depth_mul=dm, width_mul=wm)
        self.neck = RepPAN(width_mul=wm, depth_mul=dm)
        self.head = Effidehead(self.num_classes)

    def _forward(self, images, train: bool):
        feats = self.backbone(images, train=train)
        feats = self.neck(feats, train=train)
        preds = self.head(feats, train=train)
        h, w = images.shape[1:3]
        priors = center_priors([(h // s, w // s) for s in STRIDES], STRIDES)
        # YOLOv6 anchors centers at (x+0.5)*stride
        priors = priors.at[:, 0:2].add(priors[:, 2:4] * 0.5)
        return preds, priors

    def _predict(self, preds, priors, images, targets=None):
        boxes = decode_yolov6(preds, priors)
        scores = jax.nn.sigmoid(preds[..., 4:])
        best, labels = scores.max(-1), scores.argmax(-1)
        dets = batched_nms(boxes, best, labels, max_det=self.max_det,
                           iou_threshold=self.iou_threshold,
                           score_threshold=self.conf_threshold)
        h, w = images.shape[1:3]
        out_boxes = clip_boxes(dets["boxes"], h, w)
        if targets is not None and "pads" in targets:
            out_boxes = unletterbox_boxes(
                out_boxes, targets["pads"][:, None, :],
                targets["scales"][:, None, :])
        return {**dets, "boxes": out_boxes}

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        preds, priors = self._forward(images, train=train)
        if mode in ("train", "val"):
            total, losses = yolov6_loss(
                preds, priors,
                {"boxes": targets["boxes"], "labels": targets["labels"],
                 "valid": targets["valid"]},
                self.num_classes)
            losses = {**losses, "loss": total}
            if mode == "train":
                return total, losses
            return losses, self._predict(preds, priors, images, targets)
        return self._predict(preds, priors, images, targets)

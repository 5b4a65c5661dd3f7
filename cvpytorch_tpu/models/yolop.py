"""YOLOP — multitask detection + drivable-area + lane segmentation
(reference: src/models/yolop.py:16 — YOLOv5 machinery with two seg decoders
off the neck).

Targets: the padded det dict plus optional ``drivable`` / ``lane`` masks
(B, H, W) int.  Loss = YOLOv5 det loss + CE for each seg branch."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import clip_boxes, unletterbox_boxes, xyxy_to_cxcywh
from ..ops.nms import yolo_non_max_suppression
from ..registry import MODELS
from .backbones.csp_darknet import SIZE_CFG, YOLOv5CSPDarknet
from .bricks import ConvBNAct
from .detects.yolov5_detect import YOLOv5Detect, decode_yolov5
from .heads.seg_heads import resize_bilinear
from .losses.seg_loss import cross_entropy_2d
from .losses.yolov5_loss import YOLOv5Loss
from .necks.yolov5_neck import YOLOv5Neck, upsample2x
from .yolov5 import DEFAULT_ANCHORS, STRIDES

_BN = dict(bn_momentum=0.97, bn_eps=1e-3)


class SegDecoder(nn.Module):
    """Light upsampling decoder from the P3 neck feature (reference:
    yolop.py seg branches)."""

    num_classes: int = 2

    @nn.compact
    def __call__(self, x, out_hw, train: bool = False):
        for i, ch in enumerate((128, 64, 32)):
            x = ConvBNAct(ch, 3, act="silu", **_BN, name=f"conv{i}")(x, train)
            x = upsample2x(x)
        x = nn.Conv(self.num_classes, (1, 1), name="head")(x)
        return resize_bilinear(x, out_hw)


@MODELS.register(name="YOLOP")
class YOLOP(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    conf_threshold: float = 0.001
    iou_threshold: float = 0.6
    max_det: int = 300

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        size = (get("TYPE") or "yolop_s").split("_")[-1]
        self.backbone = YOLOv5CSPDarknet(subtype=f"cspdark_{size}")
        self.neck = YOLOv5Neck(subtype=f"yolov5_{size}")
        self.detect = YOLOv5Detect(num_classes=self.num_classes)
        self.da_decoder = SegDecoder(num_classes=2)
        self.ll_decoder = SegDecoder(num_classes=2)
        self.det_loss = YOLOv5Loss(num_classes=self.num_classes,
                                   anchors=DEFAULT_ANCHORS, strides=STRIDES)

    def _forward(self, images, train: bool):
        feats = self.neck(self.backbone(images, train=train), train=train)
        raw = self.detect(feats, train=train)
        hw = images.shape[1:3]
        da = self.da_decoder(feats[0], hw, train)
        ll = self.ll_decoder(feats[0], hw, train)
        return raw, da, ll

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        raw, da, ll = self._forward(images, train=train)
        if mode == "infer":
            return self._predict(images, raw, da, ll, None)
        h, w = images.shape[1:3]
        boxes_n = xyxy_to_cxcywh(targets["boxes"]) / jnp.array(
            [w, h, w, h], jnp.float32)
        det_total, det_losses = self.det_loss(
            raw, {"boxes": boxes_n, "labels": targets["labels"],
                  "valid": targets["valid"]})
        total = det_total
        losses = dict(det_losses)
        if "drivable" in targets:
            da_loss = cross_entropy_2d(da, targets["drivable"])
            losses["da_loss"] = da_loss
            total = total + da_loss
        if "lane" in targets:
            ll_loss = cross_entropy_2d(ll, targets["lane"])
            losses["ll_loss"] = ll_loss
            total = total + ll_loss
        losses["loss"] = total
        if mode == "train":
            return total, losses
        return losses, self._predict(images, raw, da, ll, targets)

    def _predict(self, images, raw, da, ll, targets):
        decoded = decode_yolov5(raw, DEFAULT_ANCHORS, STRIDES)
        dets = yolo_non_max_suppression(
            decoded, self.num_classes, conf_threshold=self.conf_threshold,
            iou_threshold=self.iou_threshold, max_det=self.max_det)
        h, w = images.shape[1:3]
        boxes = clip_boxes(dets["boxes"], h, w)
        if targets is not None and "pads" in targets:
            boxes = unletterbox_boxes(
                boxes, targets["pads"][:, None, :],
                targets["scales"][:, None, :])
        return {**dets, "boxes": boxes,
                "drivable": jnp.argmax(da, -1), "lane": jnp.argmax(ll, -1)}


@MODELS.register(name="FastestDet")
class FastestDet(nn.Module):
    """(reference: src/models/fastestdet.py:80) — single-level anchor-free
    detector: ShuffleNetV2 features fused at one scale, 1×1 heads for
    obj/cls/box (ltrb via sigmoid-scaled offsets)."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    stride: int = 16
    conf_threshold: float = 0.05
    iou_threshold: float = 0.45
    max_det: int = 100

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        from .backbones import build_backbone

        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        bb = get("BACKBONE") or {"name": "ShuffleNetV2",
                                 "subtype": "shufflenetv2_x0.5"}
        self.backbone = build_backbone(
            dict(bb.items()) if hasattr(bb, "items") else bb)

    @nn.compact
    def _raw(self, images, train: bool):
        c3, c4, c5 = self.backbone(images, train=train)
        tgt = c4.shape[1:3]
        f = jnp.concatenate([
            resize_bilinear(c3, tgt), c4, resize_bilinear(c5, tgt)], -1)
        f = ConvBNAct(96, 1, act="relu", bn_momentum=0.9, bn_eps=1e-5,
                      name="fuse")(f, train)
        for i in range(3):
            f = ConvBNAct(96, 5, groups=96, act="relu", bn_momentum=0.9,
                          bn_eps=1e-5, name=f"dw{i}")(f, train)
            f = ConvBNAct(96, 1, act="relu", bn_momentum=0.9, bn_eps=1e-5,
                          name=f"pw{i}")(f, train)
        obj = nn.Conv(1, (1, 1), name="obj")(f)
        cls = nn.Conv(self.num_classes, (1, 1), name="cls")(f)
        reg = nn.Conv(4, (1, 1), name="reg")(f)
        B, h, w, _ = obj.shape
        return jnp.concatenate([reg, obj, cls], -1).reshape(B, h * w, -1), (h, w)

    def _decode(self, preds, hw):
        h, w = hw
        ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
        xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
        cx = (jax.nn.sigmoid(preds[..., 0]) + xs[None]) * self.stride
        cy = (jax.nn.sigmoid(preds[..., 1]) + ys[None]) * self.stride
        bw = jnp.exp(jnp.clip(preds[..., 2], -8, 6)) * self.stride
        bh = jnp.exp(jnp.clip(preds[..., 3], -8, 6)) * self.stride
        return jnp.stack([cx - bw / 2, cy - bh / 2,
                          cx + bw / 2, cy + bh / 2], -1)

    def __call__(self, images, targets=None, mode: str = "infer"):
        import optax

        train = mode == "train"
        preds, hw = self._raw(images, train=train)
        boxes = self._decode(preds, hw)
        obj_logits = preds[..., 4]
        cls_logits = preds[..., 5:]
        if mode == "infer":
            return self._predict(boxes, obj_logits, cls_logits, images, None)
        # simple center-cell assignment: gt center cell is positive
        from ..ops.boxes import bbox_iou

        gt, gl, gv = targets["boxes"], targets["labels"], targets["valid"]
        h, w = hw
        gcx = (gt[..., 0] + gt[..., 2]) / 2 / self.stride
        gcy = (gt[..., 1] + gt[..., 3]) / 2 / self.stride
        cell = (jnp.clip(gcy.astype(jnp.int32), 0, h - 1) * w +
                jnp.clip(gcx.astype(jnp.int32), 0, w - 1))  # (B, M)
        B, P = obj_logits.shape
        obj_t = jax.vmap(lambda c, v: jnp.zeros(P).at[c].max(v.astype(jnp.float32)))(
            cell, gv)
        obj_loss = optax.sigmoid_binary_cross_entropy(obj_logits, obj_t).mean() * 10
        ps = jnp.take_along_axis(boxes, cell[..., None], axis=1)  # (B,M,4)
        iou = bbox_iou(ps, gt, iou_type="ciou")
        n_pos = jnp.maximum(gv.sum(), 1.0)
        box_loss = ((1 - iou) * gv).sum() / n_pos
        pc = jnp.take_along_axis(cls_logits, cell[..., None], axis=1)
        onehot = jax.nn.one_hot(gl, self.num_classes)
        cls_loss = (optax.sigmoid_binary_cross_entropy(pc, onehot).sum(-1)
                    * gv).sum() / n_pos
        total = obj_loss + box_loss + cls_loss
        losses = {"obj_loss": obj_loss, "box_loss": box_loss,
                  "cls_loss": cls_loss, "loss": total}
        if mode == "train":
            return total, losses
        return losses, self._predict(boxes, obj_logits, cls_logits, images,
                                     targets)

    def _predict(self, boxes, obj_logits, cls_logits, images, targets):
        from ..ops.nms import batched_nms

        scores = jax.nn.sigmoid(cls_logits) * \
            jax.nn.sigmoid(obj_logits)[..., None]
        best, labels = scores.max(-1), scores.argmax(-1)
        h, w = images.shape[1:3]
        boxes = clip_boxes(boxes, h, w)
        dets = batched_nms(boxes, best, labels, max_det=self.max_det,
                           iou_threshold=self.iou_threshold,
                           score_threshold=self.conf_threshold)
        out = dets["boxes"]
        if targets is not None and "pads" in targets:
            out = unletterbox_boxes(out, targets["pads"][:, None, :],
                                    targets["scales"][:, None, :])
        return {**dets, "boxes": out}

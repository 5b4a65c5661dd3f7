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
from .bricks import BatchNorm, ConvBNAct
from .detects.yolov5_detect import YOLOv5Detect, decode_yolov5
from .heads.seg_heads import resize_bilinear
from .losses.seg_loss import cross_entropy_2d
from .losses.yolov5_loss import YOLOv5Loss
from .necks.yolov5_neck import YOLOv5Neck, upsample2x
from .yolov5 import DEFAULT_ANCHORS, STRIDES

_BN = dict(bn_momentum=0.97, bn_eps=1e-3)


class YoloBottleneckCSP(nn.Module):
    """The classic YOLOv5 BottleneckCSP (reference
    modules/yolo11_modules.py:186-203): cv1 ConvBNSiLU → n Bottlenecks →
    plain cv3; plain cv2 on the input; BN+LeakyReLU(0.1) over the concat;
    cv4 ConvBNSiLU."""

    out: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out * self.expansion)
        y1 = ConvBNAct(c_, 1, act="silu", **_BN, name="cv1")(x, train)
        for i in range(self.n):
            h = ConvBNAct(c_, 1, act="silu", **_BN,
                          name=f"m{i}_cv1")(y1, train)
            h = ConvBNAct(c_, 3, act="silu", **_BN,
                          name=f"m{i}_cv2")(h, train)
            y1 = y1 + h if self.shortcut else h
        y1 = nn.Conv(c_, (1, 1), use_bias=False, name="cv3")(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, name="cv2")(x)
        y = jnp.concatenate([y1, y2], -1)
        y = BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, name="bn")(y)
        y = nn.leaky_relu(y, 0.1)
        return ConvBNAct(self.out, 1, act="silu", **_BN,
                         name="cv4")(y, train)


class SegDecoder(nn.Module):
    """The exact YOLOP SegmentHead (reference heads/yolop_head.py:16-33):
    Conv3 → up2 → BottleneckCSP → Conv3 → up2 → Conv3 → BottleneckCSP →
    up2 → Conv3(num_classes), all nearest upsampling."""

    num_classes: int = 2

    @nn.compact
    def __call__(self, x, out_hw, train: bool = False):
        x = ConvBNAct(128, 3, act="silu", **_BN, name="c0")(x, train)
        x = upsample2x(x)
        x = YoloBottleneckCSP(64, shortcut=False, name="csp0")(x, train)
        x = ConvBNAct(32, 3, act="silu", **_BN, name="c1")(x, train)
        x = upsample2x(x)
        x = ConvBNAct(16, 3, act="silu", **_BN, name="c2")(x, train)
        x = YoloBottleneckCSP(8, shortcut=False, name="csp1")(x, train)
        x = upsample2x(x)
        x = ConvBNAct(self.num_classes, 3, act="silu", **_BN,
                      name="head")(x, train)
        if x.shape[1:3] != tuple(out_hw):
            x = resize_bilinear(x, out_hw)
        return x


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
    """FastestDet (reference: src/models/fastestdet.py:62-168,
    necks/fastestdet_neck.py:11-90, heads/fastestdet_head.py:11-56,
    losses/fastestdet_loss.py:12-154) — single-level anchor-free detector.

    Faithful forward: C3 avg-pooled down / C5 nearest-upsampled to C4's
    stride-16 grid, concat → SPP (1×1 → parallel 1/2/3-deep dw5 branches
    → concat → 1×1+BN → residual relu) → head (1×1 → per-branch dw5 +
    1×1(no bias)+BN) emitting [sigmoid(obj), reg, softmax(cls)] exactly
    like the reference (obj/cls are PROBABILITIES in the raw output).

    Loss is the reference's reformulated masked-fixed-shape: 4-quadrant
    center assignment (cells at index 0 excluded — the reference bounds
    filter quirk, fastestdet_loss.py:77), SIoU, keep-above-mean-IoU
    filter, NLL on log-softmax cls, and the double-sigmoid obj BCE (the
    reference feeds the already-sigmoided obj map to BCEWithLogitsLoss —
    replicated as-is) with the 0.75/count-balanced factor map and the
    8/16/1 weights."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    out_channels: int = 96
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
        oc = self.out_channels
        bn = dict(bn_momentum=0.9, bn_eps=1e-5)
        dw = lambda name: ConvBNAct(oc, 5, groups=oc, act="relu", **bn,
                                    name=name)
        c3, c4, c5 = self.backbone(images, train=train)
        B, h, w, _ = c4.shape
        p5 = jnp.repeat(jnp.repeat(c5, 2, axis=1), 2, axis=2)
        p3 = nn.avg_pool(c3, (3, 3), strides=(2, 2),
                         padding=((1, 1), (1, 1)))
        cat = jnp.concatenate([p3, c4, p5], -1)
        x = ConvBNAct(oc, 1, act="relu", **bn, name="spp_in")(cat, train)
        y1 = dw("s1_0")(x, train)
        y2 = dw("s2_1")(dw("s2_0")(x, train), train)
        y3 = dw("s3_2")(dw("s3_1")(dw("s3_0")(x, train), train), train)
        y = ConvBNAct(oc, 1, act=None, **bn, name="spp_out")(
            jnp.concatenate([y1, y2, y3], -1), train)
        f = nn.relu(x + y)
        hd = ConvBNAct(oc, 1, act="relu", **bn, name="head_in")(f, train)

        def branch(out_ch, name):
            z = dw(f"{name}_dw")(hd, train)
            return ConvBNAct(out_ch, 1, act=None, **bn,
                             name=f"{name}_out")(z, train)

        obj = jax.nn.sigmoid(branch(1, "obj"))
        reg = branch(4, "reg")
        cls = jax.nn.softmax(branch(self.num_classes, "cls"), -1)
        return jnp.concatenate([obj, reg, cls], -1)      # (B, h, w, 5+C)

    def _decode(self, pred, images):
        """reference fastestdet.py:20-47 (tanh center, sigmoid wh,
        normalized → image px); score = obj · max cls."""
        B, h, w, _ = pred.shape
        ih, iw = images.shape[1:3]
        gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
        cx = (jnp.tanh(pred[..., 1]) + gx) / w * iw
        cy = (jnp.tanh(pred[..., 2]) + gy) / h * ih
        bw = jax.nn.sigmoid(pred[..., 3]) * iw
        bh = jax.nn.sigmoid(pred[..., 4]) * ih
        boxes = jnp.stack([cx - bw / 2, cy - bh / 2,
                           cx + bw / 2, cy + bh / 2], -1)
        scores = pred[..., 0] * pred[..., 5:].max(-1)
        labels = pred[..., 5:].argmax(-1)
        P = h * w
        return (boxes.reshape(B, P, 4), scores.reshape(B, P),
                labels.reshape(B, P))

    def _siou(self, pbox, gbox):
        """SIoU on cxcywh grid-unit boxes (fastestdet_loss.py:16-57)."""
        import math as _math

        eps = 1e-7
        b1x1, b1x2 = pbox[..., 0] - pbox[..., 2] / 2, \
            pbox[..., 0] + pbox[..., 2] / 2
        b1y1, b1y2 = pbox[..., 1] - pbox[..., 3] / 2, \
            pbox[..., 1] + pbox[..., 3] / 2
        b2x1, b2x2 = gbox[..., 0] - gbox[..., 2] / 2, \
            gbox[..., 0] + gbox[..., 2] / 2
        b2y1, b2y2 = gbox[..., 1] - gbox[..., 3] / 2, \
            gbox[..., 1] + gbox[..., 3] / 2
        inter = jnp.clip(jnp.minimum(b1x2, b2x2) -
                         jnp.maximum(b1x1, b2x1), 0) * \
            jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0)
        w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
        w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
        union = w1 * h1 + w2 * h2 - inter + eps
        iou = inter / union
        cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
        ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
        s_cw = (b2x1 + b2x2 - b1x1 - b1x2) * 0.5
        s_ch = (b2y1 + b2y2 - b1y1 - b1y2) * 0.5
        sigma = jnp.sqrt(s_cw ** 2 + s_ch ** 2) + 1e-12
        sin1 = jnp.abs(s_cw) / sigma
        sin2 = jnp.abs(s_ch) / sigma
        thr = 2 ** 0.5 / 2
        sin_a = jnp.where(sin1 > thr, sin2, sin1)
        angle = jnp.cos(jnp.arcsin(jnp.clip(sin_a, 0, 1)) * 2
                        - _math.pi / 2)
        rho_x = (s_cw / jnp.maximum(cw, eps)) ** 2
        rho_y = (s_ch / jnp.maximum(ch, eps)) ** 2
        gamma = angle - 2
        dist = 2 - jnp.exp(gamma * rho_x) - jnp.exp(gamma * rho_y)
        ow = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        oh = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape = (1 - jnp.exp(-ow)) ** 4 + (1 - jnp.exp(-oh)) ** 4
        return iou - 0.5 * (dist + shape)

    def _loss(self, pred, targets):
        import optax

        B, h, w, _ = pred.shape
        pobj = pred[..., 0]
        preg = pred.reshape(B, h * w, -1)[..., 1:5]
        pcls = pred.reshape(B, h * w, -1)[..., 5:]
        gt, gl, gv = targets["boxes"], targets["labels"], targets["valid"]
        # gt boxes are NETWORK pixels (letterboxed) — normalize by the
        # network input dims, not the original image height/width
        ih = h * self.stride
        iw = w * self.stride
        # normalized gt → feature grid units
        gcx = (gt[..., 0] + gt[..., 2]) / 2 / iw * w
        gcy = (gt[..., 1] + gt[..., 3]) / 2 / ih * h
        gw = (gt[..., 2] - gt[..., 0]) / iw * w
        gh = (gt[..., 3] - gt[..., 1]) / ih * h
        # 4-quadrant candidates (B, M, 4)
        qx = jnp.asarray([0, 1, 0, 1])
        qy = jnp.asarray([0, 0, 1, 1])
        gx = jnp.floor(gcx)[..., None] + qx
        gy = jnp.floor(gcy)[..., None] + qy
        # reference bounds quirk: index-0 cells excluded too (loss :77)
        ok = (gx > 0) & (gx < w) & (gy > 0) & (gy < h) & gv[..., None]
        gxi = jnp.clip(gx, 0, w - 1).astype(jnp.int32)
        gyi = jnp.clip(gy, 0, h - 1).astype(jnp.int32)
        cell = (gyi * w + gxi).reshape(B, -1)            # (B, 4M)
        okf = ok.reshape(B, -1)
        pr = jnp.take_along_axis(preg, cell[..., None], axis=1)
        pbox = jnp.stack([
            jnp.tanh(pr[..., 0]) + gxi.reshape(B, -1),
            jnp.tanh(pr[..., 1]) + gyi.reshape(B, -1),
            jax.nn.sigmoid(pr[..., 2]) * w,
            jax.nn.sigmoid(pr[..., 3]) * h], -1)
        gbox = jnp.stack([gcx, gcy, gw, gh], -1)         # (B, M, 4)
        gbox4 = jnp.repeat(gbox[:, :, None], 4, 2).reshape(B, -1, 4)
        iou = self._siou(pbox, gbox4)
        n_ok = jnp.maximum(okf.sum(), 1.0)
        iou_mean = (iou * okf).sum() / n_ok
        keep = okf & (iou > iou_mean)                    # above-mean filter
        n_keep = jnp.maximum(keep.sum(), 1.0)
        iou_loss = ((1.0 - iou) * keep).sum() / n_keep
        # cls: NLL over log-softmax probabilities at kept cells
        pc = jnp.take_along_axis(pcls, cell[..., None], axis=1)
        gl4 = jnp.repeat(gl[:, :, None], 4, 2).reshape(B, -1)
        logp = jnp.log(jnp.clip(
            jnp.take_along_axis(pc, gl4[..., None], axis=-1)[..., 0],
            1e-12))
        cls_loss = -(logp * keep).sum() / n_keep
        # obj: tobj 1 at kept cells; factor 0.75 baseline, balanced at
        # positives; BCE-with-logits over the already-sigmoided obj map
        # (the reference's double-sigmoid, replicated)
        P = h * w
        tobj = jax.vmap(lambda c, k: jnp.zeros(P).at[c].max(
            k.astype(jnp.float32)))(cell, keep)
        n_img = keep.sum(-1).astype(jnp.float32)         # kept per image
        fval = jnp.where(n_img > 0, (1.0 / (n_img / P)) * 0.25, 0.75)
        fmap = jax.vmap(lambda c, k, fv: jnp.full(P, 0.75).at[c].set(
            jnp.where(k, fv, 0.75)))(cell, keep,
                                     jnp.broadcast_to(fval[:, None],
                                                      cell.shape))
        obj_bce = optax.sigmoid_binary_cross_entropy(
            pobj.reshape(B, P), tobj)
        obj_loss = (obj_bce * fmap).mean()
        total = iou_loss * 8.0 + obj_loss * 16.0 + cls_loss
        return total, {"box_loss": iou_loss, "obj_loss": obj_loss,
                       "cls_loss": cls_loss, "loss": total}

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        pred = self._raw(images, train=train)
        if mode == "infer":
            return self._predict(pred, images, None)
        total, losses = self._loss(pred, targets)
        if mode == "train":
            return total, losses
        return losses, self._predict(pred, images, targets)

    def _predict(self, pred, images, targets):
        from ..ops.nms import batched_nms

        boxes, scores, labels = self._decode(pred, images)
        h, w = images.shape[1:3]
        boxes = clip_boxes(boxes, h, w)
        dets = batched_nms(boxes, scores, labels, max_det=self.max_det,
                           iou_threshold=self.iou_threshold,
                           score_threshold=self.conf_threshold)
        out_boxes = dets["boxes"]
        if targets is not None and "pads" in targets:
            out_boxes = unletterbox_boxes(
                out_boxes, targets["pads"][:, None, :],
                targets["scales"][:, None, :])
        return {**dets, "boxes": out_boxes}

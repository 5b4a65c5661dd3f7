"""YOLOX (reference: src/models/yolox.py:71, backbones/det/
yolox_csp_darknet.py, necks/det/yolox_neck.py, heads/det/yolox_head.py,
losses/det/yolox_loss.py:73 with SimOTA inside).

Focus-stem CSPDarknet + PAFPN + decoupled anchor-free head; loss = obj BCE
(all priors) + cls BCE (positives, IoU-soft targets) + IoU loss, with the
fixed-shape SimOTA assignment."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import box_iou_matrix, clip_boxes, unletterbox_boxes
from ..ops.nms import batched_nms
from ..registry import MODELS
from .assigners.ota_assigner import simota_assign
from .backbones.csp_darknet import CSPLayer, SIZE_CFG, SPPF
from .bricks import ConvBNAct, make_divisible, make_round
from .heads.nanodet_head import center_priors
from .necks.yolov5_neck import DownsampleFuse, UpsampleFuse

_BN = dict(bn_momentum=0.97, bn_eps=1e-3)
STRIDES = (8, 16, 32)


class Focus(nn.Module):
    """Space-to-depth stem (reference: yolo_modules.py:19)."""

    out_channels: int
    kernel_size: int = 3
    act: str = "silu"

    @nn.compact
    def __call__(self, x, train: bool = False):
        tl = x[:, ::2, ::2]
        bl = x[:, 1::2, ::2]
        tr = x[:, ::2, 1::2]
        br = x[:, 1::2, 1::2]
        x = jnp.concatenate([tl, bl, tr, br], -1)
        return ConvBNAct(self.out_channels, self.kernel_size, act=self.act,
                         **_BN, name="conv")(x, train)


class YOLOXCSPDarknet(nn.Module):
    """(reference: backbones/det/yolox_csp_darknet.py)"""

    depth_mul: float = 0.33
    width_mul: float = 0.5
    out_channels: Sequence[int] = (64, 128, 256, 512, 1024)
    num_blocks: Sequence[int] = (3, 9, 9, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        chs = [make_divisible(c * self.width_mul) for c in self.out_channels]
        blocks = [make_round(n, self.depth_mul) for n in self.num_blocks]
        x = Focus(chs[0], name="stem")(x, train)
        feats = []
        for i in range(4):
            x = ConvBNAct(chs[i + 1], 3, 2, act="silu", **_BN,
                          name=f"stage{i+1}_down")(x, train)
            if i == 3:
                x = SPPF(chs[4], 5, name="sppf")(x, train)
            x = CSPLayer(chs[i + 1], n=blocks[i], shortcut=(i != 3),
                         name=f"stage{i+1}_csp")(x, train)
            if i + 1 >= 2:
                feats.append(x)
        return tuple(feats)


class YOLOXHead(nn.Module):
    """Decoupled head (reference: heads/det/yolox_head.py)."""

    num_classes: int
    width_mul: float = 0.5
    feat_channels: int = 256

    @nn.compact
    def __call__(self, feats, train: bool = False):
        ch = make_divisible(self.feat_channels * self.width_mul)
        outs = []
        for i, x in enumerate(feats):
            x = ConvBNAct(ch, 1, act="silu", **_BN, name=f"stem{i}")(x, train)
            c = x
            for j in range(2):
                c = ConvBNAct(ch, 3, act="silu", **_BN,
                              name=f"cls{i}_{j}")(c, train)
            r = x
            for j in range(2):
                r = ConvBNAct(ch, 3, act="silu", **_BN,
                              name=f"reg{i}_{j}")(r, train)
            import math

            cls_out = nn.Conv(self.num_classes, (1, 1),
                              bias_init=nn.initializers.constant(
                                  -math.log((1 - 0.01) / 0.01)),
                              name=f"cls_out{i}")(c)
            reg_out = nn.Conv(4, (1, 1), name=f"reg_out{i}")(r)
            obj_out = nn.Conv(1, (1, 1),
                              bias_init=nn.initializers.constant(
                                  -math.log((1 - 0.01) / 0.01)),
                              name=f"obj_out{i}")(r)
            B, h, w, _ = cls_out.shape
            outs.append(jnp.concatenate(
                [reg_out, obj_out, cls_out], -1).reshape(B, h * w, -1))
        return jnp.concatenate(outs, 1)  # (B, P, 4+1+C)


def decode_yolox(preds, priors):
    """xy = (pred + grid)·s; wh = exp(pred)·s → xyxy."""
    xy = (preds[..., 0:2] + priors[None, :, 0:2] / priors[None, :, 2:3]) \
        * priors[None, :, 2:3]
    # priors store centers in pixels; grid = center/stride
    wh = jnp.exp(jnp.clip(preds[..., 2:4], -10, 8)) * priors[None, :, 2:4]
    return jnp.concatenate([xy - wh / 2, xy + wh / 2], -1)


def yolox_loss(preds, priors, targets, num_classes):
    """(reference: losses/det/yolox_loss.py:73)"""
    reg = preds[..., 0:4]
    obj_logits = preds[..., 4]
    cls_logits = preds[..., 5:]
    boxes = decode_yolox(preds, priors)
    B, P = obj_logits.shape

    assign = jax.vmap(
        lambda cs, os_, db, gb, gl, gv: simota_assign(
            cs, os_, priors, db, gb, gl, gv)
    )(jax.lax.stop_gradient(jax.nn.sigmoid(cls_logits)),
      jax.lax.stop_gradient(jax.nn.sigmoid(obj_logits)),
      jax.lax.stop_gradient(boxes),
      targets["boxes"], targets["labels"], targets["valid"])
    matched_gt = assign["matched_gt"]
    matched_iou = assign["matched_iou"]
    pos = matched_gt >= 0
    num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)

    safe = jnp.maximum(matched_gt, 0)
    gt_boxes = jnp.take_along_axis(targets["boxes"], safe[..., None], axis=1)
    gt_labels = jnp.take_along_axis(targets["labels"], safe, axis=1)

    # obj: target 1 at positives
    import optax

    obj_t = pos.astype(jnp.float32)
    obj_loss = optax.sigmoid_binary_cross_entropy(obj_logits, obj_t).sum() / num_pos

    onehot = jax.nn.one_hot(gt_labels, num_classes) * matched_iou[..., None]
    cls_bce = optax.sigmoid_binary_cross_entropy(cls_logits, onehot)
    cls_loss = (cls_bce.sum(-1) * pos).sum() / num_pos

    from ..ops.boxes import bbox_iou

    pair_iou = bbox_iou(boxes, gt_boxes, iou_type="iou")  # elementwise (B,P)
    iou_loss = ((1.0 - pair_iou ** 2) * pos).sum() / num_pos * 5.0

    total = obj_loss + cls_loss + iou_loss
    return total, {"obj_loss": obj_loss, "cls_loss": cls_loss,
                   "iou_loss": iou_loss}


@MODELS.register(name="YOLOX", aliases=("PAIYOLOX", "PAI_YOLOX"))
class YOLOX(nn.Module):
    """``use_asff=True`` (or model name PAI-YOLOX, reference
    pai_yolox.py:194) adds an adaptively-spatial-feature-fusion pass over
    the PAN outputs."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    use_asff: bool = False
    conf_threshold: float = 0.01
    iou_threshold: float = 0.65
    max_det: int = 300

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        subtype = get("TYPE") or "yolox_s"
        size = subtype.split("_")[-1]
        dm, wm = SIZE_CFG.get(size, (0.33, 0.5))
        bb_cfg = get("BACKBONE") or {}
        bget = bb_cfg.get if hasattr(bb_cfg, "get") else (lambda k, d=None: d)
        is_pai = self.use_asff or "pai" in subtype.lower()
        if is_pai or "EfficientRep" in str(bget("name") or ""):
            # PAI-YOLOX swaps in a RepVGG-block backbone
            # (reference backbones/det/yolox_pai_efficient_rep.py:16,
            # num_blocks [6,12,18,6] — EfficientRep plan but stage 4
            # ends in the plain serial ReLU SPPF, not SimCSPSPPF)
            from .yolov6 import EfficientRep

            self.backbone = EfficientRep(depth_mul=dm, width_mul=wm,
                                         sppf="relu")
        else:
            self.backbone = YOLOXCSPDarknet(depth_mul=dm, width_mul=wm)
        self.neck_up1 = UpsampleFuse(make_divisible(512 * wm),
                                     make_round(3, dm))
        self.neck_up2 = UpsampleFuse(make_divisible(256 * wm),
                                     make_round(3, dm))
        self.neck_down1 = DownsampleFuse(make_divisible(512 * wm),
                                         make_round(3, dm))
        self.neck_down2 = DownsampleFuse(make_divisible(1024 * wm),
                                         make_round(3, dm))
        self.head = YOLOXHead(self.num_classes, width_mul=wm)
        if self.use_asff or "pai" in str(get("TYPE") or "").lower():
            from .necks.asff import ASFF
            from .bricks import make_divisible as _md

            self.asff = ASFF(channels=_md(256 * wm))
        else:
            self.asff = None

    def _forward(self, images, train: bool):
        c3, c4, c5 = self.backbone(images, train=train)
        p4u, t5 = self.neck_up1(c5, c4, train)
        p3, t4 = self.neck_up2(p4u, c3, train)
        p4 = self.neck_down1(p3, t4, train)
        p5 = self.neck_down2(p4, t5, train)
        feats = (p3, p4, p5)
        if self.asff is not None:
            feats = self.asff(feats, train=train)
        preds = self.head(feats, train=train)
        h, w = images.shape[1:3]
        priors = center_priors([(h // s, w // s) for s in STRIDES], STRIDES)
        return preds, priors

    def _predict(self, preds, priors, images, targets=None):
        boxes = decode_yolox(preds, priors)
        scores = jax.nn.sigmoid(preds[..., 5:]) * \
            jax.nn.sigmoid(preds[..., 4:5])
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
            total, losses = yolox_loss(
                preds, priors,
                {"boxes": targets["boxes"], "labels": targets["labels"],
                 "valid": targets["valid"]},
                self.num_classes)
            losses = {**losses, "loss": total}
            if mode == "train":
                return total, losses
            return losses, self._predict(preds, priors, images, targets)
        return self._predict(preds, priors, images, targets)

"""YOLOv5 (reference: src/models/yolov5.py:156-287).

CSPDarknet + PANet neck + Detect + fixed-shape loss, under the universal
forward contract.  Targets arrive as a padded dict
``{'boxes': (B,M,4) xyxy network-pixels, 'labels': (B,M), 'valid': (B,M),
'pads': (B,2), 'scales': (B,2), 'height': (B,), 'width': (B,)}``
(the collate-side equivalent of ``trans_specific_format``,
reference yolov5.py:218-244).  Val/infer decode + batched NMS +
un-letterbox all run in-graph (reference loops images on host,
yolov5.py:263-285)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import clip_boxes, unletterbox_boxes, xyxy_to_cxcywh
from ..ops.nms import yolo_non_max_suppression
from ..registry import MODELS
from .backbones.csp_darknet import SIZE_CFG, YOLOv5CSPDarknet
from .detects.yolov5_detect import YOLOv5Detect, decode_yolov5
from .losses.yolov5_loss import YOLOv5Loss
from .necks.yolov5_neck import YOLOv5Neck

# anchors in grid units per level (reference: yolov5.py:157-159)
DEFAULT_ANCHORS = (
    ((1.25, 1.625), (2.0, 3.75), (4.125, 2.875)),
    ((1.875, 3.8125), (3.875, 2.8125), (3.6875, 7.4375)),
    ((3.625, 2.8125), (4.875, 6.1875), (11.65625, 10.1875)),
)
STRIDES = (8.0, 16.0, 32.0)


@MODELS.register(name="YOLOv5")
class YOLOv5(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    conf_threshold: float = 0.001
    iou_threshold: float = 0.6
    max_det: int = 300
    # reference mAP path uses multi_label=True when nc > 1 (yolov5.py:92-110)
    multi_label: bool = True

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        subtype = (get("TYPE") or "yolov5_s")
        size = subtype.split("_")[-1]
        # accept reference names nano/tiny (reference yolov5.py:160-165)
        size = {"nano": "n", "tiny": "t"}.get(size, size)
        dm, wm = SIZE_CFG[size]

        self.backbone = YOLOv5CSPDarknet(subtype=f"cspdark_{size}")
        self.neck = YOLOv5Neck(subtype=f"yolov5_{size}")
        self.detect = YOLOv5Detect(num_classes=self.num_classes)
        loss_cfg = get("LOSS") or {}
        lget = loss_cfg.get if hasattr(loss_cfg, "get") else (lambda k, d=None: d)
        self.loss = YOLOv5Loss(
            num_classes=self.num_classes,
            anchors=DEFAULT_ANCHORS,
            strides=STRIDES,
            hyp_box=float(lget("hyp_box", 0.05) or 0.05),
            hyp_obj=float(lget("hyp_obj", 1.0) or 1.0),
            hyp_cls=float(lget("hyp_cls", 0.5) or 0.5),
        )

    def _raw(self, images, train: bool):
        feats = self.backbone(images, train=train)
        feats = self.neck(feats, train=train)
        return self.detect(feats, train=train)

    def _normalized_targets(self, images, targets):
        """xyxy pixel GT → normalized cxcywh (what the loss consumes)."""
        h, w = images.shape[1:3]
        boxes = xyxy_to_cxcywh(targets["boxes"]) / jnp.array(
            [w, h, w, h], jnp.float32)
        return {
            "boxes": boxes,
            "labels": targets["labels"],
            "valid": targets["valid"],
        }

    def _predict(self, images, raw_outs, targets=None):
        decoded = decode_yolov5(raw_outs, DEFAULT_ANCHORS, STRIDES)
        dets = yolo_non_max_suppression(
            decoded, self.num_classes,
            conf_threshold=self.conf_threshold,
            iou_threshold=self.iou_threshold,
            max_det=self.max_det,
            multi_label=self.multi_label and self.num_classes > 1,
        )
        h, w = images.shape[1:3]
        boxes = clip_boxes(dets["boxes"], h, w)
        if targets is not None and "pads" in targets:
            boxes = unletterbox_boxes(
                boxes, targets["pads"][:, None, :], targets["scales"][:, None, :])
        return {**dets, "boxes": boxes}

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        raw_outs = self._raw(images, train=train)
        if mode == "train":
            total, losses = self.loss(
                raw_outs, self._normalized_targets(images, targets))
            return total, {**losses, "loss": total}
        if mode == "val":
            total, losses = self.loss(
                raw_outs, self._normalized_targets(images, targets))
            preds = self._predict(images, raw_outs, targets)
            return {**losses, "loss": total}, preds
        return self._predict(images, raw_outs, targets)

"""ObjectBox (reference: src/models/objectbox.py:153) — center-based
single-stage detection: every gt is assigned at its center cell on EVERY
pyramid level (no anchor-shape gating), boxes regressed as *corner
distances* with per-level gain 2^i (reference objectbox_detect.py:70-88,
objectbox_loss.py:57-63) — large objects are representable at the coarse
levels, unlike an anchor-scaled wh parametrization."""
from __future__ import annotations

from typing import Any, Sequence

from flax import linen as nn

from ..registry import MODELS
from .yolov5 import STRIDES, YOLOv5
from .losses.objectbox_loss import ObjectBoxLoss, decode_objectbox


@MODELS.register(name="ObjectBox")
class ObjectBox(YOLOv5):
    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        subtype = (get("TYPE") or "objectbox_s")
        size = subtype.split("_")[-1]
        from .backbones.csp_darknet import YOLOv5CSPDarknet
        from .detects.yolov5_detect import YOLOv5Detect
        from .necks.yolov5_neck import YOLOv5Neck

        self.backbone = YOLOv5CSPDarknet(subtype=f"cspdark_{size}")
        self.neck = YOLOv5Neck(subtype=f"yolov5_{size}")
        self.detect = YOLOv5Detect(num_classes=self.num_classes,
                                   num_anchors=1)
        self.loss = ObjectBoxLoss(num_classes=self.num_classes,
                                  strides=STRIDES)

    def _predict(self, images, raw_outs, targets=None):
        from ..ops.boxes import clip_boxes, unletterbox_boxes
        from ..ops.nms import yolo_non_max_suppression

        decoded = decode_objectbox(raw_outs, STRIDES)
        dets = yolo_non_max_suppression(
            decoded, self.num_classes, conf_threshold=self.conf_threshold,
            iou_threshold=self.iou_threshold, max_det=self.max_det,
            multi_label=self.multi_label and self.num_classes > 1)
        h, w = images.shape[1:3]
        boxes = clip_boxes(dets["boxes"], h, w)
        if targets is not None and "pads" in targets:
            boxes = unletterbox_boxes(
                boxes, targets["pads"][:, None, :],
                targets["scales"][:, None, :])
        return {**dets, "boxes": boxes}

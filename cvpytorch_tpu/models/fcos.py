"""FCOS detector (reference: src/models/fcos.py:24-120).

Dilated-free ResNet-50 C3-C5 + FPN P3-P7 + FCOS head, focal/centerness/GIoU
loss, sqrt(cls·cnt) scoring + batched NMS.  The reference freezes BN and
early stages (fcos.py:63-78); here BN-freeze is the GroupNorm-free towers +
norm_eval left to the optimizer mask (documented parity slot)."""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import clip_boxes, unletterbox_boxes
from ..ops.nms import batched_nms
from ..registry import MODELS
from .backbones import build_backbone
from .heads.fcos_head import FCOSHead, decode_fcos, fcos_loss
from .necks.fcos_fpn import FCOSFPN


@MODELS.register(name="FCOS")
class FCOS(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    score_threshold: float = 0.05
    iou_threshold: float = 0.6
    max_det: int = 100

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        bb = get("BACKBONE") or {"name": "ResNet", "subtype": "resnet50",
                                 "out_stages": (2, 3, 4)}
        self.backbone = build_backbone(dict(bb.items()) if hasattr(bb, "items") else bb)
        self.neck = FCOSFPN()
        self.head = FCOSHead(num_classes=self.num_classes)

    def _outs(self, images, train: bool):
        feats = self.backbone(images, train=train)
        feats = self.neck(feats, train=train)
        return self.head(feats, train=train)

    def _predict(self, outs, images, targets=None):
        boxes, scores, labels = decode_fcos(outs, self.num_classes)
        dets = batched_nms(boxes, scores, labels, max_det=self.max_det,
                           iou_threshold=self.iou_threshold,
                           score_threshold=self.score_threshold)
        h, w = images.shape[1:3]
        out_boxes = clip_boxes(dets["boxes"], h, w)
        if targets is not None and "pads" in targets:
            out_boxes = unletterbox_boxes(
                out_boxes, targets["pads"][:, None, :],
                targets["scales"][:, None, :])
        return {**dets, "boxes": out_boxes}

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        outs = self._outs(images, train=train)
        if mode in ("train", "val"):
            total, losses = fcos_loss(
                outs, targets["boxes"], targets["labels"], targets["valid"],
                self.num_classes)
            losses = {**losses, "loss": total}
            if mode == "train":
                return total, losses
            return losses, self._predict(outs, images, targets)
        return self._predict(outs, images, targets)

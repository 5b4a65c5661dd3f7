"""AIRDet (reference: src/models/airdet.py:26-154, conf/coco_airdet.yml)
— CSPDarknet backbone + GiraffeNeck + GFocalHeadV2 (GFLv2 with DGQP,
reg_max 14, SimOTA assignment; loss lives inside the head as in the
reference, gflv2_head.py:438)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import clip_boxes, unletterbox_boxes
from ..ops.nms import batched_nms
from ..registry import MODELS
from .backbones.csp_darknet import SIZE_CFG, YOLOv5CSPDarknet
from .heads.gflv2_head import GFocalHeadV2, gflv2_decode, gflv2_loss
from .necks.giraffe_neck import GiraffeNeck

# depth/width multiples (reference airdet.py:27-32)
AIRDET_CFG = {"nano": (0.33, 0.25), "tiny": (0.33, 0.375), "s": (0.33, 0.5),
              "m": (0.67, 0.75), "l": (1.0, 1.0), "x": (1.33, 1.25)}


@MODELS.register(name="AIRDet")
class AIRDet(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    score_threshold: float = 0.05   # reference airdet.py:53
    iou_threshold: float = 0.7
    max_det: int = 100
    reg_max: int = 14

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        size = (get("TYPE") or "airdet_s").split("_")[-1]
        _, wm = AIRDET_CFG.get(size, AIRDET_CFG["s"])
        ch = lambda c: max(round(c * wm), 1)
        fpn = (ch(192), ch(320), ch(768))  # conf fpn/out channels
        bb_size = {0.25: "n", 0.375: "t", 0.5: "s", 0.75: "m",
                   1.0: "l", 1.25: "x"}.get(wm, "s")
        self.backbone = YOLOv5CSPDarknet(subtype=f"cspdark_{bb_size}")
        self.neck = GiraffeNeck(fpn_channels=fpn, out_channels=fpn)
        self.head = GFocalHeadV2(
            num_classes=self.num_classes, feat_channels=fpn,
            reg_max=self.reg_max, reg_channels=64, conv_groups=2)

    def _outs(self, images, train: bool):
        feats = self.backbone(images, train=train)
        feats = self.neck(feats, train=train)
        return self.head(feats, train=train)

    def _predict(self, outs, images, targets=None):
        cls_probs, reg_logits, priors = outs
        boxes = gflv2_decode(cls_probs, reg_logits, priors)
        scores = cls_probs.max(-1)
        labels = cls_probs.argmax(-1)
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
        if mode == "infer":
            return self._predict(outs, images, targets)
        cls_probs, reg_logits, priors = outs
        total, losses = gflv2_loss(
            cls_probs, reg_logits, priors,
            {"boxes": targets["boxes"], "labels": targets["labels"],
             "valid": targets["valid"]},
            self.num_classes, self.reg_max)
        if mode == "train":
            return total, {**losses, "loss": total}
        return ({**losses, "loss": total},
                self._predict(outs, images, targets))

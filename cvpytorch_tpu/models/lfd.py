"""LFD — Light and Fast Detector (reference: src/models/lfd.py:35-176,
necks/lfd_neck.py:12-46, conf/coco_lfd.yml).

Composition per the reference config: LFDResNet backbone → LFDNeck
(per-level 1×1 conv+BN+ReLU to a common width, NO top-down pathway) →
FCOS head/loss/detect at 5 strides [8,16,32,64,128] with the config's
limit ranges.  The reference's own LFD graph cannot run (its backbone
``_make_layer`` and neck ``forward`` reference undefined attributes and
``LFDHead`` does not exist in the tree); this implementation realizes the
configured composition with the shared FCOS machinery the config names
(LOSS name 'FCOSLoss', DETECT name 'FCOSDetect')."""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import clip_boxes, unletterbox_boxes
from ..ops.nms import batched_nms
from ..registry import MODELS, NECKS
from .backbones.lfd_resnet import LFDResNet
from .bricks import ConvBNAct
from .heads.fcos_head import FCOSHead, decode_fcos, fcos_loss


@NECKS.register(name="LFDNeck")
class LFDNeck(nn.Module):
    """Per-level 1×1 ConvModule (reference necks/lfd_neck.py:21-24)."""

    out_channels: int = 128

    @nn.compact
    def __call__(self, feats, train: bool = False):
        return [
            ConvBNAct(self.out_channels, 1, act="relu", bn_momentum=0.9,
                      bn_eps=1e-5, use_bias=True, name=f"neck{i}")(x, train)
            for i, x in enumerate(feats)
        ]


@MODELS.register(name="LFD")
class LFD(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    score_threshold: float = 0.05   # reference lfd.py:55
    iou_threshold: float = 0.6
    max_det: int = 100

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        bb = get("BACKBONE") or {}
        bget = bb.get if hasattr(bb, "get") else (lambda k, d=None: d)
        subtype = bget("subtype", "lfd_s") or "lfd_s"
        neck_cfg = get("NECK") or {}
        nget = neck_cfg.get if hasattr(neck_cfg, "get") else (lambda k, d=None: d)
        out_ch = int(nget("out_channels", 128) or 128)
        head_cfg = get("HEAD") or {}
        hget = head_cfg.get if hasattr(head_cfg, "get") else (lambda k, d=None: d)

        self.backbone = LFDResNet(subtype=subtype)
        self.neck = LFDNeck(out_channels=out_ch)
        self.head = FCOSHead(
            num_classes=self.num_classes, channels=out_ch,
            stacked_convs=2,
            prior=float(hget("prior", 0.01) or 0.01),
            cnt_on_reg=bool(hget("cnt_on_reg", True)))

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
        if mode == "infer":
            return self._predict(outs, images, targets)
        total, losses = fcos_loss(
            outs, targets["boxes"], targets["labels"], targets["valid"],
            self.num_classes)
        if mode == "train":
            return total, {**losses, "loss": total}
        return ({**losses, "loss": total},
                self._predict(outs, images, targets))

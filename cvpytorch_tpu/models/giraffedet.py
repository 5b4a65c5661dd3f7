"""GiraffeDet — heavy-neck detector (reference: src/models/giraffedet.py:20
is an EMPTY STUB: no backbone/neck/head are ever built and forward is
truncated; only necks/giraffeneck.py:16-295 exists).  This realizes the
paper's design (arXiv:2202.04256) the reference intended: a lightweight
space-to-depth backbone feeding the GFPN GiraffeNeck, with a GFLv2 head —
the same head family the reference pairs with GiraffeNeck in AIRDet."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import clip_boxes, unletterbox_boxes
from ..ops.nms import batched_nms
from ..registry import MODELS
from .bricks import ConvBNAct
from .heads.gflv2_head import GFocalHeadV2, gflv2_decode, gflv2_loss
from .necks.giraffe_neck import GiraffeNeck

_BN = dict(bn_momentum=0.97, bn_eps=1e-3)


def space_to_depth(x, block: int = 2):
    """S2D downsample (GiraffeDet paper §3.1): (B,H,W,C) → (B,H/b,W/b,C·b²)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // block, w // block, c * block * block)


class S2DBlock(nn.Module):
    """S2D + 1×1 fuse + 3×3 conv (paper's S2D-chain stage)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = space_to_depth(x)
        x = ConvBNAct(self.out_channels, 1, act="silu", **_BN,
                      name="fuse")(x, train)
        return ConvBNAct(self.out_channels, 3, act="silu", **_BN,
                         name="conv")(x, train)


class S2DChainBackbone(nn.Module):
    """Deliberately shallow backbone — GiraffeDet shifts capacity into the
    neck (paper Fig. 2)."""

    width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width
        x = ConvBNAct(w, 3, 2, act="silu", **_BN, name="stem1")(x, train)
        x = ConvBNAct(w, 3, 1, act="silu", **_BN, name="stem2")(x, train)
        c2 = S2DBlock(w * 2, name="s2d1")(x, train)    # /4
        c3 = S2DBlock(w * 4, name="s2d2")(c2, train)   # /8
        c4 = S2DBlock(w * 8, name="s2d3")(c3, train)   # /16
        c5 = S2DBlock(w * 8, name="s2d4")(c4, train)   # /32
        return [c3, c4, c5]


@MODELS.register(name="GiraffeDet")
class GiraffeDet(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    score_threshold: float = 0.05
    iou_threshold: float = 0.6
    max_det: int = 100
    reg_max: int = 14

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        size = (get("TYPE") or "giraffedet_s").split("_")[-1]
        width = {"s": 48, "m": 64, "l": 96}.get(size, 48)
        fpn = (width * 2, width * 4, width * 8)
        self.backbone = S2DChainBackbone(width=width)
        self.neck_in = tuple(fpn)
        self.neck = GiraffeNeck(fpn_channels=fpn, out_channels=fpn)
        self.head = GFocalHeadV2(
            num_classes=self.num_classes, feat_channels=fpn,
            reg_max=self.reg_max, conv_groups=1, stacked_convs=2)

    def _outs(self, images, train: bool):
        feats = self.backbone(images, train=train)
        feats = self.neck(feats, train=train)
        return self.head(feats, train=train)

    def _predict(self, outs, images, targets=None):
        cls_probs, reg_logits, priors = outs
        boxes = gflv2_decode(cls_probs, reg_logits, priors)
        dets = batched_nms(
            boxes, cls_probs.max(-1), cls_probs.argmax(-1),
            max_det=self.max_det, iou_threshold=self.iou_threshold,
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

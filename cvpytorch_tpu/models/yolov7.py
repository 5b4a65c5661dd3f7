"""YOLOv7 (reference: src/models/yolov7.py:152,
src/models/modules/yolov7_modules.py — EELAN :64, DownA :36,
FeatureFusion :98, SPPCSPC :122, RepConv :168.

Note: the reference backbone's ``build_stage_layer`` is an empty stub
(yolov7_csp_vovnet.py:46-53), so the stage layout here follows the
canonical YOLOv7 paper/releases: 3-conv stem → [Down + E-ELAN]×4, SPPCSPC
bridge, PAN with FeatureFusion blocks, RepConv pre-detect, and the YOLOv5
anchor-based detect machinery with the SimOTA YOLOv7Loss
(losses/yolov7_loss.py, reference src/losses/yolov7_loss.py:129)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import clip_boxes, unletterbox_boxes, xyxy_to_cxcywh
from ..ops.nms import yolo_non_max_suppression
from ..registry import MODELS
from .backbones.csp_darknet import SIZE_CFG
from .bricks import BatchNorm, ConvBNAct, make_divisible
from .detects.yolov5_detect import YOLOv5Detect, decode_yolov5
from .losses.yolov7_loss import YOLOv7Loss
from .necks.yolov5_neck import upsample2x

_BN = dict(bn_momentum=0.97, bn_eps=1e-3)

V7_ANCHORS = (
    ((1.5, 2.0), (2.375, 4.5), (5.0, 3.5)),
    ((2.25, 4.6875), (4.75, 3.4375), (4.5, 9.125)),
    ((4.4375, 3.4375), (6.0, 7.59375), (14.34375, 12.53125)),
)
STRIDES = (8.0, 16.0, 32.0)


class EELAN(nn.Module):
    """(reference: yolov7_modules.py:64)"""

    mid: int
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = lambda ch, k, name: ConvBNAct(ch, k, act="silu", **_BN, name=name)
        x1 = c(self.mid, 1, "conv1")(x, train)
        x2 = c(self.mid, 1, "conv2")(x, train)
        x3 = c(self.mid, 3, "conv3b")(c(self.mid, 3, "conv3a")(x2, train), train)
        x4 = c(self.mid, 3, "conv4b")(c(self.mid, 3, "conv4a")(x3, train), train)
        return c(self.out, 1, "conv5")(
            jnp.concatenate([x1, x2, x3, x4], -1), train)


class DownA(nn.Module):
    """maxpool+1×1 || 1×1+3×3/2 concat (reference: yolov7_modules.py:36)."""

    out_half: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = nn.max_pool(x, (2, 2), strides=(2, 2))
        b1 = ConvBNAct(self.out_half, 1, act="silu", **_BN,
                       name="b1")(b1, train)
        b2 = ConvBNAct(self.out_half, 1, act="silu", **_BN,
                       name="b2a")(x, train)
        b2 = ConvBNAct(self.out_half, 3, 2, act="silu", **_BN,
                       name="b2b")(b2, train)
        return jnp.concatenate([b1, b2], -1)


class FeatureFusion(nn.Module):
    """6-branch ELAN-W fusion (reference: yolov7_modules.py:98).

    Upstream quirk (yolov7_modules.py:111-119): the reference's forward
    applies ``conv4`` THREE times (x5 = conv4(x4), x6 = conv4(x5)) —
    its declared conv5/conv6 are dead parameters that never execute.
    We reproduce the executed computation (shared conv4), verified by the
    torch-oracle test; the dead modules are dropped at porting time."""

    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.out // 2
        c = lambda ch, k, name: ConvBNAct(ch, k, act="silu", **_BN, name=name)
        x1 = c(self.out, 1, "conv1")(x, train)
        x2 = c(self.out, 1, "conv2")(x, train)
        x3 = c(mid, 3, "conv3")(x2, train)
        conv4 = c(mid, 3, "conv4")
        x4 = conv4(x3, train)
        x5 = conv4(x4, train)
        x6 = conv4(x5, train)
        return c(self.out, 1, "conv7")(
            jnp.concatenate([x1, x2, x3, x4, x5, x6], -1), train)


class SPPCSPC(nn.Module):
    """(reference: yolov7_modules.py:122)"""

    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        hid = self.out
        c = lambda ch, k, name: ConvBNAct(ch, k, act="silu", **_BN, name=name)
        x1 = c(hid, 1, "cv4")(c(hid, 3, "cv3")(c(hid, 1, "cv1")(x, train),
                                               train), train)
        pools = [x1]
        for k in (5, 9, 13):
            pad = ((k // 2, k // 2), (k // 2, k // 2))
            pools.append(nn.max_pool(x1, (k, k), strides=(1, 1), padding=pad))
        y1 = c(hid, 3, "cv6")(c(hid, 1, "cv5")(
            jnp.concatenate(pools, -1), train), train)
        y2 = c(hid, 1, "cv2")(x, train)
        return c(self.out, 1, "cv7")(jnp.concatenate([y1, y2], -1), train)


class UpSampling(nn.Module):
    """1×1-reduce deep + nearest ×2, 1×1 lateral, concat
    (reference: yolov7_modules.py:85)."""

    out: int

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        x = ConvBNAct(self.out, 1, act="silu", **_BN, name="conv1")(x, train)
        y = ConvBNAct(self.out, 1, act="silu", **_BN, name="conv2")(y, train)
        return jnp.concatenate([upsample2x(x), y], -1)


class DownB(nn.Module):
    """DownA plus a pass-through lateral concat
    (reference: yolov7_modules.py:50)."""

    out_half: int

    @nn.compact
    def __call__(self, x, y, train: bool = False):
        b1 = nn.max_pool(x, (2, 2), strides=(2, 2))
        b1 = ConvBNAct(self.out_half, 1, act="silu", **_BN,
                       name="b1")(b1, train)
        b2 = ConvBNAct(self.out_half, 1, act="silu", **_BN,
                       name="b2a")(x, train)
        b2 = ConvBNAct(self.out_half, 3, 2, act="silu", **_BN,
                       name="b2b")(b2, train)
        return jnp.concatenate([b1, b2, y], -1)


class YOLOv7Neck(nn.Module):
    """SPPCSPC bridge + PAN of FeatureFusion blocks
    (reference: necks/yolov7_neck.py:13-57, oracle-tested end-to-end)."""

    spp_out: int                 # = in_channels[0] in the reference ctor
    out_channels: Sequence[int]  # (p3, p4, p5)

    @nn.compact
    def __call__(self, feats, train: bool = False):
        x3, x4, x5 = feats
        oc = self.out_channels
        x5 = SPPCSPC(self.spp_out, name="spp")(x5, train)
        x4_up = FeatureFusion(oc[1], name="featurefusion1_1")(
            UpSampling(oc[1], name="up1_1")(x5, x4, train), train)
        x3_up = FeatureFusion(oc[0], name="featurefusion1_2")(
            UpSampling(oc[0], name="up1_2")(x4_up, x3, train), train)
        x4_down = FeatureFusion(oc[1], name="featurefusion2_1")(
            DownB(oc[0], name="down2_1")(x3_up, x4_up, train), train)
        x5_down = FeatureFusion(oc[2], name="featurefusion2_2")(
            DownB(oc[1], name="down2_2")(x4_down, x5, train), train)
        return x3_up, x4_down, x5_down


class RepConv(nn.Module):
    """Train-form RepVGG-style conv with SiLU: 3×3+BN ∥ 1×1+BN
    (∥ identity BN when shapes allow) summed (reference:
    yolov7_modules.py:168-210; heads/yolov7_head.py wraps three of
    these).  BN eps 1e-3 / torch momentum 0.03 per the reference
    init_weight hooks."""

    out: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = dict(use_running_average=not train, momentum=0.97,
                  epsilon=1e-3)
        y3 = nn.Conv(self.out, (3, 3), strides=self.stride, padding=1,
                     use_bias=False, name="rbr_dense_conv")(x)
        y3 = BatchNorm(**bn, name="rbr_dense_bn")(y3)
        y1 = nn.Conv(self.out, (1, 1), strides=self.stride,
                     use_bias=False, name="rbr_1x1_conv")(x)
        y1 = BatchNorm(**bn, name="rbr_1x1_bn")(y1)
        out = y3 + y1
        if self.stride == 1 and x.shape[-1] == self.out:
            out = out + BatchNorm(**bn, name="rbr_identity")(x)
        return nn.silu(out)


class YOLOv7Head(nn.Module):
    """Three RepConvs, one per pyramid level
    (reference: heads/yolov7_head.py:12-41)."""

    out_channels: Sequence[int]

    @nn.compact
    def __call__(self, feats, train: bool = False):
        return tuple(
            RepConv(c, name=f"conv{i + 1}")(f, train)
            for i, (f, c) in enumerate(zip(feats, self.out_channels)))


@MODELS.register(name="YOLOv7")
class YOLOv7(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    conf_threshold: float = 0.001
    iou_threshold: float = 0.6
    max_det: int = 300

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        size = (get("TYPE") or "yolov7_l").split("_")[-1]
        _, wm = SIZE_CFG.get(size, (1.0, 1.0))
        self.wm = wm
        self.detect = YOLOv5Detect(num_classes=self.num_classes)
        loss_cfg = get("LOSS") or {}
        lget = loss_cfg.get if hasattr(loss_cfg, "get") else (lambda k, d=None: d)
        self.loss = YOLOv7Loss(
            num_classes=self.num_classes, anchors=V7_ANCHORS,
            strides=STRIDES,
            hyp_box=float(lget("hyp_box", 0.05) or 0.05),
            hyp_obj=float(lget("hyp_obj", 0.7) or 0.7),
            hyp_cls=float(lget("hyp_cls", 0.3) or 0.3))

    @nn.compact
    def _raw(self, images, train: bool):
        wm = self.wm
        ch = lambda c: make_divisible(c * wm)
        x = ConvBNAct(ch(32), 3, act="silu", **_BN, name="stem1")(images, train)
        x = ConvBNAct(ch(64), 3, 2, act="silu", **_BN, name="stem2")(x, train)
        x = ConvBNAct(ch(64), 3, act="silu", **_BN, name="stem3")(x, train)
        x = ConvBNAct(ch(128), 3, 2, act="silu", **_BN, name="down1")(x, train)
        x = EELAN(ch(64), ch(256), name="elan1")(x, train)        # /4
        x = DownA(ch(128), name="down2")(x, train)
        c3 = EELAN(ch(128), ch(512), name="elan2")(x, train)      # /8
        x = DownA(ch(256), name="down3")(c3, train)
        c4 = EELAN(ch(256), ch(1024), name="elan3")(x, train)     # /16
        x = DownA(ch(512), name="down4")(c4, train)
        c5 = EELAN(ch(256), ch(1024), name="elan4")(x, train)     # /32

        # neck (reference YOLOv7Neck: spp out = in_channels[0] = c3's width)
        p3, p4, p5 = YOLOv7Neck(
            spp_out=ch(512), out_channels=(ch(128), ch(256), ch(512)),
            name="neck")((c3, c4, c5), train)
        # head: RepConv expand per level (reference YOLOv7Head)
        o3, o4, o5 = YOLOv7Head(
            out_channels=(ch(256), ch(512), ch(1024)),
            name="head")((p3, p4, p5), train)
        # detect: the reference's wired YOLOv7Detect (yolov7_detect.py:73,
        # conf/coco_yolov7.yml:69) is mathematically the YOLOv5 detect —
        # the ImplicitA/M variant (YOLOv7Detect1) is dead code upstream.
        return self.detect((o3, o4, o5), train=train)

    def _normalized_targets(self, images, targets):
        h, w = images.shape[1:3]
        boxes = xyxy_to_cxcywh(targets["boxes"]) / jnp.array(
            [w, h, w, h], jnp.float32)
        return {"boxes": boxes, "labels": targets["labels"],
                "valid": targets["valid"]}

    def _predict(self, images, raw_outs, targets=None):
        decoded = decode_yolov5(raw_outs, V7_ANCHORS, STRIDES)
        dets = yolo_non_max_suppression(
            decoded, self.num_classes, conf_threshold=self.conf_threshold,
            iou_threshold=self.iou_threshold, max_det=self.max_det)
        h, w = images.shape[1:3]
        boxes = clip_boxes(dets["boxes"], h, w)
        if targets is not None and "pads" in targets:
            boxes = unletterbox_boxes(
                boxes, targets["pads"][:, None, :],
                targets["scales"][:, None, :])
        return {**dets, "boxes": boxes}

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        raw = self._raw(images, train=train)
        if mode == "train":
            total, losses = self.loss(
                raw, self._normalized_targets(images, targets), images=images)
            return total, {**losses, "loss": total}
        if mode == "val":
            total, losses = self.loss(
                raw, self._normalized_targets(images, targets), images=images)
            return ({**losses, "loss": total},
                    self._predict(images, raw, targets))
        return self._predict(images, raw, targets)

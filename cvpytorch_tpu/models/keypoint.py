"""Keypoint models (reference: src/models/openpose.py:20 — heatmap + PAF
multi-stage CNN; src/models/litepose.py:23).

``OpenPose``: backbone → shared feature conv → T refinement stages each
emitting heatmaps (K+1 channels incl. background) and PAFs (2·L); loss is
masked MSE against rendered gaussian/vector-field targets summed over
stages (the reference's intermediate supervision).  ``SimplePose``: a
deconv-head single-stage variant (heatmaps only).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import MODELS
from .backbones import build_backbone
from .bricks import BatchNorm, ConvBNAct


def render_gaussian_heatmaps(keypoints, valid, hw, sigma: float = 2.0):
    """keypoints (B, K, 2) in heatmap pixels; valid (B, K) → (B, h, w, K)."""
    h, w = hw
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    d2 = (xs[None, :, :, None] - keypoints[:, None, None, :, 0]) ** 2 + \
        (ys[None, :, :, None] - keypoints[:, None, None, :, 1]) ** 2
    hm = jnp.exp(-d2 / (2 * sigma**2))
    return hm * valid[:, None, None, :]


class PoseStage(nn.Module):
    out_channels: int
    n_convs: int = 5
    mid: int = 128
    kernel: int = 7

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_convs):
            x = ConvBNAct(self.mid, self.kernel if i else 3, act="relu",
                          bn_momentum=0.9, bn_eps=1e-5,
                          name=f"conv{i}")(x, train)
        x = ConvBNAct(self.mid, 1, act="relu", bn_momentum=0.9, bn_eps=1e-5,
                      name="conv_out1")(x, train)
        return nn.Conv(self.out_channels, (1, 1), name="conv_out2")(x)


@MODELS.register(name="OpenPose")
class OpenPose(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    # the OpenPose joint set: 17 COCO keypoints + synthesized neck
    # (reference add_neck, keypoint_target_transforms.py:85-114); heatmap
    # stages emit num_keypoints+1 channels (+background)
    num_keypoints: int = 18
    num_limbs: int = 19
    num_stages: int = 3
    heatmap_stride: int = 8

    def setup(self):
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        bb = get("BACKBONE") or {"name": "VGG", "subtype": "vgg16_bn",
                                 "out_stages": (3,)}
        self.backbone = build_backbone(
            dict(bb.items()) if hasattr(bb, "items") else bb)
        self.feat_conv = ConvBNAct(128, 3, act="relu", bn_momentum=0.9,
                                   bn_eps=1e-5)
        self.hm_stages = [
            PoseStage(self.num_keypoints + 1, name=f"hm_stage{t}")
            for t in range(self.num_stages)
        ]
        self.paf_stages = [
            PoseStage(2 * self.num_limbs, name=f"paf_stage{t}")
            for t in range(self.num_stages)
        ]

    def _forward(self, images, train: bool):
        feats = self.backbone(images, train=train)
        x = self.feat_conv(feats[0], train)
        hms, pafs = [], []
        base = x
        for hm_s, paf_s in zip(self.hm_stages, self.paf_stages):
            hm = hm_s(x, train)
            paf = paf_s(x, train)
            hms.append(hm)
            pafs.append(paf)
            x = jnp.concatenate([base, hm, paf], -1)
        return hms, pafs

    def _targets(self, images, targets):
        """Training targets: rendered IN-GRAPH from the collated padded
        COCO keypoints (``ops/paf.render_openpose_targets``, matching
        reference keypoint_target_transforms.py:200-246) — no host-side
        target transform, no precomputed fixtures.  Precomputed
        'heatmaps'/'pafs' are still honored when a pipeline supplies
        them."""
        if "heatmaps" in targets and "pafs" in targets:
            return targets["heatmaps"], targets["pafs"]
        from ..ops.paf import render_openpose_targets

        kp = targets["keypoints"]                    # (B, M, 17, 3)
        valid = targets.get("valid")
        if valid is None:
            valid = (kp[..., 2] > 0).any(-1)
        hm, paf = render_openpose_targets(
            kp, valid.astype(jnp.float32), tuple(images.shape[1:3]),
            stride=self.heatmap_stride)
        return jax.lax.stop_gradient(hm), jax.lax.stop_gradient(paf)

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        hms, pafs = self._forward(images, train=train)
        if mode == "infer":
            return {"heatmaps": hms[-1], "pafs": pafs[-1]}
        t_hm, t_paf = self._targets(images, targets)
        mask = targets.get("mask")
        m = mask[..., None] if mask is not None else 1.0
        hm_loss = sum(((hm - t_hm) ** 2 * m).mean() for hm in hms)
        paf_loss = sum(((paf - t_paf) ** 2 * m).mean() for paf in pafs)
        total = hm_loss + paf_loss
        losses = {"heatmap_loss": hm_loss, "paf_loss": paf_loss,
                  "loss": total}
        if mode == "train":
            return total, losses
        # val: bottom-up decode — peaks + PAF pair scoring + greedy
        # matching stay in-graph (fixed shapes); the tiny instance
        # assembly runs host-side in the evaluator bridge
        from ..ops.paf import (NUM_JOINTS, find_peaks, greedy_limb_match,
                               score_limb_pairs)

        xy, score, valid = find_peaks(hms[-1][..., :NUM_JOINTS])
        pair_scores, ok = score_limb_pairs(xy, valid, pafs[-1])
        conns = greedy_limb_match(pair_scores, ok)
        B = images.shape[0]
        stride = images.shape[1] // hms[-1].shape[1]
        preds = {
            "heatmaps": hms[-1], "pafs": pafs[-1],
            "peaks_xy": xy, "peaks_score": score, "conns": conns,
            "stride": jnp.full((B,), stride, jnp.int32),
        }
        return losses, preds


@MODELS.register(name="SimplePose")
class SimplePose(nn.Module):
    """Deconv-head heatmap pose (SimpleBaseline-style)."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    num_keypoints: int = 17

    def setup(self):
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        bb = get("BACKBONE") or {"name": "ResNet", "subtype": "resnet18",
                                 "out_stages": (4,)}
        self.backbone = build_backbone(
            dict(bb.items()) if hasattr(bb, "items") else bb)
        self.deconvs = [
            nn.ConvTranspose(256, (4, 4), strides=(2, 2), name=f"deconv{i}")
            for i in range(3)
        ]
        self.head = nn.Conv(self.num_keypoints, (1, 1), name="head")

    def _heatmaps(self, images, train: bool):
        x = self.backbone(images, train=train)[-1]
        for d in self.deconvs:
            x = nn.relu(d(x))
        return self.head(x)

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        hm = self._heatmaps(images, train=train)
        if mode == "infer":
            return decode_heatmaps(hm)
        t_hm = targets["heatmaps"]
        valid = targets.get("valid")
        w = valid[:, None, None, :] if valid is not None else 1.0
        loss = (((hm - t_hm) ** 2) * w).mean()
        losses = {"heatmap_loss": loss, "loss": loss}
        if mode == "train":
            return loss, losses
        return losses, decode_heatmaps(hm)


@MODELS.register(name="LitePose")
class LitePose(nn.Module):
    """Lite Pose (arXiv:2205.01271) — single-branch backbone + **fusion
    deconv head** with scale-aware multi-resolution supervision.

    The reference's ``src/models/litepose.py:23-74`` is an unfinished
    seg-style wrapper (CE loss, no LitePose backbone/head registered
    anywhere); this is the actual paper architecture: each deconv stage
    upsamples and fuses the matching backbone stage through a 1×1
    lateral, runs a large-kernel (7×7 depthwise) separable conv, and the
    last ``num_outputs`` stages each emit a heatmap head whose loss is
    computed against gaussians rendered at that scale.

    TPU notes: ConvTranspose + DW7×7 both map to MXU/vector units with
    static shapes; per-scale targets are rendered in-graph (no host
    round-trip)."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    num_keypoints: int = 17
    deconv_channels: Sequence[int] = (128, 64, 32)
    num_outputs: int = 2            # supervise the last N deconv scales
    sigma: float = 2.0

    def setup(self):
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        bb = get("BACKBONE") or {"name": "MobileNetV2",
                                 "out_stages": (2, 3, 5, 7),
                                 "width_mult": 1.0}
        self.backbone = build_backbone(
            dict(bb.items()) if hasattr(bb, "items") else bb)

    @nn.compact
    def _heatmap_pyramid(self, images, train: bool):
        feats = self.backbone(images, train=train)
        # feats: strides (4, 8, 16, 32); deconv from C5 up, fusing laterals
        x = feats[-1]
        outs = []
        n = len(self.deconv_channels)
        for i, ch in enumerate(self.deconv_channels):
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2),
                                 name=f"deconv{i}")(x)
            x = nn.relu(BatchNorm(use_running_average=not train,
                                     momentum=0.9, epsilon=1e-5,
                                     name=f"deconv_bn{i}")(x))
            skip = feats[len(feats) - 2 - i]
            x = x + nn.Conv(ch, (1, 1), name=f"lateral{i}")(skip)
            x = ConvBNAct(ch, 7, groups=ch, act="relu", bn_momentum=0.9,
                          bn_eps=1e-5, name=f"dw{i}")(x, train)
            x = ConvBNAct(ch, 1, act="relu", bn_momentum=0.9, bn_eps=1e-5,
                          name=f"pw{i}")(x, train)
            if i >= n - self.num_outputs:
                outs.append(nn.Conv(self.num_keypoints, (1, 1),
                                    name=f"final{i}")(x))
        return outs

    def _loss(self, hms, targets, images):
        ih = images.shape[1]
        if "keypoints" in targets:
            kp = targets["keypoints"]          # (B, K, 2/3) image px
            valid = targets.get("valid")
            if valid is None:
                valid = (kp[..., 2] > 0) if kp.shape[-1] > 2 \
                    else jnp.ones(kp.shape[:2], bool)
            total = 0.0
            for hm in hms:
                s = ih / hm.shape[1]
                t = render_gaussian_heatmaps(kp[..., :2] / s, valid,
                                             hm.shape[1:3], self.sigma)
                total = total + ((hm - t) ** 2).mean()
            return total
        t_hi = targets["heatmaps"]             # rendered at the top scale
        total = 0.0
        for hm in hms:
            t = t_hi if hm.shape[1:3] == t_hi.shape[1:3] else \
                jax.image.resize(t_hi, hm.shape[:3] + (t_hi.shape[-1],),
                                 "bilinear")
            total = total + ((hm - t) ** 2).mean()
        return total

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        hms = self._heatmap_pyramid(images, train=train)
        if mode == "infer":
            return decode_heatmaps(hms[-1])
        loss = self._loss(hms, targets, images)
        losses = {"heatmap_loss": loss, "loss": loss}
        if mode == "train":
            return loss, losses
        return losses, decode_heatmaps(hms[-1])


def decode_heatmaps(hm):
    """argmax per channel → (B, K, 3): x, y (heatmap px), confidence."""
    B, h, w, K = hm.shape
    flat = hm.reshape(B, h * w, K)
    idx = flat.argmax(1)
    conf = flat.max(1)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    return jnp.stack([xs, ys, conf], -1)


def keypoints_to_instances(kpts, in_hw, hm_hw, targets=None,
                           vis_threshold: float = 0.2):
    """Bridge ``decode_heatmaps`` output to the OKS COCO evaluator.

    kpts (B, K, 3) in heatmap pixels → one instance per image with
    keypoints in ORIGINAL image pixels (un-letterboxed through the
    padded-target ``pads``/``scales``), a bounding box over the confident
    keypoints, ``score`` = mean confidence and v=2 visibility flags —
    the dict `evaluator.coco.CocoEvaluator(iou_types=('bbox','keypoints'))`
    consumes.  (The reference's evaluator factory has a coco_keypoints
    branch, evaluator/__init__.py:30, but never wires a model to it; this
    completes the path for top-down single-instance heatmap models.)
    """
    B, K, _ = kpts.shape
    sy = in_hw[0] / hm_hw[0]
    sx = in_hw[1] / hm_hw[1]
    x = kpts[..., 0] * sx
    y = kpts[..., 1] * sy
    c = kpts[..., 2]
    if targets is not None and "pads" in targets:
        x = (x - targets["pads"][:, 0:1]) / targets["scales"][:, 0:1]
        y = (y - targets["pads"][:, 1:2]) / targets["scales"][:, 1:2]
    vis = c > vis_threshold
    big = jnp.where(vis, x, jnp.inf)
    small = jnp.where(vis, x, -jnp.inf)
    x1, x2 = jnp.min(big, 1), jnp.max(small, 1)
    big = jnp.where(vis, y, jnp.inf)
    small = jnp.where(vis, y, -jnp.inf)
    y1, y2 = jnp.min(big, 1), jnp.max(small, 1)
    any_vis = vis.any(1)
    boxes = jnp.where(
        any_vis[:, None],
        jnp.stack([x1, y1, x2, y2], -1),
        jnp.zeros((B, 4)))[:, None, :]                     # (B, 1, 4)
    out_kpts = jnp.stack(
        [x, y, jnp.where(vis, 2.0, 0.0)], -1)[:, None]     # (B, 1, K, 3)
    return {
        "boxes": boxes,
        "scores": jnp.mean(c, 1, keepdims=True),
        "labels": jnp.zeros((B, 1), jnp.int32),
        "valid": any_vis[:, None],
        "keypoints": out_kpts,
    }

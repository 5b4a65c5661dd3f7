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
from .bricks import ConvBNAct


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
    num_keypoints: int = 17
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

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        hms, pafs = self._forward(images, train=train)
        if mode == "infer":
            return {"heatmaps": hms[-1], "pafs": pafs[-1]}
        # targets: {'heatmaps': (B,h,w,K+1), 'pafs': (B,h,w,2L),
        #           'mask': (B,h,w)} rendered by the keypoint transforms
        mask = targets.get("mask")
        m = mask[..., None] if mask is not None else 1.0
        hm_loss = sum(((hm - targets["heatmaps"]) ** 2 * m).mean()
                      for hm in hms)
        paf_loss = sum(((paf - targets["pafs"]) ** 2 * m).mean()
                       for paf in pafs)
        total = hm_loss + paf_loss
        losses = {"heatmap_loss": hm_loss, "paf_loss": paf_loss,
                  "loss": total}
        if mode == "train":
            return total, losses
        return losses, {"heatmaps": hms[-1], "pafs": pafs[-1]}


@MODELS.register(name="SimplePose", aliases=("LitePose",))
class SimplePose(nn.Module):
    """Deconv-head heatmap pose (SimpleBaseline-style; the reference's
    LitePose slot, litepose.py:23)."""

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


def decode_heatmaps(hm):
    """argmax per channel → (B, K, 3): x, y (heatmap px), confidence."""
    B, h, w, K = hm.shape
    flat = hm.reshape(B, h * w, K)
    idx = flat.argmax(1)
    conf = flat.max(1)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    return jnp.stack([xs, ys, conf], -1)

"""EfficientDet (reference: src/models/efficientdet.py:52 +
efficientdet_extra.py (1305 LoC) + necks/bifpn.py + EfficientdetHead +
EfficientDetAnchors).

EfficientNet backbone + weighted BiFPN + shared box/class heads over
RetinaNet-style anchors (focal + smooth-L1)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..registry import MODELS, NECKS
from .backbones import build_backbone
from .bricks import ConvBNAct, DepthwiseSeparableConv
from .retinanet import RetinaHead, RetinaNet, retina_anchors

_BN = dict(bn_momentum=0.99, bn_eps=1e-3)


def _wsum(feats, w):
    """Fast normalized weighted fusion (relu weights / sum)."""
    w = jax.nn.relu(w)
    w = w / (w.sum() + 1e-4)
    return sum(wi * f for wi, f in zip(w, feats))


class BiFPNLayer(nn.Module):
    """One weighted bidirectional FPN pass (reference: necks/bifpn.py)."""

    channels: int = 64

    @nn.compact
    def __call__(self, feats, train: bool = False):
        import functools

        n = len(feats)
        conv = lambda name: DepthwiseSeparableConv(
            self.channels, 3, act="silu", bn_momentum=0.99, bn_eps=1e-3,
            name=name)
        up = lambda x, ref: jax.image.resize(
            x, (x.shape[0], ref.shape[1], ref.shape[2], x.shape[3]),
            "nearest")
        down = lambda x: nn.max_pool(x, (2, 2), strides=(2, 2))

        # top-down
        td = [None] * n
        td[n - 1] = feats[n - 1]
        for i in range(n - 2, -1, -1):
            w = self.param(f"w_td{i}", nn.initializers.ones, (2,))
            td[i] = conv(f"td{i}")(
                _wsum([feats[i], up(td[i + 1], feats[i])], w), train)
        # bottom-up
        out = [None] * n
        out[0] = td[0]
        for i in range(1, n):
            if i < n - 1:
                w = self.param(f"w_bu{i}", nn.initializers.ones, (3,))
                fused = _wsum([feats[i], td[i], down(out[i - 1])], w)
            else:
                w = self.param(f"w_bu{i}", nn.initializers.ones, (2,))
                fused = _wsum([feats[i], down(out[i - 1])], w)
            out[i] = conv(f"bu{i}")(fused, train)
        return tuple(out)


@NECKS.register(name="BiFPN")
class BiFPN(nn.Module):
    channels: int = 64
    repeats: int = 3
    num_levels: int = 5

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # project inputs + add extra levels (P6, P7)
        proj = [
            ConvBNAct(self.channels, 1, act=None, **_BN,
                      name=f"proj{i}")(f, train)
            for i, f in enumerate(feats)
        ]
        x = proj[-1]
        for e in range(self.num_levels - len(feats)):
            x = ConvBNAct(self.channels, 3, 2, act=None, **_BN,
                          name=f"extra{e}")(x, train)
            proj.append(x)
        out = tuple(proj)
        for r in range(self.repeats):
            out = BiFPNLayer(self.channels, name=f"bifpn{r}")(out, train)
        return out


@MODELS.register(name="EfficientDet")
class EfficientDet(RetinaNet):
    """Shares RetinaNet's anchor/loss machinery with an EfficientNet+BiFPN
    feature extractor and lighter heads."""

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        bb = get("BACKBONE") or {"name": "EfficientNet",
                                 "subtype": "efficientnet_b0",
                                 "out_stages": (3, 5, 7)}
        self.backbone = build_backbone(
            dict(bb.items()) if hasattr(bb, "items") else bb)
        neck_cfg = get("NECK") or {}
        nget = neck_cfg.get if hasattr(neck_cfg, "get") else (lambda k, d=None: d)
        self.fpn = BiFPN(channels=int(nget("channels", 64) or 64),
                         repeats=int(nget("repeats", 3) or 3))
        self.head = RetinaHead(self.num_classes, channels=64)

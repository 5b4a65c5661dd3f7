"""LSPNet and SGCPNet — the last two self-contained reference segmenters
(reference: src/models/lspnet.py:23, src/models/sgcpnet.py:24)."""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import dictionary_to_names_weights
from ..registry import MODELS
from .backbones import build_backbone
from .bricks import ConvBNAct
from .heads.seg_heads import resize_bilinear
from .light_seg import _seg_out

_BN = dict(bn_momentum=0.9, bn_eps=1e-5)


@MODELS.register(name="LSPNet")
class LSPNet(nn.Module):
    """Lightweight two-path (high/low resolution) net with bidirectional
    interaction (reference: lspnet.py:23)."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    high_channels: Sequence[int] = (8, 24, 48, 96, 96)
    low_channels: Sequence[int] = (8, 24, 48, 96, 96)

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self.num_classes = len(names)
        self._w = tuple(weights)

    @nn.compact
    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        high = images
        low = resize_bilinear(images, (images.shape[1] // 2,
                                       images.shape[2] // 2))
        for si, (hc, lc) in enumerate(zip(self.high_channels,
                                          self.low_channels)):
            stride = 2 if si < 3 else 1
            high = ConvBNAct(hc, 3, stride, act="relu", **_BN,
                             name=f"h{si}a")(high, train)
            high = ConvBNAct(hc, 3, act="relu", **_BN,
                             name=f"h{si}b")(high, train)
            low = ConvBNAct(lc, 3, stride, act="relu", **_BN,
                            name=f"l{si}a")(low, train)
            low = ConvBNAct(lc, 3, act="relu", **_BN,
                            name=f"l{si}b")(low, train)
            if si >= 2:  # bidirectional interaction
                high = high + resize_bilinear(low, high.shape[1:3])
                low = low + resize_bilinear(high, low.shape[1:3])
        f = jnp.concatenate(
            [high, resize_bilinear(low, high.shape[1:3])], -1)
        logits = nn.Conv(self.num_classes, (1, 1), name="head")(f)
        logits = resize_bilinear(logits, images.shape[1:3])
        return _seg_out(logits, targets, mode, self._w)


@MODELS.register(name="SGCPNet")
class SGCPNet(nn.Module):
    """Spatial-guided context-path net on MobileNetV3
    (reference: sgcpnet.py:24)."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self.num_classes = len(names)
        self._w = tuple(weights)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        bb = get("BACKBONE") or {"name": "MobileNetV3",
                                 "subtype": "mobilenet_v3_small"}
        self.backbone = build_backbone(
            dict(bb.items()) if hasattr(bb, "items") else bb)

    @nn.compact
    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        feats = self.backbone(images, train=train)
        c8, c16, c32 = feats[-3], feats[-2], feats[-1]
        # spatial path: shallow strided convs at /8
        sp = images
        for i, ch in enumerate((16, 32, 64)):
            sp = ConvBNAct(ch, 3, 2, act="relu", **_BN,
                           name=f"sp{i}")(sp, train)
        # context path: global-context-boosted deep features
        g = jnp.mean(c32, axis=(1, 2), keepdims=True)
        c32 = c32 * nn.sigmoid(
            nn.Conv(c32.shape[-1], (1, 1), name="gc")(g))
        ctx = ConvBNAct(64, 1, act="relu", **_BN, name="p32")(c32, train)
        ctx = resize_bilinear(ctx, c16.shape[1:3]) + \
            ConvBNAct(64, 1, act="relu", **_BN, name="p16")(c16, train)
        ctx = resize_bilinear(ctx, sp.shape[1:3]) + \
            ConvBNAct(64, 1, act="relu", **_BN, name="p8")(c8, train)
        f = jnp.concatenate([sp, ctx], -1)
        f = ConvBNAct(64, 3, act="relu", **_BN, name="fuse")(f, train)
        logits = nn.Conv(self.num_classes, (1, 1), name="head")(f)
        logits = resize_bilinear(logits, images.shape[1:3])
        return _seg_out(logits, targets, mode, self._w)

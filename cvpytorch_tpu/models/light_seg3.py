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


def resize_align_corners(x, size):
    """Bilinear resize with torch align_corners=True semantics (output
    pixel i samples input coord i·(in−1)/(out−1)) — jax.image.resize only
    offers half-pixel centers.  Separable gathers, jit-static shapes."""
    B, H, W, C = x.shape
    th, tw = size
    if (H, W) == (th, tw):
        return x

    def axis_resize(v, in_n, out_n, axis):
        if in_n == out_n:
            return v
        pos = jnp.arange(out_n) * ((in_n - 1) / max(out_n - 1, 1))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, in_n - 1)
        hi = jnp.clip(lo + 1, 0, in_n - 1)
        w = (pos - lo).astype(x.dtype)
        a = jnp.take(v, lo, axis=axis)
        b = jnp.take(v, hi, axis=axis)
        shape = [1] * v.ndim
        shape[axis] = out_n
        return a + (b - a) * w.reshape(shape)

    x = axis_resize(x, H, th, 1)
    return axis_resize(x, W, tw, 2)


class _LSPBaseNet(nn.Module):
    """One resolution path (reference lspnet_backbone.py BaseNet):
    depths [1,3,3,10,10] of ConvBNReLU 3×3, strides [2,2,2,2,1]."""

    channels: Sequence[int] = (8, 24, 48, 96, 96)
    depths: Sequence[int] = (1, 3, 3, 10, 10)
    strides: Sequence[int] = (2, 2, 2, 2, 1)

    def setup(self):
        stages = []
        for si, (c, d, st) in enumerate(zip(self.channels, self.depths,
                                            self.strides)):
            stages.append([
                ConvBNAct(c, 3, st if i == 0 else 1, act="relu", **_BN,
                          name=f"stage{si}_{i}")
                for i in range(d)])
        self.stages = stages

    def stage(self, idx, x, train):
        for blk in self.stages[idx]:
            x = blk(x, train)
        return x

    def __call__(self, x, train: bool = False):   # unused; kept for init
        for i in range(len(self.stages)):
            x = self.stage(i, x, train)
        return x


@MODELS.register(name="LSPNet")
class LSPNet(nn.Module):
    """LSPNet (reference lspnet.py:23-80 + lspnet_backbone.py:13-97 +
    lspnet_head.py:12-35): TWO BaseNet paths fed the input at the
    configured resolutions (align_corners=True resizes!), bi-directional
    interaction after stages 2 and 3, concat + 1×1 classifier, output
    upsampled align_corners=False."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    resolutions: Sequence[float] = (0.75, 0.25)   # s variant
    channels: Sequence[int] = (8, 24, 48, 96, 96)
    depths: Sequence[int] = (1, 3, 3, 10, 10)

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self.num_classes = len(names)
        self._w = tuple(weights)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        t = str(get("TYPE") or "lspnet_s").split("_")[-1]
        res = {"s": (0.75, 0.25), "m": (1.0, 0.25),
               "l": (1.0, 0.25)}.get(t, tuple(self.resolutions))
        chs = {"l": (8, 24, 64, 160, 160)}.get(t, tuple(self.channels))
        self._res = res
        self.high_net = _LSPBaseNet(chs, tuple(self.depths))
        self.low_net = _LSPBaseNet(chs, tuple(self.depths))
        self.classifier = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                                  name="classifier")

    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        H, W = images.shape[1:3]
        r1, r2 = self._res
        xh = resize_align_corners(images, (int(H * r1), int(W * r1)))
        xl = resize_align_corners(images, (int(H * r2), int(W * r2)))
        for i in range(3):
            xh = self.high_net.stage(i, xh, train)
            xl = self.low_net.stage(i, xl, train)
        xh, xl = self._bi(xh, xl)
        xh = self.high_net.stage(3, xh, train)
        xl = self.low_net.stage(3, xl, train)
        xh, xl = self._bi(xh, xl)
        xh = self.high_net.stage(4, xh, train)
        xl = self.low_net.stage(4, xl, train)
        cat = jnp.concatenate(
            [xh, resize_align_corners(xl, xh.shape[1:3])], -1)
        logits = self.classifier(cat)
        logits = resize_bilinear(logits, (H, W))   # align_corners=False
        return _seg_out(logits, targets, mode, self._w)

    @staticmethod
    def _bi(xh, xl):
        return (xh + resize_align_corners(xl, xh.shape[1:3]),
                xl + resize_align_corners(xh, xl.shape[1:3]))


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

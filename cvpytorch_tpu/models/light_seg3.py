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
from .bricks import BatchNorm, ConvBNAct
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


class _SGCPSe(nn.Module):
    """SE with BN'd 1×1 convs + hard-sigmoid (sgcpnet_backbone.py:12-25)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(c // 4, (1, 1), use_bias=False, name="fc1")(g)
        g = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn1")(g)
        g = nn.relu(g)
        g = nn.Conv(c, (1, 1), use_bias=False, name="fc2")(g)
        g = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn2")(g)
        return x * jnp.clip((g + 3.0) / 6.0, 0.0, 1.0)   # hardsigmoid


def _hswish(x):
    return x * jnp.clip((x + 3.0) / 6.0, 0.0, 1.0)


class _SGCPBlock(nn.Module):
    """MobileNetV3-style inverted residual (sgcpnet_backbone.py:28-58):
    shortcut whenever stride==1 (1×1+BN projection if channels differ)."""

    k: int
    expand: int
    out: int
    act: str          # 'relu' | 'hswish'
    se: bool
    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        act = nn.relu if self.act == "relu" else _hswish
        bn = lambda nm: BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name=nm)
        h = act(bn("bn1")(nn.Conv(self.expand, (1, 1), use_bias=False,
                                  name="conv1")(x)))
        h = act(bn("bn2")(nn.Conv(self.expand, (self.k, self.k),
                                  strides=self.stride,
                                  padding=self.k // 2,
                                  feature_group_count=self.expand,
                                  use_bias=False, name="conv2")(h)))
        h = bn("bn3")(nn.Conv(self.out, (1, 1), use_bias=False,
                              name="conv3")(h))
        if self.se:
            h = _SGCPSe(name="se")(h, train)
        if self.stride == 1:
            sc = x
            if x.shape[-1] != self.out:
                sc = bn("sc_bn")(nn.Conv(self.out, (1, 1), use_bias=False,
                                         name="sc_conv")(x))
            h = h + sc
        return h


# (k, expand, out, act, se, stride) rows per stage
_SGCP_STAGES = (
    ((3, 16, 16, "relu", True, 2),),
    ((3, 72, 24, "relu", False, 2), (3, 88, 24, "relu", False, 1)),
    ((5, 96, 40, "hswish", True, 2), (5, 240, 40, "hswish", True, 1),
     (5, 240, 40, "hswish", True, 1), (5, 120, 48, "hswish", True, 1),
     (5, 144, 48, "hswish", True, 1)),
    ((5, 288, 96, "hswish", True, 2), (5, 576, 96, "hswish", True, 1),
     (5, 576, 96, "hswish", True, 1)),
)


@MODELS.register(name="SGCPNet")
class SGCPNet(nn.Module):
    """SGCPNet (reference sgcpnet.py:24-74 + sgcpnet_backbone.py:60-140 +
    sgcpnet_head.py:14-202): MobileNetV3-small-style backbone (out
    stages /8 /16 /32) and a double-pass weighted-fusion head — 1×1
    shrinks, effdet-style P6/P7 synthesis, relu-weight fast-attention
    sums with swish, act-free DepthwiseConvModules (BN momentum 0.01 →
    flax 0.99, eps 1e-3), second top-down pass, classifier at P3,
    bilinear upsample to input."""

    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    shrink_channels: Sequence[int] = (40, 112, 320)  # conf values
    mid_channels: int = 64

    def setup(self):
        names, weights = dictionary_to_names_weights(list(self.dictionary))
        self.num_classes = len(names)
        self._w = tuple(weights)

    @nn.compact
    def __call__(self, images, targets=None, mode: str = "infer"):
        train = mode == "train"
        bn99 = dict(momentum=0.99, epsilon=1e-3)
        # -- backbone ----------------------------------------------------
        x = nn.Conv(16, (3, 3), strides=2, padding=1, use_bias=False,
                    name="stem_conv")(images)
        x = BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="stem_bn")(x)
        x = _hswish(x)
        feats = []
        for si, rows in enumerate(_SGCP_STAGES):
            for bi, (k, e, o, a, se, st) in enumerate(rows):
                x = _SGCPBlock(k, e, o, a, se, st,
                               name=f"stage{si + 1}_{bi}")(x, train)
            if si >= 1:
                feats.append(x)                    # /8, /16, /32
        p3, p4, p5 = feats

        # -- head --------------------------------------------------------
        sc = self.shrink_channels
        mid = self.mid_channels
        p3 = nn.Conv(sc[0], (1, 1), use_bias=True, name="shrink3")(p3)
        p4 = nn.Conv(sc[1], (1, 1), use_bias=True, name="shrink4")(p4)
        p5 = nn.Conv(sc[2], (1, 1), use_bias=True, name="shrink5")(p5)

        def convbn(ch, name):
            def f(v):
                v = nn.Conv(ch, (1, 1), use_bias=True,
                            name=f"{name}_conv")(v)
                return BatchNorm(use_running_average=not train, **bn99,
                                    name=f"{name}_bn")(v)
            return f

        def maxpool(v):
            return nn.max_pool(v, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

        def dwmod(name):
            def f(v):
                c = v.shape[-1]
                v = nn.Conv(c, (3, 3), padding=1, feature_group_count=c,
                            use_bias=False, name=f"{name}_dw")(v)
                v = BatchNorm(use_running_average=not train, **bn99,
                                 name=f"{name}_dwbn")(v)
                v = nn.Conv(c, (1, 1), use_bias=False,
                            name=f"{name}_pw")(v)
                return BatchNorm(use_running_average=not train, **bn99,
                                    name=f"{name}_pwbn")(v)
            return f

        def up_to(v, ref):
            # the reference uses size-targeted nn.Upsample(nearest)
            if v.shape[1:3] == ref.shape[1:3]:
                return v
            return jax.image.resize(
                v, (v.shape[0], ref.shape[1], ref.shape[2], v.shape[3]),
                "nearest")

        def wsum(name, parts, n):
            w = jax.nn.relu(self.param(name, nn.initializers.ones, (n,)))
            w = w / (w.sum() + 1e-4)
            s = sum(w[i] * p for i, p in enumerate(parts))
            return s * jax.nn.sigmoid(s)           # swish

        p6_in = maxpool(convbn(mid, "p5_to_p6")(p5))
        p7_in = maxpool(p6_in)
        p3_in = convbn(mid, "p3_dc")(p3)
        p4_in = convbn(mid, "p4_dc")(p4)
        p5_in = convbn(mid, "p5_dc")(p5)

        p6_up = dwmod("conv6_up")(wsum("p6_w1", [p6_in, up_to(p7_in, p6_in)], 2))
        p5_up = dwmod("conv5_up")(wsum("p5_w1", [p5_in, up_to(p6_up, p5_in)], 2))
        p4_up = dwmod("conv4_up")(wsum("p4_w1", [p4_in, up_to(p5_up, p4_in)], 2))
        p3_out = dwmod("conv3_up")(wsum("p3_w1", [p3_in, up_to(p4_up, p3_in)], 2))

        p4_in = convbn(mid, "p4_dc2")(p4)
        p5_in = convbn(mid, "p5_dc2")(p5)

        p4_out = dwmod("conv4_down")(wsum(
            "p4_w2", [p4_in, up_to(p4_up, p4_in),
                      up_to(maxpool(p3_out), p4_in)], 3))
        p5_out = dwmod("conv5_down")(wsum(
            "p5_w2", [p5_in, up_to(p5_up, p5_in),
                      up_to(maxpool(p4_out), p5_in)], 3))
        p6_out = dwmod("conv6_down")(wsum(
            "p6_w2", [p6_in, up_to(p6_up, p6_in),
                      up_to(maxpool(p5_out), p6_in)], 3))
        p7_out = dwmod("conv7_down")(wsum(
            "p7_w2", [p7_in, up_to(maxpool(p6_out), p7_in)], 2))

        p6_up = dwmod("conv6_up2")(wsum("p6_w1_2", [p6_out, up_to(p7_out, p6_out)], 2))
        p5_up = dwmod("conv5_up2")(wsum("p5_w1_2", [p5_out, up_to(p6_up, p5_out)], 2))
        p4_up = dwmod("conv4_up2")(wsum("p4_w1_2", [p4_out, up_to(p5_up, p4_out)], 2))
        p3_fin = dwmod("conv3_up2")(wsum("p3_w1_2", [p3_out, up_to(p4_up, p3_out)], 2))

        logits = nn.Conv(self.num_classes, (1, 1), use_bias=True,
                         name="classifier")(p3_fin)
        logits = resize_bilinear(logits, images.shape[1:3])
        return _seg_out(logits, targets, mode, self._w)

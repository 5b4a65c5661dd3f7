"""Segmentation transformer backbones
(reference: src/models/backbones/seg/mix_transformer.py — SegFormer's MiT
with spatial-reduction attention; src/models/backbones/seg/mscan.py —
SegNeXt's multi-scale conv-attention network).

Native Flax/NHWC; attention maps to MXU matmuls, strip convolutions stay
VPU-friendly depthwise ops."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import BACKBONES
from ..bricks import BatchNorm, DropPath

def _gelu(x):
    """Exact (erf) GELU — torch nn.GELU default; jax nn.gelu defaults to
    the tanh approximation, which diverges ~1e-3 per activation."""
    return jax.nn.gelu(x, approximate=False)


_MIT_SPECS = {  # dims, depths, heads, sr_ratios
    "mit_b0": ((32, 64, 160, 256), (2, 2, 2, 2)),
    "mit_b1": ((64, 128, 320, 512), (2, 2, 2, 2)),
    "mit_b2": ((64, 128, 320, 512), (3, 4, 6, 3)),
    "mit_b3": ((64, 128, 320, 512), (3, 4, 18, 3)),
    "mit_b4": ((64, 128, 320, 512), (3, 8, 27, 3)),
    "mit_b5": ((64, 128, 320, 512), (3, 6, 40, 3)),
}
_MIT_HEADS = (1, 2, 5, 8)
_MIT_SR = (8, 4, 2, 1)


class EfficientAttention(nn.Module):
    dim: int
    heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        B, N, C = x.shape
        q = nn.Dense(self.dim, name="q")(x)
        kv_in = x
        if self.sr_ratio > 1:
            sp = x.reshape(B, h, w, C)
            sp = nn.Conv(self.dim, (self.sr_ratio, self.sr_ratio),
                         strides=self.sr_ratio, name="sr")(sp)
            kv_in = nn.LayerNorm(name="sr_norm")(
                sp.reshape(B, -1, self.dim))
        k = nn.Dense(self.dim, name="k")(kv_in)
        v = nn.Dense(self.dim, name="v")(kv_in)
        hd = self.dim // self.heads
        q = q.reshape(B, N, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, self.heads, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) / jnp.sqrt(hd), -1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


class MixFFN(nn.Module):
    dim: int
    expand: int = 4

    @nn.compact
    def __call__(self, x, hw):
        h, w = hw
        B, N, C = x.shape
        hdim = self.dim * self.expand
        y = nn.Dense(hdim, name="fc1")(x)
        sp = y.reshape(B, h, w, hdim)
        sp = nn.Conv(hdim, (3, 3), padding=1, feature_group_count=hdim,
                     name="dwconv")(sp)
        y = _gelu(sp.reshape(B, N, hdim))
        return nn.Dense(self.dim, name="fc2")(y)


@BACKBONES.register(name="MixVisionTransformer", aliases=("mit",))
class MixVisionTransformer(nn.Module):
    subtype: str = "mit_b0"
    out_stages: Sequence[int] = (1, 2, 3, 4)
    classifier: bool = False
    num_classes: int = 1000
    drop_path_rate: float = 0.1
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims, depths = _MIT_SPECS[self.subtype]
        total = sum(depths)
        bi = 0
        feats = []
        for si in range(4):
            patch = 7 if si == 0 else 3
            stride = 4 if si == 0 else 2
            x = nn.Conv(dims[si], (patch, patch), strides=stride,
                        padding=patch // 2, name=f"patch{si}")(x)
            B, h, w, C = x.shape
            t = nn.LayerNorm(name=f"patch_norm{si}")(x.reshape(B, h * w, C))
            for j in range(depths[si]):
                dp = self.drop_path_rate * bi / max(total - 1, 1)
                a = EfficientAttention(dims[si], _MIT_HEADS[si], _MIT_SR[si],
                                       name=f"attn{si}_{j}")(
                    nn.LayerNorm(name=f"ln1_{si}_{j}")(t), (h, w))
                t = t + DropPath(dp, name=f"dp1_{si}_{j}")(a, train)
                f = MixFFN(dims[si], name=f"ffn{si}_{j}")(
                    nn.LayerNorm(name=f"ln2_{si}_{j}")(t), (h, w))
                t = t + DropPath(dp, name=f"dp2_{si}_{j}")(f, train)
                bi += 1
            t = nn.LayerNorm(name=f"out_norm{si}")(t)
            x = t.reshape(B, h, w, dims[si])
            if (si + 1) in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            return nn.Dense(self.num_classes, name="fc")(
                jnp.mean(x, axis=(1, 2)))
        return tuple(feats)


# ---------------------------------------------------------------- MSCAN --
_MSCAN_SPECS = {
    "mscan_t": ((32, 64, 160, 256), (3, 3, 5, 2)),
    "mscan_s": ((64, 128, 320, 512), (2, 2, 4, 2)),
    "mscan_b": ((64, 128, 320, 512), (3, 3, 12, 3)),
    "mscan_l": ((64, 128, 320, 512), (3, 5, 27, 3)),
}
_MSCAN_MLP = (8, 8, 4, 4)    # per-stage MLP ratios (reference mscan.py:186)


class MSCAttention(nn.Module):
    """Multi-scale strip-conv attention (SegNeXt)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        u = x
        a = nn.Conv(self.dim, (5, 5), padding=2, feature_group_count=self.dim,
                    name="conv5")(x)
        # the three strip branches all read conv5's output IN PARALLEL
        # (reference mscan.py:76-92: attn_0/1/2 each from `attn`, then
        # summed) — not chained
        out = a
        for i, k in enumerate((7, 11, 21)):
            b = nn.Conv(self.dim, (1, k), padding=((0, 0), (k // 2, k // 2)),
                        feature_group_count=self.dim, name=f"h{i}")(a)
            b = nn.Conv(self.dim, (k, 1), padding=((k // 2, k // 2), (0, 0)),
                        feature_group_count=self.dim, name=f"v{i}")(b)
            out = out + b
        out = nn.Conv(self.dim, (1, 1), name="mix")(out)
        return u * out


class MSCANBlock(nn.Module):
    dim: int
    drop_rate: float = 0.0
    mlp_ratio: int = 4      # reference mscan.py:187: [8, 8, 4, 4] per stage

    @nn.compact
    def __call__(self, x, train: bool = False):
        n1 = BatchNorm(use_running_average=not train, momentum=0.9,
                          name="bn1")(x)
        h = nn.Conv(self.dim, (1, 1), name="proj1")(n1)
        h = _gelu(h)
        h = MSCAttention(self.dim, name="attn")(h)
        h = nn.Conv(self.dim, (1, 1), name="proj2")(h)
        # SpatialAttention carries its OWN inner residual around the
        # gating unit (reference mscan.py:104-114: x = ... + shorcut)
        h = h + n1
        ls1 = self.param("ls1", nn.initializers.constant(1e-2), (self.dim,))
        x = x + DropPath(self.drop_rate, name="dp1")(h * ls1, train)
        h = BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn2")(x)
        hdim = self.dim * self.mlp_ratio
        h = nn.Conv(hdim, (1, 1), name="ffn1")(h)
        h = nn.Conv(hdim, (3, 3), padding=1, feature_group_count=hdim,
                    name="ffn_dw")(h)
        h = _gelu(h)
        h = nn.Conv(self.dim, (1, 1), name="ffn2")(h)
        ls2 = self.param("ls2", nn.initializers.constant(1e-2), (self.dim,))
        return x + DropPath(self.drop_rate, name="dp2")(h * ls2, train)


@BACKBONES.register(name="MSCAN", aliases=("mscan",))
class MSCAN(nn.Module):
    subtype: str = "mscan_t"
    out_stages: Sequence[int] = (2, 3, 4)
    classifier: bool = False
    num_classes: int = 1000
    drop_path_rate: float = 0.1
    pretrained: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims, depths = _MSCAN_SPECS[self.subtype]
        total = sum(depths)
        bi = 0
        feats = []
        for si in range(4):
            if si == 0:
                x = nn.Conv(dims[0] // 2, (3, 3), strides=2, padding=1,
                            name="stem1")(x)
                x = BatchNorm(use_running_average=not train, momentum=0.9,
                                 name="stem_bn1")(x)
                x = _gelu(x)
                x = nn.Conv(dims[0], (3, 3), strides=2, padding=1,
                            name="stem2")(x)
                x = BatchNorm(use_running_average=not train, momentum=0.9,
                                 name="stem_bn2")(x)
            else:
                x = nn.Conv(dims[si], (3, 3), strides=2, padding=1,
                            name=f"down{si}")(x)
                x = BatchNorm(use_running_average=not train, momentum=0.9,
                                 name=f"down_bn{si}")(x)
            for j in range(depths[si]):
                x = MSCANBlock(
                    dims[si],
                    drop_rate=self.drop_path_rate * bi / max(total - 1, 1),
                    mlp_ratio=_MSCAN_MLP[si],
                    name=f"stage{si+1}_block{j}")(x, train)
                bi += 1
            # per-stage token LayerNorm (reference mscan.py:224,244)
            x = nn.LayerNorm(epsilon=1e-5, name=f"out_ln{si}")(x)
            if (si + 1) in self.out_stages and not self.classifier:
                feats.append(x)
        if self.classifier:
            return nn.Dense(self.num_classes, name="fc")(
                jnp.mean(x, axis=(1, 2)))
        return tuple(feats)


# ---------------------------------------------------------- IncepFormer
# (reference: src/models/backbones/seg/incep_transformer.py:16-324 —
# "IncepFormer: Efficient Inception Transformer with Pyramid Pooling",
# used by conf/seg/incepformer/*.yml via the EncoderDecoder)

_IPT_SPECS = {  # out_channels, depths, heads, mlp_ratios, down_ratios
    "ipt_t": ((64, 128, 320, 512), (2, 2, 4, 2)),
    "ipt_s": ((64, 128, 320, 512), (3, 4, 12, 2)),
    "ipt_b": ((64, 128, 320, 512), (3, 6, 24, 2)),
}
_IPT_HEADS = (2, 4, 8, 16)
_IPT_MLP = (8, 8, 4, 4)
_IPT_DOWN = (8, 4, 2, 1)


class _IncepAttention(nn.Module):
    """Inception token mixer: K/V pool the map three ways — separable
    strided DW (1×r then r×1), square strided DW (r×r), and average-pool +
    DW3×3 — concatenated (reference incep_transformer.py:66-146)."""

    dim: int
    heads: int
    down_ratio: int
    # the reference ctor passes qk_scale=True, and `qk_scale or hd**-0.5`
    # evaluates to True ⇒ the attention scale is literally 1.0 upstream
    # (incep_transformer.py:71,236) — replicated for parity
    scale: float = 1.0

    @nn.compact
    def __call__(self, x, train: bool = False):  # x: (B, H, W, C)
        B, H, W, C = x.shape
        N = H * W
        tokens = x.reshape(B, N, C)
        q = nn.Dense(self.dim, use_bias=True, name="q")(tokens)
        r = self.down_ratio
        if r > 1:
            x1 = nn.Conv(self.dim, (1, r), strides=(1, r),
                         feature_group_count=self.dim, name="conv1a")(x)
            x1 = nn.Conv(self.dim, (r, 1), strides=(r, 1),
                         feature_group_count=self.dim, name="conv1b")(x1)
            x2 = nn.Conv(self.dim, (r, r), strides=(r, r),
                         feature_group_count=self.dim, name="conv2")(x)
            x3 = nn.avg_pool(x, (r, r), strides=(r, r))
            x3 = nn.Conv(self.dim, (3, 3), padding=1,
                         feature_group_count=self.dim, name="dwconv")(x3)
            pooled = jnp.concatenate([
                x1.reshape(B, -1, C), x2.reshape(B, -1, C),
                x3.reshape(B, -1, C)], 1)
            pooled = nn.LayerNorm(name="norm")(pooled)
        else:
            pooled = tokens
        kv = nn.Dense(self.dim * 2, use_bias=True, name="kv")(pooled)
        k, v = jnp.split(kv, 2, -1)
        hd = self.dim // self.heads
        q = q.reshape(B, N, self.heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, self.heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, self.heads, hd).transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * self.scale, -1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.dim)
        out = nn.Dense(self.dim, use_bias=True, name="proj")(out)
        return out.reshape(B, H, W, C)


class _IncepMlp(nn.Module):
    """1×1 → DW3×3 → 1×1 convs, GELU after each
    (reference incep_transformer.py:57-63)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = _gelu(nn.Conv(self.hidden, (1, 1), name="fc1")(x))
        x = _gelu(nn.Conv(self.hidden, (3, 3), padding=1,
                            feature_group_count=self.hidden,
                            name="dwconv")(x))
        return _gelu(nn.Conv(self.dim, (1, 1), name="fc2")(x))


class _IncepBlock(nn.Module):
    dim: int
    heads: int
    down_ratio: int
    mlp_ratio: int
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda nm: BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name=nm)
        y = _IncepAttention(self.dim, self.heads, self.down_ratio,
                            name="attn")(bn("norm1")(x), train)
        x = x + DropPath(self.drop_path)(y, train)
        y = _IncepMlp(self.dim, int(self.dim * self.mlp_ratio),
                      name="mlp")(bn("norm2")(x))
        return x + DropPath(self.drop_path)(y, train)


@BACKBONES.register(name="IncepTransformer", aliases=("ipt",))
class IncepTransformer(nn.Module):
    subtype: str = "ipt_t"
    out_stages: Sequence[int] = (1, 2, 3, 4)
    drop_path_rate: float = 0.1
    pretrained: bool = False   # config-compat slot

    @nn.compact
    def __call__(self, x, train: bool = False):
        import numpy as _np

        chs, depths = _IPT_SPECS[self.subtype]
        # host-side constants — jnp.linspace here would be a traced value
        # and float() on it breaks under jit
        dpr = [float(v) for v in
               _np.linspace(0, self.drop_path_rate, sum(depths))]
        cur = 0
        outs = []
        for i, (ch, depth) in enumerate(zip(chs, depths)):
            k, s = (7, 4) if i == 0 else (3, 2)
            x = nn.Conv(ch, (k, k), strides=s, padding=k // 2,
                        name=f"patch_embed{i + 1}")(x)
            x = BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"embed_norm{i + 1}")(x)
            for j in range(depth):
                x = _IncepBlock(ch, _IPT_HEADS[i], _IPT_DOWN[i],
                                _IPT_MLP[i], dpr[cur + j],
                                name=f"block{i + 1}_{j}")(x, train)
            x = BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"norm{i + 1}")(x)
            cur += depth
            if i + 1 in self.out_stages:
                outs.append(x)
        return tuple(outs)

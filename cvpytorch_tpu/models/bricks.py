"""Shared model building blocks (reference: src/models/bricks/, 3245 LoC).

Flax/NHWC re-design of the mmcv-style ``ConvModule`` (conv+norm+act with
cfg-selected layers, reference: bricks/conv_module.py:10) and the misc
helpers (make_divisible, activations).  BatchNorm notes:

* torch momentum m == flax momentum 1-m.  Reference YOLO models pin
  torch momentum 0.03 / eps 1e-3 (reference: yolov5.py:200-202) → flax
  momentum 0.97 here.
* Cross-replica (SyncBN) semantics come for free under sharded jit: moments
  are computed on the logical global batch (SURVEY §2.10).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn


def make_divisible(v: float, divisor: int = 8, min_value: int | None = None) -> int:
    """Channel rounding (reference: src/utils/misc.py:28)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def make_round(x: float, mul: float = 1.0) -> int:
    """Depth rounding (reference: src/utils/misc.py:35)."""
    return max(round(x * mul), 1) if x > 1 else int(x)


ACTIVATIONS: dict[str, Callable] = {
    "relu": nn.relu,
    "relu6": lambda x: jnp.minimum(jnp.maximum(x, 0), 6.0),
    "leaky_relu": lambda x: nn.leaky_relu(x, 0.1),
    "silu": nn.silu,
    "swish": nn.silu,
    "hardswish": nn.hard_swish,
    "hsigmoid": nn.hard_sigmoid,
    "sigmoid": nn.sigmoid,
    "gelu": nn.gelu,
    "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
    "identity": lambda x: x,
}


def get_activation(name: str | None) -> Callable:
    if name is None:
        return ACTIVATIONS["identity"]
    return ACTIVATIONS[name.lower()]


class ConvBNAct(nn.Module):
    """conv + BN + activation (reference ConvModule, bricks/conv_module.py:10).

    NHWC; BN statistics are global-batch under sharded jit.
    """

    out_channels: int
    kernel_size: int | Sequence[int] = 3
    stride: int = 1
    groups: int = 1
    dilation: int = 1
    use_bias: bool = False
    norm: str | None = "bn"          # 'bn' | 'gn' | None
    act: str | None = "relu"
    bn_momentum: float = 0.97        # flax convention (torch 0.03)
    bn_eps: float = 1e-3
    padding: str | int | None = None  # None → SAME-style ((k-1)//2)*dilation

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) else (
            self.kernel_size, self.kernel_size
        )
        if self.padding is None:
            pad = tuple(((kk - 1) // 2 * self.dilation,) * 2 for kk in k)
        elif isinstance(self.padding, int):
            pad = ((self.padding, self.padding), (self.padding, self.padding))
        else:
            pad = self.padding
        x = nn.Conv(
            self.out_channels,
            k,
            strides=self.stride,
            padding=pad,
            feature_group_count=self.groups,
            kernel_dilation=self.dilation,
            use_bias=self.use_bias,
            name="conv",
        )(x)
        if self.norm == "bn":
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_eps,
                name="bn",
            )(x)
        elif self.norm == "gn":
            x = nn.GroupNorm(num_groups=32, name="gn")(x)
        if self.act:
            x = get_activation(self.act)(x)
        return x


class DepthwiseSeparableConv(nn.Module):
    """Depthwise + pointwise (reference: bricks/conv_module.py DW variant)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    act: str | None = "relu"
    bn_momentum: float = 0.97
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        x = ConvBNAct(
            in_ch, self.kernel_size, self.stride, groups=in_ch,
            dilation=self.dilation, act=self.act,
            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps, name="dw",
        )(x, train)
        x = ConvBNAct(
            self.out_channels, 1, 1, act=self.act,
            bn_momentum=self.bn_momentum, bn_eps=self.bn_eps, name="pw",
        )(x, train)
        return x


class SqueezeExcite(nn.Module):
    """SE attention (reference: modules/attentions.py).  ``squeeze_ch``
    overrides the reduced width (torchvision mobilenet_v3 uses
    make_divisible(ch//4, 8), not max(ch//4, 8))."""

    reduce_ratio: int = 4
    gate: str = "hsigmoid"
    act: str = "relu"
    squeeze_ch: int = 0

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        sq = self.squeeze_ch or max(ch // self.reduce_ratio, 8)
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(sq, (1, 1), name="fc1")(s)
        s = get_activation(self.act)(s)
        s = nn.Conv(ch, (1, 1), name="fc2")(s)
        return x * get_activation(self.gate)(s)


class DropPath(nn.Module):
    """Stochastic depth (reference: bricks/drop.py)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        keep = 1.0 - self.rate
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        import jax

        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)

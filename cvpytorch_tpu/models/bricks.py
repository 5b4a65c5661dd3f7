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

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import module as _flax_module
from flax.linen import normalization as _fnorm


class BatchNorm(nn.BatchNorm):
    """flax BatchNorm with TORCH running-variance semantics.

    torch.nn.BatchNorm2d normalizes the train-mode output with the BIASED
    batch variance but stores the UNBIASED (Bessel n/(n-1)) variance into
    ``running_var``; flax linen stores the biased one.  At production batch
    sizes the factor is ~1+1e-4, but on small spatial maps (stride-32 heads,
    tiny eval batches) it is a real eval-numerics divergence vs the
    reference — measured by tests/test_differential_training.py.  This
    subclass applies the one-line correction; everything else (init trees,
    param/batch_stats layout, momentum convention) is unchanged, so it is a
    drop-in for every ``nn.BatchNorm`` site in the package.

    __call__ adapted from flax.linen.normalization.BatchNorm (flax 0.12,
    Apache-2.0) — the fork is the ``bessel`` factor on the ra_var update.
    """

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None, *,
                 mask=None):
        use_running_average = _flax_module.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = _fnorm._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(
            i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        sdtype = (jnp.float32 if self.force_float32_reductions
                  else self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, sdtype), feature_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, sdtype), feature_shape)

        if use_running_average:
            mean = (ra_mean.value if self.force_float32_reductions
                    else jnp.asarray(ra_mean.value, self.param_dtype))
            var = (ra_var.value if self.force_float32_reductions
                   else jnp.asarray(ra_var.value, self.param_dtype))
        else:
            import os
            f32r = (self.force_float32_reductions and
                    os.environ.get("CVT_BN_BF16_STATS") != "1")
            mean, var = _fnorm._compute_stats(
                x, reduction_axes, dtype=self.dtype,
                axis_name=(self.axis_name
                           if not self.is_initializing() else None),
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance, mask=mask,
                force_float32_reductions=f32r)
            if not self.is_initializing():
                n = 1
                for ax in reduction_axes:
                    n *= x.shape[ax]
                if self.axis_name is not None:
                    n = n * jax.lax.psum(1, self.axis_name)
                bessel = n / max(n - 1, 1)  # torch stores the unbiased var
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * var * bessel)

        return _fnorm._normalize(
            self, x, mean, var, reduction_axes, feature_axes, self.dtype,
            self.param_dtype, self.epsilon, self.use_bias, self.use_scale,
            self.bias_init, self.scale_init, self.force_float32_reductions)


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
            x = BatchNorm(
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

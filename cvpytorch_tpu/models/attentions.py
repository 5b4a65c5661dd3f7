"""Plug-and-play attention bricks (reference: src/models/modules/
attentions.py, a 1027-LoC zoo of 35 blocks; the reusable core is ported
here NHWC-first, oracle-tested in tests/test_fidelity_attentions.py —
the rest of the zoo is catalogued in COMPONENTS.md Appendix A).

Ported blocks and their reference lines:
  * SEAttention            — attentions.py:39-60
  * cSE / sSE / scSE       — attentions.py:183-226
  * SimAM (parameter-free) — attentions.py:104-121
  * CBAM (= ChannelAttentionModule + SpatialAttentionModule)
                           — attentions.py:228-276
  * ECAAttention           — attentions.py:447-465

All operate on NHWC and scale activations in place; SE already existed as
``bricks.SqueezeExcite`` (conv-flavoured, torchvision-style) — this file
adds the reference's Linear-flavoured variant for porting parity.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class SEAttention(nn.Module):
    """Squeeze-and-Excitation with a bias-free Linear MLP
    (reference attentions.py:39-60)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2))  # (B, C)
        y = nn.Dense(c // self.reduction, use_bias=False, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, name="fc2")(y)
        return x * nn.sigmoid(y)[:, None, None, :]


class cSEBlock(nn.Module):
    """Channel SE with 1×1 convs (reference attentions.py:196-212)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = x.mean(axis=(1, 2), keepdims=True)  # (B,1,1,C)
        y = nn.Conv(c // self.reduction, (1, 1), use_bias=False,
                    name="fc1")(y)
        y = nn.relu(y)
        y = nn.Conv(c, (1, 1), use_bias=False, name="fc2")(y)
        return x * nn.sigmoid(y)


class sSEBlock(nn.Module):
    """Spatial SE: per-pixel sigmoid gate (reference attentions.py:183-194)."""

    @nn.compact
    def __call__(self, x):
        z = nn.Conv(1, (1, 1), name="conv")(x)
        return x * nn.sigmoid(z)


class scSEBlock(nn.Module):
    """Concurrent spatial+channel SE, https://arxiv.org/abs/1803.02579
    (reference attentions.py:214-226)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        return (cSEBlock(self.reduction, name="cSE")(x)
                + sSEBlock(name="sSE")(x))


class SimAM(nn.Module):
    """Parameter-free attention, http://proceedings.mlr.press/v139/yang21o
    (reference attentions.py:104-121)."""

    e_lambda: float = 1e-4

    def __call__(self, x):
        h, w = x.shape[1], x.shape[2]
        n = h * w - 1
        d = jnp.square(x - x.mean(axis=(1, 2), keepdims=True))
        y = d / (4 * (d.sum(axis=(1, 2), keepdims=True) / n
                      + self.e_lambda)) + 0.5
        return x * nn.sigmoid(y)


class ChannelAttentionModule(nn.Module):
    """CBAM channel gate: shared MLP over avg- and max-pooled descriptors
    (reference attentions.py:228-246).  Returns the (B,1,1,C) gate."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fc1 = nn.Dense(c // self.reduction, name="fc1")
        fc2 = nn.Dense(c, name="fc2")
        mlp = lambda v: fc2(nn.relu(fc1(v)))
        avg = mlp(x.mean(axis=(1, 2)))
        mx = mlp(x.max(axis=(1, 2)))
        return nn.sigmoid(avg + mx)[:, None, None, :]


class SpatialAttentionModule(nn.Module):
    """CBAM spatial gate: 7×7 conv over [mean, max] channel pools
    (reference attentions.py:248-260).  Returns the (B,H,W,1) gate."""

    @nn.compact
    def __call__(self, x):
        avg = x.mean(axis=-1, keepdims=True)
        mx = x.max(axis=-1, keepdims=True)
        y = jnp.concatenate([avg, mx], axis=-1)
        y = nn.Conv(1, (7, 7), padding=3, name="conv")(y)
        return nn.sigmoid(y)


class CBAM(nn.Module):
    """Convolutional Block Attention Module,
    https://arxiv.org/abs/1807.06521 (reference attentions.py:262-276)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        x = ChannelAttentionModule(self.reduction,
                                   name="channel_attention")(x) * x
        x = SpatialAttentionModule(name="spatial_attention")(x) * x
        return x


class ECAAttention(nn.Module):
    """Efficient Channel Attention: 1-D conv across the channel
    descriptor, https://arxiv.org/abs/1910.03151
    (reference attentions.py:447-465)."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2))[..., None]  # (B, C, 1): channels as length
        y = nn.Conv(1, (self.kernel_size,),
                    padding=(self.kernel_size - 1) // 2, name="conv")(y)
        return x * nn.sigmoid(y[..., 0])[:, None, None, :]


__all__ = ["SEAttention", "cSEBlock", "sSEBlock", "scSEBlock", "SimAM",
           "ChannelAttentionModule", "SpatialAttentionModule", "CBAM",
           "ECAAttention"]

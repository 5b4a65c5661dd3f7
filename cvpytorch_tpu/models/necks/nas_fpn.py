"""NAS-FPN (arXiv:1904.07392) — the discovered 5-level merging-cell
pyramid.

The reference's ``src/models/necks/nas_fpn.py:13-17`` is an EMPTY stub
(``forward: pass``); this is a full working implementation of the paper's
architecture (the 7-merging-cell sequence popularised by the official TF
impl and mmdetection's NASFPN): inputs P3-P7, per-stage wiring

    gp(P6,P4)@4 → sum(·,P4)@4 → sum(·,P3)@3* → sum(P3*,·)@4* →
    sum(gp(4*,3*)@5, P5)@5* → sum(gp(5*,4'),P7)@7* → gp(7*,5*)@6*

where ``sum`` is elementwise add, ``gp(a,b) = b + sigmoid(GAP(b))·a`` is
global-pooling attention, and every cell output passes ReLU→Conv3×3→BN
(the paper's op order).  Resizing to the target level uses nearest
upsample / max-pool downsample — static shapes, XLA-fusable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..bricks import BatchNorm

from ...registry import NECKS


def _to_size(x, hw):
    h, w = x.shape[1], x.shape[2]
    th, tw = hw
    if (h, w) == (th, tw):
        return x
    if th <= h:  # downsample via max-pool with matching stride
        sh, sw = max(h // th, 1), max(w // tw, 1)
        x = nn.max_pool(x, (sh, sw), strides=(sh, sw))
        if x.shape[1:3] != (th, tw):
            x = jax.image.resize(x, (x.shape[0], th, tw, x.shape[3]),
                                 "nearest")
        return x
    return jax.image.resize(x, (x.shape[0], th, tw, x.shape[3]), "nearest")


class _MergeCell(nn.Module):
    """Resize both inputs to ``out`` level, merge, ReLU→Conv3×3→BN."""

    out_channels: int
    op: str = "sum"            # 'sum' | 'gp'

    @nn.compact
    def __call__(self, x1, x2, hw, train: bool = False):
        x1 = _to_size(x1, hw)
        x2 = _to_size(x2, hw)
        if self.op == "gp":
            att = jax.nn.sigmoid(jnp.mean(x2, axis=(1, 2), keepdims=True))
            y = x2 + att * x1
        else:
            y = x1 + x2
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    name="conv")(y)
        return BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(y)


@NECKS.register(name="NASFPN", aliases=("NAS_FPN",))
class NASFPN(nn.Module):
    out_channels: int = 256
    stack_times: int = 3
    num_outs: int = 5

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # laterals + extra stride-2 levels up to num_outs (P3..P7)
        levels = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        while len(levels) < self.num_outs:
            levels.append(nn.Conv(self.out_channels, (3, 3), strides=2,
                                  padding=1,
                                  name=f"extra{len(levels)}")(levels[-1]))
        assert len(levels) == 5, "NAS-FPN is defined over 5 levels (P3-P7)"
        for s in range(self.stack_times):
            p3, p4, p5, p6, p7 = levels
            hw = [p.shape[1:3] for p in levels]
            cell = lambda nm, op: _MergeCell(self.out_channels, op,  # noqa: E731
                                             name=f"s{s}_{nm}")
            p4_1 = cell("gp_64_4", "gp")(p6, p4, hw[1], train)
            p4_2 = cell("sum_44_4", "sum")(p4_1, p4, hw[1], train)
            p3_o = cell("sum_43_3", "sum")(p4_2, p3, hw[0], train)
            p4_o = cell("sum_34_4", "sum")(p3_o, p4_2, hw[1], train)
            p5_t = cell("gp_43_5", "gp")(p4_o, p3_o, hw[2], train)
            p5_o = cell("sum_55_5", "sum")(p5_t, p5, hw[2], train)
            p7_t = cell("gp_54_7", "gp")(p5_o, p4_2, hw[4], train)
            p7_o = cell("sum_77_7", "sum")(p7_t, p7, hw[4], train)
            p6_o = cell("gp_75_6", "gp")(p7_o, p5_o, hw[3], train)
            levels = [p3_o, p4_o, p5_o, p6_o, p7_o]
        return tuple(levels)

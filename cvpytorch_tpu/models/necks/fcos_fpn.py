"""FCOS FPN P3-P7 (reference: src/models/necks/fcos_fpn.py).

Standard FPN laterals on C3-C5 + two stride-2 convs for P6/P7 (ReLU
between), 256 channels, no norm (FCOS convention)."""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...registry import NECKS


def _upsample_to(x, ref):
    return jax.image.resize(x, (x.shape[0], ref.shape[1], ref.shape[2],
                                x.shape[3]), "nearest")


@NECKS.register(name="FCOSFPN")
class FCOSFPN(nn.Module):
    out_channels: int = 256
    use_p5: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c3, c4, c5 = feats
        p5 = nn.Conv(self.out_channels, (1, 1), name="lateral5")(c5)
        p4 = nn.Conv(self.out_channels, (1, 1), name="lateral4")(c4) + \
            _upsample_to(p5, c4)
        p3 = nn.Conv(self.out_channels, (1, 1), name="lateral3")(c3) + \
            _upsample_to(p4, c3)
        p3 = nn.Conv(self.out_channels, (3, 3), padding=1, name="smooth3")(p3)
        p4 = nn.Conv(self.out_channels, (3, 3), padding=1, name="smooth4")(p4)
        p5 = nn.Conv(self.out_channels, (3, 3), padding=1, name="smooth5")(p5)
        src = p5 if self.use_p5 else c5
        p6 = nn.Conv(self.out_channels, (3, 3), strides=2, padding=1,
                     name="p6")(src)
        p7 = nn.Conv(self.out_channels, (3, 3), strides=2, padding=1,
                     name="p7")(nn.relu(p6))
        return (p3, p4, p5, p6, p7)


@NECKS.register(name="FPN")
class FPN(nn.Module):
    """Generic FPN (reference: src/models/necks/fpn.py:20)."""

    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, feats, train: bool = False):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_to(
                laterals[i], laterals[i - 1])
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, name=f"fpn{i}")(l)
            for i, l in enumerate(laterals)
        ]
        extra = self.num_outs - len(outs)
        x = outs[-1]
        for _ in range(extra):
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            outs.append(x)
        return tuple(outs)

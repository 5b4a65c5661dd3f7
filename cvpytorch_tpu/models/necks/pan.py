"""Plain FPN-style PAN neck (reference: src/models/necks/pan.py:17-56,
fpn.py:20-49 — NanoDet v1's neck).

Reference semantics: per-level 1×1 *bias-free, norm-free, act-free*
lateral convs (fpn.py:36 with norm_cfg=None, activation=None), additive
top-down via bilinear resize (align_corners=False), then additive
bottom-up via bilinear resize *downsampling* (pan.py:47-48 — the NanoDet
quirk: F.interpolate to the smaller size, not a strided conv).  The
inherited 3×3 ``fpn_convs`` are constructed upstream but never used in
``PAN.forward`` (pan.py:24-56) — parameters-only dead weight we do not
replicate."""
from __future__ import annotations

import jax
from flax import linen as nn

from ...registry import NECKS


def _resize_bilinear(x, hw):
    """torch F.interpolate(mode='bilinear', align_corners=False) — which
    never antialiases, including on downsampling."""
    return jax.image.resize(
        x, (x.shape[0], hw[0], hw[1], x.shape[-1]), method="bilinear",
        antialias=False)


@NECKS.register(name="PAN", aliases=("FPN_PAN",))
class PAN(nn.Module):
    out_channels: int = 96

    @nn.compact
    def __call__(self, feats, train: bool = False):
        laterals = [
            nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        n = len(laterals)
        # top-down
        for i in range(n - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _resize_bilinear(
                laterals[i], laterals[i - 1].shape[1:3])
        # bottom-up (bilinear downsample, reference pan.py:46-48)
        for i in range(0, n - 1):
            laterals[i + 1] = laterals[i + 1] + _resize_bilinear(
                laterals[i], laterals[i + 1].shape[1:3])
        return tuple(laterals)

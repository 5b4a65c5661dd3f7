"""Max-pool-with-indices and max-unpool (reference: the
torch ``F.max_pool2d(..., return_indices=True)`` / ``F.max_unpool2d``
pairs SegNet and ENet are built on — segnet.py:113-145, enet.py:103-150).

TPU-native formulation: instead of a windowed gather, the k² window taps
are materialized as shifted slices at pooled resolution and reduced with
``argmax`` over the tap axis — static shapes, fuses to vector ops, and
reproduces torch's "first maximum in row-major window order" tie-break
exactly.  Unpooling is a fixed-shape per-channel scatter of the pooled
values back to their recorded flat positions.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def max_pool_argmax(x, kernel: int = 2, stride: int = 2, padding: int = 0):
    """NHWC max pool returning (pooled, flat_indices).

    ``flat_indices`` are row-major positions into the H×W input plane per
    (batch, channel), identical to torch's ``return_indices=True``.
    """
    B, H, W, C = x.shape
    Ho = (H + 2 * padding - kernel) // stride + 1
    Wo = (W + 2 * padding - kernel) // stride + 1
    ys0 = np.arange(Ho) * stride - padding
    xs0 = np.arange(Wo) * stride - padding
    vals, idxs = [], []
    for dy in range(kernel):          # row-major tap order = torch order
        for dx in range(kernel):
            ys = ys0 + dy
            xs = xs0 + dx
            in_y = (ys >= 0) & (ys < H)
            in_x = (xs >= 0) & (xs < W)
            ysc = np.clip(ys, 0, H - 1)
            xsc = np.clip(xs, 0, W - 1)
            v = x[:, ysc][:, :, xsc]                     # (B, Ho, Wo, C)
            mask = (in_y[:, None] & in_x[None, :])[None, :, :, None]
            vals.append(jnp.where(mask, v, -jnp.inf))
            idxs.append(ysc[:, None] * W + xsc[None, :])  # (Ho, Wo)
    vals = jnp.stack(vals, axis=-1)                      # (B,Ho,Wo,C,k²)
    idx_taps = jnp.asarray(np.stack(idxs, axis=-1))      # (Ho,Wo,k²)
    best = jnp.argmax(vals, axis=-1)                     # first max wins
    pooled = jnp.max(vals, axis=-1)
    flat = jnp.take_along_axis(
        jnp.broadcast_to(idx_taps[None, :, :, None, :], vals.shape),
        best[..., None], axis=-1)[..., 0]
    return pooled, flat.astype(jnp.int32)


def max_unpool(values, indices, out_hw):
    """Scatter pooled ``values`` (B,H,W,C) to their recorded flat
    ``indices`` inside a zero (B,*out_hw,C) canvas (torch MaxUnpool2d)."""
    B, H, W, C = values.shape
    oh, ow = out_hw
    v = values.reshape(B, H * W, C)
    idx = indices.reshape(B, H * W, C)
    out = jnp.zeros((B, oh * ow, C), values.dtype)
    b = jnp.arange(B)[:, None, None]
    c = jnp.arange(C)[None, None, :]
    out = out.at[b, idx, c].set(v, mode="drop")
    return out.reshape(B, oh, ow, C)

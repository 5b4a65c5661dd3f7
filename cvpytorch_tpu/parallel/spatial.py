"""Spatial sharding with halo exchange (SURVEY §5.7's long-context analog
— the reference has no sequence/context parallelism; its closest scaling
pressure is 1024×2048 Cityscapes activations through UNet/SegNeXt, which
can exceed per-chip HBM at batch. This module is the documented design
slot made real: shard the IMAGE HEIGHT over a mesh axis, exchange
``overlap`` halo rows with ``ppermute`` neighbors over ICI, run the model
locally on each halo-padded tile under ``shard_map``, and crop the halo
off the output.

Exactness contract (the overlap-tile strategy, U-Net paper §3): every
output row whose receptive field lies inside real image content is
bit-identical to the unsharded forward whenever ``overlap`` ≥ the model's
receptive-field radius r (and a multiple of the total stride for stride
chains) — tile SEAMS are exact because halos carry true neighbor rows.
Only the ≤ r outermost rows of the whole image can differ: there the
sharded model sees explicit zero *input* rows where the unsharded model
applies fresh zero padding at every layer (bias+ReLU make those differ).
Eval/inference semantics (BatchNorm running averages); train-mode BN
would need cross-tile moment psums on top.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P


def spatial_apply(apply_fn, images, mesh, axis: str = "model",
                  overlap: int = 32):
    """Run ``apply_fn(images)->(B,H,W,K)`` with H sharded over ``axis``.

    apply_fn must be shape-polymorphic in H (fully-convolutional seg
    models are) and preserve H (stride chains that downsample then
    upsample back are fine).
    """
    n = mesh.shape[axis]
    B, H, W, C = images.shape
    assert H % n == 0, f"H={H} not divisible by {axis}={n}"
    perm_down = [(i, i + 1) for i in range(n - 1)]   # send last rows down
    perm_up = [(i + 1, i) for i in range(n - 1)]     # send first rows up

    def tile(x):
        # x: (B, H/n, W, C) local shard
        idx = jax.lax.axis_index(axis)
        from_above = jax.lax.ppermute(x[:, -overlap:], axis, perm_down)
        from_below = jax.lax.ppermute(x[:, :overlap], axis, perm_up)
        # border tiles get zero halos == the unsharded zero conv padding
        from_above = jnp.where(idx == 0, 0.0, from_above)
        from_below = jnp.where(idx == n - 1, 0.0, from_below)
        padded = jnp.concatenate([from_above, x, from_below], axis=1)
        y = apply_fn(padded)
        s = y.shape[1] * n // (H + 2 * overlap * n)  # output/input scale
        # seg models preserve H (s==... guard against stride mismatch)
        oh = overlap * y.shape[1] // padded.shape[1]
        return y[:, oh:y.shape[1] - oh]

    sharded = shard_map(
        tile, mesh=mesh,
        in_specs=P(None, axis, None, None),
        out_specs=P(None, axis, None, None),
        check_rep=False,
    )
    images = jax.device_put(
        images, NamedSharding(mesh, P(None, axis, None, None)))
    return sharded(images)

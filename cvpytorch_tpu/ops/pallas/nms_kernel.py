"""Pallas TPU kernel: greedy NMS suppression
(SURVEY §2.9 row 1 — the torchvision C++/CUDA nms equivalent).

The XLA path in ops/nms.py builds a (K,K) IoU matrix then runs a
``fori_loop``; this kernel keeps the whole suppression resident in VMEM:
boxes live as a (8, K) lane-aligned tile (4 coords + padding sublanes),
the IoU matrix is computed on the VPU in one shot, and the greedy pass
walks rows with dynamic sublane slices — no HBM traffic inside the loop.

Layout notes (pallas_guide.md): K padded to a multiple of 128 (lanes);
scalars threaded via SMEM; keep-mask is a (1, K) f32 row in VMEM scratch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(thr_ref, boxes_ref, keep_ref, iou_scratch):
    """boxes_ref: (8, K) VMEM — rows 0..3 = x1, y1, x2, y2 (score-sorted,
    padded boxes are all-zero); keep_ref: (1, K) f32 output; iou_scratch:
    (K, K) f32 VMEM."""
    K = boxes_ref.shape[1]
    thr = thr_ref[0]

    x1 = boxes_ref[0, :]
    y1 = boxes_ref[1, :]
    x2 = boxes_ref[2, :]
    y2 = boxes_ref[3, :]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)

    # full IoU matrix on the VPU
    lt_x = jnp.maximum(x1[:, None], x1[None, :])
    lt_y = jnp.maximum(y1[:, None], y1[None, :])
    rb_x = jnp.minimum(x2[:, None], x2[None, :])
    rb_y = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.maximum(rb_x - lt_x, 0.0) * jnp.maximum(rb_y - lt_y, 0.0)
    union = area[:, None] + area[None, :] - inter
    iou_scratch[:, :] = inter / (union + 1e-7)

    keep_ref[0, :] = jnp.ones((K,), jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)

    def body(i, _):
        row = iou_scratch[pl.ds(i, 1), :]            # (1, K)
        # keep[i] without dynamic lane indexing: masked reduction
        keep_i = jnp.sum(jnp.where(col == i, keep_ref[0:1, :], 0.0))
        suppress = (row > thr) & (col > i) & (keep_i > 0.0)
        keep_ref[0:1, :] = jnp.where(suppress, 0.0, keep_ref[0:1, :])
        return 0

    jax.lax.fori_loop(0, K, body, 0)


@partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def pallas_nms_keep(boxes, iou_threshold: float = 0.5,
                    interpret: bool = False):
    """boxes (K, 4) xyxy, already score-sorted descending (padding = zero
    boxes, which have IoU 0 with everything and survive harmlessly).
    Returns keep mask (K,) bool.  K is padded to a lane multiple."""
    K = boxes.shape[0]
    Kp = -(-K // 128) * 128
    rows = jnp.zeros((8, Kp), jnp.float32)
    rows = rows.at[:4, :K].set(boxes.T)
    thr = jnp.array([iou_threshold], jnp.float32)

    keep = pl.pallas_call(
        _nms_kernel,
        out_shape=jax.ShapeDtypeStruct((1, Kp), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Kp, Kp), jnp.float32)],
        interpret=interpret,
    )(thr, rows)
    return keep[0, :K] > 0.5

"""ObjectBox loss — fixed-shape TPU reformulation
(reference: src/losses/objectbox_loss.py:12-197).

ObjectBox regresses *corner distances* from the assigned cell, not
anchor-scaled wh: at level i the prediction is
``d = (2·sigmoid(t))² · 2^i`` grid units for (dx1, dy1, dx2, dy2), giving
box corners ``x1 = (gi+1−dx1)·s_i`` … ``y2 = (gj+dy2)·s_i``
(reference objectbox_detect.py:70-88).  Every GT is assigned at its center
cell on EVERY level through the 9-way cross-grid offset table (center, 4
sides, 4 corners — objectbox_loss.py:108-160), with no anchor-shape gating.

The reference boolean-filters a dynamic number of positives; here every
(target m, offset o) pair is a static candidate (B, M·9) with a validity
weight, the same masked scheme as losses/yolov5_loss.py.  Box quality is
the paper's SDIoU over the four distances (objectbox_loss.py:244-271);
objectness targets are a scatter-max of the detached clamped SDIoU
(deterministic stand-in for the reference's last-write-wins scatter).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ...registry import LOSSES

# center, j(x−), k(y−), l(x+), m(y+), jk, jm, lk, lm
# (reference objectbox_loss.py:108-112, g = 0.5)
_OB_OFFSETS = jnp.array(
    [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0],
     [1.0, 1.0], [1.0, -1.0], [-1.0, 1.0], [-1.0, -1.0]]
) * 0.5


def sd_iou(p, t, eps: float = 1e-9):
    """SDIoU over corner distances (reference objectbox_loss.py:244-271).

    p, t: (..., 4) = (dx1, dy1, dx2, dy2) in grid units.
    """
    s = ((t - p) ** 2).sum(-1)
    mn = jnp.minimum(p, t)
    mx = jnp.maximum(p, t)
    i = ((mn[..., 0] + mn[..., 2] - 1.0) ** 2
         + (mn[..., 1] + mn[..., 3] - 1.0) ** 2)
    c = ((mx[..., 0] + mx[..., 2] - 1.0) ** 2
         + (mx[..., 1] + mx[..., 3] - 1.0) ** 2) + eps
    return (i - s) / c


def _build_level_targets(boxes, valid, nx, ny):
    """boxes (B,M,4) cxcywh normalized → per-candidate (B, P=M*9) arrays:
    flat_cell gather index, tdist (B,P,4) corner-distance targets, w."""
    B, M, _ = boxes.shape
    scale = jnp.array([nx, ny], jnp.float32)
    gxy = boxes[..., 0:2] * scale
    gwh = boxes[..., 2:4] * scale
    half = gwh / 2.0
    xmin, ymin = gxy[..., 0] - half[..., 0], gxy[..., 1] - half[..., 1]
    xmax, ymax = gxy[..., 0] + half[..., 0], gxy[..., 1] + half[..., 1]

    gx, gy = gxy[..., 0], gxy[..., 1]
    ix, iy = nx - gx, ny - gy
    g = 0.5
    j = (gx % 1.0 < g) & (gx > 1.0)
    k = (gy % 1.0 < g) & (gy > 1.0)
    l = (ix % 1.0 < g) & (ix > 1.0)
    m = (iy % 1.0 < g) & (iy > 1.0)
    off_ok = jnp.stack(
        [jnp.ones_like(j), j, k, l, m, j & k, j & m, l & k, l & m],
        axis=-1)  # (B,M,9)

    w = (valid[:, :, None] & off_ok).astype(jnp.float32)

    gij = jnp.floor(gxy[:, :, None, :] - _OB_OFFSETS[None, None, :, :])
    gi, gj = gij[..., 0], gij[..., 1]  # unclamped (distances use these)
    tdist = jnp.stack([
        gi + 1.0 - xmin[:, :, None],
        gj + 1.0 - ymin[:, :, None],
        xmax[:, :, None] - gi,
        ymax[:, :, None] - gj,
    ], axis=-1)  # (B,M,9,4)

    gi_c = jnp.clip(gi, 0, nx - 1).astype(jnp.int32)
    gj_c = jnp.clip(gj, 0, ny - 1).astype(jnp.int32)
    flat_cell = gj_c * nx + gi_c  # (B,M,9), single anchor

    P = M * 9
    return dict(
        flat_cell=flat_cell.reshape(B, P),
        tdist=tdist.reshape(B, P, 4),
        w=w.reshape(B, P),
    )


@LOSSES.register(name="ObjectBoxLoss")
class ObjectBoxLoss:
    def __init__(self, num_classes: int, strides=(8.0, 16.0, 32.0),
                 hyp_box: float = 0.05, hyp_obj: float = 1.0,
                 hyp_cls: float = 1.0, label_smoothing: float = 0.0, **_):
        self.num_classes = num_classes
        self.strides = tuple(strides)
        self.hyp_box, self.hyp_obj, self.hyp_cls = hyp_box, hyp_obj, hyp_cls
        self.balance = {3: (4.0, 1.0, 0.4)}.get(
            len(self.strides), (4.0, 1.0, 0.25, 0.06, 0.02))
        eps = label_smoothing
        self.cp, self.cn = 1.0 - 0.5 * eps, 0.5 * eps

    def __call__(self, raw_outs, targets):
        """raw_outs: list of (B, ny, nx, 1, 5+C); targets as YOLOv5Loss."""
        boxes, labels = targets["boxes"], targets["labels"]
        valid = targets["valid"]
        B, M = labels.shape
        lbox = lobj = lcls = 0.0
        for i, pi in enumerate(raw_outs):
            _, ny, nx, A, no = pi.shape
            t = _build_level_targets(boxes, valid, nx, ny)
            pi_flat = pi.reshape(B, ny * nx * A, no)
            ps = jnp.take_along_axis(
                pi_flat, t["flat_cell"][..., None], axis=1)  # (B,P,no)
            w = t["w"]
            n_pos = jnp.maximum(w.sum(), 1.0)

            # per-level gain 2^i on the squared-sigmoid distance
            # (reference objectbox_loss.py:60-63)
            pdist = (jax.nn.sigmoid(ps[..., 0:4]) * 2.0) ** 2 * (2.0 ** i)
            iou = sd_iou(pdist, t["tdist"])
            lbox = lbox + ((1.0 - iou) * w).sum() / n_pos

            score = jax.lax.stop_gradient(jnp.clip(iou, 0.0)) * w
            tobj = jax.vmap(
                lambda idx, s: jnp.zeros(ny * nx * A).at[idx].max(s)
            )(t["flat_cell"], score)
            obj_bce = optax.sigmoid_binary_cross_entropy(pi_flat[..., 4], tobj)
            lobj = lobj + obj_bce.mean() * self.balance[i]

            if self.num_classes > 1:
                tcls = jnp.where(valid, labels, 0)
                cls_flat = jnp.broadcast_to(
                    tcls[:, :, None], (B, M, 9)).reshape(B, -1)
                onehot = (jax.nn.one_hot(cls_flat, self.num_classes)
                          * (self.cp - self.cn) + self.cn)
                cls_bce = optax.sigmoid_binary_cross_entropy(
                    ps[..., 5:], onehot)
                lcls = lcls + (cls_bce * w[..., None]).sum() / (
                    n_pos * self.num_classes)

        lbox = lbox * self.hyp_box
        lobj = lobj * self.hyp_obj
        lcls = lcls * self.hyp_cls
        total = (lbox + lobj + lcls) * B  # reference scales by batch (:92)
        return total, {"box_loss": lbox, "obj_loss": lobj, "cls_loss": lcls}


def decode_objectbox(raw_outs, strides):
    """Corner-distance decode (reference objectbox_detect.py:57-95).

    Returns (B, N_total, 5+C): cxcywh network pixels + obj + cls probs.
    """
    decoded = []
    for i, x in enumerate(raw_outs):
        b, ny, nx, na, no = x.shape
        y = jax.nn.sigmoid(x)
        gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
        gx = gx[None, :, :, None]
        gy = gy[None, :, :, None]
        d = (y[..., 0:4] * 2.0) ** 2 * (2.0 ** i)
        s = strides[i]
        x1 = (gx + 1.0 - d[..., 0]) * s
        y1 = (gy + 1.0 - d[..., 1]) * s
        x2 = (gx + d[..., 2]) * s
        y2 = (gy + d[..., 3]) * s
        cxcywh = jnp.stack(
            [(x1 + x2) / 2.0, (y1 + y2) / 2.0, x2 - x1, y2 - y1], axis=-1)
        out = jnp.concatenate([cxcywh, y[..., 4:]], axis=-1)
        decoded.append(out.reshape(b, ny * nx * na, no))
    return jnp.concatenate(decoded, axis=1)

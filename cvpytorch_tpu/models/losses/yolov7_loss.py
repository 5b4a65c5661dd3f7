"""YOLOv7 loss — SimOTA over cross-grid candidates, fixed-shape TPU
reformulation (reference: src/losses/yolov7_loss.py:129-416).

Pipeline (matching the reference exactly):
1. ``find_3_positive`` — the YOLOv5 candidate scheme (anchor-ratio gate +
   5-way cross-grid offsets, yolov7_loss.py:365-416); reused from
   losses/yolov5_loss.py's masked candidate builder.
2. Per-image SimOTA refinement (yolov7_loss.py:217-363): decode candidate
   predictions to pixels, pairwise IoU vs GT, ``dynamic_k =
   clamp(int(Σ top-20 IoU), 1)``, cost = cls-BCE(sqrt(cls·obj) logits)
   + 3·(−log IoU), lowest-cost-k per GT, column conflicts resolved by
   argmin cost over all GTs.
3. YOLOv5-style level losses over the selected positives, with the box
   target taken from the OTA-matched GT (which may differ from the
   candidate's generating GT) and hyp (box, obj, cls) = (0.05, 0.7, 0.3)
   (yolov7_loss.py:143-145).

Dynamic shapes are removed the usual way: every (gt m, anchor a, offset o,
level l) tuple is a static candidate with a validity weight; invalid
candidates/GTs carry BIG cost so the fixed-k top-k never picks them, and
the per-GT dynamic k becomes a rank mask (rank < k).  The class-cost
``BCE(logit(√(cls·obj)), onehot)`` is computed in closed form without the
(M, N, C) intermediate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ...ops.boxes import bbox_iou
from ...registry import LOSSES
from .yolov5_loss import _build_level_targets

BIG = 1e8
TOPK_IOU = 20  # dynamic-k estimation window (yolov7_loss.py:291)


@LOSSES.register(name="YOLOv7Loss")
class YOLOv7Loss:
    def __init__(self, num_classes: int, anchors, strides=(8.0, 16.0, 32.0),
                 hyp_box: float = 0.05, hyp_obj: float = 0.7,
                 hyp_cls: float = 0.3, anchor_t: float = 4.0, **_):
        self.num_classes = num_classes
        self.anchors = jnp.asarray(anchors, jnp.float32)  # (L,A,2) grid units
        self.strides = tuple(strides)
        self.hyp_box, self.hyp_obj, self.hyp_cls = hyp_box, hyp_obj, hyp_cls
        self.anchor_t = anchor_t
        self.balance = {3: (4.0, 1.0, 0.4)}.get(
            len(self.anchors), (4.0, 1.0, 0.25, 0.06, 0.02))
        self.cp, self.cn = 1.0, 0.0  # smooth_BCE(0)

    def __call__(self, raw_outs, targets, images=None, img_size=None):
        """raw_outs: list of (B, ny, nx, A, 5+C); targets: padded dict
        {'boxes' cxcywh normalized, 'labels', 'valid'}; img_size: the
        reference scales GT to pixels with imgs.shape[H] (yolov7_loss.py:249)."""
        boxes, labels = targets["boxes"], targets["labels"]
        valid = targets["valid"]
        B, M, _ = boxes.shape
        L = len(raw_outs)
        C = self.num_classes
        if img_size is None:
            img_size = float(images.shape[1]) if images is not None else \
                raw_outs[0].shape[1] * self.strides[0]

        # -- stage 1: per-level candidates (find_3_positive) ---------------
        lvl = []
        for i, pi in enumerate(raw_outs):
            _, ny, nx, A, no = pi.shape
            t = _build_level_targets(boxes, valid, self.anchors[i], nx, ny,
                                     self.anchor_t, A)
            P = t["w"].shape[1]
            ps = jnp.take_along_axis(
                pi.reshape(B, ny * nx * A, no), t["flat_cell"][..., None],
                axis=1)  # (B,P,no)
            # candidate cell (gi,gj) recovered from the flat index
            cell = t["flat_cell"] // A
            gi = (cell % nx).astype(jnp.float32)
            gj = (cell // nx).astype(jnp.float32)
            # decoded candidate box in pixels (yolov7_loss.py:268-272)
            pxy = (jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
                   + jnp.stack([gi, gj], -1)) * self.strides[i]
            pwh = (jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2 \
                * t["anchor_wh"] * self.strides[i]
            lvl.append(dict(ps=ps, w=t["w"], flat_cell=t["flat_cell"],
                            anchor_wh=t["anchor_wh"], txy=t["txy"],
                            pxy=pxy, pwh=pwh, P=P, ny=ny, nx=nx, A=A))

        # -- stage 2: SimOTA over the concatenated candidate set -----------
        p_obj = jnp.concatenate([jax.nn.sigmoid(l["ps"][..., 4]) for l in lvl], 1)
        p_cls = jnp.concatenate(
            [jax.nn.sigmoid(l["ps"][..., 5:]) for l in lvl], 1)  # (B,N,C)
        p_boxes = jnp.concatenate(
            [jnp.concatenate([l["pxy"], l["pwh"]], -1) for l in lvl], 1)
        w_cand = jnp.concatenate([l["w"] for l in lvl], 1)  # (B,N)
        N = w_cand.shape[1]

        gt_px = boxes * img_size  # cxcywh pixels (reference uses H for both)
        # pairwise IoU (B,M,N), plain IoU (box_iou, yolov7_loss.py:24-45)
        iou = bbox_iou(gt_px[:, :, None, :], p_boxes[:, None, :, :],
                       fmt="cxcywh", iou_type="iou")
        iou = iou * w_cand[:, None, :] * valid[:, :, None]

        # dynamic k per gt (int truncation like the reference)
        topk_iou = jax.lax.top_k(iou, min(TOPK_IOU, N))[0]
        dyn_k = jnp.clip(topk_iou.sum(-1).astype(jnp.int32), 1, None)  # (B,M)

        # cls cost in closed form: y = sqrt(cls·obj);
        # BCE(logit(y), onehot) = −[log y_gt − log1p(−y_gt) + Σ_c log1p(−y_c)]
        y = jnp.sqrt(jnp.clip(p_cls * p_obj[..., None], 1e-8, 1 - 1e-8))
        log_y = jnp.log(y)
        log_1my = jnp.log1p(-y)
        sum_log1my = log_1my.sum(-1)  # (B,N)
        safe_cls = jnp.where(valid, labels, 0)  # (B,M)
        # gather per (m, n): value[m,n] = (log_y - log_1my)[n, cls_m]
        diff = log_y - log_1my  # (B,N,C)
        val = jnp.take_along_axis(
            diff.transpose(0, 2, 1),  # (B,C,N)
            safe_cls[:, :, None], axis=1)  # (B,M,N)
        cls_cost = -(val + sum_log1my[:, None, :])
        iou_cost = -jnp.log(iou + 1e-8)
        cost = cls_cost + 3.0 * iou_cost
        cost = cost + BIG * (1.0 - w_cand[:, None, :]) \
            + BIG * (1.0 - valid[:, :, None].astype(jnp.float32))

        # fixed-shape "top dyn_k lowest cost" per gt: rank mask
        order = jnp.argsort(cost, axis=-1)             # (B,M,N) ascending
        rank = jnp.argsort(order, axis=-1)
        matching = (rank < dyn_k[..., None]) & valid[:, :, None] \
            & (w_cand[:, None, :] > 0)                 # (B,M,N)

        # column conflicts → argmin cost over gts (yolov7_loss.py:330-334)
        col_sum = matching.sum(1)                      # (B,N)
        win_gt = jnp.argmin(cost, axis=1)              # (B,N)
        conflict = col_sum > 1
        keep = jnp.where(
            conflict[:, None, :],
            jax.nn.one_hot(win_gt, M, dtype=bool).transpose(0, 2, 1),
            matching)
        selected = keep.any(1)                          # (B,N)
        matched_gt = jnp.argmax(keep, axis=1)           # (B,N)

        # -- stage 3: YOLOv5-style losses over the selected positives ------
        sel_f = selected.astype(jnp.float32)
        lbox = lobj = lcls = 0.0
        off = 0
        for i, l in enumerate(lvl):
            P, ny, nx, A = l["P"], l["ny"], l["nx"], l["A"]
            sl = slice(off, off + P)
            off += P
            w7 = sel_f[:, sl]                           # (B,P)
            mg = matched_gt[:, sl]                      # (B,P)
            n_pos = jnp.maximum(w7.sum(), 1.0)
            ps = l["ps"]

            # targets from the matched gt, in this level's grid units
            g_boxes = jnp.take_along_axis(
                boxes, mg[..., None], axis=1)           # (B,P,4) normalized
            scale = jnp.array([nx, ny], jnp.float32)
            t_cxcy = g_boxes[..., 0:2] * scale
            t_wh = g_boxes[..., 2:4] * scale
            cell = l["flat_cell"] // A
            grid = jnp.stack([(cell % nx).astype(jnp.float32),
                              (cell // nx).astype(jnp.float32)], -1)
            tbox = jnp.concatenate([t_cxcy - grid, t_wh], -1)

            pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
            pwh = (jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2 * l["anchor_wh"]
            pbox = jnp.concatenate([pxy, pwh], -1)
            ciou = bbox_iou(pbox, tbox, fmt="cxcywh", iou_type="ciou")
            lbox = lbox + ((1.0 - ciou) * w7).sum() / n_pos

            score = jax.lax.stop_gradient(jnp.clip(ciou, 0.0)) * w7
            tobj = jax.vmap(
                lambda idx, s: jnp.zeros(ny * nx * A).at[idx].max(s)
            )(l["flat_cell"], score)
            pi_flat = raw_outs[i].reshape(B, ny * nx * A, -1)
            obj_bce = optax.sigmoid_binary_cross_entropy(pi_flat[..., 4], tobj)
            lobj = lobj + obj_bce.mean() * self.balance[i]

            if C > 1:
                t_cls = jnp.take_along_axis(safe_cls, mg, axis=1)  # (B,P)
                onehot = jax.nn.one_hot(t_cls, C) * (self.cp - self.cn) + self.cn
                cls_bce = optax.sigmoid_binary_cross_entropy(
                    ps[..., 5:], onehot)
                lcls = lcls + (cls_bce * w7[..., None]).sum() / (n_pos * C)

        lbox = lbox * self.hyp_box
        lobj = lobj * self.hyp_obj
        lcls = lcls * self.hyp_cls
        total = (lbox + lobj + lcls) * B
        return total, {"box_loss": lbox, "obj_loss": lobj, "cls_loss": lcls}

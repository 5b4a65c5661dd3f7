"""Faster R-CNN / Mask R-CNN — fixed-shape TPU implementation
(reference: src/models/faster_rcnn.py:19, src/models/maskrcnn.py:19-43,
which wrap torchvision's C++ RPN/ROIAlign stack; SURVEY §7.2 step 5 — no
torchvision here, so RPN, proposal NMS, box/mask heads are native).

Fixed-shape doctrine:
* anchors: 3 aspect ratios × 1 size per FPN level (P2-P5 + P6 pool);
* RPN sampling (256 anchors, ≤50% pos) becomes weighted losses: positives
  all contribute (normalized by count), negatives are down-weighted to the
  reference pos:neg ratio in expectation — no random gather;
* proposals: top-k pre-NMS (per image) → batched NMS → fixed K proposals
  with validity mask;
* ROI head matching (IoU ≥ 0.5) over the padded proposal set, weighted
  CE/smooth-L1; mask head consumes per-instance gt masks rasterized on
  host and crops targets with roi_align on the mask plane.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import box_iou_matrix, clip_boxes
from ..ops.nms import batched_nms
from ..ops.roi_align import multiscale_roi_align
from ..registry import MODELS
from .backbones import build_backbone
from .necks.fcos_fpn import FPN

RPN_STRIDES = (4, 8, 16, 32, 64)
ANCHOR_SIZES = (32, 64, 128, 256, 512)
ASPECTS = (0.5, 1.0, 2.0)


def make_anchors(level_shapes, strides=RPN_STRIDES, sizes=ANCHOR_SIZES,
                 aspects=ASPECTS):
    """(P_total, 4) xyxy anchors over all levels."""
    all_anchors = []
    for (h, w), s, size in zip(level_shapes, strides, sizes):
        cy = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5) * s
        cx = (jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5) * s
        centers = jnp.stack([cx, cy], -1).reshape(-1, 2)  # (hw, 2)
        whs = []
        for a in aspects:
            aw = size * (a ** 0.5)
            ah = size / (a ** 0.5)
            whs.append((aw, ah))
        whs = jnp.asarray(whs)  # (A, 2)
        c = jnp.repeat(centers, len(aspects), axis=0)
        wh = jnp.tile(whs, (centers.shape[0], 1))
        all_anchors.append(jnp.concatenate(
            [c - wh / 2, c + wh / 2], -1))
    return jnp.concatenate(all_anchors, 0)


def encode_deltas(boxes, anchors):
    """box → (dx, dy, dw, dh) w.r.t. anchors (R-CNN parameterization).
    Anchor extents are clamped ≥1px: padded/invalid proposals are
    zero-size and would otherwise produce inf/NaN that poisons gradients
    through the masked loss (inf·0 = NaN)."""
    aw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1.0)
    ah = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1.0)
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    bw = jnp.maximum(boxes[..., 2] - boxes[..., 0], 1e-6)
    bh = jnp.maximum(boxes[..., 3] - boxes[..., 1], 1e-6)
    bx = boxes[..., 0] + bw / 2
    by = boxes[..., 1] + bh / 2
    return jnp.stack([(bx - ax) / aw, (by - ay) / ah,
                      jnp.log(bw / aw), jnp.log(bh / ah)], -1)


def decode_deltas(deltas, anchors, clip: float = 4.0):
    aw = jnp.maximum(anchors[..., 2] - anchors[..., 0], 1.0)
    ah = jnp.maximum(anchors[..., 3] - anchors[..., 1], 1.0)
    ax = anchors[..., 0] + aw / 2
    ay = anchors[..., 1] + ah / 2
    bx = deltas[..., 0] * aw + ax
    by = deltas[..., 1] * ah + ay
    bw = jnp.exp(jnp.clip(deltas[..., 2], -clip, clip)) * aw
    bh = jnp.exp(jnp.clip(deltas[..., 3], -clip, clip)) * ah
    return jnp.stack([bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2], -1)


def smooth_l1(x, beta: float = 1.0 / 9):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


class RPNHead(nn.Module):
    num_anchors: int = 3
    channels: int = 256

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(self.channels, (3, 3), padding=1, name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1), name="obj")
        reg = nn.Conv(self.num_anchors * 4, (1, 1), name="reg")
        objs, regs = [], []
        for f in feats:
            h = nn.relu(conv(f))
            B = h.shape[0]
            objs.append(obj(h).reshape(B, -1))
            regs.append(reg(h).reshape(B, -1, 4))
        return jnp.concatenate(objs, 1), jnp.concatenate(regs, 1)


class BoxHead(nn.Module):
    num_classes: int  # foreground classes; +1 background handled here
    channels: int = 1024

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.channels, name="fc1")(x))
        x = nn.relu(nn.Dense(self.channels, name="fc2")(x))
        cls = nn.Dense(self.num_classes + 1, name="cls")(x)
        reg = nn.Dense(self.num_classes * 4, name="reg")(x)
        return cls, reg.reshape(-1, self.num_classes, 4)


class MaskHead(nn.Module):
    num_classes: int
    channels: int = 256

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats
        for i in range(4):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                                name=f"conv{i}")(x))
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                                     name="deconv")(x))
        return nn.Conv(self.num_classes, (1, 1), name="mask")(x)


@MODELS.register(name="MaskRCNN", aliases=("FasterRCNN",))
class MaskRCNN(nn.Module):
    dictionary: Sequence[Any] = ()
    model_cfg: Any = None
    num_proposals: int = 256          # post-NMS proposals kept (fixed K)
    pre_nms_topk: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_pos_iou: float = 0.7
    rpn_neg_iou: float = 0.3
    roi_pos_iou: float = 0.5
    with_mask: bool = True
    score_threshold: float = 0.05
    iou_threshold: float = 0.5
    max_det: int = 100
    mask_size: int = 112              # paste canvas; must equal the
                                      # dataset's MASK_SIZE for segm eval

    def setup(self):
        self.num_classes = max(len(self.dictionary), 1)
        cfg = self.model_cfg or {}
        get = cfg.get if hasattr(cfg, "get") else (lambda k, d=None: d)
        bb = get("BACKBONE") or {"name": "ResNet", "subtype": "resnet50",
                                 "out_stages": (1, 2, 3, 4)}
        bb = dict(bb.items()) if hasattr(bb, "items") else dict(bb)
        bb.setdefault("out_stages", (1, 2, 3, 4))
        self.backbone = build_backbone(bb)
        self.fpn = FPN(out_channels=256, num_outs=5)
        self.rpn = RPNHead(num_anchors=len(ASPECTS))
        self.box_head = BoxHead(self.num_classes)
        self.mask_head = MaskHead(self.num_classes) if self.with_mask else None

    # -- RPN ---------------------------------------------------------------
    def _rpn_proposals(self, feats, images):
        obj_logits, reg_deltas = self.rpn(feats)  # (B,P), (B,P,4)
        level_shapes = [f.shape[1:3] for f in feats]
        anchors = make_anchors(level_shapes)
        boxes = decode_deltas(reg_deltas, anchors[None])
        h, w = images.shape[1:3]
        boxes = clip_boxes(boxes, h, w)
        scores = jax.nn.sigmoid(obj_logits)
        k = min(self.pre_nms_topk, scores.shape[1])
        top_s, top_i = jax.lax.top_k(scores, k)
        top_b = jnp.take_along_axis(boxes, top_i[..., None], axis=1)
        # proposals are CONSTANTS for the ROI heads — torchvision detaches
        # (rpn.py RegionProposalNetwork.forward: proposals.detach()); also
        # required here: the Pallas NMS kernel has no JVP rule, and the
        # train-step grad would otherwise trace through it on TPU
        top_b = jax.lax.stop_gradient(top_b)
        top_s = jax.lax.stop_gradient(top_s)
        dets = batched_nms(top_b, top_s, jnp.zeros_like(top_i),
                           max_det=self.num_proposals,
                           iou_threshold=self.rpn_nms_thresh,
                           score_threshold=0.0, max_nms=k,
                           class_aware=False)
        return (obj_logits, reg_deltas, anchors,
                dets["boxes"], dets["valid"])

    def _rpn_loss(self, obj_logits, reg_deltas, anchors, targets):
        import optax

        gt, gl, gv = targets["boxes"], targets["labels"], targets["valid"]
        ious = jax.vmap(lambda g: box_iou_matrix(anchors, g))(gt)  # (B,P,M)
        ious = jnp.where(gv[:, None, :], ious, 0.0)
        best_iou = ious.max(-1)
        best_gt = ious.argmax(-1)
        pos = best_iou >= self.rpn_pos_iou
        # the best anchor for every gt is also positive (torchvision rule)
        best_anchor = ious.argmax(1)  # (B, M)
        pos = pos | jax.vmap(
            lambda p, ba, v: p.at[ba].max(v)
        )(jnp.zeros_like(pos), best_anchor, gv)
        neg = best_iou < self.rpn_neg_iou
        neg = neg & ~pos

        n_pos = jnp.maximum(pos.sum(), 1.0)
        # weighted sampling emulation: 256 anchors/img, ≤50% pos
        B, P = obj_logits.shape
        neg_weight = jnp.minimum(
            (128.0 * B) / jnp.maximum(neg.sum(), 1.0), 1.0)
        obj_t = pos.astype(jnp.float32)
        bce = optax.sigmoid_binary_cross_entropy(obj_logits, obj_t)
        obj_loss = (bce * (pos + neg * neg_weight)).sum() / (
            n_pos + neg_weight * jnp.maximum(neg.sum(), 1.0))

        matched = jnp.take_along_axis(gt, best_gt[..., None], axis=1)
        t_deltas = encode_deltas(matched, anchors[None])
        reg_loss = (smooth_l1(reg_deltas - t_deltas).sum(-1) * pos).sum() / n_pos
        return obj_loss, reg_loss

    # -- ROI heads ----------------------------------------------------------
    def _match_proposals(self, proposals, valid, targets):
        gt, gl, gv = targets["boxes"], targets["labels"], targets["valid"]
        ious = jax.vmap(box_iou_matrix)(proposals, gt)
        ious = jnp.where(gv[:, None, :], ious, 0.0)
        best_iou = ious.max(-1)
        best_gt = ious.argmax(-1)
        fg = (best_iou >= self.roi_pos_iou) & valid
        labels = jnp.where(
            fg, jnp.take_along_axis(gl, best_gt, axis=1), self.num_classes)
        matched_boxes = jnp.take_along_axis(gt, best_gt[..., None], axis=1)
        return fg, labels, matched_boxes, best_gt

    def _box_outputs(self, feats, proposals):
        B, K, _ = proposals.shape
        flat = proposals.reshape(B * K, 4)
        idx = jnp.repeat(jnp.arange(B), K)
        roi = multiscale_roi_align(feats[:4], RPN_STRIDES[:4], flat, idx,
                                   output_size=7)
        cls, reg = self.box_head(roi)
        return cls.reshape(B, K, -1), reg.reshape(B, K, self.num_classes, 4)

    def __call__(self, images, targets=None, mode: str = "infer"):
        import optax

        train = mode == "train"
        c_feats = self.backbone(images, train=train)
        feats = self.fpn(c_feats, train=train)
        obj_logits, reg_deltas, anchors, proposals, prop_valid = \
            self._rpn_proposals(feats, images)

        if mode == "infer":
            return self._predict(feats, proposals, prop_valid, images, None)

        rpn_obj, rpn_reg = self._rpn_loss(obj_logits, reg_deltas, anchors,
                                          targets)
        # add gt boxes to the proposal set (standard trick for stability)
        proposals = jnp.concatenate(
            [jax.lax.stop_gradient(proposals), targets["boxes"]], 1)
        prop_valid = jnp.concatenate([prop_valid, targets["valid"]], 1)

        fg, labels, matched_boxes, best_gt = self._match_proposals(
            proposals, prop_valid, targets)
        cls_logits, box_reg = self._box_outputs(feats, proposals)

        n_fg = jnp.maximum(fg.sum(), 1.0)
        n_valid = jnp.maximum(prop_valid.sum(), 1.0)
        onehot = jax.nn.one_hot(labels, self.num_classes + 1)
        ce = optax.softmax_cross_entropy(cls_logits, onehot)
        cls_loss = (ce * prop_valid).sum() / n_valid

        t_deltas = encode_deltas(matched_boxes, proposals)
        safe_lab = jnp.clip(labels, 0, self.num_classes - 1)
        reg_sel = jnp.take_along_axis(
            box_reg, safe_lab[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
        box_loss = (smooth_l1(reg_sel - t_deltas).sum(-1) * fg).sum() / n_fg

        losses = {"rpn_obj_loss": rpn_obj, "rpn_reg_loss": rpn_reg,
                  "cls_loss": cls_loss, "box_loss": box_loss}
        total = rpn_obj + rpn_reg + cls_loss + box_loss

        if self.with_mask and "masks" in (targets or {}):
            B, K, _ = proposals.shape
            # The mask branch trains on the POSITIVE proposals only —
            # torchvision caps them at 512·positive_fraction(0.25)=128 per
            # image (roi_heads.py subsample → mask branch keeps
            # proposals[pos]) while the box branch sees the full sampled
            # set.  Fixed-shape form: stable top-k on the fg indicator
            # gathers the first Km fg slots (identical loss when
            # n_fg ≤ Km, torchvision's cap semantics beyond); running
            # align+head+BCE on 272 slots and zero-weighting was ~45% of
            # the 800² step's device time (tap gathers/scatters on
            # (2176·784, 256) rows — trace r5, PERF.md).
            Km = min(128, K)
            _, midx = jax.lax.top_k(fg.astype(jnp.float32), Km)  # stable
            mprop = jnp.take_along_axis(proposals, midx[..., None], axis=1)
            mfg = jnp.take_along_axis(fg, midx, axis=1)
            mbest = jnp.take_along_axis(best_gt, midx, axis=1)
            mlab = jnp.take_along_axis(safe_lab, midx, axis=1)
            flat = mprop.reshape(B * Km, 4)
            idx = jnp.repeat(jnp.arange(B), Km)
            mroi = multiscale_roi_align(feats[:4], RPN_STRIDES[:4], flat,
                                        idx, output_size=14)
            mask_logits = self.mask_head(mroi)  # (B·Km, 28, 28, C)
            # crop matched gt instance masks to the proposal windows
            gmasks = targets["masks"]  # (B, M, Hm, Wm) float 0/1
            mh = gmasks.shape[-1]
            # trace-time guard: the eval paste canvas (self.mask_size) and
            # the dataset's gt raster (DATASET.*.MASK_SIZE) must agree or
            # segm IoU silently compares different resolutions — catches
            # models built outside Trainer (bench/export/user scripts)
            if mh != self.mask_size:  # not assert: must survive python -O
                raise ValueError(
                    f"dataset MASK_SIZE={mh} != model mask_size="
                    f"{self.mask_size}; pass mask_size={mh} to MaskRCNN "
                    "(Trainer threads this automatically)")
            h, w = images.shape[1:3]
            sel = jnp.take_along_axis(
                gmasks, mbest[..., None, None], axis=1)  # (B,Km,Hm,Wm)
            sel_flat = sel.reshape(B * Km, mh, mh)
            scale = mh / jnp.array([w, h, w, h], jnp.float32)
            # separable-matmul ROIAlign on the mask planes: exactly
            # vmap(roi_align) numerics but MXU einsums instead of 6.8M
            # scalar gathers (~620 ms/step of the 800² trace, PERF.md r5)
            from ..ops.roi_align import crop_resize_separable

            tgt_crop = crop_resize_separable(
                sel_flat, flat * scale, output_size=28)  # (B·Km, 28, 28)
            lab_flat = mlab.reshape(-1)
            m_sel = jnp.take_along_axis(
                mask_logits, lab_flat[:, None, None, None], axis=-1)[..., 0]
            mbce = optax.sigmoid_binary_cross_entropy(
                m_sel, (tgt_crop > 0.5).astype(jnp.float32))
            n_mfg = jnp.maximum(mfg.sum(), 1.0)
            mask_loss = (mbce.mean((1, 2)) * mfg.reshape(-1)).sum() / n_mfg
            losses["mask_loss"] = mask_loss
            total = total + mask_loss

        losses["loss"] = total
        if mode == "train":
            return total, losses
        return losses, self._predict(feats, proposals[:, :self.num_proposals],
                                     prop_valid[:, :self.num_proposals],
                                     images, targets)

    def _predict(self, feats, proposals, prop_valid, images, targets):
        cls_logits, box_reg = self._box_outputs(feats, proposals)
        probs = jax.nn.softmax(cls_logits, -1)[..., :self.num_classes]
        scores = probs.max(-1) * prop_valid
        labels = probs.argmax(-1)
        safe_lab = labels[..., None, None].repeat(4, -1)
        deltas = jnp.take_along_axis(box_reg, safe_lab, axis=2)[:, :, 0]
        boxes = decode_deltas(deltas, proposals)
        h, w = images.shape[1:3]
        boxes = clip_boxes(boxes, h, w)
        dets = batched_nms(boxes, scores, labels, max_det=self.max_det,
                           iou_threshold=self.iou_threshold,
                           score_threshold=self.score_threshold)
        out_boxes = dets["boxes"]
        if targets is not None and "pads" in targets:
            from ..ops.boxes import unletterbox_boxes

            out_boxes = unletterbox_boxes(
                out_boxes, targets["pads"][:, None, :],
                targets["scales"][:, None, :])
        out = {**dets, "boxes": out_boxes}
        if self.with_mask:
            # mask-paste eval path (reference maskrcnn.py:32 +
            # eval_coco.py iouType='segm'): mask head on the kept
            # detections, per-class sigmoid, separable-bilinear paste
            # onto a full-image canvas in original pixels
            from ..ops.masks import paste_masks

            B, K, _ = dets["boxes"].shape
            flat = dets["boxes"].reshape(B * K, 4)   # network px
            idx = jnp.repeat(jnp.arange(B), K)
            mroi = multiscale_roi_align(feats[:4], RPN_STRIDES[:4], flat,
                                        idx, output_size=14)
            mlog = self.mask_head(mroi)              # (BK, 28, 28, C)
            lab = jnp.clip(dets["labels"].reshape(-1), 0,
                           self.num_classes - 1)
            msel = jnp.take_along_axis(
                mlog, lab[:, None, None, None], axis=-1)[..., 0]
            probs = jax.nn.sigmoid(msel).reshape(B, K, 28, 28)
            if targets is not None and "height" in targets:
                hs, ws = targets["height"], targets["width"]
            else:
                hs = jnp.full((B,), h, jnp.float32)
                ws = jnp.full((B,), w, jnp.float32)
            out["masks"] = paste_masks(probs, out_boxes, hs, ws,
                                       out_size=self.mask_size)
        return out

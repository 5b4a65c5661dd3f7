"""Numerical fidelity vs the REFERENCE's own torch losses (VERDICT r1 #2).

Each test feeds identical random predictions/targets to the reference
torch implementation (imported from /root/reference/src via tests/oracle)
and to our fixed-shape JAX reformulation, asserting ≤1e-4 agreement.
Targets are chosen with well-separated centers so the reference's
last-write-wins objectness scatter and our deterministic scatter-max
coincide (they only differ on cell collisions).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.oracle import setup_reference, to_torch  # noqa: E402

setup_reference()


def _rand_targets(rs, B, n_per_img, wh_range=(0.05, 0.4)):
    """Well-separated normalized cxcywh targets.

    Returns (rows (n,6) torch layout [img, cls, cx, cy, w, h], padded dict).
    """
    M = n_per_img + 2
    rows = []
    boxes = np.zeros((B, M, 4), np.float32)
    labels = np.zeros((B, M), np.int64)
    valid = np.zeros((B, M), bool)
    # a coarse grid of separated centers
    centers = [(0.2, 0.2), (0.65, 0.3), (0.35, 0.75), (0.8, 0.8)]
    for b in range(B):
        for t in range(n_per_img):
            cx, cy = centers[t % len(centers)]
            cx += rs.uniform(-0.05, 0.05)
            cy += rs.uniform(-0.05, 0.05)
            w = rs.uniform(*wh_range)
            h = rs.uniform(*wh_range)
            c = rs.randint(0, 4)
            rows.append([b, c, cx, cy, w, h])
            boxes[b, t] = [cx, cy, w, h]
            labels[b, t] = c
            valid[b, t] = True
    padded = {"boxes": jnp.asarray(boxes), "labels": jnp.asarray(labels),
              "valid": jnp.asarray(valid)}
    return np.asarray(rows, np.float32), padded


def _rand_preds(rs, B, grids, A, no):
    """raw predictions per level: ours (B,ny,nx,A,no), torch (B,A,ny,nx,no)."""
    ours, theirs = [], []
    for (ny, nx) in grids:
        x = rs.randn(B, ny, nx, A, no).astype(np.float32)
        ours.append(jnp.asarray(x))
        theirs.append(to_torch(x.transpose(0, 3, 1, 2, 4)))
    return ours, theirs


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_yolov5_loss_matches_reference(seed):
    from src.losses.yolov5_loss import YOLOv5Loss as RefLoss

    from cvpytorch_tpu.models.losses.yolov5_loss import YOLOv5Loss
    from cvpytorch_tpu.models.yolov5 import DEFAULT_ANCHORS

    rs = np.random.RandomState(seed)
    B, C, A = 2, 4, 3
    grids = [(8, 8), (4, 4), (2, 2)]
    rows, padded = _rand_targets(rs, B, 3)
    ours_p, ref_p = _rand_preds(rs, B, grids, A, 5 + C)

    ref = RefLoss(num_classes=C, anchors=DEFAULT_ANCHORS, device="cpu")
    ref_total, ref_items = ref(ref_p, to_torch(rows))
    ref_box, ref_obj, ref_cls = [float(v) for v in ref_items]

    ours = YOLOv5Loss(num_classes=C, anchors=DEFAULT_ANCHORS)
    total, items = ours(ours_p, padded)

    np.testing.assert_allclose(float(items["box_loss"]), ref_box, atol=1e-4)
    np.testing.assert_allclose(float(items["obj_loss"]), ref_obj, atol=1e-4)
    np.testing.assert_allclose(float(items["cls_loss"]), ref_cls, atol=1e-4)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_objectbox_loss_matches_reference(seed):
    from src.losses.objectbox_loss import ObjectBoxLoss as RefLoss

    from cvpytorch_tpu.models.losses.objectbox_loss import ObjectBoxLoss

    rs = np.random.RandomState(seed)
    B, C = 2, 4
    grids = [(8, 8), (4, 4), (2, 2)]
    rows, padded = _rand_targets(rs, B, 3)
    ours_p, ref_p = _rand_preds(rs, B, grids, 1, 5 + C)

    ref = RefLoss(num_classes=C, device="cpu")
    ref_total, ref_items = ref(ref_p, to_torch(rows))
    ref_box, ref_obj, ref_cls = [float(v) for v in ref_items]

    ours = ObjectBoxLoss(num_classes=C)
    total, items = ours(ours_p, padded)

    np.testing.assert_allclose(float(items["box_loss"]), ref_box, atol=1e-4)
    np.testing.assert_allclose(float(items["obj_loss"]), ref_obj, atol=1e-4)
    np.testing.assert_allclose(float(items["cls_loss"]), ref_cls, atol=1e-4)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_yolov7_loss_matches_reference(seed):
    from src.losses.yolov7_loss import YOLOv7Loss as RefLoss

    from cvpytorch_tpu.models.losses.yolov7_loss import YOLOv7Loss
    from cvpytorch_tpu.models.yolov7 import V7_ANCHORS

    rs = np.random.RandomState(seed)
    B, C, A = 2, 4, 3
    img_size = 64
    grids = [(8, 8), (4, 4), (2, 2)]
    rows, padded = _rand_targets(rs, B, 3)
    ours_p, ref_p = _rand_preds(rs, B, grids, A, 5 + C)
    imgs = torch.zeros(B, 3, img_size, img_size)

    ref = RefLoss(num_classes=C, anchors=V7_ANCHORS, device="cpu")
    ref_total, ref_items = ref(ref_p, to_torch(rows), imgs)
    ref_box, ref_obj, ref_cls = [float(v) for v in ref_items[:3]]

    ours = YOLOv7Loss(num_classes=C, anchors=V7_ANCHORS)
    total, items = ours(ours_p, padded, img_size=float(img_size))

    np.testing.assert_allclose(float(items["box_loss"]), ref_box, atol=2e-4)
    np.testing.assert_allclose(float(items["obj_loss"]), ref_obj, atol=2e-4)
    np.testing.assert_allclose(float(items["cls_loss"]), ref_cls, atol=2e-4)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-3)


@pytest.mark.parametrize("seed", [0, 1])
def test_fcos_loss_matches_reference(seed):
    from src.losses.fcos_loss import FCOSLoss as RefLoss

    from cvpytorch_tpu.models.heads.fcos_head import fcos_loss

    rs = np.random.RandomState(seed)
    B, C, M = 2, 4, 5
    img = 128
    grids = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    # gts in pixels, well separated, mixed sizes to hit several levels
    boxes = np.full((B, M, 4), -1.0, np.float32)
    labels = np.full((B, M), -1, np.int64)
    n_per = 3
    protos = [(5, 5, 40, 45), (60, 10, 120, 80), (10, 70, 50, 120)]
    for b in range(B):
        for t in range(n_per):
            x1, y1, x2, y2 = protos[t]
            j = rs.uniform(-3, 3, 4)
            boxes[b, t] = np.clip(
                [x1 + j[0], y1 + j[1], x2 + j[2], y2 + j[3]], 0, img - 1)
            labels[b, t] = rs.randint(0, C)
    valid = labels >= 0

    cls_o, cls_t = [], []
    cnt_o, cnt_t = [], []
    reg_o, reg_t = [], []
    for (h, w) in grids:
        c = rs.randn(B, h, w, C).astype(np.float32)
        n = rs.randn(B, h, w, 1).astype(np.float32)
        r = np.exp(rs.randn(B, h, w, 4).astype(np.float32))  # positive ltrb
        cls_o.append(jnp.asarray(c)); cls_t.append(to_torch(c.transpose(0, 3, 1, 2)))
        cnt_o.append(jnp.asarray(n)); cnt_t.append(to_torch(n.transpose(0, 3, 1, 2)))
        reg_o.append(jnp.asarray(r)); reg_t.append(to_torch(r.transpose(0, 3, 1, 2)))

    ref = RefLoss()
    # reference one-hot compares labels against arange(1, C+1) → 1-based
    ref_cls, ref_cnt, ref_reg, ref_total = ref(
        (cls_t, cnt_t, reg_t), to_torch(boxes),
        to_torch(np.where(valid, labels + 1, -1)))

    outs = [(c, n, r) for c, n, r in zip(cls_o, cnt_o, reg_o)]
    total, items = fcos_loss(outs, jnp.asarray(boxes),
                             jnp.asarray(np.where(valid, labels, 0)),
                             jnp.asarray(valid), C)
    np.testing.assert_allclose(float(items["cls_loss"]), float(ref_cls),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(items["cnt_loss"]), float(ref_cnt),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(items["reg_loss"]), float(ref_reg),
                               rtol=2e-4, atol=1e-5)


def _seg_case(rs, B=2, C=5, H=16, W=16, with_ignore=True):
    logits = rs.randn(B, H, W, C).astype(np.float32)
    labels = rs.randint(0, C, (B, H, W)).astype(np.int32)
    if with_ignore:
        labels[:, :2, :3] = 255
    t_logits = to_torch(logits.transpose(0, 3, 1, 2))
    t_labels = to_torch(labels.astype(np.int64))
    return jnp.asarray(logits), jnp.asarray(labels), t_logits, t_labels


def test_ce2d_matches_reference():
    from src.losses.seg_loss import CrossEntropyLoss2d as RefCE

    from cvpytorch_tpu.models.losses.seg_loss import cross_entropy_2d

    rs = np.random.RandomState(0)
    logits, labels, t_logits, t_labels = _seg_case(rs)
    ref = float(RefCE()(t_logits, t_labels))
    got = float(cross_entropy_2d(logits, labels))
    np.testing.assert_allclose(got, ref, rtol=1e-5)

    # weighted variant (per-class dictionary weights, reference UNet path)
    w = rs.uniform(0.5, 2.0, 5).astype(np.float32)
    ref_w = float(RefCE(weight=to_torch(w))(t_logits, t_labels))
    got_w = float(cross_entropy_2d(logits, labels, class_weights=w))
    np.testing.assert_allclose(got_w, ref_w, rtol=1e-5)


def test_dice_matches_reference():
    from src.losses.seg_loss import DiceLoss as RefDice

    from cvpytorch_tpu.models.losses.seg_loss import dice_loss

    rs = np.random.RandomState(0)
    logits, labels, t_logits, t_labels = _seg_case(rs, with_ignore=False)
    ref = float(RefDice()(t_logits, t_labels))
    got = float(dice_loss(logits, labels))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_lovasz_matches_reference():
    from src.losses.seg_loss import LovaszSoftmax as RefLovasz

    from cvpytorch_tpu.models.losses.seg_loss import lovasz_softmax

    rs = np.random.RandomState(0)
    logits, labels, t_logits, t_labels = _seg_case(rs, with_ignore=False)
    ref = float(RefLovasz()(t_logits, t_labels))
    got = float(lovasz_softmax(logits, labels))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


@pytest.mark.parametrize("loss_type", ["focal", "sigmoid", "softmax"])
def test_class_balanced_loss_matches_reference(loss_type):
    """CB loss on effective sample numbers
    (reference cb_loss.py:55-89)."""
    from src.losses.cb_loss import CB_loss

    from cvpytorch_tpu.models.losses.cls_loss import class_balanced_loss

    rs = np.random.RandomState(3)
    nc = 5
    logits = rs.rand(10, nc).astype(np.float32)
    labels = rs.randint(0, nc, (10,))
    spc = [2, 3, 1, 2, 2]
    if loss_type == "sigmoid":
        # reference passes an invalid 'weights=' kwarg on this branch —
        # reproduce its intent (weighted BCE) instead of its TypeError
        import torch as _t
        w = 1.0 - np.power(0.9999, spc)
        w = (1 - 0.9999) / w
        w = w / w.sum() * nc
        oh = np.eye(nc, dtype=np.float32)[labels]
        ww = (oh * w[None]).sum(1, keepdims=True)
        want = _t.nn.functional.binary_cross_entropy_with_logits(
            _t.from_numpy(logits), _t.from_numpy(oh),
            weight=_t.from_numpy(ww.astype(np.float32))).item()
    else:
        import torch as _t
        want = float(CB_loss(_t.from_numpy(labels), _t.from_numpy(logits),
                             spc, nc, loss_type, 0.9999, 2.0))
    got = float(class_balanced_loss(jnp.asarray(logits),
                                    jnp.asarray(labels), spc,
                                    loss_type=loss_type))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_detail_aggregate_loss_matches_reference():
    """Multi-scale boundary pyramid + BCE + dice (reference
    seg_loss.py:325-384 DetailAggregateLoss — registered upstream but
    wired to no model there)."""
    import torch as _t

    from src.losses.seg_loss import DetailAggregateLoss

    from cvpytorch_tpu.models.light_seg import detail_loss

    rs = np.random.RandomState(5)
    labels = (rs.rand(2, 32, 32) > 0.6).astype(np.int64)
    logits = rs.randn(2, 32, 32).astype(np.float32)

    ref = DetailAggregateLoss()
    with _t.no_grad():
        bce_w, dice_w = ref(_t.from_numpy(logits)[:, None],
                            _t.from_numpy(labels))
    bce_g, dice_g = detail_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(bce_g), float(bce_w), rtol=1e-5)
    np.testing.assert_allclose(float(dice_g), float(dice_w), rtol=1e-5)


def _yolov6_priors(img=64, strides=(8, 16, 32)):
    """(cx,cy,s,s) priors at (i+0.5)*stride, like YOLOv6._forward."""
    from cvpytorch_tpu.models.heads.nanodet_head import center_priors

    sizes = [(img // s, img // s) for s in strides]
    priors = np.array(center_priors(sizes, strides))
    priors[:, 0:2] += priors[:, 2:4] * 0.5
    return priors, tuple(h * w for h, w in sizes)


def test_yolov6_warmup_anchors_match_reference():
    """Warmup grid-cell anchors (center ± 2.5·stride) vs the reference's
    generate_anchors (yolov6_anchor_generator.py:39-53, grid_cell_size=5,
    offset=0.5)."""
    import torch as _t

    from src.models.anchors.yolov6_anchor_generator import generate_anchors

    img, strides = 64, (8, 16, 32)
    feats = [_t.zeros(1, 8, img // s, img // s) for s in strides]
    anchors, anchor_points, nlp, stride_tensor = generate_anchors(
        feats, list(strides), 5.0, 0.5, device="cpu")

    priors, nlp_ours = _yolov6_priors(img, strides)
    assert tuple(nlp) == nlp_ours
    half = priors[:, 2:3] * 2.5
    ours = np.concatenate([priors[:, :2] - half, priors[:, :2] + half], -1)
    np.testing.assert_allclose(ours, anchors.numpy(), atol=1e-6)
    np.testing.assert_allclose(priors[:, :2], anchor_points.numpy(),
                               atol=1e-6)


def test_yolov6_warmup_atss_matches_reference():
    """The ATSS warmup assignment (epochs < warmup_epoch) vs the
    reference's meituan-flavor ATSSAssigner
    (atss_assigner.py:29-98: strict iou>thr, center eps 1e-9,
    unmasked-argmax multi-gt dedup, IoU(pred,gt) soft labels)."""
    import torch as _t

    from src.models.assigners.atss_assigner import ATSSAssigner

    from cvpytorch_tpu.models.assigners.atss_assigner import atss_assign
    from cvpytorch_tpu.ops.boxes import bbox_iou

    # img=96 keeps every level >= topk anchors: the reference assigner
    # crashes outright when a level has < topk (atss_assigner.py:114
    # repeats mask_gt by topk but topk's selected_k shrinks) -- never hit
    # at its real 640 input size
    img, C, Mpad = 96, 7, 8
    priors, nlp = _yolov6_priors(img)
    P = priors.shape[0]
    half = priors[:, 2:3] * 2.5
    anchor_boxes = np.concatenate(
        [priors[:, :2] - half, priors[:, :2] + half], -1).astype(np.float32)

    ref = ATSSAssigner(topk=9, num_classes=C)
    rs = np.random.RandomState(77)
    checked_fg = 0
    for trial in range(20):
        B = rs.randint(1, 3)
        gt_p = np.zeros((B, Mpad, 4), np.float32)
        lab_p = np.zeros((B, Mpad), np.int32)
        valid = np.zeros((B, Mpad), bool)
        for b in range(B):
            m = rs.randint(1, 6)
            x1 = rs.uniform(0, 64, m)
            y1 = rs.uniform(0, 64, m)
            w = rs.uniform(6, 40, m)
            h = rs.uniform(6, 40, m)
            gt_p[b, :m] = np.stack(
                [x1, y1, np.minimum(x1 + w, img), np.minimum(y1 + h, img)],
                -1)
            lab_p[b, :m] = rs.randint(0, C, m)
            valid[b, :m] = True
        # predicted boxes: jittered gts scattered over anchors + noise
        pd = np.zeros((B, P, 4), np.float32)
        cx = priors[:, 0] + rs.uniform(-4, 4, P)
        cy = priors[:, 1] + rs.uniform(-4, 4, P)
        pw = rs.uniform(4, 24, P)
        ph = rs.uniform(4, 24, P)
        pd[:] = np.stack([cx - pw / 2, cy - ph / 2,
                          cx + pw / 2, cy + ph / 2], -1)

        with _t.no_grad():
            t_lab, t_box, t_sc, t_fg = ref(
                _t.from_numpy(anchor_boxes), list(nlp),
                _t.from_numpy(lab_p.astype(np.float32))[..., None],
                _t.from_numpy(gt_p),
                _t.from_numpy(valid.astype(np.float32))[..., None],
                _t.from_numpy(pd))

        out = jax.vmap(lambda gb, gl, gv: atss_assign(
            jnp.asarray(priors), nlp, jnp.asarray(anchor_boxes),
            gb, gl, gv, topk=9, center_eps=1e-9, strict_thr=True,
            dedup_unmasked=True,
        ))(jnp.asarray(gt_p), jnp.asarray(lab_p), jnp.asarray(valid))
        mg = np.asarray(out["matched_gt"])
        fg = mg >= 0
        checked_fg += int(fg.sum())

        assert (fg == t_fg.numpy()).all(), trial
        got_lab = np.where(fg, np.take_along_axis(
            lab_p, np.maximum(mg, 0), axis=1), C)
        assert (got_lab == t_lab.numpy()).all(), trial
        got_box = np.take_along_axis(
            gt_p, np.maximum(mg, 0)[..., None], axis=1) * fg[..., None]
        np.testing.assert_allclose(
            got_box, t_box.numpy() * t_fg.numpy()[..., None], atol=1e-5)
        # soft label: onehot(label) * IoU(pred box, assigned gt)
        align = np.asarray(bbox_iou(
            jnp.asarray(pd),
            jnp.take_along_axis(jnp.asarray(gt_p),
                                jnp.maximum(jnp.asarray(mg), 0)[..., None],
                                axis=1))) * fg
        soft = (np.eye(C, dtype=np.float32)[got_lab % C]
                * fg[..., None] * align[..., None])
        np.testing.assert_allclose(soft, t_sc.numpy(), atol=1e-5)
    assert checked_fg > 50  # the scenes actually exercised assignment


def test_yolov6_loss_warmup_switch():
    """yolov6_loss under jit: epoch<warmup uses the ATSS branch, epoch>=
    warmup the TAL branch, switched by lax.cond on a traced scalar
    (reference yolov6_loss.py:80-97).  Both emit finite losses and the
    branch actually changes the value."""
    from cvpytorch_tpu.models.yolov6 import yolov6_loss

    rs = np.random.RandomState(3)
    priors, nlp = _yolov6_priors(64)
    P = priors.shape[0]
    C, B, M = 7, 2, 8
    preds = jnp.asarray(rs.randn(B, P, 4 + C).astype(np.float32))
    gt = np.zeros((B, M, 4), np.float32)
    gt[:, 0] = [8, 8, 40, 40]
    gt[:, 1] = [30, 24, 62, 60]
    targets = {"boxes": jnp.asarray(gt),
               "labels": jnp.zeros((B, M), jnp.int32),
               "valid": jnp.asarray(np.arange(M)[None, :] < 2).repeat(B, 0)}

    @jax.jit
    def run(epoch):
        total, losses = yolov6_loss(preds, jnp.asarray(priors), targets, C,
                                    num_level_priors=nlp, epoch=epoch,
                                    warmup_epoch=4)
        return total

    warm = float(run(jnp.int32(0)))
    main = float(run(jnp.int32(4)))
    assert np.isfinite(warm) and np.isfinite(main)
    assert warm != main  # branches differ

    # epoch=None (and val paths) fall back to TAL
    total_none, _ = yolov6_loss(preds, jnp.asarray(priors), targets, C,
                                num_level_priors=nlp, epoch=None)
    np.testing.assert_allclose(float(total_none), main, rtol=1e-5)

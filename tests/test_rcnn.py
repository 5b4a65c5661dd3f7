"""ROIAlign numerics + Mask R-CNN contract."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.models.rcnn import (
    MaskRCNN,
    decode_deltas,
    encode_deltas,
    make_anchors,
)
from cvpytorch_tpu.ops.roi_align import multiscale_roi_align, roi_align


def test_roi_align_constant_region():
    # constant-valued feature map → aligned output equals the constant
    f = jnp.full((16, 16, 3), 7.0)
    out = roi_align(f, jnp.array([[2.0, 2, 10, 10]]), output_size=4)
    assert out.shape == (1, 4, 4, 3)
    assert np.allclose(np.asarray(out), 7.0, atol=1e-5)


def test_roi_align_gradient_region():
    # linear ramp in x: bin centers should reproduce the ramp
    xs = jnp.tile(jnp.arange(16.0)[None, :, None], (16, 1, 1))
    out = roi_align(xs, jnp.array([[0.0, 0, 16, 16]]), output_size=4,
                    aligned=True)
    centers = np.asarray(out[0, 0, :, 0])
    # bins centered at 2,6,10,14 → x-coord − 0.5 alignment ≈ 1.5,5.5,9.5,13.5
    assert np.allclose(centers, [1.5, 5.5, 9.5, 13.5], atol=0.1), centers


def test_encode_decode_roundtrip():
    anchors = jnp.array([[10.0, 10, 50, 50], [0, 0, 20, 40]])
    boxes = jnp.array([[12.0, 8, 60, 44], [2, 2, 18, 38]])
    rec = decode_deltas(encode_deltas(boxes, anchors), anchors)
    assert np.allclose(np.asarray(rec), np.asarray(boxes), atol=1e-4)


def test_make_anchors_counts():
    a = make_anchors([(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)])
    assert a.shape == ((64 + 16 + 4 + 1 + 1) * 3, 4)
    # first level anchors centered at (2, 2) with size 32
    assert abs(float(a[1, 2] - a[1, 0]) - 32.0) < 1e-3  # aspect 1.0


def test_multiscale_roi_align_level_select():
    feats = [jnp.full((1, 32 // s * 8, 32 // s * 8, 2), float(i + 1))
             for i, s in enumerate((4, 8, 16, 32))]
    # small box → level 0 (value 1); 224px box → level 2 (value 3)
    boxes = jnp.array([[0.0, 0, 32, 32], [0, 0, 224, 224]])
    idx = jnp.zeros(2, jnp.int32)
    out = multiscale_roi_align(feats, (4, 8, 16, 32), boxes, idx,
                               output_size=2)
    assert np.allclose(np.asarray(out[0]), 1.0)
    assert np.allclose(np.asarray(out[1]), 3.0)


def test_multiscale_single_gather_matches_masked():
    # the single-gather leveled path must equal the align-on-every-level
    # one-hot form exactly (same taps, same masks), incl. OOB boxes and
    # mixed batch indices
    from cvpytorch_tpu.ops.roi_align import _multiscale_roi_align_masked

    rng = np.random.RandomState(3)
    B, C = 2, 5
    feats = [jnp.asarray(rng.randn(B, 64 // s * 4, 64 // s * 4, C)
                         .astype(np.float32)) for s in (4, 8, 16, 32)]
    n = 24
    xy = rng.rand(n, 2) * 200 - 30          # some exit the image
    wh = rng.rand(n, 2) * 250 + 4           # sizes spanning all levels
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, B, n).astype(np.int32))
    a = multiscale_roi_align(feats, (4, 8, 16, 32), boxes, idx, output_size=7)
    b = _multiscale_roi_align_masked(feats, (4, 8, 16, 32), boxes, idx,
                                     output_size=7)
    assert a.shape == b.shape == (n, 7, 7, C)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5), \
        np.abs(np.asarray(a) - np.asarray(b)).max()
    # gradients through the gather must match too (train path uses them)
    ga = jax.grad(lambda fs: multiscale_roi_align(
        fs, (4, 8, 16, 32), boxes, idx).sum())(feats)
    gb = jax.grad(lambda fs: _multiscale_roi_align_masked(
        fs, (4, 8, 16, 32), boxes, idx).sum())(feats)
    for x, y in zip(ga, gb):
        assert np.allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_crop_resize_separable_matches_roi_align():
    # the MXU matmul crop must reproduce vmap(roi_align) on mask planes
    # exactly — incl. boxes exiting the plane (per-axis tap zeroing)
    from cvpytorch_tpu.ops.roi_align import crop_resize_separable

    rs = np.random.RandomState(7)
    N, H = 12, 40
    planes = jnp.asarray(rs.rand(N, H, H).astype(np.float32))
    xy = rs.rand(N, 2) * 50 - 10
    wh = rs.rand(N, 2) * 45 + 2
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    got = crop_resize_separable(planes, boxes, output_size=8)
    want = jax.vmap(
        lambda m, b: roi_align(m[..., None], b[None], output_size=8)[0]
    )(planes, boxes)[..., 0]
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5), \
        np.abs(np.asarray(got) - np.asarray(want)).max()


def test_maskrcnn_contract(rng):
    model = MaskRCNN(
        dictionary=({"a": 1}, {"b": 1}),
        model_cfg=CommonConfiguration(
            {"BACKBONE": {"name": "ResNet", "subtype": "resnet18",
                          "out_stages": [1, 2, 3, 4]}}),
        num_proposals=32, pre_nms_topk=128, with_mask=True,
        mask_size=28)  # must match the raster below (trace-time guard)
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    M, mh = 4, 28
    masks = np.zeros((1, M, mh, mh), np.float32)
    masks[0, 0, 5:20, 5:20] = 1.0
    tgts = {"boxes": jnp.array([[[8.0, 8, 40, 40]] + [[0, 0, 0, 0]] * 3]),
            "labels": jnp.zeros((1, M), jnp.int32),
            "valid": jnp.array([[True, False, False, False]]),
            "masks": jnp.asarray(masks),
            "pads": jnp.zeros((1, 2)), "scales": jnp.ones((1, 2))}
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    (total, ld), _ = model.apply(v, imgs, tgts, mode="train",
                                 mutable=["batch_stats"])
    assert np.isfinite(float(total))
    assert {"rpn_obj_loss", "rpn_reg_loss", "cls_loss", "box_loss",
            "mask_loss"} <= set(ld)
    g = jax.grad(lambda p: model.apply(
        {"params": p, "batch_stats": v["batch_stats"]}, imgs, tgts,
        mode="train", mutable=["batch_stats"])[0][0])(v["params"])
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
    _, preds = model.apply(v, imgs, tgts, mode="val")
    assert preds["boxes"].shape == (1, 100, 4)


def test_paste_masks_box_indicator():
    import numpy as np

    from cvpytorch_tpu.ops.masks import paste_masks

    B, K = 1, 2
    masks = jnp.ones((B, K, 28, 28))
    boxes = jnp.array([[[10.0, 20.0, 60.0, 100.0],
                        [0.0, 0.0, 112.0, 112.0]]])
    hs = jnp.array([112.0])
    ws = jnp.array([112.0])
    out = np.asarray(paste_masks(masks, boxes, hs, ws, out_size=112))
    # detection 1 covers the whole image
    assert out[0, 1].mean() > 0.98
    # detection 0 matches its box indicator up to the 1-px border
    ref = np.zeros((112, 112))
    ref[20:100, 10:60] = 1.0
    inter = (out[0, 0] * ref).sum()
    union = ((out[0, 0] + ref) > 0).sum()
    assert inter / union > 0.9, inter / union
    # nothing outside the box
    assert out[0, 0][:18, :].sum() == 0 and out[0, 0][:, 62:].sum() == 0


def test_maskrcnn_val_emits_pasted_masks(rng):
    model = MaskRCNN(
        dictionary=({"a": 1}, {"b": 1}),
        model_cfg=CommonConfiguration(
            {"BACKBONE": {"name": "ResNet", "subtype": "resnet18",
                          "out_stages": [1, 2, 3, 4]}}),
        num_proposals=32, pre_nms_topk=128, with_mask=True,
        mask_size=28)  # must match the raster below (trace-time guard)
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    masks = np.zeros((1, 2, 28, 28), np.float32)
    masks[0, 0, 5:20, 5:20] = 1.0
    tgts = {"boxes": jnp.array([[[8.0, 8, 40, 40], [0, 0, 0, 0]]]),
            "labels": jnp.zeros((1, 2), jnp.int32),
            "valid": jnp.array([[True, False]]),
            "masks": jnp.asarray(masks),
            "pads": jnp.zeros((1, 2)), "scales": jnp.ones((1, 2)),
            "height": jnp.array([64]), "width": jnp.array([64])}
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    _, preds = model.apply(v, imgs, tgts, mode="val")
    assert "masks" in preds
    B, K = preds["boxes"].shape[:2]
    # paste raster tracks mask_size (must equal the dataset gt raster
    # the evaluator compares against)
    assert preds["masks"].shape == (B, K, 28, 28)
    assert set(np.unique(np.asarray(preds["masks"]))) <= {0.0, 1.0}


def test_coco_eval_segm_perfect_predictions():
    import numpy as np
    import pytest

    from cvpytorch_tpu.evaluator.coco import CocoEvaluator

    ev = CocoEvaluator(num_classes=2, iou_types=("bbox", "segm"))
    gt_boxes = np.array([[[10.0, 10.0, 50.0, 60.0]]])
    gt_masks = np.zeros((1, 1, 112, 112), np.float32)
    gt_masks[0, 0, 10:60, 10:50] = 1.0
    targets = {"boxes": gt_boxes, "labels": np.array([[1]]),
               "valid": np.array([[True]]),
               "pads": np.zeros((1, 2)), "scales": np.ones((1, 2)),
               "masks": gt_masks}
    preds = {"boxes": gt_boxes.copy(), "scores": np.array([[0.9]]),
             "labels": np.array([[1]]), "valid": np.array([[True]]),
             "masks": gt_masks.copy()}
    ev.update(targets, preds)
    out = ev.evaluate()
    assert out["bbox_mAP"] == pytest.approx(1.0)
    assert out["segm_mAP"] == pytest.approx(1.0)


def test_batched_roi_align_matches_per_image():
    """Tap-gather batched form ≡ per-image roi_align (the r4 rewrite that
    removed the (N,H,W,C) per-ROI map materialization — 44 GB at
    800²/bs8)."""
    rs = np.random.RandomState(3)
    feats = jnp.asarray(rs.randn(3, 24, 32, 8).astype(np.float32))
    boxes = jnp.asarray(
        np.stack([rs.uniform(0, 20, 16), rs.uniform(0, 16, 16),
                  rs.uniform(24, 60, 16), rs.uniform(20, 44, 16)], -1)
        .astype(np.float32))
    # boxes that exit the (48, 64)-px image on exactly ONE axis each — the
    # per-axis tap mask (inb_y[i] & inb_x[j]) must not conflate validity
    # across axes (ADVICE r4 #1)
    oob = np.array([[-12.0, 4.0, 10.0, 20.0],    # exits left only
                    [30.0, -9.0, 50.0, 14.0],    # exits top only
                    [40.0, 8.0, 80.0, 30.0],     # exits right only
                    [10.0, 30.0, 34.0, 70.0]],   # exits bottom only
                   dtype=np.float32)
    boxes = jnp.concatenate([boxes, jnp.asarray(oob)], 0)
    idx = jnp.asarray(rs.randint(0, 3, 20).astype(np.int32))
    from cvpytorch_tpu.ops.roi_align import batched_roi_align

    got = batched_roi_align(feats, boxes, idx, output_size=7,
                            spatial_scale=0.5)
    want = jax.vmap(
        lambda img, box: roi_align(img, box[None], 7, 0.5)[0]
    )(feats[idx], boxes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

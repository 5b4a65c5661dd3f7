"""YOLOv5 stack tests: neck/detect shapes, decode math, loss target
assignment semantics, full train/val contract."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.models.detects.yolov5_detect import decode_yolov5
from cvpytorch_tpu.models.losses.yolov5_loss import (
    YOLOv5Loss,
    _build_level_targets,
)
from cvpytorch_tpu.models.yolov5 import DEFAULT_ANCHORS, STRIDES, YOLOv5


def _model_cfg():
    return CommonConfiguration({
        "TYPE": "yolov5_s",
        "LOSS": {"name": "YOLOv5Loss", "hyp_box": 0.05, "hyp_obj": 1.0,
                 "hyp_cls": 0.5},
    })


def _targets(B=2, M=8):
    boxes = np.zeros((B, M, 4), np.float32)
    labels = np.zeros((B, M), np.int32)
    valid = np.zeros((B, M), bool)
    # one box per image: centered 100x100 at (160,160) in a 320 image
    boxes[:, 0] = [110, 110, 210, 210]
    labels[:, 0] = 1
    valid[:, 0] = True
    return {
        "boxes": jnp.asarray(boxes), "labels": jnp.asarray(labels),
        "valid": jnp.asarray(valid),
        "pads": jnp.zeros((B, 2)), "scales": jnp.ones((B, 2)),
        "height": jnp.full((B,), 320), "width": jnp.full((B,), 320),
    }


def test_build_level_targets_assignment():
    # single gt at grid center (2.5, 2.5) in a 4x4 grid, wh = 1.0 grid units
    boxes = jnp.array([[[0.625, 0.625, 0.25, 0.25]]])  # cxcywh normalized
    valid = jnp.ones((1, 1), bool)
    anchors = jnp.array([[1.0, 1.0]])
    t = _build_level_targets(boxes, valid, anchors, nx=4, ny=4,
                             anchor_t=4.0, max_anchors=1)
    w = np.asarray(t["w"][0])
    # gx=gy=2.5: fractional part 0.5 → no extra neighbour offsets, only center
    assert w.sum() == 1.0
    cell = np.asarray(t["flat_cell"][0])[w > 0]
    assert cell[0] == (2 * 4 + 2) * 1  # cell (2,2)

    # gt at (2.25, 2.25): x%1<0.5 and y%1<0.5 → center + left + up = 3 cells
    boxes2 = jnp.array([[[0.5625, 0.5625, 0.25, 0.25]]])
    t2 = _build_level_targets(boxes2, valid, anchors, 4, 4, 4.0, 1)
    w2 = np.asarray(t2["w"][0])
    assert w2.sum() == 3.0
    cells2 = sorted(np.asarray(t2["flat_cell"][0])[w2 > 0].tolist())
    assert cells2 == [(1 * 4 + 2), (2 * 4 + 1), (2 * 4 + 2)]  # up, left, center


def test_anchor_ratio_filter():
    # tiny box vs large anchor → filtered everywhere
    boxes = jnp.array([[[0.5, 0.5, 0.01, 0.01]]])
    valid = jnp.ones((1, 1), bool)
    anchors = jnp.array([[10.0, 10.0]])
    t = _build_level_targets(boxes, valid, anchors, 8, 8, 4.0, 1)
    assert float(t["w"].sum()) == 0.0


def test_decode_golden():
    # one level 2x2, 1 anchor; raw zeros → sigmoid=0.5 → xy=(0.5+grid)*stride
    raw = [jnp.zeros((1, 2, 2, 1, 6))]
    out = np.asarray(decode_yolov5(raw, [[(2.0, 2.0)]], [8.0]))
    assert out.shape == (1, 4, 6)
    # cell (0,0): xy = (0.5*2-0.5+0)*8 = 4; wh = (0.5*2)^2*anchor*stride=16
    assert np.allclose(out[0, 0, :4], [4, 4, 16, 16])
    assert np.allclose(out[0, 3, :2], [12, 12])  # cell (1,1)


def test_loss_decreases_towards_target():
    """Loss with matching predictions < loss with zero predictions."""
    loss = YOLOv5Loss(num_classes=4, anchors=DEFAULT_ANCHORS)
    B, size = 1, 64
    raws = [jnp.zeros((B, size // int(s), size // int(s), 3, 9))
            for s in STRIDES]
    targets = {
        "boxes": jnp.array([[[0.5, 0.5, 0.25, 0.25]]]),
        "labels": jnp.array([[2]]),
        "valid": jnp.ones((1, 1), bool),
    }
    total0, parts0 = loss(raws, targets)
    assert np.isfinite(float(total0))
    assert all(np.isfinite(float(v)) for v in parts0.values())
    # no targets → box/cls zero, obj pushes scores down
    empty = {"boxes": jnp.zeros((1, 1, 4)),
             "labels": jnp.zeros((1, 1), jnp.int32),
             "valid": jnp.zeros((1, 1), bool)}
    total_e, parts_e = loss(raws, empty)
    assert float(parts_e["box_loss"]) == 0.0
    assert float(parts_e["cls_loss"]) == 0.0
    assert float(parts_e["obj_loss"]) > 0.0


def test_loss_gradients_flow():
    loss = YOLOv5Loss(num_classes=4, anchors=DEFAULT_ANCHORS)
    targets = {
        "boxes": jnp.array([[[0.5, 0.5, 0.25, 0.25]]]),
        "labels": jnp.array([[2]]),
        "valid": jnp.ones((1, 1), bool),
    }

    def f(x):
        raws = [x[i] for i in range(3)]
        return loss([jnp.broadcast_to(r, r.shape) for r in raws], targets)[0]

    raws = [jnp.zeros((1, 8, 8, 3, 9)), jnp.zeros((1, 4, 4, 3, 9)),
            jnp.zeros((1, 2, 2, 3, 9))]
    grads = jax.grad(lambda rs: loss(rs, targets)[0])(raws)
    gnorm = sum(float(jnp.abs(g).sum()) for g in grads)
    assert gnorm > 0 and np.isfinite(gnorm)


def test_obj_slice_matmul_exact(monkeypatch):
    """CVT_OBJ_SLICE=matmul (PERF.md r5 A/B hook) is numerically exact.

    The one-hot selection matmul sums exactly one nonzero product per
    output lane, so loss AND gradients must match the strided-slice
    baseline bit-for-bit in f32.
    """
    loss = YOLOv5Loss(num_classes=4, anchors=DEFAULT_ANCHORS)
    targets = {
        "boxes": jnp.array([[[0.5, 0.5, 0.25, 0.25]]]),
        "labels": jnp.array([[2]]),
        "valid": jnp.ones((1, 1), bool),
    }
    rng = np.random.RandomState(0)
    raws = [jnp.asarray(rng.randn(1, s, s, 3, 9).astype(np.float32))
            for s in (8, 4, 2)]

    def total_and_grads(rs):
        t, _ = loss(rs, targets)
        g = jax.grad(lambda r: loss(r, targets)[0])(rs)
        return float(t), g

    monkeypatch.delenv("CVT_OBJ_SLICE", raising=False)
    t0, g0 = total_and_grads(raws)
    monkeypatch.setenv("CVT_OBJ_SLICE", "matmul")
    t1, g1 = total_and_grads(raws)
    assert np.isclose(t0, t1, rtol=0, atol=1e-6)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_yolov5_model_contract(rng):
    model = YOLOv5(dictionary=({"a": 1}, {"b": 1}, {"c": 1}, {"d": 1}),
                   model_cfg=_model_cfg())
    imgs = jnp.zeros((2, 64, 64, 3))
    tgts = _targets()
    vars_ = model.init({"params": rng, "dropout": rng}, imgs, tgts,
                       mode="train")
    (total, losses), _ = model.apply(vars_, imgs, tgts, mode="train",
                                     mutable=["batch_stats"])
    assert np.isfinite(float(total))
    assert set(losses) >= {"box_loss", "obj_loss", "cls_loss"}

    loss_dict, preds = model.apply(vars_, imgs, tgts, mode="val")
    assert preds["boxes"].shape == (2, 300, 4)
    assert preds["valid"].shape == (2, 300)

    infer = model.apply(vars_, imgs, mode="infer")
    assert infer["scores"].shape == (2, 300)

"""YOLOv6: TAL assigner semantics + model contract."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.models.assigners.tal_assigner import tal_assign
from cvpytorch_tpu.models.yolov6 import YOLOv6, decode_yolov6
from cvpytorch_tpu.models.heads.nanodet_head import center_priors


def test_tal_assign_prefers_high_metric():
    P = 16
    priors = np.zeros((P, 4), np.float32)
    i = 0
    for y in range(4):
        for x in range(4):
            priors[i] = [x * 8 + 4, y * 8 + 4, 8, 8]
            i += 1
    gt = jnp.array([[0.0, 0, 32, 32], [0, 0, 0, 0]])
    labels = jnp.array([2, 0])
    valid = jnp.array([True, False])
    # decoded boxes: prior 5 matches the gt perfectly, others are tiny
    decoded = jnp.tile(jnp.array([[0.0, 0, 4, 4]]), (P, 1))
    decoded = decoded.at[5].set(jnp.array([0.0, 0, 32, 32]))
    scores = jnp.full((P, 4), 0.5)
    out = tal_assign(scores, jnp.asarray(priors), decoded, gt, labels, valid,
                     topk=4)
    m = np.asarray(out["matched_gt"])
    assert m[5] == 0  # perfect-iou prior is positive
    am = np.asarray(out["align_metric"])
    assert am[5] == am.max()  # and has the top normalized metric
    assert am[5] <= 1.0


def test_tal_no_gt():
    priors = jnp.tile(jnp.array([[4.0, 4, 8, 8]]), (4, 1))
    out = tal_assign(jnp.full((4, 2), 0.5), priors, jnp.zeros((4, 4)),
                     jnp.zeros((2, 4)), jnp.zeros(2, jnp.int32),
                     jnp.zeros(2, bool))
    assert (np.asarray(out["matched_gt"]) == -1).all()


def test_decode_yolov6():
    priors = center_priors([(1, 2)], [8])
    priors = priors.at[:, 0:2].add(priors[:, 2:4] * 0.5)  # +0.5 stride
    preds = jnp.zeros((1, 2, 6)).at[:, :, :4].set(1.0)  # ltrb=1 stride unit
    boxes = np.asarray(decode_yolov6(preds, priors))
    # center (4,4): ltrb 8px → [-4,-4,12,12]
    assert np.allclose(boxes[0, 0], [-4, -4, 12, 12])


def test_yolov6_contract(rng):
    model = YOLOv6(dictionary=({"a": 1}, {"b": 1}),
                   model_cfg=CommonConfiguration({"TYPE": "yolov6_n"}))
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    tgts = {"boxes": jnp.array([[[8.0, 8, 40, 40], [0, 0, 0, 0]]]),
            "labels": jnp.zeros((1, 2), jnp.int32),
            "valid": jnp.array([[True, False]]),
            "pads": jnp.zeros((1, 2)), "scales": jnp.ones((1, 2))}
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    (total, ld), _ = model.apply(v, imgs, tgts, mode="train",
                                 mutable=["batch_stats"])
    assert np.isfinite(float(total))
    g = jax.grad(lambda p: model.apply(
        {"params": p, "batch_stats": v["batch_stats"]}, imgs, tgts,
        mode="train", mutable=["batch_stats"])[0][0])(v["params"])
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
    _, preds = model.apply(v, imgs, tgts, mode="val")
    assert preds["boxes"].shape == (1, 300, 4)


def test_atss_assigner():
    from cvpytorch_tpu.models.assigners.atss_assigner import atss_assign

    P = 16
    priors = np.zeros((P, 4), np.float32)
    i = 0
    for y in range(4):
        for x in range(4):
            priors[i] = [x * 8 + 4, y * 8 + 4, 8, 8]
            i += 1
    gt = jnp.array([[6.0, 6, 22, 22], [0, 0, 0, 0]])
    labels = jnp.array([1, 0])
    valid = jnp.array([True, False])
    decoded = jnp.stack([
        jnp.asarray(priors[:, 0]) - 6, jnp.asarray(priors[:, 1]) - 6,
        jnp.asarray(priors[:, 0]) + 6, jnp.asarray(priors[:, 1]) + 6], -1)
    out = atss_assign(jnp.asarray(priors), (P,), decoded, gt, labels, valid,
                      topk=6)
    m = np.asarray(out["matched_gt"])
    assert (m >= 0).sum() >= 1
    assert (m[m >= 0] == 0).all()
    # positives must have centers inside the gt
    for idx in np.where(m >= 0)[0]:
        assert 6 < priors[idx, 0] < 22 and 6 < priors[idx, 1] < 22


def test_mixup_transform():
    from cvpytorch_tpu.data.transforms.det_transforms import MixUp

    a = {"image": np.full((8, 8, 3), 200, np.uint8),
         "target": {"boxes": np.array([[1.0, 1, 4, 4]], np.float32),
                    "labels": np.array([0], np.int32)}}
    b = {"image": np.zeros((8, 8, 3), np.uint8),
         "target": {"boxes": np.array([[2.0, 2, 6, 6]], np.float32),
                    "labels": np.array([1], np.int32)}}
    out = MixUp(p=1.0)([a, b])
    assert out["target"]["boxes"].shape == (2, 4)
    assert 0 < out["image"].mean() < 200

"""YOLOX: SimOTA assignment, decode, model contract."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.models.assigners.ota_assigner import simota_assign
from cvpytorch_tpu.models.yolox import YOLOX, decode_yolox
from cvpytorch_tpu.models.heads.nanodet_head import center_priors


def test_simota_assigns_inside_gt():
    P = 16
    priors = np.zeros((P, 4), np.float32)
    i = 0
    for y in range(4):
        for x in range(4):
            priors[i] = [x * 8, y * 8, 8, 8]
            i += 1
    gt = jnp.array([[4.0, 4, 28, 28], [0, 0, 0, 0]])
    labels = jnp.array([1, 0])
    valid = jnp.array([True, False])
    decoded = jnp.stack([
        jnp.asarray(priors[:, 0]) - 6, jnp.asarray(priors[:, 1]) - 6,
        jnp.asarray(priors[:, 0]) + 6, jnp.asarray(priors[:, 1]) + 6], -1)
    out = simota_assign(jnp.full((P, 3), 0.5), jnp.full((P,), 0.5),
                        jnp.asarray(priors), decoded, gt, labels, valid)
    m = np.asarray(out["matched_gt"])
    assert (m[m >= 0] == 0).all() and (m >= 0).sum() >= 1
    # all positives lie inside the gt region
    for idx in np.where(m >= 0)[0]:
        assert 4 < priors[idx, 0] < 28 and 4 < priors[idx, 1] < 28


def test_decode_yolox_golden():
    priors = center_priors([(2, 2)], [8])  # centers 0,8 in pixels
    preds = jnp.zeros((1, 4, 6))  # reg=0 → xy = grid*s, wh = e^0*s = 8
    boxes = np.asarray(decode_yolox(preds, priors))
    assert np.allclose(boxes[0, 0], [-4, -4, 4, 4])
    assert np.allclose(boxes[0, 3], [4, 4, 12, 12])


def test_yolox_model_contract(rng):
    model = YOLOX(dictionary=({"a": 1}, {"b": 1}),
                  model_cfg=CommonConfiguration({"TYPE": "yolox_n"}))
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    tgts = {"boxes": jnp.array([[[8.0, 8, 40, 40], [0, 0, 0, 0]]]),
            "labels": jnp.zeros((1, 2), jnp.int32),
            "valid": jnp.array([[True, False]]),
            "pads": jnp.zeros((1, 2)), "scales": jnp.ones((1, 2))}
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    (total, ld), _ = model.apply(v, imgs, tgts, mode="train",
                                 mutable=["batch_stats"])
    assert np.isfinite(float(total))
    assert {"obj_loss", "cls_loss", "iou_loss"} <= set(ld)
    g = jax.grad(lambda p: model.apply(
        {"params": p, "batch_stats": v["batch_stats"]}, imgs, tgts,
        mode="train", mutable=["batch_stats"])[0][0])(v["params"])
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
    _, preds = model.apply(v, imgs, tgts, mode="val")
    assert preds["boxes"].shape == (1, 300, 4)


def test_pai_yolox_asff(rng):
    """PAI-YOLOX = YOLOX + ASFF fusion over PAN outputs."""
    model = YOLOX(dictionary=({"a": 1}, {"b": 1}),
                  model_cfg=CommonConfiguration({"TYPE": "yolox_n"}),
                  use_asff=True)
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    tgts = {"boxes": jnp.array([[[8.0, 8, 40, 40], [0, 0, 0, 0]]]),
            "labels": jnp.zeros((1, 2), jnp.int32),
            "valid": jnp.array([[True, False]]),
            "pads": jnp.zeros((1, 2)), "scales": jnp.ones((1, 2))}
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    assert "asff" in v["params"]
    # PAI also swaps in the RepVGG-block backbone
    # (reference yolox_pai_efficient_rep.py:16)
    assert "stage1_block0" in v["params"]["backbone"]
    (t, _), _ = model.apply(v, imgs, tgts, mode="train",
                            mutable=["batch_stats"])
    assert np.isfinite(float(t))
    _, preds = model.apply(v, imgs, tgts, mode="val")
    assert preds["boxes"].shape == (1, 300, 4)

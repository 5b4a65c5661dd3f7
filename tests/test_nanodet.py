"""NanoDet-Plus: DSL assigner semantics, GFL losses, model contract."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpytorch_tpu.models.assigners.dsl_assigner import dsl_assign
from cvpytorch_tpu.models.heads.nanodet_head import center_priors
from cvpytorch_tpu.models.losses.gfl_loss import (
    distribution_focal_loss,
    integral_project,
    quality_focal_loss,
)
from cvpytorch_tpu.models.nanodet_plus import NanoDetPlus


def test_center_priors():
    p = np.asarray(center_priors([(2, 2), (1, 1)], [8, 16]))
    assert p.shape == (5, 4)
    assert p[0].tolist() == [0, 0, 8, 8]
    assert p[3].tolist() == [8, 8, 8, 8]
    assert p[4].tolist() == [0, 0, 16, 16]


def test_integral_projection():
    # distribution peaked at bin 3 → expectation 3
    logits = jnp.full((1, 4, 8), -10.0).at[..., 3].set(10.0)
    out = np.asarray(integral_project(logits))
    assert np.allclose(out, 3.0, atol=1e-3)


def test_dfl_golden():
    # target exactly on a bin with peaked prediction → ~0 loss
    logits = jnp.full((1, 8), -10.0).at[0, 3].set(10.0)
    assert float(distribution_focal_loss(logits, jnp.array([3.0]))[0]) < 1e-3
    # target between bins 3 and 4 → loss = weighted CE > 0
    assert float(distribution_focal_loss(logits, jnp.array([3.5]))[0]) > 0.1


def test_qfl_positive_negative():
    C = 4
    logits = jnp.zeros((2, C))
    labels = jnp.array([1, C])  # one positive (class 1), one background
    scores = jnp.array([0.8, 0.0])
    loss = np.asarray(quality_focal_loss(logits, labels, scores))
    assert loss.shape == (2,)
    assert (loss > 0).all()


def test_dsl_assign_basic():
    # 4x4 grid of priors at stride 8, one gt covering the top-left corner
    P = 16
    priors = np.zeros((P, 4), np.float32)
    idx = 0
    for y in range(4):
        for x in range(4):
            priors[idx] = [x * 8, y * 8, 8, 8]
            idx += 1
    gt = jnp.array([[2.0, 2.0, 20.0, 20.0], [0, 0, 0, 0]])
    gt_labels = jnp.array([2, 0])
    gt_valid = jnp.array([True, False])
    # predictions: decoded boxes = priors' cell boxes; scores neutral
    decoded = jnp.stack([
        jnp.asarray(priors[:, 0]) - 4, jnp.asarray(priors[:, 1]) - 4,
        jnp.asarray(priors[:, 0]) + 12, jnp.asarray(priors[:, 1]) + 12,
    ], -1)
    scores = jnp.zeros((P, 4))
    out = dsl_assign(scores, jnp.asarray(priors), decoded, gt, gt_labels,
                     gt_valid, 13, 3.0)
    matched = np.asarray(out["matched_gt"])
    # only priors with center inside the gt (x,y in {8,16}) are candidates
    inside = [i for i in range(P)
              if 2 < priors[i, 0] < 20 and 2 < priors[i, 1] < 20]
    assert set(np.where(matched >= 0)[0]).issubset(set(inside))
    assert (matched[matched >= 0] == 0).all()  # all matched to gt 0
    assert np.asarray(out["matched_iou"])[matched >= 0].min() > 0


def test_dsl_no_valid_gt():
    P = 4
    priors = jnp.array([[0.0, 0, 8, 8]] * P)
    out = dsl_assign(jnp.zeros((P, 2)), priors, jnp.zeros((P, 4)),
                     jnp.zeros((2, 4)), jnp.zeros(2, jnp.int32),
                     jnp.zeros(2, bool), 13, 3.0)
    assert (np.asarray(out["matched_gt"]) == -1).all()


def test_nanodet_model_contract(rng):
    model = NanoDetPlus(
        dictionary=({"a": 1}, {"b": 1}),
        model_cfg=None, feat_channels=32)
    # random images: all-zero input makes every activation exactly zero,
    # and chained zero-variance BN backward factors (rsqrt(eps) each)
    # overflow to inf/NaN — a pathological-input artifact, not a model bug
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    tgts = {
        "boxes": jnp.array([[[8.0, 8, 40, 40], [0, 0, 0, 0]]]),
        "labels": jnp.zeros((1, 2), jnp.int32),
        "valid": jnp.array([[True, False]]),
        "pads": jnp.zeros((1, 2)), "scales": jnp.ones((1, 2)),
    }
    vars_ = model.init({"params": rng, "dropout": rng}, imgs, tgts,
                       mode="train")
    (total, losses), _ = model.apply(vars_, imgs, tgts, mode="train",
                                     mutable=["batch_stats"])
    assert np.isfinite(float(total))
    assert {"qfl_loss", "bbox_loss", "dfl_loss"} <= set(losses)
    grads = jax.grad(
        lambda p: model.apply({"params": p, "batch_stats": vars_["batch_stats"]},
                              imgs, tgts, mode="train",
                              mutable=["batch_stats"])[0][0]
    )(vars_["params"])
    gn = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gn) and gn > 0

    ld, preds = model.apply(vars_, imgs, tgts, mode="val")
    assert preds["boxes"].shape == (1, 100, 4)


def test_nanodet_v1_three_strides(rng):
    """NanoDet (v1) = same GFL machinery at strides (8,16,32)."""
    model = NanoDetPlus(dictionary=({"a": 1}, {"b": 1}),
                        feat_channels=32, strides=(8, 16, 32))
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    tgts = {"boxes": jnp.array([[[8.0, 8, 40, 40], [0, 0, 0, 0]]]),
            "labels": jnp.zeros((1, 2), jnp.int32),
            "valid": jnp.array([[True, False]]),
            "pads": jnp.zeros((1, 2)), "scales": jnp.ones((1, 2))}
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    (t, _), _ = model.apply(v, imgs, tgts, mode="train",
                            mutable=["batch_stats"])
    assert np.isfinite(float(t))
    _, preds = model.apply(v, imgs, tgts, mode="val")
    assert preds["boxes"].shape == (1, 100, 4)


def test_nanodet_plus_aux_head(rng):
    """Aux-head assist: stronger head drives assignment for both heads."""
    model = NanoDetPlus(dictionary=({"a": 1}, {"b": 1}), feat_channels=32,
                        strides=(8, 16, 32), use_aux_head=True)
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    tgts = {"boxes": jnp.array([[[8.0, 8, 40, 40], [0, 0, 0, 0]]]),
            "labels": jnp.zeros((1, 2), jnp.int32),
            "valid": jnp.array([[True, False]]),
            "pads": jnp.zeros((1, 2)), "scales": jnp.ones((1, 2))}
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    assert "aux_head" in v["params"]
    (t, ld), _ = model.apply(v, imgs, tgts, mode="train",
                             mutable=["batch_stats"])
    assert np.isfinite(float(t))
    assert "aux_qfl_loss" in ld
    g = jax.grad(lambda p: model.apply(
        {"params": p, "batch_stats": v["batch_stats"]}, imgs, tgts,
        mode="train", mutable=["batch_stats"])[0][0])(v["params"])
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
    # inference path unaffected by the aux head
    _, preds = model.apply(v, imgs, tgts, mode="val")
    assert preds["boxes"].shape == (1, 100, 4)

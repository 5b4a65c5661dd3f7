"""FCOS: target generation semantics, loss finiteness, model contract."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.models.fcos import FCOS
from cvpytorch_tpu.models.heads.fcos_head import (
    decode_fcos,
    gen_fcos_targets,
    level_coords,
)


def test_level_coords():
    c = np.asarray(level_coords(2, 3, 8))
    assert c.shape == (6, 2)
    assert c[0].tolist() == [4, 4]        # stride//2 offset
    assert c[1].tolist() == [12, 4]
    assert c[3].tolist() == [4, 12]


def test_gen_targets_assigns_correct_level():
    # gt 48x48 → max ltrb ~ 24-48 → level 0 (range (-1, 64]) only
    gt = jnp.array([[[32.0, 32, 80, 80], [0, 0, 0, 0]]])
    labels = jnp.array([[3, 0]])
    valid = jnp.array([[True, False]])
    shapes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]  # 128 input
    cls_t, cnt_t, reg_t, coords, strides = gen_fcos_targets(
        shapes, gt, labels, valid)
    cls_np = np.asarray(cls_t[0])
    pos = np.where(cls_np >= 0)[0]
    assert len(pos) > 0
    assert (cls_np[pos] == 3).all()
    # all positives on level 0 (first 256 locations)
    assert pos.max() < 16 * 16
    # centerness in (0, 1]
    cnt = np.asarray(cnt_t[0])[pos]
    assert (cnt > 0).all() and (cnt <= 1).all()
    # location at gt center has max centerness
    cx_idx = pos[np.argmax(cnt)]
    c = np.asarray(coords)[cx_idx]
    assert abs(c[0] - 56) <= 8 and abs(c[1] - 56) <= 8


def test_gen_targets_background_when_no_gt():
    shapes = [(4, 4), (2, 2), (1, 1), (1, 1), (1, 1)]
    cls_t, cnt_t, reg_t, _, _ = gen_fcos_targets(
        shapes, jnp.zeros((1, 2, 4)), jnp.zeros((1, 2), jnp.int32),
        jnp.zeros((1, 2), bool))
    assert (np.asarray(cls_t) == -1).all()
    assert (np.asarray(cnt_t) == -1).all()


def test_fcos_end_to_end(rng):
    model = FCOS(
        dictionary=({"a": 1}, {"b": 1}),
        model_cfg=CommonConfiguration(
            {"BACKBONE": {"name": "ResNet", "subtype": "resnet18",
                          "out_stages": [2, 3, 4]}}))
    imgs = jax.random.normal(rng, (1, 128, 128, 3))
    tgts = {"boxes": jnp.array([[[16.0, 16, 80, 80], [0, 0, 0, 0]]]),
            "labels": jnp.zeros((1, 2), jnp.int32),
            "valid": jnp.array([[True, False]]),
            "pads": jnp.zeros((1, 2)), "scales": jnp.ones((1, 2))}
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    (total, ld), _ = model.apply(v, imgs, tgts, mode="train",
                                 mutable=["batch_stats"])
    assert np.isfinite(float(total))
    assert {"cls_loss", "cnt_loss", "reg_loss"} <= set(ld)
    ld2, preds = model.apply(v, imgs, tgts, mode="val")
    assert preds["boxes"].shape == (1, 100, 4)

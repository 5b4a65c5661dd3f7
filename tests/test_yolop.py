"""YOLOP multitask + FastestDet contracts."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.models.yolop import FastestDet, YOLOP


def _tgts(with_seg=False):
    t = {"boxes": jnp.array([[[8.0, 8, 40, 40], [0, 0, 0, 0]]]),
         "labels": jnp.zeros((1, 2), jnp.int32),
         "valid": jnp.array([[True, False]]),
         "pads": jnp.zeros((1, 2)), "scales": jnp.ones((1, 2))}
    if with_seg:
        t["drivable"] = jnp.zeros((1, 64, 64), jnp.int32).at[:, 30:, :].set(1)
        t["lane"] = jnp.zeros((1, 64, 64), jnp.int32)
    return t


def test_yolop_multitask(rng):
    model = YOLOP(dictionary=({"a": 1}, {"b": 1}),
                  model_cfg=CommonConfiguration({"TYPE": "yolop_n"}))
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    tgts = _tgts(with_seg=True)
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    (total, ld), _ = model.apply(v, imgs, tgts, mode="train",
                                 mutable=["batch_stats"])
    assert np.isfinite(float(total))
    assert {"da_loss", "ll_loss", "box_loss"} <= set(ld)
    _, preds = model.apply(v, imgs, tgts, mode="val")
    assert preds["drivable"].shape == (1, 64, 64)
    assert preds["boxes"].shape == (1, 300, 4)


def test_fastestdet_contract(rng):
    model = FastestDet(dictionary=({"a": 1}, {"b": 1}), model_cfg=None)
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    tgts = _tgts()
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
    assert preds["boxes"].shape == (1, 100, 4)

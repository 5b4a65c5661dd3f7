"""YOLOv7 contract."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.models.yolov7 import YOLOv7


def test_yolov7_contract(rng):
    model = YOLOv7(dictionary=({"a": 1}, {"b": 1}),
                   model_cfg=CommonConfiguration({"TYPE": "yolov7_t"}))
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    tgts = {"boxes": jnp.array([[[8.0, 8, 40, 40], [0, 0, 0, 0]]]),
            "labels": jnp.zeros((1, 2), jnp.int32),
            "valid": jnp.array([[True, False]]),
            "pads": jnp.zeros((1, 2)), "scales": jnp.ones((1, 2))}
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    (total, ld), _ = model.apply(v, imgs, tgts, mode="train",
                                 mutable=["batch_stats"])
    assert np.isfinite(float(total))
    assert {"box_loss", "obj_loss", "cls_loss"} <= set(ld)
    g = jax.grad(lambda p: model.apply(
        {"params": p, "batch_stats": v["batch_stats"]}, imgs, tgts,
        mode="train", mutable=["batch_stats"])[0][0])(v["params"])
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
    _, preds = model.apply(v, imgs, tgts, mode="val")
    assert preds["boxes"].shape == (1, 300, 4)

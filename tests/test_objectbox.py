"""ObjectBox: anchor-free all-scale center assignment contract."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.models.objectbox import ObjectBox


def test_objectbox_contract(rng):
    model = ObjectBox(dictionary=({"a": 1}, {"b": 1}),
                      model_cfg=CommonConfiguration({"TYPE": "objectbox_n"}))
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    tgts = {"boxes": jnp.array([[[8.0, 8, 40, 40], [0, 0, 0, 0]]]),
            "labels": jnp.zeros((1, 2), jnp.int32),
            "valid": jnp.array([[True, False]]),
            "pads": jnp.zeros((1, 2)), "scales": jnp.ones((1, 2))}
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    (t, ld), _ = model.apply(v, imgs, tgts, mode="train",
                             mutable=["batch_stats"])
    assert np.isfinite(float(t))
    # anchor-free: positives exist at every level despite extreme wh ratios
    assert float(ld["box_loss"]) > 0
    _, preds = model.apply(v, imgs, tgts, mode="val")
    assert preds["boxes"].shape == (1, 300, 4)

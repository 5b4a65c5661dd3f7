"""RetinaNet anchors + model contract."""
import jax
import jax.numpy as jnp
import numpy as np

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.models.retinanet import RetinaNet, retina_anchors


def test_retina_anchor_count():
    a = retina_anchors([(8, 8), (4, 4), (2, 2), (1, 1), (1, 1)])
    assert a.shape == ((64 + 16 + 4 + 1 + 1) * 9, 4)
    # first cell: 9 anchors, smallest ~32*1.0 aspect 0.5 → w=32*sqrt(.5)
    w0 = float(a[0, 2] - a[0, 0])
    assert abs(w0 - 32 * (0.5 ** 0.5)) < 1e-3


def test_retinanet_contract(rng):
    model = RetinaNet(
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
    g = jax.grad(lambda p: model.apply(
        {"params": p, "batch_stats": v["batch_stats"]}, imgs, tgts,
        mode="train", mutable=["batch_stats"])[0][0])(v["params"])
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
    _, preds = model.apply(v, imgs, tgts, mode="val")
    assert preds["boxes"].shape == (1, 100, 4)

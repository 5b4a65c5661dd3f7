"""ENet / SegNet / STDC contract tests + detail-target math."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpytorch_tpu.models.light_seg import STDC, detail_target
from cvpytorch_tpu.models.segnet_enet import ENet, SegNet


@pytest.mark.parametrize("cls,kw", [
    (ENet, {}), (STDC, {"subtype": "stdc1"}), (SegNet, {}),
])
def test_light_seg_contract(rng, cls, kw):
    model = cls(dictionary=({"bg": 1.0}, {"fg": 1.0}), **kw)
    img = jax.random.normal(rng, (1, 64, 64, 3))
    tgt = jnp.zeros((1, 64, 64), jnp.int32).at[:, 10:30, 10:30].set(1)
    v = model.init({"params": rng, "dropout": rng}, img, tgt, mode="train")
    (loss, ld), _ = model.apply(v, img, tgt, mode="train",
                                mutable=["batch_stats"],
                                rngs={"dropout": rng})
    assert np.isfinite(float(loss))
    preds = model.apply(v, img, mode="infer", rngs={"dropout": rng})
    assert preds.shape == (1, 64, 64)


def test_detail_target_marks_boundaries():
    m = jnp.zeros((1, 16, 16), jnp.int32).at[:, 4:12, 4:12].set(1)
    d = np.asarray(detail_target(m)[0])
    assert d[4, 4] == 1.0      # corner is boundary
    assert d[8, 8] == 0.0      # interior is not
    assert d[0, 0] == 0.0      # far background is not


@pytest.mark.parametrize("name", ["ICNet", "PPLiteSeg", "LEDNet"])
def test_light_seg2_contract(rng, name):
    from cvpytorch_tpu.models import light_seg2

    cls = getattr(light_seg2, name)
    model = cls(dictionary=({"bg": 1.0}, {"fg": 1.0}))
    img = jax.random.normal(rng, (1, 64, 64, 3))
    tgt = jnp.zeros((1, 64, 64), jnp.int32).at[:, 10:30, 10:30].set(1)
    v = model.init({"params": rng, "dropout": rng}, img, tgt, mode="train")
    (loss, _), _ = model.apply(v, img, tgt, mode="train",
                               mutable=["batch_stats"],
                               rngs={"dropout": rng})
    assert np.isfinite(float(loss))
    preds = model.apply(v, img, mode="infer", rngs={"dropout": rng})
    assert preds.shape == (1, 64, 64)


@pytest.mark.parametrize("name3", ["LSPNet", "SGCPNet"])
def test_light_seg3_contract(rng, name3):
    from cvpytorch_tpu.models import light_seg3

    cls = getattr(light_seg3, name3)
    model = cls(dictionary=({"bg": 1.0}, {"fg": 1.0}))
    img = jax.random.normal(rng, (1, 64, 64, 3))
    tgt = jnp.zeros((1, 64, 64), jnp.int32).at[:, 10:30, 10:30].set(1)
    v = model.init({"params": rng, "dropout": rng}, img, tgt, mode="train")
    (loss, _), _ = model.apply(v, img, tgt, mode="train",
                               mutable=["batch_stats"],
                               rngs={"dropout": rng})
    assert np.isfinite(float(loss))
    assert model.apply(v, img, mode="infer",
                       rngs={"dropout": rng}).shape == (1, 64, 64)

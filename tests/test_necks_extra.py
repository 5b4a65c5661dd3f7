"""TAN / NAS-FPN / RFP necks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpytorch_tpu.models.necks.nas_fpn import NASFPN
from cvpytorch_tpu.models.necks.rfp import RFP
from cvpytorch_tpu.models.necks.tan import TAN


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def _feats(rng, hw=32, chs=(58, 116, 232)):
    ks = jax.random.split(rng, len(chs))
    return tuple(jax.random.normal(k, (2, hw // (2 ** i), hw // (2 ** i), c))
                 for i, (k, c) in enumerate(zip(ks, chs)))


def test_tan_shapes_and_grad(rng):
    feats = _feats(rng, hw=32)
    neck = TAN(out_channels=64, feature_hw=(8, 8), num_heads=4)
    vars_ = neck.init(rng, feats, train=False)
    outs, _ = neck.apply(vars_, feats, train=True,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    assert len(outs) == 3
    for o, f in zip(outs, feats):
        assert o.shape == f.shape[:3] + (64,)
    # mid-level attention actually mixes across levels: zeroing level 2
    # must change level 0's output
    feats0 = (feats[0], feats[1], jnp.zeros_like(feats[2]))
    outs0 = neck.apply(vars_, feats0, train=False)
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs0[0]))


def test_tan_pos_embed_resizes(rng):
    feats = _feats(rng, hw=64)   # mid level 32x32 vs feature_hw 8x8
    neck = TAN(out_channels=32, feature_hw=(8, 8), num_heads=4)
    vars_ = neck.init(rng, feats, train=False)
    outs = neck.apply(vars_, feats, train=False)
    assert outs[1].shape == (2, 32, 32, 32)


def test_nasfpn(rng):
    feats = _feats(rng, hw=64)
    neck = NASFPN(out_channels=48, stack_times=2)
    vars_ = neck.init(rng, feats, train=False)
    outs = neck.apply(vars_, feats, train=False)
    assert len(outs) == 5
    hws = [o.shape[1] for o in outs]
    assert hws == [64, 32, 16, 8, 4]
    assert all(o.shape[-1] == 48 for o in outs)
    # trains: batch stats mutate
    _, mut = neck.apply(vars_, feats, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mut


def test_rfp_recursion_and_identity_at_init(rng):
    img = jax.random.normal(rng, (1, 64, 64, 3))
    # channels/strides must match the recursive backbone (the FPN is
    # shared across passes, reference rfp.py:94-96)
    cs = _feats(rng, hw=8, chs=(128, 256, 512))
    neck = RFP(rfp_steps=2, out_channels=64, aspp_out_channels=16,
               rfp_backbone={"name": "ResNet", "subtype": "resnet18",
                             "out_stages": (2, 3, 4)})
    feats = (img,) + cs
    vars_ = neck.init(rng, feats, train=False)
    outs = neck.apply(vars_, feats, train=False)
    assert len(outs) == 5
    assert all(o.shape[-1] == 64 for o in outs)
    # rfp_weight convs are zero-init → gate is exactly 0.5 everywhere,
    # so output = (new + old)/2 and must be finite
    assert all(bool(jnp.isfinite(o).all()) for o in outs)


def test_nanodet_tan_neck(rng):
    from cvpytorch_tpu.config import CommonConfiguration
    from cvpytorch_tpu.models.nanodet_plus import NanoDetPlus

    cfg = CommonConfiguration({
        "BACKBONE": {"name": "ShuffleNetV2", "subtype": "shufflenetv2_x0.5",
                     "act": "leaky_relu"},
        "NECK": {"name": "TAN", "out_channels": 64, "feature_hw": [4, 4],
                 "num_heads": 4},
    })
    model = NanoDetPlus(dictionary=({"a": 1.0}, {"b": 1.0}),
                        model_cfg=cfg, feat_channels=64,
                        strides=(8, 16, 32))
    imgs = jax.random.normal(rng, (1, 64, 64, 3))
    t = {"boxes": jnp.array([[[4.0, 4.0, 30.0, 30.0]]]),
         "labels": jnp.zeros((1, 1), jnp.int32),
         "valid": jnp.ones((1, 1), bool)}
    vars_ = model.init({"params": rng, "dropout": rng}, imgs, t, mode="train")
    (total, losses), _ = model.apply(
        vars_, imgs, t, mode="train", mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert bool(jnp.isfinite(total))

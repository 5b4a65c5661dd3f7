"""SegFormer / SegNeXt / NMF-Hamburger tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.models.heads.seg_heads_extra import (_default_bases,
                                                        nmf2d)
from cvpytorch_tpu.models.segmentor import EncoderDecoder


def test_nmf2d_reduces_rank_error():
    rng = np.random.RandomState(0)
    # a genuinely low-rank nonnegative matrix should reconstruct well
    u = np.abs(rng.rand(1, 16, 4))
    v = np.abs(rng.rand(1, 4, 64))
    x = jnp.asarray(u @ v)  # (1, D=16, N=64)
    recon = nmf2d(x, _default_bases(1, 16, 8), steps=30)
    rel = float(jnp.linalg.norm(recon - x) / jnp.linalg.norm(x))
    assert rel < 0.3, rel
    assert bool(jnp.isfinite(recon).all())


@pytest.mark.parametrize("cfg", [
    {"BACKBONE": {"name": "MixVisionTransformer", "subtype": "mit_b0"},
     "HEAD": {"name": "SegFormerHead", "channels": 32}},
    {"BACKBONE": {"name": "MSCAN", "subtype": "mscan_t",
                  "out_stages": [2, 3, 4]},
     "HEAD": {"name": "LightHamHead", "channels": 32, "ham_channels": 32,
              "nmf_rank": 8}},
])
def test_transformer_segmentors(rng, cfg):
    model = EncoderDecoder(dictionary=({"a": 1}, {"b": 1}),
                           model_cfg=CommonConfiguration(cfg))
    img = jax.random.normal(rng, (1, 32, 32, 3))
    tgt = jnp.zeros((1, 32, 32), jnp.int32)
    v = model.init({"params": rng, "dropout": rng}, img, tgt, mode="train")
    (loss, _), _ = model.apply(v, img, tgt, mode="train",
                               mutable=["batch_stats"],
                               rngs={"dropout": rng})
    assert np.isfinite(float(loss))
    preds = model.apply(v, img, mode="infer", rngs={"dropout": rng})
    assert preds.shape == (1, 32, 32)


@pytest.mark.parametrize("cfg", [
    {"BACKBONE": {"name": "TopFormerBackbone", "subtype": "topformer_t"},
     "HEAD": {"name": "TopFormerHead", "channels": 32}},
    {"BACKBONE": {"name": "RegSegBackbone", "out_stages": [2, 3, 4]},
     "HEAD": {"name": "RegSegHead", "channels": 32}},
])
def test_light_transformer_segmentors(rng, cfg):
    model = EncoderDecoder(dictionary=({"a": 1}, {"b": 1}),
                           model_cfg=CommonConfiguration(cfg))
    img = jax.random.normal(rng, (1, 32, 32, 3))
    tgt = jnp.zeros((1, 32, 32), jnp.int32)
    v = model.init({"params": rng, "dropout": rng}, img, tgt, mode="train")
    (loss, _), _ = model.apply(v, img, tgt, mode="train",
                               mutable=["batch_stats"],
                               rngs={"dropout": rng})
    assert np.isfinite(float(loss))
    assert model.apply(v, img, mode="infer",
                       rngs={"dropout": rng}).shape == (1, 32, 32)


def test_efficientdet_contract(rng):
    from cvpytorch_tpu.models.efficientdet import EfficientDet

    model = EfficientDet(dictionary=({"a": 1}, {"b": 1}), model_cfg=None)
    imgs = jax.random.normal(rng, (1, 128, 128, 3))
    tgts = {"boxes": jnp.array([[[16.0, 16, 80, 80], [0, 0, 0, 0]]]),
            "labels": jnp.zeros((1, 2), jnp.int32),
            "valid": jnp.array([[True, False]]),
            "pads": jnp.zeros((1, 2)), "scales": jnp.ones((1, 2))}
    v = model.init({"params": rng, "dropout": rng}, imgs, tgts, mode="train")
    (total, _), _ = model.apply(v, imgs, tgts, mode="train",
                                mutable=["batch_stats"],
                                rngs={"dropout": rng})
    assert np.isfinite(float(total))
    _, preds = model.apply(v, imgs, tgts, mode="val", rngs={"dropout": rng})
    assert preds["boxes"].shape == (1, 100, 4)


def test_grid_sample_bilinear_identity():
    from cvpytorch_tpu.models.heads.seg_heads_extra import (
        grid_sample_bilinear)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(1, 6, 8, 3).astype(np.float32))
    ys = jnp.linspace(-1, 1, 6)
    xs = jnp.linspace(-1, 1, 8)
    grid = jnp.stack(jnp.meshgrid(xs, ys), -1)[None]
    out = grid_sample_bilinear(x, grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("cfg", [
    # SFNet (reference conf/seg/sfnet/cityscapes_sfnet_r18.yml)
    {"BACKBONE": {"name": "ResNet", "subtype": "resnet18v1c",
                  "out_stages": [1, 2, 3, 4], "output_stride": 8},
     "HEAD": {"name": "UperNetAlignHead", "channels": 32,
              "bins": [1, 2, 3, 6]}},
    # IncepFormer (reference conf/seg/incepformer/cityscapes_incepformer_t.yml)
    {"BACKBONE": {"name": "IncepTransformer", "subtype": "ipt_t"},
     "HEAD": {"name": "UpConcatHead", "channels": 64}},
])
def test_sfnet_incepformer(rng, cfg):
    model = EncoderDecoder(dictionary=({"a": 1}, {"b": 1}),
                           model_cfg=CommonConfiguration(cfg))
    img = jax.random.normal(rng, (1, 64, 64, 3))
    tgt = jnp.zeros((1, 64, 64), jnp.int32)
    v = model.init({"params": rng, "dropout": rng}, img, tgt, mode="train")
    (loss, _), _ = model.apply(v, img, tgt, mode="train",
                               mutable=["batch_stats"],
                               rngs={"dropout": rng})
    assert np.isfinite(float(loss))
    preds = model.apply(v, img, mode="infer", rngs={"dropout": rng})
    assert preds.shape == (1, 64, 64)

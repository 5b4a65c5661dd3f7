"""SegFormer / SegNeXt / NMF-Hamburger tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpytorch_tpu.config import CommonConfiguration
from cvpytorch_tpu.models.heads.seg_heads_extra import nmf_attention
from cvpytorch_tpu.models.segmentor import EncoderDecoder


def test_nmf_attention_reduces_rank_error():
    rng = np.random.RandomState(0)
    # a genuinely low-rank nonnegative matrix should reconstruct well
    u = np.abs(rng.rand(1, 64, 4))
    v = np.abs(rng.rand(1, 4, 16))
    x = jnp.asarray(u @ v)  # (1, 64, 16)
    recon = nmf_attention(x, rank=8, iters=30)
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

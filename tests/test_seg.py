"""Segmentation slice tests: losses vs golden values, mIoU evaluator math,
head shapes, UNet/EncoderDecoder end-to-end on synthetic data."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cvpytorch_tpu.evaluator.segmentation import SegmentationEvaluator
from cvpytorch_tpu.models.losses.seg_loss import (
    cross_entropy_2d,
    dice_loss,
    focal_loss_2d,
    lovasz_softmax,
    ohem_cross_entropy_2d,
)


def test_ce2d_matches_manual():
    logits = jnp.array([[[[2.0, 0.0], [0.0, 2.0]],
                         [[1.0, 1.0], [0.0, 0.0]]]])  # (1,2,2,2)
    labels = jnp.array([[[0, 1], [255, 0]]])  # one ignored pixel
    got = float(cross_entropy_2d(logits, labels))
    # manual: -log softmax at gt for 3 valid pixels
    import math

    def ce(a, b, gt):
        z = math.log(math.exp(a) + math.exp(b))
        return z - (a if gt == 0 else b)

    want = (ce(2, 0, 0) + ce(0, 2, 1) + ce(0, 0, 0)) / 3
    assert abs(got - want) < 1e-5


def test_ce2d_class_weights():
    logits = jnp.zeros((1, 1, 2, 3))
    labels = jnp.array([[[0, 2]]])
    w = jnp.array([1.0, 1.0, 3.0])
    got = float(cross_entropy_2d(logits, labels, class_weights=w))
    want = float(np.log(3.0))  # uniform logits → CE = log C for every pixel
    assert abs(got - want) < 1e-5  # weighted mean of equal values is equal


def test_ignore_everything_is_finite():
    logits = jnp.zeros((1, 2, 2, 3))
    labels = jnp.full((1, 2, 2), 255)
    assert np.isfinite(float(cross_entropy_2d(logits, labels)))
    assert np.isfinite(float(ohem_cross_entropy_2d(logits, labels)))
    assert np.isfinite(float(focal_loss_2d(logits, labels)))


def test_dice_perfect_prediction_near_zero():
    labels = jnp.array([[[0, 1], [1, 0]]])
    logits = jax.nn.one_hot(labels, 2) * 100.0
    assert float(dice_loss(logits, labels)) < 0.01
    assert float(lovasz_softmax(logits, labels)) < 0.01


def test_ohem_selects_hard_pixels():
    # easy pixel (high prob gt) vs hard pixel: OHEM loss > plain CE
    logits = jnp.array([[[[10.0, 0.0], [0.1, 0.0]]]])  # (1,1,2,2)
    labels = jnp.array([[[0, 0]]])
    plain = float(cross_entropy_2d(logits, labels))
    ohem = float(ohem_cross_entropy_2d(logits, labels, thresh=0.9,
                                       min_kept_ratio=0.5))
    assert ohem > plain


def test_miou_evaluator_golden():
    ev = SegmentationEvaluator(num_classes=3)
    t = np.array([[0, 0, 1, 1, 2, 255]])
    p = np.array([[0, 1, 1, 1, 0, 0]])
    ev.update(t, p)
    m = ev.evaluate()
    # class0: tp=1 gt=2 pred=2 → iou=1/3; class1: tp=2 gt=2 pred=3 → 2/3;
    # class2: tp=0 gt=1 pred=0 → 0
    assert abs(m["mIoU"] - (1 / 3 + 2 / 3 + 0) / 3) < 1e-6
    assert abs(m["PA"] - 3 / 5) < 1e-6


@pytest.mark.parametrize("head_cfg", [
    {"name": "FCNHead"},
    {"name": "Deeplabv3Head"},
    {"name": "Deeplabv3PlusHead"},
    {"name": "PSPHead"},
    {"name": "UPerHead"},
])
def test_seg_head_shapes(rng, head_cfg):
    from cvpytorch_tpu.models.segmentor import _build_head

    head = _build_head(dict(head_cfg), num_classes=7)
    feats = (jnp.zeros((1, 16, 16, 64)), jnp.zeros((1, 8, 8, 128)),
             jnp.zeros((1, 4, 4, 256)))
    vars_ = head.init({"params": rng, "dropout": rng}, feats, train=False)
    out = head.apply(vars_, feats, train=False)
    assert out.shape[0] == 1 and out.shape[-1] == 7


def test_unet_contract(rng):
    from cvpytorch_tpu.models.unet import UNet

    model = UNet(dictionary=({"bg": 1.0}, {"fg": 1.0}), base_channels=8,
                 depth=2)
    img = jnp.zeros((1, 32, 32, 3))
    tgt = jnp.zeros((1, 32, 32), jnp.int32)
    vars_ = model.init({"params": rng, "dropout": rng}, img, tgt, mode="train")
    (loss, ld), _ = model.apply(vars_, img, tgt, mode="train",
                                mutable=["batch_stats"])
    assert np.isfinite(float(loss))
    preds = model.apply(vars_, img, mode="infer")
    assert preds.shape == (1, 32, 32)


def test_encoder_decoder_deeplabv3plus(rng):
    from cvpytorch_tpu.config import CommonConfiguration
    from cvpytorch_tpu.models.segmentor import EncoderDecoder

    cfg = CommonConfiguration({
        "BACKBONE": {"name": "TinyNet", "out_stages": [1, 3]},
        "HEAD": {"name": "Deeplabv3PlusHead", "channels": 32,
                 "dilations": [1, 2, 4]},
        "AUX_HEAD": {"name": "FCNHead", "channels": 16, "in_index": -1},
        "LOSS": {"name": "CrossEntropyLoss2d"},
    })
    model = EncoderDecoder(dictionary=({"a": 1.0}, {"b": 1.0}, {"c": 1.0}),
                           model_cfg=cfg)
    img = jnp.zeros((1, 32, 32, 3))
    tgt = jnp.zeros((1, 32, 32), jnp.int32)
    vars_ = model.init({"params": rng, "dropout": rng}, img, tgt, mode="train")
    (loss, ld), _ = model.apply(
        vars_, img, tgt, mode="train", mutable=["batch_stats"],
        rngs={"dropout": rng})
    assert np.isfinite(float(loss))
    assert "aux_loss" in ld
    ld2, preds = model.apply(vars_, img, tgt, mode="val")
    assert preds.shape == (1, 32, 32)


def test_cityscapes_label_encoding():
    from cvpytorch_tpu.data.datasets.cityscapes import encode_labelid_to_trainid

    mask = np.array([[7, 8, 0], [26, 33, 5]], dtype=np.uint8)
    enc = encode_labelid_to_trainid(mask)
    assert enc.tolist() == [[0, 1, 255], [13, 18, 255]]

import jax
import jax.numpy as jnp
import pytest

from cvpytorch_tpu.models.backbones import build_backbone


@pytest.mark.parametrize(
    "cfg,in_hw,expect_chs,expect_strides",
    [
        ({"name": "MobileNetV2", "out_stages": (3, 5, 7)}, 64, (32, 96, 320), (8, 16, 32)),
        ({"name": "ResNet", "subtype": "resnet18"}, 64, (128, 256, 512), (8, 16, 32)),
        ({"name": "ResNet", "subtype": "resnet50"}, 64, (512, 1024, 2048), (8, 16, 32)),
        ({"name": "ShuffleNetV2", "subtype": "shufflenetv2_x1.0"}, 64, (116, 232, 464), (8, 16, 32)),
        ({"name": "YOLOv5CSPDarknet", "subtype": "cspdark_s"}, 64, (128, 256, 512), (8, 16, 32)),
    ],
)
def test_feature_shapes(rng, cfg, in_hw, expect_chs, expect_strides):
    bb = build_backbone(cfg)
    x = jnp.zeros((1, in_hw, in_hw, 3))
    vars_ = bb.init({"params": rng, "dropout": rng}, x, train=False)
    feats = bb.apply(vars_, x, train=False)
    assert len(feats) == len(expect_chs)
    for f, ch, s in zip(feats, expect_chs, expect_strides):
        assert f.shape == (1, in_hw // s, in_hw // s, ch), (f.shape, ch, s)


def test_resnet_output_stride_8(rng):
    bb = build_backbone({"name": "ResNet", "subtype": "resnet50",
                         "output_stride": 8, "out_stages": (4,)})
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init(rng, x, train=False)
    (f,) = bb.apply(vars_, x, train=False)
    assert f.shape == (1, 8, 8, 2048)  # stride 8, dilated


def test_classifier_mode(rng):
    bb = build_backbone({"name": "MobileNetV2", "classifier": True,
                         "num_classes": 10})
    x = jnp.zeros((2, 64, 64, 3))
    vars_ = bb.init({"params": rng, "dropout": rng}, x, train=False)
    logits = bb.apply(vars_, x, train=False)
    assert logits.shape == (2, 10)


def test_cspdarknet_width_depth(rng):
    # 's' = width 0.5: stages (128, 256, 512); 'n' = 0.25: (64, 128, 256)
    bb = build_backbone({"name": "YOLOv5CSPDarknet", "subtype": "cspdark_n"})
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init(rng, x, train=False)
    feats = bb.apply(vars_, x, train=False)
    assert tuple(f.shape[-1] for f in feats) == (64, 128, 256)

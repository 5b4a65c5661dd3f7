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


@pytest.mark.parametrize("cfg,ch_out", [
    ({"name": "EfficientNet", "subtype": "efficientnet_b0"}, (40, 112, 320)),
    # default out_stages [3,4,5] index the reference wrapper's stage
    # table (mobilenet_v3.py:49,69): large → 40/80/112, small → 40/48/96
    ({"name": "MobileNetV3", "subtype": "mobilenet_v3_large"}, (40, 80, 112)),
    ({"name": "MobileNetV3", "subtype": "mobilenet_v3_small"}, (40, 48, 96)),
    ({"name": "ConvNeXt", "subtype": "convnext_tiny"}, (192, 384, 768)),
    # stage4 is 512 regardless of width_multiplier[3] — upstream
    # last_channel quirk (reference repvgg.py:167,184), oracle-verified
    ({"name": "RepVGG", "subtype": "RepVGG-A0"}, (96, 192, 512)),
    ({"name": "SqueezeNet"}, (128, 256, 512)),
    # post-TRANSITION stage features (reference wrapper slicing, fixed in
    # r3 and oracle-verified): transitions halve 512→256, 1024→512; the
    # last block has no transition/norm5 → 1024
    ({"name": "DenseNet", "subtype": "densenet121"}, (256, 512, 1024)),
])
def test_extra_backbone_features(rng, cfg, ch_out):
    bb = build_backbone(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init({"params": rng, "dropout": rng}, x, train=False)
    feats = bb.apply(vars_, x, train=False)
    assert tuple(f.shape[-1] for f in feats) == ch_out, \
        tuple(f.shape for f in feats)


def test_vit_classifier(rng):
    bb = build_backbone({"name": "ViT", "subtype": "vit_t_16",
                         "classifier": True, "num_classes": 10})
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init({"params": rng, "dropout": rng}, x, train=False)
    assert bb.apply(vars_, x, train=False).shape == (1, 10)


def test_repvgg_deploy_fuse(rng):
    """Train-mode 3-branch block == fused single-conv deploy block."""
    import numpy as np
    from cvpytorch_tpu.models.backbones.repvgg import (
        RepVGGBlock, fuse_repvgg_kernel)

    blk = RepVGGBlock(out_channels=8, stride=1)
    x = jax.random.normal(rng, (1, 8, 8, 8))
    v = blk.init(rng, x, train=False)
    y_train = blk.apply(v, x, train=False)
    k, b = fuse_repvgg_kernel(
        jax.tree_util.tree_map(np.asarray, v["params"]),
        jax.tree_util.tree_map(np.asarray, v["batch_stats"]),
        in_ch=8, out_ch=8, has_identity=True)
    deploy = RepVGGBlock(out_channels=8, stride=1, deploy=True)
    vd = deploy.init(rng, x, train=False)
    vd = {"params": {"reparam": {"kernel": jnp.asarray(k),
                                 "bias": jnp.asarray(b)}}}
    y_deploy = deploy.apply(vd, x, train=False)
    assert np.abs(np.asarray(y_train) - np.asarray(y_deploy)).max() < 1e-4


@pytest.mark.parametrize(
    "cfg,in_hw,expect_chs,expect_strides",
    [
        ({"name": "RegNet", "subtype": "regnet_y_400mf"}, 64,
         (104, 208, 440), (8, 16, 32)),
        ({"name": "RegNet", "subtype": "regnet_x_400mf"}, 64,
         (64, 160, 400), (8, 16, 32)),
        ({"name": "EfficientNetLite", "subtype": "efficientnet_lite0",
          "out_stages": (2, 4, 6)}, 64, (40, 112, 320), (8, 16, 32)),
        ({"name": "CustomCspNet", "out_stages": (3, 4, 5)}, 64,
         (128, 256, 512), (8, 16, 32)),
    ],
)
def test_new_backbone_shapes(rng, cfg, in_hw, expect_chs, expect_strides):
    bb = build_backbone(cfg)
    x = jnp.zeros((1, in_hw, in_hw, 3))
    vars_ = bb.init({"params": rng, "dropout": rng}, x, train=False)
    feats = bb.apply(vars_, x, train=False)
    assert len(feats) == len(expect_chs)
    for f, ch, s in zip(feats, expect_chs, expect_strides):
        assert f.shape == (1, in_hw // s, in_hw // s, ch), (f.shape, ch, s)


def test_resnet_v1c_deep_stem(rng):
    bb = build_backbone({"name": "ResNet", "subtype": "resnet18v1c",
                         "out_stages": (1, 2, 3, 4)})
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = bb.init(rng, x, train=False)
    feats = bb.apply(vars_, x, train=False)
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512]
    assert "stem_conv0" in vars_["params"] and "stem_conv2" in vars_["params"]

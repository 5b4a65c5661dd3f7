"""Module-level fidelity: port randomly-initialized reference torch model
weights into our Flax models and assert matching forward outputs
(VERDICT r1 #2)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.oracle import setup_reference, to_torch  # noqa: E402

setup_reference()

from cvpytorch_tpu.utils.porting import (  # noqa: E402
    UNET_RULES, port_state_dict, verify_tree_shapes,
)


def _randomize_bn(module):
    """Give BN affine + running stats non-trivial values so porting them
    actually matters."""
    g = torch.Generator().manual_seed(7)
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.2)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)


def test_resnet50_backbone_matches_reference():
    from src.models.backbones.resnet import ResNet as RefResNet

    from cvpytorch_tpu.models.backbones.resnet import ResNet
    from cvpytorch_tpu.utils.porting import RESNET_WRAPPER_RULES

    torch.manual_seed(0)
    ref = RefResNet(subtype="resnet50", out_stages=[2, 3, 4],
                    pretrained=False)
    _randomize_bn(ref)
    # reference bug: ResNet.train() reads self.frozen_stages which its
    # __init__ never sets (resnet.py:120 vs train() override)
    ref.frozen_stages = -1
    ref.eval()

    x = np.random.RandomState(1).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        h = ref.maxpool(ref.stem(to_torch(x)))
        ref_feats = []
        for li in (1, 2, 3, 4):
            h = getattr(ref, f"layer{li}")(h)
            if li in (2, 3, 4):
                ref_feats.append(h.numpy())

    sd = {k: v for k, v in ref.state_dict().items()
          if not k.startswith(("avgpool", "fc"))}
    ported = port_state_dict(sd, RESNET_WRAPPER_RULES, strict=True)

    model = ResNet(subtype="resnet50", out_stages=(2, 3, 4))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    feats = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        xs, train=False)
    for got, want in zip(feats, ref_feats):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=3e-4)


def test_mobilenetv2_backbone_matches_reference():
    from src.models.backbones.mobilenet_v2 import MobileNetV2 as RefMBV2

    from cvpytorch_tpu.models.backbones.mobilenetv2 import MobileNetV2
    from cvpytorch_tpu.utils.porting import MBV2_WRAPPER_RULES

    torch.manual_seed(0)
    ref = RefMBV2(out_stages=[3, 5, 7], pretrained=False)
    _randomize_bn(ref)
    ref.eval()

    x = np.random.RandomState(2).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        h = ref.stem(to_torch(x))
        ref_feats = []
        for si in range(1, 8):
            h = getattr(ref, f"stage{si}")(h)
            if si in (3, 5, 7):
                ref_feats.append(h.numpy())

    ported = port_state_dict(ref.state_dict(), MBV2_WRAPPER_RULES,
                             strict=True)
    model = MobileNetV2(out_stages=(3, 5, 7))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    feats = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        xs, train=False)
    for got, want in zip(feats, ref_feats):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=3e-4)


def test_unet_forward_matches_reference():
    from src.models.unet import UNet as RefUNet

    from cvpytorch_tpu.models.unet import UNet

    dictionary = [{"a": 1.0}, {"b": 1.0}, {"c": 1.0}]
    torch.manual_seed(0)
    ref = RefUNet(dictionary=dictionary)
    _randomize_bn(ref)
    ref.eval()

    x = np.random.RandomState(0).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        x1 = ref.conv(to_torch(x))
        x2 = ref.down1(x1)
        x3 = ref.down2(x2)
        x4 = ref.down3(x3)
        x5 = ref.down4(x4)
        xx = ref.up1(x5, x4)
        xx = ref.up2(xx, x3)
        xx = ref.up3(xx, x2)
        xx = ref.up4(xx, x1)
        ref_out = ref.outconv(xx).numpy()

    ported = port_state_dict(ref.state_dict(), UNET_RULES, strict=True)

    model = UNet(dictionary=tuple(dictionary))
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(x.transpose(0, 2, 3, 1)),
                           mode="infer")
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs

    logits = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), method=model.forward_logits,
        train=False)
    got = np.asarray(logits).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, ref_out, atol=2e-4)


def test_yolov5s_full_forward_matches_reference():
    """Full-model parity on the flagship: reference backbone→neck→detect
    chained (its top-level YOLOv5 wrapper is unbuildable upstream — it
    injects depth_mul kwargs no registered backbone accepts), weights
    ported into our flax YOLOv5, raw detect maps compared
    (reference yolov5.py:156, yolov5_csp_darknet.py:17,
    yolov5_neck.py:12, yolov5_detect.py:12)."""
    from src.models.backbones.det.yolov5_csp_darknet import (
        YOLOv5CSPDarknet as RefBB,
    )
    from src.models.detects.yolov5_detect import YOLOv5Detect as RefDet
    from src.models.necks.yolov5_neck import YOLOv5Neck as RefNeck
    from src.models.yolov5 import YOLOv5 as RefYOLOv5

    from cvpytorch_tpu.config import CommonConfiguration
    from cvpytorch_tpu.models.yolov5 import YOLOv5
    from cvpytorch_tpu.utils.porting import YOLOV5_RULES

    torch.manual_seed(0)
    nc = 4
    bb = RefBB(subtype="cspdark_s", out_stages=[2, 3, 4], pretrained=False)
    neck = RefNeck(in_channels=[256, 512, 1024],
                   out_channels=[256, 512, 1024],
                   depth_mul=0.33, width_mul=0.5)
    det = RefDet(num_classes=nc, in_channels=[256, 512, 1024],
                 anchors=RefYOLOv5.anchors, width_mul=0.5)
    for m in (bb, neck, det):
        _randomize_bn(m)
        m.eval()

    x = np.random.RandomState(3).rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        feats = neck(list(bb(to_torch(x))))
        # raw per-level maps, torch layout → (B, ny, nx, A, 5+C)
        ref_raw = []
        for i, f in enumerate(feats):
            y = det.m[i](f)
            b, _, ny, nx = y.shape
            ref_raw.append(
                y.view(b, 3, 5 + nc, ny, nx)
                .permute(0, 3, 4, 1, 2).numpy())

    sd = {}
    for mod, pre in ((bb, "backbone"), (neck, "neck"), (det, "detect")):
        for k, v in mod.state_dict().items():
            sd[f"{pre}.{k}"] = v
    ported = port_state_dict(sd, YOLOV5_RULES, strict=True)

    model = YOLOv5(
        dictionary=tuple({f"c{i}": 1.0} for i in range(nc)),
        model_cfg=CommonConfiguration(
            {"TYPE": "yolov5_s", "LOSS": {"name": "YOLOv5Loss"}}))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        xs, mode="infer")
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    raw = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        xs, False, method="_raw")
    assert len(raw) == 3
    for got, want in zip(raw, ref_raw):
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)

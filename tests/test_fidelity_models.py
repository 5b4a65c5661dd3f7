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
    from cvpytorch_tpu.utils.porting import (YOLOV5_RULES,
                                             stem6_to_s2d_kernel)

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
    # the repo stem is space-to-depth + 3×3 (exact 6×6/s2 equivalent,
    # csp_darknet.py stem) — rearrange the reference kernel accordingly
    ported = port_state_dict(
        sd, YOLOV5_RULES, strict=True,
        transforms={r"backbone/stem/conv/kernel": stem6_to_s2d_kernel})

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


def test_deeplabv3plus_head_matches_reference():
    """Separable-ASPP + low-level fusion head parity
    (reference heads/seg/deeplabv3plus_head.py:33-69)."""
    from src.models.heads.seg.deeplabv3plus_head import (
        Deeplabv3PlusHead as RefHead,
    )

    from cvpytorch_tpu.models.heads.seg_heads import Deeplabv3PlusHead
    from cvpytorch_tpu.utils.porting import DEEPLABV3PLUS_RULES

    torch.manual_seed(0)
    ref = RefHead(num_classes=5, in_channels=64, channels=32,
                  dilations=(1, 12, 24, 36), low_in_channels=16,
                  low_channels=8)
    _randomize_bn(ref)
    ref.eval()

    rs = np.random.RandomState(4)
    low = rs.rand(2, 16, 16, 16).astype(np.float32)
    high = rs.rand(2, 64, 4, 4).astype(np.float32)
    with torch.no_grad():
        want = ref([to_torch(low), to_torch(high)]).numpy()

    ported = port_state_dict(ref.state_dict(), DEEPLABV3PLUS_RULES,
                             strict=True)
    head = Deeplabv3PlusHead(num_classes=5, channels=32, low_channels=8,
                             dilations=(1, 12, 24, 36))
    feats = (jnp.asarray(low.transpose(0, 2, 3, 1)),
             jnp.asarray(high.transpose(0, 2, 3, 1)))
    variables = head.init({"params": jax.random.PRNGKey(0)}, feats)
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    got = head.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        feats, False)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4)


def test_nanodetplus_head_matches_reference():
    """GFL head parity: DepthwiseConvModule stacks + per-level gfl_cls
    (reference heads/nanodetplus_head.py:54-183)."""
    from src.models.heads.nanodetplus_head import NanoDetPlusHead as RefHead
    from src.utils.config import CommonConfiguration as RefCfg

    from cvpytorch_tpu.models.heads.nanodet_head import NanoDetPlusHead
    from cvpytorch_tpu.utils.porting import NANODETPLUS_HEAD_RULES

    torch.manual_seed(0)
    nc, ch, strides = 5, 32, [8, 16, 32]
    loss_cfg = RefCfg.from_dict({
        "loss_qfl": {"name": "QualityFocalLoss", "beta": 2.0,
                     "loss_weight": 1.0},
        "loss_dfl": {"name": "DistributionFocalLoss", "loss_weight": 0.25},
        "loss_bbox": {"name": "GIoULoss", "loss_weight": 2.0},
    })
    ref = RefHead(num_classes=nc, loss=loss_cfg, input_channel=ch,
                  feat_channels=ch, stacked_convs=2, kernel_size=5,
                  strides=strides, reg_max=7, activation="LeakyReLU")
    _randomize_bn(ref)
    ref.eval()

    rs = np.random.RandomState(5)
    feats_t = [rs.rand(2, ch, 64 // s, 64 // s).astype(np.float32)
               for s in strides]
    with torch.no_grad():
        want = ref([to_torch(f) for f in feats_t]).numpy()  # (B, P, no)

    sd = {k: v for k, v in ref.state_dict().items()
          if not k.startswith(("loss_", "assigner"))}
    ported = port_state_dict(sd, NANODETPLUS_HEAD_RULES, strict=True)

    head = NanoDetPlusHead(num_classes=nc, feat_channels=ch,
                           stacked_convs=2, kernel_size=5,
                           strides=tuple(strides), reg_max=7,
                           act="leaky_relu")
    feats = tuple(jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_t)
    variables = head.init({"params": jax.random.PRNGKey(0)}, feats)
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    got = head.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        feats, False)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)


def _no_cuda(monkeypatch):
    """Reference SegNet/ENet hardcode .cuda() on their loss modules;
    run them on CPU by making cuda() a no-op."""
    monkeypatch.setattr(torch.nn.Module, "cuda",
                        lambda self, *a, **k: self, raising=False)
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)


def test_segnet_forward_matches_reference(monkeypatch):
    """Max-unpool encoder/decoder parity (reference segnet.py:71-160);
    exercises ops/pool index round-tripping through 5 stages."""
    _no_cuda(monkeypatch)
    from src.models.segnet import SegNet as RefSegNet

    from cvpytorch_tpu.models.segnet_enet import SegNet
    from cvpytorch_tpu.utils.porting import SEGNET_RULES

    dictionary = [{"a": 1.0}, {"b": 1.0}, {"c": 1.0}]
    torch.manual_seed(0)
    ref = RefSegNet(dictionary=dictionary)
    _randomize_bn(ref)
    ref.eval()

    x = np.random.RandomState(6).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(to_torch(x), mode="infer").numpy()

    sd = {k: v for k, v in ref.state_dict().items()
          if "criterion" not in k}
    ported = port_state_dict(sd, SEGNET_RULES, strict=True)
    model = SegNet(dictionary=dictionary)
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        xs, mode="infer")
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    # compare raw logits: run infer path up to argmax via val-mode preds
    logits_fn = lambda v: model.apply(v, xs, mode="infer")
    got_arg = np.asarray(logits_fn(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]}))
    np.testing.assert_array_equal(got_arg, want.argmax(1)[0][None])


def test_enet_forward_matches_reference(monkeypatch):
    """Full 5-stage ENet parity: PReLUs, asymmetric/dilated bottlenecks,
    channel-padded Down residuals, transpose-conv ups + max-unpool
    (reference enet.py:152-254)."""
    _no_cuda(monkeypatch)
    from src.models.enet import ENet as RefENet

    from cvpytorch_tpu.models.segnet_enet import ENet
    from cvpytorch_tpu.utils.porting import ENET_RULES, ENET_TRANSPOSED

    dictionary = [{"a": 1.0}, {"b": 1.0}, {"c": 1.0}]
    torch.manual_seed(0)
    ref = RefENet(dictionary=dictionary)
    _randomize_bn(ref)
    # make PReLU slopes non-trivial so porting them matters
    g = torch.Generator().manual_seed(11)
    for m in ref.modules():
        if isinstance(m, torch.nn.PReLU):
            with torch.no_grad():
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) * 0.5)
    ref.eval()

    x = np.random.RandomState(7).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(to_torch(x), mode="infer")
    # reference infer mode returns None (enet.py:240 'pass'); recompute
    with torch.no_grad():
        h = ref.initialBlock(to_torch(x))
        h, i1 = ref.stage1_1(h)
        h = ref.stage1_2(h)
        h, i2 = ref.stage2_1(h)
        h = ref.stage2_2(h)
        h = ref.stage3(h)
        h = ref.stage4_1(h, i2)
        h = ref.stage4_2(h)
        h = ref.stage5_1(h, i1)
        h = ref.stage5_2(h)
        want = ref.final_conv(h).numpy()

    sd = {k: v for k, v in ref.state_dict().items()
          if "criterion" not in k}
    ported = port_state_dict(sd, ENET_RULES, strict=True,
                             transposed_patterns=ENET_TRANSPOSED)
    model = ENet(dictionary=dictionary)
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        xs, mode="infer")
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    got = np.asarray(model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        xs, mode="infer"))
    np.testing.assert_array_equal(got, want.argmax(1))


def test_ssd_prior_boxes_match_reference():
    """SSD PriorBox parity (reference anchors/prior_box.py:7-55) — same
    count, ordering and values as the torch per-cell loop."""
    from src.models.anchors.prior_box import PriorBox as RefPriorBox

    from cvpytorch_tpu.models.anchors import PriorBox

    want = RefPriorBox()().numpy()
    got = PriorBox()()
    assert got.shape == want.shape == (8732, 4)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_yolox_full_forward_matches_reference():
    """YOLOX parity: reference backbone→neck→head chained (same
    unbuildable-wrapper situation as YOLOv5), ported into our flax YOLOX,
    raw (B,P,4+1+C) head maps compared (reference yolox_csp_darknet.py:17,
    yolox_neck.py:13, yolox_head.py:14).  Also proves our serial SPPF(5)
    ≡ the reference's parallel (5,9,13) SPP."""
    from src.models.backbones.det.yolox_csp_darknet import (
        YOLOXCSPDarknet as RefBB,
    )
    from src.models.heads.yolox_head import YOLOXHead as RefHead
    from src.models.necks.yolox_neck import YOLOXNeck as RefNeck

    from cvpytorch_tpu.config import CommonConfiguration
    from cvpytorch_tpu.models.yolox import YOLOX
    from cvpytorch_tpu.utils.porting import YOLOX_RULES

    torch.manual_seed(0)
    nc = 4
    bb = RefBB(subtype="cspdark_s", out_stages=[2, 3, 4], pretrained=False)
    neck = RefNeck(subtype="yolox_s", channels=[256, 512, 1024],
                   depth_mul=0.33, width_mul=0.5)
    head = RefHead(num_classes=nc, in_channels=[256, 512, 1024],
                   depth_mul=0.33, width_mul=0.5)
    for m in (bb, neck, head):
        _randomize_bn(m)
        m.eval()
    # reference bug: stems are 1×1 convs with padding=1 (yolox_head.py:35),
    # growing every level by a junk border ring; our head uses the correct
    # padding=0 — neutralize the oracle's padding for the comparison
    for stem in head.stems:
        stem.conv.padding = (0, 0)

    x = np.random.RandomState(8).rand(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        outs = head(neck(list(bb(to_torch(x)))))
        # flatten like our head: (B, h*w, 4+1+C) per level, concat
        want = np.concatenate(
            [o.permute(0, 2, 3, 1).reshape(o.shape[0], -1,
                                           o.shape[1]).numpy()
             for o in outs], axis=1)

    sd = {}
    for mod, pre in ((bb, "backbone"), (neck, "neck"), (head, "head")):
        for k, v in mod.state_dict().items():
            sd[f"{pre}.{k}"] = v
    ported = port_state_dict(sd, YOLOX_RULES, strict=True)

    model = YOLOX(dictionary=tuple({f"c{i}": 1.0} for i in range(nc)),
                  model_cfg=CommonConfiguration({"TYPE": "yolox_s"}))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        xs, mode="infer")
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    raw, _ = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        xs, False, method="_forward")
    np.testing.assert_allclose(np.asarray(raw), want, atol=5e-4)


def test_yolov6_backbone_neck_matches_reference():
    """YOLOv6-3.0 parity: EfficientRep (RepVGG stages + SimCSPSPPF) into
    RepBiPAN (BiC deconv fusion), ported weights reproduce the neck's
    three pyramid outputs (reference yolov6_efficient_rep.py:17,
    yolov6_repbipan.py:17, yolo_modules.py:218,245)."""
    from src.models.backbones.det.yolov6_efficient_rep import (
        YOLOv6EfficientRep as RefBB,
    )
    from src.models.necks.det.yolov6_repbipan import (
        YOLOv6RepBiPAN as RefNeck,
    )

    from cvpytorch_tpu.models.yolov6 import EfficientRep, RepBiPAN
    from cvpytorch_tpu.utils.porting import (
        YOLOV6_RULES,
        YOLOV6_TRANSPOSED,
    )

    torch.manual_seed(0)
    bb = RefBB(subtype="yolov6_s", out_stages=[1, 2, 3, 4],
               pretrained=False)
    neck = RefNeck(subtype="yolov6_s", in_channels=[128, 256, 512, 1024],
                   mid_channels=[128, 128, 256],
                   out_channels=[128, 256, 512],
                   num_blocks=[12, 12, 12, 12])
    for m in (bb, neck):
        _randomize_bn(m)
        m.eval()

    x = np.random.RandomState(10).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = neck(list(bb(to_torch(x))))

    sd = {}
    for mod, pre in ((bb, "backbone"), (neck, "neck")):
        for k, v in mod.state_dict().items():
            sd[f"{pre}.{k}"] = v
    ported = port_state_dict(sd, YOLOV6_RULES, strict=True,
                             transposed_patterns=YOLOV6_TRANSPOSED)

    mbb = EfficientRep(depth_mul=0.33, width_mul=0.5,
                       out_stages=(1, 2, 3, 4))
    mneck = RepBiPAN(width_mul=0.5, depth_mul=0.33)
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))

    import flax.linen as nn

    class BN(nn.Module):
        @nn.compact
        def __call__(self, x):
            f = mbb.copy(name="backbone")(x, False)
            return mneck.copy(name="neck")(f, False)

    model = BN()
    variables = model.init({"params": jax.random.PRNGKey(0)}, xs)
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    got = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        xs)
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(), atol=1e-3)


def test_ghostpan_matches_reference():
    """GhostPAN parity: ghost bottlenecks incl. their dw+pw shortcut
    branches, align-corners bilinear upsampling and the summed extra
    level (reference necks/ghost_pan.py:14-222)."""
    from src.models.necks.ghost_pan import GhostPAN as RefNeck

    from cvpytorch_tpu.models.necks.ghost_pan import GhostPAN
    from cvpytorch_tpu.utils.porting import GHOSTPAN_RULES

    torch.manual_seed(0)
    ref = RefNeck(in_channels=[116, 232, 464], out_channels=96,
                  kernel_size=5, num_extra_levels=1, use_depthwise=True,
                  activation="LeakyReLU")
    _randomize_bn(ref)
    ref.eval()

    rs = np.random.RandomState(11)
    feats_t = [rs.rand(2, c, s, s).astype(np.float32)
               for c, s in ((116, 16), (232, 8), (464, 4))]
    with torch.no_grad():
        want = ref([to_torch(f) for f in feats_t])

    sd = {k: v for k, v in ref.state_dict().items()}
    ported = port_state_dict(sd, GHOSTPAN_RULES, strict=True)

    neck = GhostPAN(in_channels=(116, 232, 464), out_channels=96,
                    kernel_size=5, num_extra_levels=1)
    feats = tuple(jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_t)
    variables = neck.init({"params": jax.random.PRNGKey(0)}, feats)
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    got = neck.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        feats, False)
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(), atol=5e-4)


def test_yolov6_effidehead_matches_reference():
    """Decoupled v6 head parity (reference yolov6_effidehead.py:17-147,
    's' config: reg_max=0, no DFL)."""
    from src.models.heads.det.yolov6_effidehead import YOLOv6Effidehead

    from cvpytorch_tpu.models.yolov6 import Effidehead
    from cvpytorch_tpu.utils.porting import YOLOV6_HEAD_RULES

    torch.manual_seed(0)
    nc = 4
    # the head width-scales in_channels by the subtype cfg (0.5 for 's')
    ref = YOLOv6Effidehead(subtype="yolov6_s", num_classes=nc,
                           in_channels=[128, 256, 512], use_dfl=False)
    _randomize_bn(ref)
    ref.eval()
    ref.train()   # train-mode forward returns raw per-level lists
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eval()  # keep running stats (we compare eval BN math)

    rs = np.random.RandomState(12)
    feats_t = [rs.rand(2, c, s, s).astype(np.float32)
               for c, s in ((64, 8), (128, 4), (256, 2))]
    with torch.no_grad():
        _, cls_scores, reg_distri = ref([to_torch(f) for f in feats_t])

    sd = {k: v for k, v in ref.state_dict().items()}
    ported = port_state_dict(sd, YOLOV6_HEAD_RULES, strict=True)

    head = Effidehead(num_classes=nc)
    feats = tuple(jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_t)
    variables = head.init({"params": jax.random.PRNGKey(0)}, feats)
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    got = head.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        feats, False)                      # (B, P, 4 + C): [reg, cls]
    np.testing.assert_allclose(
        np.asarray(got[..., :4]), reg_distri.numpy(), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(got[..., 4:])), cls_scores.numpy(),
        atol=5e-4)


def test_shufflenetv2_backbone_matches_reference():
    """NanoDet's backbone parity (reference backbones/shufflenet_v2.py:20
    slicing torchvision shufflenet_v2_x1_0 — provided by
    tests/oracle_models as a faithful pure-torch reimplementation)."""
    from src.models.backbones.shufflenet_v2 import ShuffleNetV2 as RefSNV2

    from cvpytorch_tpu.models.backbones.shufflenetv2 import ShuffleNetV2
    from cvpytorch_tpu.utils.porting import SHUFFLENETV2_RULES

    torch.manual_seed(0)
    ref = RefSNV2(subtype="shufflenetv2_x1.0", out_stages=[2, 3, 4],
                  pretrained=False)
    _randomize_bn(ref)
    ref.eval()

    x = np.random.RandomState(13).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(to_torch(x))

    sd = {k: v for k, v in ref.state_dict().items()
          if not k.startswith(("conv5", "fc"))}
    ported = port_state_dict(sd, SHUFFLENETV2_RULES, strict=True)

    model = ShuffleNetV2(subtype="shufflenetv2_x1.0", out_stages=(2, 3, 4))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    feats = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        xs, False)
    for g, w in zip(feats, want):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(), atol=3e-4)


def test_fcos_head_matches_reference():
    """FCOS shared head parity: 4×(conv+GN) towers, centerness on the
    reg branch, per-level exp(scale·reg)
    (reference heads/fcos_head.py:22-90)."""
    from src.models.heads.fcos_head import FCOSHead as RefHead

    from cvpytorch_tpu.models.heads.fcos_head import FCOSHead
    from cvpytorch_tpu.utils.porting import FCOS_HEAD_RULES

    torch.manual_seed(0)
    nc, ch = 4, 64
    ref = RefHead(num_classes=nc, in_channel=ch)
    ref.eval()

    rs = np.random.RandomState(14)
    feats_t = [rs.rand(1, ch, s, s).astype(np.float32)
               for s in (16, 8, 4, 2, 1)]
    with torch.no_grad():
        cls_w, cnt_w, reg_w = ref([to_torch(f) for f in feats_t])

    ported = port_state_dict(dict(ref.state_dict()), FCOS_HEAD_RULES,
                             strict=True)
    head = FCOSHead(num_classes=nc, channels=ch)
    feats = tuple(jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_t)
    variables = head.init({"params": jax.random.PRNGKey(0)}, feats)
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    outs = head.apply({"params": ported["params"]}, feats, False)
    for (cg, ng, rg), cw, nw, rw in zip(outs, cls_w, cnt_w, reg_w):
        np.testing.assert_allclose(
            np.asarray(cg).transpose(0, 3, 1, 2), cw.numpy(), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(ng).transpose(0, 3, 1, 2), nw.numpy(), atol=5e-4)
        np.testing.assert_allclose(
            np.asarray(rg).transpose(0, 3, 1, 2), rw.numpy(),
            rtol=1e-4, atol=5e-4)

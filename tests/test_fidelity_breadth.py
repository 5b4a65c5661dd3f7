"""Round-3 fidelity: torch-oracle parity for the round-2 breadth tier
(VERDICT r2 missing #3) — TAN / RFP / GiraffeNeck / GFocalHeadV2 / LFD /
EfficientDet.  Reference NAS_FPN is an empty stub
(/root/reference/src/models/necks/nas_fpn.py:13-17 — ctor pass, forward
pass), like PAA/GridAssigner: parity is by documentation; our real NASFPN
implementation is beyond-reference surface covered by shape tests."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.oracle import setup_reference, to_torch  # noqa: E402

setup_reference()

from cvpytorch_tpu.utils.porting import (  # noqa: E402
    port_state_dict, verify_tree_shapes)


def _randomize_bn(module):
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


def _conv_bn(sd, prefix, bn="bn"):
    """torch ConvModule state_dict slice → flax ConvBNAct subtrees."""
    params = {"conv": {"kernel": sd[f"{prefix}.conv.weight"].numpy()
                       .transpose(2, 3, 1, 0)}}
    if f"{prefix}.conv.bias" in sd:
        params["conv"]["bias"] = sd[f"{prefix}.conv.bias"].numpy()
    stats = {}
    if f"{prefix}.{bn}.weight" in sd:
        params["bn"] = {"scale": sd[f"{prefix}.{bn}.weight"].numpy(),
                        "bias": sd[f"{prefix}.{bn}.bias"].numpy()}
        stats["bn"] = {"mean": sd[f"{prefix}.{bn}.running_mean"].numpy(),
                       "var": sd[f"{prefix}.{bn}.running_var"].numpy()}
    return params, stats


def _port_mha(sd, prefix, num_heads):
    """torch nn.MultiheadAttention → flax MultiHeadDotProductAttention."""
    w = sd[f"{prefix}.in_proj_weight"].numpy()       # (3C, C)
    b = sd[f"{prefix}.in_proj_bias"].numpy()
    C = w.shape[1]
    hd = C // num_heads
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        out[name] = {
            "kernel": w[i * C:(i + 1) * C].T.reshape(C, num_heads, hd),
            "bias": b[i * C:(i + 1) * C].reshape(num_heads, hd),
        }
    ow = sd[f"{prefix}.out_proj.weight"].numpy()     # (C, C)
    out["out"] = {"kernel": ow.T.reshape(num_heads, hd, C),
                  "bias": sd[f"{prefix}.out_proj.bias"].numpy()}
    return out


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"].numpy(),
            "bias": sd[f"{prefix}.bias"].numpy()}


def _dense(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].numpy().T,
            "bias": sd[f"{prefix}.bias"].numpy()}


def test_tan_matches_reference():
    """TAN neck vs /root/reference/src/models/necks/tan.py:14-87 (lateral
    ConvBNLeaky + transformer over the mid level + residual adds)."""
    from src.models.necks.tan import TAN as RefTAN

    from cvpytorch_tpu.models.necks.tan import TAN

    torch.manual_seed(0)
    ref = RefTAN(in_channels=[116, 232, 464], out_channels=128,
                 feature_hw=[20, 20], num_heads=8, num_encoders=1,
                 mlp_ratio=4, dropout_ratio=0.1)
    _randomize_bn(ref)
    ref.eval()

    rng = np.random.RandomState(1)
    feats_t = [torch.from_numpy(
        rng.rand(2, c, s, s).astype(np.float32))
        for c, s in zip((116, 232, 464), (40, 20, 10))]
    with torch.no_grad():
        ref_outs = [o.numpy() for o in ref(feats_t)]

    sd = ref.state_dict()
    params, stats = {}, {}
    for i in range(3):
        p, s = _conv_bn(sd, f"lateral_convs.{i}")
        params[f"lateral{i}"] = p
        stats[f"lateral{i}"] = s
    p, s = _conv_bn(sd, "transformer.conv")
    params["tf_proj"] = p
    stats["tf_proj"] = s
    enc = {
        "norm1": _ln(sd, "transformer.encoders.0.norm1"),
        "norm2": _ln(sd, "transformer.encoders.0.norm2"),
        "attn": _port_mha(sd, "transformer.encoders.0.attn", 8),
        "fc1": _dense(sd, "transformer.encoders.0.mlp.fc1"),
        "fc2": _dense(sd, "transformer.encoders.0.mlp.fc2"),
    }
    params["encoder0"] = enc
    # pos_embed (N, 1, C) → (1, fh, fw, C)
    params["pos_embed"] = sd["pos_embed"].numpy().transpose(1, 0, 2) \
        .reshape(1, 20, 20, 128)

    model = TAN(out_channels=128, feature_hw=(20, 20))
    feats = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    variables = model.init(jax.random.PRNGKey(0), feats)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    outs = model.apply({"params": params, "batch_stats": stats}, feats,
                       train=False)
    for got, want in zip(outs, ref_outs):
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-4)


def _allclose_rel(got, want, rtol=3e-5, atol=5e-4):
    """Deep randomized-BN chains inflate activations to 1e4+, and f32
    noise scales with the LAYER's magnitude (matmul accumulation), not
    the individual element's — so bound the max error by
    atol + rtol·max|want| instead of elementwise rtol."""
    bound = atol + rtol * float(np.abs(want).max())
    err = float(np.abs(np.asarray(got) - want).max())
    assert err <= bound, f"max err {err} > {bound}"


def test_rfp_aspp_matches_reference():
    """DetectoRS ASPP vs /root/reference/src/models/necks/rfp.py:22-66.

    The reference's full RFP is unbuildable upstream THREE ways: rfp.py
    imports the nonexistent ``src.models.modules.init_weights_org``
    (rfp.py:12 — shimmed below just to import the file), it is not
    imported or registered in necks/__init__.py:9-55, and its forward
    calls ``backbone.rfp_forward`` (rfp.py:94) which no reference
    backbone implements — the ASPP and sigmoid-gate fuse are the concrete
    parts; the recursion is parity-by-paper (DetectoRS)."""
    import sys
    import types

    if "src.models.modules.init_weights_org" not in sys.modules:
        shim = types.ModuleType("src.models.modules.init_weights_org")
        from src.models.modules.init_weights import kaiming_init
        shim.kaiming_init = kaiming_init
        sys.modules["src.models.modules.init_weights_org"] = shim
    from src.models.necks.rfp import ASPP as RefASPP

    from cvpytorch_tpu.models.necks.rfp import ASPP

    torch.manual_seed(0)
    ref = RefASPP(64, 16)
    ref.eval()
    x = np.random.RandomState(2).rand(2, 64, 14, 14).astype(np.float32)
    with torch.no_grad():
        want = ref(to_torch(x)).numpy()

    sd = ref.state_dict()
    params = {}
    for i in range(4):
        params[f"aspp{i}"] = {
            "kernel": sd[f"aspp.{i}.weight"].numpy().transpose(2, 3, 1, 0),
            "bias": sd[f"aspp.{i}.bias"].numpy()}
    model = ASPP(out_channels=16)
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    got = model.apply({"params": params}, xs)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5)


def test_giraffe_neck_matches_reference():
    """GiraffeNeck (GFPN queen-move topology) vs
    /root/reference/src/models/necks/giraffeneck.py:231-281 with the
    default concat/csp node config (the one AIRDet exercises)."""
    from src.models.necks.giraffeneck import GiraffeNeck as RefGiraffe

    from cvpytorch_tpu.models.necks.giraffe_neck import GiraffeNeck

    torch.manual_seed(0)
    in_channels = [128, 256, 512]
    ref = RefGiraffe(list(in_channels), fpn_channels=[96, 160, 384],
                     out_channels=[96, 160, 384])
    _randomize_bn(ref)
    ref.eval()

    rng = np.random.RandomState(3)
    feats_t = [torch.from_numpy(rng.rand(1, c, s, s).astype(np.float32))
               for c, s in zip(in_channels, (32, 16, 8))]
    with torch.no_grad():
        ref_outs = [o.numpy() for o in ref([f.clone() for f in feats_t])]

    sd = ref.state_dict()

    def csp(prefix):
        params, stats = {}, {}
        for cv in ("conv1", "conv2", "conv3"):
            p, s = _conv_bn(sd, f"{prefix}.{cv}")
            params[cv], stats[cv] = p, s
        for j in range(2):
            mp, ms = {}, {}
            for cv in ("conv1", "conv2"):
                p, s = _conv_bn(sd, f"{prefix}.m.{j}.{cv}")
                mp[cv], ms[cv] = p, s
            params[f"m{j}"], stats[f"m{j}"] = mp, ms
        return params, stats

    params, stats = {}, {}
    names = [f"node{i}" for i in range(3, 9)] + ["out9", "out10", "out11"]
    for i, name in enumerate(names):
        p, s = csp(f"cell.giraffeNeck.fnode.{i}.after_combine.CspLayer")
        params[name], stats[name] = p, s

    model = GiraffeNeck()
    feats = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    variables = model.init(jax.random.PRNGKey(0), feats)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    outs = model.apply({"params": params, "batch_stats": stats}, feats,
                       train=False)
    for got, want in zip(outs, ref_outs):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), want)


def test_gflv2_head_matches_reference():
    """GFocalHeadV2 forward incl. the DGQP quality branch vs
    /root/reference/src/models/heads/gflv2_head.py:221-416 (per-level
    towers, Scale'd DFL regression, top-k+mean distribution statistics →
    conv-sigmoid quality, cls prob = sigmoid·quality).  The reference
    emits num_classes+1 cls channels where the extra channel is dead
    ('will be deprecated', :237) — parity is on the live C channels."""
    from src.models.heads.gflv2_head import GFocalHeadV2 as RefHead

    from cvpytorch_tpu.models.heads.gflv2_head import GFocalHeadV2

    torch.manual_seed(0)
    C = 8
    in_channels = [64, 96, 128]
    ref = RefHead(num_classes=C, in_channels=list(in_channels),
                  stacked_convs=2, reg_max=14, reg_topk=4, reg_channels=32,
                  strides=[8, 16, 32], add_mean=True, conv_groups=2)
    _randomize_bn(ref)
    ref.eval()

    rng = np.random.RandomState(4)
    feats_t = [torch.from_numpy(rng.rand(2, c, s, s).astype(np.float32))
               for c, s in zip(in_channels, (16, 8, 4))]
    with torch.no_grad():
        ref_cls, ref_reg = [], []
        for i, x in enumerate(feats_t):
            fc, fr = ref.forward_single(
                x, ref.cls_convs[i], ref.reg_convs[i], ref.gfl_cls[i],
                ref.gfl_reg[i], ref.reg_confs[i], ref.scales[i])
            ref_cls.append(fc.numpy())
            ref_reg.append(fr.numpy())
        ref_priors = ref.get_single_level_center_priors(
            1, (16, 16), 8, torch.float32, "cpu")[0].numpy()

    sd = ref.state_dict()
    params, stats = {}, {}
    for i in range(3):
        for j in range(2):
            p, s = _conv_bn(sd, f"cls_convs.{i}.{j}")
            params[f"cls{i}_{j}"], stats[f"cls{i}_{j}"] = p, s
            p, s = _conv_bn(sd, f"reg_convs.{i}.{j}")
            params[f"reg{i}_{j}"], stats[f"reg{i}_{j}"] = p, s
        params[f"gfl_cls{i}"] = {
            "kernel": sd[f"gfl_cls.{i}.weight"].numpy()[:C]
            .transpose(2, 3, 1, 0),
            "bias": sd[f"gfl_cls.{i}.bias"].numpy()[:C]}
        params[f"gfl_reg{i}"] = {
            "kernel": sd[f"gfl_reg.{i}.weight"].numpy().transpose(2, 3, 1, 0),
            "bias": sd[f"gfl_reg.{i}.bias"].numpy()}
        params[f"reg_conf{i}_0"] = {
            "kernel": sd[f"reg_confs.{i}.0.weight"].numpy()
            .transpose(2, 3, 1, 0),
            "bias": sd[f"reg_confs.{i}.0.bias"].numpy()}
        params[f"reg_conf{i}_1"] = {
            "kernel": sd[f"reg_confs.{i}.2.weight"].numpy()
            .transpose(2, 3, 1, 0),
            "bias": sd[f"reg_confs.{i}.2.bias"].numpy()}
        params[f"scale{i}"] = {"scale": sd[f"scales.{i}.scale"].numpy()}

    model = GFocalHeadV2(num_classes=C, feat_channels=tuple(in_channels),
                         stacked_convs=2, reg_channels=32)
    feats = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    variables = model.init(jax.random.PRNGKey(0), feats)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    cls_probs, reg_logits, priors = model.apply(
        {"params": params, "batch_stats": stats}, feats, train=False)

    want_cls = np.concatenate(ref_cls, 1)[..., :C]
    want_reg = np.concatenate(ref_reg, 1)
    got_reg = np.asarray(reg_logits).reshape(want_reg.shape)
    np.testing.assert_allclose(np.asarray(cls_probs), want_cls, atol=5e-5)
    _allclose_rel(got_reg, want_reg, atol=5e-4)
    np.testing.assert_allclose(np.asarray(priors)[:256], ref_priors,
                               atol=0)


@pytest.mark.parametrize("block_name", ["FastBlock", "FasterBlock"])
def test_lfd_blocks_match_reference(block_name):
    """LFD residual blocks vs /root/reference/src/models/backbones/
    lfd_resnet.py:11-92, the only runnable pieces of the reference's LFD
    stack.  Upstream unbuildability evidence (documented parity, like
    YOLOv7Backbone):

    * ``LFDResNet.__init__`` crashes — ``_make_layer`` reads
      ``self._body_architecture``/``self._body_channels``/``self._block``
      that nothing ever sets (lfd_resnet.py:201-212; verified
      AttributeError this session);
    * stride-1 blocks crash — ``forward`` reads ``self._downsample``
      which only exists when stride > 1 (:28-32 vs :48);
    * ``FastestBlock`` always crashes — ``_norm1`` is
      ``BatchNorm2d(out_channels)`` applied to the half-width conv1
      output (:102-104);
    * ``LFDNeck.forward`` reads undefined ``self._num_inputs``
      (lfd_neck.py:42);
    * conf/coco_lfd.yml:64 names ``'LFDHead'`` which exists nowhere in
      src/models/heads/.
    Our LFD is therefore the runnable intent: these blocks + stem +
    5-level FCOS machinery."""
    import src.models.backbones.lfd_resnet as ref_mod

    import cvpytorch_tpu.models.backbones.lfd_resnet as our_mod

    torch.manual_seed(0)
    ref = getattr(ref_mod, block_name)(32, 48, stride=2)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(5).rand(2, 32, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(to_torch(x)).numpy()

    sd = ref.state_dict()

    def conv_bn_folded(conv, norm):
        """plain Conv2d(bias=True) + BatchNorm2d → ConvBNAct with the
        conv bias folded into the BN running mean (exact in eval)."""
        p = {"conv": {"kernel": sd[f"{conv}.weight"].numpy()
                      .transpose(2, 3, 1, 0)}}
        s = {"bn": {"mean": sd[f"{norm}.running_mean"].numpy()
                    - sd[f"{conv}.bias"].numpy(),
                    "var": sd[f"{norm}.running_var"].numpy()}}
        p["bn"] = {"scale": sd[f"{norm}.weight"].numpy(),
                   "bias": sd[f"{norm}.bias"].numpy()}
        return p, s

    params, stats = {}, {}
    n_convs = 3 if block_name == "FastBlock" else 2
    for i in range(1, n_convs + 1):
        p, s = conv_bn_folded(f"_conv{i}", f"_norm{i}")
        params[f"conv{i}"], stats[f"conv{i}"] = p, s
    p, s = conv_bn_folded("_downsample.0", "_downsample.1")
    params["down"], stats["down"] = p, s

    model = getattr(our_mod, block_name)(out_channels=48, stride=2)
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    got = model.apply({"params": params, "batch_stats": stats}, xs,
                      train=False)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-5)


def test_efficientdet_bifpn_matches_reference():
    """First-time BiFPN cell vs /root/reference/src/models/necks/
    bifpn.py:19-200 (the registered neck — bilinear upsample variant):
    down-channel convs, P6/P7 synthesis, fast-attention weights, swish
    before separable conv, TF-SAME maxpool downsample."""
    from src.models.necks.bifpn import BiFPN as RefBiFPN

    from cvpytorch_tpu.models.efficientdet import BiFPNCell

    torch.manual_seed(0)
    ref = RefBiFPN(in_channels=[40, 112, 320], out_channels=64,
                   first_time=True)
    _randomize_bn(ref)
    ref.eval()
    rng = np.random.RandomState(6)
    feats_t = [torch.from_numpy(rng.rand(1, c, s, s).astype(np.float32))
               for c, s in zip((40, 112, 320), (32, 16, 8))]
    with torch.no_grad():
        ref_outs = [o.numpy() for o in ref(feats_t)]

    sd = ref.state_dict()

    def convbn(prefix):   # Sequential(Conv2dStaticSamePadding, BN)
        return ({"conv": {"kernel": sd[f"{prefix}.0.conv.weight"].numpy()
                          .transpose(2, 3, 1, 0),
                          "bias": sd[f"{prefix}.0.conv.bias"].numpy()},
                 "bn": {"scale": sd[f"{prefix}.1.weight"].numpy(),
                        "bias": sd[f"{prefix}.1.bias"].numpy()}},
                {"bn": {"mean": sd[f"{prefix}.1.running_mean"].numpy(),
                        "var": sd[f"{prefix}.1.running_var"].numpy()}})

    def sep(prefix):
        return ({"depthwise_conv": {
                    "kernel": sd[f"{prefix}.depthwise_conv.conv.weight"]
                    .numpy().transpose(2, 3, 1, 0)},
                 "pointwise_conv": {
                    "kernel": sd[f"{prefix}.pointwise_conv.conv.weight"]
                    .numpy().transpose(2, 3, 1, 0),
                    "bias": sd[f"{prefix}.pointwise_conv.conv.bias"]
                    .numpy()},
                 "bn": {"scale": sd[f"{prefix}.bn.weight"].numpy(),
                        "bias": sd[f"{prefix}.bn.bias"].numpy()}},
                {"bn": {"mean": sd[f"{prefix}.bn.running_mean"].numpy(),
                        "var": sd[f"{prefix}.bn.running_var"].numpy()}})

    params, stats = {}, {}
    for name in ("p5_to_p6", "p3_down_channel", "p4_down_channel",
                 "p5_down_channel", "p4_down_channel_2",
                 "p5_down_channel_2"):
        p, s = convbn(name)
        params[name], stats[name] = p, s
    for name in ("conv6_up", "conv5_up", "conv4_up", "conv3_up",
                 "conv4_down", "conv5_down", "conv6_down", "conv7_down"):
        p, s = sep(name)
        params[name], stats[name] = p, s
    for w in ("p6_w1", "p5_w1", "p4_w1", "p3_w1", "p4_w2", "p5_w2",
              "p6_w2", "p7_w2"):
        params[w] = sd[w].numpy()

    model = BiFPNCell(64, first_time=True)
    feats = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    variables = model.init(jax.random.PRNGKey(0), feats)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    outs = model.apply({"params": params, "batch_stats": stats}, feats,
                       train=False)
    for got, want in zip(outs, ref_outs):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), want)


def test_efficientdet_head_matches_reference():
    """Regressor + Classifier vs efficientdet_extra.py:352-426: shared
    separable convs, PER-LEVEL BN lists, separable headers; classifier
    output sigmoid'd and anchor-major flattened."""
    from src.models.heads.efficientdet_head import EfficientdetHead

    from cvpytorch_tpu.models.efficientdet import Regressor

    torch.manual_seed(0)
    ref = EfficientdetHead(num_classes=6, fpn_num_filter=32, num_anchors=9,
                           box_class_repeat=2, pyramid_level=5,
                           anchor_scale=4)
    _randomize_bn(ref)
    ref.eval()
    rng = np.random.RandomState(7)
    feats_t = [torch.from_numpy(rng.rand(1, 32, s, s).astype(np.float32))
               for s in (16, 8, 4, 2, 1)]
    with torch.no_grad():
        want_reg = ref.regressor(feats_t).numpy()
        want_cls = ref.classifier(feats_t).numpy()

    sd = ref.state_dict()

    def head_params(tname, out_dim):
        params, stats = {}, {}
        for i in range(2):
            params[f"conv{i}"] = {
                "depthwise_conv": {
                    "kernel": sd[f"{tname}.conv_list.{i}.depthwise_conv"
                                 ".conv.weight"].numpy()
                    .transpose(2, 3, 1, 0)},
                "pointwise_conv": {
                    "kernel": sd[f"{tname}.conv_list.{i}.pointwise_conv"
                                 ".conv.weight"].numpy()
                    .transpose(2, 3, 1, 0),
                    "bias": sd[f"{tname}.conv_list.{i}.pointwise_conv"
                               ".conv.bias"].numpy()}}
        params["header"] = {
            "depthwise_conv": {
                "kernel": sd[f"{tname}.header.depthwise_conv.conv.weight"]
                .numpy().transpose(2, 3, 1, 0)},
            "pointwise_conv": {
                "kernel": sd[f"{tname}.header.pointwise_conv.conv.weight"]
                .numpy().transpose(2, 3, 1, 0),
                "bias": sd[f"{tname}.header.pointwise_conv.conv.bias"]
                .numpy()}}
        for lvl in range(5):
            for i in range(2):
                params[f"bn{lvl}_{i}"] = {
                    "scale": sd[f"{tname}.bn_list.{lvl}.{i}.weight"].numpy(),
                    "bias": sd[f"{tname}.bn_list.{lvl}.{i}.bias"].numpy()}
                stats[f"bn{lvl}_{i}"] = {
                    "mean": sd[f"{tname}.bn_list.{lvl}.{i}.running_mean"]
                    .numpy(),
                    "var": sd[f"{tname}.bn_list.{lvl}.{i}.running_var"]
                    .numpy()}
        return params, stats

    feats = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]

    p, s = head_params("regressor", 4)
    reg_m = Regressor(32, 9, 2, out_dim=4)
    variables = reg_m.init(jax.random.PRNGKey(0), feats)
    errs = verify_tree_shapes(p, dict(variables["params"]))
    assert not errs, errs
    got_reg = reg_m.apply({"params": p, "batch_stats": s}, feats,
                          train=False)
    np.testing.assert_allclose(np.asarray(got_reg), want_reg, atol=5e-5)

    p, s = head_params("classifier", 6)
    cls_m = Regressor(32, 9, 2, out_dim=6)
    got_cls = jax.nn.sigmoid(cls_m.apply(
        {"params": p, "batch_stats": s}, feats, train=False))
    np.testing.assert_allclose(np.asarray(got_cls), want_cls, atol=5e-5)


def test_efficientdet_anchors_and_loss_match_reference():
    """Anchor grid (extra :944-1029) and EfficientDetLoss
    (efficientdet_loss.py:27-140) including the IoU-band assignment,
    focal/smooth-L1 math, per-image normalization and the ×50 reg
    weight — our padded/masked vmap vs the reference's per-image
    boolean-filter loop, incl. an image with zero annotations."""
    from src.losses.efficientdet_loss import EfficientDetLoss
    from src.models.efficientdet_extra import Anchors

    from cvpytorch_tpu.models.efficientdet import (efficientdet_anchors,
                                                   efficientdet_loss)

    img = torch.zeros(1, 3, 128, 128)
    ref_anchors = Anchors(anchor_scale=4.0)(img)            # (1, P, 4)
    got_anchors = efficientdet_anchors((128, 128))
    np.testing.assert_allclose(np.asarray(got_anchors),
                               ref_anchors[0].numpy(), atol=1e-4)

    P = ref_anchors.shape[1]
    rng = np.random.RandomState(8)
    B, M, C = 3, 5, 6
    cls = rng.rand(B, P, C).astype(np.float32)
    reg = (rng.rand(B, P, 4).astype(np.float32) - 0.5)
    boxes = np.zeros((B, M, 4), np.float32)
    labels = rng.randint(0, C, (B, M))
    valid = np.zeros((B, M), bool)
    for b in range(B - 1):      # last image: zero annotations
        n = rng.randint(1, M + 1)
        xy = rng.rand(n, 2) * 90
        wh = rng.rand(n, 2) * 30 + 8
        boxes[b, :n] = np.concatenate([xy, xy + wh], -1)
        valid[b, :n] = True

    annotations = np.full((B, M, 5), -1.0, np.float32)
    annotations[..., :4] = boxes
    annotations[..., 4] = np.where(valid, labels.astype(np.float32), -1.0)
    ref_loss = EfficientDetLoss()
    with torch.no_grad():
        want_cls, want_reg = ref_loss(
            (to_torch(cls), to_torch(reg), ref_anchors),
            to_torch(annotations))

    got_cls, got_reg = efficientdet_loss(
        jnp.asarray(cls), jnp.asarray(reg), got_anchors,
        {"boxes": jnp.asarray(boxes), "labels": jnp.asarray(labels),
         "valid": jnp.asarray(valid)})
    np.testing.assert_allclose(float(got_cls), float(want_cls), rtol=1e-4)
    np.testing.assert_allclose(float(got_reg), float(want_reg), rtol=1e-4)


def test_mix_vision_transformer_matches_reference():
    """SegFormer MiT-b0 backbone vs /root/reference/src/models/backbones/
    seg/mix_transformer.py:214-322 (overlap patch embeds, spatial-
    reduction attention, Mix-FFN depthwise conv, per-stage norms)."""
    from src.models.backbones.seg.mix_transformer import (
        MixVisionTransformer as RefMiT)

    from cvpytorch_tpu.models.backbones.seg_transformers import (
        MixVisionTransformer)

    torch.manual_seed(0)
    ref = RefMiT(subtype="mit_b0", out_channels=[32, 64, 160, 256],
                 depths=[2, 2, 2, 2], qkv_bias=True, drop_path_rate=0.1,
                 out_stages=[1, 2, 3, 4])
    ref.eval()
    x = np.random.RandomState(9).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()
    params = {}
    for si in range(4):
        r = si + 1
        C = [32, 64, 160, 256][si]
        params[f"patch{si}"] = {
            "kernel": sd[f"patch_embed{r}.proj.weight"].numpy()
            .transpose(2, 3, 1, 0),
            "bias": sd[f"patch_embed{r}.proj.bias"].numpy()}
        params[f"patch_norm{si}"] = _ln(sd, f"patch_embed{r}.norm")
        params[f"out_norm{si}"] = _ln(sd, f"norm{r}")
        for j in range(2):
            b = f"block{r}.{j}"
            params[f"ln1_{si}_{j}"] = _ln(sd, f"{b}.norm1")
            params[f"ln2_{si}_{j}"] = _ln(sd, f"{b}.norm2")
            kvw = sd[f"{b}.attn.kv.weight"].numpy()      # (2C, C)
            kvb = sd[f"{b}.attn.kv.bias"].numpy()
            attn = {
                "q": _dense(sd, f"{b}.attn.q"),
                "k": {"kernel": kvw[:C].T, "bias": kvb[:C]},
                "v": {"kernel": kvw[C:].T, "bias": kvb[C:]},
                "proj": _dense(sd, f"{b}.attn.proj"),
            }
            if f"{b}.attn.sr.weight" in sd:
                attn["sr"] = {
                    "kernel": sd[f"{b}.attn.sr.weight"].numpy()
                    .transpose(2, 3, 1, 0),
                    "bias": sd[f"{b}.attn.sr.bias"].numpy()}
                attn["sr_norm"] = _ln(sd, f"{b}.attn.norm")
            params[f"attn{si}_{j}"] = attn
            params[f"ffn{si}_{j}"] = {
                "fc1": _dense(sd, f"{b}.mlp.fc1"),
                "fc2": _dense(sd, f"{b}.mlp.fc2"),
                "dwconv": {
                    "kernel": sd[f"{b}.mlp.dwconv.dwconv.weight"].numpy()
                    .transpose(2, 3, 1, 0),
                    "bias": sd[f"{b}.mlp.dwconv.dwconv.bias"].numpy()},
            }

    model = MixVisionTransformer(subtype="mit_b0",
                                 out_stages=(1, 2, 3, 4))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params}, xs, train=False)
    assert len(feats) == 4
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


def test_mscan_matches_reference():
    """SegNeXt MSCAN-t backbone vs /root/reference/src/models/backbones/
    seg/mscan.py:16-250.  This test drove three real fixes in our MSCAN:
    parallel (not chained) strip-conv branches, per-stage MLP ratios
    [8,8,4,4], and the per-stage token LayerNorms."""
    from src.models.backbones.seg.mscan import MSCAN as RefMSCAN

    from cvpytorch_tpu.models.backbones.seg_transformers import MSCAN

    torch.manual_seed(0)
    ref = RefMSCAN(subtype="mscan_t", out_stages=[2, 3, 4])
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(10).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()

    def conv(prefix):
        p = {"kernel": sd[f"{prefix}.weight"].numpy().transpose(2, 3, 1, 0)}
        if f"{prefix}.bias" in sd:
            p["bias"] = sd[f"{prefix}.bias"].numpy()
        return p

    def bn(prefix):
        return ({"scale": sd[f"{prefix}.weight"].numpy(),
                 "bias": sd[f"{prefix}.bias"].numpy()},
                {"mean": sd[f"{prefix}.running_mean"].numpy(),
                 "var": sd[f"{prefix}.running_var"].numpy()})

    params, stats = {}, {}
    params["stem1"] = conv("patch_embed1.proj.0")
    params["stem_bn1"], stats["stem_bn1"] = bn("patch_embed1.proj.1")
    params["stem2"] = conv("patch_embed1.proj.3")
    params["stem_bn2"], stats["stem_bn2"] = bn("patch_embed1.proj.4")
    depths = (3, 3, 5, 2)
    for si in range(4):
        r = si + 1
        if si > 0:
            params[f"down{si}"] = conv(f"patch_embed{r}.proj")
            params[f"down_bn{si}"], stats[f"down_bn{si}"] = \
                bn(f"patch_embed{r}.norm")
        params[f"out_ln{si}"] = _ln(sd, f"norm{r}")
        for j in range(depths[si]):
            b = f"block{r}.{j}"
            blk, bst = {}, {}
            blk["bn1"], bst["bn1"] = bn(f"{b}.norm1")
            blk["bn2"], bst["bn2"] = bn(f"{b}.norm2")
            blk["proj1"] = conv(f"{b}.attn.proj_1")
            blk["proj2"] = conv(f"{b}.attn.proj_2")
            g = f"{b}.attn.spatial_gating_unit"
            blk["attn"] = {
                "conv5": conv(f"{g}.conv0"),
                "h0": conv(f"{g}.conv0_1"), "v0": conv(f"{g}.conv0_2"),
                "h1": conv(f"{g}.conv1_1"), "v1": conv(f"{g}.conv1_2"),
                "h2": conv(f"{g}.conv2_1"), "v2": conv(f"{g}.conv2_2"),
                "mix": conv(f"{g}.conv3"),
            }
            blk["ffn1"] = conv(f"{b}.mlp.fc1")
            blk["ffn_dw"] = conv(f"{b}.mlp.dwconv.dwconv")
            blk["ffn2"] = conv(f"{b}.mlp.fc2")
            blk["ls1"] = sd[f"{b}.layer_scale_1"].numpy()
            blk["ls2"] = sd[f"{b}.layer_scale_2"].numpy()
            params[f"stage{r}_block{j}"] = blk
            stats[f"stage{r}_block{j}"] = bst

    model = MSCAN(subtype="mscan_t", out_stages=(2, 3, 4))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params, "batch_stats": stats}, xs,
                        train=False)
    assert len(feats) == 3
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


def test_lightham_head_matches_reference():
    """SegNeXt LightHamHead vs /root/reference/src/models/heads/seg/
    lightham_head.py:21-216: squeeze/align GN32 ConvModules, Hamburger
    (ham_in → relu → NMF2D multiplicative updates → ham_out+GN →
    residual relu).  The reference draws FRESH random NMF bases every
    forward (:110-116, .cuda()-only, another upstream CPU-breaker) — both
    sides are given the same fixed normalized bases so the 8
    multiplicative updates are comparable."""
    from src.models.heads.seg.lightham_head import LightHamHead as RefHead

    from cvpytorch_tpu.models.heads.seg_heads_extra import LightHamHead

    torch.manual_seed(0)
    R = 16
    ref = RefHead(num_classes=7, in_channels=[64, 160, 256], channels=32,
                  ham_channels=32, ham_kwargs={"MD_R": R})
    ref.eval()
    rng = np.random.RandomState(11)
    bases_np = rng.rand(1, 32, R).astype(np.float32)
    bases_np /= np.linalg.norm(bases_np, axis=1, keepdims=True)
    ref.hamburger.ham.rand_init = True
    ref.hamburger.ham._build_bases = \
        lambda B, S, D, Rk, cuda=False: to_torch(bases_np).repeat(B, 1, 1)

    feats_t = [torch.from_numpy(rng.rand(1, c, s, s).astype(np.float32))
               for c, s in zip((64, 160, 256), (16, 8, 4))]
    with torch.no_grad():
        want = ref(feats_t).numpy()

    sd = ref.state_dict()

    def conv(prefix):
        p = {"kernel": sd[f"{prefix}.weight"].numpy().transpose(2, 3, 1, 0)}
        if f"{prefix}.bias" in sd:
            p["bias"] = sd[f"{prefix}.bias"].numpy()
        return p

    def gn(prefix):
        return {"scale": sd[f"{prefix}.weight"].numpy(),
                "bias": sd[f"{prefix}.bias"].numpy()}

    params = {
        "squeeze": conv("squeeze.conv"),
        "squeeze_gn": gn("squeeze.gn"),
        "align": conv("align.conv"),
        "align_gn": gn("align.gn"),
        "cls": conv("cls_seg"),
        "hamburger": {
            "ham_in": conv("hamburger.ham_in.conv"),
            "ham_out": conv("hamburger.ham_out.conv"),
            "ham_out_gn": gn("hamburger.ham_out.gn"),
        },
    }
    model = LightHamHead(num_classes=7, channels=32, ham_channels=32,
                         nmf_rank=R)
    feats = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    variables = model.init(jax.random.PRNGKey(0), feats)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    got = model.apply({"params": params}, feats, train=False,
                      bases=jnp.asarray(bases_np))
    _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_topformer_backbone_matches_reference():
    """TopFormer-t backbone vs /root/reference/src/models/backbones/seg/
    topformer_backbone.py:349-436: token pyramid (plain-ReLU MBv2
    blocks), stride-2 PyramidPoolAgg, 4 ReLU6 conv-attention transformer
    blocks (key_dim 16), SemanticInjection h_sigmoid gating."""
    from src.models.backbones.seg.topformer_backbone import (
        TopFormerBackbone as RefTF)

    from cvpytorch_tpu.models.backbones.seg_light import TopFormerBackbone

    torch.manual_seed(0)
    ref = RefTF(subtype="topformer_t", out_stages=[1, 2, 3],
                pretrained=False)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(12).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()

    def cbn(prefix):
        return ({"c": {"kernel": sd[f"{prefix}.c.weight"].numpy()
                       .transpose(2, 3, 1, 0)},
                 "bn": {"scale": sd[f"{prefix}.bn.weight"].numpy(),
                        "bias": sd[f"{prefix}.bn.bias"].numpy()}},
                {"bn": {"mean": sd[f"{prefix}.bn.running_mean"].numpy(),
                        "var": sd[f"{prefix}.bn.running_var"].numpy()}})

    params, stats = {}, {}
    params["stem"], stats["stem"] = cbn("tpm.stem.0")
    cfgs = [[3, 1, 16, 1], [3, 4, 16, 2], [3, 3, 16, 1], [5, 3, 32, 2],
            [5, 3, 32, 1], [3, 3, 64, 2], [3, 3, 64, 1], [5, 6, 96, 2],
            [5, 6, 96, 1]]
    for i, (k, t, c, s) in enumerate(cfgs):
        name = f"layer{i + 1}"
        blk, bst = {}, {}
        n_convs = 3 if t != 1 else 2
        for j in range(n_convs):
            # torch Sequential interleaves activations: conv indices are
            # 0, 2, 4 when expanded, else 0, 2
            tidx = [0, 2, 4][j] if t != 1 else [0, 2][j]
            p, st = cbn(f"tpm.{name}.conv.{tidx}")
            blk[f"conv{j}"], bst[f"conv{j}"] = p, st
        params[name], stats[name] = blk, bst
    for bi in range(4):
        b = f"trans.transformer_blocks.{bi}"
        blk, bst = {}, {}
        at, ast = {}, {}
        for nm in ("to_q", "to_k", "to_v"):
            at[nm], ast[nm] = cbn(f"{b}.attn.{nm}")
        at["proj"], ast["proj"] = cbn(f"{b}.attn.proj.1")
        blk["attn"], bst["attn"] = at, ast
        blk["fc1"], bst["fc1"] = cbn(f"{b}.mlp.fc1")
        blk["fc2"], bst["fc2"] = cbn(f"{b}.mlp.fc2")
        blk["dwconv"] = {
            "kernel": sd[f"{b}.mlp.dwconv.weight"].numpy()
            .transpose(2, 3, 1, 0),
            "bias": sd[f"{b}.mlp.dwconv.bias"].numpy()}
        params[f"trans{bi}"], stats[f"trans{bi}"] = blk, bst
    for i in (1, 2, 3):
        for ours, theirs in (("local", "local_embedding"),
                             ("act", "global_act"),
                             ("global", "global_embedding")):
            p = {"c": {"kernel": sd[f"SIM.{i}.{theirs}.conv.weight"]
                       .numpy().transpose(2, 3, 1, 0)},
                 "bn": {"scale": sd[f"SIM.{i}.{theirs}.bn.weight"].numpy(),
                        "bias": sd[f"SIM.{i}.{theirs}.bn.bias"].numpy()}}
            st = {"bn": {
                "mean": sd[f"SIM.{i}.{theirs}.bn.running_mean"].numpy(),
                "var": sd[f"SIM.{i}.{theirs}.bn.running_var"].numpy()}}
            params[f"sim{i}_{ours}"], stats[f"sim{i}_{ours}"] = p, st

    model = TopFormerBackbone(subtype="topformer_t", out_stages=(1, 2, 3))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params, "batch_stats": stats}, xs,
                        train=False)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


def test_stdcnet_backbone_matches_reference():
    """STDCNet-1 backbone vs /root/reference/src/models/backbones/seg/
    stdcnet.py:18-184 (ConvX stem/layer1, CatBottleneck stages with the
    depthwise 'avd' stride path and avg-pool skip).  Note the reference
    ignores its subtype for depth — 'stdc2' builds the same [2,2,2]
    layout upstream; our stdc2 uses the paper's (4,5,3)."""
    from src.models.backbones.seg.stdcnet import STDCNet as RefSTDC

    from cvpytorch_tpu.models.light_seg import STDCNet

    torch.manual_seed(0)
    ref = RefSTDC(subtype="stdc1", out_stages=[2, 3, 4], pretrained=False)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(13).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()

    def convx(prefix):
        return ({"conv": {"kernel": sd[f"{prefix}.conv.weight"].numpy()
                          .transpose(2, 3, 1, 0)},
                 "bn": {"scale": sd[f"{prefix}.bn.weight"].numpy(),
                        "bias": sd[f"{prefix}.bn.bias"].numpy()}},
                {"bn": {"mean": sd[f"{prefix}.bn.running_mean"].numpy(),
                        "var": sd[f"{prefix}.bn.running_var"].numpy()}})

    params, stats = {}, {}
    params["stem1"], stats["stem1"] = convx("stem")
    params["stem2"], stats["stem2"] = convx("layer1")
    for li, si in ((2, 3), (3, 4), (4, 5)):
        for j in range(2):
            blk, bst = {}, {}
            base = f"layer{li}.{j}"
            blk["conv0"], bst["conv0"] = convx(f"{base}.conv_list.0")
            for k in range(1, 4):
                blk[f"conv{k}"], bst[f"conv{k}"] = \
                    convx(f"{base}.conv_list.{k}")
            if j == 0:   # stride-2 block has the avd layer
                blk["avd_conv"] = {
                    "kernel": sd[f"{base}.avd_layer.0.weight"].numpy()
                    .transpose(2, 3, 1, 0)}
                blk["avd_bn"] = {
                    "scale": sd[f"{base}.avd_layer.1.weight"].numpy(),
                    "bias": sd[f"{base}.avd_layer.1.bias"].numpy()}
                bst["avd_bn"] = {
                    "mean": sd[f"{base}.avd_layer.1.running_mean"].numpy(),
                    "var": sd[f"{base}.avd_layer.1.running_var"].numpy()}
            params[f"stage{si}_{j}"], stats[f"stage{si}_{j}"] = blk, bst

    model = STDCNet(subtype="stdc1", out_stages=(3, 4, 5))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params, "batch_stats": stats}, xs,
                        train=False)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


@pytest.mark.parametrize("which", ["psp", "uper"])
def test_psp_uper_heads_match_reference(which):
    """PSPHead / UPerHead vs /root/reference/src/models/heads/seg/
    {psp,uper}_head.py (adaptive-pool PPM + ConvBNReLU bottlenecks;
    UPer adds the lateral top-down FPN and multi-level fuse)."""
    if which == "psp":
        from src.models.heads.seg.psp_head import PSPHead as RefHead

        from cvpytorch_tpu.models.heads.seg_heads import PSPHead as Head
        ref = RefHead(num_classes=7, in_channels=96, channels=32)
        in_chs, sizes = (96,), (12,)
    else:
        from src.models.heads.seg.uper_head import UPerHead as RefHead

        from cvpytorch_tpu.models.heads.seg_heads import UPerHead as Head
        ref = RefHead(num_classes=7, in_channels=[32, 48, 64, 96],
                      channels=32)
        in_chs, sizes = (32, 48, 64, 96), (48, 24, 18, 12)

    torch.manual_seed(0)
    _randomize_bn(ref)
    ref.eval()
    rng = np.random.RandomState(14)
    feats_t = [torch.from_numpy(rng.rand(1, c, s, s).astype(np.float32))
               for c, s in zip(in_chs, sizes)]
    with torch.no_grad():
        want = ref(feats_t[-1] if which == "psp" else feats_t).numpy()

    sd = ref.state_dict()
    params, stats = {}, {}
    if which == "psp":
        for i in range(4):
            p, s = _conv_bn(sd, f"psp.{i}.1")
            params[f"pool{i}"], stats[f"pool{i}"] = p, s
        p, s = _conv_bn(sd, "bottleneck")
        params["bottleneck"], stats["bottleneck"] = p, s
    else:
        for i in range(4):
            p, s = _conv_bn(sd, f"ppm.{i}.1")
            params[f"ppm{i}"], stats[f"ppm{i}"] = p, s
        p, s = _conv_bn(sd, "ppm_bottleneck")
        params["ppm_bottleneck"], stats["ppm_bottleneck"] = p, s
        for i in range(3):
            p, s = _conv_bn(sd, f"lateral_convs.{i}")
            params[f"lateral{i}"], stats[f"lateral{i}"] = p, s
            p, s = _conv_bn(sd, f"fpn_convs.{i}")
            params[f"fpn_conv{i}"], stats[f"fpn_conv{i}"] = p, s
        p, s = _conv_bn(sd, "fpn_bottleneck")
        params["fuse"], stats["fuse"] = p, s
    params["cls"] = {"kernel": sd["cls_seg.weight"].numpy()
                     .transpose(2, 3, 1, 0),
                     "bias": sd["cls_seg.bias"].numpy()}

    model = Head(num_classes=7, channels=32)
    feats = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    variables = model.init(jax.random.PRNGKey(0), feats)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    got = model.apply({"params": params, "batch_stats": stats}, feats,
                      train=False)
    _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_segformer_head_matches_reference():
    """SegFormer all-MLP decoder vs /root/reference/src/models/heads/seg/
    segformer_head.py:14-67 (per-level linear embeds, upsample to C1,
    reverse-order concat, ConvBNReLU fuse)."""
    from src.models.heads.seg.segformer_head import SegFormerHead as Ref

    from cvpytorch_tpu.models.heads.seg_heads_extra import SegFormerHead

    torch.manual_seed(0)
    ref = Ref(num_classes=7, in_channels=[32, 64, 160, 256], channels=64,
              strides=[4, 8, 16, 32])
    _randomize_bn(ref)
    ref.eval()
    rng = np.random.RandomState(15)
    feats_t = [torch.from_numpy(rng.rand(1, c, s, s).astype(np.float32))
               for c, s in zip((32, 64, 160, 256), (32, 16, 8, 4))]
    with torch.no_grad():
        want = ref(feats_t).numpy()

    sd = ref.state_dict()
    params, stats = {}, {}
    for i in range(4):
        params[f"linear{i}"] = _dense(sd, f"linear_c{i + 1}.proj")
    p, s = _conv_bn(sd, "linear_fuse")
    params["fuse"], stats["fuse"] = p, s
    params["cls"] = {"kernel": sd["cls_seg.weight"].numpy()
                     .transpose(2, 3, 1, 0),
                     "bias": sd["cls_seg.bias"].numpy()}

    model = SegFormerHead(num_classes=7, channels=64)
    feats = [jnp.asarray(f.numpy().transpose(0, 2, 3, 1)) for f in feats_t]
    variables = model.init(jax.random.PRNGKey(0), feats)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    got = model.apply({"params": params, "batch_stats": stats}, feats,
                      train=False)
    _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_fastestdet_neck_head_match_reference():
    """FastestDet neck+head chain vs /root/reference/src/models/necks/
    fastestdet_neck.py:11-90 + heads/fastestdet_head.py:11-56 (avg-pool/
    upsample gather, parallel-depth dw5 SPP with residual, per-branch
    dw5 + 1×1(no bias)+BN heads emitting sigmoid obj / softmax cls)."""
    import flax.linen as fnn

    from src.models.heads.fastestdet_head import FastestDetHead as RefHead
    from src.models.necks.fastestdet_neck import FastestDetNeck as RefNeck

    import cvpytorch_tpu.models.backbones as bb_pkg
    from cvpytorch_tpu.models.yolop import FastestDet

    torch.manual_seed(0)
    C = 5
    neck = RefNeck(in_channels=[48, 96, 192], out_channels=96)
    head = RefHead(num_classes=C, in_channels=96)
    for m in (neck, head):
        _randomize_bn(m)
        m.eval()
    rng = np.random.RandomState(16)
    c3 = torch.from_numpy(rng.rand(1, 48, 16, 16).astype(np.float32))
    c4 = torch.from_numpy(rng.rand(1, 96, 8, 8).astype(np.float32))
    c5 = torch.from_numpy(rng.rand(1, 192, 4, 4).astype(np.float32))
    with torch.no_grad():
        want = head(neck([c3, c4, c5])).numpy()

    sd = {}
    for mod, pre in ((neck, "neck"), (head, "head")):
        for k, v in mod.state_dict().items():
            sd[f"{pre}.{k}"] = v

    def seq(prefix, idx_conv, idx_bn):
        return ({"conv": {"kernel": sd[f"{prefix}.{idx_conv}.weight"]
                          .numpy().transpose(2, 3, 1, 0)},
                 "bn": {"scale": sd[f"{prefix}.{idx_bn}.weight"].numpy(),
                        "bias": sd[f"{prefix}.{idx_bn}.bias"].numpy()}},
                {"bn": {"mean": sd[f"{prefix}.{idx_bn}.running_mean"]
                        .numpy(),
                        "var": sd[f"{prefix}.{idx_bn}.running_var"]
                        .numpy()}})

    params, stats = {}, {}
    params["spp_in"], stats["spp_in"] = seq("neck.SPP.Conv1x1", 0, 1)
    params["s1_0"], stats["s1_0"] = seq("neck.SPP.S1", 0, 1)
    params["s2_0"], stats["s2_0"] = seq("neck.SPP.S2", 0, 1)
    params["s2_1"], stats["s2_1"] = seq("neck.SPP.S2", 3, 4)
    params["s3_0"], stats["s3_0"] = seq("neck.SPP.S3", 0, 1)
    params["s3_1"], stats["s3_1"] = seq("neck.SPP.S3", 3, 4)
    params["s3_2"], stats["s3_2"] = seq("neck.SPP.S3", 6, 7)
    params["spp_out"], stats["spp_out"] = seq("neck.SPP.output", 0, 1)
    params["head_in"], stats["head_in"] = seq("head.conv1x1", 0, 1)
    for ours, theirs in (("obj", "obj_layers"), ("reg", "reg_layers"),
                         ("cls", "cls_layers")):
        params[f"{ours}_dw"], stats[f"{ours}_dw"] = \
            seq(f"head.{theirs}", 0, 1)
        params[f"{ours}_out"], stats[f"{ours}_out"] = \
            seq(f"head.{theirs}", 3, 4)

    class _FakeBB(fnn.Module):
        """Feeds the torch features so only neck+head are compared."""

        @fnn.compact
        def __call__(self, x, train=False):
            return (jnp.asarray(c3.numpy().transpose(0, 2, 3, 1)),
                    jnp.asarray(c4.numpy().transpose(0, 2, 3, 1)),
                    jnp.asarray(c5.numpy().transpose(0, 2, 3, 1)))

    imgs = jnp.zeros((1, 128, 128, 3))
    orig_bb = bb_pkg.build_backbone
    bb_pkg.build_backbone = lambda cfg: _FakeBB()
    try:
        model = FastestDet(
            dictionary=tuple({f"c{i}": 1.0} for i in range(C)))
        v = model.init(jax.random.PRNGKey(0), imgs, mode="infer")
        p = dict(v["params"])
        s = dict(v.get("batch_stats", {}))
        p.update(params)
        s.update(stats)
        got = model.apply({"params": p, "batch_stats": s}, imgs, False,
                          method=FastestDet._raw)
    finally:
        bb_pkg.build_backbone = orig_bb
    np.testing.assert_allclose(np.asarray(got),
                               want.transpose(0, 2, 3, 1), atol=5e-5)


def test_regseg_backbone_and_head_match_reference():
    """RegSeg exp48_decoder26 vs /root/reference/src/models/backbones/
    seg/regseg_backbone.py:20-163 + heads/seg/regseg_head.py:15-49 —
    D-blocks with group-width-16 split-dilated convs (BN after concat),
    the SEModule mid=in//4 quirk, avg-pool shortcuts, the full 14-block
    stage3 dilation schedule, and the x4/x8/x16 decoder."""
    from src.models.backbones.seg.regseg_backbone import (
        RegSegBackbone as RefBB)
    from src.models.heads.seg.regseg_head import RegSegHead as RefHead

    from cvpytorch_tpu.models.backbones.seg_light import (RegSegBackbone,
                                                          RegSegHead)

    torch.manual_seed(0)
    bb = RefBB("")
    head = RefHead(num_classes=7, in_channels=[48, 128, 320], channels=64)
    for m in (bb, head):
        _randomize_bn(m)
        m.eval()
    x = np.random.RandomState(17).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        feats_ref = bb(to_torch(x))
        want = head(feats_ref).numpy()

    sd = {}
    for mod, pre in ((bb, "bb"), (head, "head")):
        for k, v in mod.state_dict().items():
            sd[f"{pre}.{k}"] = v

    def conv(prefix):
        p = {"kernel": sd[f"{prefix}.weight"].numpy().transpose(2, 3, 1, 0)}
        if f"{prefix}.bias" in sd:
            p["bias"] = sd[f"{prefix}.bias"].numpy()
        return p

    def bnp(prefix):
        return ({"scale": sd[f"{prefix}.weight"].numpy(),
                 "bias": sd[f"{prefix}.bias"].numpy()},
                {"mean": sd[f"{prefix}.running_mean"].numpy(),
                 "var": sd[f"{prefix}.running_var"].numpy()})

    def cmod(prefix):   # ConvModule conv/bn
        p = {"conv": conv(f"{prefix}.conv")}
        bnP, bnS = bnp(f"{prefix}.bn")
        p["bn"] = bnP
        return p, {"bn": bnS}

    def dblock(prefix, n_dil):
        p, st = {}, {}
        p["conv1"] = {"conv": conv(f"{prefix}.conv1")}
        b, bs = bnp(f"{prefix}.bn1")
        p["conv1"]["bn"], st["conv1"] = b, {"bn": bs}
        if n_dil == 1:
            p["conv2_0"] = conv(f"{prefix}.conv2")
        else:
            for i in range(n_dil):
                p[f"conv2_{i}"] = conv(f"{prefix}.conv2.convs.{i}")
        b, bs = bnp(f"{prefix}.bn2")
        p["bn2"], st["bn2"] = b, bs
        p["se_fc1"] = conv(f"{prefix}.se.se.1")
        p["se_fc2"] = conv(f"{prefix}.se.se.3")
        p["conv3"] = {"conv": conv(f"{prefix}.conv3")}
        b, bs = bnp(f"{prefix}.bn3")
        p["conv3"]["bn"], st["conv3"] = b, {"bn": bs}
        if f"{prefix}.shortcut.conv.weight" in sd:
            p["shortcut"] = {"conv": conv(f"{prefix}.shortcut.conv")}
            b, bs = bnp(f"{prefix}.shortcut.bn")
            p["shortcut"]["bn"], st["shortcut"] = b, {"bn": bs}
        return p, st

    params, stats = {}, {}
    p, st = cmod("bb.stem")
    params["stem"], stats["stem"] = p, st
    p, st = dblock("bb.stage1", 1)
    params["stage1"], stats["stage1"] = p, st
    for j in range(3):
        p, st = dblock(f"bb.stage2.{j}", 1)
        params[f"stage2_{j}"], stats[f"stage2_{j}"] = p, st
    ds = [[1], [1, 2]] + 4 * [[1, 4]] + 7 * [[1, 14]]
    p, st = dblock("bb.stage3.0", 1)
    params["stage3_0"], stats["stage3_0"] = p, st
    for i, d in enumerate(ds):
        p, st = dblock(f"bb.stage3.{i + 1}", len(d))
        params[f"stage3_{i + 1}"], stats[f"stage3_{i + 1}"] = p, st

    hp, hs = {}, {}
    for ours, theirs in (("head4", "head4"), ("head8", "head8"),
                         ("head16", "head16"), ("conv8", "conv8"),
                         ("conv4", "conv4")):
        p, st = cmod(f"head.{theirs}")
        hp[ours], hs[ours] = p, st
    hp["cls"] = conv("head.cls_seg")

    model_bb = RegSegBackbone()
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    v = model_bb.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(v["params"]))
    assert not errs, errs
    feats = model_bb.apply({"params": params, "batch_stats": stats}, xs,
                           train=False)
    for got, w in zip(feats, feats_ref):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w.numpy(),
                      atol=1e-4)

    model_h = RegSegHead(num_classes=7, channels=64)
    vh = model_h.init(jax.random.PRNGKey(0), feats)
    errs = verify_tree_shapes(hp, dict(vh["params"]))
    assert not errs, errs
    got = model_h.apply({"params": hp, "batch_stats": hs}, feats,
                        train=False)
    _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_incepformer_backbone_matches_reference():
    """IncepFormer ipt_t vs /root/reference/src/models/backbones/seg/
    incep_transformer.py:16-324 — inception K/V pooling (separable strided
    dw, square dw, avg-pool+dw3), BN block norms, conv-MLP with GELU
    after every conv, and the upstream qk_scale=True quirk (`qk_scale or
    hd**-0.5` is True ⇒ attention scale is literally 1.0), replicated."""
    from src.models.backbones.seg.incep_transformer import (
        IncepTransformer as RefIPT)

    from cvpytorch_tpu.models.backbones.seg_transformers import (
        IncepTransformer)

    torch.manual_seed(0)
    ref = RefIPT(subtype="ipt_t", out_channels=[64, 128, 320, 512],
                 depths=[2, 2, 4, 2], out_stages=[1, 2, 3, 4])
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(18).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()

    def conv(prefix):
        p = {"kernel": sd[f"{prefix}.weight"].numpy().transpose(2, 3, 1, 0)}
        if f"{prefix}.bias" in sd:
            p["bias"] = sd[f"{prefix}.bias"].numpy()
        return p

    def bnp(prefix):
        return ({"scale": sd[f"{prefix}.weight"].numpy(),
                 "bias": sd[f"{prefix}.bias"].numpy()},
                {"mean": sd[f"{prefix}.running_mean"].numpy(),
                 "var": sd[f"{prefix}.running_var"].numpy()})

    params, stats = {}, {}
    depths = (2, 2, 4, 2)
    for i in range(4):
        r = i + 1
        C = (64, 128, 320, 512)[i]
        params[f"patch_embed{r}"] = conv(f"patch_embed{r}.proj")
        b, bs = bnp(f"patch_embed{r}.norm")
        params[f"embed_norm{r}"], stats[f"embed_norm{r}"] = b, bs
        b, bs = bnp(f"norm{r}")
        params[f"norm{r}"], stats[f"norm{r}"] = b, bs
        for j in range(depths[i]):
            bref = f"block{r}.{j}"
            blk, bst = {}, {}
            b, bs = bnp(f"{bref}.norm1")
            blk["norm1"], bst["norm1"] = b, bs
            b, bs = bnp(f"{bref}.norm2")
            blk["norm2"], bst["norm2"] = b, bs
            kvw = sd[f"{bref}.attn.kv.weight"].numpy()
            kvb = sd[f"{bref}.attn.kv.bias"].numpy()
            at = {
                "q": _dense(sd, f"{bref}.attn.q"),
                "kv": {"kernel": kvw.T, "bias": kvb},
                "proj": _dense(sd, f"{bref}.attn.proj"),
            }
            if f"{bref}.attn.conv1.0.weight" in sd:
                at["conv1a"] = conv(f"{bref}.attn.conv1.0")
                at["conv1b"] = conv(f"{bref}.attn.conv1.1")
                at["conv2"] = conv(f"{bref}.attn.conv2.0")
                at["dwconv"] = conv(f"{bref}.attn.dwConv.dwconv")
                at["norm"] = _ln(sd, f"{bref}.attn.norm")
            blk["attn"] = at
            blk["mlp"] = {
                "fc1": conv(f"{bref}.mlp.fc1"),
                "dwconv": conv(f"{bref}.mlp.dwconv.dwconv"),
                "fc2": conv(f"{bref}.mlp.fc2"),
            }
            params[f"block{r}_{j}"], stats[f"block{r}_{j}"] = blk, bst

    model = IncepTransformer(subtype="ipt_t", out_stages=(1, 2, 3, 4))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params, "batch_stats": stats}, xs,
                        train=False)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


def test_lspnet_matches_reference():
    """LSPNet backbone+head vs /root/reference/src/models/backbones/
    lspnet_backbone.py:13-97 + heads/lspnet_head.py:12-35 — two BaseNet
    paths at align_corners=True resized resolutions, bi-directional
    interaction after stages 2 and 3, concat 1×1 classifier."""
    from src.models.backbones.lspnet_backbone import (
        LSPNetBackbone as RefBB)
    from src.models.heads.lspnet_head import LSPNetHead as RefHead

    from cvpytorch_tpu.models.light_seg3 import LSPNet

    torch.manual_seed(0)
    bb = RefBB(resolutions=[0.75, 0.25], depths=[1, 3, 3, 10, 10],
               channels=[8, 24, 48, 96, 96])
    head = RefHead(num_classes=7, channels=[8, 24, 48, 96, 96])
    for m in (bb, head):
        _randomize_bn(m)
        m.eval()
    x = np.random.RandomState(19).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = head(bb(to_torch(x))).numpy()

    sd = {}
    for mod, pre in ((bb, "bb"), (head, "head")):
        for k, v in mod.state_dict().items():
            sd[f"{pre}.{k}"] = v

    params, stats = {}, {}
    depths = (1, 3, 3, 10, 10)
    for net in ("high_net", "low_net"):
        p, st = {}, {}
        for si, d in enumerate(depths):
            for i in range(d):
                pre = f"bb.{net}.stages.{si}.{i}"
                p[f"stage{si}_{i}"] = {
                    "conv": {"kernel": sd[f"{pre}.conv.weight"].numpy()
                             .transpose(2, 3, 1, 0)},
                    "bn": {"scale": sd[f"{pre}.bn.weight"].numpy(),
                           "bias": sd[f"{pre}.bn.bias"].numpy()}}
                st[f"stage{si}_{i}"] = {
                    "bn": {"mean": sd[f"{pre}.bn.running_mean"].numpy(),
                           "var": sd[f"{pre}.bn.running_var"].numpy()}}
        params[net], stats[net] = p, st
    params["classifier"] = {
        "kernel": sd["head.classifier.weight"].numpy()
        .transpose(2, 3, 1, 0),
        "bias": sd["head.classifier.bias"].numpy()}

    model = LSPNet(dictionary=tuple({f"c{i}": 1.0} for i in range(7)),
                   model_cfg={"TYPE": "lspnet_s"})
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs, mode="infer")
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    # compare pre-upsample logits: run infer and downres?  simpler —
    # reference head output is at the high path's resolution; our model
    # upsamples to input before argmax, so compare the classifier input
    # chain by replicating the final upsample on the reference side
    import torch.nn.functional as TF

    with torch.no_grad():
        want_up = TF.interpolate(torch.from_numpy(want), size=(64, 64),
                                 mode="bilinear",
                                 align_corners=False).numpy()
    ld, seg = model.apply({"params": params, "batch_stats": stats}, xs,
                          jnp.zeros((1, 64, 64), jnp.int32), mode="val")
    np.testing.assert_array_equal(
        np.asarray(seg)[0], want_up.argmax(1)[0])


def test_sgcpnet_matches_reference():
    """SGCPNet backbone+head vs /root/reference/src/models/backbones/
    sgcpnet_backbone.py:12-140 + heads/sgcpnet_head.py:14-202 — MBv3
    blocks (stride-1 shortcut even on channel change), double-pass
    weighted fusion head with act-free DepthwiseConvModules and BN
    momentum 0.01/eps 1e-3, classifier at P3."""
    from src.models.backbones.sgcpnet_backbone import (
        SGCPNetBackbone as RefBB)
    from src.models.heads.sgcpnet_head import SGCPNetHead as RefHead

    from cvpytorch_tpu.models.light_seg3 import SGCPNet

    torch.manual_seed(0)
    bb = RefBB("")
    head = RefHead(num_classes=7, in_channels=[24, 48, 96],
                   shrink_channels=[40, 112, 320], mid_channels=64)
    for m in (bb, head):
        _randomize_bn(m)
        m.eval()
    x = np.random.RandomState(20).rand(1, 3, 128, 128).astype(np.float32)
    with torch.no_grad():
        logits = head(bb(to_torch(x)))
        import torch.nn.functional as TF

        want = TF.interpolate(logits, size=(128, 128), mode="bilinear",
                              align_corners=False).numpy()

    sd = {}
    for mod, pre in ((bb, "bb"), (head, "head")):
        for k, v in mod.state_dict().items():
            sd[f"{pre}.{k}"] = v

    def conv(prefix):
        p = {"kernel": sd[f"{prefix}.weight"].numpy().transpose(2, 3, 1, 0)}
        if f"{prefix}.bias" in sd:
            p["bias"] = sd[f"{prefix}.bias"].numpy()
        return p

    def bnp(prefix):
        return ({"scale": sd[f"{prefix}.weight"].numpy(),
                 "bias": sd[f"{prefix}.bias"].numpy()},
                {"mean": sd[f"{prefix}.running_mean"].numpy(),
                 "var": sd[f"{prefix}.running_var"].numpy()})

    params, stats = {}, {}
    params["stem_conv"] = conv("bb.conv1.0")
    params["stem_bn"], stats["stem_bn"] = bnp("bb.conv1.1")
    stages = ((1,), (2, 2), (5, 5, 5, 5, 5), (3, 3, 3))
    for si, rows in enumerate(stages, start=1):
        for bi in range(len(rows)):
            pre = f"bb.stage{si}" if si == 1 else f"bb.stage{si}.{bi}"
            name = f"stage{si}_{bi}"
            p, st = {}, {}
            for j in (1, 2, 3):
                p[f"conv{j}"] = conv(f"{pre}.conv{j}")
                b, bs = bnp(f"{pre}.bn{j}")
                p[f"bn{j}"], st[f"bn{j}"] = b, bs
            if f"{pre}.se.se.1.weight" in sd:
                sep, ses = {}, {}
                sep["fc1"] = conv(f"{pre}.se.se.1")
                b, bs = bnp(f"{pre}.se.se.2")
                sep["bn1"], ses["bn1"] = b, bs
                sep["fc2"] = conv(f"{pre}.se.se.4")
                b, bs = bnp(f"{pre}.se.se.5")
                sep["bn2"], ses["bn2"] = b, bs
                p["se"], st["se"] = sep, ses
            if f"{pre}.shortcut.0.weight" in sd:
                p["sc_conv"] = conv(f"{pre}.shortcut.0")
                b, bs = bnp(f"{pre}.shortcut.1")
                p["sc_bn"], st["sc_bn"] = b, bs
            params[name], stats[name] = p, st
    for ours, theirs in (("shrink3", "conv3"), ("shrink4", "conv4"),
                         ("shrink5", "conv5"),
                         ("classifier", "classifier")):
        params[ours] = conv(f"head.{theirs}")
    for ours, theirs in (("p5_to_p6", "p5_to_p6"),
                         ("p3_dc", "p3_down_channel"),
                         ("p4_dc", "p4_down_channel"),
                         ("p5_dc", "p5_down_channel"),
                         ("p4_dc2", "p4_down_channel_2"),
                         ("p5_dc2", "p5_down_channel_2")):
        params[f"{ours}_conv"] = conv(f"head.{theirs}.0")
        b, bs = bnp(f"head.{theirs}.1")
        params[f"{ours}_bn"], stats[f"{ours}_bn"] = b, bs
    for ours, theirs in (
            ("conv6_up", "conv6_up"), ("conv5_up", "conv5_up"),
            ("conv4_up", "conv4_up"), ("conv3_up", "conv3_up"),
            ("conv4_down", "conv4_down"), ("conv5_down", "conv5_down"),
            ("conv6_down", "conv6_down"), ("conv7_down", "conv7_down"),
            ("conv6_up2", "conv6_up_2"), ("conv5_up2", "conv5_up_2"),
            ("conv4_up2", "conv4_up_2"), ("conv3_up2", "conv3_up_2")):
        params[f"{ours}_dw"] = conv(f"head.{theirs}.depthwise")
        b, bs = bnp(f"head.{theirs}.dwnorm")
        params[f"{ours}_dwbn"], stats[f"{ours}_dwbn"] = b, bs
        params[f"{ours}_pw"] = conv(f"head.{theirs}.pointwise")
        b, bs = bnp(f"head.{theirs}.pwnorm")
        params[f"{ours}_pwbn"], stats[f"{ours}_pwbn"] = b, bs
    for w in ("p6_w1", "p5_w1", "p4_w1", "p3_w1", "p4_w2", "p5_w2",
              "p6_w2", "p7_w2", "p6_w1_2", "p5_w1_2", "p4_w1_2",
              "p3_w1_2"):
        params[w] = sd[f"head.{w}"].numpy()

    model = SGCPNet(dictionary=tuple({f"c{i}": 1.0} for i in range(7)))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs, mode="infer")
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    ld, seg = model.apply({"params": params, "batch_stats": stats}, xs,
                          jnp.zeros((1, 128, 128), jnp.int32), mode="val")
    np.testing.assert_array_equal(np.asarray(seg)[0], want.argmax(1)[0])


def test_icnet_cff_and_ppm_match_reference():
    """ICNet's concrete pieces vs /root/reference/src/models/icnet.py:
    CascadeFeatureFusion (:42-57, align-corners upsample + dilated
    ConvBNReLU pair + relu(sum) + aux cls) and the additive
    PyramidPoolingModule (:76-89).  The full reference ICNet is
    unbuildable in its own trainer — the ctor takes ``num_classes`` only
    and the forward lacks the universal (imgs, targets, mode) contract —
    so whole-model parity is by architecture replication."""
    from src.models.icnet import CascadeFeatureFusion as RefCFF
    from src.models.icnet import PyramidPoolingModule as RefPPM

    from cvpytorch_tpu.models.light_seg2 import CascadeFusion

    torch.manual_seed(0)
    ref = RefCFF(64, 32, 48, 7)
    _randomize_bn(ref)
    ref.eval()
    rng = np.random.RandomState(21)
    low = torch.from_numpy(rng.rand(1, 64, 8, 8).astype(np.float32))
    high = torch.from_numpy(rng.rand(1, 32, 16, 16).astype(np.float32))
    with torch.no_grad():
        want_f, want_aux = ref(low, high)

    sd = ref.state_dict()

    def seq_cbn(prefix):
        return ({"conv": {"kernel": sd[f"{prefix}.0.weight"].numpy()
                          .transpose(2, 3, 1, 0)},
                 "bn": {"scale": sd[f"{prefix}.1.weight"].numpy(),
                        "bias": sd[f"{prefix}.1.bias"].numpy()}},
                {"bn": {"mean": sd[f"{prefix}.1.running_mean"].numpy(),
                        "var": sd[f"{prefix}.1.running_var"].numpy()}})

    params, stats = {}, {}
    params["low"], stats["low"] = seq_cbn("conv_low")
    params["high"], stats["high"] = seq_cbn("conv_high")
    params["low_cls"] = {"kernel": sd["conv_low_cls.weight"].numpy()
                         .transpose(2, 3, 1, 0)}

    model = CascadeFusion(48, num_classes=7)
    lo = jnp.asarray(low.numpy().transpose(0, 2, 3, 1))
    hi = jnp.asarray(high.numpy().transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), lo, hi)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    got_f, got_aux = model.apply({"params": params, "batch_stats": stats},
                                 lo, hi, train=False)
    np.testing.assert_allclose(np.asarray(got_f).transpose(0, 3, 1, 2),
                               want_f.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(got_aux).transpose(0, 3, 1, 2),
                               want_aux.numpy(), atol=5e-5)

    # PPM: additive align-corners pyramid
    from cvpytorch_tpu.models.light_seg3 import resize_align_corners

    ppm = RefPPM()
    x = torch.from_numpy(rng.rand(1, 24, 12, 12).astype(np.float32))
    with torch.no_grad():
        want = ppm(x).numpy()
    xs = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    feat = xs
    import flax.linen as fnn

    for b in (1, 2, 3, 6):
        p = fnn.avg_pool(xs, (12 // b, 12 // b),
                         strides=(12 // b, 12 // b))
        feat = feat + resize_align_corners(p, (12, 12))
    np.testing.assert_allclose(np.asarray(feat).transpose(0, 3, 1, 2),
                               want, atol=1e-5)


def test_lednet_matches_reference():
    """LEDNet Encoder+APN vs /root/reference/src/models/led_net.py:48-310
    (biased factorized SS-nbt branches with mirrored orders + channel
    shuffle, conv∥pool downsamplers with shared BN, the 1-channel 7/5/3
    APN pyramid with align-corners fusions).  The reference Decoder
    hardcodes a (512,1024) output resize, so the comparison applies the
    same final resize to 64² on both sides."""
    from src.models.led_net import APN_Module, Encoder

    from cvpytorch_tpu.models.light_seg2 import LEDNet

    torch.manual_seed(0)
    C = 7
    enc = Encoder(C)
    apn = APN_Module(in_ch=128, out_ch=C)
    for m in (enc, apn):
        _randomize_bn(m)
        m.eval()
    x = np.random.RandomState(22).rand(1, 3, 64, 64).astype(np.float32)
    import torch.nn.functional as TF

    with torch.no_grad():
        e = enc(to_torch(x))
        want = TF.interpolate(apn(e), size=(64, 64), mode="bilinear",
                              align_corners=True).numpy()

    sd = {}
    for mod, pre in ((enc, "enc"), (apn, "apn")):
        for k, v in mod.state_dict().items():
            sd[f"{pre}.{k}"] = v

    def conv(prefix):
        p = {"kernel": sd[f"{prefix}.weight"].numpy().transpose(2, 3, 1, 0)}
        if f"{prefix}.bias" in sd:
            p["bias"] = sd[f"{prefix}.bias"].numpy()
        return p

    def bnp(prefix):
        return ({"scale": sd[f"{prefix}.weight"].numpy(),
                 "bias": sd[f"{prefix}.bias"].numpy()},
                {"mean": sd[f"{prefix}.running_mean"].numpy(),
                 "var": sd[f"{prefix}.running_var"].numpy()})

    params, stats = {}, {}
    params["down1_conv"] = conv("enc.initial_block.conv")
    b, bs = bnp("enc.initial_block.bn")
    params["down1_bn"], stats["down1_bn"] = b, bs

    def ssnbt(prefix, name):
        p, st = {}, {}
        for ours, theirs in (("l1", "conv3x1_1_l"), ("l2", "conv1x3_1_l"),
                             ("l3", "conv3x1_2_l"), ("l4", "conv1x3_2_l"),
                             ("r1", "conv1x3_1_r"), ("r2", "conv3x1_1_r"),
                             ("r3", "conv1x3_2_r"), ("r4", "conv3x1_2_r")):
            p[ours] = conv(f"{prefix}.{theirs}")
        for ours, theirs in (("l_bn1", "bn1_l"), ("l_bn2", "bn2_l"),
                             ("r_bn1", "bn1_r"), ("r_bn2", "bn2_r")):
            bb_, bs_ = bnp(f"{prefix}.{theirs}")
            p[ours], st[ours] = bb_, bs_
        params[name], stats[name] = p, st

    li = 0
    for i in range(3):
        ssnbt(f"enc.layers.{li}", f"s1_{i}")
        li += 1
    params["down2_conv"] = conv(f"enc.layers.{li}.conv")
    b, bs = bnp(f"enc.layers.{li}.bn")
    params["down2_bn"], stats["down2_bn"] = b, bs
    li += 1
    for i in range(2):
        ssnbt(f"enc.layers.{li}", f"s2_{i}")
        li += 1
    params["down3_conv"] = conv(f"enc.layers.{li}.conv")
    b, bs = bnp(f"enc.layers.{li}.bn")
    params["down3_bn"], stats["down3_bn"] = b, bs
    li += 1
    for i in range(8):
        ssnbt(f"enc.layers.{li}", f"s3_{i}")
        li += 1

    for ours, theirs in (("b1", "apn.branch1.1.conv"),
                         ("mid", "apn.mid.0.conv"),
                         ("down_1", "apn.down1.conv"),
                         ("down_2", "apn.down2.conv"),
                         ("down_3a", "apn.down3.0.conv"),
                         ("down_3b", "apn.down3.1.conv"),
                         ("conv2", "apn.conv2.conv"),
                         ("conv1", "apn.conv1.conv")):
        params[f"{ours}_conv"] = conv(f"{theirs}.0")
        b, bs = bnp(f"{theirs}.1")
        params[f"{ours}_bn"], stats[f"{ours}_bn"] = b, bs

    model = LEDNet(dictionary=tuple({f"c{i}": 1.0} for i in range(C)))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs, mode="infer")
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    ld, seg = model.apply({"params": params, "batch_stats": stats}, xs,
                          jnp.zeros((1, 64, 64), jnp.int32), mode="val")
    np.testing.assert_array_equal(np.asarray(seg)[0], want.argmax(1)[0])


def test_ppliteseg_head_matches_reference():
    """PPLiteSegHead vs /root/reference/src/models/heads/
    ppliteseg_head.py:12-180: additive align-corners SPPM + 3 UAFMs
    (spatial attention over mean/max stats) + per-level classifiers.
    The reference ships NO config for this model — the demo kwargs
    (in [256,512,1024], out [32,64,128], sppm 128, sizes [1,2,4]) are
    used on both sides."""
    from src.models.heads.ppliteseg_head import PPLiteSegHead as RefHead

    import flax.linen as fnn
    import cvpytorch_tpu.models.light_seg2 as ls2
    from cvpytorch_tpu.models.light_seg2 import PPLiteSeg

    torch.manual_seed(0)
    C = 7
    ref = RefHead(num_classes=C, in_channels=[256, 512, 1024],
                  out_channels=[32, 64, 128], sppm_channel=128,
                  sizes=[1, 2, 4])
    _randomize_bn(ref)
    ref.eval()
    rng = np.random.RandomState(23)
    feats_t = [torch.from_numpy(rng.rand(1, c, s, s).astype(np.float32))
               for c, s in zip((256, 512, 1024), (16, 8, 4))]
    import torch.nn.functional as TF

    with torch.no_grad():
        outs = ref(feats_t)
        want0 = TF.interpolate(outs[0], size=(128, 128), mode="bilinear",
                               align_corners=False).numpy()

    sd = ref.state_dict()

    def seq_cbn(prefix, ci=0, bi=1):
        return ({"conv": {"kernel": sd[f"{prefix}.{ci}.weight"].numpy()
                          .transpose(2, 3, 1, 0)},
                 "bn": {"scale": sd[f"{prefix}.{bi}.weight"].numpy(),
                        "bias": sd[f"{prefix}.{bi}.bias"].numpy()}},
                {"bn": {"mean": sd[f"{prefix}.{bi}.running_mean"].numpy(),
                        "var": sd[f"{prefix}.{bi}.running_var"].numpy()}})

    params, stats = {}, {}
    for i in range(3):
        p, st = seq_cbn(f"sppm.stages.{i}", 1, 2)
        params[f"sppm{i}"], stats[f"sppm{i}"] = p, st
    p, st = seq_cbn("sppm.conv_out")
    params["sppm_out"], stats["sppm_out"] = p, st
    for i in range(3):
        u, us = {}, {}
        p, st = seq_cbn(f"uafms.{i}.proj_conv")
        u["proj"], us["proj"] = p, st
        p, st = seq_cbn(f"uafms.{i}.attention.fuse", 0, 1)
        u["sa1"], us["sa1"] = p, st
        p, st = seq_cbn(f"uafms.{i}.attention.fuse", 3, 4)
        u["sa2"], us["sa2"] = p, st
        p, st = seq_cbn(f"uafms.{i}.attention.conv_out")
        u["sa_out"], us["sa_out"] = p, st
        p, st = seq_cbn(f"uafms.{i}.conv_out")
        u["out"], us["out"] = p, st
        params[f"uafm{i}"], stats[f"uafm{i}"] = u, us
        p, st = seq_cbn(f"classifiers.{i}")
        params[f"cls{i}_conv"], stats[f"cls{i}_conv"] = p, st
        params[f"cls{i}_out"] = {
            "kernel": sd[f"classifiers.{i}.3.weight"].numpy()
            .transpose(2, 3, 1, 0)}

    class _FakeBB(fnn.Module):
        @fnn.compact
        def __call__(self, x, train=False):
            return tuple(jnp.asarray(f.numpy().transpose(0, 2, 3, 1))
                         for f in feats_t)

    orig_bb = ls2.build_backbone
    ls2.build_backbone = lambda cfg: _FakeBB()   # module-level binding
    try:
        model = PPLiteSeg(
            dictionary=tuple({f"c{i}": 1.0} for i in range(C)))
        imgs = jnp.zeros((1, 128, 128, 3))
        v = model.init(jax.random.PRNGKey(0), imgs, mode="infer")
        p = dict(v["params"])
        st = dict(v.get("batch_stats", {}))
        p.update(params)
        st.update(stats)
        ld, seg = model.apply({"params": p, "batch_stats": st}, imgs,
                              jnp.zeros((1, 128, 128), jnp.int32),
                              mode="val")
    finally:
        ls2.build_backbone = orig_bb
    np.testing.assert_array_equal(np.asarray(seg)[0], want0.argmax(1)[0])


def test_yolop_segment_head_matches_reference():
    """YOLOP SegmentHead vs /root/reference/src/models/heads/
    yolop_head.py:16-33 (Conv/BottleneckCSP/nearest-up ladder).  The
    rest of the reference YOLOP stack is unbuildable upstream:
    YOLOPNeck references ``BottleneckCSP`` it never imports
    (yolop_neck.py:17 imports only C3/Conv → NameError, verified), and
    YOLOPHead.forward calls ``self.detect_head`` whose construction is
    commented out (yolop_head.py:40 vs :36) — both documented; our YOLOP
    composes the YOLOv5 machinery per the reference's intent."""
    from src.models.heads.yolop_head import SegmentHead

    from cvpytorch_tpu.models.yolop import SegDecoder

    torch.manual_seed(0)
    ref = SegmentHead(num_classes=2)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(24).rand(1, 256, 8, 8).astype(np.float32)
    with torch.no_grad():
        want = ref(to_torch(x)).numpy()

    sd = ref.state_dict()

    def yconv(prefix):
        return ({"conv": {"kernel": sd[f"{prefix}.conv.weight"].numpy()
                          .transpose(2, 3, 1, 0)},
                 "bn": {"scale": sd[f"{prefix}.bn.weight"].numpy(),
                        "bias": sd[f"{prefix}.bn.bias"].numpy()}},
                {"bn": {"mean": sd[f"{prefix}.bn.running_mean"].numpy(),
                        "var": sd[f"{prefix}.bn.running_var"].numpy()}})

    def csp(prefix):
        p, st = {}, {}
        for nm in ("cv1", "cv4"):
            pp, ss = yconv(f"{prefix}.{nm}")
            p[nm], st[nm] = pp, ss
        for nm in ("cv2", "cv3"):
            p[nm] = {"kernel": sd[f"{prefix}.{nm}.weight"].numpy()
                     .transpose(2, 3, 1, 0)}
        pp, ss = yconv(f"{prefix}.m.0.cv1")
        p["m0_cv1"], st["m0_cv1"] = pp, ss
        pp, ss = yconv(f"{prefix}.m.0.cv2")
        p["m0_cv2"], st["m0_cv2"] = pp, ss
        b, bs = ({"scale": sd[f"{prefix}.bn.weight"].numpy(),
                  "bias": sd[f"{prefix}.bn.bias"].numpy()},
                 {"mean": sd[f"{prefix}.bn.running_mean"].numpy(),
                  "var": sd[f"{prefix}.bn.running_var"].numpy()})
        p["bn"], st["bn"] = b, bs
        return p, st

    params, stats = {}, {}
    for ours, theirs in (("c0", "segHead.0"), ("c1", "segHead.3"),
                         ("c2", "segHead.5"), ("head", "segHead.8")):
        p, st = yconv(theirs)
        params[ours], stats[ours] = p, st
    p, st = csp("segHead.2")
    params["csp0"], stats["csp0"] = p, st
    p, st = csp("segHead.6")
    params["csp1"], stats["csp1"] = p, st

    model = SegDecoder(num_classes=2)
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs, (64, 64))
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    got = model.apply({"params": params, "batch_stats": stats}, xs,
                      (64, 64), train=False)
    _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_repvgg_backbone_matches_reference():
    """RepVGG-A0 backbone vs /root/reference/src/models/backbones/
    repvgg.py:37-224 — 3×3+1×1+identity branch sum blocks, incl. the
    upstream quirk that ``last_channel = 512`` always overrides
    width_multiplier[3] for stage4."""
    from src.models.backbones.repvgg import RepVGG as RefRepVGG

    from cvpytorch_tpu.models.backbones.repvgg import RepVGG

    torch.manual_seed(0)
    ref = RefRepVGG(subtype="RepVGG_A0", out_stages=[2, 3, 4],
                    pretrained=False)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(25).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()

    def block(prefix):
        p, st = {}, {}
        p["conv3"] = {"kernel": sd[f"{prefix}.rbr_dense.0.weight"].numpy()
                      .transpose(2, 3, 1, 0)}
        p["bn3"] = {"scale": sd[f"{prefix}.rbr_dense.1.weight"].numpy(),
                    "bias": sd[f"{prefix}.rbr_dense.1.bias"].numpy()}
        st["bn3"] = {
            "mean": sd[f"{prefix}.rbr_dense.1.running_mean"].numpy(),
            "var": sd[f"{prefix}.rbr_dense.1.running_var"].numpy()}
        p["conv1"] = {"kernel": sd[f"{prefix}.rbr_1x1.0.weight"].numpy()
                      .transpose(2, 3, 1, 0)}
        p["bn1"] = {"scale": sd[f"{prefix}.rbr_1x1.1.weight"].numpy(),
                    "bias": sd[f"{prefix}.rbr_1x1.1.bias"].numpy()}
        st["bn1"] = {
            "mean": sd[f"{prefix}.rbr_1x1.1.running_mean"].numpy(),
            "var": sd[f"{prefix}.rbr_1x1.1.running_var"].numpy()}
        if f"{prefix}.rbr_identity.weight" in sd:
            p["bnid"] = {
                "scale": sd[f"{prefix}.rbr_identity.weight"].numpy(),
                "bias": sd[f"{prefix}.rbr_identity.bias"].numpy()}
            st["bnid"] = {
                "mean": sd[f"{prefix}.rbr_identity.running_mean"].numpy(),
                "var": sd[f"{prefix}.rbr_identity.running_var"].numpy()}
        return p, st

    params, stats = {}, {}
    p, st = block("stage0")
    params["stem"], stats["stem"] = p, st
    blocks = (2, 4, 14, 1)
    for si, n in enumerate(blocks, start=1):
        for j in range(n):
            p, st = block(f"stage{si}.{j}")
            params[f"stage{si}_block{j}"], stats[f"stage{si}_block{j}"] = \
                p, st

    model = RepVGG(subtype="RepVGG-A0", out_stages=(2, 3, 4))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params, "batch_stats": stats}, xs,
                        train=False)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


def test_repvgg_grouped_backbone_matches_reference():
    """RepVGG-B1g4 vs reference — the override_groups_map puts groups=4 on
    every even layer index (repvgg.py:17-19); checks the flax
    feature_group_count wiring and layer-index bookkeeping."""
    from src.models.backbones.repvgg import RepVGG as RefRepVGG

    from cvpytorch_tpu.models.backbones.repvgg import RepVGG

    torch.manual_seed(1)
    ref = RefRepVGG(subtype="RepVGG_B1g4", out_stages=[4], pretrained=False)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(26).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(to_torch(x)).numpy()

    sd = ref.state_dict()

    def block(prefix):
        p, st = {}, {}
        p["conv3"] = {"kernel": sd[f"{prefix}.rbr_dense.0.weight"].numpy()
                      .transpose(2, 3, 1, 0)}
        p["bn3"] = {"scale": sd[f"{prefix}.rbr_dense.1.weight"].numpy(),
                    "bias": sd[f"{prefix}.rbr_dense.1.bias"].numpy()}
        st["bn3"] = {
            "mean": sd[f"{prefix}.rbr_dense.1.running_mean"].numpy(),
            "var": sd[f"{prefix}.rbr_dense.1.running_var"].numpy()}
        p["conv1"] = {"kernel": sd[f"{prefix}.rbr_1x1.0.weight"].numpy()
                      .transpose(2, 3, 1, 0)}
        p["bn1"] = {"scale": sd[f"{prefix}.rbr_1x1.1.weight"].numpy(),
                    "bias": sd[f"{prefix}.rbr_1x1.1.bias"].numpy()}
        st["bn1"] = {
            "mean": sd[f"{prefix}.rbr_1x1.1.running_mean"].numpy(),
            "var": sd[f"{prefix}.rbr_1x1.1.running_var"].numpy()}
        if f"{prefix}.rbr_identity.weight" in sd:
            p["bnid"] = {
                "scale": sd[f"{prefix}.rbr_identity.weight"].numpy(),
                "bias": sd[f"{prefix}.rbr_identity.bias"].numpy()}
            st["bnid"] = {
                "mean": sd[f"{prefix}.rbr_identity.running_mean"].numpy(),
                "var": sd[f"{prefix}.rbr_identity.running_var"].numpy()}
        return p, st

    params, stats = {}, {}
    params["stem"], stats["stem"] = block("stage0")
    for si, n in enumerate((4, 6, 16, 1), start=1):
        for j in range(n):
            params[f"stage{si}_block{j}"], stats[f"stage{si}_block{j}"] = \
                block(f"stage{si}.{j}")

    model = RepVGG(subtype="RepVGG_B1g4", out_stages=(4,))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    (got,) = model.apply({"params": params, "batch_stats": stats}, xs,
                         train=False)
    _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def _randomize_convs(module, std_scale=1.0):
    """Reference VGG init_weights uses std=0.001 (vgg.py:171-179) which
    collapses deep activations to ~0; re-init kaiming so parity checks
    compare non-degenerate numerics."""
    g = torch.Generator().manual_seed(11)
    for m in module.modules():
        if isinstance(m, torch.nn.Conv2d):
            with torch.no_grad():
                fan_in = m.weight.shape[1] * m.weight.shape[2] * m.weight.shape[3]
                m.weight.copy_(torch.randn(m.weight.shape, generator=g)
                               * (2.0 / fan_in) ** 0.5 * std_scale)
                if m.bias is not None:
                    m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.05)


def _port_vgg(sd, subtype):
    """Reference VGG slices torchvision ``features`` into conv1 +
    layer1..4 (+ separate pools, vgg.py:70-155); convs sit at stride-3
    (bn) / stride-2 (plain) child offsets."""
    reps = {"vgg11": (1, 1, 2, 2, 2), "vgg13": (2, 2, 2, 2, 2),
            "vgg16": (2, 2, 3, 3, 3), "vgg19": (2, 2, 4, 4, 4)}[
                subtype.replace("_bn", "")]
    use_bn = subtype.endswith("_bn")
    step = 3 if use_bn else 2
    params, stats = {}, {}
    for si in range(5):
        prefix = "conv1" if si == 0 else f"layer{si}"
        for bi in range(reps[si]):
            ci = bi * step
            name = f"stage{si}_conv{bi}"
            p = {"conv": {
                "kernel": sd[f"{prefix}.{ci}.weight"].numpy()
                .transpose(2, 3, 1, 0),
                "bias": sd[f"{prefix}.{ci}.bias"].numpy()}}
            st = {}
            if use_bn:
                p["bn"] = {"scale": sd[f"{prefix}.{ci+1}.weight"].numpy(),
                           "bias": sd[f"{prefix}.{ci+1}.bias"].numpy()}
                st["bn"] = {
                    "mean": sd[f"{prefix}.{ci+1}.running_mean"].numpy(),
                    "var": sd[f"{prefix}.{ci+1}.running_var"].numpy()}
            params[name] = p
            if st:
                stats[name] = st
    return params, stats


@pytest.mark.parametrize("subtype,out_stages",
                         [("vgg16_bn", (2, 3, 4)), ("vgg11", (1, 4))])
def test_vgg_backbone_matches_reference(subtype, out_stages):
    """VGG vs /root/reference/src/models/backbones/vgg.py:31-196 —
    pre-pool stage capture with conv1 absorbing the first maxpool."""
    from src.models.backbones.vgg import VGG as RefVGG

    from cvpytorch_tpu.models.backbones.vgg import VGG

    torch.manual_seed(0)
    ref = RefVGG(subtype=subtype, out_stages=list(out_stages),
                 pretrained=False)
    _randomize_convs(ref)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(30).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = ref(to_torch(x))
        want = [o.numpy() for o in (want if isinstance(want, list)
                                    else [want])]

    params, stats = _port_vgg(ref.state_dict(), subtype)
    model = VGG(subtype=subtype, out_stages=out_stages)
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params, "batch_stats": stats}, xs,
                        train=False)
    assert len(feats) == len(want)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


def test_vgg_classifier_matches_reference():
    """VGG classifier head vs reference vgg.py:163-166,198-201 (7×7
    adaptive avgpool → torchvision 4096/4096/K MLP; flatten is CHW-major
    in torch so fc1 weights are permuted when porting to NHWC)."""
    from src.models.backbones.vgg import VGG as RefVGG

    from cvpytorch_tpu.models.backbones.vgg import VGG

    torch.manual_seed(0)
    ref = RefVGG(subtype="vgg11_bn", classifier=True, num_classes=10,
                 pretrained=False)
    _randomize_convs(ref)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(31).rand(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = ref(to_torch(x)).numpy()

    sd = ref.state_dict()
    params, stats = _port_vgg(sd, "vgg11_bn")
    w1 = sd["fc.0.weight"].numpy()  # (4096, 512*7*7) CHW-major
    params["fc1"] = {
        "kernel": w1.reshape(4096, 512, 7, 7).transpose(0, 2, 3, 1)
        .reshape(4096, -1).T,
        "bias": sd["fc.0.bias"].numpy()}
    params["fc2"] = _dense(sd, "fc.3")
    params["fc3"] = _dense(sd, "fc.6")

    model = VGG(subtype="vgg11_bn", classifier=True, num_classes=10)
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    got = model.apply({"params": params, "batch_stats": stats}, xs,
                      train=False)
    _allclose_rel(np.asarray(got), want, atol=1e-4)


def test_pai_efficientrep_matches_reference():
    """PAI-YOLOX backbone vs /root/reference/src/models/backbones/det/
    yolox_pai_efficient_rep.py:16-66 — RepVGG stem + 4 RepVGG stages,
    stage 4 terminated by the plain serial ReLU SPPF (kernel 5).

    Upstream quirks (documented parity):
    * ``YOLOXPAIEfficientRep('yolox_pai_s')`` — the subtype its own
      ``__main__`` uses — crashes: base_yolo_backbone.py:42 re-splits
      the subtype and ``'pai'`` is not in the size table (KeyError);
      ``'yolox_s'`` constructs the intended s-size model.
    * conf/coco_pai_yolox*.yml:65 name ``'PAI_YOLOXBackbone'`` which
      build_backbone does not accept (backbones/__init__.py:60-135) —
      the conf-named twin in backbones/pai_yolox_backbone.py is itself
      dead code (its Focus-less RepVGGBlock path is fine but nothing
      routes to it).
    """
    from src.models.backbones.det.yolox_pai_efficient_rep import (
        YOLOXPAIEfficientRep,
    )

    from cvpytorch_tpu.models.yolov6 import EfficientRep

    torch.manual_seed(3)
    ref = YOLOXPAIEfficientRep("yolox_s")  # see quirk note above
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(40).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()

    def block(prefix):
        """yolo_modules.RepVGGBlock (ConvModule children .conv/.bn)."""
        p, st = {}, {}
        p["conv3"] = {"kernel": sd[f"{prefix}.rbr_dense.conv.weight"]
                      .numpy().transpose(2, 3, 1, 0)}
        p["bn3"] = {"scale": sd[f"{prefix}.rbr_dense.bn.weight"].numpy(),
                    "bias": sd[f"{prefix}.rbr_dense.bn.bias"].numpy()}
        st["bn3"] = {
            "mean": sd[f"{prefix}.rbr_dense.bn.running_mean"].numpy(),
            "var": sd[f"{prefix}.rbr_dense.bn.running_var"].numpy()}
        p["conv1"] = {"kernel": sd[f"{prefix}.rbr_1x1.conv.weight"]
                      .numpy().transpose(2, 3, 1, 0)}
        p["bn1"] = {"scale": sd[f"{prefix}.rbr_1x1.bn.weight"].numpy(),
                    "bias": sd[f"{prefix}.rbr_1x1.bn.bias"].numpy()}
        st["bn1"] = {
            "mean": sd[f"{prefix}.rbr_1x1.bn.running_mean"].numpy(),
            "var": sd[f"{prefix}.rbr_1x1.bn.running_var"].numpy()}
        if f"{prefix}.rbr_identity.weight" in sd:
            p["bnid"] = {
                "scale": sd[f"{prefix}.rbr_identity.weight"].numpy(),
                "bias": sd[f"{prefix}.rbr_identity.bias"].numpy()}
            st["bnid"] = {
                "mean": sd[f"{prefix}.rbr_identity.running_mean"].numpy(),
                "var": sd[f"{prefix}.rbr_identity.running_var"].numpy()}
        return p, st

    def convbn(prefix):
        p = {"conv": {"kernel": sd[f"{prefix}.conv.weight"].numpy()
                      .transpose(2, 3, 1, 0)},
             "bn": {"scale": sd[f"{prefix}.bn.weight"].numpy(),
                    "bias": sd[f"{prefix}.bn.bias"].numpy()}}
        st = {"bn": {"mean": sd[f"{prefix}.bn.running_mean"].numpy(),
                     "var": sd[f"{prefix}.bn.running_var"].numpy()}}
        return p, st

    params, stats = {}, {}
    params["stem"], stats["stem"] = block("stem")
    for si, n in enumerate((2, 4, 6, 2), start=1):
        params[f"stage{si}_down"], stats[f"stage{si}_down"] = \
            block(f"stage{si}.0")
        params[f"stage{si}_conv1"], stats[f"stage{si}_conv1"] = \
            block(f"stage{si}.1")
        for j in range(n - 1):
            params[f"stage{si}_block{j}"], stats[f"stage{si}_block{j}"] = \
                block(f"stage{si}.{j + 2}")
    p1, st1 = convbn("stage4.3.conv1")
    p2, st2 = convbn("stage4.3.conv2")
    params["sppf"] = {"conv1": p1, "conv2": p2}
    stats["sppf"] = {"conv1": st1, "conv2": st2}

    model = EfficientRep(depth_mul=0.33, width_mul=0.5, sppf="relu")
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params, "batch_stats": stats}, xs,
                        train=False)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


def test_reference_cspdarknet_unbuildable_documented():
    """The reference's standalone AIRDet-style CspDarkNet
    (/root/reference/src/models/backbones/csp_darknet.py:21-67) is dead
    code upstream — recorded here so the parity ledger shows WHY there is
    no oracle test for it (same documentation pattern as YOLOv7Backbone
    and LFD):

    * Direct construction crashes: csp_darknet.py:39 calls
      ``Focus(3, ch, ksize=3, act=act)`` but yolox_modules.Focus takes
      ``act_cfg`` (and its body references an undefined name ``act``,
      yolox_modules.py:141) → TypeError.
    * conf/det/yolox/coco_yolox_{n,s}.yml:66 pass ``depthwise`` which
      ``CspDarkNet.__init__`` does not accept → TypeError via
      build_backbone's ``**cfg``.
    * conf/coco_airdet.yml:65 names ``'CspDarkNet'`` while
      build_backbone matches ``'CSPDarknet'``
      (backbones/__init__.py:111-112) → NotImplementedError.

    Our AIRDet therefore uses the repo's oracle-tested CSPDarknet family
    (YOLOv5CSPDarknet); the YOLOX confs map to the oracle-tested
    YOLOXCSPDarknet chain."""
    from src.models.backbones.csp_darknet import CspDarkNet

    with pytest.raises(TypeError):
        CspDarkNet(subtype="cspdark_s", out_stages=[2, 3, 4],
                   depth_mul=0.33, width_mul=0.5)


def test_resnext_backbone_matches_reference():
    """ResNeXt-50 32×4d vs /root/reference/src/models/backbones/
    resnext.py:18-80 — grouped 3×3 bottlenecks (width = planes·4/64·32),
    torchvision child slicing identical to the ResNet wrapper."""
    from src.models.backbones.resnext import ResNeXt as RefResNeXt

    from cvpytorch_tpu.models.backbones.resnet import ResNet
    from cvpytorch_tpu.utils.porting import RESNET_WRAPPER_RULES

    torch.manual_seed(0)
    ref = RefResNeXt(subtype="resnext50_32x4d", out_stages=[2, 3, 4],
                     pretrained=False)
    _randomize_bn(ref)
    ref.eval()

    x = np.random.RandomState(41).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = {k: v for k, v in ref.state_dict().items()
          if not k.startswith(("avgpool", "fc"))}
    ported = port_state_dict(sd, RESNET_WRAPPER_RULES, strict=True)

    model = ResNet(subtype="resnext50_32x4d", out_stages=(2, 3, 4))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    feats = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        xs, train=False)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=3e-4)


def test_wide_resnet_reference_is_resnext_documented():
    """Upstream quirk (documented parity): the reference's WideResNet
    (/root/reference/src/models/backbones/wide_resnet.py:10,31-36)
    constructs **resnext50_32x4d / resnext101_32x8d**, not torchvision's
    wide_resnet50_2/101_2 — a copy-paste bug, so the reference has no
    actual wide-ResNet numerics to test against.  Our
    ``ResNet(subtype='wide_resnet50_2')`` implements the intended
    architecture (base_width 128); this test (a) records the upstream
    bug by asserting the reference WideResNet's state dict is exactly
    the ResNeXt one (grouped 3×3 ⇒ width 128 @ layer1 with 4-channel
    group fan-in), and (b) shape-checks our true wide variant (layer1
    3×3 convs are 128-wide with FULL 128-channel fan-in)."""
    from src.models.backbones.wide_resnet import WideResNet as RefWide

    from cvpytorch_tpu.models.backbones.resnet import ResNet

    torch.manual_seed(0)
    ref = RefWide(subtype="wide_resnet50_2", pretrained=False)
    w = ref.state_dict()["layer1.0.0.conv2.weight"]
    # resnext50_32x4d layer1 conv2: (128, 4, 3, 3) — grouped; a true
    # wide_resnet50_2 would be (128, 128, 3, 3)
    assert tuple(w.shape) == (128, 4, 3, 3), tuple(w.shape)

    model = ResNet(subtype="wide_resnet50_2", out_stages=(2, 3, 4))
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3)
                    .astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    k = variables["params"]["layer1_block0"]["conv2"]["kernel"]
    assert k.shape == (3, 3, 128, 128), k.shape
    feats = model.apply(variables, x, train=False)
    assert [f.shape for f in feats] == [(1, 8, 8, 512), (1, 4, 4, 1024),
                                        (1, 2, 2, 2048)]


def test_squeezenet_backbone_matches_reference():
    """SqueezeNet 1.1 vs /root/reference/src/models/backbones/
    squeezenet.py:30-76 — VALID-padded stem conv, ceil-mode maxpool at
    each layer start, Fire stacks.  Upstream quirks recorded in the
    backbone docstring (stale 1_0 out_channels metadata; classifier-mode
    fc applied after layer1 → shape crash) are asserted here."""
    from src.models.backbones.squeezenet import SqueezeNet as RefSqueeze

    from cvpytorch_tpu.models.backbones.misc_backbones import SqueezeNet

    torch.manual_seed(0)
    ref = RefSqueeze(subtype="squeezenet1_1", out_stages=[1, 2, 3],
                     pretrained=False)
    _randomize_convs(ref)
    ref.eval()
    x = np.random.RandomState(50).rand(1, 3, 127, 127).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()
    fire_children = {1: 2, 2: 2, 3: 4}

    def fire(prefix):
        def conv(name):
            return {"kernel": sd[f"{prefix}.{name}.weight"].numpy()
                    .transpose(2, 3, 1, 0),
                    "bias": sd[f"{prefix}.{name}.bias"].numpy()}
        return {"squeeze": conv("squeeze"), "e1": conv("expand1x1"),
                "e3": conv("expand3x3")}

    params = {"stem": {"kernel": sd["stem.0.weight"].numpy()
                       .transpose(2, 3, 1, 0),
                       "bias": sd["stem.0.bias"].numpy()}}
    for si, n in fire_children.items():
        for j in range(n):
            # layer Sequential child 0 is the maxpool; fires start at 1
            params[f"layer{si}_fire{j}"] = fire(f"layer{si}.{j + 1}")

    model = SqueezeNet(subtype="squeezenet1_1", out_stages=(1, 2, 3))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params}, xs, train=False)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)

    # documented upstream breakage: classifier mode crashes at
    # CONSTRUCTION — squeezenet.py:46 does
    # ``nn.Linear(self.fc[1].in_features, …)`` but fc[1] is the 1×1
    # classifier Conv2d, which has no ``in_features``
    with pytest.raises(AttributeError):
        RefSqueeze(subtype="squeezenet1_1", classifier=True,
                   num_classes=10, pretrained=False)


@pytest.mark.parametrize("subtype,out_stages", [
    ("mobilenet_v3_small", (3, 4, 5)),
    ("mobilenet_v3_large", (2, 4, 6)),
])
def test_mobilenet_v3_backbone_matches_reference(subtype, out_stages):
    """MobileNetV3 vs /root/reference/src/models/backbones/
    mobilenet_v3.py:20-115 — torchvision feature slicing into wrapper
    stages, SE squeeze widths make_divisible(expand//4, 8), and the
    init_weights BN override (eps 1e-5 / momentum 0.1) that always
    applies in a zero-egress world (pretrained weights unavailable)."""
    from src.models.backbones.mobilenet_v3 import MobileNetV3 as RefMBV3

    from cvpytorch_tpu.models.backbones.mobilenetv3 import (
        _LARGE, _LARGE_STAGES, _SMALL, _SMALL_STAGES, MobileNetV3,
    )

    torch.manual_seed(0)
    ref = RefMBV3(subtype=subtype, out_stages=list(out_stages),
                  pretrained=False)
    _randomize_convs(ref)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(60).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()
    small = "small" in subtype
    cfgs = _SMALL if small else _LARGE
    stages = _SMALL_STAGES if small else _LARGE_STAGES

    def cba(prefix, has_bias=False):
        p = {"conv": {"kernel": sd[f"{prefix}.0.weight"].numpy()
                      .transpose(2, 3, 1, 0)},
             "bn": {"scale": sd[f"{prefix}.1.weight"].numpy(),
                    "bias": sd[f"{prefix}.1.bias"].numpy()}}
        st = {"bn": {"mean": sd[f"{prefix}.1.running_mean"].numpy(),
                     "var": sd[f"{prefix}.1.running_var"].numpy()}}
        return p, st

    params, stats = {}, {}
    params["stem"], stats["stem"] = cba("stem.0")
    in_ch = 16
    for si, blocks in enumerate(stages, start=1):
        for j, i in enumerate(blocks):
            k, e, c, se, act, s = cfgs[i]
            pre = f"stage{si}.{j}.block"
            bi = 0
            p, st = {}, {}
            if e != in_ch:
                p["expand"], st["expand"] = cba(f"{pre}.{bi}")
                bi += 1
            p["dw"], st["dw"] = cba(f"{pre}.{bi}")
            bi += 1
            if se:
                p["se"] = {
                    "fc1": {"kernel": sd[f"{pre}.{bi}.fc1.weight"].numpy()
                            .transpose(2, 3, 1, 0),
                            "bias": sd[f"{pre}.{bi}.fc1.bias"].numpy()},
                    "fc2": {"kernel": sd[f"{pre}.{bi}.fc2.weight"].numpy()
                            .transpose(2, 3, 1, 0),
                            "bias": sd[f"{pre}.{bi}.fc2.bias"].numpy()}}
                bi += 1
            p["project"], st["project"] = cba(f"{pre}.{bi}")
            params[f"block{i}"], stats[f"block{i}"] = p, st
            in_ch = c

    model = MobileNetV3(subtype=subtype, out_stages=out_stages)
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params, "batch_stats": stats}, xs,
                        train=False)
    assert len(feats) == len(want)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


def test_convnext_backbone_matches_reference():
    """ConvNeXt-tiny vs /root/reference/src/models/backbones/
    convnext.py:20-96 — dw7×7 + LN + 4× MLP blocks with layer-scale,
    LN+2×2-conv downsamples, torchvision feature slicing (stage1 is the
    first block stack, no downsample)."""
    from src.models.backbones.convnext import ConvNeXt as RefConvNeXt

    from cvpytorch_tpu.models.backbones.convnext import ConvNeXt

    torch.manual_seed(0)
    ref = RefConvNeXt(subtype="convnext_tiny", out_stages=[1, 2, 3, 4],
                      pretrained=False)
    ref.eval()
    x = np.random.RandomState(70).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()
    depths, dims = (3, 3, 9, 3), (96, 192, 384, 768)
    # wrapper children: stem=features[0]; stage1=blocks; stageK≥2 =
    # Sequential(downsample, blocks) → keys stageK.0.* / stageK.1.*
    params = {
        "stem_conv": {"kernel": sd["stem.0.weight"].numpy()
                      .transpose(2, 3, 1, 0),
                      "bias": sd["stem.0.bias"].numpy()},
        "stem_norm": {"scale": sd["stem.1.weight"].numpy(),
                      "bias": sd["stem.1.bias"].numpy()},
    }

    def cnblock(prefix, dim):
        return {
            "dwconv": {"kernel": sd[f"{prefix}.block.0.weight"].numpy()
                       .transpose(2, 3, 1, 0),
                       "bias": sd[f"{prefix}.block.0.bias"].numpy()},
            "norm": {"scale": sd[f"{prefix}.block.2.weight"].numpy(),
                     "bias": sd[f"{prefix}.block.2.bias"].numpy()},
            "pw1": {"kernel": sd[f"{prefix}.block.3.weight"].numpy().T,
                    "bias": sd[f"{prefix}.block.3.bias"].numpy()},
            "pw2": {"kernel": sd[f"{prefix}.block.5.weight"].numpy().T,
                    "bias": sd[f"{prefix}.block.5.bias"].numpy()},
            "gamma": sd[f"{prefix}.layer_scale"].numpy().reshape(dim),
        }

    for si, (d, dim) in enumerate(zip(depths, dims), start=1):
        for j in range(d):
            pre = (f"stage1.{j}" if si == 1 else f"stage{si}.1.{j}")
            params[f"stage{si}_block{j}"] = cnblock(pre, dim)
        if si > 1:
            params[f"down{si}_norm"] = {
                "scale": sd[f"stage{si}.0.0.weight"].numpy(),
                "bias": sd[f"stage{si}.0.0.bias"].numpy()}
            params[f"down{si}_conv"] = {
                "kernel": sd[f"stage{si}.0.1.weight"].numpy()
                .transpose(2, 3, 1, 0),
                "bias": sd[f"stage{si}.0.1.bias"].numpy()}

    model = ConvNeXt(subtype="convnext_tiny", out_stages=(1, 2, 3, 4))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params}, xs, train=False)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


@pytest.mark.parametrize("subtype", ["regnet_y_400mf", "regnet_x_800mf"])
def test_regnet_backbone_matches_reference(subtype):
    """RegNet X/Y vs /root/reference/src/models/backbones/regnet.py:19-106
    — torchvision trunk_output.block1..4 stage slicing; Y blocks carry
    SE(round(w_in/4)) between group conv and projection.  Upstream quirk
    (documented): classifier mode reads ``self.last_conv`` which the
    wrapper never sets (regnet.py:100) → AttributeError."""
    from src.models.backbones.regnet import RegNet as RefRegNet

    from cvpytorch_tpu.models.backbones.regnet import _SPECS, RegNet

    torch.manual_seed(0)
    ref = RefRegNet(subtype=subtype, out_stages=[1, 2, 3, 4],
                    pretrained=False)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(80).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()
    depths, widths, gw, se = _SPECS[subtype]

    def cna(prefix):
        p = {"conv": {"kernel": sd[f"{prefix}.0.weight"].numpy()
                      .transpose(2, 3, 1, 0)},
             "bn": {"scale": sd[f"{prefix}.1.weight"].numpy(),
                    "bias": sd[f"{prefix}.1.bias"].numpy()}}
        st = {"bn": {"mean": sd[f"{prefix}.1.running_mean"].numpy(),
                     "var": sd[f"{prefix}.1.running_var"].numpy()}}
        return p, st

    params, stats = {}, {}
    params["stem"], stats["stem"] = cna("stem")
    for si, d in enumerate(depths, start=1):
        for bi in range(d):
            pre = f"stage{si}.block{si}-{bi}"
            p, st = {}, {}
            p["a"], st["a"] = cna(f"{pre}.f.a")
            p["b"], st["b"] = cna(f"{pre}.f.b")
            if se:
                p["se"] = {
                    "fc1": {"kernel": sd[f"{pre}.f.se.fc1.weight"].numpy()
                            .transpose(2, 3, 1, 0),
                            "bias": sd[f"{pre}.f.se.fc1.bias"].numpy()},
                    "fc2": {"kernel": sd[f"{pre}.f.se.fc2.weight"].numpy()
                            .transpose(2, 3, 1, 0),
                            "bias": sd[f"{pre}.f.se.fc2.bias"].numpy()}}
            p["c"], st["c"] = cna(f"{pre}.f.c")
            if f"{pre}.proj.0.weight" in sd:
                p["proj"], st["proj"] = cna(f"{pre}.proj")
            params[f"stage{si}_block{bi}"] = p
            stats[f"stage{si}_block{bi}"] = st

    model = RegNet(subtype=subtype, out_stages=(1, 2, 3, 4))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params, "batch_stats": stats}, xs,
                        train=False)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)

    # documented upstream breakage: classifier reads unset self.last_conv
    refc = RefRegNet(subtype=subtype, classifier=True, num_classes=10,
                     pretrained=False)
    refc.eval()
    with pytest.raises((AttributeError, torch.nn.modules.module.ModuleAttributeError
                        if hasattr(torch.nn.modules.module, "ModuleAttributeError")
                        else AttributeError)):
        with torch.no_grad():
            refc(to_torch(x))


@pytest.mark.parametrize("subtype", ["efficientnet_b0", "efficientnet_b2"])
def test_efficientnet_backbone_matches_reference(subtype):
    """EfficientNet vs /root/reference/src/models/backbones/
    efficientnet.py:20-120 — torchvision features[1..7] bound to
    stage1..7; MBConv SE squeeze = max(1, block_input//4) on the expanded
    map; BN eps 1e-5.  b2 exercises make_divisible width scaling."""
    from src.models.backbones.efficientnet import EfficientNet as RefEff

    from cvpytorch_tpu.models.backbones.efficientnet import (
        _BASE, _SCALING, EfficientNet,
    )

    torch.manual_seed(0)
    ref = RefEff(subtype=subtype, out_stages=[3, 5, 7], pretrained=False)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(90).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()
    import math as _math

    from cvpytorch_tpu.models.bricks import make_divisible
    wm, dm, _ = _SCALING[subtype]

    def cna(prefix):
        p = {"conv": {"kernel": sd[f"{prefix}.0.weight"].numpy()
                      .transpose(2, 3, 1, 0)},
             "bn": {"scale": sd[f"{prefix}.1.weight"].numpy(),
                    "bias": sd[f"{prefix}.1.bias"].numpy()}}
        st = {"bn": {"mean": sd[f"{prefix}.1.running_mean"].numpy(),
                     "var": sd[f"{prefix}.1.running_var"].numpy()}}
        return p, st

    params, stats = {}, {}
    params["stem"], stats["stem"] = cna("stem")  # features[0] bound direct
    in_ch = make_divisible(32 * wm)
    for gi, (e, c, r, s, k) in enumerate(_BASE, start=1):
        out_ch = make_divisible(c * wm)
        reps = int(_math.ceil(r * dm))
        for j in range(reps):
            pre = f"stage{gi}.{j}.block"
            hidden = make_divisible(in_ch * e)
            bi = 0
            p, st = {}, {}
            if hidden != in_ch:
                p["expand"], st["expand"] = cna(f"{pre}.{bi}")
                bi += 1
            p["dw"], st["dw"] = cna(f"{pre}.{bi}")
            bi += 1
            p["se"] = {
                "fc1": {"kernel": sd[f"{pre}.{bi}.fc1.weight"].numpy()
                        .transpose(2, 3, 1, 0),
                        "bias": sd[f"{pre}.{bi}.fc1.bias"].numpy()},
                "fc2": {"kernel": sd[f"{pre}.{bi}.fc2.weight"].numpy()
                        .transpose(2, 3, 1, 0),
                        "bias": sd[f"{pre}.{bi}.fc2.bias"].numpy()}}
            bi += 1
            p["project"], st["project"] = cna(f"{pre}.{bi}")
            params[f"stage{gi}_block{j}"], stats[f"stage{gi}_block{j}"] = \
                p, st
            in_ch = out_ch

    model = EfficientNet(subtype=subtype, out_stages=(3, 5, 7))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params, "batch_stats": stats}, xs,
                        train=False)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


def test_custom_cspnet_matches_reference():
    """CustomCspNet (NanoDet-g backbone) vs /root/reference/src/models/
    backbones/custom_cspnet.py:19-107 — Conv s2 / MaxPool(3,2,p1) /
    4 CspBlocks whose concat doubles channels; ConvModule LeakyReLU
    slope 0.1 (modules/activations.py:58)."""
    from src.models.backbones.custom_cspnet import CustomCspNet as RefCsp

    from cvpytorch_tpu.models.backbones.custom_cspnet import CustomCspNet

    torch.manual_seed(0)
    ref = RefCsp(subtype="cspnet", out_stages=[2, 3, 4], pretrained=False)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(91).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()

    def cm(prefix):
        return _conv_bn(sd, prefix)

    params, stats = {}, {}
    params["stage0"], stats["stage0"] = cm("stages.0")
    for gi, num_res in zip((2, 3, 4, 5), (1, 2, 2, 3)):
        p, st = {}, {}
        p["in_conv"], st["in_conv"] = cm(f"stages.{gi}.in_conv")
        for j in range(num_res):
            rp, rs = {}, {}
            rp["in_conv"], rs["in_conv"] = cm(
                f"stages.{gi}.res_blocks.{j}.in_conv")
            rp["mid_conv"], rs["mid_conv"] = cm(
                f"stages.{gi}.res_blocks.{j}.mid_conv")
            p[f"res{j}"], st[f"res{j}"] = rp, rs
        p["res_out"], st["res_out"] = cm(f"stages.{gi}.res_out_conv")
        params[f"stage{gi}"], stats[f"stage{gi}"] = p, st

    model = CustomCspNet(out_stages=(2, 3, 4))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params, "batch_stats": stats}, xs,
                        train=False)
    assert len(feats) == len(want)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


@pytest.mark.parametrize("subtype", ["efficientnet_lite0",
                                     "efficientnet_lite2"])
def test_efficientnet_lite_matches_reference(subtype):
    """EfficientNet-Lite vs /root/reference/src/models/backbones/
    efficientnet_lite.py:67-231 — SE-free MBConv (has_se=False always),
    ReLU6, BN momentum 0.01/eps 1e-3, no width-scaling of stage0 input
    or depth-scaling of first/last stages.  lite2 exercises
    round_filters."""
    from src.models.backbones.efficientnet_lite import (
        EfficientNetLite as RefLite,
        round_filters,
        round_repeats,
    )

    from cvpytorch_tpu.models.backbones.efficientnet_lite import (
        _PARAMS, _STAGES, EfficientNetLite,
    )

    torch.manual_seed(0)
    ref = RefLite(subtype=subtype, out_stages=[2, 4, 6], pretrained=False)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(92).rand(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o.numpy() for o in ref(to_torch(x))]

    sd = ref.state_dict()

    def convbn(cprefix, bprefix):
        p = {"conv": {"kernel": sd[f"{cprefix}.weight"].numpy()
                      .transpose(2, 3, 1, 0)},
             "bn": {"scale": sd[f"{bprefix}.weight"].numpy(),
                    "bias": sd[f"{bprefix}.bias"].numpy()}}
        st = {"bn": {"mean": sd[f"{bprefix}.running_mean"].numpy(),
                     "var": sd[f"{bprefix}.running_var"].numpy()}}
        return p, st

    wm, dm = _PARAMS[subtype]
    params, stats = {}, {}
    params["stem"], stats["stem"] = convbn("stem.0", "stem.1")
    for i, (rep, k, s, e, cin, cout) in enumerate(_STAGES):
        rep = rep if i in (0, len(_STAGES) - 1) else round_repeats(rep, dm)
        for j in range(rep):
            pre = f"blocks.{i}.{j}"
            p, st = {}, {}
            if e != 1:
                p["expand"], st["expand"] = convbn(
                    f"{pre}._expand_conv", f"{pre}._bn0")
            p["dw"], st["dw"] = convbn(
                f"{pre}._depthwise_conv", f"{pre}._bn1")
            p["project"], st["project"] = convbn(
                f"{pre}._project_conv", f"{pre}._bn2")
            params[f"stage{i}_block{j}"] = p
            stats[f"stage{i}_block{j}"] = st

    model = EfficientNetLite(subtype=subtype, out_stages=(2, 4, 6))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params, "batch_stats": stats}, xs,
                        train=False)
    assert len(feats) == len(want)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


@pytest.mark.parametrize("subtype", ["densenet121", "densenet161"])
def test_densenet_backbone_matches_reference(subtype):
    """DenseNet vs /root/reference/src/models/backbones/densenet.py:17-91
    — layerN = denseblockN+transitionN so stage feats are POST-transition;
    layer4 = denseblock4 alone (NO torchvision norm5/ReLU).  Upstream
    quirk (documented below): the wrapper hardcodes pretrained=True
    (densenet.py:27-38) then calls self.load_pretrained_weights() which
    the class never defines, so construction always raises — numerics are
    held against the torchvision-layout oracle sliced the same way."""
    from src.models.backbones.densenet import Densenet as RefDense

    from cvpytorch_tpu.models.backbones.misc_backbones import DenseNet
    from tests.oracle_models import _DENSE_CFGS, TVDenseNet

    with pytest.raises(AttributeError):
        RefDense(subtype=subtype)

    torch.manual_seed(0)
    growth, init_ch, reps = _DENSE_CFGS[subtype]
    tv = TVDenseNet(growth, init_ch, reps)
    _randomize_bn(tv)
    tv.eval()
    x = np.random.RandomState(93).rand(1, 3, 64, 64).astype(np.float32)
    f = tv.features
    with torch.no_grad():
        h = f.pool0(f.relu0(f.norm0(f.conv0(to_torch(x)))))
        h = f.transition1(f.denseblock1(h))          # layer1
        h2 = f.transition2(f.denseblock2(h))         # layer2
        h3 = f.transition3(f.denseblock3(h2))        # layer3
        h4 = f.denseblock4(h3)                       # layer4 (no norm5)
        want = [t.numpy() for t in (h2, h3, h4)]

    sd = tv.state_dict()

    def bn(prefix):
        return ({"scale": sd[f"{prefix}.weight"].numpy(),
                 "bias": sd[f"{prefix}.bias"].numpy()},
                {"mean": sd[f"{prefix}.running_mean"].numpy(),
                 "var": sd[f"{prefix}.running_var"].numpy()})

    def conv(prefix):
        return {"kernel": sd[f"{prefix}.weight"].numpy()
                .transpose(2, 3, 1, 0)}

    params, stats = {}, {}
    sp, ss = bn("features.norm0")
    params["stem"] = {"conv": conv("features.conv0"), "bn": sp}
    stats["stem"] = {"bn": ss}
    for si, n in enumerate(reps, start=1):
        for j in range(n):
            pre = f"features.denseblock{si}.denselayer{j + 1}"
            b1p, b1s = bn(f"{pre}.norm1")
            b2p, b2s = bn(f"{pre}.norm2")
            params[f"dense{si}_{j}"] = {
                "bn1": b1p, "conv1": conv(f"{pre}.conv1"),
                "bn2": b2p, "conv2": conv(f"{pre}.conv2")}
            stats[f"dense{si}_{j}"] = {"bn1": b1s, "bn2": b2s}
        if si < len(reps):
            tp, ts = bn(f"features.transition{si}.norm")
            params[f"trans{si}_bn"] = tp
            stats[f"trans{si}_bn"] = ts
            params[f"trans{si}_conv"] = conv(f"features.transition{si}.conv")

    model = DenseNet(subtype=subtype, out_stages=(2, 3, 4))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    feats = model.apply({"params": params, "batch_stats": stats}, xs,
                        train=False)
    assert len(feats) == len(want)
    for got, w in zip(feats, want):
        _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), w, atol=1e-4)


@pytest.mark.parametrize("subtype", ["vit_b_32"])
def test_vit_backbone_matches_reference(subtype):
    """ViT vs /root/reference/src/models/backbones/vision_transformer.py:
    20-114 — conv patchify → cls-token concat → pos-embed (on the full
    sequence incl. cls) → pre-LN encoder blocks → final LN → head on
    token 0.  classifier=False crashes upstream (self.heads unset,
    vision_transformer.py:112) so the classifier path is the testable
    surface."""
    from src.models.backbones.vision_transformer import (
        VisionTransformer as RefViT,
    )

    from cvpytorch_tpu.models.backbones.misc_backbones import ViT

    torch.manual_seed(0)
    num_classes = 13
    ref = RefViT(subtype=subtype, classifier=True, num_classes=num_classes,
                 pretrained=False)
    ref.eval()
    x = np.random.RandomState(94).rand(1, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        want = ref(to_torch(x)).numpy()

    sd = ref.state_dict()
    dim, depth, heads = {"vit_b_16": (768, 12, 12),
                         "vit_b_32": (768, 12, 12)}[subtype]

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].numpy().T,
                "bias": sd[f"{prefix}.bias"].numpy()}

    params = {
        "patch_embed": {"kernel": sd["vit.conv_proj.weight"].numpy()
                        .transpose(2, 3, 1, 0),
                        "bias": sd["vit.conv_proj.bias"].numpy()},
        "cls_token": sd["vit.class_token"].numpy(),
        "pos_embed": sd["vit.encoder.pos_embedding"].numpy(),
        "final_ln": _ln(sd, "vit.encoder.ln"),
        "fc": lin("heads.head"),
    }
    for i in range(depth):
        pre = f"vit.encoder.layers.encoder_layer_{i}"
        params[f"ln1_{i}"] = _ln(sd, f"{pre}.ln_1")
        params[f"attn_{i}"] = _port_mha(sd, f"{pre}.self_attention", heads)
        params[f"ln2_{i}"] = _ln(sd, f"{pre}.ln_2")
        params[f"mlp1_{i}"] = lin(f"{pre}.mlp.0")
        params[f"mlp2_{i}"] = lin(f"{pre}.mlp.3")

    model = ViT(subtype=subtype, classifier=True, num_classes=num_classes)
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, xs)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    got = model.apply({"params": params}, xs, train=False)
    _allclose_rel(np.asarray(got), want, atol=2e-4)


@pytest.mark.parametrize("is_concat", [True, False])
def test_fcn_head_matches_reference(is_concat):
    """FCNHead vs /root/reference/src/models/heads/seg/fcn_head.py:14-64
    — conv stack then (is_concat) conv_cat over cat([input, feats]);
    classify = dropout + 1x1 conv_seg (base_seg_head.py:32-37)."""
    from src.models.heads.seg.fcn_head import FCNHead as RefHead

    from cvpytorch_tpu.models.heads.seg_heads import FCNHead

    torch.manual_seed(0)
    ref = RefHead(num_classes=7, in_channels=48, channels=32, num_convs=2,
                  is_concat=is_concat)
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(95).rand(2, 48, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(to_torch(x)).numpy()

    sd = ref.state_dict()
    params, stats = {}, {}
    for i in range(2):
        params[f"conv{i}"], stats[f"conv{i}"] = _conv_bn(sd, f"convs.{i}")
    if is_concat:
        params["conv_cat"], stats["conv_cat"] = _conv_bn(sd, "conv_cat")
    params["cls"] = {"kernel": sd["cls_seg.weight"].numpy()
                     .transpose(2, 3, 1, 0),
                     "bias": sd["cls_seg.bias"].numpy()}

    head = FCNHead(num_classes=7, channels=32, num_convs=2,
                   is_concat=is_concat)
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = head.init({"params": jax.random.PRNGKey(0)}, (xs,))
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    got = head.apply({"params": params, "batch_stats": stats}, (xs,),
                     train=False)
    _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_deeplabv3_head_matches_reference():
    """Deeplabv3Head (non-plus ASPP) vs /root/reference/src/models/heads/
    seg/deeplabv3_head.py:49-79 — global-pool proj branch (bilinear
    re-expanded, align_corners=False) + dense dilated ASPP + 3x3 reduce +
    classify."""
    from src.models.heads.seg.deeplabv3_head import Deeplabv3Head as RefHead

    from cvpytorch_tpu.models.heads.seg_heads import Deeplabv3Head

    torch.manual_seed(0)
    ref = RefHead(num_classes=7, in_channels=64, channels=32,
                  dilations=(1, 6, 12, 18))
    _randomize_bn(ref)
    ref.eval()
    x = np.random.RandomState(96).rand(2, 64, 16, 16).astype(np.float32)
    with torch.no_grad():
        want = ref(to_torch(x)).numpy()

    sd = ref.state_dict()
    params, stats = {}, {}
    params["proj"], stats["proj"] = _conv_bn(sd, "proj.1")
    for i in range(4):
        params[f"aspp{i}"], stats[f"aspp{i}"] = _conv_bn(sd, f"aspp.{i}")
    params["reduce"], stats["reduce"] = _conv_bn(sd, "reduce")
    params["cls"] = {"kernel": sd["cls_seg.weight"].numpy()
                     .transpose(2, 3, 1, 0),
                     "bias": sd["cls_seg.bias"].numpy()}

    head = Deeplabv3Head(num_classes=7, channels=32,
                         dilations=(1, 6, 12, 18))
    xs = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = head.init({"params": jax.random.PRNGKey(0)}, (xs,))
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    got = head.apply({"params": params, "batch_stats": stats}, (xs,),
                     train=False)
    _allclose_rel(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-4)


def test_pan_neck_matches_reference():
    """NanoDet v1 PAN vs /root/reference/src/models/necks/pan.py:17-56 +
    fpn.py:20-49 — bias/norm/act-free 1x1 laterals, additive top-down
    bilinear, additive bottom-up bilinear DOWNSAMPLE (pan.py:46-48); the
    inherited 3x3 fpn_convs are never used in PAN.forward."""
    from src.models.necks.pan import PAN as RefPAN

    from cvpytorch_tpu.models.necks.pan import PAN

    torch.manual_seed(0)
    ref = RefPAN(in_channels=[16, 32, 64], out_channels=24)
    ref.eval()
    rs = np.random.RandomState(97)
    feats_t = [torch.from_numpy(rs.rand(2, c, s, s).astype(np.float32))
               for c, s in zip((16, 32, 64), (16, 8, 4))]
    with torch.no_grad():
        want = [o.numpy() for o in ref(feats_t)]

    sd = ref.state_dict()
    params = {f"lateral{i}": {"kernel": sd[f"lateral_convs.{i}.conv.weight"]
                              .numpy().transpose(2, 3, 1, 0)}
              for i in range(3)}

    neck = PAN(out_channels=24)
    feats = tuple(jnp.asarray(f.numpy().transpose(0, 2, 3, 1))
                  for f in feats_t)
    variables = neck.init({"params": jax.random.PRNGKey(0)}, feats)
    errs = verify_tree_shapes(params, dict(variables["params"]))
    assert not errs, errs
    got = neck.apply({"params": params}, feats, train=False)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        _allclose_rel(np.asarray(g).transpose(0, 3, 1, 2), w, atol=1e-5)


def test_atss_assigner_matches_reference():
    """ATSS vs /root/reference/src/models/assigners/atss.py:19-174 —
    per-level distance top-k candidates, mean + SAMPLE-std IoU
    threshold, center-in-gt (>0.01), max-IoU tie-break.  Driven exactly
    like GFLHead.target_assign_single_img (gfl_head.py:452-471): cells
    are octave_base_scale*stride squares around (i+0.5)*stride centers."""
    from src.models.assigners.atss import ATSS as RefATSS

    from cvpytorch_tpu.models.assigners.atss_assigner import atss_assign
    from cvpytorch_tpu.models.heads.nanodet_head import center_priors_v1

    strides = (8, 16, 32)
    sizes = [(64 // s, 64 // s) for s in strides]
    nlp = tuple(h * w for h, w in sizes)
    priors = np.asarray(center_priors_v1(sizes, strides))
    scale = 5
    half = 0.5 * scale * priors[:, 2]
    cells = np.stack([priors[:, 0] - half, priors[:, 1] - half,
                      priors[:, 0] + half, priors[:, 1] + half], -1)

    ref = RefATSS(topk=9)
    rs = np.random.RandomState(98)
    for trial in range(20):
        m = rs.randint(1, 6)
        x1 = rs.uniform(0, 40, m)
        y1 = rs.uniform(0, 40, m)
        w = rs.uniform(4, 24, m)
        h = rs.uniform(4, 24, m)
        gt = np.stack([x1, y1, np.minimum(x1 + w, 64),
                       np.minimum(y1 + h, 64)], -1).astype(np.float32)
        labels = rs.randint(0, 7, m)

        res = ref.assign(torch.from_numpy(cells), list(nlp),
                         torch.from_numpy(gt),
                         gt_labels=torch.from_numpy(labels))
        want = res.gt_inds.numpy() - 1          # 0-based, -1 bg

        M = 8  # padded
        gt_p = np.zeros((M, 4), np.float32)
        gt_p[:m] = gt
        lab_p = np.zeros((M,), np.int32)
        lab_p[:m] = labels
        valid = np.zeros((M,), bool)
        valid[:m] = True
        out = atss_assign(jnp.asarray(priors), nlp, jnp.asarray(cells),
                          jnp.asarray(gt_p), jnp.asarray(lab_p),
                          jnp.asarray(valid), topk=9)
        got = np.asarray(out["matched_gt"])
        assert (got == want).all(), (
            trial, np.nonzero(got != want), got[got != want],
            want[got != want])


def test_nanodet_v1_shared_head_matches_reference():
    """NanoDet v1 head (share_cls_reg=True, 3x3 DW stacks) vs
    /root/reference/src/models/heads/nanodet_head.py:16-130 — identical
    per-level compute to the Plus head at kernel_size=3: gfl_cls emits
    cls+4*(reg_max+1) and splits; the parallel gfl_reg convs are
    constructed but bypassed (nanodet_head.py:120-122), so their params
    are dropped on port."""
    from src.models.heads.nanodet_head import NanoDetHead as RefHead
    from src.utils.config import CommonConfiguration as RefCfg

    from cvpytorch_tpu.models.heads.nanodet_head import NanoDetPlusHead
    from cvpytorch_tpu.utils.porting import (
        NANODETPLUS_HEAD_RULES,
        port_state_dict,
    )

    torch.manual_seed(0)
    nc, ch, strides = 5, 32, [8, 16, 32]
    loss_cfg = RefCfg.from_dict({
        "loss_qfl": {"name": "QualityFocalLoss", "beta": 2.0,
                     "loss_weight": 1.0},
        "loss_dfl": {"name": "DistributionFocalLoss", "loss_weight": 0.25},
        "loss_bbox": {"name": "GIoULoss", "loss_weight": 2.0},
    })
    ref = RefHead(num_classes=nc, loss=loss_cfg, input_channel=ch,
                  feat_channels=ch, stacked_convs=2, share_cls_reg=True,
                  strides=strides, octave_base_scale=5, reg_max=7,
                  norm_cfg={"type": "BN"}, activation="LeakyReLU")
    _randomize_bn(ref)
    ref.eval()

    rs = np.random.RandomState(99)
    feats_t = [rs.rand(2, ch, 64 // s, 64 // s).astype(np.float32)
               for s in strides]
    with torch.no_grad():
        cls_scores, bbox_preds = ref([to_torch(f) for f in feats_t])
        want = np.concatenate(
            [np.concatenate([c.permute(0, 2, 3, 1).reshape(2, -1, nc).numpy(),
                             b.permute(0, 2, 3, 1).reshape(2, -1, 32).numpy()],
                            -1)
             for c, b in zip(cls_scores, bbox_preds)], axis=1)

    sd = {k: v for k, v in ref.state_dict().items()
          if not k.startswith(("loss_", "assigner", "gfl_reg"))}
    ported = port_state_dict(sd, NANODETPLUS_HEAD_RULES, strict=True)

    head = NanoDetPlusHead(num_classes=nc, feat_channels=ch,
                           stacked_convs=2, kernel_size=3,
                           strides=tuple(strides), reg_max=7,
                           act="leaky_relu")
    feats = tuple(jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats_t)
    variables = head.init({"params": jax.random.PRNGKey(0)}, feats)
    errs = verify_tree_shapes(ported["params"], dict(variables["params"]))
    assert not errs, errs
    got = head.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        feats, False)
    _allclose_rel(np.asarray(got), want, atol=2e-4)

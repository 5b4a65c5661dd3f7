"""Step-level training differential vs the reference (VERDICT r4 #1 —
the last unproved parity claim).

Forward fidelity (test_fidelity_*) proves the models compute the same
function at init; convergence tests prove the repo learns.  This file
proves the repo learns THE SAME WAY, with three instruments of
increasing horizon:

1. **Gradient differential at two points** — per-leaf ∂loss/∂θ at the
   ported init AND at torch's step-30 trained params (both sides
   evaluate the same ported point, so this is horizon-free).  torch
   autograd vs jax.grad, mapped through the same porting rules.  Catches
   any grad-path divergence (stop_gradient/detach placement, loss-term
   wiring, BN-backward) in ONE backward, free of trajectory chaos.
   Measured on CPU: max per-leaf rel diff 1.1e-3, median 3.4e-4 for
   YOLOv5-s (fp32 reassociation level).
2. **Optimizer-update differential** — the reference's 3-way param
   grouping (optimizers/__init__.py:38-57: bias + norm weights from
   BIAS_PARAMS, conv/linear weights from WEIGHT_PARAMS, nesterov only
   where the conf sets it, BIAS_LR_MULTIPLIER) driven by IDENTICAL
   synthetic gradients for 5 steps vs our ``build_optimizer`` chain.
   No network in the loop → exact (1e-6) agreement required; any decay/
   momentum/nesterov/lr-multiplier placement error shows by step 2.
3. **Trajectory tracking** — 30 real SGD steps on one fixed batch; the
   per-step total-loss sequences must track.  Trajectories of an
   overfitting net are chaotic: a 1e-6 init perturbation grows ×~1.3-1.4
   per step (measured: UNet loss rel diff 2e-4 @ step 5 → 1.9e-4 @ 29
   at lr 0.02; YOLOv5 2e-3 @ step 2 at lr 0.01), so LRs are chosen so
   30 steps stay inside a justified envelope, and BN running stats
   (the most chaos-sensitive observable — deep-layer activation means)
   are asserted at step 10 rather than 30.

Reference train path: trainer.py:145-207 run_step (plain fp32, no
AMP/EMA here), optimizer grouping optimizers/__init__.py:38-57.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.oracle import setup_reference, to_torch  # noqa: E402

setup_reference()

from cvpytorch_tpu.config import CommonConfiguration  # noqa: E402
from cvpytorch_tpu.optim.optimizers import build_optimizer  # noqa: E402
from cvpytorch_tpu.train_state import (create_train_state,  # noqa: E402
                                       make_train_step)
from cvpytorch_tpu.utils.porting import port_state_dict  # noqa: E402


def _ref_param_groups(model, lr, bias_params, weight_params,
                      bias_lr_mult=1.0):
    """The reference's 3-way grouping, module loop replicated exactly
    (reference optimizers/__init__.py:38-57): per-module bias →
    BIAS_PARAMS @ lr*BIAS_LR_MULTIPLIER; norm-layer weight →
    BIAS_PARAMS; other module weights → WEIGHT_PARAMS."""
    import torch.nn as nn

    bn = tuple(v for k, v in nn.__dict__.items()
               if isinstance(v, type) and "Norm" in k)
    groups = []
    for k, v in model.named_modules():
        if hasattr(v, "bias") and isinstance(v.bias, nn.Parameter):
            groups.append({"params": [v.bias], "lr": lr * bias_lr_mult,
                           **bias_params})
        if isinstance(v, bn):
            groups.append({"params": [v.weight], "lr": lr, **bias_params})
        elif hasattr(v, "weight") and isinstance(v.weight, nn.Parameter):
            groups.append({"params": [v.weight], "lr": lr, **weight_params})
    return groups


def _flat(tree, prefix=""):
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(_flat(v, f"{prefix}/{k}"))
        return out
    out[prefix] = np.asarray(tree)
    return out


def _tree_max_diff(got, want):
    """(max abs diff, leaf path) over two nested trees; diffs relative
    to max(|leaf|, 1)."""
    gf, wf = _flat(got), _flat(want)
    worst = (0.0, "")
    for k, w in wf.items():
        scale = max(np.abs(w).max(), 1.0)
        d = float(np.abs(gf[k] - w).max() / scale)
        if d > worst[0]:
            worst = (d, k)
    return worst


def _grad_max_rel_diff(jax_grads, ported_grads):
    """Per-leaf max |Δg| normalized by max(leaf |g|max, 1e-3·global |g|max).

    The global floor matters: a conv bias feeding straight into BatchNorm
    has an analytically ZERO gradient (BN subtracts the batch mean), so
    per-leaf normalization there divides fp noise by fp noise."""
    gf, pf = _flat(jax_grads), _flat(ported_grads)
    gmax = max(np.abs(w).max() for w in pf.values())
    worst = (0.0, "")
    for k, w in pf.items():
        denom = max(np.abs(w).max(), 1e-3 * gmax)
        rel = float(np.abs(gf[k] - w).max() / denom)
        if rel > worst[0]:
            worst = (rel, k)
    return worst


def _grad_rel_l2(jax_grads, oracle_grads):
    """(worst per-leaf, global) relative L2 grad error vs an oracle.

    per-leaf: ‖Δ‖₂ / max(‖g_leaf‖₂, 1e-3·‖g_global‖₂);
    global:   ‖Δ_all‖₂ / ‖g_global‖₂.
    Chosen over max-abs because torch's OWN f32 conv backward deviates
    up to 20% (max-abs, per-leaf) from its f64 oracle on near-zero-
    gradient leaves — L2 with a global floor measures what training
    dynamics actually see."""
    gf, pf = _flat(jax_grads), _flat(oracle_grads)
    gnorm2 = sum(float((w.astype(np.float64) ** 2).sum())
                 for w in pf.values())
    gnorm = np.sqrt(gnorm2)
    worst, num2 = (0.0, ""), 0.0
    for k, w in pf.items():
        d = gf[k].astype(np.float64) - w.astype(np.float64)
        n = float(np.linalg.norm(d))
        num2 += n * n
        rel = n / max(float(np.linalg.norm(w)), 1e-3 * gnorm)
        if rel > worst[0]:
            worst = (rel, k)
    return worst, np.sqrt(num2) / gnorm


def _torch_grads_as_state_dict(mods):
    """named_parameters().grad as a state_dict-shaped mapping, with
    running-stat placeholders so port_state_dict(strict=True) accepts it
    (the batch_stats half of the ported tree is ignored)."""
    out = {}
    for mod, pre in mods:
        prefix = f"{pre}." if pre else ""
        for k, p in mod.named_parameters():
            out[f"{prefix}{k}"] = p.grad.detach().clone()
        for k, v in mod.state_dict().items():
            out.setdefault(f"{prefix}{k}", torch.ones_like(v))
    return out


def _set_torch_bn(model, eps, momentum):
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.eps = eps
            m.momentum = momentum


# ---------------------------------------------------------------------------
# 2. optimizer-update differential (exact, chaos-free)
# ---------------------------------------------------------------------------

def test_optimizer_update_matches_reference_grouping():
    """Identical synthetic grads through the reference's grouped SGD
    (momentum 0.937, nesterov + wd 5e-4 on conv/linear weights only,
    BIAS_LR_MULTIPLIER 2 on biases) vs build_optimizer: params must agree
    to 1e-6 after each of 5 steps — pins decay placement (coupled, inside
    momentum), per-group nesterov, and the bias-lr path exactly."""
    from src.models.unet import UNet as RefUNet

    from cvpytorch_tpu.utils.porting import UNET_RULES

    LR, MULT = 0.01, 2.0
    dictionary = [{"a": 1.0}, {"b": 1.0}, {"c": 1.0}]
    torch.manual_seed(0)
    ref = RefUNet(dictionary=dictionary)
    init_sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}
    ported = port_state_dict(init_sd, UNET_RULES, strict=True)

    # deterministic synthetic grad per torch param, ported via the same
    # rules so both sides consume the identical gradient tree
    gseed = {}
    for k, p in ref.named_parameters():
        rs = np.random.RandomState(abs(hash(k)) % (2**31))
        gseed[k] = rs.standard_normal(tuple(p.shape)).astype(np.float32) * 0.01
    grad_sd = {k: torch.from_numpy(g) for k, g in gseed.items()}
    for k, v in ref.state_dict().items():
        grad_sd.setdefault(k, torch.ones_like(v))
    ported_g = port_state_dict(grad_sd, UNET_RULES, strict=True)

    opt = torch.optim.SGD(_ref_param_groups(
        ref, LR,
        bias_params={"momentum": 0.937, "weight_decay": 0.0},
        weight_params={"momentum": 0.937, "weight_decay": 5e-4,
                       "nesterov": True},
        bias_lr_mult=MULT))

    cfg = CommonConfiguration({
        "INIT_LR": LR,
        "OPTIMIZER": {
            "TYPE": "SGD",
            "BIAS_LR_MULTIPLIER": MULT,
            "BIAS_PARAMS": {"momentum": 0.937, "weight_decay": 0.0},
            "WEIGHT_PARAMS": {"momentum": 0.937, "weight_decay": 5e-4,
                              "nesterov": True},
        },
    })
    tx = build_optimizer(cfg, lambda s: LR)
    params = ported["params"]
    opt_state = tx.init(params)

    import optax
    for step in range(5):
        for k, p in ref.named_parameters():
            p.grad = torch.from_numpy(gseed[k]).clone()
        opt.step()
        updates, opt_state = tx.update(ported_g["params"], opt_state, params)
        params = optax.apply_updates(params, updates)

        want = port_state_dict(
            {k: v.detach().clone() for k, v in ref.state_dict().items()},
            UNET_RULES, strict=True)["params"]
        d, where = _tree_max_diff(params, want)
        assert d < 1e-6, (step, d, where)


# ---------------------------------------------------------------------------
# UNet: init-grad + 30-step trajectory
# ---------------------------------------------------------------------------

def test_unet_training_trajectory_matches_reference():
    """30 SGD(momentum+decay) steps on one fixed batch: init grads track
    per-leaf, the per-step CE-loss sequence tracks inside the measured
    chaos envelope, BN running stats track at step 10, final params at
    step 30 (reference unet.py:92-165, seg_loss CrossEntropyLoss2d)."""
    from src.models.unet import UNet as RefUNet

    from cvpytorch_tpu.models.unet import UNet
    from cvpytorch_tpu.utils.porting import UNET_RULES

    LR, STEPS = 0.02, 30
    dictionary = [{"a": 1.0}, {"b": 1.0}, {"c": 1.0}]
    torch.manual_seed(0)
    ref = RefUNet(dictionary=dictionary)
    # torch BN defaults (eps 1e-5, momentum 0.1) — ours mirrors via
    # flax momentum 0.9 (the repo UNet's setting)
    ref.train()

    rs = np.random.RandomState(1)
    x = rs.rand(2, 3, 64, 64).astype(np.float32)
    y = rs.randint(0, 3, (2, 64, 64)).astype(np.int64)
    xt, yt = to_torch(x), torch.from_numpy(y)

    init_sd = {k: v.detach().clone() for k, v in ref.state_dict().items()}

    model = UNet(dictionary=tuple(dictionary))
    ported = port_state_dict(init_sd, UNET_RULES, strict=True)
    cfg = CommonConfiguration({
        "INIT_LR": LR,
        "OPTIMIZER": {
            "TYPE": "SGD",
            "BIAS_PARAMS": {"momentum": 0.9, "weight_decay": 0.0},
            "WEIGHT_PARAMS": {"momentum": 0.9, "weight_decay": 5e-4},
        },
    })
    tx = build_optimizer(cfg, lambda s: LR)
    batch = {"image": jnp.asarray(x.transpose(0, 2, 3, 1)),
             "target": jnp.asarray(y.astype(np.int32))}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    state = state.replace(params=ported["params"],
                          batch_stats=ported["batch_stats"],
                          opt_state=tx.init(ported["params"]))

    # -- instrument 1: init-grad differential vs the f64 ORACLE ---------
    # torch's own f32 conv backward deviates up to 20% (per-leaf max-abs)
    # from its f64 result on small-gradient leaves, while our f32 grads
    # sit at 5e-4 of the oracle there — so the arbiter is the reference
    # model run in float64, not reference-f32
    def torch_f64_grads(src_sd):
        m = RefUNet(dictionary=dictionary).to(torch.float64)
        m.load_state_dict({k: (v.to(torch.float64)
                               if v.is_floating_point() else v)
                           for k, v in src_sd.items()})
        m.train()
        losses = m(xt.to(torch.float64), yt, "train")
        losses["loss"].backward()
        sd = {k: p.grad.detach().float().clone()
              for k, p in m.named_parameters()}
        for k, v in m.state_dict().items():
            sd.setdefault(k, torch.ones_like(v, dtype=torch.float32))
        return port_state_dict(sd, UNET_RULES, strict=True)["params"]

    oracle0 = torch_f64_grads(init_sd)

    def loss_j(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": ported["batch_stats"]},
            batch["image"], targets=batch["target"], mode="train",
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
        return out[0]

    jgrads = jax.grad(loss_j)(ported["params"])
    (grel, gwhere), gglob = _grad_rel_l2(jgrads, oracle0)
    # measured: worst-leaf ~2.5e-2 (f32 noise on tiny-grad leaves),
    # global 5.1e-3 — both pure f32-vs-f64 conv noise; a wiring/detach
    # bug lands ≥ O(1) on some leaf and O(0.1+) globally
    assert grel < 1e-1, (grel, gwhere)
    assert gglob < 2e-2, gglob

    # -- instrument 3: interleaved 30-step trajectory --------------------

    opt = torch.optim.SGD(_ref_param_groups(
        ref, LR,
        bias_params={"momentum": 0.9, "weight_decay": 0.0},
        weight_params={"momentum": 0.9, "weight_decay": 5e-4}))
    step = make_train_step(amp=False, donate=False)
    seq, ref_seq = [], []
    stats10 = None
    for it in range(STEPS):
        losses = ref(xt, yt, "train")
        opt.zero_grad(set_to_none=True)
        losses["loss"].backward()
        opt.step()
        ref_seq.append(float(losses["loss"].detach()))
        state, metrics = step(state, batch)
        seq.append(float(metrics["loss"]))
        if it == 9:
            want10 = port_state_dict(
                {k: v.detach().clone() for k, v in ref.state_dict().items()},
                UNET_RULES, strict=True)
            stats10 = _tree_max_diff(state.batch_stats,
                                     want10["batch_stats"])

    # measured divergence at lr 0.02: rel 2e-4 @ step 5, 1.9e-4 @ 29 —
    # envelope 2e-3 early, 2e-2 late (chaos growth ×~1.3/step from the
    # 1e-6 fp seed)
    seq, ref_seq = np.asarray(seq), np.asarray(ref_seq)
    rel = np.abs(seq - ref_seq) / np.maximum(np.abs(ref_seq), 1e-3)
    assert rel[:10].max() < 2e-3, rel[:10]
    assert rel.max() < 2e-2, rel

    # BN running stats at step 10 (measured 4e-3 @ step 5; chaos-driven
    # 0.2 by step 30, so asserted at the 10-step horizon)
    assert stats10[0] < 5e-2, stats10

    final = port_state_dict(
        {k: v.detach().clone() for k, v in ref.state_dict().items()},
        UNET_RULES, strict=True)
    dp, wherep = _tree_max_diff(state.params, final["params"])
    assert dp < 2e-2, (dp, wherep)  # measured 4.2e-3 @ step 30

    # -- instrument 1': grad differential AT THE TRAINED POINT ----------
    # both sides evaluate torch's step-30 params (ported) against the
    # f64 oracle rebuilt at that point — chaos-free like the init check
    # but non-init: kills any "the grad paths only agree at the init
    # distribution" doubt
    oracleN = torch_f64_grads(
        {k: v.detach().clone() for k, v in ref.state_dict().items()})

    def loss_jN(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": final["batch_stats"]},
            batch["image"], targets=batch["target"], mode="train",
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
        return out[0]

    (grelN, gwhereN), gglobN = _grad_rel_l2(
        jax.grad(loss_jN)(final["params"]), oracleN)
    assert grelN < 1e-1, (grelN, gwhereN)
    assert gglobN < 2e-2, gglobN


# ---------------------------------------------------------------------------
# YOLOv5: init-grad + 30-step trajectory (flagship recipe shape)
# ---------------------------------------------------------------------------

def test_yolov5_training_trajectory_matches_reference():
    """The flagship's recipe shape (conf/coco_yolov5.yml: SGD momentum
    0.937, nesterov on weight groups only, wd 5e-4 on conv kernels only)
    on one fixed det batch: init grads match per-leaf, then 30 steps of
    loss tracking against the reference chained bb→neck→detect +
    YOLOv5Loss (reference yolov5.py:156-260, yolov5_loss.py:135-278).
    LR 0.003 (vs the conf's 0.01) tames trajectory chaos — the recipe
    SHAPE (grouping/nesterov/decay placement) is what's under test, and
    the exact arithmetic is pinned by
    test_optimizer_update_matches_reference_grouping."""
    from src.losses.yolov5_loss import YOLOv5Loss as RefLoss
    from src.models.backbones.det.yolov5_csp_darknet import (
        YOLOv5CSPDarknet as RefBB,
    )
    from src.models.detects.yolov5_detect import YOLOv5Detect as RefDet
    from src.models.necks.yolov5_neck import YOLOv5Neck as RefNeck
    from src.models.yolov5 import YOLOv5 as RefYOLOv5

    from cvpytorch_tpu.models.yolov5 import YOLOv5
    from cvpytorch_tpu.utils.porting import (YOLOV5_RULES,
                                             stem6_to_s2d_kernel)

    LR, STEPS, nc = 0.003, 30, 4
    torch.manual_seed(0)
    bb = RefBB(subtype="cspdark_s", out_stages=[2, 3, 4], pretrained=False)
    neck = RefNeck(in_channels=[256, 512, 1024],
                   out_channels=[256, 512, 1024],
                   depth_mul=0.33, width_mul=0.5)
    det = RefDet(num_classes=nc, in_channels=[256, 512, 1024],
                 anchors=RefYOLOv5.anchors, width_mul=0.5)

    class RefModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone, self.neck, self.detect = bb, neck, det

        def forward(self, imgs):
            _, train_out = self.detect(self.neck(self.backbone(imgs)))
            return train_out

    ref = RefModel()
    # reference YOLOv5.init_weights pins BN eps 1e-3 / momentum 0.03
    # (yolov5.py:200-202) — ours uses flax momentum 0.97 / eps 1e-3
    _set_torch_bn(ref, 1e-3, 0.03)
    ref.train()
    loss_fn = RefLoss(num_classes=nc, anchors=RefYOLOv5.anchors,
                      device="cpu")

    # fixed batch; 64 = 2^6 so normalized↔pixel box roundtrips are exact
    rs = np.random.RandomState(2)
    B, S = 2, 64
    x = rs.rand(B, 3, S, S).astype(np.float32)
    centers = [(0.2, 0.2), (0.65, 0.3), (0.35, 0.75), (0.8, 0.8)]
    rows, boxes_px = [], np.zeros((B, 8, 4), np.float32)
    labels = np.zeros((B, 8), np.int64)
    valid = np.zeros((B, 8), bool)
    for b in range(B):
        for t in range(3):
            cx, cy = centers[(b * 3 + t) % 4]
            w, h = rs.uniform(0.1, 0.35, 2).astype(np.float32)
            c = rs.randint(0, nc)
            rows.append([b, c, cx, cy, w, h])
            boxes_px[b, t] = [(cx - w / 2) * S, (cy - h / 2) * S,
                              (cx + w / 2) * S, (cy + h / 2) * S]
            labels[b, t] = c
            valid[b, t] = True
    rows_t = to_torch(np.asarray(rows, np.float32))
    xt = to_torch(x)

    init_sd = {f"{pre}.{k}": v.detach().clone()
               for mod, pre in ((bb, "backbone"), (neck, "neck"),
                                (det, "detect"))
               for k, v in mod.state_dict().items()}

    model = YOLOv5(
        dictionary=tuple({f"c{i}": 1.0} for i in range(nc)),
        model_cfg=CommonConfiguration(
            {"TYPE": "yolov5_s", "LOSS": {"name": "YOLOv5Loss"}}))
    port_kw = dict(
        strict=True,
        transforms={r"backbone/stem/conv/kernel": stem6_to_s2d_kernel})
    ported = port_state_dict(init_sd, YOLOV5_RULES, **port_kw)

    img = jnp.asarray(x.transpose(0, 2, 3, 1))
    tgt = {"boxes": jnp.asarray(boxes_px),
           "labels": jnp.asarray(labels.astype(np.int32)),
           "valid": jnp.asarray(valid)}

    # -- instrument 1: init-grad differential ---------------------------
    total0, _ = loss_fn(ref(xt), rows_t)
    total0.backward()
    ported_grads = port_state_dict(
        _torch_grads_as_state_dict(
            [(bb, "backbone"), (neck, "neck"), (det, "detect")]),
        YOLOV5_RULES, **port_kw)

    def loss_j(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": ported["batch_stats"]},
            img, targets=tgt, mode="train", mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        return out[0]

    jgrads = jax.grad(loss_j)(ported["params"])
    grel, gwhere = _grad_max_rel_diff(jgrads, ported_grads["params"])
    # measured on CPU: 1.1e-3 max, 3.4e-4 median — pure fp32 noise
    # through the assigner/gather/BCE chain
    assert grel < 5e-3, (grel, gwhere)

    # -- instrument 3: 30-step trajectory --------------------------------
    ref.zero_grad(set_to_none=True)
    for mod, pre in ((bb, "backbone"), (neck, "neck"), (det, "detect")):
        mod.load_state_dict({k[len(pre) + 1:]: v for k, v in init_sd.items()
                             if k.startswith(pre + ".")})

    cfg = CommonConfiguration({
        "INIT_LR": LR,
        "OPTIMIZER": {
            "TYPE": "SGD",
            "BIAS_PARAMS": {"momentum": 0.937, "weight_decay": 0.0},
            "WEIGHT_PARAMS": {"momentum": 0.937, "weight_decay": 5e-4,
                              "nesterov": True},
        },
    })
    tx = build_optimizer(cfg, lambda s: LR)
    batch = {"image": img, "target": tgt}
    state = create_train_state(model, tx, jax.random.PRNGKey(0), batch)
    state = state.replace(params=ported["params"],
                          batch_stats=ported["batch_stats"],
                          opt_state=tx.init(ported["params"]))
    opt = torch.optim.SGD(_ref_param_groups(
        ref, LR,
        bias_params={"momentum": 0.937, "weight_decay": 0.0},
        weight_params={"momentum": 0.937, "weight_decay": 5e-4,
                       "nesterov": True}))
    step = make_train_step(amp=False, donate=False)
    seq, ref_seq = [], []
    stats10 = None
    for it in range(STEPS):
        total, _items = loss_fn(ref(xt), rows_t)
        opt.zero_grad(set_to_none=True)
        total.backward()
        opt.step()
        ref_seq.append(float(total.detach()))
        state, metrics = step(state, batch)
        seq.append(float(metrics["loss"]))
        if it == 9:
            want10 = port_state_dict(
                {f"{pre}.{k}": v.detach().clone()
                 for mod, pre in ((bb, "backbone"), (neck, "neck"),
                                  (det, "detect"))
                 for k, v in mod.state_dict().items()},
                YOLOV5_RULES, **port_kw)
            stats10 = _tree_max_diff(state.batch_stats,
                                     want10["batch_stats"])

    # the YOLO landscape is steep and assignment-structured: the fp-seed
    # divergence grows ×~3-10/step early (measured at lr 0.003:
    # [5e-6, 2.2e-4, 2.8e-3, 3.2e-3, 2.2e-2, ...]), so only the first
    # steps admit a tight bound; longer-horizon parity is carried by the
    # chaos-free trained-point grad check below and the exact optimizer
    # differential above
    seq, ref_seq = np.asarray(seq), np.asarray(ref_seq)
    rel = np.abs(seq - ref_seq) / np.maximum(np.abs(ref_seq), 1e-3)
    assert rel[:4].max() < 1e-2, rel[:4]
    assert rel.max() < 0.6, rel        # same descent, bounded wander
    assert stats10[0] < 0.3, stats10   # chaos-bounded sanity

    # -- instrument 1': grad differential AT TORCH'S TRAINED POINT ------
    # port torch's step-30 params/stats and evaluate BOTH grad paths
    # there — chaos-free (same point, no trajectory), non-init
    final = port_state_dict(
        {f"{pre}.{k}": v.detach().clone()
         for mod, pre in ((bb, "backbone"), (neck, "neck"),
                          (det, "detect"))
         for k, v in mod.state_dict().items()},
        YOLOV5_RULES, **port_kw)
    ref.zero_grad(set_to_none=True)
    totalN, _ = loss_fn(ref(xt), rows_t)
    totalN.backward()
    ported_gN = port_state_dict(
        _torch_grads_as_state_dict(
            [(bb, "backbone"), (neck, "neck"), (det, "detect")]),
        YOLOV5_RULES, **port_kw)

    def loss_jN(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": final["batch_stats"]},
            img, targets=tgt, mode="train", mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        return out[0]

    grelN, gwhereN = _grad_max_rel_diff(jax.grad(loss_jN)(final["params"]),
                                        ported_gN["params"])
    assert grelN < 5e-3, (grelN, gwhereN)

"""Optimizers (reference: src/optimizers/, 505 LoC).

The reference builds 3 param groups per module — biases (no decay, own LR
multiplier), norm weights (no decay), conv/linear weights (decay) —
(reference: optimizers/__init__.py:35-56).  Here the same policy is a
*label function* over the flat param pytree driving ``optax.multi_transform``:

* leaves named ``bias`` → no weight decay, LR × BIAS_LR_MULTIPLIER
* 1-D ``scale``/``kernel`` leaves (norm affine weights) → no weight decay
* everything else → weight decay

Optimizer types mirror the YAML ``OPTIMIZER.TYPE``: SGD, Adam, AdamW,
Adadelta, RMSprop, RAdam, AdaBelief, Ranger (= RAdam + Lookahead),
Lookahead wrapper (reference: radam.py/ranger.py/adabelief.py/lookahead.py).
Gradient clipping and accumulation (reference: trainer.py:133-143,195) are
fused into the same optax chain.
"""
from __future__ import annotations

from typing import Callable

import jax
import optax

from ..registry import OPTIMIZERS


def _leaf_label(path: tuple, leaf) -> str:
    name = ""
    for p in reversed(path):
        key = getattr(p, "key", getattr(p, "name", None))
        if isinstance(key, str):
            name = key
            break
    if name == "bias":
        return "bias"
    if getattr(leaf, "ndim", 2) <= 1:
        return "norm"  # BN/GN/LN scale+bias and other 1-D vectors: no decay
    return "weight"


def param_labels(params):
    return jax.tree_util.tree_map_with_path(_leaf_label, params)


@OPTIMIZERS.register(name="SGD")
def sgd(lr, momentum=0.9, nesterov=False, **_):
    return optax.sgd(lr, momentum=momentum, nesterov=nesterov)


@OPTIMIZERS.register(name="Adam")
def adam(lr, betas=(0.9, 0.999), eps=1e-8, **_):
    return optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)


@OPTIMIZERS.register(name="AdamW")
def adamw(lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, mask=None, **_):
    # Decoupled decay (torch.optim.AdamW semantics): decay is applied AFTER
    # the adaptive scaling, scaled by the LR — NOT folded into the gradient
    # like the shared add_decayed_weights (which would give coupled Adam-L2).
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps,
                       weight_decay=weight_decay, mask=mask)


@OPTIMIZERS.register(name="Adadelta")
def adadelta(lr, rho=0.9, eps=1e-6, **_):
    return optax.adadelta(lr, rho=rho, eps=eps)


@OPTIMIZERS.register(name="RMSprop")
def rmsprop(lr, momentum=0.0, eps=1e-8, **_):
    return optax.rmsprop(lr, momentum=momentum, eps=eps)


@OPTIMIZERS.register(name="RAdam")
def radam(lr, betas=(0.9, 0.999), eps=1e-8, **_):
    return optax.radam(lr, b1=betas[0], b2=betas[1], eps=eps)


@OPTIMIZERS.register(name="AdaBelief")
def adabelief(lr, betas=(0.9, 0.999), eps=1e-16, **_):
    return optax.adabelief(lr, b1=betas[0], b2=betas[1], eps=eps)


@OPTIMIZERS.register(name="Ranger")
def ranger(lr, betas=(0.95, 0.999), eps=1e-5, **_):
    """RAdam + slow-weight averaging (reference: optimizers/ranger.py).

    Implemented as RAdam + EMA-style lookahead blend via optax.lookahead is
    stateful over (fast, slow) params, which doesn't compose with a plain
    param pytree; use RAdam + trailing Polyak averaging instead — the same
    fixed-point, jit-friendly.
    """
    return optax.chain(
        optax.radam(lr, b1=betas[0], b2=betas[1], eps=eps),
        optax.ema(decay=0.8, debias=False),
    )


def _path_starts_with(path: tuple, prefix: str) -> bool:
    key = getattr(path[0], "key", getattr(path[0], "name", None)) if path else None
    return key == prefix


def freeze_mask(params, patterns):
    """True = frozen.  Substring match on the joined param path
    (reference: src/utils/freeze.py:8 freeze_models)."""
    def label(path, leaf):
        name = "/".join(str(getattr(p, "key", getattr(p, "name", ""))) for p in path)
        return any(pat in name for pat in patterns)

    return jax.tree_util.tree_map_with_path(label, params)


def build_optimizer(cfg, lr_schedule) -> optax.GradientTransformation:
    """Build the full gradient transformation from a trainer config.

    Consumes OPTIMIZER.{TYPE,MOMENTUM,WEIGHT_DECAY(=WEIGHT_PARAMS.weight_decay),
    BIAS_LR_MULTIPLIER}, GRAD_CLIP.{TYPE,VALUE}, ACCUMULATE_STEPS,
    BACKBONE_LR (separate backbone learning rate, reference trainer cfg),
    FREEZE_PATTERNS (substring param freeze, reference freeze.py:8)
    (reference: trainer.py:133-143,195; optimizers/__init__.py:21-56).
    """
    opt_cfg = cfg.OPTIMIZER or {}
    get = opt_cfg.get if hasattr(opt_cfg, "get") else (lambda k, d=None: dict(opt_cfg).get(k, d))
    opt_type = get("TYPE", "SGD") or "SGD"

    kwargs = {}
    if get("MOMENTUM") is not None:
        kwargs["momentum"] = float(get("MOMENTUM"))
    if get("BETAS") is not None:
        kwargs["betas"] = tuple(get("BETAS"))
    wp = get("WEIGHT_PARAMS") or {}
    wd = float(
        (wp.get("weight_decay") if hasattr(wp, "get") else 0.0)
        or get("WEIGHT_DECAY")
        or 0.0
    )
    if hasattr(wp, "get") and wp.get("momentum") is not None:
        kwargs["momentum"] = float(wp.get("momentum"))
    if hasattr(wp, "get") and wp.get("nesterov") is not None:
        kwargs["nesterov"] = bool(wp.get("nesterov"))
    # the reference builds bias/norm groups from BIAS_PARAMS and weight
    # groups from WEIGHT_PARAMS (optimizers/__init__.py:38-57) — momentum
    # and nesterov can differ per group (the shipped yolov5 conf sets
    # nesterov only under WEIGHT_PARAMS, so its bias/norm groups silently
    # run plain momentum — replicated exactly)
    bp = get("BIAS_PARAMS") or {}
    bget = bp.get if hasattr(bp, "get") else (lambda k, d=None: dict(bp).get(k, d))
    bias_kwargs = dict(kwargs)
    bias_kwargs.pop("nesterov", None)
    if bget("momentum") is not None:
        bias_kwargs["momentum"] = float(bget("momentum"))
    if bget("nesterov") is not None:
        bias_kwargs["nesterov"] = bool(bget("nesterov"))
    groups_differ = bias_kwargs != kwargs
    bias_mult = float(get("BIAS_LR_MULTIPLIER") or 1.0)

    decoupled = opt_type == "AdamW"

    def _weight_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, l: _leaf_label(p, l) == "weight", params)

    def make_core(scale: float, decay: float | None = None,
                  group_kwargs: dict | None = None):
        sched = (lambda s: lr_schedule(s) * scale) if scale != 1.0 else lr_schedule
        kw = dict(kwargs if group_kwargs is None else group_kwargs)
        if decoupled:
            # decay == None → whole-tree core: mask decay to weights inside.
            # decay given → multi_transform per-group core: group IS the
            # decay partition, so pass the scalar directly, no mask.
            if decay is None:
                kw.update(weight_decay=wd, mask=_weight_mask)
            else:
                kw.update(weight_decay=decay)
        return OPTIMIZERS.get(opt_type)(sched, **kw)

    chain = []
    clip_cfg = cfg.GRAD_CLIP
    if clip_cfg and clip_cfg.get("VALUE"):
        if (clip_cfg.get("TYPE") or "norm") == "norm":
            chain.append(optax.clip_by_global_norm(float(clip_cfg.get("VALUE"))))
        else:
            chain.append(optax.clip(float(clip_cfg.get("VALUE"))))

    if wd > 0 and not decoupled:
        chain.append(
            optax.masked(
                optax.add_decayed_weights(wd),
                lambda params: jax.tree_util.tree_map_with_path(
                    lambda p, l: _leaf_label(p, l) == "weight", params
                ),
            )
        )

    backbone_lr = cfg.BACKBONE_LR
    base_lr = float(cfg.INIT_LR or 0.01)
    bb_scale = (float(backbone_lr) / base_lr) if backbone_lr else 1.0

    if bias_mult != 1.0 or bb_scale != 1.0 or groups_differ:
        def labels_fn(params):
            def label(path, leaf):
                name = "/".join(
                    str(getattr(p, "key", getattr(p, "name", "")))
                    for p in path)
                base = _leaf_label(path, leaf)
                if bb_scale != 1.0 and name.startswith("backbone"):
                    return "backbone_" + base
                return base

            return jax.tree_util.tree_map_with_path(label, params)

        transforms = {"bias": make_core(bias_mult, 0.0, bias_kwargs),
                      "norm": make_core(1.0, 0.0, bias_kwargs),
                      "weight": make_core(1.0, wd)}
        if bb_scale != 1.0:
            transforms.update({
                "backbone_bias": make_core(bias_mult * bb_scale, 0.0,
                                           bias_kwargs),
                "backbone_norm": make_core(bb_scale, 0.0, bias_kwargs),
                "backbone_weight": make_core(bb_scale, wd),
            })
        core = optax.multi_transform(transforms, labels_fn)
    else:
        core = make_core(1.0)
    chain.append(core)

    patterns = cfg.FREEZE_PATTERNS
    if patterns:
        chain.append(optax.masked(
            optax.set_to_zero(),
            lambda params: freeze_mask(params, list(patterns))))

    tx = optax.chain(*chain)
    accum = int(cfg.ACCUMULATE_STEPS or 1)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx

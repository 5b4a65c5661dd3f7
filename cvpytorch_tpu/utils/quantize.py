"""Post-training quantization utilities
(reference: test/quantize/{torch_quantize.py,bn_fusion.py,ptq_momic.py} —
exploratory PTQ scripts; here a reusable int8 weight-PTQ pass).

Per-output-channel symmetric int8 quantization of conv/dense kernels with
dequantize-on-load: the pytree keeps fp32-compatible structure (kernels are
stored dequantized), so any model runs unchanged while weights carry int8
information content — the standard deploy-size/accuracy-drift experiment.
``quantize_tree``/``dequantize_tree`` also expose the raw int8 payload for
serialization (4× smaller checkpoints).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def quantize_kernel(w: np.ndarray):
    """Per-output-channel symmetric int8. kernel layout (..., out)."""
    w = np.asarray(w)
    scale = np.abs(w).reshape(-1, w.shape[-1]).max(0) / 127.0
    scale = np.maximum(scale, 1e-12)
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def dequantize_kernel(q: np.ndarray, scale: np.ndarray):
    return q.astype(np.float32) * scale


def quantize_tree(params):
    """→ (int8 tree with {'q','scale'} leaves for kernels, passthrough
    for everything else)."""
    def visit(leaf):
        a = np.asarray(leaf)
        if a.ndim >= 2 and a.dtype in (np.float32, np.float64):
            q, s = quantize_kernel(a)
            return {"q": q, "scale": s}
        return a

    return jax.tree_util.tree_map(visit, params)


def dequantize_tree(qtree):
    def visit(leaf):
        if isinstance(leaf, dict) and set(leaf) == {"q", "scale"}:
            return jnp.asarray(dequantize_kernel(leaf["q"], leaf["scale"]))
        return leaf

    return jax.tree_util.tree_map(
        visit, qtree, is_leaf=lambda x: isinstance(x, dict) and
        set(x) == {"q", "scale"})


def ptq_roundtrip(params):
    """fp32 params → int8 → fp32 (the PTQ accuracy-drift experiment)."""
    return dequantize_tree(quantize_tree(params))


# ---------------------------------------------------------------------------
# Activation PTQ + QAT fake-quant
# (reference: test/quantize/torch_quantize.py — torch quant/dequant stubs +
#  prepare_qat/convert over resnet18; here the TPU-native equivalent: flax
#  capture_intermediates calibrates per-site activation scales, and
#  intercept_methods simulates int8 activations with a straight-through
#  estimator so the same transform serves PTQ eval and QAT fine-tuning.)
# ---------------------------------------------------------------------------


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def fake_quant(x, scale):
    """Symmetric int8 quantize-dequantize of activations.

    Forward: round(x/scale) clipped to ±127, rescaled.  Backward:
    straight-through estimator — gradient passes unchanged inside the
    representable range, zero outside (the standard QAT rule).
    ``scale`` is a static per-site calibration constant."""
    q = jnp.clip(jnp.round(x / scale), -127.0, 127.0)
    return (q * scale).astype(x.dtype)


def _fq_fwd(x, scale):
    return fake_quant(x, scale), x


def _fq_bwd(scale, x, g):
    mask = (jnp.abs(x) <= 127.0 * scale).astype(g.dtype)
    return (g * mask,)


fake_quant.defvjp(_fq_fwd, _fq_bwd)


def _site_key(path) -> str:
    return "/".join(str(p) for p in path)


def calibrate_activations(model, variables, batches, **apply_kw):
    """Observer pass: run ``batches`` through the model capturing every
    submodule's ``__call__`` output and return ``{site: absmax-scale}``
    (symmetric int8: scale = absmax/127).  ``batches`` is an iterable of
    model inputs (each passed as ``model.apply(variables, b)``)."""
    amax: dict = {}
    for b in batches:
        _, inter = model.apply(variables, b, capture_intermediates=True,
                               mutable=["intermediates"], **apply_kw)

        from flax import traverse_util

        flat = traverse_util.flatten_dict(inter["intermediates"])
        for path, vals in flat.items():
            if path[-1] != "__call__":
                continue
            key = _site_key(path[:-1])
            for v in jax.tree_util.tree_leaves(vals):
                if not hasattr(v, "dtype") or not jnp.issubdtype(
                        v.dtype, jnp.floating):
                    continue
                m = float(jnp.abs(v).max())
                amax[key] = max(amax.get(key, 0.0), m)
    return {k: max(v / 127.0, 1e-12) for k, v in amax.items()}


def quantized_apply(model, variables, *args, act_scales, **apply_kw):
    """Run ``model.apply`` with every calibrated submodule output passed
    through :func:`fake_quant` (int8 activation simulation).  Composes
    with :func:`ptq_roundtrip` on the params for the full weights+acts
    int8 experiment; differentiable (STE), so the same call sits inside
    a QAT fine-tuning loss."""
    from flax import linen as nn

    def interceptor(next_fun, iargs, ikwargs, context):
        out = next_fun(*iargs, **ikwargs)
        if context.method_name != "__call__":
            return out
        scale = act_scales.get(_site_key(context.module.path))
        if scale is None:
            return out
        return jax.tree_util.tree_map(
            lambda v: fake_quant(v, scale)
            if hasattr(v, "dtype") and jnp.issubdtype(v.dtype, jnp.floating)
            else v, out)

    with nn.intercept_methods(interceptor):
        return model.apply(variables, *args, **apply_kw)

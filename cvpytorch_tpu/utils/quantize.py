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

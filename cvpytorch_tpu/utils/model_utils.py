"""Model utility parity: SWA, precise BN, conv+BN fusion, class weights,
autoanchor k-means (reference: src/utils/swa_utils.py:12-113,
src/nn/precise_bn.py:95-225, src/utils/fuse.py:33-79,
src/utils/calculate_weights.py:18-57,
src/models/anchors/autoanchor.py:27-140).

All functional over pytrees — no module mutation."""
from __future__ import annotations

from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- SWA ----
def swa_average(param_trees: Iterable):
    """Uniform average of N parameter pytrees (reference swa_utils.py:12)."""
    trees = list(param_trees)
    n = len(trees)
    assert n > 0
    return jax.tree_util.tree_map(
        lambda *xs: sum(xs) / float(n), *trees)


def precise_bn(model, params, batch_stats, batches, mode_kwargs=None):
    """EXACT population BN stats (reference precise_bn.py:59-225, fvcore
    "Rethinking Batch in BatchNorm"): the true average of per-batch
    mean / E[x²] over all batches, with var = E[bm² + bv] − pop_mean².

    flax fixes each BatchNorm's momentum at construction, so the batch
    moments are recovered exactly from the EMA update instead: with the
    running stats zeroed, ``new = (1−m)·batch_moment``; the per-layer
    momentum ``m`` is calibrated once by applying the first batch twice
    (``ra2 = (1−m)(1+m)·b`` ⇒ ``m = ra2/ra1 − 1``, read off the strictly
    positive var leaf).  flax stores the biased batch var, so no
    Bessel-undo is needed (torch's is unbiased, reference :81-83).
    Assumes equal batch sizes and that every BN layer runs each forward.
    """
    batches = iter(batches)
    try:
        first = next(batches)
    except StopIteration:
        return batch_stats
    zeros = jax.tree_util.tree_map(jnp.zeros_like, batch_stats)

    def run(stats, batch):
        _, mutated = model.apply(
            {"params": params, "batch_stats": stats},
            batch["image"], targets=batch.get("target"), mode="train",
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
        return mutated["batch_stats"]

    ra1 = run(zeros, first)
    ra2 = run(ra1, first)      # same rngs → same batch moments
    paths1 = jax.tree_util.tree_flatten_with_path(ra1)[0]
    paths2 = jax.tree_util.tree_flatten_with_path(ra2)[0]
    m_of = {}                  # BN-scope path prefix → scalar momentum
    for (path, v1), (_, v2) in zip(paths1, paths2):
        if str(getattr(path[-1], "key", "")) == "var":
            r = np.asarray(v2) / np.maximum(np.asarray(v1), 1e-20)
            m_of[path[:-1]] = float(np.clip(np.median(r) - 1.0, 0.0, 1.0))

    def batch_moments(ra):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: x.astype(jnp.float32) /
            max(1.0 - m_of.get(p[:-1], 0.0), 1e-6), ra)

    # accumulate Σ batch_mean into the 'mean' leaves and Σ (bv + bm²)
    # into the 'var' leaves of a single tree
    def fold(acc, mom):
        def one(path, a, x):
            if str(getattr(path[-1], "key", "")) != "var":
                return a + x
            mean_leaf = mom
            for p in path[:-1]:
                mean_leaf = mean_leaf[p.key]
            return a + x + mean_leaf["mean"] ** 2
        return jax.tree_util.tree_map_with_path(one, acc, mom)

    total = jax.tree_util.tree_map(jnp.zeros_like, zeros)
    total = fold(total, batch_moments(ra1))
    n = 1
    for batch in batches:
        total = fold(total, batch_moments(run(zeros, batch)))
        n += 1

    avg = jax.tree_util.tree_map(lambda x: x / n, total)

    def finalize(path, x):
        if str(getattr(path[-1], "key", "")) != "var":
            return x
        mean_leaf = avg
        for p in path[:-1]:
            mean_leaf = mean_leaf[p.key]
        return x - mean_leaf["mean"] ** 2   # E[bm²+bv] − pop_mean²
    return jax.tree_util.tree_map_with_path(finalize, avg)


# ------------------------------------------------------ conv+BN fusion ---
def fuse_conv_bn(conv_kernel, conv_bias, bn_scale, bn_bias, bn_mean, bn_var,
                 eps: float = 1e-5):
    """Algebraic conv+BN fusion for deploy (reference: fuse.py:33).
    kernel HWIO; returns fused (kernel, bias)."""
    std = jnp.sqrt(bn_var + eps)
    k = conv_kernel * (bn_scale / std)[None, None, None, :]
    b = (conv_bias if conv_bias is not None else 0.0)
    b = (b - bn_mean) * bn_scale / std + bn_bias
    return k, b


def fuse_model_conv_bn(params, batch_stats, eps: float = 1e-3):
    """Walk a pytree fusing every sibling {conv, bn} pair (the ConvBNAct
    layout) into conv kernel+bias; bn params replaced by identity."""
    import copy

    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy

    def walk(p, s):
        """Returns (fused_params, fused_stats) for this subtree."""
        if not isinstance(p, dict):
            return p, s
        out_p, out_s = {}, {}
        for k, v in p.items():
            sv = s.get(k, {}) if isinstance(s, dict) else {}
            if (isinstance(v, dict) and "conv" in v and "bn" in v
                    and isinstance(sv, dict) and "bn" in sv):
                conv = dict(v["conv"])
                bn = v["bn"]
                bn_s = sv["bn"]
                kern, bias = fuse_conv_bn(
                    conv["kernel"], conv.get("bias"), bn["scale"], bn["bias"],
                    bn_s["mean"], bn_s["var"], eps)
                # additive term goes into the identity-BN bias so bias-less
                # convs (the ConvBNAct default) keep their param structure
                new_conv = {"kernel": kern}
                if "bias" in conv:
                    new_conv["bias"] = jnp.zeros_like(conv["bias"])
                out_p[k] = {
                    "conv": new_conv,
                    "bn": {"scale": jnp.ones_like(bn["scale"]),
                           "bias": bias},
                }
                # identity stats: sqrt(var + eps) must equal exactly 1
                out_s[k] = {"bn": {"mean": jnp.zeros_like(bn_s["mean"]),
                                   "var": jnp.ones_like(bn_s["var"]) - eps}}
            elif isinstance(v, dict):
                out_p[k], out_s[k] = walk(v, sv)
            else:
                out_p[k] = v
                if isinstance(s, dict) and k in s:
                    out_s[k] = s[k]
        # keep stats entries params didn't cover (e.g. this level IS a stat)
        if isinstance(s, dict):
            for k, v in s.items():
                out_s.setdefault(k, v)
        return out_p, out_s

    return walk(params, batch_stats)


# ------------------------------------------------------- class weights ---
def seg_class_weights(mask_iter, num_classes: int, ignore_index: int = 255):
    """Log-inverse-frequency seg weights
    (reference: calculate_weights.py:18)."""
    counts = np.zeros(num_classes, np.float64)
    for mask in mask_iter:
        m = np.asarray(mask).reshape(-1)
        m = m[(m != ignore_index) & (m < num_classes)]
        counts += np.bincount(m, minlength=num_classes)
    freq = counts / max(counts.sum(), 1)
    return 1.0 / (np.log(1.02 + freq))


def det_class_weights(labels_iter, num_classes: int):
    """Inverse-frequency det weights (reference: calculate_weights.py:41)."""
    counts = np.zeros(num_classes, np.float64)
    for labels in labels_iter:
        counts += np.bincount(np.asarray(labels).reshape(-1),
                              minlength=num_classes)
    counts[counts == 0] = 1
    w = 1.0 / counts
    return w / w.sum() * num_classes


# ----------------------------------------------------------- autoanchor --
def kmean_anchors(wh: np.ndarray, n: int = 9, img_size: int = 640,
                  iters: int = 100, seed: int = 0):
    """k-means anchors over box wh (reference: autoanchor.py:61-140).
    wh (N,2) in pixels at img_size scale; returns (n,2) sorted by area."""
    rng = np.random.RandomState(seed)
    wh = wh[(wh >= 2.0).all(1)]
    # k-means in wh space with IoU-style metric (min ratio)
    idx = rng.choice(len(wh), n, replace=False)
    centers = wh[idx].copy()
    for _ in range(iters):
        r = wh[:, None] / centers[None]
        sim = np.minimum(r, 1 / r).min(-1)  # (N, n)
        assign = sim.argmax(1)
        for k in range(n):
            sel = wh[assign == k]
            if len(sel):
                centers[k] = sel.mean(0)
    return centers[np.argsort(centers.prod(1))]


def check_anchors(wh: np.ndarray, anchors: np.ndarray, thr: float = 4.0):
    """Best-possible-recall metric (reference: autoanchor.py:27-58)."""
    r = wh[:, None] / anchors[None]
    ratio = np.minimum(r, 1 / r).min(-1)
    best = ratio.max(1)
    bpr = (best > 1 / thr).mean()
    return float(bpr)

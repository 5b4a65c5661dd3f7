"""PyTorch checkpoint → Flax pytree weight porter (SURVEY §7.1: the
reference ships .pth checkpoints; BASELINE asks for ported weights).

Tensor-layout conversions:
  * Conv2d weight  OIHW → HWIO  (groups included: torch stores (O, I/g, H, W))
  * ConvTranspose2d IOHW → HWIO with flipped spatial? — flax ConvTranspose
    kernels are HWIO with *same* orientation; torch stores (I, O, H, W)
  * Linear (out, in) → (in, out)
  * BatchNorm weight/bias/running_mean/running_var →
    scale/bias + batch_stats mean/var

Key mapping is rule-based: an ordered list of (regex, replacement) pairs
per model family translates torch dotted names to flax tree paths
('a/b/c').  ``port_state_dict`` returns {'params': ..., 'batch_stats': ...}
pytrees ready for ``TrainState.replace``.
"""
from __future__ import annotations

import re
from typing import Iterable, Mapping, Sequence

import numpy as np


def convert_tensor(name: str, t, transposed: bool = False
                   ) -> tuple[str, np.ndarray, str]:
    """Returns (leaf_name, array, collection) for one torch tensor.

    ``transposed`` marks ConvTranspose2d weights, whose torch layout is
    (in, out, kH, kW) — NOT the Conv2d (out, in, kH, kW) — so they need
    (2,3,0,1) to reach flax's HWIO, not the default (2,3,1,0) (which would
    silently swap in/out channels whenever in == out).
    """
    a = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
    if name.endswith(".running_mean"):
        return "mean", a, "batch_stats"
    if name.endswith(".running_var"):
        return "var", a, "batch_stats"
    if name.endswith(".num_batches_tracked"):
        return "", a, "skip"
    leaf = name.rsplit(".", 1)[-1]
    if leaf == "weight":
        if a.ndim == 4:  # conv OIHW → HWIO; deconv IOHW → HWIO
            return ("kernel",
                    a.transpose(2, 3, 0, 1) if transposed
                    else a.transpose(2, 3, 1, 0),
                    "params")
        if a.ndim == 2:  # linear
            return "kernel", a.T, "params"
        return "scale", a, "params"  # norm affine weight
    if leaf == "bias":
        return "bias", a, "params"
    return leaf, a, "params"


def _set_path(tree: dict, path: Sequence[str], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def port_state_dict(
    state_dict: Mapping[str, "np.ndarray"],
    rules: Iterable[tuple[str, str]],
    strict: bool = False,
    transposed_patterns: Iterable[str] = (),
) -> dict:
    """Map torch ``state_dict`` into flax {'params', 'batch_stats'} trees.

    rules: ordered (regex, replacement) applied to each torch key's module
    path (without the trailing .weight/.bias/...); the result is the flax
    path joined by '/'.  A rule mapping to '' drops the entry.
    transposed_patterns: regexes over the module path marking
    ConvTranspose2d modules (IOHW weight layout).
    """
    params: dict = {}
    batch_stats: dict = {}
    unmatched = []
    transposed_patterns = list(transposed_patterns)
    for name, tensor in state_dict.items():
        module_path = name.rsplit(".", 1)[0]
        is_transposed = any(
            re.fullmatch(p, module_path) for p in transposed_patterns)
        leaf, arr, coll = convert_tensor(name, tensor,
                                         transposed=is_transposed)
        if coll == "skip":
            continue
        flax_path = None
        for pattern, repl in rules:
            m = re.fullmatch(pattern, module_path)
            if m:
                flax_path = m.expand(repl)
                break
        if flax_path is None:
            unmatched.append(name)
            continue
        if flax_path == "":
            continue
        parts = flax_path.split("/") + [leaf]
        _set_path(params if coll == "params" else batch_stats, parts, arr)
    if strict and unmatched:
        raise KeyError(f"unmatched torch keys: {unmatched[:10]}"
                       f"{'...' if len(unmatched) > 10 else ''}")
    return {"params": params, "batch_stats": batch_stats}


def verify_tree_shapes(ported: dict, target: dict, path=""):
    """Recursively compare a ported tree against a model's init tree;
    returns list of mismatch strings (empty = compatible)."""
    errs = []
    t_keys = set(target)
    p_keys = set(ported)
    for k in sorted(t_keys - p_keys):
        errs.append(f"missing {path}/{k}")
    for k in sorted(p_keys - t_keys):
        errs.append(f"extra {path}/{k}")
    for k in sorted(t_keys & p_keys):
        tv, pv = target[k], ported[k]
        if isinstance(tv, dict):
            errs.extend(verify_tree_shapes(pv, tv, f"{path}/{k}"))
        else:
            if tuple(np.shape(pv)) != tuple(np.shape(tv)):
                errs.append(
                    f"shape {path}/{k}: ported {np.shape(pv)} vs model {np.shape(tv)}")
    return errs


# -- per-family rule tables (extend as checkpoints become available) -------
CONVBNACT_RULES = [
    # torch 'conv' / 'bn' submodules inside a module path map 1:1
    (r"(.*)\.conv", r"\1/conv"),
    (r"(.*)\.bn", r"\1/bn"),
]

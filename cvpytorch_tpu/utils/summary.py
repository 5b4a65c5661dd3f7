"""Model summary: per-module parameter counts + analytical FLOPs
(parity with the reference's thop-based ``utils/visualize.py:11`` and
``utils/torchsummary.py:11`` — nothing in the reference beyond a
params/FLOPs printout, so this matches that surface with XLA's own cost
model instead of thop's per-layer hooks).

FLOPs come from ``jax.jit(...).lower(...).cost_analysis()`` on the
**forward** pass — the compiler's count of the optimized HLO, which is
what actually runs on the TPU (fused/simplified ops included, unlike
hook-based counters)."""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _tree_param_counts(params) -> dict[str, int]:
    """Top-level module → parameter count."""
    out: dict[str, int] = {}
    for k, sub in dict(params).items():
        out[k] = sum(int(np.prod(x.shape))
                     for x in jax.tree_util.tree_leaves(sub))
    return out


def model_summary(model, input_shape=(1, 224, 224, 3), targets: Any = None,
                  mode: str = "infer", rng_seed: int = 0) -> dict:
    """→ {'total_params', 'params_by_module', 'flops', 'flops_g',
    'bytes_accessed'}  (flops may be None if the backend's cost analysis
    is unavailable)."""
    rng = jax.random.PRNGKey(rng_seed)
    x = jnp.zeros(input_shape, jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x,
                           targets, mode=mode)
    params = variables.get("params", {})
    by_module = _tree_param_counts(params)
    total = sum(by_module.values())

    flops = bytes_accessed = None
    try:
        def fwd(v, imgs):
            return model.apply(v, imgs, targets, mode=mode)

        lowered = jax.jit(fwd).lower(variables, x)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        if cost:
            flops = float(cost.get("flops", 0.0)) or None
            bytes_accessed = float(cost.get("bytes accessed", 0.0)) or None
    except Exception:
        pass
    return {
        "total_params": total,
        "params_by_module": by_module,
        "flops": flops,
        "flops_g": round(flops / 1e9, 3) if flops else None,
        "bytes_accessed": bytes_accessed,
        "input_shape": tuple(input_shape),
    }


def format_summary(info: dict, name: str = "model") -> str:
    lines = [f"{name}  (input {info['input_shape']})",
             "-" * 52]
    for k, v in sorted(info["params_by_module"].items(),
                       key=lambda kv: -kv[1]):
        lines.append(f"  {k:<30s} {v / 1e6:10.3f} M")
    lines.append("-" * 52)
    lines.append(f"  {'TOTAL params':<30s} "
                 f"{info['total_params'] / 1e6:10.3f} M")
    if info.get("flops_g"):
        lines.append(f"  {'forward FLOPs (XLA)':<30s} "
                     f"{info['flops_g']:10.3f} G")
    return "\n".join(lines)

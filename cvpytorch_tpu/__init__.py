"""cvpytorch_tpu — a TPU-native (JAX/Flax/pjit/Pallas) computer-vision
training + inference framework with the capabilities of
shanglianlm0525/CvPytorch (reference at /root/reference, see SURVEY.md).

Not a port: the compute path is functional JAX over a device mesh; the
reference's DDP/AMP/SyncBN/NMS machinery maps to sharded jit, bf16,
cross-replica BN and Pallas kernels.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: TPU compiles of the big train-step
# programs take minutes (remote compile); repeat runs hit the cache.
try:
    import jax as _jax

    _cache_dir = _os.environ.get(
        "CVT_JAX_CACHE", _os.path.expanduser("~/.cache/jax_comp"))
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from .config import CommonConfiguration, Configuration  # noqa: F401
from . import registry  # noqa: F401

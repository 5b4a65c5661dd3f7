"""Seeding (reference: src/utils/torch_utils.py:16-25, seed pinned to 1029
at trainer.py:55).  JAX PRNG is explicit and deterministic by construction;
this helper just centralises root-key creation and numpy seeding for the
host-side data pipeline."""
from __future__ import annotations

import random

import jax
import numpy as np

DEFAULT_SEED = 1029


def setup_seed(seed: int = DEFAULT_SEED) -> jax.Array:
    random.seed(seed)
    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)

"""Test harness: 8 virtual CPU devices so sharding/mesh tests run without
TPUs (SURVEY §4 — the reference has no test suite; we add one).

The environment may pre-register a TPU platform via sitecustomize before
this file runs, so we force CPU through jax.config (env vars alone are read
too early).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from cvpytorch_tpu.parallel.mesh import create_mesh

    return create_mesh(data=8)


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPUs via
`--xla_force_host_platform_device_count` (cf. SURVEY.md §4).

Note: this environment's sitecustomize imports jax at interpreter startup
(JAX_PLATFORMS=axon), so env vars set here are too late for import-time
config — but the backend is initialised lazily, so `jax.config.update`
before the first `jax.devices()` call still wins.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)

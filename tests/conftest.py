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

# Persistent compilation cache: the suite is compile-dominated (the jitted
# tracker_step alone costs ~30-45 s per distinct shape/config signature), and
# most tests recompile identical programs across pytest runs.  Cache entries
# are keyed on the serialized HLO + compile options, so source edits that
# change the program never hit a stale entry.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PFMPE_JAX_CACHE", os.path.expanduser("~/.cache/pfmpe_jax_cache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)

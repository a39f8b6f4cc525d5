"""Persistent XLA compilation cache (VERDICT r4 #10).

The reference node starts instantly (pf_mpe/src/node.cpp:28-37 — C++ is
ahead-of-time compiled); this engine's flagship step costs ~60 s of XLA
compilation cold.  JAX's persistent compilation cache closes the gap for
every start after the first: compiled executables are serialised to an
on-disk directory keyed by (HLO, compile options, backend) and warm
starts deserialise instead of recompiling.

The test suite configures its own cache directory in tests/conftest.py
(same mechanism, different directory); the CLI and bench call this
helper.  Opt out with --no-cache / PFMPE_NO_COMPILE_CACHE=1.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_persistent_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache.  Returns the directory
    actually used, or None when disabled via PFMPE_NO_COMPILE_CACHE."""
    if os.environ.get("PFMPE_NO_COMPILE_CACHE", "") not in ("", "0"):
        return None
    import jax

    cache_dir = cache_dir or os.environ.get("PFMPE_COMPILE_CACHE_DIR", DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache every entry regardless of size, and anything that took
    # meaningful compile time (the big tracker step is minutes-scale;
    # small helper jits are cheap either way)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir

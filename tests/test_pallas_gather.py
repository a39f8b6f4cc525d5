"""Windowed one-hot MXU resampling gather (pf/pallas_gather.py):
bit-identity with the XLA gather, coverage fallback, edge blocks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf_monocular_pose_estimator_tpu.pf.pallas_gather import (
    monotone_gather,
    monotone_gather_pallas,
)
from pf_monocular_pose_estimator_tpu.pf.soa import gather_soa


def _bank(n, seed=0):
    # realistic pose-bank rows: rows 0-11 arbitrary, 12-15 rigid bottom row
    b = np.array(jax.random.normal(jax.random.PRNGKey(seed), (16, n)), np.float32)
    b[12:15] = 0.0
    b[15] = 1.0
    return jnp.asarray(b)


def _fallback(bank16, anc):
    return gather_soa(bank16, anc)


def _starts(anc, n, block, window):
    nb = -(-n // block)
    pad = nb * block - n
    anc_p = jnp.concatenate([anc, jnp.full((pad,), anc[-1], anc.dtype)]) if pad else anc
    firsts = anc_p[::block]
    return jnp.clip(firsts, 0, max(n - window, 0)).astype(jnp.int32)


@pytest.mark.parametrize("n,block,window", [(4096, 512, 2048), (4608, 512, 2048)])
def test_kernel_bit_identical_to_gather(n, block, window):
    """Uniform-ish resampling (ancestor spans well inside the window):
    the MXU one-hot selection reproduces the XLA gather bit-for-bit."""
    bank = _bank(n)
    anc = jnp.sort(jax.random.randint(jax.random.PRNGKey(3), (n,), 0, n)).astype(jnp.int32)
    want = gather_soa(bank, anc)
    got = monotone_gather_pallas(
        bank, anc, _starts(anc, n, block, window),
        block=block, window=window, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_duplicates_and_skips():
    """Heavy count skew within coverage: long runs (counts >> 1) and
    skipped ancestors still select exactly."""
    n, block, window = 4096, 512, 2048
    bank = _bank(n, seed=5)
    # 90% of draws from one particle per kilo-block: runs + jumps
    rng = np.random.default_rng(0)
    anc = np.sort(
        np.concatenate([
            np.full(n // 2, 100, np.int32),
            np.full(n // 4, 900, np.int32),
            rng.integers(1000, 2000, n // 8).astype(np.int32),
            rng.integers(2000, min(2048 + 1500, n), n - n // 2 - n // 4 - n // 8).astype(np.int32),
        ])
    )
    anc = jnp.asarray(anc)
    want = gather_soa(bank, anc)
    got = monotone_gather(bank, anc, _fallback, block=block, window=window, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_coverage_fallback_fires():
    """A frame whose per-block ancestor span exceeds the window must take
    the XLA fallback and still be exact."""
    n, block, window = 4096, 512, 1024
    bank = _bank(n, seed=7)
    # block 0 draws from both ends of the bank -> span ~n >> window
    anc = np.sort(
        np.concatenate([
            np.zeros(block // 2, np.int32),
            np.full(n - block // 2, n - 1, np.int32),
        ])
    )
    anc = jnp.asarray(anc)
    want = gather_soa(bank, anc)
    got = monotone_gather(bank, anc, _fallback, block=block, window=window, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # and the condition really is un-covered (the kernel path would need
    # window >= span)
    starts = _starts(anc, n, block, window)
    lasts = anc[block - 1 :: block]
    assert not bool(jnp.all(lasts - starts < window))


def test_tiny_bank_uses_fallback():
    n = 512
    bank = _bank(n, seed=9)
    anc = jnp.sort(jax.random.randint(jax.random.PRNGKey(1), (n,), 0, n)).astype(jnp.int32)
    got = monotone_gather(bank, anc, _fallback, block=512, window=2048, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(gather_soa(bank, anc)))

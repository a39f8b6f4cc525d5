"""Empirical VPU speed-of-light measurement for the README's
speed-of-light accounting (round-1 VERDICT gap #8).

Measures sustained f32 elementwise FMA throughput on bank-shaped
(8, N) arrays via a lax.scan-carried chain (one dispatch, carry
dependence defeats loop-invariant hoisting), and the same for a
min/select chain (the greedy matcher's op mix).  The fused PF kernel's
useful-op count divided by this ceiling gives the kernel's fraction of
VPU speed-of-light.

Usage: python benchmarks/vpu_ceiling.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 1 << 18  # lanes (larger arrays stalled the tunneled chip's claim path)
ROWS = 8
DEPTH = 64  # chained ops per scan step
ITERS = 20


def bench(name, step_fn, flops_per_elem):
    def body(carry, _):
        return step_fn(carry), None

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=ITERS)
        return y

    print(f"compiling {name}...", flush=True)
    x = jnp.ones((ROWS, N), jnp.float32) * 1.000001
    r = run(x)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(x)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    total = ROWS * N * flops_per_elem * ITERS
    print(f"{name:28s} {total / dt / 1e12:6.2f} Tops/s  ({dt / ITERS * 1e3:.3f} ms/step)")
    return total / dt


def fma_chain(x):
    a = jnp.float32(1.0000001)
    b = jnp.float32(-1e-7)
    for _ in range(DEPTH):
        x = x * a + b
    return x


def minsel_chain(x):
    # the greedy matcher's mix: compare + select
    c = jnp.float32(0.5)
    for _ in range(DEPTH // 2):
        m = x > c
        x = jnp.where(m, x * jnp.float32(0.999999), x + jnp.float32(1e-7))
    return x


if __name__ == "__main__":
    print(f"device: {jax.devices()[0].device_kind}, array (8, {N}) f32", flush=True)
    bench("FMA chain (2 flops/op)", fma_chain, 2 * DEPTH)
    bench("compare+select chain", minsel_chain, 2 * (DEPTH // 2))

"""Hardware validation + scan-slope timing for pf.pallas_resample.

Checks (on the real chip):
  1. fast-path coverage on realistic PF weights,
  2. bit-exact gathered columns vs the rank oracle (rank -> counts ->
     repeat-based ancestors, computed in numpy from the same probe_rank),
  3. scan-slope timing vs the production sort+gather path.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pf_monocular_pose_estimator_tpu.pf.pallas_resample import (
    probe_rank, resample_bank_pallas,
)
from pf_monocular_pose_estimator_tpu.pf.soa import stratified_resample_soa, gather_soa
from pf_monocular_pose_estimator_tpu.pf.pallas_step import bank_layout_pin  # noqa: F401  (import parity)

N = 100_000
key = jax.random.PRNGKey(7)
kw, kb, kr = jax.random.split(key, 3)
# realistic post-PF weights: a moderately peaked bank
logits = 2.0 * jax.random.normal(kw, (N,), jnp.float32)
w = jax.nn.softmax(logits)
bank = jax.random.normal(kb, (16, N), jnp.float32)

def fallback(k, ww, b16):
    anc, counts, most = stratified_resample_soa(k, ww)
    return gather_soa(b16, anc), most

out, most = jax.jit(
    lambda k, ww, b16: resample_bank_pallas(k, ww, b16, fallback)
)(kr, w, bank)
out = np.asarray(out)

# rank oracle
rank, counts, most_o = jax.jit(probe_rank)(kr, w)
rank = np.asarray(rank); counts = np.asarray(counts)
anc = np.repeat(np.arange(N), counts)
assert anc.shape[0] == N, anc.shape
ref = np.asarray(bank)[:, anc]
mism = np.sum(np.any(out != ref, axis=0))
print("mismatched slots vs rank oracle:", int(mism), "/", N)
print("most agree:", int(most) == int(most_o), int(most), int(most_o))

# also compare assignment vs the production sort path (tolerance class)
anc_s, counts_s, most_s = jax.jit(stratified_resample_soa)(kr, w)
anc_s = np.asarray(anc_s)
diff = np.sum(anc != anc_s)
print("assignment diff vs sort path:", int(diff), f"({100.0*diff/N:.4f}%)")

# scan-slope timing: run the resample body R times chained inside one jit
def chain(fn, reps):
    def body(c, _):
        k, b16 = c
        k2 = jax.random.fold_in(k, 0)
        o, m = fn(k2, w, b16)
        # feed output back (prevents DCE), perturb key
        return (k2, o), m
    def run(k, b16):
        (kf, bf), ms = jax.lax.scan(body, (k, b16), None, length=reps)
        return bf, ms
    return jax.jit(run)

for name, fn in [("pallas", lambda k, ww, b16: resample_bank_pallas(k, ww, b16, fallback)),
                 ("sort+gather", fallback)]:
    f1 = chain(lambda k, ww, b16=None, _fn=fn: _fn(k, ww, b16), 1) if False else None
    for reps in (4, 64):
        f = chain(lambda k, ww, b16, _fn=fn: _fn(k, ww, b16), reps)
        r = f(kr, bank); jax.block_until_ready(r)
        t0 = time.perf_counter(); r = f(kr, bank); jax.block_until_ready(r)
        t1 = time.perf_counter()
        if reps == 4: t_low = (t1 - t0)
        else: t_high = (t1 - t0)
    per = (t_high - t_low) / (64 - 4)
    print(f"{name}: {per*1e6:.1f} us/resample (scan slope)")

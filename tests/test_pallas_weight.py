"""Equivalence of the fused Pallas PF weight kernel with the XLA SoA path.

Runs the Pallas interpreter on CPU (conftest forces the cpu backend) so
the kernel logic — projection, greedy matching, reuse/downgrade
penalties, masking, ragged final block — is pinned against
`weight_particles_soa`, itself pinned against the AoS reference port in
tests/test_soa.py.  Reference: pose_estimator.cpp:2385-2445.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf_monocular_pose_estimator_tpu.geometry.camera import project
from pf_monocular_pose_estimator_tpu.geometry.se3 import exp_se3
from pf_monocular_pose_estimator_tpu.io.synthetic import default_camera, demo_markers
from pf_monocular_pose_estimator_tpu.pf.pallas_weight import weight_particles_pallas
from pf_monocular_pose_estimator_tpu.pf.soa import pack, weight_particles_soa


def _scene(seed, n, k_cap=16, spread=0.05, det_noise=1.5):
    rng = np.random.default_rng(seed)
    camera = default_camera()
    markers = demo_markers()
    m = markers.shape[0]
    base = np.eye(4, dtype=np.float32)
    base[2, 3] = 1.4
    tw = jnp.asarray(rng.normal(0, spread, (n, 6)), jnp.float32)
    bank16 = pack(jax.vmap(lambda t: jnp.asarray(base) @ exp_se3(t))(tw))
    uv = np.asarray(project(camera, jnp.asarray(base), markers))
    det_xy = np.zeros((k_cap, 2), np.float32)
    det_xy[:m] = uv + rng.normal(0, det_noise, (m, 2))
    det_mask = np.zeros((k_cap,), bool)
    det_mask[:m] = True
    return camera, markers, bank16, det_xy, det_mask


@pytest.mark.parametrize("seed,n", [(0, 600), (1, 1024), (2, 777)])
def test_pallas_weight_matches_soa(seed, n):
    camera, markers, bank16, det_xy, det_mask = _scene(seed, n)
    m = markers.shape[0]
    marker_mask = np.ones((m,), bool)
    downgrade = np.zeros((m,), bool)
    args = (
        camera, bank16, markers, jnp.asarray(marker_mask),
        jnp.asarray(det_xy), jnp.asarray(det_mask), 10.0, 5.0,
        jnp.asarray(downgrade),
    )
    w0, p0, n0 = weight_particles_soa(*args)
    w1, p1, n1 = weight_particles_pallas(*args, block=256, interpret=True)
    np.testing.assert_allclose(w0, w1, atol=1e-4)
    assert (p0 == p1).all()
    assert (n0 == n1).all()


def test_pallas_weight_masks_penalties_and_clones():
    """Masked marker + masked detections + spurious clone + downgrade —
    every penalty branch and both mask paths in one scene."""
    camera, markers, bank16, det_xy, det_mask = _scene(3, 500)
    m = markers.shape[0]
    det_xy[m] = det_xy[0] + [2.0, 1.0]  # clone near detection 0
    det_mask[m] = True
    marker_mask = np.ones((m,), bool)
    marker_mask[m - 1] = False
    downgrade = np.zeros((m,), bool)
    downgrade[1] = True
    args = (
        camera, bank16, markers, jnp.asarray(marker_mask),
        jnp.asarray(det_xy), jnp.asarray(det_mask), 10.0, 5.0,
        jnp.asarray(downgrade),
    )
    w0, p0, n0 = weight_particles_soa(*args)
    w1, p1, n1 = weight_particles_pallas(*args, block=128, interpret=True)
    np.testing.assert_allclose(w0, w1, atol=1e-4)
    assert (p0 == p1).all()
    assert (n0 == n1).all()
    # the clone forces at least one reuse penalty somewhere
    assert (np.asarray(n0) < m).any() or (np.asarray(w0) < np.asarray(w0).max()).any()


def test_pallas_weight_no_detections():
    camera, markers, bank16, det_xy, det_mask = _scene(4, 300)
    det_mask[:] = False
    m = markers.shape[0]
    args = (
        camera, bank16, markers, jnp.ones((m,), bool),
        jnp.asarray(det_xy), jnp.asarray(det_mask), 10.0, 5.0,
        jnp.zeros((m,), bool),
    )
    w1, p1, n1 = weight_particles_pallas(*args, block=128, interpret=True)
    assert (np.asarray(w1) == 0).all()
    assert (np.asarray(n1) == 0).all()
    assert (np.asarray(p1) == -1).all()


def test_pallas_weight_traced_tolerances_no_recompile():
    """Tolerances are traced operands: two different values reuse one
    compiled executable (the dynamic-params tier, cfg:12-40)."""
    camera, markers, bank16, det_xy, det_mask = _scene(5, 256)
    m = markers.shape[0]

    calls = []

    @jax.jit
    def run(tol_pf, tol_init):
        calls.append(1)
        return weight_particles_pallas(
            camera, bank16, markers, jnp.ones((m,), bool),
            jnp.asarray(det_xy), jnp.asarray(det_mask), tol_pf, tol_init,
            jnp.zeros((m,), bool), block=128, interpret=True,
        )[0]
    w_a = run(jnp.float32(10.0), jnp.float32(5.0))
    w_b = run(jnp.float32(4.0), jnp.float32(5.0))
    assert len(calls) == 1  # one trace, two tolerance values
    assert not np.allclose(w_a, w_b)  # and the tolerance actually bites

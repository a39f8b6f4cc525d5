"""Unit tests for the quartic and P3P solvers (SURVEY.md §7 layer 2)."""

import jax.numpy as jnp
import numpy as np

from pf_monocular_pose_estimator_tpu.geometry import Camera, bearing_vectors, exp_se3, project_points
from pf_monocular_pose_estimator_tpu.solvers import (
    combination_table,
    p3p_kneip,
    p3p_object_to_camera,
    permutation_table,
    solve_quartic,
)


def test_quartic_known_roots():
    # (x-1)(x-2)(x-3)(x-4) = x^4 - 10x^3 + 35x^2 - 50x + 24
    coeffs = jnp.asarray([[1.0, -10.0, 35.0, -50.0, 24.0]], dtype=jnp.float64
                         if jnp.zeros(1).dtype == jnp.float64 else jnp.float32)
    roots = np.sort(np.asarray(solve_quartic(coeffs))[0])
    np.testing.assert_allclose(roots, [1, 2, 3, 4], atol=5e-3)


def test_quartic_batch_random(rng):
    # Build quartics from random real roots and check recovery.
    true_roots = np.sort(rng.uniform(-1, 1, size=(32, 4)), axis=-1)
    coeffs = np.stack([np.poly(r) for r in true_roots]).astype(np.float32)
    got = np.sort(np.asarray(solve_quartic(jnp.asarray(coeffs))), axis=-1)
    np.testing.assert_allclose(got, true_roots, atol=5e-3)


def _camera():
    return Camera.create(fx=620.0, fy=620.0, cx=376.0, cy=240.0)


def test_p3p_recovers_pose(rng):
    cam = _camera()
    pts = np.array(
        [[0.07, 0.08, 0.06], [0.04, -0.09, 0.03], [-0.065, -0.088, 0.083]], dtype=np.float32
    )
    for trial in range(10):
        xi = np.concatenate([rng.normal(size=3) * 0.2, rng.normal(size=3) * 0.5]).astype(np.float32)
        t_oc = np.array(exp_se3(jnp.asarray(xi)))
        t_oc[2, 3] += 2.0  # keep the object in front of the camera
        uv = np.asarray(project_points(cam, jnp.asarray(t_oc), jnp.asarray(pts)))
        fv = np.asarray(bearing_vectors(cam, jnp.asarray(uv)))
        sols, valid = p3p_kneip(jnp.asarray(fv)[None], jnp.asarray(pts)[None])
        assert bool(valid[0])
        t_candidates = np.asarray(p3p_object_to_camera(sols))[0]  # (4,4,4)
        errs = [np.abs(t - t_oc).max() for t in t_candidates if np.isfinite(t).all()]
        assert min(errs) < 2e-2, f"trial {trial}: best err {min(errs)}"


def test_p3p_collinear_flagged():
    cam = _camera()
    pts = np.array([[0, 0, 0], [0.05, 0, 0], [0.1, 0, 0]], dtype=np.float32)
    eye = jnp.eye(4, dtype=jnp.float32)
    uv = project_points(cam, eye, jnp.asarray(pts + [0, 0, 2.0], dtype=np.float32))
    fv = bearing_vectors(cam, uv)
    _, valid = p3p_kneip(jnp.asarray(fv)[None], jnp.asarray(pts)[None])
    assert not bool(valid[0])


def test_p3p_batched_shapes(rng):
    fv = jnp.asarray(rng.normal(size=(17, 3, 3)), dtype=jnp.float32)
    fv = fv / jnp.linalg.norm(fv, axis=-1, keepdims=True)
    wp = jnp.asarray(rng.normal(size=(17, 3, 3)), dtype=jnp.float32)
    sols, valid = p3p_kneip(fv, wp)
    assert sols.shape == (17, 4, 4, 4)
    assert valid.shape == (17,)


def test_combination_table():
    t = combination_table(5, 3)
    assert t.shape == (10, 3)
    assert t.min() == 0 and t.max() == 4
    # all rows strictly increasing and unique
    assert all(list(r) == sorted(set(r)) for r in t.tolist())


def test_permutation_table():
    t = permutation_table(5, 3)
    assert t.shape == (60, 3)
    assert len({tuple(r) for r in t.tolist()}) == 60


def test_tables_empty_when_insufficient():
    assert combination_table(2, 3).shape == (0, 3)
    assert permutation_table(1, 3).shape == (0, 3)

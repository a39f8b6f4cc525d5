"""Unit tests for SE(3), camera, and alignment (SURVEY.md §7 layer 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf_monocular_pose_estimator_tpu.geometry import (
    Camera,
    bearing_vectors,
    distort_pixels,
    exp_se3,
    inverse,
    log_se3,
    project_points,
    rotation_rpy,
    skew,
    umeyama_rigid,
    undistort_pixels,
)
from pf_monocular_pose_estimator_tpu.geometry.se3 import predict_constant_velocity


def random_twists(rng, n, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 6)) * scale, dtype=jnp.float32)


def test_skew_antisymmetric(rng):
    w = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    s = skew(w)
    np.testing.assert_allclose(np.asarray(s + jnp.swapaxes(s, -1, -2)), 0.0, atol=1e-7)
    v = jnp.asarray(rng.normal(size=(5, 3)), dtype=jnp.float32)
    np.testing.assert_allclose(
        np.asarray((s @ v[..., None])[..., 0]), np.cross(np.asarray(w), np.asarray(v)), atol=1e-6
    )


def test_exp_log_roundtrip(rng):
    xi = random_twists(rng, 64, scale=0.8)
    back = log_se3(exp_se3(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=2e-5)


def test_exp_log_small_angle(rng):
    xi = random_twists(rng, 16, scale=1e-5)
    back = log_se3(exp_se3(xi))
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-7)


def test_exp_identity():
    t = exp_se3(jnp.zeros((6,)))
    np.testing.assert_allclose(np.asarray(t), np.eye(4), atol=1e-7)


def test_exp_is_rigid(rng):
    xi = random_twists(rng, 32)
    t = exp_se3(xi)
    r = np.asarray(t[..., :3, :3])
    np.testing.assert_allclose(r @ r.transpose(0, 2, 1), np.broadcast_to(np.eye(3), r.shape), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-5)


def test_inverse(rng):
    t = exp_se3(random_twists(rng, 8))
    prod = t @ inverse(t)
    np.testing.assert_allclose(np.asarray(prod), np.broadcast_to(np.eye(4), prod.shape), atol=1e-6)


def test_rotation_rpy_matches_composition(rng):
    ang = jnp.asarray(rng.uniform(-1, 1, size=(10, 3)), dtype=jnp.float32)

    def single(a, b, c):
        rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
        ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
        rz = np.array([[np.cos(c), -np.sin(c), 0], [np.sin(c), np.cos(c), 0], [0, 0, 1]])
        return rz @ ry @ rx

    got = np.asarray(rotation_rpy(ang))[:, :3, :3]
    want = np.stack([single(*np.asarray(a)) for a in ang])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_constant_velocity_prediction():
    # Pure x-translation at constant speed: prediction continues it.
    prev = np.eye(4)
    cur = np.eye(4)
    cur[0, 3] = 1.0
    pred = predict_constant_velocity(
        jnp.asarray(prev, jnp.float32), jnp.asarray(cur, jnp.float32), jnp.asarray(1.0), jnp.asarray(0.5)
    )
    predicted = np.asarray(jnp.asarray(cur, jnp.float32) @ pred)
    np.testing.assert_allclose(predicted[0, 3], 1.5, atol=1e-5)


@pytest.fixture
def camera():
    return Camera.create(
        fx=621.75, fy=621.39, cx=404.95, cy=238.26,
        dist=[-0.36, 0.13, 0.0005, -0.0005, 0.0], width=752, height=480,
    )


def test_project_center(camera):
    pts = jnp.asarray([[0.0, 0.0, 2.0]], dtype=jnp.float32)
    uv = project_points(camera, jnp.eye(4, dtype=jnp.float32), pts)
    np.testing.assert_allclose(np.asarray(uv[0]), [404.95, 238.26], atol=1e-4)


def test_project_batched_shapes(camera, rng):
    banks = exp_se3(random_twists(rng, 7, 0.1))
    pts = jnp.asarray(rng.normal(size=(5, 3)) * 0.1 + [0, 0, 2.0], dtype=jnp.float32)
    uv = project_points(camera, banks, pts)
    assert uv.shape == (7, 5, 2)


def test_distort_undistort_roundtrip(camera, rng):
    pix = jnp.asarray(rng.uniform([100, 100], [650, 380], size=(50, 2)), dtype=jnp.float32)
    dist = distort_pixels(camera, pix)
    undist = undistort_pixels(camera, dist)
    np.testing.assert_allclose(np.asarray(undist), np.asarray(pix), atol=2e-2)


def test_bearing_vectors(camera):
    uv = jnp.asarray([[camera.cx, camera.cy]], dtype=jnp.float32)
    v = bearing_vectors(camera, uv)
    np.testing.assert_allclose(np.asarray(v[0]), [0, 0, 1], atol=1e-6)


def test_umeyama_recovers_pose(rng):
    src = jnp.asarray(rng.normal(size=(6, 3)), dtype=jnp.float32)
    t_true = exp_se3(jnp.asarray(rng.normal(size=(6,)) * 0.5, dtype=jnp.float32))
    dst = (t_true[:3, :3] @ src.T).T + t_true[:3, 3]
    t_est = umeyama_rigid(src, dst)
    np.testing.assert_allclose(np.asarray(t_est), np.asarray(t_true), atol=1e-5)


def test_umeyama_weighted(rng):
    src = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
    t_true = exp_se3(jnp.asarray(rng.normal(size=(6,)) * 0.3, dtype=jnp.float32))
    dst = (t_true[:3, :3] @ src.T).T + t_true[:3, 3]
    # Corrupt two points but zero their weights.
    dst = dst.at[6:].add(10.0)
    w = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], dtype=jnp.float32)
    t_est = umeyama_rigid(src, dst, w)
    np.testing.assert_allclose(np.asarray(t_est), np.asarray(t_true), atol=1e-5)


def test_geometry_jit_compatible(camera, rng):
    @jax.jit
    def fn(xi, pts):
        t = exp_se3(xi)
        return project_points(camera, t, pts)

    out = fn(random_twists(rng, 3, 0.1), jnp.asarray(rng.normal(size=(4, 3)) + [0, 0, 3], dtype=jnp.float32))
    assert out.shape == (3, 4, 2)

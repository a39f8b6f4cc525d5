"""Visualization colour-coding parity (visualization.cpp:260-286).

True detections draw green (r=5), injected/fake yellow (r=8), occluded
red (r=8); a lost track shows the red banner.  Driven through a real
fault-injected tracker frame so the occluded/injected provenance flags
are exercised end-to-end, not just unit-level.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pf_monocular_pose_estimator_tpu.geometry.se3 import exp_se3
from pf_monocular_pose_estimator_tpu.io.synthetic import (
    default_camera,
    demo_markers,
    render_frame,
)
from pf_monocular_pose_estimator_tpu.io.viz import _COLORS, render_overlay
from pf_monocular_pose_estimator_tpu.tracker import TargetState, tracker_step
from pf_monocular_pose_estimator_tpu.utils import TrackerConfig


def _has_color(img, color):
    return bool(np.any(np.all(img == np.asarray(color, np.uint8), axis=-1)))


def _run_fault_frame(num_occlusions, num_false):
    camera = default_camera()
    markers = demo_markers()
    mask = jnp.ones((markers.shape[0],), bool)
    config = TrackerConfig(
        n_particles=256,
        min_blob_area=8.0,
        pf_max_retries=4,
        number_of_occlusions=num_occlusions,
        number_of_false_detections=num_false,
        pf_init_min_markers=3,
    )
    # gentle pose: all 5 markers resolve to distinct blobs
    pose = np.array(exp_se3(jnp.asarray([0.0, 0.0, 0.0, 0.05, -0.05, 0.02], jnp.float32)))
    pose[2, 3] += 1.3
    frame = render_frame(camera, jnp.asarray(pose), markers)
    state = TargetState.create(config.n_particles, jax.random.PRNGKey(3))
    step = jax.jit(
        lambda s, im, t: tracker_step(s, im, t, camera, markers, mask, config)
    )
    # a few frames so fault injection has real detections to act on
    res = None
    for i in range(6):
        state, res = step(state, frame, jnp.asarray(0.02 * (i + 1), jnp.float32))
    return frame, camera, state, res


def test_overlay_draws_fault_colour_codes():
    # several frames of 3 coin-flip occlusions + 2 injections: at least one
    # frame shows both provenance classes with overwhelming probability
    frame, camera, state, res = None, None, None, None
    saw_occ = saw_inj = False
    camera = default_camera()
    for seed_frames in range(1):
        frame, camera, state, res = _run_fault_frame(3, 2)
        occ = np.asarray(res.detections_occluded)
        inj = np.asarray(res.detections_injected)
        saw_occ |= bool(occ.any())
        saw_inj |= bool(inj.any())
    img = render_overlay(frame, camera, res)
    if saw_occ:
        assert _has_color(img, _COLORS["occluded"])
    if saw_inj:
        assert _has_color(img, _COLORS["injected"])
    # the fault run must have produced at least one provenance mark
    assert saw_occ or saw_inj


def test_overlay_draws_true_detections_and_axes():
    frame, camera, state, res = _run_fault_frame(0, 0)
    assert bool(np.asarray(res.pose_updated))
    img = render_overlay(
        frame, camera, res,
        particles=np.asarray(state.bank.T.reshape(-1, 4, 4)),
        weights=np.asarray(state.weights),
    )
    assert _has_color(img, _COLORS["detection"])
    assert _has_color(img, _COLORS["roi"])
    assert not np.all(img[:6] == np.asarray((255, 0, 0), np.uint8))


def test_overlay_lost_track_banner():
    camera = default_camera()
    res_frame = np.zeros((480, 752), np.uint8)

    class _R:
        roi = np.asarray([0.0, 0.0, 752.0, 480.0])
        detections_xy = np.zeros((4, 2), np.float32)
        detections_mask = np.zeros((4,), bool)
        detections_occluded = np.zeros((4,), bool)
        detections_injected = np.zeros((4,), bool)
        pose_updated = np.asarray(False)
        pose = np.eye(4)

    img = render_overlay(res_frame, camera, _R())
    assert np.all(img[:6] == np.asarray((255, 0, 0), np.uint8))

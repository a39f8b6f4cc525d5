"""Recorded-sequence replay: the bag-replay analogue (SURVEY.md §4).

tests/golden/golden_sequence.npz is a committed 60-frame 752x480 IR-LED
sequence rendered entirely outside the engine (OpenCV Rodrigues /
projectPoints + numpy splatting, tests/golden/make_golden_sequence.py),
with ground-truth poses and per-frame LED pixel positions.  Replaying it
closes round-1 gaps "recorded-sequence benchmark" and "self-referential
goldens" at the sequence level: the detector must find the externally
rendered blobs where OpenCV put them, and the full tracker must
reproduce the externally defined trajectory.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pf_monocular_pose_estimator_tpu.geometry.camera import Camera
from pf_monocular_pose_estimator_tpu.io.metrics import (
    absolute_trajectory_error,
    orientation_error_deg,
)
from pf_monocular_pose_estimator_tpu.ops.blob import BlobParams, find_leds
from pf_monocular_pose_estimator_tpu.geometry.camera import distort_pixels
from pf_monocular_pose_estimator_tpu.tracker import TargetState, make_tracker
from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

_GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_sequence.npz")


@pytest.fixture(scope="module")
def seq():
    d = np.load(_GOLDEN)
    camera = Camera.create(
        fx=float(d["fx"]),
        fy=float(d["fy"]),
        cx=float(d["cx"]),
        cy=float(d["cy"]),
        dist=np.asarray(d["dist"], np.float32),
        width=int(d["width"]),
        height=int(d["height"]),
    )
    markers = jnp.asarray(
        np.concatenate([d["markers"], np.ones((len(d["markers"]), 1), np.float32)], 1)
    )
    return d, camera, markers


def test_detector_finds_opencv_rendered_blobs(seq):
    """Full-frame detection on externally rendered frames must recover
    every LED centroid where cv2.projectPoints placed it (<0.5 px:
    moment centroid of a thresholded, uint8-quantised Gaussian vs its
    true centre; a projection/distortion convention bug would show as
    tens of pixels)."""
    d, camera, markers = seq
    params = BlobParams(min_blob_area=8.0)
    roi = jnp.asarray([0.0, 0.0, camera.width, camera.height], jnp.float32)

    for i in (0, 17, 41, 59):
        frame = jnp.asarray(d["frames"][i], jnp.float32)
        det = find_leds(frame, roi, params, camera)
        got = np.asarray(det.xy_distorted)[np.asarray(det.mask)]
        expected = d["led_pixels"][i]
        assert len(got) == len(expected), f"frame {i}: {len(got)} blobs"
        # match greedily: each expected LED has exactly one detection
        dists = np.linalg.norm(got[None] - expected[:, None], axis=-1)
        assert (dists.min(axis=1) < 0.5).all(), dists.min(axis=1)


def test_tracker_replays_golden_sequence(seq):
    """End-to-end replay: init on frame 0, track every frame, ATE and
    orientation error within the clean-sequence bars (BASELINE
    configs[0-1])."""
    d, camera, markers = seq
    mask = jnp.ones((markers.shape[0],), bool)
    config = TrackerConfig(n_particles=5_000, min_blob_area=8.0, pf_max_retries=8)
    step = make_tracker(camera, markers, mask, config)

    state = TargetState.create(config.n_particles, jax.random.PRNGKey(0))
    frames = jnp.asarray(d["frames"], jnp.float32)
    est, upd = [], []
    for i in range(frames.shape[0]):
        state, res = step(state, frames[i], jnp.asarray(d["times"][i]))
        est.append(np.asarray(res.pose))
        upd.append(bool(res.pose_updated))
    est = np.stack(est)
    upd = np.asarray(upd)
    gt = d["poses"]

    assert upd.all(), f"untracked frames: {np.flatnonzero(~upd)}"
    ate = absolute_trajectory_error(est, gt, upd)
    ori = orientation_error_deg(est, gt, upd)
    assert ate < 0.01, f"ATE {ate * 1e3:.2f} mm on the golden sequence"
    assert ori < 1.5, f"orientation error {ori:.2f} deg"

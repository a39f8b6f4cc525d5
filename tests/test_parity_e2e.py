"""End-to-end A/B: the engine vs the faithful CPU reference pipeline.

The oracle (tests/oracle/ref_pipeline.py) is a scalar float64 port of the
reference's PF tracker driven by genuine OpenCV detection
(led_detector.cpp semantics).  Both trackers consume the SAME rendered
sequence; the engine must track at least as many frames and match or
beat the oracle's ATE within a small float32 margin.

Recorded round-2 numbers live in PARITY.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pf_monocular_pose_estimator_tpu.io.synthetic import (
    default_camera,
    demo_markers,
    make_orbit_sequence,
)
from pf_monocular_pose_estimator_tpu.tracker import TargetState, make_tracker
from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

from oracle.ref_pipeline import run_sequence


def _ate(poses, gt, updated):
    err = np.linalg.norm(poses[updated][:, :3, 3] - gt[updated][:, :3, 3], axis=-1)
    return float(err.mean())


def _orient_deg(poses, gt, updated):
    r_rel = np.einsum("tij,tkj->tik", poses[updated][:, :3, :3], gt[updated][:, :3, :3])
    tr = np.clip((np.trace(r_rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    return float(np.degrees(np.arccos(tr)).mean())


@pytest.mark.slow
def test_engine_matches_reference_pipeline_ate():
    camera = default_camera()
    markers = demo_markers()
    n_frames, n_particles = 30, 200
    seq = make_orbit_sequence(camera, markers, num_frames=n_frames, fps=50.0)
    gt = np.asarray(seq.poses)

    # --- oracle: faithful CPU port + OpenCV detection
    frames_u8 = np.asarray(jnp.clip(seq.frames, 0, 255), np.uint8)
    cam = dict(
        fx=float(camera.fx),
        fy=float(camera.fy),
        cx=float(camera.cx),
        cy=float(camera.cy),
        dist=np.asarray(camera.dist, np.float64),
    )
    poses_o, upd_o, flags_o = run_sequence(
        frames_u8,
        np.asarray(seq.times),
        np.asarray(markers, np.float64),
        cam,
        n_particles=n_particles,
        seed=0,
    )

    # --- engine on the identical frames
    config = TrackerConfig(n_particles=n_particles, min_blob_area=8.0, pf_max_retries=20)
    step = make_tracker(camera, markers, jnp.ones((markers.shape[0],), bool), config)
    state = TargetState.create(config.n_particles, jax.random.PRNGKey(0))
    poses_e, upd_e = [], []
    for i in range(n_frames):
        state, res = step(state, seq.frames[i], seq.times[i])
        poses_e.append(np.asarray(res.pose))
        upd_e.append(bool(res.pose_updated))
    poses_e = np.stack(poses_e)
    upd_e = np.asarray(upd_e)

    assert upd_o.mean() >= 0.9, f"oracle lost track: {upd_o.sum()}/{n_frames}"
    assert upd_e.sum() >= upd_o.sum(), (
        f"engine tracked {upd_e.sum()} < oracle {upd_o.sum()}"
    )
    ate_o = _ate(poses_o, gt, upd_o)
    ate_e = _ate(poses_e, gt, upd_e)
    orient_o = _orient_deg(poses_o, gt, upd_o)
    orient_e = _orient_deg(poses_e, gt, upd_e)
    print(
        f"\nA/B: oracle ATE {ate_o * 1e3:.2f} mm / {orient_o:.2f} deg; "
        f"engine ATE {ate_e * 1e3:.2f} mm / {orient_e:.2f} deg"
    )
    # BASELINE.md accuracy bar: engine ATE <= reference-pipeline ATE
    # (15% slack covers the engine's float32 arithmetic + PRNG difference)
    assert ate_e <= ate_o * 1.15, f"engine {ate_e} vs oracle {ate_o}"
    assert orient_e <= orient_o * 1.25 + 0.05, f"{orient_e} vs {orient_o}"

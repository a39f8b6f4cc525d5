"""Legacy IPE path (use_particle_filter=False) — pose_estimator.cpp:740-891."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pf_monocular_pose_estimator_tpu.io.metrics import absolute_trajectory_error
from pf_monocular_pose_estimator_tpu.io.synthetic import (
    default_camera,
    demo_markers,
    make_orbit_sequence,
)
from pf_monocular_pose_estimator_tpu.tracker import TargetState, make_tracker
from pf_monocular_pose_estimator_tpu.utils import TrackerConfig


@pytest.mark.slow
def test_ipe_tracks_synthetic_sequence():
    camera = default_camera()
    markers = demo_markers()
    config = TrackerConfig(
        use_particle_filter=False,
        n_particles=2,  # bank unused in IPE mode, keep it tiny
        min_blob_area=8.0,
        nearest_neighbour_pixel_tolerance=7.0,
    )
    seq = make_orbit_sequence(camera, markers, num_frames=20, fps=50.0)
    step = make_tracker(camera, markers, jnp.ones(5, bool), config)
    state = TargetState.create(config.n_particles, jax.random.PRNGKey(0))

    est, upd, flags = [], [], []
    for i in range(seq.frames.shape[0]):
        state, res = step(state, seq.frames[i], seq.times[i])
        est.append(np.asarray(res.pose))
        upd.append(bool(res.pose_updated))
        flags.append(int(res.fail_flag))

    upd = np.asarray(upd)
    # The reference IPE skips frames with <4 detections without dropping
    # the track (:850-876) — allow isolated skips, no re-inits.
    assert upd[1:].sum() >= len(upd) - 3, f"IPE lost track: flags={flags}"
    assert all(f != 0 for f in flags[1:]), f"IPE re-initialised mid-track: flags={flags}"
    ate = absolute_trajectory_error(np.stack(est), np.asarray(seq.poses), upd)
    assert ate < 0.01, f"IPE ATE {ate*1000:.1f} mm (flags={flags})"

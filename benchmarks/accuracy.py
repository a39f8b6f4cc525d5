"""Golden-sequence accuracy matrix over the BASELINE.json configs.

Reports ATE / orientation error / tracked fraction for:
  config0: single target, 5-LED marker, clean synthetic 752x480, 1k particles
  config1: 10k particles, full blob-detect -> init -> PF pipeline
  config2: outlier-heavy (occlusions + spurious blobs), 50k particles
  config3: multi-target (4 banks), 100k particles total

The reference repo publishes no numbers (BASELINE.md), so the oracle is
synthetic ground truth; the bar is the reference's behavioural contract:
initialise, track every frame, mm-scale ATE, recover after faults.

Usage: python benchmarks/accuracy.py [--device cpu] [--frames 40]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_single(camera, markers, config, seq, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pf_monocular_pose_estimator_tpu.io.metrics import (
        absolute_trajectory_error,
        orientation_error_deg,
    )
    from pf_monocular_pose_estimator_tpu.tracker import TargetState, make_tracker

    step = make_tracker(camera, markers, jnp.ones(markers.shape[0], bool), config)
    state = TargetState.create(config.n_particles, jax.random.PRNGKey(seed))
    est, upd, flags = [], [], []
    t0 = time.perf_counter()
    for i in range(seq.frames.shape[0]):
        state, res = step(state, seq.frames[i], seq.times[i])
        est.append(np.asarray(res.pose))
        upd.append(bool(res.pose_updated))
        flags.append(int(res.fail_flag))
    wall = time.perf_counter() - t0
    est = np.stack(est)
    upd = np.asarray(upd)
    gt = np.asarray(seq.poses)
    err = np.linalg.norm(est[upd][:, :3, 3] - gt[upd][:, :3, 3], axis=-1) * 1000
    return {
        "tracked_fraction": round(float(upd.mean()), 3),
        "ate_mm": round(absolute_trajectory_error(est, gt, upd) * 1000, 3),
        "median_err_mm": round(float(np.median(err)), 3) if upd.any() else None,
        "orientation_err_deg": round(orientation_error_deg(est, gt, upd), 3),
        "reinits": sum(1 for f in flags[1:] if f == 0),
        "wall_s": round(wall, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default=None, choices=[None, "cpu"])
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()

    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from pf_monocular_pose_estimator_tpu.io.synthetic import (
        default_camera,
        demo_markers,
        make_orbit_sequence,
    )
    from pf_monocular_pose_estimator_tpu.tracker.multi import create_states, make_multi_tracker
    from pf_monocular_pose_estimator_tpu.io.metrics import absolute_trajectory_error
    from pf_monocular_pose_estimator_tpu.tracker import TargetState
    from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

    camera = default_camera()
    markers = demo_markers()
    seq = make_orbit_sequence(camera, markers, num_frames=args.frames, fps=50.0)

    base = TrackerConfig(min_blob_area=8.0, pf_max_retries=8)
    report = {}

    report["config0_1k_clean"] = run_single(
        camera, markers, dataclasses.replace(base, n_particles=1_000), seq
    )
    report["config1_10k"] = run_single(
        camera, markers, dataclasses.replace(base, n_particles=10_000), seq
    )
    # fault patterns are PRNG-seeded, so a single seed's tracked
    # fraction is high-variance; average five seeds (round-4 bump from
    # 3 — the round-3 parity margin sat exactly on the 0.9 bar)
    n_seeds = 5
    cfg2 = dataclasses.replace(
        base, n_particles=50_000, number_of_occlusions=1, number_of_false_detections=2
    )
    runs2 = [run_single(camera, markers, cfg2, seq, seed=s) for s in range(n_seeds)]
    report["config2_50k_outliers"] = {
        "seeds": n_seeds,
        "tracked_fraction_mean": round(
            sum(r["tracked_fraction"] for r in runs2) / n_seeds, 3
        ),
        "median_err_mm_mean": round(
            sum(r["median_err_mm"] for r in runs2) / n_seeds, 3
        ),
        "per_seed": runs2,
    }

    # config2 at strict reference parity (every engine extension off):
    # the honest margin of the reference behaviour itself under the
    # same fault injection — the headline row above rides the engine's
    # default extensions (coasting, partial-constellation init, ...)
    from pf_monocular_pose_estimator_tpu.utils import TrackerConfig as _TC

    cfg2p = _TC.reference_parity(
        n_particles=50_000,
        min_blob_area=base.min_blob_area,
        pf_max_retries=base.pf_max_retries,
        number_of_occlusions=1,
        number_of_false_detections=2,
    )
    runs2p = [run_single(camera, markers, cfg2p, seq, seed=s) for s in range(n_seeds)]
    report["config2_50k_outliers_reference_parity"] = {
        "seeds": n_seeds,
        "tracked_fraction_mean": round(
            sum(r["tracked_fraction"] for r in runs2p) / n_seeds, 3
        ),
        "per_seed": runs2p,
    }

    # config3: 4 targets, 25k particles each
    import jax.numpy as jnp
    import numpy as np

    cfg3 = dataclasses.replace(base, n_particles=25_000)
    markers_t = jnp.broadcast_to(markers, (4, markers.shape[0], 4))
    masks_t = jnp.ones((4, markers.shape[0]), bool)
    mstep = make_multi_tracker(camera, markers_t, masks_t, cfg3)
    states = create_states(4, cfg3.n_particles)
    est, upd = [], []
    for i in range(seq.frames.shape[0]):
        states, res = mstep(states, seq.frames[i], seq.times[i])
        est.append(np.asarray(res.pose))
        upd.append(np.asarray(res.pose_updated))
    est = np.stack(est)  # (T_frames, 4, 4, 4)
    upd = np.stack(upd)
    gt = np.asarray(seq.poses)
    ates = [
        absolute_trajectory_error(est[:, k], gt, upd[:, k]) * 1000 for k in range(4)
    ]
    report["config3_4targets_25k"] = {
        "tracked_fraction": round(float(upd.mean()), 3),
        "ate_mm_per_target": [round(a, 3) for a in ates],
    }

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

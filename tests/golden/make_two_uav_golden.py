"""Generate the two-UAV golden sequence (run once).

The numUAV=2 experiment's footage analogue (README.md:417-451): two
targets with DISTINCT 5-LED constellations orbiting side by side in the
same frames; per-target ground-truth trajectories committed alongside.

    python tests/golden/make_two_uav_golden.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import jax

jax.config.update("jax_platforms", "cpu")

from pf_monocular_pose_estimator_tpu.io.synthetic import (  # noqa: E402
    default_camera,
    demo_markers,
    make_two_target_sequence,
    second_markers,
)


def main():
    camera = default_camera()
    seq = make_two_target_sequence(
        camera, demo_markers(), second_markers(), num_frames=60, fps=50.0, seed=2
    )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "two_uav_sequence.npz")
    np.savez_compressed(
        out,
        frames=np.asarray(seq.frames).astype(np.uint8),
        poses=np.asarray(seq.poses),
        times=np.asarray(seq.times),
    )
    print(f"wrote {out} ({os.path.getsize(out) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()

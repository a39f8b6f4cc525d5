"""Weak-scaling harness: sharded PF throughput vs device count.

BASELINE.md asks for fps at 1 chip / 1 host / N hosts and >=80%
weak-scaling efficiency at >=2 hosts.  This environment exposes ONE real
TPU chip, so:

  * on real hardware, `bench.py` gives the 1-chip number;
  * this harness validates the *scaling path* — the sharded program, its
    collectives, and per-device work division — on a virtual N-device CPU
    mesh (`--xla_force_host_platform_device_count`), the same mechanism
    CI uses (tests/test_parallel.py);
  * on a real pod slice the identical code runs under
    `jax.distributed.initialize` with the mesh spanning hosts.

Weak scaling here: the per-device particle count is fixed and the bank
grows with the mesh, so ideal scaling keeps ms/frame constant.

Usage:
  python benchmarks/scaling.py [--devices 1 2 4 8] [--per-device 4096]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--per-device", type=int, default=8192)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    max_dev = max(args.devices)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={max_dev}"
    ).strip()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pf_monocular_pose_estimator_tpu.io.synthetic import (
        default_camera,
        demo_markers,
        make_orbit_sequence,
    )
    from pf_monocular_pose_estimator_tpu.parallel.mesh import (
        make_mesh,
        make_sharded_tracker,
        shard_target_state,
    )
    from pf_monocular_pose_estimator_tpu.tracker import TargetState
    from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

    camera = default_camera()
    markers = demo_markers()
    mask = jnp.ones((markers.shape[0],), bool)
    seq = make_orbit_sequence(camera, markers, num_frames=args.frames, fps=50.0)

    results = []
    base_ms = None
    for n_dev in args.devices:
        n_particles = args.per_device * n_dev
        config = TrackerConfig(n_particles=n_particles, min_blob_area=8.0, pf_max_retries=4)
        mesh = make_mesh(particle_devices=n_dev, devices=jax.devices()[:n_dev])
        step = make_sharded_tracker(camera, markers, mask, config, mesh)

        state = shard_target_state(
            TargetState.create(n_particles, jax.random.PRNGKey(0)), mesh
        )
        # warm-up/compile
        state_w, _ = step(state, seq.frames[0], seq.times[0])
        jax.block_until_ready(state_w)
        state = state_w

        t0 = time.perf_counter()
        for i in range(1, args.frames):
            state, res = step(state, seq.frames[i], seq.times[i])
        jax.block_until_ready(state)
        ms = (time.perf_counter() - t0) / (args.frames - 1) * 1000

        if base_ms is None:
            base_ms = ms
        eff = base_ms / ms
        results.append(
            {
                "devices": n_dev,
                "particles": n_particles,
                "ms_per_frame": round(ms, 2),
                "weak_scaling_efficiency": round(eff, 3),
            }
        )
        print(json.dumps(results[-1]), flush=True)

    caveat = (
        "virtual CPU devices timeshare one physical host, so efficiency "
        "numbers are a lower bound; this run validates the sharded "
        "program + collectives, not hardware scaling"
        if args.cpu
        else None
    )
    print(json.dumps({"weak_scaling": results, "caveat": caveat}))


if __name__ == "__main__":
    main()

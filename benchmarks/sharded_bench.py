"""Sharded-step throughput on real hardware (VERDICT r3 item 1).

Round 3's mesh-sharded step force-disabled every Pallas kernel, so the
pod-scale program ran the ~3-4x slower XLA SoA path per chip.  Round 4
routes the fused propagate+weight kernel through a shard_map
(parallel/pf_kernels.py) and the replicated-operand kernels (detect,
GN) through manual-sharding wrappers.  This benchmark runs the SHARDED
tracker step on a 1-device mesh on the real chip and reports fps next
to the unsharded number — the acceptance bar is parity within ~10%.

Usage (single-tenant chip — run serially):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/sharded_bench.py
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--frames", type=int, default=480)
    ap.add_argument("--pf-pallas", default="auto", choices=["auto", "off"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pf_monocular_pose_estimator_tpu.io.synthetic import (
        default_camera,
        demo_markers,
        make_orbit_sequence,
    )
    from pf_monocular_pose_estimator_tpu.parallel.mesh import (
        _spmd_hooks,
        _state_shardings,
        make_mesh,
        shard_target_state,
    )
    from pf_monocular_pose_estimator_tpu.parallel.resample import (
        make_distributed_resampler,
    )
    from pf_monocular_pose_estimator_tpu.tracker import TargetState, tracker_step
    from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

    n_particles = args.particles
    num_frames = args.frames
    camera = default_camera()
    markers = jnp.asarray(demo_markers())
    marker_mask = jnp.ones((markers.shape[0],), bool)
    config = TrackerConfig(
        n_particles=n_particles,
        min_blob_area=8.0,
        pf_max_retries=8,
        roi_particle_subsample=128,
    )

    mesh = make_mesh(particle_devices=1, target_devices=1)
    config, pf_fn, wrap = _spmd_hooks(camera, config, mesh, args.pf_pallas)
    resampler = make_distributed_resampler(mesh, n_particles, reach=1)

    specs = _state_shardings(mesh)
    state_shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs
    )
    repl = NamedSharding(mesh, P())

    seq = make_orbit_sequence(camera, markers, num_frames=num_frames, fps=50.0)
    frames = jax.device_put(seq.frames, repl)
    times = jax.device_put(seq.times, repl)

    @jax.jit
    def run_sequence(state, frames, times):
        def body(state, inputs):
            frame, t = inputs
            state, res = tracker_step(
                state, frame, t, camera, markers, marker_mask, config,
                resample_fn=resampler, pf_fn=pf_fn, wrap_replicated=wrap,
            )
            return state, (res.fail_flag, res.pose_updated, res.pose)

        return jax.lax.scan(body, state, (frames, times))

    state0 = shard_target_state(
        TargetState.create(n_particles, jax.random.PRNGKey(0)), mesh
    )

    def sync(x):
        # host fetch fences the tunnel (block_until_ready can lie here)
        return float(jnp.sum(x))

    t0 = time.perf_counter()
    state, (flags, updated, poses) = run_sequence(state0, frames, times)
    sync(flags)
    compile_s = time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        state, (flags, updated, poses) = run_sequence(state0, frames, times)
        sync(flags)
        best = min(best, time.perf_counter() - t0)

    fps = num_frames / best
    print(
        json.dumps(
            {
                "metric": f"sharded_1dev_mesh_fps_{n_particles//1000}k",
                "pf_pallas": args.pf_pallas,
                "value": round(fps, 2),
                "unit": "frames/s",
                "updated_frames_fraction": round(float(np.asarray(updated).mean()), 3),
                "compile_s": round(compile_s, 1),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()

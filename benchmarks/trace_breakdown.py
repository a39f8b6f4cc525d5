"""Per-stage TPU timing breakdown from a jax.profiler trace.

Runs the full 100k-particle tracker step as one on-device scan, captures
a profiler trace, and attributes every leaf XLA op's exclusive time to a
pipeline stage via the op_name metadata in the compiled HLO.  This is
the measurement behind the README's per-stage table and the
speed-of-light accounting (round-1 gap #8).

Usage:  python benchmarks/trace_breakdown.py [--particles 100000]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


STAGES = [
    # (regex over the op_name metadata path, stage label) — first match wins
    (r"bank_top_pin|bank_restore_pin", "resample (gather layout pins)"),
    (r"fused_propagate_weight|pallas_weight|bank_layout_pin", "pf: fused propagate+weight"),
    (r"gauss_newton", "pf: GN refine (pallas)"),
    (r"detect_stats|threshold_blur", "detect: pallas front-end"),
    (r"top_k", "detect: top-k components"),
    (r"searchsorted|sort|argsort", "resample (sort/searchsorted)"),
    (r"cumsum|reduce_window", "resample (cumsum) / cc sweeps"),
    (r"pallas", "other pallas"),
    (r"conv", "detect: blur conv"),
    (r"dot|einsum", "matmuls (moments/GN/weight)"),
    (r"while", "loops"),
    (r"svd|qdwh|triangular|lu_", "linear algebra (check/GN)"),
    (r"random|threefry|_uniform", "prng"),
    (r"gather|take", "gathers"),
    (r"scatter", "scatters"),
]


def attribute(trace_path, hlo_text, n_frames):
    with gzip.open(trace_path) as f:
        trace = json.load(f)
    tids = {}
    for e in trace["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    ops = [
        e
        for e in trace["traceEvents"]
        if e.get("ph") == "X"
        and "dur" in e
        and "XLA Ops" in tids.get((e["pid"], e["tid"]), "")
    ]
    containers = ("while.", "conditional.", "fusion.call")
    leaves = [e for e in ops if not e["name"].startswith(("while.", "conditional."))]

    # op name -> (op_name metadata, source file:line) from HLO
    meta = {}
    src = {}
    for m in re.finditer(
        r"%(\S+?) = .*?op_name=\"([^\"]*)\""
        r"(?:.*?source_file=\"([^\"]*)\".*?source_line=(\d+))?",
        hlo_text,
    ):
        meta[m.group(1)] = m.group(2)
        if m.group(3):
            src[m.group(1)] = f"{m.group(3).split('/')[-1]}:{m.group(4)}"

    agg = collections.Counter()
    named = collections.Counter()
    for e in leaves:
        path = meta.get(e["name"], "")
        # match on the op itself (last path component + HLO op name), not
        # the whole path: everything in the scan body has "while" in its
        # path, which used to swallow 74% of time into one bucket
        tail = path.rsplit("/", 1)[-1] + " " + e["name"]
        label = None
        for rx, lab in STAGES:
            if re.search(rx, tail, re.I):
                label = lab
                break
        agg[label or "other elementwise/fusion"] += e["dur"]
        loc = src.get(e["name"], "")
        named[(e["name"], f"{loc:24s} {path[-70:]}")] += e["dur"]
    # containers: their duration INCLUDES inter-op scheduling gaps, so
    # container_dur - sum(child leaf dur) localises the non-leaf time
    containers = collections.Counter()
    for e in ops:
        if e["name"].startswith(("while.", "conditional.")):
            containers[e["name"]] += e["dur"]
    print("top containers (incl. scheduling gaps):")
    for name, us in containers.most_common(10):
        print(f"  {us / n_frames:8.1f} us/frame  {name}")

    total = sum(agg.values())
    print(f"leaf ops: {len(leaves)} events")
    print(f"leaf total: {total / n_frames / 1000:.2f} ms/frame")
    for lab, us in agg.most_common():
        print(f"  {us / n_frames:8.1f} us/frame  {us / total * 100:5.1f}%  {lab}")
    print("\ntop individual ops:")
    for (name, path), us in named.most_common(18):
        print(f"  {us / n_frames:8.1f} us/frame  {name:32s} {path}")

    # op-COUNT by source location: each leaf event carries ~0.5-1 us of
    # fixed issue overhead, so the event count localises the
    # "non-leaf gap" (wall - leaf total) better than durations do
    counts = collections.Counter()
    loc_us = collections.Counter()
    for e in leaves:
        loc = src.get(e["name"], "(no src)")
        counts[loc] += 1
        loc_us[loc] += e["dur"]
    print(f"\nleaf events by source location (total {len(leaves)}, "
          f"{len(leaves) / n_frames:.0f}/frame):")
    for loc, cnt in counts.most_common(18):
        print(f"  {cnt / n_frames:7.1f} ev/frame  {loc_us[loc] / n_frames:7.1f} us/frame  {loc}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--trace-dir", default="/tmp/pf_trace_breakdown")
    ap.add_argument(
        "--sharded", action="store_true",
        help="profile the mesh-sharded step on a 1-device mesh "
        "(shard_map'd Pallas PF kernel + distributed resampler)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pf_monocular_pose_estimator_tpu.io.synthetic import (
        default_camera,
        demo_markers,
        make_orbit_sequence,
    )
    from pf_monocular_pose_estimator_tpu.tracker import TargetState, tracker_step
    from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

    camera = default_camera()
    markers = demo_markers()
    mask = jnp.ones((markers.shape[0],), bool)
    config = TrackerConfig(
        n_particles=args.particles,
        min_blob_area=8.0,
        pf_max_retries=8,
        roi_particle_subsample=128,
    )
    seq = make_orbit_sequence(camera, markers, num_frames=args.frames, fps=50.0)
    frames = jax.device_put(seq.frames)
    times = jax.device_put(seq.times)

    pf_fn = wrap = resampler = None
    if args.sharded:
        from pf_monocular_pose_estimator_tpu.parallel.mesh import (
            _spmd_hooks,
            make_mesh,
            shard_target_state,
        )
        from pf_monocular_pose_estimator_tpu.parallel.resample import (
            make_distributed_resampler,
        )

        mesh = make_mesh(particle_devices=1, target_devices=1)
        config, pf_fn, wrap = _spmd_hooks(camera, config, mesh, "auto")
        resampler = make_distributed_resampler(mesh, args.particles, reach=1)

    @jax.jit
    def run(state, frames, times):
        def body(st, ft):
            f, t = ft
            st, res = tracker_step(
                st, f, t, camera, markers, mask, config,
                resample_fn=resampler, pf_fn=pf_fn, wrap_replicated=wrap,
            )
            return st, res.pose_updated
        return jax.lax.scan(body, state, (frames, times))

    state = TargetState.create(config.n_particles, jax.random.PRNGKey(0))
    if args.sharded:
        state = shard_target_state(state, mesh)
    lowered = run.lower(state, frames, times)
    compiled = lowered.compile()
    hlo_text = compiled.as_text()
    os.makedirs(args.trace_dir, exist_ok=True)
    with open(os.path.join(args.trace_dir, "compiled_hlo.txt"), "w") as f:
        f.write(hlo_text)  # for offline op-id -> source attribution

    def sync(x):
        # host fetch as completion fence: through the axon tunnel
        # block_until_ready can return before execution (see bench.py)
        return float(jnp.sum(x))

    st, upd = compiled(state, frames, times)
    sync(upd)
    t0 = time.time()
    st, upd = compiled(state, frames, times)
    sync(upd)
    wall = time.time() - t0
    print(
        f"steady: {wall / args.frames * 1000:.2f} ms/frame "
        f"({args.frames / wall:.1f} fps), tracked {int(jnp.sum(upd))}/{args.frames}"
    )

    with jax.profiler.trace(args.trace_dir):
        st, upd = compiled(state, frames, times)
        sync(upd)

    traces = sorted(glob.glob(os.path.join(args.trace_dir, "**/*.trace.json.gz"), recursive=True))
    attribute(traces[-1], hlo_text, args.frames)


if __name__ == "__main__":
    main()

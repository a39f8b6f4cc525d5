"""Quantitative weak-scaling projection for the sharded tracker step.

One real chip is available in this environment, so the ≥2-host
weak-scaling bar (BASELINE.md) cannot be *measured*; this script makes
the projection the round-3 verdict asked for instead, from three
measured inputs:

  1. per-stage single-chip device times at N=100k particles/chip
     (benchmarks/trace_breakdown.py -> BENCH_SESSION per-stage table);
  2. per-device collective traffic of the compiled sharded step
     (benchmarks/collective_volume.py -> COLLECTIVES_r04.json), scaled
     linearly to the projected shard size (payloads are O(S));
  3. public v5e interconnect figures (jax-ml.github.io/scaling-book,
     "TPU v5e" tables): ICI ~4.5e10 B/s one-way per link (2D torus),
     DCN ~2.5e10 B/s per host shared by its chips.

Model (stated assumptions, all conservative):

  * Weak scaling: N = 100k particles PER CHIP; particle-axis stages
    (propagate+weight, resample sorts/gathers, cumsum) keep their
    single-chip time; frame-wide stages (detection, GN, matmuls, state
    machine glue) are replicated per chip and also keep their time.
  * Communication is NOT overlapped with compute (worst case): per-frame
    collective time = sum(bytes_per_device / link_bw) + count * latency.
  * The ppermute ring over the particles axis has exactly 2 host-crossing
    edges when the axis spans 2 hosts; those edges pay DCN bandwidth,
    the rest pay ICI.  Latencies: 1 us per ICI collective, 10 us per
    DCN-crossing collective.
  * Host->device frame broadcast (752x480 u8 = 361 kB) rides DCN once
    per frame per host and is pipelined with the previous frame's
    compute (excluded from the critical path; included as a column).

Writes SCALING_PROJECTION_r04.json at the repo root with --write.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ICI_BW = 4.5e10  # B/s one-way per link, v5e 2D torus neighbour
DCN_BW = 2.5e10  # B/s per host NIC (200 Gbps), shared
ICI_LAT = 1e-6  # s per collective launch over ICI
DCN_LAT = 10e-6  # s per collective that crosses DCN
FRAME_BYTES = 752 * 480  # u8 frame broadcast per host per frame


def project(per_stage: dict, collectives_rows: list, widths=(1, 2, 4, 8)):
    # particle-axis stages keep per-chip time in weak scaling
    sharded = (
        per_stage["fused_propagate_weight_pallas"]
        + per_stage["resample_sorts"]
        + per_stage["gathers_incl_resample_bank_gather"]
        + per_stage["resample_gather_layout_pins"]
        + per_stage["cumsum_cc_sweeps"]
    )
    # frame-wide stages are replicated per chip (same time on every chip)
    replicated = (
        per_stage["detect_pallas_front_end_incl_inkernel_topk"]
        + per_stage["detect_top_k_residual_xla"]
        + per_stage["detect_blur_conv"]
        + per_stage["gauss_newton_pallas"]
        + per_stage["matmuls_moments_gn_weight"]
        + per_stage["other_pallas_incl_bank_top_pin"]
        + per_stage["other_elementwise_fusion_glue"]
    )
    # wall = leaf total x measured wall/leaf inflation (op-issue overhead)
    leaf_total = sharded + replicated
    wall_inflation = per_stage.get("_wall_over_leaf", 1.37)
    t1 = leaf_total * wall_inflation * 1e-6  # s/frame at P=1

    by_width = {r["devices"]: r for r in collectives_rows}
    rows = []
    for p in widths:
        if p == 1:
            rows.append(
                {
                    "chips": 1,
                    "hosts": 1,
                    "t_frame_ms": round(t1 * 1e3, 4),
                    "fps": round(1.0 / t1, 1),
                    "efficiency": 1.0,
                    "comm_us": 0.0,
                }
            )
            continue
        acc = by_width.get(p)
        if acc is None:
            continue
        # scale measured per-device collective bytes to S = 100k/chip
        scale = 100_000 / acc["shard_particles"] / acc["devices"] * acc["devices"]
        scale = 100_000 / acc["shard_particles"]
        for hosts in (1, 2) if p >= 2 else (1,):
            if hosts == 2 and p < 2:
                continue
            comm = 0.0
            ring_bytes_time = 0.0
            n_coll = 0
            for name, c in acc["collectives"].items():
                if c["count"] == 0:
                    continue
                bytes_dev = c["bytes"] * scale
                n_coll += c["count"]
                if hosts == 1:
                    part = bytes_dev / ICI_BW + c["count"] * ICI_LAT
                else:
                    # the ring (collective-permute) has 2 host-crossing
                    # edges out of p; those edges' payload shares the
                    # host NIC.  Scalar collectives pay one DCN latency.
                    if name == "collective-permute":
                        cross_frac = 2.0 / p
                        part = (
                            bytes_dev * (1 - cross_frac) / ICI_BW
                            + bytes_dev * cross_frac / DCN_BW
                            + c["count"] * DCN_LAT
                        )
                    else:
                        part = bytes_dev / ICI_BW + c["count"] * DCN_LAT
                comm += part
                if name == "collective-permute":
                    ring_bytes_time = part
            t = t1 + comm
            # overlap scenario: XLA emits async collective-permute
            # start/done pairs; the ring payload (bank columns are only
            # consumed by the FINAL gather) hides under the merge sorts
            # (~275 us of independent compute), latencies still exposed
            sort_window = per_stage["resample_sorts"] * 1e-6
            hidden = min(ring_bytes_time, sort_window)
            t_ov = t1 + comm - hidden
            rows.append(
                {
                    "chips": p,
                    "hosts": hosts,
                    "t_frame_ms": round(t * 1e3, 4),
                    "fps": round(1.0 / t, 1),
                    "efficiency": round(t1 / t, 4),
                    "efficiency_async_overlap": round(t1 / t_ov, 4),
                    "comm_us": round(comm * 1e6, 1),
                    "frame_broadcast_us_pipelined": round(
                        FRAME_BYTES / DCN_BW * 1e6, 1
                    ),
                }
            )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    ap.add_argument(
        "--stage-json",
        default=os.path.join(ROOT, "BENCH_SESSION_r04.json"),
        help="per-stage table source (falls back to r03)",
    )
    args = ap.parse_args()

    stage_path = args.stage_json
    if not os.path.exists(stage_path):
        stage_path = os.path.join(ROOT, "BENCH_SESSION_r03.json")
    with open(stage_path) as f:
        sess = json.load(f)
    key = [k for k in sess if k.startswith("per_stage_us")][0]
    per_stage = {
        k: v for k, v in sess[key].items() if isinstance(v, (int, float))
    }
    with open(os.path.join(ROOT, "COLLECTIVES_r04.json")) as f:
        acc = json.load(f)

    rows = project(per_stage, acc["rows"])
    out = {
        "note": (
            "PROJECTED weak-scaling efficiency (not measured - one chip "
            "in this environment). Model: per-chip compute from the "
            f"profiler per-stage table ({os.path.basename(stage_path)}, "
            "100k particles/chip), per-device collective bytes from "
            "COLLECTIVES_r04.json scaled to S=100k, v5e ICI 45 GB/s "
            "one-way neighbour links, DCN 25 GB/s/host, no "
            "compute/comm overlap (conservative), ppermute ring with 2 "
            "host-crossing edges at 2 hosts."
        ),
        "rows": rows,
        "bar": "BASELINE.md: >=80% weak-scaling efficiency at >=2 hosts",
        "meets_bar": all(
            r["efficiency"] >= 0.80 for r in rows if r["hosts"] >= 2
        ),
    }
    print(json.dumps(out, indent=1))
    if args.write:
        with open(os.path.join(ROOT, "SCALING_PROJECTION_r04.json"), "w") as f:
            json.dump(out, f, indent=1)
        print("wrote SCALING_PROJECTION_r04.json")


if __name__ == "__main__":
    main()

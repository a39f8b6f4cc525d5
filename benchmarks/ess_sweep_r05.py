"""Round-5 ESS-gate re-tuning at HEAD precision (VERDICT r4 #4).

The round-4 tau sweep that chose resample_min_ess=0.15 predates the f32
matmul-precision fix, and the fix changed exactly the quantity the sweep
judged (orientation error).  Re-run the sweep at HEAD — f32 precision,
converged chunked-CDF resampler — JOINTLY with the degraded-lock ladder
offset (the 12-deg wrong-lock episode of ACCURACY_r04 config2 seed 3 had
zero re-inits, i.e. the ladder never fired):

  tau in {0.10, 0.15, 0.20} x degraded_weight_offset in {0.5, 0.8}
  x 5 seeds on the outlier config (50k particles, 1 occlusion + 2
  spurious blobs/frame), recording tracked fraction, ATE, orientation
  error and re-init counts per cell; plus 3 clean seeds at 10k for the
  clean-trajectory cost of each tau.

Writes ESS_TUNING_r05.json at the repo root.  Run on the real chip:
    python benchmarks/ess_sweep_r05.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util

_spec = importlib.util.spec_from_file_location(
    "acc", os.path.join(os.path.dirname(os.path.abspath(__file__)), "accuracy.py")
)
acc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(acc)


def main():
    import jax

    from pf_monocular_pose_estimator_tpu.io.synthetic import (
        default_camera,
        demo_markers,
        make_orbit_sequence,
    )
    from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

    camera = default_camera()
    markers = demo_markers()
    seq = make_orbit_sequence(camera, markers, num_frames=40, fps=50.0)
    base = TrackerConfig(min_blob_area=8.0, pf_max_retries=8)
    n_seeds = 5

    out = {
        "note": (
            "ESS tau x degraded_weight_offset sweep at HEAD (f32 matmul "
            "precision + converged chunked-CDF resampler), 5 seeds on the "
            "outlier config (50k particles, 1 occlusion + 2 spurious "
            "blobs/frame) and 3 clean seeds at 10k per tau.  Replaces the "
            "bf16-era round-4 sweep (ESS_TUNING_r04.json)."
        ),
        "device": None,
        "outlier_cells": {},
        "clean_cells": {},
    }
    out["device"] = str(jax.devices()[0])

    for tau in (0.10, 0.15, 0.20):
        for dwo in (0.5, 0.8):
            cfg = dataclasses.replace(
                base,
                n_particles=50_000,
                number_of_occlusions=1,
                number_of_false_detections=2,
                resample_min_ess=tau,
                degraded_weight_offset=dwo,
            )
            runs = [
                acc.run_single(camera, markers, cfg, seq, seed=s)
                for s in range(n_seeds)
            ]
            cell = {
                "tracked": [r["tracked_fraction"] for r in runs],
                "tracked_mean": round(
                    sum(r["tracked_fraction"] for r in runs) / n_seeds, 4
                ),
                "ate_mm": [r["ate_mm"] for r in runs],
                "ori_deg": [r["orientation_err_deg"] for r in runs],
                "ori_deg_mean": round(
                    sum(r["orientation_err_deg"] for r in runs) / n_seeds, 3
                ),
                "ori_deg_max": max(r["orientation_err_deg"] for r in runs),
                "reinits": [r["reinits"] for r in runs],
            }
            out["outlier_cells"][f"tau{tau}_dwo{dwo}"] = cell
            print(f"tau={tau} dwo={dwo}: {cell}", flush=True)

        cfg0 = dataclasses.replace(base, n_particles=10_000, resample_min_ess=tau)
        cruns = [acc.run_single(camera, markers, cfg0, seq, seed=s) for s in range(3)]
        out["clean_cells"][f"tau{tau}"] = {
            "tracked": [r["tracked_fraction"] for r in cruns],
            "ate_mm": [r["ate_mm"] for r in cruns],
            "ori_deg": [r["orientation_err_deg"] for r in cruns],
        }
        print(f"clean tau={tau}: {out['clean_cells'][f'tau{tau}']}", flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ESS_TUNING_r05.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

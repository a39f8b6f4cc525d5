"""Accuracy of ESS-gated resampling: tau sweep x 5 seeds, outlier config
+ clean configs. Runs on the real chip."""
import sys, dataclasses, json
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("acc", "/root/repo/benchmarks/accuracy.py")
acc = importlib.util.module_from_spec(spec); spec.loader.exec_module(acc)

import jax.numpy as jnp
import numpy as np
from pf_monocular_pose_estimator_tpu.io.synthetic import default_camera, demo_markers, make_orbit_sequence
from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

camera = default_camera()
markers = demo_markers()
seq = make_orbit_sequence(camera, markers, num_frames=40, fps=50.0)
base = TrackerConfig(min_blob_area=8.0, pf_max_retries=8)

out = {}
for tau in (0.15,):
    cfg2 = dataclasses.replace(base, n_particles=50_000, number_of_occlusions=1,
                               number_of_false_detections=2, resample_min_ess=tau)
    runs = [acc.run_single(camera, markers, cfg2, seq, seed=s) for s in range(5)]
    out[f"outlier_tau{tau}"] = {
        "tracked": [r["tracked_fraction"] for r in runs],
        "mean": round(sum(r["tracked_fraction"] for r in runs) / 5, 3),
        "ate_mm": [r["ate_mm"] for r in runs],
    }
    print(tau, out[f"outlier_tau{tau}"], flush=True)
    cfg0 = dataclasses.replace(base, n_particles=10_000, resample_min_ess=tau)
    r = acc.run_single(camera, markers, cfg0, seq)
    out[f"clean10k_tau{tau}"] = {"tracked": r["tracked_fraction"], "ate_mm": r["ate_mm"], "ori": r["orientation_err_deg"]}
    print(tau, out[f"clean10k_tau{tau}"], flush=True)
json.dump(out, open("/root/repo/benchmarks/_ess_acc_015.json", "w"), indent=1)

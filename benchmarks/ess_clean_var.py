"""Clean-config seed variance for the ESS-gate tuning
(ESS_TUNING_r04.json).
"""
import sys, dataclasses, json
sys.path.insert(0, "/root/repo")
import importlib.util
spec = importlib.util.spec_from_file_location("acc", "/root/repo/benchmarks/accuracy.py")
acc = importlib.util.module_from_spec(spec); spec.loader.exec_module(acc)
import jax.numpy as jnp
from pf_monocular_pose_estimator_tpu.io.synthetic import default_camera, demo_markers, make_orbit_sequence
from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

camera = default_camera()
markers = demo_markers()
seq = make_orbit_sequence(camera, markers, num_frames=40, fps=50.0)
base = TrackerConfig(min_blob_area=8.0, pf_max_retries=8, n_particles=10_000)
out = {}
for tau in (0.0, 0.15):
    cfg = dataclasses.replace(base, resample_min_ess=tau)
    runs = [acc.run_single(camera, markers, cfg, seq, seed=s) for s in (0, 1, 2)]
    out[f"tau{tau}"] = {"ate_mm": [r["ate_mm"] for r in runs], "ori": [r["orientation_err_deg"] for r in runs]}
    print(tau, out[f"tau{tau}"], flush=True)
json.dump(out, open("/root/repo/benchmarks/_clean_var.json", "w"), indent=1)

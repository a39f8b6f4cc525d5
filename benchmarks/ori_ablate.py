"""Why did clean orientation error go 1.0deg (r2 prose) -> 2.8deg (r3
artifact)?  Ablate the round-3 changes on the clean 10k config."""
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
for name, cfg in [
    ("head_default", base),
    ("no_coast", dataclasses.replace(base, pf_coast_frames=0)),
    ("xla_pf_path", dataclasses.replace(base, use_fused_pf_kernel=False, use_pallas_weight=False)),
    ("gn_hyp_1", dataclasses.replace(base, gn_hypotheses=1)),
    ("retries_80", dataclasses.replace(base, pf_max_retries=80)),
]:
    r = acc.run_single(camera, markers, cfg, seq)
    out[name] = {"ori_deg": r["orientation_err_deg"], "ate_mm": r["ate_mm"], "tracked": r["tracked_fraction"]}
    print(name, out[name], flush=True)

# per-frame orientation profile: is the 40-frame orbit's tail (frames
# the 30-frame parity run never sees) where the error lives?
import numpy as np, jax
from pf_monocular_pose_estimator_tpu.tracker import TargetState, make_tracker
from pf_monocular_pose_estimator_tpu.io.metrics import orientation_error_deg
step = make_tracker(camera, markers, jnp.ones(markers.shape[0], bool), base)
state = TargetState.create(base.n_particles, jax.random.PRNGKey(0))
est, upd = [], []
for i in range(40):
    state, res = step(state, seq.frames[i], seq.times[i])
    est.append(np.asarray(res.pose)); upd.append(bool(res.pose_updated))
est = np.stack(est); upd = np.asarray(upd)
gt = np.asarray(seq.poses)
def ori_frame(a, b):
    R = a[:3, :3].T @ b[:3, :3]
    return float(np.degrees(np.arccos(np.clip((np.trace(R) - 1) / 2, -1, 1))))
prof = [round(ori_frame(est[i], gt[i]), 2) if upd[i] else None for i in range(40)]
out["per_frame_ori_deg"] = prof
print("frames 0-29 mean:", np.mean([p for p in prof[:30] if p is not None]).round(2),
      " frames 30-39 mean:", np.mean([p for p in prof[30:] if p is not None]).round(2), flush=True)
json.dump(out, open("/root/repo/benchmarks/_ori_ablate.json", "w"), indent=1)

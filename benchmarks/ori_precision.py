"""Orientation/ATE vs particle count and retries on the 30-frame clean
orbit — the experiment that exposed the TPU bf16-matmul accuracy bug
(PRECISION_r04.json).  Run on TPU (default) or CPU (jax_platforms=cpu).
"""
import sys, dataclasses, json
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from pf_monocular_pose_estimator_tpu.io.synthetic import default_camera, demo_markers, make_orbit_sequence
from pf_monocular_pose_estimator_tpu.tracker import TargetState, make_tracker
from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

camera = default_camera()
markers = demo_markers()
seq = make_orbit_sequence(camera, markers, num_frames=30, fps=50.0)
gt = np.asarray(seq.poses)

def run(n_particles, retries):
    cfg = TrackerConfig(n_particles=n_particles, min_blob_area=8.0, pf_max_retries=retries)
    step = make_tracker(camera, markers, jnp.ones((markers.shape[0],), bool), cfg)
    state = TargetState.create(cfg.n_particles, jax.random.PRNGKey(0))
    est, upd = [], []
    for i in range(30):
        state, res = step(state, seq.frames[i], seq.times[i])
        est.append(np.asarray(res.pose)); upd.append(bool(res.pose_updated))
    est = np.stack(est); upd = np.asarray(upd)
    rel = np.einsum("tij,tkj->tik", est[upd][:, :3, :3], gt[upd][:, :3, :3])
    tr = np.clip((np.trace(rel, axis1=1, axis2=2) - 1) / 2, -1, 1)
    ang = np.degrees(np.arccos(tr))
    ate = np.sqrt(np.mean(np.sum((est[upd][:, :3, 3] - gt[upd][:, :3, 3])**2, -1))) * 1000
    return round(float(ang.mean()), 3), round(float(np.sqrt((ang**2).mean())), 3), round(float(ate), 2)

out = {}
for name, n, r in [("p200_r20", 200, 20), ("p200_r8", 200, 8), ("p10k_r20", 10_000, 20), ("p10k_r8", 10_000, 8), ("p1k_r8", 1_000, 8)]:
    mean_deg, rms_deg, ate = run(n, r)
    out[name] = {"ori_mean": mean_deg, "ori_rms": rms_deg, "ate_mm": ate}
    print(name, out[name], flush=True)
json.dump(out, open("/root/repo/benchmarks/_ori_iso.json", "w"), indent=1)

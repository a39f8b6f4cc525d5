"""Per-frame ESS dynamics + pallas-window coverage at resample-fire frames."""
import sys, dataclasses
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from pf_monocular_pose_estimator_tpu.io.synthetic import default_camera, demo_markers, make_orbit_sequence
from pf_monocular_pose_estimator_tpu.tracker import TargetState, make_tracker
from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

camera = default_camera()
markers = demo_markers()

def coverage_ok(w, wc=12, block=1024):
    n = w.shape[0]
    s = w.sum()
    if s <= 0: return True
    cdf = np.cumsum(w) / s
    u = (np.arange(n) + 0.5) / n
    anc = np.searchsorted(cdf, u)
    nb128 = -(-n // 128)
    for b in range(0, n, block):
        t1 = min(b + block, n) - 1
        c_first = anc[b] >> 7
        c_last = anc[t1] >> 7
        if c_last - c_first + 1 > wc:
            return False
    return True

def run(tag, config, frames, seed=0, faults=False):
    seq = make_orbit_sequence(camera, markers, num_frames=frames, fps=50.0)
    step = make_tracker(camera, markers, jnp.ones(markers.shape[0], bool), config)
    state = TargetState.create(config.n_particles, jax.random.PRNGKey(seed))
    n = config.n_particles
    ess_list, cov_list = [], []
    for i in range(frames):
        state, res = step(state, seq.frames[i], seq.times[i])
        w = np.asarray(state.weights, np.float64)
        s = w.sum()
        if s > 0:
            wn = w / s
            ess = 1.0 / (np.sum(wn * wn) * n)
        else:
            ess = 1.0
        ess_list.append(ess)
        cov_list.append(coverage_ok(w))
    ess = np.array(ess_list); cov = np.array(cov_list)
    print(f"{tag}: ess p5/p50/p95 = {np.percentile(ess,[5,50,95]).round(3)} min={ess.min():.3f}", flush=True)
    for tau in (0.15, 0.25, 0.35, 0.5):
        fire = ess < tau
        fr = fire.mean()
        cov_at_fire = cov[fire].mean() if fire.any() else float("nan")
        print(f"  tau={tau}: fire {fr*100:.0f}% of frames; pallas covered at fire: {cov_at_fire*100:.0f}%", flush=True)
    print(f"  coverage all frames: {cov.mean()*100:.0f}%", flush=True)

base = TrackerConfig(min_blob_area=8.0, pf_max_retries=8)
run("clean-100k", dataclasses.replace(base, n_particles=100_000, roi_particle_subsample=128), 80)
run("outlier-50k", dataclasses.replace(base, n_particles=50_000, number_of_occlusions=1, number_of_false_detections=2), 40)

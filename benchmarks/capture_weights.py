"""Capture real steady-state PF weights from a tracker run to choose
the resampler window width."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from pf_monocular_pose_estimator_tpu.geometry.se3 import exp_se3
from pf_monocular_pose_estimator_tpu.io.synthetic import default_camera, demo_markers, make_orbit_sequence
from pf_monocular_pose_estimator_tpu.tracker import TargetState, tracker_step
from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

n = 100_000
camera = default_camera()
markers = demo_markers()
mask = jnp.ones((markers.shape[0],), bool)
config = TrackerConfig(n_particles=n, min_blob_area=8.0, pf_max_retries=8, roi_particle_subsample=128)
seq = make_orbit_sequence(camera, markers, num_frames=40, fps=50.0)

state = TargetState.create(n, jax.random.PRNGKey(0))
step = jax.jit(lambda s, f, t: tracker_step(s, f, t, camera, markers, mask, config))
for i in range(40):
    state, res = step(state, seq.frames[i], seq.times[i])
# weights live in state? inspect fields
w = np.asarray(state.weights)
w = w / w.sum()
ess = 1.0/np.sum(w*w)
print("ess:", ess, "max w*N:", w.max()*n, "min w*N:", w.min()*n)
# consumption span per 1024-output block
cdf = np.cumsum(w); cdf/=cdf[-1]
u = (np.arange(n)+0.5)/n
anc = np.searchsorted(cdf, u)
spans=[]
for b in range(0, n, 1024):
    t1=min(b+1024,n)-1
    spans.append(anc[t1]-anc[b])
print("max block consumption span:", max(spans), "mean:", np.mean(spans))
np.save("/root/repo/benchmarks/real_weights.npy", w)

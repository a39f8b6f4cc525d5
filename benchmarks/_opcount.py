import sys, collections, re
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from pf_monocular_pose_estimator_tpu.io.synthetic import default_camera, demo_markers, make_orbit_sequence
from pf_monocular_pose_estimator_tpu.tracker import TargetState, make_tracker
from pf_monocular_pose_estimator_tpu.utils import TrackerConfig

camera = default_camera()
markers = demo_markers()
config = TrackerConfig(n_particles=100_000, min_blob_area=8.0, pf_max_retries=8, roi_particle_subsample=128)
seq = make_orbit_sequence(camera, markers, num_frames=2, fps=50.0)
step = make_tracker(camera, markers, jnp.ones(markers.shape[0], bool), config)
state = TargetState.create(config.n_particles, jax.random.PRNGKey(0))
lowered = jax.jit(lambda s, f, t: step(s, f, t)).lower(state, seq.frames[0], seq.times[0])
compiled = lowered.compile()
hlo = compiled.as_text()
open("/root/repo/benchmarks/_step_hlo.txt", "w").write(hlo)
ops = collections.Counter()
small = collections.Counter()
for line in hlo.splitlines():
    m = re.match(r"\s+\S+ = (\S+?)\[?[\d,\[\]]*\]?\{?.*?\}? (\w+)\(", line)
    m2 = re.match(r"\s+(%?[\w\.\-]+) = ([\w\[\],\{\}:\/ ]+?)(\w[\w\-]*)\(", line)
    if m2:
        op = m2.group(3)
        ops[op] += 1
        shape = m2.group(2)
        # scalar/small ops: shapes like f32[] or s32[] or pred[]
        if re.search(r"\w+\[\]", shape):
            small[op] += 1
print("total instr lines:", sum(ops.values()))
print("top ops:", ops.most_common(18))
print("scalar-shaped ops:", sum(small.values()), small.most_common(12))

"""Device-time measurement helper: profile a jitted scan, sum XLA-op
exclusive device time, divide by iterations. Tunnel-RTT-immune."""
import glob, gzip, json, os, shutil, tempfile
import jax, jax.numpy as jnp


def device_time_us(f, *args, reps=32, warm=True):
    """f(*args, c) -> scalar carry. Returns (total_us_per_rep, by_op dict)."""
    def run(*a):
        def body(c, _):
            return f(*a, c), ()
        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return out
    g = jax.jit(run)
    if warm:
        float(g(*args))
    d = tempfile.mkdtemp(prefix="devt_")
    try:
        with jax.profiler.trace(d):
            float(g(*args))
        paths = glob.glob(os.path.join(d, "**", "*.trace.json.gz"), recursive=True)
        assert paths, "no trace captured"
        with gzip.open(sorted(paths)[-1]) as fh:
            trace = json.load(fh)
        tids = {}
        for e in trace["traceEvents"]:
            if e.get("ph") == "M" and e.get("name") == "thread_name":
                tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
        by_op = {}
        tot = 0.0
        for e in trace["traceEvents"]:
            if e.get("ph") == "X" and "dur" in e and "XLA Ops" in tids.get((e["pid"], e["tid"]), ""):
                by_op[e["name"]] = by_op.get(e["name"], 0.0) + e["dur"]
                tot += e["dur"]
        by_op = {k: v / reps for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])}
        return tot / reps, by_op
    finally:
        shutil.rmtree(d, ignore_errors=True)

import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
exec(open("/root/repo/benchmarks/_ori_iso.py").read().replace('for name, n, r in [("p200_r20", 200, 20), ("p200_r8", 200, 8), ("p10k_r20", 10_000, 20), ("p10k_r8", 10_000, 8), ("p1k_r8", 1_000, 8)]:', 'for name, n, r in [("p200_r20", 200, 20), ("p1k_r8", 1_000, 8)]:').replace('_ori_iso.json', '_ori_iso_cpu.json').replace('sys.path.insert(0, "/root/repo")', ''))

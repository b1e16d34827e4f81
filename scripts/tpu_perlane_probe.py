"""Kernel extraction cost (per_lane 2 vs 4, kernel-only step) and a C=256
pipelined full-step point. Usage: python scripts/tpu_perlane_probe.py"""
import functools
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import airmodes
from airmodes.kernels.preamble_pallas import (
    demod_batch_packed_planar_jit, planar_length, preamble_detect_cands_planar)

DEADLINE = time.time() + 1500
print(jax.devices(), flush=True)
cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
p = planar_length(cfg)
rng = np.random.default_rng(0)
base_i = (rng.standard_normal((64, p)) * 6).astype(np.int8)
base_q = (rng.standard_normal((64, p)) * 6).astype(np.int8)
xi = jax.device_put(base_i)
xq = jax.device_put(base_q)
jax.block_until_ready((xi, xq))


@functools.partial(jax.jit, static_argnames=("pl",))
def step_k(a, b, pl):
    cands = preamble_detect_cands_planar(a, b, cfg, ordered=False,
                                         per_lane=pl)
    return cands[:, ::7, ::3, ::31]


def sync_best(name, fn, *args):
    if time.time() > DEADLINE:
        print(f"{name} SKIPPED", flush=True)
        return
    t0 = time.time()
    np.asarray(fn(*args))
    comp = time.time() - t0
    ts = []
    for _ in range(6):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    print(f"{name:8s} compile+1st={comp:7.2f}s best={min(ts)*1e3:8.2f} ms "
          f"(all {[f'{t*1e3:.1f}' for t in ts]})", flush=True)


sync_best("k-pl4", step_k, xi, xq, 4)
sync_best("k-pl2", step_k, xi, xq, 2)

C = 256
xi4 = jax.device_put(np.tile(base_i, (4, 1)))
xq4 = jax.device_put(np.tile(base_q, (4, 1)))
jax.block_until_ready((xi4, xq4))
np.asarray(demod_batch_packed_planar_jit(xi4[:1], xq4[:1], cfg))
np.asarray(demod_batch_packed_planar_jit(xi4, xq4, cfg))
iters = 8
t0 = time.time()
inflight = []
for _ in range(iters):
    inflight.append(demod_batch_packed_planar_jit(xi4, xq4, cfg))
    if len(inflight) > 1:
        np.asarray(inflight.pop(0))
for o in inflight:
    np.asarray(o)
dt = time.time() - t0
print(f"C=256 d2: {dt*1e3/iters:8.2f} ms/dispatch -> "
      f"{iters*C*cfg.block_size/dt/1e9:6.2f} Gsps", flush=True)
print("done", flush=True)

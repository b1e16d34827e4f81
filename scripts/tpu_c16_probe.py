"""C=16 + inflight-depth scan + persistent compile cache check."""
import functools
import time

import jax
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    print("compile cache enabled", flush=True)
except Exception as e:
    print("no compile cache:", e, flush=True)
import numpy as np

import airmodes
from airmodes.kernels.preamble_pallas import demod_batch_packed_fast_jit

t0 = time.time()
print("devices:", jax.devices(), f"({time.time()-t0:.0f}s)", flush=True)
t0 = time.time()
np.asarray(jax.numpy.ones((8, 128)) * 2)
print(f"warmup op {time.time()-t0:.0f}s", flush=True)

cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
n = cfg.left_halo + cfg.block_size + cfg.right_halo
rng = np.random.default_rng(0)
step = functools.partial(demod_batch_packed_fast_jit, cfg=cfg)

for C, depth in ((8, 2), (8, 4), (16, 2), (16, 4)):
    iq = (rng.standard_normal((C, n, 2)) * 6.0).astype(np.int8)
    dev = jax.device_put(iq)
    jax.block_until_ready(dev)
    t0 = time.time()
    np.asarray(step(dev))
    comp = time.time() - t0
    iters = 10
    t0 = time.time()
    inflight = []
    for i in range(iters):
        inflight.append(step(dev))
        if len(inflight) >= depth:
            np.asarray(inflight.pop(0))
    for o in inflight:
        np.asarray(o)
    dt = time.time() - t0
    msps = iters * C * cfg.block_size / dt / 1e6
    print(f"C={C:3d} depth={depth} {dt/iters*1e3:8.1f} ms/call {msps:8.0f} "
          f"Msps (first {comp:.0f}s)", flush=True)

"""Batch-size (C) scaling of the fast demod path, fetch-synced and pipelined.

If the per-dispatch fixed cost (relay RPC + program launch) dominates, the
per-sample cost should fall nearly linearly with C. Measures, per C:
  - serial: fetch each call's packed table before the next dispatch
  - pipelined: keep 2 calls in flight (the bench's pattern)
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import airmodes
from airmodes.kernels.preamble_pallas import demod_batch_packed_fast_jit

DEADLINE = time.time() + 1500
print(jax.devices(), flush=True)

cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
n_in = cfg.left_halo + cfg.block_size + cfg.right_halo
rng = np.random.default_rng(0)
one = (rng.standard_normal((n_in, 2)) * 0.05 * 127).astype(np.int8)

for C in (8, 16, 32, 64):
    if time.time() > DEADLINE:
        print(f"C={C} SKIPPED (deadline)", flush=True)
        continue
    batch = np.broadcast_to(one, (C, n_in, 2)).copy()
    dev = jax.device_put(batch)
    t0 = time.time()
    np.asarray(demod_batch_packed_fast_jit(dev, cfg))
    comp = time.time() - t0
    # serial
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(demod_batch_packed_fast_jit(dev, cfg))
        ts.append(time.time() - t0)
    ser = sorted(ts)[len(ts) // 2]
    # pipelined (2 in flight)
    iters = 8
    t0 = time.time()
    inflight = []
    for _ in range(iters):
        inflight.append(demod_batch_packed_fast_jit(dev, cfg))
        if len(inflight) > 1:
            np.asarray(inflight.pop(0))
    for o in inflight:
        np.asarray(o)
    pipe = (time.time() - t0) / iters
    print(f"C={C:3d} serial {ser*1e3:7.1f} ms {C*cfg.block_size/ser/1e6:7.0f}"
          f" Msps | pipelined {pipe*1e3:7.1f} ms "
          f"{C*cfg.block_size/pipe/1e6:7.0f} Msps (compile {comp:.0f}s)",
          flush=True)
    del dev
print("done", flush=True)

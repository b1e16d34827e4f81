"""Dispatch-size sweep: pipelined (depth 2) full packed step at C=64/128/192
— bigger dispatches amortize the relay's ~24 ms fixed per-fetch cost.

Usage: python scripts/tpu_bigc_probe.py
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import airmodes
from airmodes.kernels.preamble_pallas import (
    demod_batch_packed_planar_jit, planar_length)

DEADLINE = time.time() + 1500
print(jax.devices(), flush=True)

cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
p = planar_length(cfg)
rng = np.random.default_rng(0)
base_i = (rng.standard_normal((64, p)) * 6).astype(np.int8)
base_q = (rng.standard_normal((64, p)) * 6).astype(np.int8)

for C in (64, 128, 192):
    if time.time() > DEADLINE:
        print(f"C={C} SKIPPED", flush=True)
        continue
    reps = C // 64
    xi = jax.device_put(np.tile(base_i, (reps, 1)))
    xq = jax.device_put(np.tile(base_q, (reps, 1)))
    jax.block_until_ready((xi, xq))
    nsamp = C * cfg.block_size
    t0 = time.time()
    try:
        np.asarray(demod_batch_packed_planar_jit(xi, xq, cfg))
    except Exception as e:
        print(f"C={C} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        continue
    comp = time.time() - t0
    iters = 10
    t0 = time.time()
    inflight = []
    for _ in range(iters):
        inflight.append(demod_batch_packed_planar_jit(xi, xq, cfg))
        if len(inflight) > 1:
            np.asarray(inflight.pop(0))
    for o in inflight:
        np.asarray(o)
    dt = time.time() - t0
    print(f"C={C:3d} compile+1st={comp:7.2f}s {dt*1e3/iters:8.2f} ms/dispatch"
          f" -> {iters*nsamp/dt/1e9:6.2f} Gsps", flush=True)
    del xi, xq
print("done", flush=True)

"""Batch-size (C) scaling of the v3 planar-int8 demod path.

The f32 fast path is HBM-bound (~28 B/sample fully explains its time; see
tpu_kernel_ablate.py: DMA-only floor == full kernel). The planar path
touches only ~2.75 B/sample, so at C=16 its measured 33.8 ms/call must be
mostly the fixed per-dispatch relay cost (~35-50 ms, CLAUDE.md). If so,
per-sample cost falls nearly linearly with C until the kernel itself
(~5 GB/s of traffic + a few ms of VPU) dominates.

Measures, per C: serial (fetch before next dispatch) and pipelined
(2 in flight — the bench's pattern).
"""
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
one_i = (rng.standard_normal(p) * 0.05 * 127).astype(np.int8)
one_q = (rng.standard_normal(p) * 0.05 * 127).astype(np.int8)

for C in (16, 32, 64, 128):
    if time.time() > DEADLINE:
        print(f"C={C} SKIPPED (deadline)", flush=True)
        continue
    xi = jax.device_put(np.broadcast_to(one_i, (C, p)).copy())
    xq = jax.device_put(np.broadcast_to(one_q, (C, p)).copy())
    jax.block_until_ready((xi, xq))
    t0 = time.time()
    np.asarray(demod_batch_packed_planar_jit(xi, xq, cfg))
    comp = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(demod_batch_packed_planar_jit(xi, xq, cfg))
        ts.append(time.time() - t0)
    ser = sorted(ts)[len(ts) // 2]
    iters = 8
    t0 = time.time()
    inflight = []
    for _ in range(iters):
        inflight.append(demod_batch_packed_planar_jit(xi, xq, cfg))
        if len(inflight) > 1:
            np.asarray(inflight.pop(0))
    for o in inflight:
        np.asarray(o)
    pipe = (time.time() - t0) / iters
    print(f"C={C:3d} serial {ser*1e3:7.1f} ms {C*cfg.block_size/ser/1e6:7.0f}"
          f" Msps | pipelined {pipe*1e3:7.1f} ms "
          f"{C*cfg.block_size/pipe/1e6:7.0f} Msps (compile {comp:.0f}s)",
          flush=True)
    del xi, xq
print("done", flush=True)

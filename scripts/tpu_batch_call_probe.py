"""Batched-call throughput: C blocks per dispatch, fetch per call, k in flight."""
import functools
import time

import jax
import numpy as np

import airmodes
from airmodes.kernels.preamble_pallas import demod_batch_packed_pallas_jit

cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
n = cfg.left_halo + cfg.block_size + cfg.right_halo
rng = np.random.default_rng(0)

for C in (4, 8):
    print(f"C={C}: building", flush=True)
    iq = (rng.standard_normal((C, n, 2)) * 0.05 * 127).astype(np.int8)
    t0 = time.time()
    dev = jax.device_put(iq)
    jax.block_until_ready(dev)
    print(f"C={C}: H2D {time.time()-t0:.1f}s", flush=True)
    step = functools.partial(demod_batch_packed_pallas_jit, cfg=cfg)
    t0 = time.time()
    np.asarray(step(dev))  # compile
    print(f"C={C}: compile+first {time.time()-t0:.1f}s", flush=True)
    iters = 8
    t0 = time.time()
    inflight = []
    for i in range(iters):
        inflight.append(step(dev))
        if len(inflight) > 2:
            np.asarray(inflight.pop(0))
    for o in inflight:
        np.asarray(o)
    dt = time.time() - t0
    msps = iters * C * cfg.block_size / dt / 1e6
    print(f"C={C:3d}  {dt/iters*1e3:7.2f} ms/call  {msps:9.0f} Msps", flush=True)

"""Big-batch fetch-synced throughput with 3 calls in flight."""
import functools
import time

import jax
import numpy as np

import airmodes
from airmodes.kernels.preamble_pallas import demod_batch_packed_pallas_jit

rng = np.random.default_rng(0)


def run(C, log2n, iters=8, inflight_max=3):
    cfg = airmodes.DspConfig(block_size=1 << log2n, max_detections=256)
    n = cfg.left_halo + cfg.block_size + cfg.right_halo
    iq = (rng.standard_normal((C, n, 2)) * 0.05 * 127).astype(np.int8)
    t0 = time.time()
    dev = jax.device_put(iq)
    jax.block_until_ready(dev)
    h2d = time.time() - t0
    step = functools.partial(demod_batch_packed_pallas_jit, cfg=cfg)
    t0 = time.time()
    np.asarray(step(dev))
    compile_s = time.time() - t0
    t0 = time.time()
    inflight = []
    for i in range(iters):
        inflight.append(step(dev))
        if len(inflight) >= inflight_max:
            np.asarray(inflight.pop(0))
    for o in inflight:
        np.asarray(o)
    dt = time.time() - t0
    msps = iters * C * cfg.block_size / dt / 1e6
    print(f"C={C:3d} blk=2^{log2n} {dt/iters*1e3:8.1f} ms/call {msps:8.0f} Msps"
          f"  (h2d {h2d:.1f}s, compile {compile_s:.0f}s)", flush=True)


run(16, 22)
run(8, 23)
run(16, 23)

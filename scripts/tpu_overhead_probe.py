"""Isolate relay overheads: dispatch-only vs fetch-only vs both."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import airmodes
from airmodes.kernels.preamble_pallas import demod_batch_packed_pallas_jit

cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
n = cfg.left_halo + cfg.block_size + cfg.right_halo
rng = np.random.default_rng(0)
C = 4
iq = (rng.standard_normal((C, n, 2)) * 0.05 * 127).astype(np.int8)
dev = jax.device_put(iq)
jax.block_until_ready(dev)
step = functools.partial(demod_batch_packed_pallas_jit, cfg=cfg)
out = step(dev)
np.asarray(out)
print("compiled", flush=True)

# 1. dispatch-only: launch 8, block on last (no host fetch of values)
t0 = time.time()
outs = [step(dev) for _ in range(8)]
jax.block_until_ready(outs[-1])
dt = time.time() - t0
print(f"dispatch-only  {dt/8*1e3:7.2f} ms/call", flush=True)

# 2. fetch-only: np.asarray the same completed output repeatedly
res = outs[-1]
t0 = time.time()
for _ in range(8):
    np.asarray(res)
dt = time.time() - t0
print(f"fetch (C,257,14) {dt/8*1e3:7.2f} ms/fetch", flush=True)

# 3. fetch tiny scalar
s = jnp.sum(res)
jax.block_until_ready(s)
t0 = time.time()
for _ in range(8):
    np.asarray(s)
dt = time.time() - t0
print(f"fetch scalar   {dt/8*1e3:7.2f} ms/fetch", flush=True)

# 4. dispatch+sync without fetch: block each call
t0 = time.time()
for _ in range(8):
    jax.block_until_ready(step(dev))
dt = time.time() - t0
print(f"dispatch+sync  {dt/8*1e3:7.2f} ms/call", flush=True)

"""Probe: batched multi-block demod per device call (amortize op overhead)."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from airmodes.config import DspConfig
from airmodes.dsp import pipeline as P
from airmodes.testing import encoder
from airmodes.io import sources

cfg = DspConfig(block_size=1 << 20, max_detections=128)
frames = encoder.random_df17_frames(60, seed=61)
iq, _ = encoder.make_capture(frames, snr_db=18.0, spacing=12000, seed=61,
                             total_samples=cfg.block_size)
block, _ = next(sources.frame_blocks(iq, cfg))
x1 = P.iq_to_device_layout(block)

def bench(name, fn, *args, iters=20):
    f = jax.jit(fn)
    t0 = time.time(); o = jax.block_until_ready(f(*args)); c = time.time()-t0
    t0 = time.time()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    dt = (time.time()-t0)/iters
    return dt, c

# single-block pallas full demod baseline
from airmodes.kernels.preamble_pallas import demod_block_pallas
xd = jax.device_put(x1)
dt, c = bench('single', functools.partial(demod_block_pallas, cfg=cfg), xd)
print(f'single pallas full: {dt*1e3:.2f} ms -> {cfg.block_size/dt/1e6:.0f} Msps (compile {c:.0f}s)', flush=True)

for C in (4, 8):
    xb = jax.device_put(np.stack([x1]*C))
    # XLA batched
    try:
        dt, c = bench('xla', jax.vmap(functools.partial(P.demod_block, cfg=cfg)), xb)
        print(f'xla batched C={C}: {dt*1e3:.2f} ms -> {C*cfg.block_size/dt/1e6:.0f} Msps (compile {c:.0f}s)', flush=True)
    except Exception as e:
        print(f'xla batched C={C}: FAIL {type(e).__name__}', flush=True)
    # pallas batched
    try:
        dt, c = bench('pal', jax.vmap(functools.partial(demod_block_pallas, cfg=cfg)), xb)
        print(f'pallas batched C={C}: {dt*1e3:.2f} ms -> {C*cfg.block_size/dt/1e6:.0f} Msps (compile {c:.0f}s)', flush=True)
    except Exception as e:
        print(f'pallas batched C={C}: FAIL {type(e).__name__}: {str(e)[:120]}', flush=True)

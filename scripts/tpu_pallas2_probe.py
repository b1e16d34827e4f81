"""Probe: 2D-layout Pallas detect kernel on real TPU vs 1D and XLA."""
import time, functools
import numpy as np
import jax
from airmodes.config import DspConfig
from airmodes.dsp import pipeline as P
from airmodes.kernels.preamble_pallas import (preamble_detect_pallas,
                                              preamble_detect_pallas_2d)
from airmodes.testing import encoder
from airmodes.io import sources

cfg = DspConfig(block_size=1 << 20, max_detections=128)
frames = encoder.random_df17_frames(60, seed=61)
iq, truth = encoder.make_capture(frames, snr_db=18.0, spacing=12000, seed=61,
                                 total_samples=cfg.block_size)
block, _ = next(sources.frame_blocks(iq, cfg))
x = jax.device_put(P.iq_to_device_layout(block))

f1 = jax.jit(functools.partial(preamble_detect_pallas, cfg=cfg))
f2 = jax.jit(functools.partial(preamble_detect_pallas_2d, cfg=cfg))
t0 = time.time(); m1, r1 = jax.block_until_ready(f1(x)); print(f'1d compile {time.time()-t0:.1f}s', flush=True)
t0 = time.time(); m2, r2 = jax.block_until_ready(f2(x)); print(f'2d compile {time.time()-t0:.1f}s', flush=True)
m1n = np.asarray(m1).astype(bool); m2n = np.asarray(m2).astype(bool)
print('hits:', int(m1n.sum()), int(m2n.sum()), 'equal:', bool((m1n == m2n).all()), flush=True)
for name, fn in [('1d', f1), ('2d', f2)]:
    t0 = time.time()
    for _ in range(30):
        o = fn(x)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / 30
    print(f'{name}: {dt*1e3:.3f} ms -> {cfg.block_size/dt/1e6:.0f} Msamples/s', flush=True)

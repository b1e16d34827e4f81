"""Probe: Pallas fused detect kernel compiled on real TPU vs XLA path."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from airmodes.config import DspConfig
from airmodes.dsp import pipeline as P
from airmodes.kernels.preamble_pallas import preamble_detect_pallas, demod_block_pallas
from airmodes.testing import encoder
from airmodes.io import sources
import functools

cfg = DspConfig(block_size=1 << 20, max_detections=128)
frames = encoder.random_df17_frames(60, seed=61)
iq, truth = encoder.make_capture(frames, snr_db=18.0, spacing=12000, seed=61,
                                 total_samples=cfg.block_size)
block, start = next(sources.frame_blocks(iq, cfg))
x = P.iq_to_device_layout(block)

pallas_fn = jax.jit(functools.partial(preamble_detect_pallas, cfg=cfg))
t0 = time.time()
mask_p, ref_p = jax.block_until_ready(pallas_fn(x))
print(f'pallas compile {time.time()-t0:.1f}s', flush=True)

jnp_fn = jax.jit(lambda v: P.preamble_detect(
    P.magnitude_squared(v), P.noise_floor(P.magnitude_squared(v), 128),
    cfg, cfg.left_halo, cfg.block_size))
t0 = time.time()
mask_j, ref_j = jax.block_until_ready(jnp_fn(x))
print(f'xla compile {time.time()-t0:.1f}s', flush=True)

mp = np.asarray(mask_p).astype(bool)
mj = np.asarray(mask_j)
print('hits pallas/jnp:', int(mp.sum()), int(mj.sum()), 'equal:', bool((mp == mj).all()), flush=True)

xd = jax.device_put(x)
for name, fn in [('pallas', pallas_fn), ('xla', jnp_fn)]:
    jax.block_until_ready(fn(xd))
    t0 = time.time()
    for _ in range(20):
        o = fn(xd)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / 20
    print(f'{name} detect: {dt*1e3:.3f} ms -> {cfg.block_size/dt/1e6:.0f} Msamples/s(dev)', flush=True)

# full demod with pallas front-end
full_p = jax.jit(functools.partial(demod_block_pallas, cfg=cfg))
t0 = time.time()
tp = jax.block_until_ready(full_p(xd))
print(f'full pallas demod compile {time.time()-t0:.1f}s', flush=True)
full_j = jax.jit(functools.partial(P.demod_block, cfg=cfg))
tj = jax.block_until_ready(full_j(xd))
print('tables equal:', all(bool(np.array_equal(np.asarray(a), np.asarray(b))) for a, b in zip(tp, tj)), flush=True)
for name, fn in [('pallas-full', full_p), ('xla-full', full_j)]:
    t0 = time.time()
    for _ in range(20):
        o = fn(xd)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / 20
    print(f'{name}: {dt*1e3:.3f} ms -> {cfg.block_size/dt/1e6:.0f} Msamples/s(dev)', flush=True)

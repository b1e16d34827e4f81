"""Per-stage timing of the Pallas demod path on the real TPU.

Times (device-resident input, block_until_ready):
  - pallas detect kernel alone
  - mag2 + noise_floor (full-block XLA tail work)
  - compact_detections (top_k over N)
  - slice + crc + pack (K-sized tail)
  - full demod_block_packed_pallas_jit
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import airmodes
from airmodes.dsp import pipeline as P
from airmodes.kernels import preamble_pallas as K

cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
n = cfg.left_halo + cfg.block_size + cfg.right_halo
rng = np.random.default_rng(0)
iq = (rng.standard_normal((n, 2)) * 0.05 * 127).astype(np.int8)
dev = jax.device_put(iq)
jax.block_until_ready(dev)


def timeit(name, fn, *args, iters=8):
    out = jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / iters
    print(f"{name:34s} {dt*1e3:8.2f} ms  {cfg.block_size/dt/1e6:9.0f} Msps")
    return out


detect = jax.jit(functools.partial(K.preamble_detect_pallas, cfg=cfg),
                 static_argnames=())
mask, ref = timeit("pallas detect", lambda x: K and detect(x), dev)

@jax.jit
def magnoise(x):
    m = P.magnitude_squared(x)
    return P.noise_floor(m, cfg.noise_window)

timeit("mag2 + noise_floor (XLA)", magnoise, dev)

@jax.jit
def compact(m):
    return P.compact_detections(m.astype(bool), cfg.max_detections)

timeit("compact (top_k 4M)", compact, mask)

det_idx, valid, n_det, overflow = jax.block_until_ready(compact(mask))

@jax.jit
def tail(x, det_idx, valid, ref):
    mag2 = P.magnitude_squared(x)
    noise = P.noise_floor(mag2, cfg.noise_window)
    left = cfg.left_halo
    safe_idx = jnp.where(valid, det_idx, 0)
    ref_level = ref[safe_idx]
    bits, confidence = P.slice_bits(mag2, det_idx, valid, ref_level, cfg, left)
    out_bits, df, nbits, synd, status = P.crc_check_and_correct(
        bits, confidence, cfg)
    return out_bits, noise[left + safe_idx]

timeit("tail incl mag2/noise (XLA)", tail, dev, det_idx, valid, ref)


@jax.jit
def slice_crc_only(mag2, noise, det_idx, valid, ref):
    left = cfg.left_halo
    safe_idx = jnp.where(valid, det_idx, 0)
    ref_level = ref[safe_idx]
    bits, confidence = P.slice_bits(mag2, det_idx, valid, ref_level, cfg, left)
    out = P.crc_check_and_correct(bits, confidence, cfg)
    return out

m2 = jax.block_until_ready(jax.jit(P.magnitude_squared)(dev))
nz = jax.block_until_ready(jax.jit(
    functools.partial(P.noise_floor, window=cfg.noise_window))(m2))
timeit("slice+crc only (K-sized)", slice_crc_only, m2, nz, det_idx, valid, ref)

full = jax.jit(functools.partial(
    K.demod_block_packed_pallas_jit, cfg=cfg))
timeit("FULL pallas demod packed", lambda x: full(x), dev)

fullb = jax.jit(functools.partial(
    K.demod_batch_packed_pallas_jit, cfg=cfg))
devb = jax.device_put(iq[None].repeat(4, axis=0))
jax.block_until_ready(devb)
out = jax.block_until_ready(fullb(devb))
t0 = time.time()
for _ in range(4):
    out = fullb(devb)
jax.block_until_ready(out)
dt = (time.time() - t0) / 4
print(f"{'FULL batched C=4':34s} {dt*1e3:8.2f} ms  "
      f"{4*cfg.block_size/dt/1e6:9.0f} Msps")

"""Fetch-synced split: detect kernel vs XLA tail, 1D vs 2D layouts.

Every case reduces its outputs to a tiny array fetched per call, so the
timing includes true execution. Fixed relay cost ~45ms/call is measured by
a no-op case and subtracted mentally.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

import airmodes
from airmodes.dsp import pipeline as P
from airmodes.kernels import preamble_pallas as K

rng = np.random.default_rng(0)
cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
n = cfg.left_halo + cfg.block_size + cfg.right_halo
iq = (rng.standard_normal((n, 2)) * 0.05 * 127).astype(np.int8)
dev = jax.device_put(iq)
jax.block_until_ready(dev)


def case(name, fn, *args, iters=6):
    t0 = time.time()
    np.asarray(fn(*args))
    compile_s = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:32s} {med*1e3:8.1f} ms/call (compile {compile_s:.0f}s, "
          f"min {min(ts)*1e3:.1f})", flush=True)


@jax.jit
def noop(x):
    return x[0, :] + 1.0  # trivial

case("noop (fixed relay cost)", noop, dev.astype(jnp.float32))


@jax.jit
def det1d(x):
    mask, ref = K.preamble_detect_pallas(x, cfg)
    return jnp.sum(mask) + jnp.sum(ref)

case("detect 1D + reduce", det1d, dev)


@jax.jit
def det2d(x):
    mask, ref = K.preamble_detect_pallas_2d(x, cfg)
    return jnp.sum(mask) + jnp.sum(ref)

case("detect 2D + reduce", det2d, dev)

# tail pieces on precomputed mask/ref
mask, ref = jax.jit(functools.partial(K.preamble_detect_pallas, cfg=cfg))(dev)
mask, ref = jax.device_put(np.asarray(mask)), jax.device_put(np.asarray(ref))


@jax.jit
def mag_noise(x):
    m = P.magnitude_squared(x)
    nz = P.noise_floor(m, cfg.noise_window)
    return jnp.sum(nz)

case("mag2+noise_floor + reduce", mag_noise, dev)


@jax.jit
def compact_only(m):
    det_idx, valid, n_det, overflow = P.compact_detections(
        m.astype(bool), cfg.max_detections)
    return det_idx

case("compact top_k", compact_only, mask)


@jax.jit
def tail_full(x, m, r):
    mag2 = P.magnitude_squared(x)
    noise = P.noise_floor(mag2, cfg.noise_window)
    det_idx, valid, n_det, overflow = P.compact_detections(
        m.astype(bool), cfg.max_detections)
    left = cfg.left_halo
    safe_idx = jnp.where(valid, det_idx, 0)
    ref_level = r[safe_idx]
    bits, confidence = P.slice_bits(mag2, det_idx, valid, ref_level, cfg, left)
    out_bits, df, nbits, synd, status = P.crc_check_and_correct(
        bits, confidence, cfg)
    status = jnp.where(valid, status, P.STATUS_FAIL)
    return P.pack_table(P.DetectionTable(
        index=jnp.where(valid, det_idx, -1), bits=out_bits.astype(jnp.uint8),
        df=jnp.where(valid, df, -1), nbits=nbits, syndrome=synd,
        status=status, ref_level=ref_level, noise=noise[left + safe_idx],
        n_detected=n_det, n_overflow=overflow))

case("XLA tail (mask->packed)", tail_full, dev, mask, ref)

case("FULL packed 1D", functools.partial(
    K.demod_block_packed_pallas_jit, cfg=cfg), dev)

"""Fetch-synced throughput matrix: kernel variant x batch x block size.

Every timing fetches the packed result (np.asarray) per call — the only
sync that provably round-trips on the axon relay.
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


def packed_2d(iq, cfg):
    mask, ref = K.preamble_detect_pallas_2d(iq, cfg)
    mag2 = P.magnitude_squared(iq)
    noise = P.noise_floor(mag2, cfg.noise_window)
    det_idx, valid, n_det, overflow = P.compact_detections(
        mask.astype(bool), cfg.max_detections)
    left = cfg.left_halo
    safe_idx = jnp.where(valid, det_idx, 0)
    ref_level = ref[safe_idx]
    bits, confidence = P.slice_bits(mag2, det_idx, valid, ref_level, cfg, left)
    out_bits, df, nbits, synd, status = P.crc_check_and_correct(
        bits, confidence, cfg)
    status = jnp.where(valid, status, P.STATUS_FAIL)
    return P.pack_table(P.DetectionTable(
        index=jnp.where(valid, det_idx, -1), bits=out_bits.astype(jnp.uint8),
        df=jnp.where(valid, df, -1), nbits=nbits, syndrome=synd,
        status=status, ref_level=ref_level, noise=noise[left + safe_idx],
        n_detected=n_det, n_overflow=overflow))


packed_2d_jit = jax.jit(packed_2d, static_argnames=("cfg",))


def bench_case(name, fn, dev, total_samples, iters=6):
    t0 = time.time()
    np.asarray(fn(dev))
    compile_s = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(fn(dev))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:40s} {med*1e3:8.2f} ms/call {total_samples/med/1e6:8.0f} "
          f"Msps (compile {compile_s:.0f}s, min {min(ts)*1e3:.1f} max {max(ts)*1e3:.1f})",
          flush=True)


def make_input(C, cfg):
    n = cfg.left_halo + cfg.block_size + cfg.right_halo
    iq = (rng.standard_normal((C, n, 2)) * 0.05 * 127).astype(np.int8)
    if C == 1:
        iq = iq[0]
    dev = jax.device_put(iq)
    jax.block_until_ready(dev)
    return dev


cfg22 = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
cfg23 = airmodes.DspConfig(block_size=1 << 23, max_detections=256)

d1 = make_input(1, cfg22)
bench_case("xla single 4M", functools.partial(
    P.demod_block_packed_jit, cfg=cfg22), d1, cfg22.block_size)
bench_case("pallas1d single 4M", functools.partial(
    K.demod_block_packed_pallas_jit, cfg=cfg22), d1, cfg22.block_size)
bench_case("pallas2d single 4M", functools.partial(
    packed_2d_jit, cfg=cfg22), d1, cfg22.block_size)

d4 = make_input(4, cfg22)
bench_case("pallas1d batch C=4 4M", functools.partial(
    K.demod_batch_packed_pallas_jit, cfg=cfg22), d4, 4 * cfg22.block_size)

d8 = make_input(8, cfg22)
bench_case("pallas1d batch C=8 4M", functools.partial(
    K.demod_batch_packed_pallas_jit, cfg=cfg22), d8, 8 * cfg22.block_size)

d1b = make_input(1, cfg23)
bench_case("pallas1d single 8M", functools.partial(
    K.demod_block_packed_pallas_jit, cfg=cfg23), d1b, cfg23.block_size)

d4b = make_input(4, cfg23)
bench_case("pallas1d batch C=4 8M", functools.partial(
    K.demod_batch_packed_pallas_jit, cfg=cfg23), d4b, 4 * cfg23.block_size)

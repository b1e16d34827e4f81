"""Fetch-synced breakdown of the K-sized gather tail on the real TPU.

The fast path's post-kernel work per block: compact -> gather (K windows
from raw int8 I/Q) -> bits/confidence -> CRC/ECC -> pack. This probe times
the tail stages with synthetic detection indices (device-resident), plus an
alternative row-aligned gather formulation.
"""
import functools
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

import airmodes
from airmodes.dsp import pipeline as P

DEADLINE = time.time() + 1400
print(jax.devices(), flush=True)

cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
C, K = 16, cfg.max_detections
n_in = cfg.left_halo + cfg.block_size + cfg.right_halo
sps = cfg.sps
nw = cfg.noise_window
W = nw + 242 * sps

rng = np.random.default_rng(0)
iq = (rng.standard_normal((C, n_in, 2)) * 0.05 * 127).astype(np.int8)
det = np.sort(rng.integers(0, cfg.block_size - 1, (C, K)).astype(np.int32), 1)
ref = (rng.standard_normal((C, K)).astype(np.float32) ** 2) * 0.01
dev = jax.device_put(iq)
ddet = jax.device_put(det)
dref = jax.device_put(ref)
np.asarray(jax.jit(lambda x: x[0, 0, 0])(dev))


def timeit(name, fn, *args, iters=5):
    if time.time() > DEADLINE:
        print(f"{name:30s} SKIPPED (deadline)", flush=True)
        return
    t0 = time.time()
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])
    comp = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(*args)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:30s} {med*1e3:8.1f} ms  {C*cfg.block_size/med/1e6:8.0f} Msps"
          f"  (compile {comp:.0f}s)", flush=True)


# --- stage 1: window gather only (current formulation) ----------------------
@jax.jit
def g_slab(x, det_idx):
    def one(iq_c, idx_c):
        start = cfg.left_halo + idx_c - nw
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(iq_c, (s, 0), (W, 2)))(start)
        return win
    win = jax.vmap(one)(x, det_idx)                       # (C, K, W, 2) int8
    return jnp.sum(win.astype(jnp.int32), axis=(2, 3))    # (C, K)


# --- alternative: row-aligned 1024-sample slab + in-register extract ---------
SLAB = W + 1024  # window lies at offset (start % 1024) within the slab


@jax.jit
def g_rows(x, det_idx):
    def one(iq_c, idx_c):
        start = cfg.left_halo + idx_c - nw
        s0 = (start // 1024) * 1024
        slab = jax.vmap(
            lambda s: jax.lax.dynamic_slice(iq_c, (s, 0), (SLAB, 2)))(s0)
        off = start - s0                                   # (K,) in [0, 1024)
        cols = off[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        w = jnp.take_along_axis(slab[..., 0], cols, axis=1)
        w2 = jnp.take_along_axis(slab[..., 1], cols, axis=1)
        return w.astype(jnp.int32) + w2.astype(jnp.int32)
    return jax.vmap(one)(x, det_idx)


# --- full tail stages --------------------------------------------------------
def tail(x, det_idx, ref_l, upto: int):
    valid = jnp.ones_like(det_idx, dtype=bool)

    def one(iq_c, idx_c, ref_c, valid_c):
        t = _tail_one(iq_c, idx_c, ref_c, valid_c, upto)
        return t
    return jax.vmap(one)(x, det_idx, ref_l, valid)


def _tail_one(iq_c, idx_c, ref_c, valid_c, upto):
    start = cfg.left_halo + idx_c - nw
    win = jax.vmap(
        lambda s: jax.lax.dynamic_slice(iq_c, (s, 0), (W, 2)))(start)
    win = win.astype(jnp.float32) * (1.0 / 127.0)
    w2 = win[..., 0] ** 2 + win[..., 1] ** 2
    if upto == 1:
        return jnp.sum(w2, axis=1)
    noise_at = jnp.mean(w2[:, :nw], axis=1)
    n_chips = 224
    chip0 = nw + 16 * sps
    energies = jax.lax.slice_in_dim(w2, chip0, chip0 + n_chips, axis=1)
    e0 = energies[:, 0::2]
    e1 = energies[:, 1::2]
    bits = e0 > e1
    level = ref_c[:, None] * jnp.float32(cfg.confidence_level)
    confidence = jnp.logical_xor(e0 > level, e1 > level)
    if upto == 2:
        return bits, confidence, noise_at
    out_bits, df, nbits, synd, status = P.crc_check_and_correct(
        bits, confidence, cfg)
    if upto == 3:
        return out_bits, df, synd
    table = P.DetectionTable(
        index=idx_c, bits=out_bits.astype(jnp.uint8), df=df, nbits=nbits,
        syndrome=synd, status=status, ref_level=ref_c, noise=noise_at,
        n_detected=jnp.int32(K), n_overflow=jnp.int32(0))
    return P.pack_table(table)


timeit("gather slab (W,2) int8", g_slab, dev, ddet)
timeit("gather 1024-aligned+extract", g_rows, dev, ddet)
timeit("tail upto=1 (gather+mag2)",
       jax.jit(functools.partial(tail, upto=1)), dev, ddet, dref)
timeit("tail upto=2 (+bits/conf)",
       jax.jit(functools.partial(tail, upto=2)), dev, ddet, dref)
timeit("tail upto=3 (+crc/ecc)",
       jax.jit(functools.partial(tail, upto=3)), dev, ddet, dref)
timeit("tail upto=4 (+pack)",
       jax.jit(functools.partial(tail, upto=4)), dev, ddet, dref)
print("done", flush=True)

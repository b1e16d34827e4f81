"""Tail gather formulations on TPU: which K-window gather is fastest?

The stage probe shows the K-sized gather tail costs ~43 ms per 268M-sample
dispatch (C=64, K=256, W=612) — ~2x the whole XLA tail budget. Candidates:
  g0 : vmapped dynamic_slice on the (P,) stream  (current gather_tail_planar)
  g1 : flat jnp.take with (K*W,) indices per channel
  g2 : two-level: row gather (K, 6 rows of 128) + take_along_axis within
  g3 : take_along_axis on (K, P)? no — g3 = gather on int16-packed I|Q
       (halves the gather count; unpack with shifts)
  crc: crc_check_and_correct alone on dummy bits (K*C, 112)

Each variant computes a checksum-ish reduction so nothing is elided, and is
fetch-synced. Usage: python scripts/tpu_gather_probe.py [C]
"""
import functools
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
import airmodes
from airmodes.dsp import pipeline as P
from airmodes.kernels.preamble_pallas import planar_length

DEADLINE = time.time() + 1500
print(jax.devices(), flush=True)

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
K = cfg.max_detections
W = cfg.noise_window + 242 * cfg.sps
p = planar_length(cfg, 65536)
rng = np.random.default_rng(0)
xi = jax.device_put(
    (rng.standard_normal((C, p)) * 6).astype(np.int8))
xq = jax.device_put(
    (rng.standard_normal((C, p)) * 6).astype(np.int8))
# plausible detection starts: ascending random within the block
det = np.sort(rng.integers(0, cfg.block_size, size=(C, K)), axis=1)
det = jax.device_put(det.astype(np.int32))
jax.block_until_ready((xi, xq, det))
nsamp = C * cfg.block_size


@jax.jit
def g0(a, b, d):
    def per_ch(ac, bc, dc):
        start = cfg.left_halo + dc - cfg.noise_window
        wi = jax.vmap(lambda s: jax.lax.dynamic_slice(ac, (s,), (W,)))(start)
        wq = jax.vmap(lambda s: jax.lax.dynamic_slice(bc, (s,), (W,)))(start)
        return wi.astype(jnp.int32) + wq.astype(jnp.int32)
    w = jax.vmap(per_ch)(a, b, d)
    return jnp.sum(w, axis=(1, 2))


@jax.jit
def g1(a, b, d):
    def per_ch(ac, bc, dc):
        start = cfg.left_halo + dc - cfg.noise_window
        idx = start[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        wi = jnp.take(ac, idx.reshape(-1), mode="clip").reshape(K, W)
        wq = jnp.take(bc, idx.reshape(-1), mode="clip").reshape(K, W)
        return wi.astype(jnp.int32) + wq.astype(jnp.int32)
    w = jax.vmap(per_ch)(a, b, d)
    return jnp.sum(w, axis=(1, 2))


NROWS = W // 128 + 2                       # rows covering any W window


@jax.jit
def g2(a, b, d):
    def per_ch(ac, bc, dc):
        rc_i = ac.reshape(-1, 128)
        rc_q = bc.reshape(-1, 128)
        start = cfg.left_halo + dc - cfg.noise_window
        row0 = start >> 7
        rows = row0[:, None] + jnp.arange(NROWS, dtype=jnp.int32)[None, :]
        wi = jnp.take(rc_i, rows.reshape(-1), axis=0,
                      mode="clip").reshape(K, NROWS * 128)
        wq = jnp.take(rc_q, rows.reshape(-1), axis=0,
                      mode="clip").reshape(K, NROWS * 128)
        off = (start & 127)[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        wi = jnp.take_along_axis(wi, off, axis=1)
        wq = jnp.take_along_axis(wq, off, axis=1)
        return wi.astype(jnp.int32) + wq.astype(jnp.int32)
    w = jax.vmap(per_ch)(a, b, d)
    return jnp.sum(w, axis=(1, 2))


@jax.jit
def g3(a, b, d):
    packed = (a.astype(jnp.int16) & 0xFF) | (b.astype(jnp.int16) << 8)
    def per_ch(pc, dc):
        start = cfg.left_halo + dc - cfg.noise_window
        wp = jax.vmap(lambda s: jax.lax.dynamic_slice(pc, (s,), (W,)))(start)
        wi = (wp.astype(jnp.int32) << 24) >> 24
        wq = wp.astype(jnp.int32) >> 8
        return wi + wq
    w = jax.vmap(per_ch)(packed, d)
    return jnp.sum(w, axis=(1, 2))


bits = jax.device_put(rng.integers(0, 2, size=(C * K, 112)).astype(bool))
conf = jax.device_put(rng.integers(0, 2, size=(C * K, 112)).astype(bool))


@jax.jit
def crc(bt, cf):
    out_bits, df, nbits, synd, status = P.crc_check_and_correct(bt, cf, cfg)
    return jnp.sum(synd), jnp.sum(status)


def timeit(name, fn, *args):
    if time.time() > DEADLINE:
        print(f"{name} SKIPPED (deadline)", flush=True)
        return
    t0 = time.time()
    try:
        jax.tree.map(np.asarray, fn(*args))
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return
    comp = time.time() - t0
    ts = []
    for _ in range(6):
        if time.time() > DEADLINE:
            break
        t0 = time.time()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.time() - t0)
    if ts:
        best = min(ts)
        print(f"{name:4s} compile+1st={comp:7.2f}s best={best*1e3:8.2f} ms "
              f"-> {nsamp/best/1e9:6.2f} Gsps-equiv "
              f"(all {[f'{t*1e3:.1f}' for t in ts]})", flush=True)


timeit("g0", g0, xi, xq, det)
timeit("g1", g1, xi, xq, det)
timeit("g2", g2, xi, xq, det)
timeit("g3", g3, xi, xq, det)
timeit("crc", crc, bits, conf)
print("done", flush=True)

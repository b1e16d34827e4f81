"""Fetch-synced per-stage breakdown of the fast batched demod path (TPU).

block_until_ready lies on the axon relay (CLAUDE.md), so every timing here
fetches a (tiny) real output per call. Stages, each inclusive of the ones
before it:

  null     : relay round-trip floor (fetch 1 scalar of a trivial op)
  prep     : int8 -> f32 scale + planar (rows,128) split (the XLA pre-kernel)
  detect   : + the fused 2D Pallas detect kernel          [tile sweep]
  compact  : + per-block two-stage top-K compaction
  full     : demod_batch_packed_fast_jit                  [tile sweep]
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
from airmodes.kernels import preamble_pallas as K

DEADLINE = time.time() + 1500  # exit cleanly before any external timeout

print(jax.devices(), flush=True)

cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
C = 16
n_in = cfg.left_halo + cfg.block_size + cfg.right_halo
rng = np.random.default_rng(0)
iq = (rng.standard_normal((C, n_in, 2)) * 0.05 * 127).astype(np.int8)
dev = jax.device_put(iq)
np.asarray(jax.jit(lambda x: x[0, 0, 0])(dev))  # materialize


def timeit(name, fn, iters=5):
    if time.time() > DEADLINE:
        print(f"{name:28s} SKIPPED (deadline)", flush=True)
        return None
    t0 = time.time()
    np.asarray(jax.tree_util.tree_leaves(fn(dev))[0])
    comp = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(dev)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    msps = C * cfg.block_size / med / 1e6
    print(f"{name:28s} {med*1e3:8.1f} ms  {msps:8.0f} Msps  "
          f"(compile {comp:.0f}s, min {min(ts)*1e3:.1f})", flush=True)
    return med


@jax.jit
def f_null(x):
    return x[0, 0, 0].astype(jnp.int32) + 1


def prep(x):
    xf = x.astype(jnp.float32) * (1.0 / 127.0)
    xi = xf[:, : (n_in // 128) * 128, 0].reshape(C, -1, 128)
    xq = xf[:, : (n_in // 128) * 128, 1].reshape(C, -1, 128)
    return jnp.sum(xi) + jnp.sum(xq)


def f_detect(tile):
    @jax.jit
    def f(x):
        mask, ref = K.preamble_detect_pallas_2d_batch(x, cfg, tile=tile)
        return mask[:, ::65536], ref[:, ::65536]
    return f


def f_compact(tile):
    @jax.jit
    def f(x):
        mask, ref = K.preamble_detect_pallas_2d_batch(x, cfg, tile=tile)
        det_idx, valid, n_det, ovf = jax.vmap(
            lambda m: P.compact_detections(m.astype(bool),
                                           cfg.max_detections))(mask)
        return det_idx
    return f


def f_full(tile):
    @jax.jit
    def f(x):
        return K.demod_batch_packed_fast_jit(x, cfg, tile=tile)
    return f


timeit("null (relay floor)", f_null, iters=7)
timeit("prep int8->f32 planar", jax.jit(prep))
for tile in (16384, 32768, 65536):
    timeit(f"detect tile={tile}", f_detect(tile))
timeit("compact (tile=16384)", f_compact(16384))
for tile in (16384, 32768, 65536):
    timeit(f"FULL tile={tile}", f_full(tile))
print("done", flush=True)

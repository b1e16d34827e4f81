"""Stage split of the v3 planar path on TPU: kernel | compact | tail | pack.

At C=64/tile=65536/nbuf=2 the full path plateaus at ~78 ms pipelined while
the detect kernel's own DMA+compute should be ~15 ms — find where the rest
goes. Variants (each jitted separately, fetch-synced on a small slice):
  k    : cands kernel only
  kc   : + compact_candidates
  kcg  : + gather_tail_planar (full table, unpacked fetch of index only)
  full : + pack_table (the production step)
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
from airmodes.kernels.preamble_pallas import (
    compact_candidates, demod_batch_packed_planar_jit, gather_tail_planar,
    planar_length, preamble_detect_cands_planar)

DEADLINE = time.time() + 2000
print(jax.devices(), flush=True)

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
NBUF = int(sys.argv[3]) if len(sys.argv) > 3 else 2
cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
p = planar_length(cfg, TILE)
rng = np.random.default_rng(0)
one_i = (rng.standard_normal(p) * 0.05 * 127).astype(np.int8)
one_q = (rng.standard_normal(p) * 0.05 * 127).astype(np.int8)
xi = jax.device_put(np.broadcast_to(one_i, (C, p)).copy())
xq = jax.device_put(np.broadcast_to(one_q, (C, p)).copy())
jax.block_until_ready((xi, xq))


@functools.partial(jax.jit, static_argnames=("cfg",))
def step_k(a, b, cfg):
    cands = preamble_detect_cands_planar(a, b, cfg, tile=TILE, nbuf=NBUF)
    return cands[:, ::7, ::3, ::31]


@functools.partial(jax.jit, static_argnames=("cfg",))
def step_kc(a, b, cfg):
    cands = preamble_detect_cands_planar(a, b, cfg, tile=TILE, nbuf=NBUF)
    det_idx, valid, n_det, ovf = jax.vmap(
        lambda c: compact_candidates(c, cfg, TILE))(cands)
    return det_idx[:, ::17], n_det


@functools.partial(jax.jit, static_argnames=("cfg",))
def step_kcg(a, b, cfg):
    cands = preamble_detect_cands_planar(a, b, cfg, tile=TILE, nbuf=NBUF)

    def tail(xi_c, xq_c, cands_c):
        det_idx, valid, n_det, ovf = compact_candidates(cands_c, cfg, TILE)
        return gather_tail_planar(xi_c, xq_c, det_idx, valid, n_det, ovf, cfg)

    t = jax.vmap(tail)(a, b, cands)
    return t.index[:, ::17], t.status[:, ::17]


def step_full(a, b, cfg):
    return demod_batch_packed_planar_jit(a, b, cfg, tile=TILE, nbuf=NBUF)


def timeit(name, fn):
    if time.time() > DEADLINE:
        print(f"{name} SKIPPED (deadline)", flush=True)
        return
    t0 = time.time()
    jax.tree.map(np.asarray, fn(xi, xq, cfg))
    comp = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        jax.tree.map(np.asarray, fn(xi, xq, cfg))
        ts.append(time.time() - t0)
    ser = sorted(ts)[len(ts) // 2]
    iters = 8
    t0 = time.time()
    inflight = []
    for _ in range(iters):
        inflight.append(fn(xi, xq, cfg))
        if len(inflight) > 1:
            jax.tree.map(np.asarray, inflight.pop(0))
    for o in inflight:
        jax.tree.map(np.asarray, o)
    pipe = (time.time() - t0) / iters
    print(f"{name:5s} C={C} tile={TILE} nbuf={NBUF} serial {ser*1e3:7.1f} ms "
          f"{C*cfg.block_size/ser/1e6:7.0f} Msps | pipelined {pipe*1e3:7.1f} "
          f"ms {C*cfg.block_size/pipe/1e6:7.0f} Msps (compile {comp:.0f}s)",
          flush=True)


timeit("k", step_k)
timeit("kc", step_kc)
timeit("kcg", step_kcg)
timeit("full", step_full)
print("done", flush=True)

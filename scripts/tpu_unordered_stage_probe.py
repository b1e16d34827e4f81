"""Stage split of the CURRENT production planar path (unordered cands).

Variants, each jitted separately and fetch-synced (np.asarray of a small
slice per call):
  floor : DMA-only kernel (same grid/geometry, writes zeros)  — DMA floor
  k     : cands kernel only (ordered=False, nbuf=2)
  kc    : + compact_candidates_unordered
  kcg   : + gather_tail_planar
  full  : + pack_table (= demod_batch_packed_planar_jit)

Usage: python scripts/tpu_unordered_stage_probe.py [C] [TILE] [NBUF]
"""
import functools
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import airmodes
from airmodes.kernels.preamble_pallas import (
    CAND_ROWS, _planar_geometry, compact_candidates_unordered,
    demod_batch_packed_planar_jit, gather_tail_planar, planar_length,
    preamble_detect_cands_planar)

DEADLINE = time.time() + 1500
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
nsamp = C * cfg.block_size


def _floor_kernel(i_hbm, q_hbm, out_ref, win_i, win_q, sems, *,
                  stride_rows, nsteps, nbuf, tiles, rows_w):
    g = pl.program_id(0)
    slot = jax.lax.rem(g, nbuf)

    def copies(slot_s, step):
        c = step // tiles
        i = step - c * tiles
        trows = TILE // 128
        row0 = pl.multiple_of(c * stride_rows + i * trows, 32)
        return (
            pltpu.make_async_copy(i_hbm.at[pl.ds(row0, rows_w), :],
                                  win_i.at[slot_s], sems.at[slot_s, 0]),
            pltpu.make_async_copy(q_hbm.at[pl.ds(row0, rows_w), :],
                                  win_q.at[slot_s], sems.at[slot_s, 1]))

    @pl.when(g == 0)
    def _():
        for s in range(min(nbuf - 1, nsteps)):
            for dma in copies(s % nbuf, g + s):
                dma.start()

    @pl.when(g + nbuf - 1 < nsteps)
    def _():
        for dma in copies(jax.lax.rem(g + nbuf - 1, nbuf), g + nbuf - 1):
            dma.start()

    for dma in copies(slot, g):
        dma.wait()
    # i8 scalar extracts don't lower; use a (1,1) slice cast to i32
    probe = win_i[0, 0:1, 0:1].astype(jnp.int32)
    out_ref[:] = jnp.zeros((CAND_ROWS, 128), jnp.int32) + probe


@jax.jit
def step_floor(a, b):
    trows, rows_w, tiles, stride_rows = _planar_geometry(cfg, TILE)
    batch = a.shape[0]
    ri = a.reshape(batch * stride_rows, 128)
    rq = b.reshape(batch * stride_rows, 128)
    kern = functools.partial(_floor_kernel, stride_rows=stride_rows,
                             nsteps=batch * tiles, nbuf=NBUF, tiles=tiles,
                             rows_w=rows_w)
    out = pl.pallas_call(
        kern,
        grid=(batch * tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_shape=jax.ShapeDtypeStruct((batch * tiles * CAND_ROWS, 128),
                                       jnp.int32),
        out_specs=pl.BlockSpec((CAND_ROWS, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NBUF, rows_w, 128), jnp.int8),
                        pltpu.VMEM((NBUF, rows_w, 128), jnp.int8),
                        pltpu.SemaphoreType.DMA((NBUF, 2))],
    )(ri, rq)
    return out[::257]


@functools.partial(jax.jit, static_argnames=("cfg",))
def step_k(a, b, cfg):
    cands = preamble_detect_cands_planar(a, b, cfg, tile=TILE, nbuf=NBUF,
                                         ordered=False)
    return cands[:, ::7, ::3, ::31]


@functools.partial(jax.jit, static_argnames=("cfg",))
def step_kc(a, b, cfg):
    cands = preamble_detect_cands_planar(a, b, cfg, tile=TILE, nbuf=NBUF,
                                         ordered=False)
    det_idx, valid, n_det, ovf = jax.vmap(
        lambda c: compact_candidates_unordered(c, cfg, TILE))(cands)
    return det_idx[:, ::17], n_det


@functools.partial(jax.jit, static_argnames=("cfg",))
def step_kcg(a, b, cfg):
    from airmodes.kernels.preamble_pallas import demod_batch_planar
    t = demod_batch_planar(a, b, cfg, tile=TILE, nbuf=NBUF)
    return t.index[:, ::17], t.status[:, ::17]


@functools.partial(jax.jit, static_argnames=("cfg",))
def step_kcg_xla(a, b, cfg):
    from airmodes.kernels.preamble_pallas import demod_batch_planar
    t = demod_batch_planar(a, b, cfg, tile=TILE, nbuf=NBUF, xla_gather=True)
    return t.index[:, ::17], t.status[:, ::17]


def step_full(a, b, cfg):
    return demod_batch_packed_planar_jit(a, b, cfg, tile=TILE, nbuf=NBUF)


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
        print(f"{name:6s} compile+1st={comp:7.2f}s best={best*1e3:8.2f} ms "
              f"-> {nsamp/best/1e9:6.2f} Gsps  (all {[f'{t*1e3:.1f}' for t in ts]})",
              flush=True)


timeit("floor", step_floor, xi, xq)
timeit("k", step_k, xi, xq, cfg)
timeit("kc", step_kc, xi, xq, cfg)
timeit("kcg", step_kcg, xi, xq, cfg)
timeit("kcgx", step_kcg_xla, xi, xq, cfg)
timeit("full", step_full, xi, xq, cfg)
print("done", flush=True)

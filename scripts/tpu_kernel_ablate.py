"""Ablation timing of the 2D detect kernel's stages on the real TPU.

Builds the batched 2D kernel with stages progressively enabled:
  0: DMA window in, write zeros            (DMA + grid overhead floor)
  1: + m = i^2+q^2, write mask=(m>0)       (1 pass)
  2: + ws log-doubling window sum (7 shifts on full window)
  3: + pulses/peak/ref/threshold tests
  4: + quiet-chip max fold
  5: + NMS (= full kernel)
All fetch-synced (np.asarray of a tiny slice of the output per call).
"""
import functools
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import airmodes
from airmodes.constants import PREAMBLE_PULSE_CHIPS, PREAMBLE_QUIET_CHIPS
from airmodes.kernels.preamble_pallas import _LOOKBACK, _HALO_R2, _shift2d

DEADLINE = time.time() + 1500
print(jax.devices(), flush=True)

cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
C = 16
TILE = 16384
n_in = cfg.left_halo + cfg.block_size + cfg.right_halo
rng = np.random.default_rng(0)
iq = (rng.standard_normal((C, n_in, 2)) * 0.05 * 127).astype(np.int8)
dev = jax.device_put(iq)
np.asarray(jax.jit(lambda x: x[0, 0, 0])(dev))


def body(xi, xq, mask_ref, ref_ref, *, stages: int):
    sps = cfg.sps
    half = cfg.nms_chips * sps
    trows = TILE // 128
    m = xi * xi + xq * xq
    if stages <= 1:
        mask_ref[:] = (m[2: 2 + trows] > 0).astype(jnp.int32)
        ref_ref[:] = m[2: 2 + trows]
        return
    ws = m
    for s in (1, 2, 4, 8, 16, 32, 64):
        nr = ws.shape[0] - 1
        ws = ws[:nr] + _shift2d(ws, s, 0, nr)
    if stages == 2:
        mask_ref[:] = (ws[2: 2 + trows] > 0).astype(jnp.int32)
        ref_ref[:] = ws[2: 2 + trows]
        return
    nrows = trows + 2
    pulses = [_shift2d(m, c * sps, 1, nrows) for c in PREAMBLE_PULSE_CHIPS]
    ref = (pulses[0] + pulses[1] + pulses[2] + pulses[3]) * 0.25
    nf = ws[0:nrows] * (1.0 / 128.0)
    thresh = jnp.float32(cfg.threshold)
    ok = pulses[0] >= _shift2d(m, -1, 1, nrows)
    ok &= pulses[0] > _shift2d(m, 1, 1, nrows)
    pmin = jnp.minimum(jnp.minimum(pulses[0], pulses[1]),
                       jnp.minimum(pulses[2], pulses[3]))
    ptol = jnp.float32(cfg.pulse_tolerance)
    ok &= (pmin > nf * thresh) & (pmin > ref * ptol)
    if stages == 3:
        mask_ref[:] = ok[1: 1 + trows].astype(jnp.int32)
        ref_ref[:] = ref[1: 1 + trows]
        return
    qtol = jnp.float32(cfg.quiet_tolerance)
    quiet = _shift2d(m, PREAMBLE_QUIET_CHIPS[0] * sps, 1, nrows)
    for q in PREAMBLE_QUIET_CHIPS[1:]:
        quiet = jnp.maximum(quiet, _shift2d(m, q * sps, 1, nrows))
    ok &= quiet < ref * qtol
    if stages == 4:
        mask_ref[:] = ok[1: 1 + trows].astype(jnp.int32)
        ref_ref[:] = ref[1: 1 + trows]
        return
    score = jnp.where(ok, ref, 0.0)
    owned = score[1: 1 + trows]
    left_max = jnp.zeros_like(owned)
    right_max = jnp.zeros_like(owned)
    for d in range(1, half + 1):
        left_max = jnp.maximum(left_max, _shift2d(score, -d, 1, trows))
        right_max = jnp.maximum(right_max, _shift2d(score, d, 1, trows))
    keep = ok[1: 1 + trows] & (owned > left_max) & (owned >= right_max)
    mask_ref[:] = jnp.where(keep, jnp.int32(1), jnp.int32(0))
    ref_ref[:] = ref[1: 1 + trows]


def make(stages: int):
    rows_w = (_LOOKBACK + TILE + _HALO_R2) // 128
    trows = TILE // 128
    n = cfg.block_size
    tiles = n // TILE
    needed_rows = (tiles - 1) * trows + rows_w
    stride_rows = -(-needed_rows // 8) * 8

    def kern(i_hbm, q_hbm, mask_ref, ref_ref, win_i, win_q, sems):
        c = pl.program_id(0)
        i = pl.program_id(1)
        row0 = pl.multiple_of(c * stride_rows + i * trows, 8)
        di = pltpu.make_async_copy(i_hbm.at[pl.ds(row0, rows_w), :], win_i,
                                   sems.at[0])
        dq = pltpu.make_async_copy(q_hbm.at[pl.ds(row0, rows_w), :], win_q,
                                   sems.at[1])
        di.start(); dq.start(); di.wait(); dq.wait()
        body(win_i[:], win_q[:], mask_ref, ref_ref, stages=stages)

    @jax.jit
    def f(x):
        xf = x.astype(jnp.float32) * (1.0 / 127.0)
        want = stride_rows * 128
        xf = jnp.pad(xf, ((0, 0), (0, want - xf.shape[1]), (0, 0)))
        xi = xf[:, :, 0].reshape(C * stride_rows, 128)
        xq = xf[:, :, 1].reshape(C * stride_rows, 128)
        mask, ref = pl.pallas_call(
            kern,
            grid=(C, tiles),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                      pl.BlockSpec(memory_space=pltpu.HBM)],
            out_shape=(jax.ShapeDtypeStruct((C * n // 128, 128), jnp.int32),
                       jax.ShapeDtypeStruct((C * n // 128, 128), jnp.float32)),
            out_specs=(pl.BlockSpec((trows, 128), lambda c, i: (c * tiles + i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((trows, 128), lambda c, i: (c * tiles + i, 0),
                                    memory_space=pltpu.VMEM)),
            scratch_shapes=[pltpu.VMEM((rows_w, 128), jnp.float32),
                            pltpu.VMEM((rows_w, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
        )(xi, xq)
        return mask[::997, ::67], ref[::997, ::67]
    return f


def timeit(name, fn, iters=5):
    if time.time() > DEADLINE:
        print(f"{name:24s} SKIPPED (deadline)", flush=True)
        return
    t0 = time.time()
    np.asarray(fn(dev)[0])
    comp = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        a, b = fn(dev)
        np.asarray(a); np.asarray(b)
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:24s} {med*1e3:8.1f} ms  {C*cfg.block_size/med/1e6:8.0f} Msps"
          f"  (compile {comp:.0f}s)", flush=True)


for s in range(6):
    timeit(f"stages<={s}", make(s))
print("done", flush=True)

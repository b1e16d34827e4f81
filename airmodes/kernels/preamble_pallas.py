"""Pallas TPU kernel: fused magnitude + noise floor + preamble detection.

The hot loop of the receiver (ref: lib/preamble_impl.cc + the
complex_to_mag_squared / moving_average front-end blocks) as ONE pass over
HBM: each grid step DMAs an overlapping window of raw I/Q pairs into VMEM,
computes |IQ|^2, the trailing moving-average noise floor, the 4-pulse +
quiet-chip preamble test at every sample offset, and non-max suppression —
writing only a boolean hit mask and the reference level per sample. The XLA
pipeline reads ~5 arrays of the block; this kernel reads the 8-byte input
once and writes 5 bytes, the memory-bound speed-of-light for the stage.

Key structure:
  - overlapping windows via manual async DMA from an ANY-space input ref
    (BlockSpec index maps cannot express overlap)
  - the trailing 128-sample window sum is built by log-doubling (7 shifted
    VPU adds: ws_k[i] = ws_{k-1}[i] + ws_{k-1}[i + 2^(k-1)]) — Mosaic
    supports neither cumsum nor 2D->1D reshapes, and this needs only static
    1D slices
  - grid steps are sequential on TPU; tiles are independent anyway

Constraints (asserted/raised): cfg.noise_window == 128,
block_size % tile == 0, tile % 1024 == 0, sps <= 9. There is NO silent
fallback here — callers that cannot meet the constraints should use the
XLA pipeline (dsp.pipeline.demod_block); io/stream._default_step does that
selection for the streaming runner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import DspConfig
from ..constants import PREAMBLE_PULSE_CHIPS, PREAMBLE_QUIET_CHIPS

_LOOKBACK = 256  # 2 x 128-sample rows: noise window + peak/NMS lookback


def _halo_r(cfg: DspConfig, tile: int) -> int:
    half = cfg.nms_chips * cfg.sps
    # pulses/quiet up to chip 15 plus peak look-ahead and NMS right window;
    # rounded so the DMA window length is a multiple of 128 lanes
    need = max(16 * cfg.sps + half + 4, 130)
    # 1D f32 memrefs are (1024,)-tiled on TPU: DMA slice offsets and lengths
    # must be 1024-aligned, so round (LOOKBACK + tile + r) to a 1024 multiple
    r = 768  # (256 + 768) % 1024 == 0
    while r < need:
        r += 1024
    return r


def _detect_kernel(i_hbm, q_hbm, mask_ref, ref_ref, win_i, win_q, sems, *,
                   cfg: DspConfig, tile: int):
    sps = cfg.sps
    half = cfg.nms_chips * sps
    wl = _LOOKBACK + tile + _halo_r(cfg, tile)

    i = pl.program_id(0)
    # absolute DMA origin: tile_start - LOOKBACK == i * tile (lookback = 256);
    # planar I/Q 1D streams keep the window slice 128-lane aligned
    origin = pl.multiple_of(i * tile, 1024)
    dma_i = pltpu.make_async_copy(
        i_hbm.at[pl.ds(origin, wl)], win_i, sems.at[0])
    dma_q = pltpu.make_async_copy(
        q_hbm.at[pl.ds(origin, wl)], win_q, sems.at[1])
    dma_i.start()
    dma_q.start()
    dma_i.wait()
    dma_q.wait()

    _detect_body(win_i[:], win_q[:], mask_ref, ref_ref, cfg=cfg, tile=tile,
                 wl=wl, half=half, sps=sps)


def preamble_detect_pallas(iq, cfg: DspConfig, tile: int = 16384,
                           interpret: bool = False):
    """(left+block+right, 2) f32 -> (mask int32 (block,), ref f32 (block,)).

    Semantics match dsp.pipeline.preamble_detect except the noise floor is
    the exact trailing window mean (the jnp path uses a mean-centered cumsum
    approximation with <1e-5 relative error).
    """
    assert cfg.noise_window == 128, "pallas kernel fixes noise_window=128"
    assert cfg.left_halo == _LOOKBACK
    n = cfg.block_size
    # 1D f32 memrefs are (1024,)-tiled: DMA origins (i * tile) must be
    # 1024-aligned, so the tile itself must be — 128-aligned is NOT enough
    assert n % tile == 0 and tile % 1024 == 0
    wl = _LOOKBACK + tile + _halo_r(cfg, tile)
    needed = (n // tile - 1) * tile + wl

    iq = _to_f32(iq)
    if iq.shape[0] < needed:
        # 128-alignment rounding of the DMA window can exceed the block's
        # right halo by a few samples; zero-pad (the stream-tail semantics)
        iq = jnp.pad(iq, ((0, needed - iq.shape[0]), (0, 0)))
    xi = iq[:, 0]
    xq = iq[:, 1]
    kern = functools.partial(_detect_kernel, cfg=cfg, tile=tile)
    mask, ref = pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_shape=(jax.ShapeDtypeStruct((n,), jnp.int32),
                   jax.ShapeDtypeStruct((n,), jnp.float32)),
        out_specs=(pl.BlockSpec((tile,), lambda i: (i,),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile,), lambda i: (i,),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((wl,), jnp.float32),
                        pltpu.VMEM((wl,), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(xi, xq)
    return mask, ref


def _select_n(vec, idx, valid):
    """Exact (K,)-selection from an N-vector without TPU gathers.

    A (K,)-indexed gather lowers to a ~2.5 us/element sequential loop on
    TPU (CLAUDE.md); a full (K, N) onehot is infeasible at N ~ 4M. Two
    stages instead: a (K, T) tile-onehot matmul picks each detection's
    2048-lane tile row (HIGHEST precision — each output is ONE nonzero
    product, so exact), then an in-row lane mask-sum picks the element
    (single nonzero per row — summation order irrelevant, exact).

    The selection runs on the f32 BIT PATTERN split into 16-bit halves
    (each < 2^16, exact in an f32 matmul) recombined in int32 — not on
    the values: a value matmul turns ONE non-finite sample anywhere in
    `vec` into 0*NaN = NaN that poisons every detection sharing its
    2048-lane column (the old gather read only the indexed element; a
    corrupt f32 capture must not silently drop unrelated frames). The
    bit-pattern route is gather-exact for every input, NaN/Inf included."""
    n = vec.shape[0]
    G = 2048
    bits = jax.lax.bitcast_convert_type(vec.astype(jnp.float32), jnp.int32)
    u = jnp.pad(bits, (0, (-n) % G)).reshape(-1, G)
    t_count = u.shape[0]
    safe = jnp.where(valid, idx, 0)
    hi = jax.lax.Precision.HIGHEST
    oh = (jnp.arange(t_count, dtype=jnp.int32)[None, :]
          == (safe // G)[:, None]).astype(jnp.float32)
    lo16 = (u & 0xFFFF).astype(jnp.float32)
    hi16 = ((u >> 16) & 0xFFFF).astype(jnp.float32)
    rows_lo = jnp.matmul(oh, lo16, precision=hi)
    rows_hi = jnp.matmul(oh, hi16, precision=hi)
    mask = (jnp.arange(G, dtype=jnp.int32)[None, :]
            == (safe % G)[:, None])
    sel_lo = jnp.sum(jnp.where(mask, rows_lo, 0.0), axis=1).astype(jnp.int32)
    sel_hi = jnp.sum(jnp.where(mask, rows_hi, 0.0), axis=1).astype(jnp.int32)
    return jax.lax.bitcast_convert_type((sel_hi << 16) | sel_lo,
                                        jnp.float32)


def _xla_full_tail(iq_c, mask_c, ref_c, cfg: DspConfig):
    """Shared XLA tail for the mask+ref detect kernels: compaction +
    slice_bits + CRC/ECC -> DetectionTable (one block)."""
    from ..dsp import pipeline as P

    # INTENTIONAL contract divergence from dsp.pipeline.demod_block,
    # which REJECTS short inputs with a ValueError: the Pallas entry
    # points zero-pad instead, because their callers hand over
    # 128-row-aligned planar buffers whose final block legitimately
    # falls a few samples short of the full halo geometry. An unframed
    # short capture therefore decodes a zero tail here (silently) where
    # the XLA path raises — framed sources never hit that case.
    need = cfg.left_halo + cfg.block_size + cfg.right_halo
    if iq_c.shape[0] < need:
        iq_c = jnp.pad(iq_c, ((0, need - iq_c.shape[0]), (0, 0)))
    mag2 = P.magnitude_squared(iq_c)
    noise = P.noise_floor(mag2, cfg.noise_window)
    det_idx, valid, n_det, overflow = P.compact_detections(
        mask_c.astype(bool), cfg.max_detections)
    left = cfg.left_halo
    safe_idx = jnp.where(valid, det_idx, 0)
    # tile-onehot selection: the (K,)-gathers here cost ~2.5 us each
    # serialized on TPU (~0.6 ms/block at K=128 — r5 review)
    ref_level = _select_n(ref_c, safe_idx, valid)
    noise_at = _select_n(noise, left + safe_idx, valid)
    bits, confidence = P.slice_bits(mag2, det_idx, valid, ref_level, cfg,
                                    left)
    out_bits, df, nbits, synd, status = P.crc_check_and_correct(
        bits, confidence, cfg)
    return P.finalize_table(valid, det_idx, out_bits, df, nbits, synd,
                            status, ref_level, noise_at, n_det, overflow)


def demod_block_pallas(iq, cfg: DspConfig, tile: int = 16384,
                       interpret: bool = False):
    """Full demod step with the Pallas fused detector front-end; slicing,
    CRC, and ECC reuse the XLA stages (they are K-sized, not N-sized)."""
    mask, ref = preamble_detect_pallas(iq, cfg, tile=tile,
                                       interpret=interpret)
    return _xla_full_tail(iq, mask, ref, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def demod_block_packed_pallas_jit(iq, cfg: DspConfig, tile: int = 16384,
                                  interpret: bool = False):
    """Pallas-front-end demod + pack_table: one (K+1, 9) int32 output."""
    from ..dsp.pipeline import pack_table
    return pack_table(demod_block_pallas(iq, cfg, tile=tile,
                                         interpret=interpret))


# -----------------------------------------------------------------------------
# v2: 2D (rows, 128) layout — full VPU sublane utilization
# -----------------------------------------------------------------------------
#
# The 1D kernel's vectors occupy one sublane; laying the stream out as
# (rows, 128) rows of 128 samples fills the (8, 128) VPU tile. A shift by k
# samples becomes two static 2D slices + a lane concat (row borrow):
#   value_at(x, 128*(row0+r) + c + k) = concat(x[row0: , k:], x[row0+1:, :k])

_HALO_R2 = 1792  # (256 + tile + 1792) % 1024 == 0; covers ws margin + frames



def _to_f32(iq):
    """int8/int16 wire samples -> float32 at unit full scale.

    The 1/127 (1/32767) factor is load-bearing for dBFS reporting: the
    host quantizers (io.stream._dev_layout, native iqstream.cc) carry
    gain/127 as full_scale on the assumption the kernels rescale by
    exactly this — keep every conversion on this one helper.
    """
    iq = jnp.asarray(iq)
    if iq.dtype == jnp.uint8:
        # same guard as dsp.pipeline.magnitude_squared: raw uc8 bytes
        # would square mod 256 into valid-shaped garbage (r5 review)
        raise TypeError(
            "uint8 (raw uc8 bytes) are offset-binary: convert on host "
            "((u - 127.5) / 127.5, io.sources raw_file_chunks) or feed "
            "int8/int16/float32")
    if iq.dtype in (jnp.int8, jnp.int16):
        scale = 1.0 / 127.0 if iq.dtype == jnp.int8 else 1.0 / 32767.0
        iq = iq.astype(jnp.float32) * scale
    return iq

def _shift2d(x, k: int, row0: int, nrows: int):
    """(nrows, 128) view of x at sample offset k from rows [row0, row0+nrows).

    Mosaic cannot lower ragged lane concats, so the row borrow is a cyclic
    lane roll plus a static one-row-offset slice selected per lane. The
    slice needs one margin row: row0 >= 1 for k < 0, row0 + nrows < rows
    for k > 0 — every call site carries that margin (it was already
    required to keep clear of the old full-array row-roll's wraparound,
    which cost a second full VMEM pass per shift).
    """
    if k == 0:
        return x[row0: row0 + nrows]
    assert -128 < k < 128
    rows = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (nrows, 128), 1)
    # pltpu.roll wants non-negative shifts; use the modular equivalents
    z = pltpu.roll(x, (128 - k) % 128, axis=1)  # z[r, c] = x[r, (c+k) % 128]
    if k > 0:
        assert row0 + nrows < rows
        y = jnp.where(lane < 128 - k, z[row0: row0 + nrows],
                      z[row0 + 1: row0 + 1 + nrows])   # next row
    else:
        assert row0 >= 1
        y = jnp.where(lane >= -k, z[row0: row0 + nrows],
                      z[row0 - 1: row0 - 1 + nrows])   # previous row
    return y


def _wmax_levels(w: int) -> int:
    """Number of shifted-max steps (rows consumed) in _window_max2d(., w)."""
    levels, p = 0, 1
    while 2 * p <= w:
        p *= 2
        levels += 1
    return levels + (1 if p < w else 0)


def _window_max2d(x, w: int):
    """Running max over sample offsets {0..w-1}: log-doubling plus one
    overlapped tail step (max is idempotent, so overlap is exact).
    Consumes _wmax_levels(w) rows off the top of x."""
    if w == 1:
        return x
    p = 1
    win = x
    nr = x.shape[0]
    while 2 * p <= w:
        nr -= 1
        win = jnp.maximum(win[:nr], _shift2d(win, p, 0, nr))
        p *= 2
    if p < w:
        nr -= 1
        win = jnp.maximum(win[:nr], _shift2d(win, w - p, 0, nr))
    return win


def _detect_kernel_2d(i_hbm, q_hbm, mask_ref, ref_ref, win_i, win_q, sems, *,
                      cfg: DspConfig, tile: int):
    rows_w = (_LOOKBACK + tile + _HALO_R2) // 128
    trows = tile // 128

    i = pl.program_id(0)
    row0 = pl.multiple_of(i * trows, 8)
    dma_i = pltpu.make_async_copy(
        i_hbm.at[pl.ds(row0, rows_w), :], win_i, sems.at[0])
    dma_q = pltpu.make_async_copy(
        q_hbm.at[pl.ds(row0, rows_w), :], win_q, sems.at[1])
    dma_i.start()
    dma_q.start()
    dma_i.wait()
    dma_q.wait()
    _detect_body_2d(win_i[:], win_q[:], mask_ref, ref_ref, cfg=cfg, tile=tile)


def supported_2d_tile(cfg: DspConfig):
    """Largest tile the 2D f32 detect kernels support for cfg, or None.

    THE gate callers use before picking a Pallas path (io.stream) — the
    constraints live here, next to the kernels, so they cannot drift
    from the asserts they mirror (r4 review: a hand-copied gate admitted
    block sizes the kernel's default tile then rejected)."""
    if cfg.noise_window != 128 or 14 * cfg.sps >= 128:
        return None
    for t in (16384, 8192, 4096):
        if cfg.block_size % t == 0:
            return t
    return None


def _check_2d_limits(cfg: DspConfig):
    """The 2D/planar kernels shift by up to 14*sps lanes; Mosaic's roll +
    row-borrow construction supports |shift| < 128 -> sps <= 9."""
    if 14 * cfg.sps >= 128:
        raise ValueError(
            f"2D/planar Pallas detect supports sps <= 9 (channel_rate <= "
            f"18 Msps); got sps={cfg.sps} — use the XLA pipeline "
            "(demod_block / demod_batch_jit) at this rate")


def preamble_detect_pallas_2d(iq, cfg: DspConfig, tile: int = 16384,
                              interpret: bool = False):
    """2D-layout fused detector; same contract as preamble_detect_pallas."""
    _check_2d_limits(cfg)
    assert cfg.noise_window == 128, "pallas kernel fixes noise_window=128"
    assert cfg.left_halo == _LOOKBACK
    n = cfg.block_size
    assert n % tile == 0 and tile % 1024 == 0
    rows_w = (_LOOKBACK + tile + _HALO_R2) // 128
    needed_rows = (n // tile - 1) * (tile // 128) + rows_w

    iq = _to_f32(iq)
    pad_rows = needed_rows - iq.shape[0] // 128
    xi = iq[: (iq.shape[0] // 128) * 128, 0].reshape(-1, 128)
    xq = iq[: (iq.shape[0] // 128) * 128, 1].reshape(-1, 128)
    if pad_rows > 0:
        xi = jnp.pad(xi, ((0, pad_rows), (0, 0)))
        xq = jnp.pad(xq, ((0, pad_rows), (0, 0)))

    kern = functools.partial(_detect_kernel_2d, cfg=cfg, tile=tile)
    mask, ref = pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_shape=(jax.ShapeDtypeStruct((n // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((n // 128, 128), jnp.float32)),
        out_specs=(pl.BlockSpec((tile // 128, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile // 128, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((rows_w, 128), jnp.float32),
                        pltpu.VMEM((rows_w, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(xi, xq)
    return mask.reshape(n), ref.reshape(n)


# -----------------------------------------------------------------------------
# batched variant: grid (batch, tiles) — many blocks/channels per device call
# -----------------------------------------------------------------------------
#
# vmap cannot batch a pallas_call whose inputs live in ANY/HBM space, so the
# batch is a leading grid dimension instead: each grid step DMAs its window
# out of one batch row. Batching amortizes the XLA tail's per-op dispatch
# overhead and the host<->device per-call cost across C blocks.


def _detect_kernel_b(i_hbm, q_hbm, mask_ref, ref_ref, win_i, win_q, sems, *,
                     cfg: DspConfig, tile: int, stride: int):
    sps = cfg.sps
    half = cfg.nms_chips * sps
    wl = _LOOKBACK + tile + _halo_r(cfg, tile)

    c = pl.program_id(0)
    i = pl.program_id(1)
    # batch rows flattened into one 1D stream (Mosaic cannot slice single
    # rows of a (batch, N) f32 memref); stride is 1024-aligned
    origin = pl.multiple_of(c * stride + i * tile, 1024)
    dma_i = pltpu.make_async_copy(
        i_hbm.at[pl.ds(origin, wl)], win_i, sems.at[0])
    dma_q = pltpu.make_async_copy(
        q_hbm.at[pl.ds(origin, wl)], win_q, sems.at[1])
    dma_i.start()
    dma_q.start()
    dma_i.wait()
    dma_q.wait()
    _detect_body(win_i[:], win_q[:], mask_ref, ref_ref, cfg=cfg, tile=tile,
                 wl=wl, half=half, sps=sps)


def _detect_body(xi, xq, mask_ref, ref_ref, *, cfg, tile, wl, half, sps):
    m = xi * xi + xq * xq
    # noise floor from raw sample power (trailing 128 window, log-doubling)
    ws = m
    length = wl
    for s in (1, 2, 4, 8, 16, 32, 64):
        length -= s
        ws = (jax.lax.slice_in_dim(ws, 0, length) +
              jax.lax.slice_in_dim(ws, s, s + length))
    # chip-energy integration: all pulse/quiet/peak decisions at sps > 1
    # compare means over the chip so misaligned phases fail the quiet check
    if sps > 1:
        ce_len = wl - (sps - 1)
        m = sum(jax.lax.slice_in_dim(m, s, s + ce_len)
                for s in range(sps)) * (1.0 / sps)
    ext = tile + 2 * half
    base = _LOOKBACK - half

    def sl(off, n=ext):
        return jax.lax.slice_in_dim(m, base + off, base + off + n)

    pulses = [sl(c * sps) for c in PREAMBLE_PULSE_CHIPS]
    ref = (pulses[0] + pulses[1] + pulses[2] + pulses[3]) * 0.25
    nf = jax.lax.slice_in_dim(ws, base - 128, base - 128 + ext) * (1.0 / 128.0)
    thresh = jnp.float32(cfg.threshold)
    ok = pulses[0] >= sl(-1)
    ok &= pulses[0] > sl(1)
    # all-pulse threshold/tolerance tests fold into one min-compare
    pmin = jnp.minimum(jnp.minimum(pulses[0], pulses[1]),
                       jnp.minimum(pulses[2], pulses[3]))
    ptol = jnp.float32(cfg.pulse_tolerance)
    # a > max(b, c) is boolean-identical to (a > b) & (a > c) for
    # non-NaN floats (max returns one of b/c exactly) and saves a
    # full-array compare+and per sample
    ok &= pmin > jnp.maximum(nf * thresh, ref * ptol)
    # all-quiet tests fold into one max-compare
    qtol = jnp.float32(cfg.quiet_tolerance)
    quiet = sl(PREAMBLE_QUIET_CHIPS[0] * sps)
    for q in PREAMBLE_QUIET_CHIPS[1:]:
        quiet = jnp.maximum(quiet, sl(q * sps))
    ok &= quiet < ref * qtol
    score = jnp.where(ok, ref, 0.0)
    owned = jax.lax.slice_in_dim(score, half, half + tile)
    left_max = jnp.zeros_like(owned)
    right_max = jnp.zeros_like(owned)
    for d in range(1, half + 1):
        left_max = jnp.maximum(
            left_max, jax.lax.slice_in_dim(score, half - d, half - d + tile))
        right_max = jnp.maximum(
            right_max, jax.lax.slice_in_dim(score, half + d, half + d + tile))
    ok_owned = jax.lax.slice_in_dim(ok, half, half + tile)
    keep = ok_owned & (owned > left_max) & (owned >= right_max)
    mask_ref[:] = jnp.where(keep, jnp.int32(1), jnp.int32(0))
    ref_ref[:] = jax.lax.slice_in_dim(ref, half, half + tile)


def preamble_detect_pallas_batch(iq, cfg: DspConfig, tile: int = 16384,
                                 interpret: bool = False):
    """(C, left+block+right, 2) -> (mask (C, block) int32, ref (C, block))."""
    assert cfg.noise_window == 128
    assert cfg.left_halo == _LOOKBACK
    n = cfg.block_size
    assert n % tile == 0 and tile % 1024 == 0
    wl = _LOOKBACK + tile + _halo_r(cfg, tile)
    needed = (n // tile - 1) * tile + wl

    iq = _to_f32(iq)
    if iq.shape[1] < needed:
        iq = jnp.pad(iq, ((0, 0), (0, needed - iq.shape[1]), (0, 0)))
    batch = iq.shape[0]
    stride = -(-iq.shape[1] // 1024) * 1024
    if stride != iq.shape[1]:
        iq = jnp.pad(iq, ((0, 0), (0, stride - iq.shape[1]), (0, 0)))
    xi = iq[:, :, 0].reshape(-1)
    xq = iq[:, :, 1].reshape(-1)
    kern = functools.partial(_detect_kernel_b, cfg=cfg, tile=tile,
                             stride=stride)
    # flat 1D outputs (a (1, tile) 2D block violates Mosaic's (8, 128)
    # minimum block tiling); reshaped to (batch, n) outside the kernel
    tiles = n // tile
    mask, ref = pl.pallas_call(
        kern,
        grid=(batch, tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_shape=(jax.ShapeDtypeStruct((batch * n,), jnp.int32),
                   jax.ShapeDtypeStruct((batch * n,), jnp.float32)),
        out_specs=(pl.BlockSpec((tile,), lambda c, i: (c * tiles + i,),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tile,), lambda c, i: (c * tiles + i,),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((wl,), jnp.float32),
                        pltpu.VMEM((wl,), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(xi, xq)
    return mask.reshape(batch, n), ref.reshape(batch, n)


def _detect_kernel_2d_b(i_hbm, q_hbm, mask_ref, ref_ref, win_i, win_q, sems,
                        *, cfg: DspConfig, tile: int, stride_rows: int):
    rows_w = (_LOOKBACK + tile + _HALO_R2) // 128
    trows = tile // 128
    c = pl.program_id(0)
    i = pl.program_id(1)
    row0 = pl.multiple_of(c * stride_rows + i * trows, 8)
    dma_i = pltpu.make_async_copy(
        i_hbm.at[pl.ds(row0, rows_w), :], win_i, sems.at[0])
    dma_q = pltpu.make_async_copy(
        q_hbm.at[pl.ds(row0, rows_w), :], win_q, sems.at[1])
    dma_i.start()
    dma_q.start()
    dma_i.wait()
    dma_q.wait()
    _detect_body_2d(win_i[:], win_q[:], mask_ref, ref_ref, cfg=cfg, tile=tile)


def _detect_body_2d(xi, xq, mask_ref, ref_ref, *, cfg: DspConfig, tile: int):
    keep, ref_owned = _detect_keep_2d(xi, xq, cfg=cfg, tile=tile)
    mask_ref[:] = jnp.where(keep, jnp.int32(1), jnp.int32(0))
    ref_ref[:] = ref_owned



def _m_and_ws(xi, xq, cfg: DspConfig):
    """|IQ|^2 (chip-energy integrated at sps > 1) and the trailing
    128-sample window sum, in the EXACT fold orders both the one-stage
    detect and the stage-A prescreen must share: the prescreen's
    superset guarantee rests on these terms being bit-identical between
    the two kernels, so they live in one helper."""
    sps = cfg.sps
    m = xi * xi + xq * xq
    mraw = m
    if cfg.mxu_window_sum:
        # two MXU matmuls instead of 7 shifted adds on the VPU:
        #   ws[r, c] = sum_{t>=c} m[r, t] + sum_{t<c} m[r+1, t]
        # HIGHEST precision keeps f32-grade accumulation so marginal
        # threshold decisions stay within the oracle's float64 margins.
        t_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        c_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        a_up = (t_i >= c_i).astype(jnp.float32)
        a_lo = (t_i < c_i).astype(jnp.float32)
        nr = m.shape[0] - 1
        hi = jax.lax.Precision.HIGHEST
        ws = (jax.lax.dot(m[:nr], a_up, precision=hi) +
              jax.lax.dot(m[1:nr + 1], a_lo, precision=hi))
    else:
        ws = m
        for s in (1, 2, 4, 8, 16, 32, 64):
            nr = ws.shape[0] - 1
            ws = ws[:nr] + _shift2d(ws, s, 0, nr)
    if sps > 1:
        # chip-energy integration (see _detect_body)
        nr_ce = mraw.shape[0] - 1
        m = sum(_shift2d(mraw, s, 0, nr_ce)
                for s in range(sps)) * (1.0 / sps)
    return m, ws

def _detect_keep_2d(xi, xq, *, cfg: DspConfig, tile: int):
    """Shared 2D detect logic: (rows_w, 128) f32 I/Q windows ->
    (keep bool (trows, 128), ref f32 (trows, 128)) over the owned tile."""
    sps = cfg.sps
    half = cfg.nms_chips * sps
    trows = tile // 128
    m, ws = _m_and_ws(xi, xq, cfg)                  # (rows_w, 128)

    # candidate tests for rows [1, 1 + nrows); the owned tile is rows
    # [2, 2 + trows) of m-space = rows [1, 1 + trows) of the test arrays.
    # Extra rows past the old trows+2 give the doubled NMS fold its
    # row-borrow margin (max over a window is computed by log-doubling;
    # f32 max is associative and idempotent, so the folds are
    # bit-identical to the one-shift-per-offset form they replace at
    # ~1/3 the VPU passes).
    nrows = trows + 2 + _wmax_levels(half)
    pulses = [_shift2d(m, c * sps, 1, nrows) for c in PREAMBLE_PULSE_CHIPS]
    ref = (pulses[0] + pulses[1] + pulses[2] + pulses[3]) * 0.25
    nf = ws[0:nrows] * (1.0 / 128.0)                # ws[r-1, c] for row r
    thresh = jnp.float32(cfg.threshold)

    ok = pulses[0] >= _shift2d(m, -1, 1, nrows)
    ok &= pulses[0] > _shift2d(m, 1, 1, nrows)
    # all-pulse threshold/tolerance tests fold into one min-compare
    pmin = jnp.minimum(jnp.minimum(pulses[0], pulses[1]),
                       jnp.minimum(pulses[2], pulses[3]))
    ptol = jnp.float32(cfg.pulse_tolerance)
    # a > max(b, c) is boolean-identical to (a > b) & (a > c) for
    # non-NaN floats (max returns one of b/c exactly) and saves a
    # full-array compare+and per sample
    ok &= pmin > jnp.maximum(nf * thresh, ref * ptol)
    # all-quiet tests fold into one max-compare; consecutive-chip runs
    # ({3..6}, {10..15}) come from doubled running maxes of m:
    #   q2[r] = max(m@0, m@sps), q4 = max over 4 consecutive chips
    qtol = jnp.float32(cfg.quiet_tolerance)
    assert PREAMBLE_QUIET_CHIPS == (1, 3, 4, 5, 6, 8, 10, 11, 12, 13, 14, 15)
    nq2 = m.shape[0] - 1
    q2 = jnp.maximum(m[:nq2], _shift2d(m, sps, 0, nq2))
    nq4 = nq2 - 1
    q4 = jnp.maximum(q2[:nq4], _shift2d(q2, 2 * sps, 0, nq4))
    quiet = jnp.maximum(_shift2d(m, 1 * sps, 1, nrows),
                        _shift2d(q4, 3 * sps, 1, nrows))    # {1}, {3,4,5,6}
    quiet = jnp.maximum(quiet, _shift2d(m, 8 * sps, 1, nrows))       # {8}
    quiet = jnp.maximum(quiet, _shift2d(q4, 10 * sps, 1, nrows))  # {10..13}
    quiet = jnp.maximum(quiet, _shift2d(q2, 14 * sps, 1, nrows))  # {14,15}
    ok &= quiet < ref * qtol

    score = jnp.where(ok, ref, 0.0)                 # rows 1..1+nrows

    # NMS window max by doubling: win[r] = max score@{0..half-1}, so
    # right = win@+1 (offsets +1..+half), left = win@-half (-half..-1)
    win = _window_max2d(score, half)
    owned = score[1: 1 + trows]
    left_max = _shift2d(win, -half, 1, trows)
    right_max = _shift2d(win, 1, 1, trows)
    keep = ok[1: 1 + trows] & (owned > left_max) & (owned >= right_max)

    return keep, ref[1: 1 + trows]


def _prescreen_keep_2d(xi, xq, *, cfg: DspConfig, tile: int):
    """Stage-A candidate prescreen: local peak + all-pulse threshold and
    tolerance + the EARLY quiet chips {1, 3..6} — a strict superset of
    _detect_keep_2d's accept set at ~10 _shift2d passes instead of ~16+NMS.
    The dropped tests (late quiet chips {8, 10..15}, NMS) move to an XLA
    stage-B rescan over the O(K) gathered candidate windows
    (demod_batch_planar prescreen=True), which applies the FULL rule with
    the oracle's fold orders. The early quiet subset is what bounds the
    candidate count: pulses-only passes fire on ~6% of offsets inside a
    frame's own data body (4 probed chips all '1'), which at production
    traffic density would inflate K2 and the per-candidate slice DMA work
    past the detect itself; five quiet chips cut that ~30x. The
    noise-floor threshold carries a 1e-5 relative slack so summation-
    order jitter between the in-kernel window sum (possibly MXU) and
    stage B's doubling fold can never drop a candidate the full rule
    would keep (ref/pulse/quiet terms share exact fold orders with
    stage B, so only nf needs it)."""
    sps = cfg.sps
    trows = tile // 128
    m, ws = _m_and_ws(xi, xq, cfg)

    nrows = trows + 2
    pulses = [_shift2d(m, c * sps, 1, nrows) for c in PREAMBLE_PULSE_CHIPS]
    ref = (pulses[0] + pulses[1] + pulses[2] + pulses[3]) * 0.25
    nf = ws[0:nrows] * (1.0 / 128.0)
    slack = jnp.float32(1.0 - 1e-5)
    thresh = jnp.float32(cfg.threshold) * slack
    ptol = jnp.float32(cfg.pulse_tolerance)

    ok = pulses[0] >= _shift2d(m, -1, 1, nrows)
    ok &= pulses[0] > _shift2d(m, 1, 1, nrows)
    pmin = jnp.minimum(jnp.minimum(pulses[0], pulses[1]),
                       jnp.minimum(pulses[2], pulses[3]))
    # a > max(b, c) is boolean-identical to (a > b) & (a > c) for
    # non-NaN floats (max returns one of b/c exactly) and saves a
    # full-array compare+and per sample
    ok &= pmin > jnp.maximum(nf * thresh, ref * ptol)
    # early quiet chips {1} and {3,4,5,6} (q2/q4 doubled maxes — exact)
    qtol = jnp.float32(cfg.quiet_tolerance)
    nq2 = m.shape[0] - 1
    q2 = jnp.maximum(m[:nq2], _shift2d(m, sps, 0, nq2))
    nq4 = nq2 - 1
    q4 = jnp.maximum(q2[:nq4], _shift2d(q2, 2 * sps, 0, nq4))
    quiet = jnp.maximum(_shift2d(m, 1 * sps, 1, nrows),
                        _shift2d(q4, 3 * sps, 1, nrows))
    ok &= quiet < ref * qtol
    return ok[1: 1 + trows]


def preamble_detect_pallas_2d_batch(iq, cfg: DspConfig, tile: int = 16384,
                                    interpret: bool = False):
    """Batched 2D-layout detector: (C, L+N+R, 2) -> ((C, N) mask, (C, N) ref).

    Batch rows are flattened into one row stream (grid (C, tiles)); the
    per-batch row stride is 8-row aligned so every DMA origin stays on an
    f32 (8, 128) tile boundary.
    """
    _check_2d_limits(cfg)
    assert cfg.noise_window == 128, "pallas kernel fixes noise_window=128"
    assert cfg.left_halo == _LOOKBACK
    n = cfg.block_size
    assert n % tile == 0 and tile % 1024 == 0
    rows_w = (_LOOKBACK + tile + _HALO_R2) // 128
    needed_rows = (n // tile - 1) * (tile // 128) + rows_w
    stride_rows = -(-needed_rows // 8) * 8

    iq = _to_f32(iq)
    batch = iq.shape[0]
    want = stride_rows * 128
    if iq.shape[1] < want:
        iq = jnp.pad(iq, ((0, 0), (0, want - iq.shape[1]), (0, 0)))
    xi = iq[:, :want, 0].reshape(batch * stride_rows, 128)
    xq = iq[:, :want, 1].reshape(batch * stride_rows, 128)

    kern = functools.partial(_detect_kernel_2d_b, cfg=cfg, tile=tile,
                             stride_rows=stride_rows)
    tiles = n // tile
    trows = tile // 128
    mask, ref = pl.pallas_call(
        kern,
        grid=(batch, tiles),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_shape=(jax.ShapeDtypeStruct((batch * n // 128, 128), jnp.int32),
                   jax.ShapeDtypeStruct((batch * n // 128, 128), jnp.float32)),
        out_specs=(pl.BlockSpec((trows, 128), lambda c, i: (c * tiles + i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((trows, 128), lambda c, i: (c * tiles + i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((rows_w, 128), jnp.float32),
                        pltpu.VMEM((rows_w, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
        interpret=interpret,
    )(xi, xq)
    return mask.reshape(batch, n), ref.reshape(batch, n)


# -----------------------------------------------------------------------------
# fast path: 2D detect kernel + K-sized gather tail (no full-block XLA ops)
# -----------------------------------------------------------------------------
#
# After the fused detect kernel the only remaining block-sized XLA work in
# demod_block_pallas is magnitude/noise-floor recomputation (feeding
# slice_bits) and top_k compaction. The fast tail replaces the first with a
# per-detection gather: each detection reads its own (128 + 242*sps)-sample
# window straight from the raw I/Q block and derives noise floor, chip
# energies, bits, and confidence from that window — O(K) work instead of
# O(N). Bit decisions are float-identical to dsp.pipeline.slice_bits (same
# ops in the same order on the same values); the reported `noise` field is
# the exact trailing-window mean rather than the jnp path's mean-centered
# cumsum approximation (<1e-5 relative difference).


def gather_tail(iq, det_idx, valid, ref, n_det, overflow, cfg: DspConfig):
    """K-sized tail: raw (L+N+R, 2) block + detection indices -> DetectionTable.

    `ref` (the detect kernel's reference levels) is accepted for signature
    stability but unused: _tail_from_power recomputes the reference level
    from the gathered window with the same f32 op order as the kernel —
    identical floats — which also avoids a (K,)-indexed gather (sequential
    on TPU, CLAUDE.md)."""
    del ref
    sps = cfg.sps
    left = cfg.left_halo
    nw = cfg.noise_window
    iq = jnp.asarray(iq)
    # stream-tail inputs may be SHORT (the detect half zero-pads them):
    # pad here too, or dynamic_slice would CLAMP an end-of-block slab's
    # start downward and slice bits from the wrong offsets — a silent
    # misdecode instead of decoding against zeros like dsp.pipeline
    need = left + cfg.block_size + cfg.right_halo
    if iq.shape[0] < need:
        iq = jnp.pad(iq, ((0, need - iq.shape[0]), (0, 0)))

    W = nw + 242 * sps
    safe_idx = jnp.where(valid, det_idx, 0)
    start = left + safe_idx - nw                       # >= 128 > 0
    # one contiguous (W, 2) slab per detection: vmapped dynamic_slice lowers
    # to a gather with slice_sizes=(W, 2) — K big slices, not K*W tiny ones
    # (still ~2.5 us each on TPU; the planar path's slice kernel is the
    # production alternative)
    win = jax.vmap(
        lambda s: jax.lax.dynamic_slice(iq, (s, 0), (W, 2)))(start)
    win = _to_f32(win)   # the ONE int->f32 unit-scale conversion helper
    w2 = win[..., 0] ** 2 + win[..., 1] ** 2           # (K, W)
    return _tail_from_power(w2, det_idx, valid, n_det, overflow, cfg)


def demod_block_pallas_fast(iq, cfg: DspConfig, tile: int = 16384,
                            interpret: bool = False):
    """Fast single-block demod: 2D detect kernel + K-sized gather tail."""
    from ..dsp import pipeline as P

    mask, ref = preamble_detect_pallas_2d(iq, cfg, tile=tile,
                                          interpret=interpret)
    det_idx, valid, n_det, overflow = P.compact_detections(
        mask.astype(bool), cfg.max_detections)
    return gather_tail(iq, det_idx, valid, ref, n_det, overflow, cfg)


def demod_batch_pallas_fast(iq, cfg: DspConfig, tile: int = 16384,
                            interpret: bool = False):
    """Fast batched demod: (C, L+N+R, 2) -> DetectionTable with leading C."""
    from ..dsp import pipeline as P

    mask, ref = preamble_detect_pallas_2d_batch(iq, cfg, tile=tile,
                                                interpret=interpret)

    def tail(iq_c, mask_c, ref_c):
        det_idx, valid, n_det, overflow = P.compact_detections(
            mask_c.astype(bool), cfg.max_detections)
        return gather_tail(iq_c, det_idx, valid, ref_c, n_det, overflow, cfg)

    return jax.vmap(tail)(iq, mask, ref)


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def demod_block_packed_fast_jit(iq, cfg: DspConfig, tile: int = 16384,
                                interpret: bool = False):
    from ..dsp.pipeline import pack_table
    return pack_table(demod_block_pallas_fast(iq, cfg, tile=tile,
                                              interpret=interpret))


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def demod_batch_packed_fast_jit(iq, cfg: DspConfig, tile: int = 16384,
                                interpret: bool = False):
    from ..dsp.pipeline import pack_table
    table = demod_batch_pallas_fast(iq, cfg, tile=tile, interpret=interpret)
    return jax.vmap(pack_table)(table)


def demod_batch_pallas(iq, cfg: DspConfig, tile: int = 16384,
                       interpret: bool = False):
    """Batched full demod: (C, L+N+R, 2) -> DetectionTable with leading C.

    Pallas batched detect + vmapped XLA tail (batching amortizes the tail's
    small-op dispatch overhead across blocks)."""
    mask, ref = preamble_detect_pallas_batch(iq, cfg, tile=tile,
                                             interpret=interpret)
    return jax.vmap(
        lambda a, b, c: _xla_full_tail(a, b, c, cfg))(iq, mask, ref)


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def demod_batch_packed_pallas_jit(iq, cfg: DspConfig, tile: int = 16384,
                                  interpret: bool = False):
    """Batched demod + per-block packing: (C, L+N+R, 2) -> (C, K+1, 9)."""
    from ..dsp.pipeline import pack_table
    table = demod_batch_pallas(iq, cfg, tile=tile, interpret=interpret)
    return jax.vmap(pack_table)(table)


# -----------------------------------------------------------------------------
# v3: traffic-minimal planar-int8 path with in-kernel candidate compaction
# -----------------------------------------------------------------------------
#
# The dev chip sustains only ~35-40 GB/s per direction of HBM traffic
# (scripts/tpu_bw_probe.py), so the fast path's ~38 B/sample (f32 planar
# prep + full-block int32 mask + f32 ref outputs + compaction reads) is the
# whole cost. This path cuts it to ~3 B/sample:
#   - the host ships PLANAR int8 I and Q streams (no XLA prep, no f32
#     intermediates); the kernel DMAs int8 and converts in VMEM
#   - the kernel compacts in-kernel: first-4 hit rows per 128-lane column
#     (sublane min-reductions), then the tile's earliest 16 hits extracted
#     in ASCENDING order from the tiny (4, 128) table, writing ONE
#     (8, 128) int32 block per tile instead of full-block mask+ref
#   - host-side selection of the earliest K per block is sort-free
#     (cumsum + searchsorted over the already-ordered candidate list;
#     top_k/sort on TPU cost ~0.4 ms per 4M block — half the old path)
#   - the K-sized tail recomputes ref_level from its own gathered window
#     (identical f32 op order -> identical floats)
# Capacity accounting: >4 hits in one (tile-row, lane) column or >16 per
# tile are physically pathological (NMS enforces spacing); spills are
# counted into n_overflow, never silent.

_LOOKBACK_ROWS = _LOOKBACK // 128          # 2
_HALO_ROWS_I8 = 30                         # rows_w = trows + 32 (int8 tiling)
CAND_PER_LANE = 4
CAND_ROWS = 8                              # (8, 128) min f32/i32 block tile
_COUNT_ROW = 4                             # per-lane hit counts live here
DEFAULT_NBUF = 2                           # TPU sweep: nbuf=2 >= nbuf=1 at
                                           # every tile (scripts/tpu_planar_
                                           # nbuf_probe.py)


def default_tile(cfg: DspConfig) -> int:
    """Largest swept-fastest tile that satisfies the planar constraints.

    Throughput rises with tile size (fewer grid steps -> less per-step
    DMA overhead); candidate capacity scales with the tile
    (cand_capacity) so the supported detection density is
    tile-independent. The r3 sum-synced re-sweep
    (scripts/tpu_tile_resweep_probe.py, 0.2% timing spread) resolved
    what the earlier relay-noise-limited sweeps called flat:
    16384: 8.00, 32768: 9.27, 65536: 9.68, 131072: 9.78, 262144: 9.71
    Gsps (decode-identical); 524288 exceeds the 16 MB VMEM scoped limit.
    nbuf=2 beats 1/3/4 at 131072 (9.31/9.68/9.47 vs 9.78)."""
    for t in (131072, 65536, 32768, 16384, 8192, 4096):
        if cfg.block_size % t == 0:
            return t
    raise ValueError(
        f"block_size {cfg.block_size} not a multiple of 4096; "
        "the planar Pallas path needs 4096-aligned tiles")


def supported_planar_tile(cfg: DspConfig):
    """Largest tile the planar-int8 kernels support for cfg, or None —
    the planar twin of supported_2d_tile: THE gate io.stream /
    io.native_stream consult before picking the planar path, living
    next to default_tile so the constraints can never drift from the
    asserts they mirror (r4 review: hand-copied gates admitted cfgs
    the kernels then rejected)."""
    if cfg.noise_window != 128 or 14 * cfg.sps >= 128:
        return None
    try:
        return default_tile(cfg)
    except ValueError:
        return None


def cand_capacity(tile: int):
    """(per_tile, per_lane) candidate capacity for a tile size.

    Scales with the tile so every tile size supports the same detection
    density the original 16-per-16384-sample layout guaranteed
    (~2000 detections/s at 2 Msps); NMS spacing plus the overflow counters
    make spills beyond that pathological and visible, never silent."""
    per_tile = min(512, max(16, (16 * tile) // 16384))
    # per_lane applies to the ORDERED candidate layout; the unordered
    # layout (production path) physically caps at _COUNT_ROW (= 4) rows
    # and its consumers clamp accordingly
    per_lane = CAND_PER_LANE if tile <= 65536 else 8
    return per_tile, per_lane


def _planar_geometry(cfg: DspConfig, tile: int):
    trows = tile // 128
    rows_w = _LOOKBACK_ROWS + trows + _HALO_ROWS_I8
    assert rows_w % 32 == 0 and trows % 32 == 0, (
        "int8 (32,128) tiling: tile must be a multiple of 4096")
    tiles = cfg.block_size // tile
    # + dma margin: the slice kernel DMAs a 32-row-aligned slab per
    # detection; a detection at the block's right edge must not run the
    # slab past the (last channel's) end of the planar array. Sized for
    # the widest (prescreen stage-B) window so both paths fit.
    needed_rows = (tiles - 1) * trows + rows_w + \
        _slice_geometry(cfg, cfg.nms_chips * cfg.sps)[3]
    stride_rows = -(-needed_rows // 32) * 32
    return trows, rows_w, tiles, stride_rows


def planar_length(cfg: DspConfig, tile: int = None) -> int:
    """Per-channel padded sample count the planar path expects from the host."""
    if tile is None:
        tile = default_tile(cfg)
    _, _, _, stride_rows = _planar_geometry(cfg, tile)
    return stride_rows * 128


def to_planar_i8(blocks: np.ndarray, cfg: DspConfig, tile: int = None):
    """Host-side: (C, L+N+R, 2) int8 (or (L+N+R, 2)) -> padded planar
    (C, P) int8 I and Q arrays for demod_batch_packed_planar_jit.

    Input must already be int8 (quantized): a silent C-cast of a
    unit-scale float block would truncate every sample to {-1, 0, 1} and
    the pipeline would report zero detections with no error."""
    if np.asarray(blocks).dtype != np.int8:
        raise TypeError(
            f"to_planar_i8 takes int8 (quantized) blocks, got "
            f"{np.asarray(blocks).dtype}; quantize first "
            "(io.stream quantize / native quantize_planar_i8)")
    x = np.asarray(blocks, dtype=np.int8)
    if x.ndim == 2:
        x = x[None]
    p = planar_length(cfg, tile)
    out_i = np.zeros((x.shape[0], p), np.int8)
    out_q = np.zeros((x.shape[0], p), np.int8)
    n = min(x.shape[1], p)
    out_i[:, :n] = x[:, :n, 0]
    out_q[:, :n] = x[:, :n, 1]
    return out_i, out_q


CAND_PER_TILE = 16


def _extract_perlane(keep, trows: int, per_lane: int):
    """(trows, 128) bool -> ((per_lane, 128) int32 encoded hit offsets
    r*128 + lane, ascending per lane, sentinel trows*128; (1, 128) per-lane
    counts). The per-lane first-k selection is a chain of sublane
    min-reductions — the only extraction work on the kernel's critical
    path in unordered mode."""
    rowidx = jax.lax.broadcasted_iota(jnp.int32, keep.shape, 0)
    sent_row = jnp.int32(trows)
    cand = jnp.where(keep, rowidx, sent_row)
    encs = []
    for _ in range(per_lane):
        cj = jnp.min(cand, axis=0, keepdims=True)          # (1, 128)
        encs.append(cj)
        cand = jnp.where(cand == cj, sent_row, cand)
    count = jnp.sum(keep.astype(jnp.int32), axis=0, keepdims=True)
    sent = jnp.int32(trows * 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    e = jnp.concatenate(
        [jnp.where(cj < trows, cj * 128 + lane, sent) for cj in encs],
        axis=0)                                            # (per_lane, 128)
    return e, count


def _extract_cands_unordered(keep, trows: int, per_lane: int):
    """(trows, 128) bool -> (8, 128) int32 candidate block, UNORDERED:

      rows 0..per_lane-1: per-lane first-`per_lane` encoded hit offsets
                          (ascending within a lane only), sentinel
                          trows*128
      row 4:              per-lane hit count

    The TPU sweep (scripts/tpu_capacity_probe.py) shows the in-kernel
    per-tile ORDERING chain (sequential global min+where extractions) costs
    ~40% of kernel time at per_tile=64; emitting the per-lane rows raw and
    ranking them XLA-side (compact_candidates_unordered: one O(n_t^2)
    within-tile compare, ~us on the VPU) removes that chain entirely and
    lifts the per-tile capacity cap to per_lane*128."""
    assert per_lane <= _COUNT_ROW, "unordered rows 0..3 cap per_lane at 4"
    e, count = _extract_perlane(keep, trows, per_lane)
    # unused candidate rows carry the SENTINEL, not zeros: 0 is a valid
    # encoding ("hit at row 0 lane 0"), so a consumer reading more rows
    # than the kernel emitted would mint phantom detections at the tile
    # base; sentinel rows read as self-evidently empty
    sent_fill = jnp.full_like(count, trows * 128)
    zero = jnp.zeros_like(count)
    rows = ([e] + [sent_fill] * (_COUNT_ROW - per_lane) + [count]
            + [zero] * (CAND_ROWS - _COUNT_ROW - 1))
    return jnp.concatenate(rows, axis=0)                   # (8, 128)


def _extract_cands(keep, trows: int, per_tile: int = CAND_PER_TILE,
                   per_lane: int = CAND_PER_LANE):
    """(trows, 128) bool -> (8, 128) int32 candidate block:

      rows 0..3, position k at (k // 128, k % 128): the tile's earliest
                          `per_tile` (<= 512) hit sample offsets
                          (r*128 + lane), ASCENDING, sentinel trows*128
                          when fewer hits exist
      row 4:              per-lane hit count (for n_detected/overflow)

    Two-level in-VMEM selection: first-4 hit rows per lane via sublane
    min-reductions over (trows, 128), then 16 global min-extractions over
    the tiny (4, 128) encoded-index table. Emitting the per-tile list
    already ORDERED makes the host-side compaction sort-free (a cumsum +
    searchsorted instead of two top_k passes — TPU sorts cost ~0.4 ms per
    4M-sample block, ~half the old full-path time)."""
    assert per_tile <= _COUNT_ROW * 128, "ordered rows 0..3 cap per_tile at 512"
    e, count = _extract_perlane(keep, trows, per_lane)
    sent = jnp.int32(trows * 128)
    rows_o = -(-per_tile // 128)
    orow = jax.lax.broadcasted_iota(jnp.int32, (rows_o, 128), 0)
    olane = jax.lax.broadcasted_iota(jnp.int32, (rows_o, 128), 1)
    ordered = jnp.full((rows_o, 128), sent, jnp.int32)
    for k in range(per_tile):
        m = jnp.min(e)                                     # unique unless sent
        ordered = jnp.where((orow == k // 128) & (olane == k % 128), m,
                            ordered)
        e = jnp.where(e == m, sent, e)
    # unused candidate rows carry the SENTINEL (see _extract_cands_unordered)
    sent_fill = jnp.full_like(count, trows * 128)
    zero = jnp.zeros_like(count)
    rows = ([ordered] + [sent_fill] * (_COUNT_ROW - rows_o) + [count]
            + [zero] * (CAND_ROWS - _COUNT_ROW - 1))
    return jnp.concatenate(rows, axis=0)                   # (8, 128)


def _detect_kernel_cands_i8(i_hbm, q_hbm, out_ref, win_i, win_q, sems, *,
                            cfg: DspConfig, tile: int, stride_rows: int,
                            per_tile: int, per_lane: int,
                            ordered: bool = True, prescreen: bool = False):
    trows, rows_w, tiles, _ = _planar_geometry(cfg, tile)
    c = pl.program_id(0)
    i = pl.program_id(1)
    row0 = pl.multiple_of(c * stride_rows + i * trows, 32)
    dma_i = pltpu.make_async_copy(
        i_hbm.at[pl.ds(row0, rows_w), :], win_i, sems.at[0])
    dma_q = pltpu.make_async_copy(
        q_hbm.at[pl.ds(row0, rows_w), :], win_q, sems.at[1])
    dma_i.start()
    dma_q.start()
    dma_i.wait()
    dma_q.wait()
    scale = jnp.float32(1.0 / 127.0)
    xi = win_i[:].astype(jnp.float32) * scale
    xq = win_q[:].astype(jnp.float32) * scale
    if prescreen:
        keep = _prescreen_keep_2d(xi, xq, cfg=cfg, tile=tile)
    else:
        keep, _ = _detect_keep_2d(xi, xq, cfg=cfg, tile=tile)
    out_ref[:] = (_extract_cands(keep, trows, per_tile, per_lane) if ordered
                  else _extract_cands_unordered(keep, trows, per_lane))


def _detect_kernel_cands_i8_db(i_hbm, q_hbm, out_ref, win_i, win_q, sems, *,
                               cfg: DspConfig, tile: int, stride_rows: int,
                               nsteps: int, nbuf: int,
                               per_tile: int, per_lane: int,
                               ordered: bool = True, prescreen: bool = False):
    """Prefetching variant: grid is flat (batch*tiles,); each step starts
    the window DMA for step g+nbuf-1 into a rotating VMEM slot before
    waiting on its own, keeping nbuf-1 input DMAs in flight — this hides
    the per-DMA issue latency that dominates the serial kernel (the detect
    compute itself is ~1 us per 16K-sample tile)."""
    trows, rows_w, tiles, _ = _planar_geometry(cfg, tile)
    g = pl.program_id(0)
    slot = jax.lax.rem(g, nbuf)

    def copies(slot_s, step):
        c = step // tiles
        i = step - c * tiles
        row0 = pl.multiple_of(c * stride_rows + i * trows, 32)
        return (
            pltpu.make_async_copy(i_hbm.at[pl.ds(row0, rows_w), :],
                                  win_i.at[slot_s], sems.at[slot_s, 0]),
            pltpu.make_async_copy(q_hbm.at[pl.ds(row0, rows_w), :],
                                  win_q.at[slot_s], sems.at[slot_s, 1]))

    # warmup: step 0 issues DMAs for steps 0..nbuf-2 (static unroll)
    @pl.when(g == 0)
    def _():
        for s in range(min(nbuf - 1, nsteps)):
            for dma in copies(s % nbuf, g + s):
                dma.start()

    # steady state: issue the DMA nbuf-1 steps ahead
    @pl.when(g + nbuf - 1 < nsteps)
    def _():
        for dma in copies(jax.lax.rem(g + nbuf - 1, nbuf), g + nbuf - 1):
            dma.start()

    for dma in copies(slot, g):
        dma.wait()

    scale = jnp.float32(1.0 / 127.0)
    xi = win_i[0].astype(jnp.float32)
    xq = win_q[0].astype(jnp.float32)
    for s in range(1, nbuf):
        xi = jnp.where(slot == s, win_i[s].astype(jnp.float32), xi)
        xq = jnp.where(slot == s, win_q[s].astype(jnp.float32), xq)
    if prescreen:
        keep = _prescreen_keep_2d(xi * scale, xq * scale, cfg=cfg, tile=tile)
    else:
        keep, _ = _detect_keep_2d(xi * scale, xq * scale, cfg=cfg, tile=tile)
    out_ref[:] = (_extract_cands(keep, trows, per_tile, per_lane) if ordered
                  else _extract_cands_unordered(keep, trows, per_lane))


def preamble_detect_cands_planar(xi8, xq8, cfg: DspConfig, tile: int = None,
                                 interpret: bool = False,
                                 double_buffer: bool = False,
                                 nbuf: int = DEFAULT_NBUF,
                                 per_tile: int = None, per_lane: int = None,
                                 ordered: bool = True,
                                 prescreen: bool = False):
    """(C, P) int8 planar I/Q (P = planar_length(cfg, tile)) ->
    (C, tiles, 8, 128) int32 candidate blocks.

    nbuf > 1 (or double_buffer=True, an alias for nbuf=2) selects the
    prefetching kernel with nbuf rotating window slots. ordered=False emits
    per-lane candidate rows without the in-kernel per-tile ordering chain
    (pair with compact_candidates_unordered — ~40% faster end to end)."""
    if tile is None:
        tile = default_tile(cfg)
    _check_2d_limits(cfg)
    assert cfg.noise_window == 128, "pallas kernel fixes noise_window=128"
    assert cfg.left_halo == _LOOKBACK
    n = cfg.block_size
    assert n % tile == 0
    trows, rows_w, tiles, stride_rows = _planar_geometry(cfg, tile)
    batch = xi8.shape[0]
    p = stride_rows * 128
    assert xi8.shape == (batch, p) and xq8.shape == (batch, p), (
        "host must supply planar_length()-padded planar int8 arrays")

    if double_buffer and nbuf == 1:
        nbuf = 2
    pt, pll = cand_capacity(tile)
    per_tile = pt if per_tile is None else per_tile
    per_lane = pll if per_lane is None else per_lane
    if not ordered:
        per_lane = min(per_lane, _COUNT_ROW)  # unordered layout's row cap
    ri = xi8.reshape(batch * stride_rows, 128)
    rq = xq8.reshape(batch * stride_rows, 128)
    if nbuf > 1:
        kern = functools.partial(
            _detect_kernel_cands_i8_db, cfg=cfg, tile=tile,
            stride_rows=stride_rows, nsteps=batch * tiles, nbuf=nbuf,
            per_tile=per_tile, per_lane=per_lane, ordered=ordered,
            prescreen=prescreen)
        grid = (batch * tiles,)
        out_spec = pl.BlockSpec((CAND_ROWS, 128), lambda g: (g, 0),
                                memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((nbuf, rows_w, 128), jnp.int8),
                   pltpu.VMEM((nbuf, rows_w, 128), jnp.int8),
                   pltpu.SemaphoreType.DMA((nbuf, 2))]
    else:
        kern = functools.partial(_detect_kernel_cands_i8, cfg=cfg, tile=tile,
                                 stride_rows=stride_rows,
                                 per_tile=per_tile, per_lane=per_lane,
                                 ordered=ordered, prescreen=prescreen)
        grid = (batch, tiles)
        out_spec = pl.BlockSpec((CAND_ROWS, 128),
                                lambda c, i: (c * tiles + i, 0),
                                memory_space=pltpu.VMEM)
        scratch = [pltpu.VMEM((rows_w, 128), jnp.int8),
                   pltpu.VMEM((rows_w, 128), jnp.int8),
                   pltpu.SemaphoreType.DMA((2,))]
    cands = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_shape=jax.ShapeDtypeStruct((batch * tiles * CAND_ROWS, 128),
                                       jnp.int32),
        out_specs=out_spec,
        scratch_shapes=scratch,
        interpret=interpret,
    )(ri, rq)
    return cands.reshape(batch, tiles, CAND_ROWS, 128)


def compact_candidates(cands, cfg: DspConfig, tile: int,
                       per_tile: int = None):
    """(tiles, 8, 128) int32 candidate blocks -> earliest-K detection
    indices (ascending), valid mask, total count, overflow.

    The kernel already emits each tile's earliest `per_tile` hits in
    ascending order (rows 0..3, position k at (k//128, k%128)), and tiles
    partition the block in ascending index ranges — so the flat
    (tiles*per_tile) list is globally ascending among valid entries.
    Selecting the earliest K is then sort-free: candidate i's output slot
    is its rank cumsum(valid)-1, and the slot assignment is a {0,1}
    rank-onehot matmul on the MXU (a K-sized scatter lowers to a ~ms-scale
    sequential update loop on TPU; the matmul is ~us). Exact: one nonzero
    per row, and sample indices < 2^24 are exact in f32. Spills (per-lane
    > per_lane or per-tile > per_tile) land in the overflow counter via
    n_det - kept."""
    trows = tile // 128
    tiles = cands.shape[0]
    sent = trows * 128
    if per_tile is None:
        per_tile = cand_capacity(tile)[0]
    rows_o = -(-per_tile // 128)
    ec = cands[:, 0:rows_o, :].reshape(tiles, rows_o * 128)[:, :per_tile]
    count = cands[:, _COUNT_ROW, :]                     # (tiles, 128)
    valid_in = ec < sent
    vflat = valid_in.reshape(-1)
    csum = jnp.cumsum(vflat.astype(jnp.int32))
    total = csum[-1]
    K = cfg.max_detections
    kk = jnp.arange(K, dtype=jnp.int32)
    rank = jnp.where(vflat, csum - 1, -1)               # invalid never match
    onehot = (kk[:, None] == rank[None, :]).astype(jnp.float32)
    # HIGHEST: TPU's default f32 matmul truncates operands to bf16, which
    # would mangle index values > 2^8; 3-pass bf16 keeps exact f32 products.
    # The WITHIN-TILE index and the tile number are selected separately
    # and recombined in int32: a single flat-index matmul computes in f32,
    # where integers above 2^24 round to even — block_size > 16M would
    # silently corrupt every detection past sample 2^24 (the unordered
    # path already recombines post-matmul for the same reason).
    assert tile <= 1 << 24 and tiles <= 1 << 24
    tnum = jnp.broadcast_to(
        jnp.arange(tiles, dtype=jnp.float32)[:, None], ec.shape).reshape(-1)
    ec_sel = jnp.round(
        jnp.matmul(onehot, ec.reshape(-1).astype(jnp.float32),
                   precision=jax.lax.Precision.HIGHEST)).astype(jnp.int32)
    t_sel = jnp.round(
        jnp.matmul(onehot, tnum,
                   precision=jax.lax.Precision.HIGHEST)).astype(jnp.int32)
    det_idx = t_sel * tile + ec_sel
    valid = kk < jnp.minimum(total, K)
    det_idx = jnp.where(valid, det_idx, -1)
    n_det = jnp.sum(count)
    overflow = n_det - jnp.sum(valid.astype(jnp.int32))
    return det_idx, valid, n_det, overflow


def compact_candidates_unordered(cands, cfg: DspConfig, tile: int,
                                 per_lane: int = None):
    """(tiles, 8, 128) UNORDERED candidate blocks (rows 0..per_lane-1 =
    per-lane encoded hits, row 4 = counts) -> K detection indices
    (ascending), valid mask, total count, overflow.

    The ordering the kernel no longer does happens here, XLA-side, without
    a full candidate sort (a TPU sort over the candidate list costs
    ~0.4 ms; this is ~us):
      1. within-tile rank of every entry in FLAT (row-major) order — a
         cumsum along n_t, not a sample-order O(n_t^2) compare per tile.
         Flat-order ranks select the same SET whenever a tile is included
         whole; only the one tile straddling the K cutoff is partial, so
         the sample-order O(n_t^2) rank is computed for THAT tile alone
         (262K ops, not tiles x 262K) — the kept set stays exactly
         earliest-K-by-sample even on overflow
      2. output slot k lives in the tile whose valid-count cumsum first
         exceeds k (searchsorted over `tiles` values); its within-tile
         rank is k - tile_base, and the entry with that rank is selected
         by a (K, n_t) onehot dot — ranks are unique within a tile, so
         exactly one matches
      3. one K-sized ascending sort (invalid slots to the top) restores
         the global sample-order contract.
    Capacity is per_lane hits per (lane, tile) with NO per-tile cap
    (vs `per_tile` in the ordered path); spills land in n_overflow."""
    trows = tile // 128
    tiles = cands.shape[0]
    sent = trows * 128
    if per_lane is None:
        per_lane = min(cand_capacity(tile)[1], _COUNT_ROW)
    assert per_lane <= _COUNT_ROW
    n_t = per_lane * 128
    ec = cands[:, 0:per_lane, :].reshape(tiles, n_t)    # encoded, or sent
    count = cands[:, _COUNT_ROW, :]                     # (tiles, 128)
    valid = ec < sent                                   # (tiles, n_t)

    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    rank = jnp.where(valid, rank, n_t)                  # invalid never match

    c_t = jnp.sum(valid.astype(jnp.int32), axis=1)      # (tiles,)
    cum = jnp.cumsum(c_t)
    total = cum[-1]
    base = cum - c_t                                    # exclusive cumsum
    K = cfg.max_detections
    kk = jnp.arange(K, dtype=jnp.int32)
    # searchsorted(cum, kk, right) == #{t : cum[t] <= k}: one broadcast
    # compare+sum instead of XLA's per-element binary-search loop
    t_of_k = jnp.sum((cum[None, :] <= kk[:, None]).astype(jnp.int32),
                     axis=1)
    t_safe = jnp.minimum(t_of_k, tiles - 1)
    base_k = jnp.sum(jnp.where(
        jnp.arange(tiles, dtype=jnp.int32)[None, :] == t_safe[:, None],
        base[None, :], 0), axis=1)
    r_of_k = kk - base_k                                # rank within tile
    # row selections as onehot dots — (K,)-indexed row gathers lower to
    # slow sequential loops on TPU. HIGHEST keeps f32 products exact
    # (values < 2^17; TPU default matmul precision truncates to bf16).
    hi = jax.lax.Precision.HIGHEST
    oh_t = (jnp.arange(tiles, dtype=jnp.int32)[None, :]
            == t_safe[:, None]).astype(jnp.float32)     # (K, tiles)
    vals_k = jnp.round(
        jnp.matmul(oh_t, ec.astype(jnp.float32), precision=hi)
    ).astype(jnp.int32) + t_safe[:, None] * tile
    ranks_k = jnp.round(
        jnp.matmul(oh_t, rank.astype(jnp.float32), precision=hi)
    ).astype(jnp.int32)                                 # (K, n_t)
    # the cutoff tile (the one the last slot lands in) may be partially
    # kept: give it sample-order ranks so the kept subset is its earliest
    t_cut = t_safe[K - 1]
    oh_cut = (jnp.arange(tiles, dtype=jnp.int32)
              == t_cut).astype(jnp.float32)             # (tiles,)
    ec_cut = jnp.round(
        jnp.matmul(oh_cut, ec.astype(jnp.float32), precision=hi)
    ).astype(jnp.int32)                                 # (n_t,)
    v_cut = ec_cut < sent
    rank_cut = jnp.sum(((ec_cut[None, :] < ec_cut[:, None]) &
                        v_cut[None, :]).astype(jnp.int32), axis=1)
    rank_cut = jnp.where(v_cut, rank_cut, n_t)
    ranks_k = jnp.where((t_safe == t_cut)[:, None], rank_cut[None, :],
                        ranks_k)
    hit = ranks_k == r_of_k[:, None]
    det_idx = jnp.sum(jnp.where(hit, vals_k, 0), axis=1)
    slot_valid = kk < jnp.minimum(total, K)
    det_idx = jnp.sort(jnp.where(slot_valid, det_idx, jnp.int32(2**30)))
    det_idx = jnp.where(slot_valid, det_idx, -1)
    n_det = jnp.sum(count)
    overflow = n_det - jnp.sum(slot_valid.astype(jnp.int32))
    return det_idx, slot_valid, n_det, overflow


def _slice_geometry(cfg: DspConfig, extra: int = 0):
    """(W, out_rows, pad_rows, dma_rows) for the per-detection slice kernel.

    W = noise window + full event (+ 2*extra for the prescreen stage-B
    windows, which also evaluate the full preamble rule at the NMS
    neighbor offsets +-extra around the candidate); out_rows covers W in
    128-lane rows; pad_rows rounds to the f32 (8, 128) output block;
    dma_rows is the 32-row-aligned int8 slab large enough that any
    32-row-aligned origin plus the window (+1 borrow row) fits."""
    W = cfg.noise_window + 242 * cfg.sps + 2 * extra
    out_rows = -(-W // 128)
    pad_rows = -(-out_rows // 8) * 8
    dma_rows = 32 * (-(-(32 + out_rows + 1) // 32))
    return W, out_rows, pad_rows, dma_rows


def _slice_kernel(dets_smem, i_hbm, q_hbm, out_ref, win_i, win_q, sems, *,
                  nsteps: int, nbuf: int, dma_rows: int, out_rows: int,
                  pad_rows: int):
    """Per-detection window slicer: DMA a 32-row-aligned int8 slab around
    each window start, compute |IQ|^2 in VMEM, and rotate (dynamic row +
    lane rolls) so window sample j lands at flat position j — the XLA tail
    then runs on a static layout. Replaces the vmapped dynamic_slice
    gather, which XLA lowers to a ~2.5 us-per-slice sequential loop on TPU
    (~41 ms per 16K detections vs ~10 ms of DMA here).

    EMPTY table rows (base < 0 sentinel) skip the DMA and the rotate
    entirely and emit zeros: the detection table is fixed-capacity K but
    real blocks fill a fraction of it, so most grid steps are skips. The
    start/wait predicates read the same SMEM value, so every started DMA
    is waited exactly once."""
    g = pl.program_id(0)
    slot = jax.lax.rem(g, nbuf)

    def copies(slot_s, step):
        base = jnp.maximum(dets_smem[step], 0)   # clamped; gated by when
        row32 = pl.multiple_of((base >> 7) & ~jnp.int32(31), 32)
        return (
            pltpu.make_async_copy(i_hbm.at[pl.ds(row32, dma_rows)],
                                  win_i.at[slot_s], sems.at[slot_s, 0]),
            pltpu.make_async_copy(q_hbm.at[pl.ds(row32, dma_rows)],
                                  win_q.at[slot_s], sems.at[slot_s, 1]))

    def start(slot_s, step):
        @pl.when(dets_smem[step] >= 0)
        def _():
            for dma in copies(slot_s, step):
                dma.start()

    @pl.when(g == 0)
    def _():
        for s in range(min(nbuf - 1, nsteps)):
            start(s % nbuf, g + s)

    @pl.when(g + nbuf - 1 < nsteps)
    def _():
        start(jax.lax.rem(g + nbuf - 1, nbuf), g + nbuf - 1)

    @pl.when(dets_smem[g] >= 0)
    def _():
        for dma in copies(slot, g):
            dma.wait()

        xi = win_i[0].astype(jnp.float32)
        xq = win_q[0].astype(jnp.float32)
        for s in range(1, nbuf):
            xi = jnp.where(slot == s, win_i[s].astype(jnp.float32), xi)
            xq = jnp.where(slot == s, win_q[s].astype(jnp.float32), xq)
        scale = jnp.float32(1.0 / 127.0)
        xi = xi * scale
        xq = xq * scale
        w2 = xi * xi + xq * xq                         # (dma_rows, 128)

        base = dets_smem[g]
        dr = (base >> 7) - ((base >> 7) & ~jnp.int32(31))  # 0..31
        ln = base & 127
        # rows dr..dr+out_rows to the top (dr + out_rows + 1 <= dma_rows:
        # no wraparound contamination), then lane roll + row borrow for ln
        z = pltpu.roll(w2, (dma_rows - dr) % dma_rows, axis=0)
        zz = z[0: out_rows + 1]
        y = pltpu.roll(zz, (128 - ln) % 128, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (out_rows, 128), 1)
        aligned = jnp.where(lane < 128 - ln, y[0: out_rows],
                            y[1: out_rows + 1])
        if pad_rows > out_rows:
            aligned = jnp.concatenate(
                [aligned,
                 jnp.zeros((pad_rows - out_rows, 128), jnp.float32)], axis=0)
        out_ref[:] = aligned

    @pl.when(dets_smem[g] < 0)
    def _():
        out_ref[:] = jnp.zeros((pad_rows, 128), jnp.float32)


def slice_windows_planar(ri, rq, base_global, cfg: DspConfig, *,
                         nbuf: int = 4, interpret: bool = False,
                         extra: int = 0):
    """(B_rows, 128) int8 planar streams + (n,) int32 window starts (flat
    sample coords) -> (n, pad_rows*128) f32 power windows, window sample j
    at [:, j]. Starts must be >= 0 with dma_rows of margin below the array
    end (the planar geometry's stride includes that margin). extra widens
    the window by 2*extra samples (prescreen stage-B neighbors)."""
    _, out_rows, pad_rows, dma_rows = _slice_geometry(cfg, extra)
    n = base_global.shape[0]
    kern = functools.partial(_slice_kernel, nsteps=n, nbuf=nbuf,
                             dma_rows=dma_rows, out_rows=out_rows,
                             pad_rows=pad_rows)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_shape=jax.ShapeDtypeStruct((n * pad_rows, 128), jnp.float32),
        out_specs=pl.BlockSpec((pad_rows, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((nbuf, dma_rows, 128), jnp.int8),
                        pltpu.VMEM((nbuf, dma_rows, 128), jnp.int8),
                        pltpu.SemaphoreType.DMA((nbuf, 2))],
        interpret=interpret,
    )(base_global, ri, rq)
    return out.reshape(n, pad_rows * 128)


def _tail_from_power(w2, det_idx, valid, n_det, overflow, cfg: DspConfig,
                     event_off: int = None):
    """K-sized decode tail on (K, >=W) f32 power windows: noise floor,
    ref level, PPM bits + confidence, CRC/ECC. The detection's preamble
    start sits at window position `event_off` (default: noise_window,
    the standard slice layout; the prescreen stage-B windows carry an
    extra nms half-window before it)."""
    from ..dsp import pipeline as P

    sps = cfg.sps
    nw = cfg.noise_window
    if event_off is None:
        event_off = nw

    noise_at = jnp.mean(
        jax.lax.slice_in_dim(w2, event_off - nw, event_off, axis=1), axis=1)

    # chip energies over the whole window, same fold order as the kernel
    if sps == 1:
        ce = w2
    else:
        ce_len = w2.shape[1] - (sps - 1)
        ce = sum(jax.lax.slice_in_dim(w2, s, s + ce_len, axis=1)
                 for s in range(sps)) * (1.0 / sps)

    # reference level: mean of the 4 preamble pulse chip energies
    p = [ce[:, event_off + c * sps] for c in PREAMBLE_PULSE_CHIPS]
    ref_level = (p[0] + p[1] + p[2] + p[3]) * 0.25

    # data chips 16..240 of the event
    n_chips = 224
    chip0 = event_off + 16 * sps
    energies = jax.lax.slice_in_dim(ce, chip0, chip0 + n_chips * sps,
                                    axis=1)[:, ::sps]
    e0 = energies[:, 0::2]
    e1 = energies[:, 1::2]
    bits = e0 > e1
    level = ref_level[:, None] * jnp.float32(cfg.confidence_level)
    confidence = jnp.logical_xor(e0 > level, e1 > level)

    out_bits, df, nbits, synd, status = P.crc_check_and_correct(
        bits, confidence, cfg)
    return P.finalize_table(valid, det_idx, out_bits, df, nbits, synd,
                            status, ref_level, noise_at, n_det, overflow)


def _stageb_full_check(w2, cfg: DspConfig):
    """Stage-B rescan for the prescreen path: evaluate the FULL detection
    rule (threshold + tolerance + quiet chips) at the candidate and at
    every NMS-neighbor offset within +-half from the candidate's own
    gathered window, then apply the sequential NMS rule (strictly greater
    than every qualifying hit before, >= every one after).

    w2: (K2, >= nw + 242*sps + 2*half) power windows with the candidate's
    preamble start at position nw + half. Returns the surviving-candidate
    bool mask (K2,). Fold orders match the oracle/XLA tail exactly; max
    folds are order-independent."""
    sps = cfg.sps
    nw = cfg.noise_window
    half = cfg.nms_chips * sps
    D = 2 * half + 1
    pos0 = nw + half

    # trailing 128-window sums at every position (log-doubling fold — the
    # same pairwise structure as the kernel's shifted-add window sum)
    assert nw == 128, "stage-B rescan fixes noise_window=128"
    ns = w2
    length = w2.shape[1]
    for s in (1, 2, 4, 8, 16, 32, 64):
        length -= s
        ns = (jax.lax.slice_in_dim(ns, 0, length, axis=1) +
              jax.lax.slice_in_dim(ns, s, s + length, axis=1))

    # chip energies, same fold as the tails
    if sps == 1:
        ce = w2
    else:
        ce_len = w2.shape[1] - (sps - 1)
        ce = sum(jax.lax.slice_in_dim(w2, s, s + ce_len, axis=1)
                 for s in range(sps)) * (1.0 / sps)

    def at(sample_off):
        """(K2, D): ce at candidate+o+sample_off for o in [-half, half]."""
        s = pos0 - half + sample_off
        return jax.lax.slice_in_dim(ce, s, s + D, axis=1)

    pulses = [at(c * sps) for c in PREAMBLE_PULSE_CHIPS]
    ref = (pulses[0] + pulses[1] + pulses[2] + pulses[3]) * 0.25
    # ns[p] = sum w2[p : p+128]; neighbor o's trailing floor ends at its
    # own preamble start: ns[pos0 + o - 128]
    nf = jax.lax.slice_in_dim(ns, pos0 - half - nw, pos0 - half - nw + D,
                              axis=1) * (1.0 / 128.0)
    thresh = jnp.float32(cfg.threshold)
    ptol = jnp.float32(cfg.pulse_tolerance)
    qtol = jnp.float32(cfg.quiet_tolerance)

    ok = pulses[0] >= at(-1)
    ok &= pulses[0] > at(1)
    pmin = jnp.minimum(jnp.minimum(pulses[0], pulses[1]),
                       jnp.minimum(pulses[2], pulses[3]))
    # a > max(b, c) is boolean-identical to (a > b) & (a > c) for
    # non-NaN floats (max returns one of b/c exactly) and saves a
    # full-array compare+and per sample
    ok &= pmin > jnp.maximum(nf * thresh, ref * ptol)
    quiet = at(PREAMBLE_QUIET_CHIPS[0] * sps)
    for q in PREAMBLE_QUIET_CHIPS[1:]:
        quiet = jnp.maximum(quiet, at(q * sps))
    ok &= quiet < ref * qtol

    score = jnp.where(ok, ref, 0.0)                     # (K2, D)
    center = score[:, half]
    left_max = jnp.max(score[:, :half], axis=1)
    right_max = jnp.max(score[:, half + 1:], axis=1)
    return ok[:, half] & (center > left_max) & (center >= right_max)


def gather_tail_planar(xi8, xq8, det_idx, valid, n_det, overflow,
                       cfg: DspConfig):
    """K-sized tail on planar int8 streams via an XLA dynamic-slice gather
    (fallback path; the slice kernel replaces it on TPU). Recomputes
    ref_level from the gathered window with the same f32 op order as the
    detect kernel."""
    sps = cfg.sps
    left = cfg.left_halo
    nw = cfg.noise_window
    W = nw + 242 * sps
    scale = jnp.float32(1.0 / 127.0)

    safe_idx = jnp.where(valid, det_idx, 0)
    start = left + safe_idx - nw                        # >= 128 > 0
    wi = jax.vmap(
        lambda s: jax.lax.dynamic_slice(xi8, (s,), (W,)))(start)
    wq = jax.vmap(
        lambda s: jax.lax.dynamic_slice(xq8, (s,), (W,)))(start)
    fi = wi.astype(jnp.float32) * scale
    fq = wq.astype(jnp.float32) * scale
    w2 = fi * fi + fq * fq                              # (K, W)
    return _tail_from_power(w2, det_idx, valid, n_det, overflow, cfg)


def demod_batch_planar(xi8, xq8, cfg: DspConfig, tile: int = None,
                       interpret: bool = False, double_buffer: bool = False,
                       nbuf: int = DEFAULT_NBUF,
                       per_tile: int = None, per_lane: int = None,
                       ordered: bool = False, xla_gather: bool = False,
                       prescreen: bool = False, k2: int = None):
    """Planar-int8 batched demod: (C, P) x2 -> DetectionTable (leading C).

    ordered=False (default) uses the unordered kernel emission + XLA-side
    ranking (compact_candidates_unordered). xla_gather=False (default)
    slices each detection's window with the Pallas slice kernel (explicit
    DMA); True falls back to the vmapped dynamic_slice gather, which XLA
    lowers to a sequential per-slice loop on TPU (~2.5 us each).

    prescreen=True runs the two-stage detect: the kernel evaluates only
    the peak + pulse-threshold subset of the rule (~1/3 the VPU passes),
    emitting up to k2 (default 2*max_detections, must be >=
    max_detections) candidates per block; the late-quiet-chip + NMS
    remainder of the rule is applied XLA-side on the gathered candidate
    windows (_stageb_full_check). NON-DEFAULT: r3 measured it 0.824x
    the one-stage kernel (CLAUDE.md), kept for A/B reference. Caveats
    vs the one-stage path: (a) stage-B computes the noise floor with
    the shifted-add fold, so with mxu_window_sum=True (default) a
    threshold decision within ~1 ulp of summation-order jitter can
    differ — decision parity is exact only with mxu_window_sum=False
    (which the stage-A kernel then shares); (b) n_detected counts
    stage-B full-rule WINNERS while n_overflow mixes stage-A candidate
    spills with winner overflow — loss accounting is not comparable
    across the two paths. The stage-A/stage-B split duplicates the
    compare-fold chains of _detect_keep_2d; any fold-order edit there
    MUST be mirrored (the superset guarantee rests on bit-identical
    terms)."""
    if tile is None:
        tile = default_tile(cfg)
    if per_tile is None:
        per_tile = cand_capacity(tile)[0]
    if per_lane is None:
        per_lane = cand_capacity(tile)[1]
    if not ordered or prescreen:
        # the unordered candidate layout (which prescreen always uses)
        # physically caps per-lane extraction at _COUNT_ROW rows
        per_lane = min(per_lane, _COUNT_ROW)
    if prescreen:
        return _demod_batch_planar_prescreen(
            xi8, xq8, cfg, tile=tile, interpret=interpret, nbuf=nbuf,
            per_lane=per_lane, k2=k2)
    cands = preamble_detect_cands_planar(xi8, xq8, cfg, tile=tile,
                                         interpret=interpret,
                                         double_buffer=double_buffer,
                                         nbuf=nbuf, per_tile=per_tile,
                                         per_lane=per_lane, ordered=ordered)

    def compact(cands_c):
        if ordered:
            return compact_candidates(cands_c, cfg, tile, per_tile=per_tile)
        return compact_candidates_unordered(cands_c, cfg, tile,
                                            per_lane=per_lane)

    det_idx, valid, n_det, ovf = jax.vmap(compact)(cands)

    if xla_gather:
        return jax.vmap(
            lambda a, b, d, v, nd, o: gather_tail_planar(a, b, d, v, nd, o,
                                                         cfg)
        )(xi8, xq8, det_idx, valid, n_det, ovf)

    _, _, _, stride_rows = _planar_geometry(cfg, tile)
    batch, K = det_idx.shape
    safe_idx = jnp.where(valid, det_idx, 0)
    chan0 = jnp.arange(batch, dtype=jnp.int32)[:, None] * (stride_rows * 128)
    # -1 marks empty table rows: the slice kernel skips their DMA+rotate
    # (real blocks fill a fraction of the fixed capacity K)
    base = jnp.where(valid,
                     chan0 + cfg.left_halo + safe_idx - cfg.noise_window,
                     -1)
    ri = xi8.reshape(batch * stride_rows, 128)
    rq = xq8.reshape(batch * stride_rows, 128)
    w2 = slice_windows_planar(ri, rq, base.reshape(-1), cfg,
                              interpret=interpret)
    w2 = w2.reshape(batch, K, -1)
    return jax.vmap(
        lambda w, d, v, nd, o: _tail_from_power(w, d, v, nd, o, cfg)
    )(w2, det_idx, valid, n_det, ovf)


def _demod_batch_planar_prescreen(xi8, xq8, cfg: DspConfig, *, tile: int,
                                  interpret: bool, nbuf: int,
                                  per_lane: int, k2: int = None):
    """Two-stage planar demod: prescreen kernel -> K2 candidate windows ->
    full-rule XLA rescan (_stageb_full_check) -> earliest-K winners ->
    standard decode tail. See demod_batch_planar(prescreen=True)."""
    import dataclasses as _dc

    K = cfg.max_detections
    K2 = k2 if k2 is not None else 2 * K
    if K2 < K:
        # top_k(score, K) over a K2-length axis traces into an opaque
        # XLA error otherwise (r5 review)
        raise ValueError(f"k2 ({K2}) must be >= max_detections ({K})")
    cfg2 = _dc.replace(cfg, max_detections=K2)
    half = cfg.nms_chips * cfg.sps
    nw = cfg.noise_window

    cands = preamble_detect_cands_planar(
        xi8, xq8, cfg, tile=tile, interpret=interpret, nbuf=nbuf,
        per_lane=per_lane, ordered=False, prescreen=True)
    det2, valid2, _n_pre, ovf2 = jax.vmap(
        lambda cc: compact_candidates_unordered(cc, cfg2, tile,
                                                per_lane=per_lane))(cands)

    _, _, _, stride_rows = _planar_geometry(cfg, tile)
    batch = det2.shape[0]
    safe2 = jnp.where(valid2, det2, 0)
    chan0 = jnp.arange(batch, dtype=jnp.int32)[:, None] * (stride_rows * 128)
    base = jnp.where(valid2,
                     chan0 + cfg.left_halo + safe2 - nw - half, -1)
    ri = xi8.reshape(batch * stride_rows, 128)
    rq = xq8.reshape(batch * stride_rows, 128)
    w2 = slice_windows_planar(ri, rq, base.reshape(-1), cfg,
                              interpret=interpret, extra=half)
    w2 = w2.reshape(batch, K2, -1)

    win = jax.vmap(lambda w: _stageb_full_check(w, cfg))(w2) & valid2

    def pick(winb, det2b, w2b, ovfb):
        # earliest-K winners; onehot-dot row selection (a (K,)-indexed
        # gather lowers to a sequential loop on TPU)
        score = jnp.where(winb, jnp.int32(1 << 30) - det2b, 0)
        vals, sel = jax.lax.top_k(score, K)
        kvalid = vals > 0
        hi = jax.lax.Precision.HIGHEST
        oh = ((jnp.arange(K2, dtype=jnp.int32)[None, :] == sel[:, None])
              & kvalid[:, None]).astype(jnp.float32)
        wsel = jnp.matmul(oh, w2b, precision=hi)
        idx_sel = jnp.round(
            jnp.matmul(oh, det2b.astype(jnp.float32), precision=hi)
        ).astype(jnp.int32)
        n_win = jnp.sum(winb.astype(jnp.int32))
        overflow = ovfb + jnp.maximum(n_win - K, 0)
        return _tail_from_power(wsel, idx_sel, kvalid, n_win, overflow,
                                cfg, event_off=nw + half)

    return jax.vmap(pick)(win, det2, w2, ovf2)


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret",
                                              "double_buffer", "nbuf",
                                              "per_tile", "per_lane",
                                              "ordered", "xla_gather",
                                              "prescreen", "k2"))
def demod_batch_packed_planar_jit(xi8, xq8, cfg: DspConfig,
                                  tile: int = None,
                                  interpret: bool = False,
                                  double_buffer: bool = False,
                                  nbuf: int = DEFAULT_NBUF,
                                  per_tile: int = None,
                                  per_lane: int = None,
                                  ordered: bool = False,
                                  xla_gather: bool = False,
                                  prescreen: bool = False,
                                  k2: int = None):
    """Planar path + pack_table: (C, P) int8 x2 -> (C, K+1, 9) int32."""
    from ..dsp.pipeline import pack_table
    table = demod_batch_planar(xi8, xq8, cfg, tile=tile, interpret=interpret,
                               double_buffer=double_buffer, nbuf=nbuf,
                               per_tile=per_tile, per_lane=per_lane,
                               ordered=ordered, xla_gather=xla_gather,
                               prescreen=prescreen, k2=k2)
    return jax.vmap(pack_table)(table)

"""Fused resample -> on-device int8 quantize -> planar Pallas demod.

VERDICT r4 #1: the resampled front-end previously demodulated via the XLA
demod_block (sequential gathers on TPU), ~350x below the production planar
kernel. Here the polyphase group-matmul resampler (resample/polyphase.py),
the int8 quantizer (the ONE rule, dsp/host.quantize_i8_np — reimplemented
bit-identically in jnp), and the planar int8 Pallas kernel
(kernels/preamble_pallas.py) fuse into ONE jitted program: raw-rate f32 IQ
in, detection table out. Used by the single-chip CLI runner
(io/stream.run_resampled_fused) and the sharded multi-chip pipeline
(dist/sharded.make_sharded_resample_demod with planar=True).

(Ref: the reference's pfb_arb_resampler / low-pass front-end inserted by
python/radio.py:~150 for non-2-Msps SDR rates — resampled input is
first-class there; this gives the rebuild's hot kernel the same status.)
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import DspConfig


def quantize_i8(x: jax.Array, gain) -> jax.Array:
    """Device twin of dsp.host.quantize_i8_np: round(f32 * gain) clipped to
    +-127. jnp.round is round-half-to-even, same as np.round, and the
    native C quantizer (iqstream.cc) implements the identical rule — all
    three paths produce the same int8 for the same f32 input, so the
    full_scale = gain/127 dBFS referencing holds everywhere. `gain` may be
    a traced scalar (one compile covers every AGC gain). NaN quantizes
    to 0 and +-inf saturates, matching quantize_i8_np and the native C
    quantizer — f32->int8 convert of NaN is UNDEFINED in XLA and broke
    the cross-path bit contract on corrupt captures (r5 review)."""
    y = jnp.clip(jnp.round(x * jnp.float32(gain)), -127, 127)
    return jnp.where(jnp.isnan(y), jnp.float32(0), y).astype(jnp.int8)


def raw_geometry(cfg: DspConfig, p: int, q: int) -> Tuple[int, int, int, int]:
    """(raw_left, raw_block, raw_right, out_off) for the fused path.

    A raw-rate window of raw_left + raw_block + raw_right samples (all
    multiples of the input group gi = 128q, so windows stay aligned with
    the offline resampler's global groups) resamples — first/last group as
    matmul halo — to a channel-rate span that COVERS the demod block's
    [left_halo | block | right_halo] window; out_off is where that window
    starts inside the resampler output. Each raw halo is one gi group of
    matmul lookaround plus enough groups to cover the demod halo:

        raw_halo = gi * (ceil(halo * q / (p * gi)) + 1)
    """
    from .polyphase import _GROUP_PQ_CAP

    gi = 128 * q
    raw_block = cfg.block_size * q // p
    if raw_block * p != cfg.block_size * q or raw_block % gi:
        raise ValueError(
            f"block_size {cfg.block_size} not compatible with p/q={p}/{q}: "
            f"needs block_size % {128 * p} == 0")
    if p * q > _GROUP_PQ_CAP:
        raise ValueError(
            f"p/q={p}/{q}: group matrices exceed the {_GROUP_PQ_CAP} cap — "
            "resample on the host instead (rational_rate with a smaller "
            "max_denominator usually suffices)")

    def halo(h: int) -> int:
        return gi * (-(-(h * q) // (p * gi)) + 1)

    raw_left, raw_right = halo(cfg.left_halo), halo(cfg.right_halo)
    # output index of channel-rate sample (block_start - left_halo): the
    # resampler emits samples for the raw interior [raw_left - gi, ...),
    # i.e. starting at channel-rate index (raw_left - gi) * p / q (exact:
    # raw_left - gi is a multiple of gi = 128q)
    out_off = (raw_left - gi) * p // q - cfg.left_halo
    assert out_off >= 0
    return raw_left, raw_block, raw_right, out_off


def resample_quantize_planar(iqp_raw: jax.Array, gain, cfg: DspConfig,
                             p: int, q: int, taps_per_phase: int = 12):
    """Front half of the fused step: PLANAR (C, 2, rawL+rawB+rawR) f32
    raw -> ((C, 2, left+block+right) int8 planar at channel rate, (C,)
    f32 gains). gain=None runs per-channel device AGC (120/peak of the
    RESAMPLED waveform — the quantize-after-resample rule the host path
    applies); a scalar or (C,) gain is applied as-is.

    Input is PLANAR f32, not interleaved (N, 2): a minor-dim-2 device
    array reads through a tile-padded relayout that measured 77 ms of a
    92 ms call (~5 GB/s effective, r5 stage probe) — the host splits
    I/Q with two strided copies instead. Exposed so tests can
    oracle-decode EXACTLY the int8 stream the fused demod sees
    (quantization after resampling changes bit-level inputs, so the
    golden comparison must consume the same bits)."""
    from .polyphase import resample_groups_halo

    raw_left, raw_block, raw_right, out_off = raw_geometry(cfg, p, q)
    if iqp_raw.ndim == 2:
        iqp_raw = iqp_raw[None]
    c = iqp_raw.shape[0]
    want = raw_left + raw_block + raw_right
    if iqp_raw.shape[1] != 2 or iqp_raw.shape[2] != want:
        raise ValueError(f"fused window must be planar (C, 2, {want}) "
                         f"(raw_geometry), got {iqp_raw.shape}")
    xc = iqp_raw.reshape(2 * c, want)
    win = cfg.left_halo + cfg.block_size + cfg.right_halo
    if p == q == 1:
        # same-rate: pass through (resample()'s own short-circuit rule —
        # the group matmuls at p=q=1 are a half-sample interpolator, not
        # identity: r5 review)
        y = jax.lax.slice_in_dim(xc, raw_left - cfg.left_halo,
                                 raw_left - cfg.left_halo + win, axis=1)
    else:
        yc = resample_groups_halo(xc, p, q, taps_per_phase)
        y = jax.lax.slice_in_dim(yc, out_off, out_off + win, axis=1)
    if gain is None:
        # on-device AGC AFTER resampling (the host raw-window peak under-
        # estimates band-limited reconstruction overshoot by 1-3 dB and
        # quantize clips exactly the strongest pulses — r5 review); the
        # same 120/peak rule as _dev_layout, per channel, including its
        # FINITE-ONLY scan and zero-peak fallback: one NaN/Inf sample
        # otherwise drives the gain to NaN/0 and silences the channel's
        # whole block (the host paths were fixed this round; the device
        # twin had the same bug)
        ay = jnp.abs(y.reshape(c, 2 * win))
        pk = jnp.max(jnp.where(jnp.isfinite(ay), ay, jnp.float32(0)),
                     axis=1)
        gains = jnp.float32(120.0) / jnp.where(pk == 0, jnp.float32(1), pk)
    else:
        g = jnp.asarray(gain, jnp.float32)
        gains = jnp.broadcast_to(g, (c,)) if g.ndim == 0 else g
    grow = jnp.repeat(gains, 2)[:, None]
    return quantize_i8(y, grow).reshape(c, 2, win), gains


def resample_demod_planar(iq_raw: jax.Array, gain, cfg: DspConfig,
                          p: int, q: int, taps_per_phase: int = 12,
                          tile: int = None, interpret: bool = False):
    """Fused single-chip step: PLANAR (C, 2, rawL+rawB+rawR) f32 raw ->
    (DetectionTable (leading C), (C,) f32 gains), indices relative to
    the owned block. gain=None = per-channel device AGC (see
    resample_quantize_planar).

    The window layout is raw_geometry(cfg, p, q); resample, int8 quantize
    (round-half-even, the shared rule) and the planar Pallas demod all run
    in one XLA program — nothing round-trips through the host or an
    HBM-visible f32 intermediate at channel rate."""
    from ..kernels.preamble_pallas import demod_batch_planar, planar_length

    y8, gains = resample_quantize_planar(iq_raw, gain, cfg, p, q,
                                         taps_per_phase)
    c, _, win = y8.shape
    plen = planar_length(cfg, tile)
    xi = jnp.pad(y8[:, 0], ((0, 0), (0, plen - win)))
    xq = jnp.pad(y8[:, 1], ((0, 0), (0, plen - win)))
    return (demod_batch_planar(xi, xq, cfg, tile=tile, interpret=interpret),
            gains)


@functools.partial(jax.jit, static_argnames=(
    "cfg", "p", "q", "taps_per_phase", "tile", "interpret"))
def resample_demod_packed_planar_jit(iq_raw, gain, cfg: DspConfig,
                                     p: int, q: int,
                                     taps_per_phase: int = 12,
                                     tile: int = None,
                                     interpret: bool = False):
    """Fused path + pack_table: planar (C, 2, W) f32 raw (+ gain or
    None=AGC) -> ((C, K+1, 9) int32, (C,) f32 gains)."""
    from ..dsp.pipeline import pack_table
    table, gains = resample_demod_planar(iq_raw, gain, cfg, p, q,
                                         taps_per_phase=taps_per_phase,
                                         tile=tile, interpret=interpret)
    return jax.vmap(pack_table)(table), gains

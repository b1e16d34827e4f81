"""The TPU demod pipeline: IQ block -> fixed-capacity detection table.

This is the TPU-native re-design of the reference's C++ hot path
(lib/preamble_impl.cc + lib/slicer_impl.cc plus the GNU Radio
complex_to_mag_squared / moving_average_ff front-end blocks it consumes,
SURVEY.md §2.1/§3.2). Instead of a thread-per-block stream graph, one jitted
XLA program processes a fixed-size block of IQ samples entirely on device:

  mag2 -> trailing moving-average noise floor -> vectorized preamble check at
  EVERY sample offset -> non-max suppression -> top-k compaction into a
  fixed-capacity detection table -> PPM chip gather + bit slice + confidence
  -> CRC-24 as a GF(2) matmul -> brute-force low-confidence ECC by packed
  syndrome table lookup.

Static shapes everywhere (the central design tension, SURVEY.md §7): the
variable number of detections per block becomes a capacity-K masked table
plus an overflow counter.

Block layout: the input array holds [left_halo | owned (block_size) | right_halo]
samples; detections are claimed iff their preamble start falls in the owned
region — the overlap-save dedup rule used by the sharded pipeline (§5.7).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import crc
from ..config import DspConfig
from ..constants import (
    CHIPS_PER_BIT,
    MAX_FRAME_BITS,
    PREAMBLE_CHIPS,
    PREAMBLE_PULSE_CHIPS,
    PREAMBLE_QUIET_CHIPS,
    STATUS_ADDR,
    STATUS_CORRECTED_1,
    STATUS_CORRECTED_2,
    STATUS_CRC_OK,
    STATUS_FAIL,
)


class DetectionTable(NamedTuple):
    """Fixed-shape per-block output (device -> host)."""

    index: jax.Array      # (K,) int32 — preamble start, offset within owned region; -1 invalid
    bits: jax.Array       # (K, 112) uint8 — post-ECC frame bits (MSB first)
    df: jax.Array         # (K,) int32
    nbits: jax.Array      # (K,) int32 — 56 or 112
    syndrome: jax.Array   # (K,) int32 — packed 24-bit post-correction syndrome
    status: jax.Array     # (K,) int32 — STATUS_* code
    ref_level: jax.Array  # (K,) float32 — preamble reference power
    noise: jax.Array      # (K,) float32 — noise floor at detection
    n_detected: jax.Array  # () int32 — number of preamble hits in owned region
    n_overflow: jax.Array  # () int32 — hits dropped because K was exceeded


# -----------------------------------------------------------------------------
# stage 1: magnitude + noise floor
# -----------------------------------------------------------------------------

def magnitude_squared(iq: jax.Array) -> jax.Array:
    """|IQ|^2 (ref: blocks.complex_to_mag_squared).

    Accepts complex64 (CPU-friendly) or float32 with trailing dim 2 holding
    (I, Q) — the TPU-native layout: complex dtypes are not supported by the
    TPU runtime, and a float32 view of interleaved complex64 is free on host.
    """
    if jnp.iscomplexobj(iq):
        return (jnp.real(iq) ** 2 + jnp.imag(iq) ** 2).astype(jnp.float32)
    assert iq.shape[-1] == 2, "expected (..., 2) (I,Q) layout"
    if iq.dtype == jnp.uint8:
        # rtl-sdr's RAW wire bytes (offset-127 unsigned): uint8**2 wraps
        # mod 256 into valid-shaped garbage (zero detections, no error) —
        # and the TPU runtime cannot compute uint8 at all. Convert on
        # host (io.sources uc8 readers / native convert_uc8) first.
        raise TypeError(
            "magnitude_squared: uint8 (raw uc8 bytes) unsupported — "
            "convert offset-127 unsigned to centered int8/float32 first")
    if iq.dtype in (jnp.int8, jnp.int16):
        # quantized SDR wire formats (rtl-sdr 8-bit, USRP sc16): convert on
        # device — 4-8x less host->device traffic than float32
        scale = 1.0 / 127.0 if iq.dtype == jnp.int8 else 1.0 / 32767.0
        iq = iq.astype(jnp.float32) * scale
    return iq[..., 0] ** 2 + iq[..., 1] ** 2


def noise_floor(mag2: jax.Array, window: int) -> jax.Array:
    """Trailing moving average over `window` samples (ref: moving_average_ff).

    noise[i] = mean(mag2[i-window:i]) — causal, so a frame's own pulses do not
    inflate the floor used to detect its preamble. The first `window` samples
    reuse the first full window's value (callers supply >= window left halo).

    Implemented as a mean-centered cumsum difference: centering keeps the f32
    running sum near zero so the O(N)-magnitude cancellation error of a plain
    cumsum disappears (measured <1e-5 relative at 2^20 samples). A windowed
    reduce_window/conv would be exact but compiles pathologically on XLA CPU.
    """
    mu = jnp.mean(mag2)
    cs = jnp.cumsum(mag2 - mu)
    cspad = jnp.concatenate([jnp.zeros((1,), mag2.dtype), cs])
    # sums[j] = sum(mag2[j : j+window]) = centered-diff + window * mu
    sums = cspad[window:] - cspad[:-window] + window * mu
    avg = sums * (1.0 / window)
    # trailing floor at i is avg[i-window]
    pad = jnp.full((window,), avg[0], avg.dtype)
    return jnp.concatenate([pad, avg[:-1]])


# -----------------------------------------------------------------------------
# stage 2: preamble detection at every offset
# -----------------------------------------------------------------------------

def _shifted(x: jax.Array, shift: int, n: int) -> jax.Array:
    """x[shift : shift+n] as a static slice."""
    return jax.lax.dynamic_slice_in_dim(x, shift, n)


def chip_energy(mag2: jax.Array, sps: int) -> jax.Array:
    """ce[i] = mean(mag2[i : i+sps]) — forward chip-energy integration.

    At sps > 1 all preamble pulse/quiet/peak decisions use chip energies:
    a detection offset misaligned with the true chip phase leaks pulse
    energy into the quiet chips and fails the quiet check, so the aligned
    phase wins (the reference's 're-center on best peak within the chip').
    For sps == 1 this is the identity.
    """
    if sps == 1:
        return mag2
    return sum(jnp.roll(mag2, -s) for s in range(sps)) * (1.0 / sps)


def preamble_detect(mag2: jax.Array, noise: jax.Array, cfg: DspConfig,
                    left: int, n_owned: int):
    """Vectorized 4-pulse + quiet-chip preamble check over the owned region.

    Reference semantics (lib/preamble_impl.cc): a sample is a candidate if it
    is a local peak exceeding noise * 10^(dB/10); the 4 pulses at chip offsets
    {0,2,7,9} must all be present within an amplitude tolerance of the
    reference level; the designated quiet chips must stay below it. Re-center
    on the best peak within the chip -> non-max suppression here.

    Returns (mask, ref_level) over the owned region.
    """
    sps = cfg.sps
    m = chip_energy(mag2, sps)

    # Candidate tests run over the owned region EXTENDED nms_chips into both
    # halos (real stream data, not zero padding): the sequential reference
    # suppresses an owned candidate when a stronger one sits just across the
    # block edge, and the Pallas kernels test the same extended window —
    # zero-padding here would let preamble clusters straddling a block
    # boundary fire twice (once per owning block).
    half = cfg.nms_chips * sps
    base = left - half
    n_ext = n_owned + 2 * half

    pulses = [_shifted(m, base + c * sps, n_ext) for c in PREAMBLE_PULSE_CHIPS]
    ref = (pulses[0] + pulses[1] + pulses[2] + pulses[3]) * 0.25

    nf = _shifted(noise, base, n_ext)
    thresh = jnp.float32(cfg.threshold)

    # local peak on the first pulse (chip-energy domain); the pulse
    # loop below applies the threshold test to pulses[0] too
    ok = pulses[0] >= _shifted(m, base - 1, n_ext)
    ok &= pulses[0] > _shifted(m, base + 1, n_ext)
    # all four pulses above threshold and within tolerance of the reference
    ptol = jnp.float32(cfg.pulse_tolerance)
    for p in pulses:
        ok &= (p > nf * thresh) & (p > ref * ptol)
    # quiet chips below quiet_tolerance * reference
    qtol = jnp.float32(cfg.quiet_tolerance)
    for q in PREAMBLE_QUIET_CHIPS:
        ok &= _shifted(m, base + q * sps, n_ext) < ref * qtol

    # Non-max suppression: keep the best reference level within +-nms_chips
    # chips (the "re-center on best peak" behavior). Ties break toward the
    # earliest sample: survive iff strictly greater than every hit in the
    # preceding half-window and >= every hit in the following half-window.
    score = jnp.where(ok, ref, 0.0)                   # ext coords
    win = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, window_dimensions=(half,),
        window_strides=(1,), padding="VALID")         # win[j] = max(score[j:j+half])
    left_max = win[:n_owned]                          # max over [i-half, i)
    right_max = win[half + 1: half + 1 + n_owned]     # max over [i+1, i+half]
    owned = score[half: half + n_owned]
    ok = ok[half: half + n_owned] & (owned > left_max) & (owned >= right_max)
    return ok, ref[half: half + n_owned]


def compact_detections(mask: jax.Array, max_detections: int,
                       group: int = 1024, per_group: int = 16):
    """Boolean mask -> first-K indices (ascending), count, overflow.

    Two-stage compaction: a single top_k over the whole block is the most
    expensive op in the post-kernel tail on TPU (~7 ms at 4M samples), so the
    block is split into `group`-sample groups, each keeping its `per_group`
    earliest hits, and the global top-K runs over the (n/group * per_group)
    candidates. Hits beyond per_group in one group are physically possible
    only in pathological noise (NMS enforces pulse spacing); they are counted
    into n_overflow, preserving the drop-and-continue accounting.
    """
    n = mask.shape[0]
    # Earlier index -> larger score, so top_k returns ascending indices.
    score = jnp.where(mask, n - jnp.arange(n, dtype=jnp.int32), 0)
    n_det = jnp.sum(mask.astype(jnp.int32))
    # the grouped path needs enough candidates to feed the global top-K
    # (top_k with k > candidate count is a trace-time error)
    if (n % group != 0 or n < 4 * group
            or (n // group) * per_group < max_detections):
        vals, idx = jax.lax.top_k(score, max_detections)
        valid = vals > 0
        det_idx = jnp.where(valid, idx.astype(jnp.int32), -1)
        overflow = jnp.maximum(n_det - max_detections, 0)
        return det_idx, valid, n_det, overflow

    g = score.reshape(-1, group)
    vals, idx = jax.lax.top_k(g, per_group)                    # (G, J)
    cand_val = vals.reshape(-1)
    v2, i2 = jax.lax.top_k(cand_val, max_detections)
    valid = v2 > 0
    # selection via HIGHEST-precision onehot dots, NOT cand_idx[i2]:
    # (K,)-indexed gathers lower to sequential ~2.5 us/element loops on
    # TPU (CLAUDE.md). Within-group index and group number recombine in
    # int32 so block sizes past 2^24 samples stay exact in f32.
    sel = (i2[:, None] == jnp.arange(cand_val.shape[0],
                                     dtype=jnp.int32)[None, :]
           ).astype(jnp.float32)
    gnum = jnp.broadcast_to(
        jnp.arange(g.shape[0], dtype=jnp.float32)[:, None],
        idx.shape).reshape(-1)
    w_sel = jnp.round(jnp.matmul(
        sel, idx.astype(jnp.float32).reshape(-1),
        precision=jax.lax.Precision.HIGHEST)).astype(jnp.int32)
    g_sel = jnp.round(jnp.matmul(
        sel, gnum, precision=jax.lax.Precision.HIGHEST)).astype(jnp.int32)
    det_idx = jnp.where(valid, g_sel * group + w_sel, -1)
    overflow = n_det - jnp.sum(valid.astype(jnp.int32))
    return det_idx, valid, n_det, overflow


# -----------------------------------------------------------------------------
# stage 3: bit slicing
# -----------------------------------------------------------------------------

def slice_bits(mag2: jax.Array, det_idx: jax.Array, valid: jax.Array,
               ref_level: jax.Array, cfg: DspConfig, left: int):
    """Gather 224 data chips per detection; PPM compare -> bits + confidence.

    Reference semantics (lib/slicer_impl.cc): bit = chip0 > chip1; confidence
    high iff exactly one chip of the pair is above the reference level.
    """
    sps = cfg.sps
    n_chips = MAX_FRAME_BITS * CHIPS_PER_BIT
    base = left + jnp.where(valid, det_idx, 0) + PREAMBLE_CHIPS * sps
    chip_offsets = jnp.arange(n_chips, dtype=jnp.int32) * sps
    if sps == 1:
        energies = mag2[base[:, None] + chip_offsets[None, :]]
    else:
        sub = jnp.arange(sps, dtype=jnp.int32)
        gather_idx = base[:, None, None] + chip_offsets[None, :, None] + sub[None, None, :]
        energies = jnp.sum(mag2[gather_idx], axis=-1) * (1.0 / sps)

    e0 = energies[:, 0::2]
    e1 = energies[:, 1::2]
    bits = (e0 > e1)
    level = ref_level[:, None] * jnp.float32(cfg.confidence_level)
    on0 = e0 > level
    on1 = e1 > level
    confidence = jnp.logical_xor(on0, on1)
    return bits, confidence


# -----------------------------------------------------------------------------
# stage 4: CRC as GF(2) matmul + brute-force low-confidence ECC
# -----------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _crc_tables():
    """Packed syndrome rows for 112- and 56-bit frames (device constants).

    rows112[i] = syndrome contribution of bit i in a 112-bit frame;
    rows56 aligned into the first 56 lanes (bits 56..111 contribute 0).
    """
    r112 = crc.syndrome_rows(112).astype(np.int32)
    r56 = np.zeros(112, dtype=np.int32)
    r56[:56] = crc.syndrome_rows(56).astype(np.int32)
    # numpy (not jnp) so the cache never holds a tracer from some jit scope
    return r112, r56


def _packed_syndrome(bits: jax.Array, rows: jax.Array) -> jax.Array:
    """XOR-fold rows of set bits -> packed 24-bit syndrome, via int matmul.

    GF(2) XOR of table rows == per-bit-plane popcount parity. We compute
    counts[k, b] = sum_i bits[k,i] * row_bit[i,b] with an MXU matmul and take
    parity of each count.
    """
    cols = jnp.arange(23, -1, -1, dtype=jnp.int32)
    row_bits = ((rows[:, None] >> cols[None, :]) & 1).astype(jnp.float32)  # (112, 24)
    counts = jax.lax.dot_general(
        bits.astype(jnp.float32), row_bits,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)
    parity = counts.astype(jnp.int32) & 1                                   # (K, 24)
    return jnp.sum(parity << (23 - jnp.arange(24, dtype=jnp.int32))[None, :], axis=1)


def crc_check_and_correct(bits: jax.Array, confidence: jax.Array,
                          cfg: DspConfig):
    """Per-detection CRC + the reference's acceptance/correction policy.

    - DF (first 5 bits) selects frame length: 112 for DF >= 16, else 56.
    - DF11: accept when the HIGH 17 syndrome bits are zero (PI overlaid with
      interrogator ID).
    - DF17/18: require syndrome == 0; else brute-force flips of low-confidence
      bits (singles then pairs), attempted only when the low-confidence count
      is <= cfg.max_lowconf_bits — flipping bit i XORs rows[i] into the
      syndrome, so candidates are packed-int table lookups.
    - Other DFs (AP overlaid with ICAO): emitted with syndrome as the address.
    Returns (bits, df, nbits, syndrome, status).
    """
    rows112_np, rows56_np = _crc_tables()
    rows112, rows56 = jnp.asarray(rows112_np), jnp.asarray(rows56_np)
    k = bits.shape[0]
    bits_i = bits.astype(jnp.int32)

    df = jnp.sum(bits_i[:, :5] << (4 - jnp.arange(5, dtype=jnp.int32))[None, :], axis=1)
    is_long = df >= 16
    nbits = jnp.where(is_long, 112, 56)

    lane = jnp.arange(112, dtype=jnp.int32)
    in_frame = lane[None, :] < nbits[:, None]
    fbits = jnp.where(in_frame, bits_i, 0)

    synd112 = _packed_syndrome(fbits, rows112)
    synd56 = _packed_syndrome(fbits, rows56)
    synd = jnp.where(is_long, synd112, synd56)

    lowconf = jnp.logical_not(confidence) & in_frame
    n_lowconf = jnp.sum(lowconf.astype(jnp.int32), axis=1)

    # --- single-bit correction candidates ---
    # correction is gated to long frames (ecc_allowed: DF17/18), so
    # rows112 applies unconditionally — no merged per-detection table
    match1 = lowconf & (rows112[None, :] == synd[:, None])                 # (K, 112)
    has1 = jnp.any(match1, axis=1)
    flip1 = jnp.argmax(match1, axis=1)                                     # first match

    # --- two-bit correction: syndrome ^ rows[i] == rows[j], i < j ---
    # Pair flips are only accepted when n_lowconf <= cfg.max_lowconf_bits
    # (ecc_allowed below), so it suffices to extract the first L low-
    # confidence positions and test the C(L, 2) static pairs — L*(L-1)/2
    # per-detection XOR compares instead of the (K, 112, 112) all-pairs
    # tensor (which cost ~0.4 ms per 4M-sample block on TPU). Pair
    # correction only applies to long frames (DF17/18), so rows112 is
    # used unconditionally; short-frame lanes are masked by ecc_allowed.
    L = int(cfg.max_lowconf_bits)
    cand = jnp.where(lowconf, lane[None, :], 112)
    ps, rowsp = [], []
    for _ in range(L):
        p = jnp.min(cand, axis=1)                                          # (K,)
        ps.append(p)
        # rows112[p] as a onehot-masked reduce — a (K,)-indexed gather
        # lowers to a slow sequential loop on TPU; this is one fused
        # (K, 112) select+sum (exact: one match or none)
        rowsp.append(jnp.sum(
            jnp.where(lane[None, :] == p[:, None], rows112[None, :], 0),
            axis=1))
        cand = jnp.where(cand == p[:, None], 112, cand)
    has2 = jnp.zeros((k,), bool)
    flip2_i = jnp.zeros((k,), jnp.int32)
    flip2_j = jnp.zeros((k,), jnp.int32)
    for a in range(L):
        for b in range(a + 1, L):
            # positions ascending: ps[b] < 112 implies ps[a] < 112
            m = (ps[b] < 112) & ((rowsp[a] ^ rowsp[b]) == synd) & ~has2
            flip2_i = jnp.where(m, ps[a], flip2_i)
            flip2_j = jnp.where(m, ps[b], flip2_j)
            has2 |= m

    ecc_allowed = (df == 17) | (df == 18)
    ecc_allowed &= n_lowconf <= cfg.max_lowconf_bits
    ok0 = synd == 0
    use1 = ecc_allowed & ~ok0 & has1
    use2 = ecc_allowed & ~ok0 & ~has1 & has2

    flip_mask = (use1[:, None] & (lane[None, :] == flip1[:, None]))
    flip_mask |= (use2[:, None] & ((lane[None, :] == flip2_i[:, None]) |
                                   (lane[None, :] == flip2_j[:, None])))
    out_bits = jnp.logical_xor(bits, flip_mask)
    out_synd = jnp.where(use1 | use2, 0, synd)

    # A clean DF11 interrogated by II has syndrome == II (the interrogator
    # ID is overlaid on the LOW bits of PI): accept syndrome < 0x80, i.e.
    # high 17 bits zero. (synd & 0x7F) == 0 is the inverted rule — it drops
    # every II != 0 all-call reply and admits garbage multiples of 128.
    df11_ok = (df == 11) & ((synd & 0xFFFF80) == 0)
    # clean long squitters; corrected frames get their status from use1/use2
    ok_long = ((df == 17) | (df == 18)) & ok0
    # AP-overlaid DFs the decoder handles (df >= 24 is Comm-D ELM = DF24);
    # any other DF value came from noise and is dropped.
    addr_type = ((df == 0) | (df == 4) | (df == 5) | (df == 16) |
                 (df == 20) | (df == 21) | (df >= 24))

    status = jnp.full((k,), STATUS_FAIL, jnp.int32)
    status = jnp.where(addr_type, STATUS_ADDR, status)
    status = jnp.where(ok_long, STATUS_CRC_OK, status)
    status = jnp.where(use1, STATUS_CORRECTED_1, status)
    status = jnp.where(use2, STATUS_CORRECTED_2, status)
    status = jnp.where(df11_ok, STATUS_CRC_OK, status)

    # the brute force may flip DF-field bits (lanes 0-4): the emitted df
    # must describe the CORRECTED frame, or the wire carries e.g. "17"
    # with a DF21 body and the parser decodes garbage fields from a
    # CRC-clean message (r4 review, reproduced). A flip that moves the
    # frame into the other length class contradicts the sliced length
    # the CRC was computed over — drop it.
    out_i = out_bits.astype(jnp.int32)
    df_out = jnp.sum(
        out_i[:, :5] << (4 - jnp.arange(5, dtype=jnp.int32))[None, :],
        axis=1)
    corrected = use1 | use2
    class_flip = corrected & ((df_out >= 16) != is_long)
    status = jnp.where(class_flip, STATUS_FAIL, status)
    return out_bits, df_out, nbits, out_synd, status


# -----------------------------------------------------------------------------
# full pipeline
# -----------------------------------------------------------------------------

def iq_to_device_layout(iq):
    """Host-side: complex64 (N,) -> float32 (N, 2) zero-copy view."""
    arr = np.ascontiguousarray(iq)
    if arr.dtype == np.complex64:
        return arr.view(np.float32).reshape(*arr.shape, 2)
    return arr


def demod_block(iq: jax.Array, cfg: DspConfig) -> DetectionTable:
    """One device step: (left_halo + block_size + right_halo,) complex64, or
    the same in float32 (N, 2) I/Q layout -> DetectionTable.
    jit-specialized on cfg (static)."""
    left, n = cfg.left_halo, cfg.block_size
    need = left + n + cfg.right_halo
    if iq.shape[0] < need:
        # dynamic_slice CLAMPS out-of-bounds starts: a short block would
        # demodulate misaligned garbage silently, not fail. The framers
        # always zero-pad to the full frame; reject anything shorter.
        raise ValueError(
            f"block length {iq.shape[0]} < left+block+right {need}: "
            "frame with io.sources (zero-padded halos)")
    mag2 = magnitude_squared(iq).astype(jnp.float32)
    noise = noise_floor(mag2, cfg.noise_window)
    mask, ref = preamble_detect(mag2, noise, cfg, left, n)
    det_idx, valid, n_det, overflow = compact_detections(mask, cfg.max_detections)

    safe_idx = jnp.where(valid, det_idx, 0)
    ref_level = ref[safe_idx]
    noise_at = noise[left + safe_idx]

    bits, confidence = slice_bits(mag2, det_idx, valid, ref_level, cfg, left)
    out_bits, df, nbits, synd, status = crc_check_and_correct(bits, confidence, cfg)

    return finalize_table(valid, det_idx, out_bits, df, nbits, synd, status,
                          ref_level, noise_at, n_det, overflow)


def finalize_table(valid, det_idx, bits, df, nbits, synd, status,
                   ref_level, noise_at, n_det, overflow) -> DetectionTable:
    """Mask EMPTY table rows to a deterministic all-zero shape (index -1,
    df -1, status FAIL): empty rows would otherwise carry whatever the
    capacity-K tail computed from placeholder windows, which differs
    between the XLA / Pallas / sparse-slice paths and defeats
    table-equality testing (and lets the slice kernel skip them)."""
    return DetectionTable(
        index=jnp.where(valid, det_idx, -1),
        bits=jnp.where(valid[:, None], bits, False).astype(jnp.uint8),
        df=jnp.where(valid, df, -1),
        nbits=jnp.where(valid, nbits, 0),
        syndrome=jnp.where(valid, synd, 0),
        status=jnp.where(valid, status, STATUS_FAIL),
        ref_level=jnp.where(valid, ref_level, 0.0),
        noise=jnp.where(valid, noise_at, 0.0),
        n_detected=n_det,
        n_overflow=overflow,
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def demod_block_jit(iq: jax.Array, cfg: DspConfig) -> DetectionTable:
    return demod_block(iq, cfg)


# --- packed single-array output (device->host transfer efficiency) -----------
#
# The table is 10 arrays (one uint8); on tunneled/remote device runtimes each
# D2H transfer pays a large fixed latency, so the production path packs the
# whole table into ONE int32 matrix fetched in a single transfer.
#
# Row k (detection k): [index, df | nbits<<8 | status<<16, syndrome,
#                       ref_level(bitcast), noise(bitcast), w0..w3]
# where w0..w3 are the 112 frame bits packed 28 per int32 word (MSB first).
# Final extra row: [n_detected, n_overflow, 0, ...]. (See pack_table.)

PACKED_COLS = 9


def pack_table(table: DetectionTable) -> jax.Array:
    """(K+1, 9) int32: [index, df|nbits<<8|status<<16, syndrome, ref, noise,
    4x 28-bit bit words]; final row = [n_detected, n_overflow, 0...]. The
    per-block device->host transfer — kept minimal (it crosses PCIe/DCN on
    real hosts and a slow relay on the dev harness)."""
    k = table.index.shape[0]
    words = table.bits.astype(jnp.int32).reshape(k, 4, 28)
    shifts = (27 - jnp.arange(28, dtype=jnp.int32))[None, None, :]
    packed_bits = jnp.sum(words << shifts, axis=-1)            # (K, 4)
    # df = -1 marks empty rows; it travels as 0xFF in the low byte
    meta = ((table.df & 0xFF) + (table.nbits << 8) + (table.status << 16))
    f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    rows = jnp.concatenate([
        table.index[:, None], meta[:, None], table.syndrome[:, None],
        f2i(table.ref_level)[:, None], f2i(table.noise)[:, None],
        packed_bits,
    ], axis=1)                                                  # (K, 9)
    tail = jnp.zeros((1, PACKED_COLS), jnp.int32)
    tail = tail.at[0, 0].set(table.n_detected.astype(jnp.int32))
    tail = tail.at[0, 1].set(table.n_overflow.astype(jnp.int32))
    return jnp.concatenate([rows, tail], axis=0)                # (K+1, 9)


def unpack_table(arr) -> DetectionTable:
    """Host-side inverse of pack_table (numpy)."""
    arr = np.asarray(arr)
    rows, tail = arr[:-1], arr[-1]
    words = rows[:, 5:9].astype(np.uint32)
    bits = ((words[:, :, None] >> (27 - np.arange(28))[None, None, :]) & 1)
    bits = bits.reshape(rows.shape[0], 112).astype(np.uint8)
    i2f = lambda x: x.astype(np.int32).view(np.float32)
    meta = rows[:, 1]
    df = meta & 0xFF
    df = np.where(df == 0xFF, -1, df)
    return DetectionTable(
        index=rows[:, 0], bits=bits, df=df,
        nbits=(meta >> 8) & 0xFF, syndrome=rows[:, 2],
        status=meta >> 16,
        ref_level=i2f(rows[:, 3].copy()), noise=i2f(rows[:, 4].copy()),
        n_detected=tail[0], n_overflow=tail[1])


@functools.partial(jax.jit, static_argnames=("cfg",))
def demod_block_packed_jit(iq: jax.Array, cfg: DspConfig) -> jax.Array:
    """demod_block + pack_table: one (K+1, 9) int32 output array."""
    return pack_table(demod_block(iq, cfg))


@functools.partial(jax.jit, static_argnames=("cfg",))
def demod_batch_jit(iq: jax.Array, cfg: DspConfig) -> DetectionTable:
    """Batched over leading channel axis: (C, L+N+R) -> DetectionTable with
    leading C axis (channel data-parallelism on one chip)."""
    return jax.vmap(lambda x: demod_block(x, cfg))(iq)

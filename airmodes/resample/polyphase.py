"""Polyphase FIR rational resampler (ref: the gr-air-modes front-end filter).

The reference inserts a pfb_arb_resampler / low-pass front-end when the SDR
rate is not an integer multiple of 2 Msps (python/radio.py source setup,
SURVEY.md §2.1 supporting pieces). Here that becomes a TPU-native
formulation of the classic P/Q polyphase structure

    y[n] = sum_k h[k*P + (n*Q mod P)] * x[floor(n*Q/P) - k]

as dense BLOCK-TOEPLITZ MATMULS on the MXU: the filter is linear and
periodic (output n and n + 128P use the same coefficients against inputs
shifted by 128Q), so output groups of 128P samples are three consecutive
128Q-sample input groups times constant matrices. Measured on the dev
TPU, every other formulation is 10-1000x slower (per-output gathers,
strided slices, (M, q) reshapes, transposes, and tiny-channel dilated
convs all hit sequential lowering or 128x tile-padding blowups — see
scripts/tpu_resample_*_probe.py); dense MXU FLOPs are the one thing the
chip gives away for free. The same matmuls run on the CPU test mesh.

Operational note: fractional-rate SDR captures (e.g. rtl-sdr 2.4 Msps)
decode most robustly resampled UP to 4 Msps (2 samples/chip with
chip-energy integration, verified 12/12 on band-limited captures); at
2 Msps output a single sample per chip lands at an arbitrary sub-chip
phase and marginal messages drop — the same physics limits the reference
at 2 Msps. The input must be anti-alias filtered by the SDR (all real
front-ends do); naively decimated square-pulse test vectors alias ~30%
of the pulse energy in-band and nothing downstream can undo that.
"""

from __future__ import annotations

import functools
from fractions import Fraction
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def design_lowpass(num_taps: int, cutoff: float, beta: float = 8.6,
                   delay: float = None) -> np.ndarray:
    """Kaiser-windowed sinc low-pass; cutoff in (0, 1] of Nyquist.

    delay sets the filter's group delay in samples (default (N-1)/2, the
    symmetric linear-phase center). The polyphase bank passes N/2: its
    anchor arithmetic advances by p*(taps_eff//2) = N/2 upsampled ticks,
    so a (N-1)/2-delay prototype left every resampled stream HALF an
    upsampled tick early — a constant 1/(2*p*rate_in) timestamp bias
    (~42 ns at 6->4 Msps; ~12 m of TDOA for a resampled mlat station
    against native-rate stations — r5 review, verified by impulse
    centroid)."""
    c = (num_taps - 1) / 2 if delay is None else delay
    n = np.arange(num_taps) - c
    h = np.sinc(cutoff * n) * cutoff
    # kaiser window evaluated about the SAME center (np.kaiser is only
    # symmetric about (N-1)/2)
    half = max(c, num_taps - 1 - c) + 0.5
    h *= np.i0(beta * np.sqrt(np.clip(1 - (n / half) ** 2, 0.0, 1.0))) \
        / np.i0(beta)
    return (h / h.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _polyphase_bank(p: int, q: int, taps_per_phase: int) -> np.ndarray:
    """(p, taps_eff) filter bank for interpolate-by-p/decimate-by-q.

    Prototype low-pass cutoff = 1/max(p, q) of the upsampled Nyquist, gain p
    (to compensate zero-stuffing). The prototype LENGTH scales with
    max(p, q), not p: for decimation-dominant ratios (p < q) a p-scaled
    length left only p*taps_per_phase taps against a 1/q cutoff — at
    p=1, q=5 that is 12 taps with alias bands at -5.5 dB, folding
    out-of-band noise nearly unattenuated into the channel (r4 review,
    measured; cf. scipy resample_poly's 10*max(up,down) half-length).
    taps_eff = taps_per_phase * ceil(max(p, q) / p) keeps per-phase work
    proportional and pushes the p=1, q=5 worst alias band below -50 dB.
    """
    taps_eff = taps_per_phase * (-(-max(p, q) // p))
    num_taps = p * taps_eff
    h = design_lowpass(num_taps, cutoff=1.0 / max(p, q),
                       delay=num_taps / 2) * p
    return h.reshape(taps_eff, p).T.copy()  # [phase, tap]


def _resample_cols(x2: jax.Array, p: int, q: int,
                   taps_per_phase: int) -> jax.Array:
    """Rational-resample (N, C) columns jointly; output (floor(N*p/q), C).

    Phase-decomposed, gather-free (TPU gathers lower to sequential loops):
    outputs n = r + m*p share subfilter phase (r*q) mod p and anchors in
    arithmetic progression base0(r) + m*q, so each (row, tap) term is a
    STATIC strided slice (reshape + column) times a scalar coefficient —
    p*T fused slice+fma passes, fully vectorized on the VPU.

        y[r + m*p] = sum_k bank[(r*q) % p, k] * x[(r*q)//p + t//2 + m*q - k]

    Out-of-range taps at the edges read zeros (the same edge rule as the
    group-matmul path, so resample() behaves identically on either side
    of _GROUP_PQ_CAP). All components (I/Q or re/im) go through ONE
    computation.
    """
    n_in = x2.shape[0]
    nc = x2.shape[1]
    n_out = (n_in * p) // q
    if n_out <= 0:
        return jnp.zeros((0, nc), x2.dtype)
    bank = _polyphase_bank(p, q, taps_per_phase)          # numpy (p, T)
    t = bank.shape[1]   # EFFECTIVE taps per phase (the bank scales the
    # prototype with max(p,q)); iterating taps_per_phase here would
    # truncate the filter to its tiny leading taps
    m_rows = -(-n_out // p)                               # outputs per row

    base0 = [(r * q) // p + (t // 2) for r in range(p)]
    phase = [(r * q) % p for r in range(p)]
    lpad = max(0, t - min(base0))
    rpad = max(0, max(base0) + (m_rows - 1) * q - (n_in - 1)) + 1
    xp = jnp.concatenate([
        jnp.zeros((lpad, nc), x2.dtype), x2,
        jnp.zeros((rpad, nc), x2.dtype)], axis=0)

    rows = []
    for r in range(p):
        acc = jnp.zeros((m_rows, nc), x2.dtype)
        h = bank[phase[r]]
        for k in range(t):
            s = lpad + base0[r] - k
            # true strided slice: (m_rows, nc) directly — a reshape via
            # (m_rows, q, nc) pads the tiny minor dims to TPU tiles (21x
            # memory blowup at q=6)
            col = jax.lax.slice(xp, (s, 0), (s + (m_rows - 1) * q + 1, nc),
                                (q, 1))
            acc = acc + jnp.float32(h[k]) * col
        rows.append(acc)
    y = jnp.stack(rows, axis=1).reshape(m_rows * p, nc)   # n = m*p + r
    return y[:n_out]


@functools.partial(jax.jit, static_argnames=("p", "q", "t", "S"))
def _streaming_kernel(block2, p: int, q: int, t: int, S: int):
    """One streaming stride: module-level jit so identical (p, q, t, S)
    kernels share ONE compiled program across resampler instances (a
    per-instance closure jit recompiled the same three matmuls for every
    channel / reconnect — r4 review; TPU compiles cost 10-300 s).

    block2: (hist + stride, 2) float32 I/Q (complex compute is
    unsupported on the TPU runtime). Local input groups 0..S+1 = global
    groups sS-2..sS+S-1; output group G = sS-1+j (j in [0, S)) uses
    locals j, j+1, j+2 — the same matmuls, against the same
    globally-aligned groups, as the offline path."""
    gi, go = 128 * q, 128 * p
    xg = block2.T.reshape(2, S + 2, gi)
    ap, a0, an = (jnp.asarray(m) for m in _group_matrices(p, q, t))
    hi = jax.lax.Precision.HIGHEST
    prev = xg[:, 0:S].reshape(2 * S, gi)
    cur = xg[:, 1:S + 1].reshape(2 * S, gi)
    nxt = xg[:, 2:S + 2].reshape(2 * S, gi)
    y = (jnp.matmul(prev, ap, precision=hi) +
         jnp.matmul(cur, a0, precision=hi) +
         jnp.matmul(nxt, an, precision=hi))
    return y.reshape(2, S * go)


@functools.lru_cache(maxsize=None)
def _group_matrices(p: int, q: int, taps_per_phase: int):
    """Three (128q, 128p) block-Toeplitz matrices (prev, cur, next).

    The rational resample is linear and periodic: output n and n + 128p
    use the same coefficients against inputs shifted by 128q, so outputs
    come in groups of 128p computed from three consecutive 128q input
    groups: y_grp[G] = x_grp[G-1] @ A_prev + x_grp[G] @ A_cur +
    x_grp[G+1] @ A_next. That turns the whole filter into dense matmuls
    on the MXU — the only fast form of this computation on TPU (gathers,
    strided slices, transposes, and tiny-channel convs all measured
    10-1000x slower; see scripts/tpu_resample_*_probe.py)."""
    bank = _polyphase_bank(p, q, taps_per_phase)
    t = bank.shape[1]          # effective taps per phase (see _resample_cols)
    gi, go = 128 * q, 128 * p
    mats = [np.zeros((gi, go), np.float32) for _ in range(3)]
    for nl in range(go):
        b = (nl * q) // p + t // 2
        ph = (nl * q) % p
        for k in range(t):
            i = b - k + gi            # position in [prev | cur | next]
            assert 0 <= i < 3 * gi
            mats[i // gi][i % gi, nl] = bank[ph, k]
    return tuple(mats)


# matrices cost 3 * 128^2 * p * q * 4 bytes; beyond this use the slice form
_GROUP_PQ_CAP = 256


def resample_groups_halo(xc: jax.Array, p: int, q: int,
                         taps_per_phase: int = 12) -> jax.Array:
    """Group-matmul resample with REAL neighbor halos.

    xc: (C, gi + N + gi) planar, where N is a multiple of gi = 128q and
    the first/last gi samples are the neighboring shards' edge groups
    (zeros at the stream boundary — the same edge rule `resample` uses).
    Returns (C, N*p//q). This is the shard-local kernel of the fused
    sharded resample+demod pipeline (airmodes/dist/sharded.py): output
    group G needs input groups G-1 and G+1, so shards exchange exactly
    one 128q-sample group in each direction."""
    c, n_tot = xc.shape
    gi, go = 128 * q, 128 * p
    n_in = n_tot - 2 * gi
    assert n_in % gi == 0, (n_in, gi)
    ng = n_in // gi
    xg = xc.reshape(c, ng + 2, gi)
    ap, a0, an = (jnp.asarray(m) for m in
                  _group_matrices(p, q, taps_per_phase))
    hi = jax.lax.Precision.HIGHEST
    prev = xg[:, 0:ng].reshape(c * ng, gi)
    cur = xg[:, 1:ng + 1].reshape(c * ng, gi)
    nxt = xg[:, 2:ng + 2].reshape(c * ng, gi)
    y = (jnp.matmul(prev, ap, precision=hi) +
         jnp.matmul(cur, a0, precision=hi) +
         jnp.matmul(nxt, an, precision=hi))
    return y.reshape(c, ng * go)


def _resample_groups(xc: jax.Array, p: int, q: int,
                     taps_per_phase: int) -> jax.Array:
    """(C, N) planar -> (C, floor(N*p/q)) via the group matmuls.

    Zero-pads one input group on each side (edge semantics: out-of-range
    taps read zeros). HIGHEST precision: TPU's default f32 matmul
    truncates operands to bf16."""
    c, n_in = xc.shape
    n_out = (n_in * p) // q
    gi, go = 128 * q, 128 * p
    ng = -(-n_out // go)
    back = (ng + 1) * gi - n_in
    assert back >= 0
    xp = jnp.pad(xc, ((0, 0), (gi, back)))
    return resample_groups_halo(
        xp, p, q, taps_per_phase)[:, :n_out]


def _deint_matrix() -> np.ndarray:
    """(128, 128) permutation: interleaved IQIQ lanes -> [64 I | 64 Q]."""
    d = np.zeros((128, 128), np.float32)
    for j in range(64):
        d[2 * j, j] = 1.0
        d[2 * j + 1, 64 + j] = 1.0
    return d


def _to_planar(x2: jax.Array) -> jax.Array:
    """(N, 2) interleaved -> (2, N) planar via a lane-permutation matmul.

    A plain transpose — or ANY op materializing a minor-dim-2 array, pads
    included — relayouts through a 64x tile-padded buffer on TPU (32 GB
    for a 64M-sample stream); so reshape to 128 lanes FIRST and permute
    lanes on the MXU."""
    n = x2.shape[0]
    n64 = (n // 64) * 64
    xm = x2[:n64].reshape(-1, 128)
    if n64 < n:
        tail = jnp.pad(x2[n64:], ((0, 64 - (n - n64)), (0, 0)))
        xm = jnp.concatenate([xm, tail.reshape(1, 128)], axis=0)
    hi = jax.lax.Precision.HIGHEST
    xd = jnp.matmul(xm, jnp.asarray(_deint_matrix()), precision=hi)
    return jnp.stack([xd[:, :64].reshape(-1)[:n],
                      xd[:, 64:].reshape(-1)[:n]])


def _to_interleaved(yc: jax.Array) -> jax.Array:
    """(2, N) planar -> (N, 2) interleaved (inverse lane permutation)."""
    n = yc.shape[1]
    pad = (-n) % 64
    if pad:
        yc = jnp.pad(yc, ((0, 0), (0, pad)))
    y128 = jnp.concatenate([yc[0].reshape(-1, 64), yc[1].reshape(-1, 64)],
                           axis=1)
    hi = jax.lax.Precision.HIGHEST
    yi = jnp.matmul(y128, jnp.asarray(_deint_matrix().T), precision=hi)
    return yi.reshape(-1, 2)[:n]


def _resample2(x2: jax.Array, p: int, q: int, taps_per_phase: int):
    """(N, C) resample: group matmuls when the matrices are small enough
    (every practical SDR ratio), else the phase-decomposed slice form
    (fine on CPU; route huge-ratio TPU work through a CPU host step)."""
    if p * q <= _GROUP_PQ_CAP:
        if jax.default_backend() == "tpu" and x2.shape[1] == 2:
            yc = _resample_groups(_to_planar(x2), p, q, taps_per_phase)
            return _to_interleaved(yc)
        return _resample_groups(x2.T, p, q, taps_per_phase).T
    return _resample_cols(x2, p, q, taps_per_phase)


@functools.partial(jax.jit, static_argnames=("p", "q", "taps_per_phase"))
def resample_planar(xc: jax.Array, p: int, q: int,
                    taps_per_phase: int = 12) -> jax.Array:
    """(C, N) planar float32 -> (C, floor(N*p/q)) — the device-scale
    interface (no minor-dim-2 layouts anywhere)."""
    if p == q == 1:
        return xc
    if p * q <= _GROUP_PQ_CAP:
        return _resample_groups(xc, p, q, taps_per_phase)
    return _resample_cols(xc.T, p, q, taps_per_phase).T


@functools.partial(jax.jit, static_argnames=("p", "q", "taps_per_phase"))
def resample(x: jax.Array, p: int, q: int, taps_per_phase: int = 12) -> jax.Array:
    """Resample by rational p/q. Accepts float (N,), complex (N,) (CPU
    backend only — the TPU runtime has no complex compute), or float32
    (N, 2) I/Q (each component filtered)."""
    if p == q == 1:
        return x
    if jnp.iscomplexobj(x):
        xc = jnp.stack([jnp.real(x), jnp.imag(x)], axis=0)   # (2, N) planar
        if p * q <= _GROUP_PQ_CAP:
            yc = _resample_groups(xc, p, q, taps_per_phase)
        else:
            yc = _resample_cols(xc.T, p, q, taps_per_phase).T
        return (yc[0] + 1j * yc[1]).astype(x.dtype)
    if x.ndim == 2:
        if x.shape[-1] == 2:
            return _resample2(x, p, q, taps_per_phase)
        # a (2, N) planar stream (or any other 2-D layout) used to fall
        # through to the 1-D path and crash deep inside _resample_groups
        # with an unrelated unpack error — fail AT the misuse, with the
        # right API named
        raise ValueError(
            f"resample() takes 1-D complex, (N, 2) I/Q, or 1-D real "
            f"input; got shape {x.shape} — for planar (2, N) streams "
            f"use the planar/streaming entry points")
    if x.ndim != 1:
        raise ValueError(f"resample() input must be 1-D or (N, 2), got "
                         f"shape {x.shape}")
    return _resample2(x[:, None], p, q, taps_per_phase)[:, 0]


def rational_rate(in_rate: float, out_rate: float,
                  max_denominator: int = 64) -> Tuple[int, int]:
    """(p, q) with out_rate ~= in_rate * p / q (ref: arb resampler ratio)."""
    frac = Fraction(out_rate / in_rate).limit_denominator(max_denominator)
    if frac.numerator == 0:
        raise ValueError(f"cannot resample {in_rate} -> {out_rate}")
    err = abs(in_rate * frac.numerator / frac.denominator - out_rate) / out_rate
    if err > 1e-6:
        raise ValueError(
            f"{in_rate} -> {out_rate} not representable as a small rational "
            f"(best {frac}, err {err:.2e}); pick a friendlier SDR rate")
    return frac.numerator, frac.denominator


def resample_to_rate(x, in_rate: float, out_rate: float,
                     taps_per_phase: int = 12):
    """Resample a capture from in_rate to out_rate (e.g. 2.4 Msps -> 2 Msps)."""
    p, q = rational_rate(in_rate, out_rate)
    return resample(x, p, q, taps_per_phase)


class streaming_resampler:
    """Stateful chunked resampler for live sources (ref: the reference's
    stream-graph filter block, which keeps FIR history between work() calls).

    push(chunk) consumes arbitrary-length complex64 chunks and returns the
    resampled samples whose inputs are fully available; history carries
    across calls. Strides are whole 128q-sample input groups aligned with
    the offline `resample`'s groups, and the kernel is the SAME three
    block-Toeplitz matmuls against the same group values — concatenated
    streaming output equals the offline resample of the concatenated input
    from sample 0 (to 1 ULP: XLA reassociates the matmul contraction
    differently for different batch shapes); the tail appears after
    flush().

    `delay_out` = 128p: the final output group of a stride needs the next
    stride's first input group, so outputs lag by one group.
    """

    def __init__(self, p: int, q: int, taps_per_phase: int = 12,
                 stride_blocks: int = 2048):
        if p * q > _GROUP_PQ_CAP:
            raise ValueError(
                f"p/q={p}/{q}: group matrices would be "
                f"{3 * 128 * 128 * p * q * 4 / 1e6:.0f} MB — pick a "
                "friendlier rate ratio (rational_rate with a smaller "
                "max_denominator) or resample offline")
        self.p, self.q, self.t = int(p), int(q), int(taps_per_phase)
        gi, go = 128 * self.q, 128 * self.p
        self.s_groups = max(2, (stride_blocks * self.q) // gi)
        self.stride = self.s_groups * gi          # input samples per step
        self.n_out = self.s_groups * go
        self.delay_out = go
        self.hist = 2 * gi
        self._kernel = lambda block2: _streaming_kernel(
            block2, self.p, self.q, self.t, self.s_groups)
        self._reset()

    def _reset(self):
        # list-of-parts pending buffer: concatenating per push() is
        # O(buffered) per chunk — the same write-amplification pattern
        # r4 fixed in PodPipeline.run_stream (~stride/(2*chunk) x extra
        # copying for UDP-sized chunks)
        self._pending_parts: list = []
        self._pending_n = 0
        self._left = np.zeros(self.hist, np.complex64)
        self._stride_idx = 0
        self._n_in = 0                            # real samples pushed
        self._n_emitted = 0                       # samples returned so far

    def push(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.complex64)
        self._n_in += len(x)
        if len(x):
            self._pending_parts.append(x)
            self._pending_n += len(x)
        if self._pending_n < self.stride:
            return np.zeros(0, np.complex64)
        buf = (self._pending_parts[0] if len(self._pending_parts) == 1
               else np.concatenate(self._pending_parts))
        outs = []
        off = 0
        while len(buf) - off >= self.stride:
            chunk = buf[off: off + self.stride]
            off += self.stride
            block = np.ascontiguousarray(
                np.concatenate([self._left, chunk]))
            block2 = block.view(np.float32).reshape(-1, 2)
            y2 = np.asarray(self._kernel(block2))
            y = (y2[0] + 1j * y2[1]).astype(np.complex64)
            if self._stride_idx == 0:
                y = y[self.delay_out:]  # output group -1 is pre-stream
            outs.append(y)
            self._left = chunk[-self.hist:]
            self._stride_idx += 1
        rem = buf[off:]
        self._pending_parts = [rem] if len(rem) else []
        self._pending_n = len(rem)
        y = np.concatenate(outs)
        self._n_emitted += len(y)
        return y

    def flush(self) -> np.ndarray:
        """End the stream: emit exactly the remaining output samples.

        Zero-pads a full extra stride beyond the boundary (the last group
        holding real data needs its NEXT input group as matmul lookahead)
        and trims the result so total emitted == floor(n_pushed * p / q) —
        concatenated streaming output equals the offline resample of the
        concatenated input, sample for sample. Resets to a fresh stream
        afterwards, so a second flush() returns nothing."""
        target = (self._n_in * self.p) // self.q - self._n_emitted
        if target <= 0:
            self._reset()
            return np.zeros(0, np.complex64)
        pad = 2 * self.stride - self._pending_n
        n_real = self._n_in
        y = self.push(np.zeros(pad, np.complex64))[:target]
        assert len(y) == target, (len(y), target, n_real)
        self._reset()
        return y

"""Polyphase FIR rational resampler (ref: the gr-air-modes front-end filter).

The reference inserts a pfb_arb_resampler / low-pass front-end when the SDR
rate is not an integer multiple of 2 Msps (python/radio.py source setup,
SURVEY.md §2.1 supporting pieces). Here that becomes a TPU-friendly
gather + multiply-reduce formulation of the classic P/Q polyphase structure:

    y[n] = sum_k h[k*P + (n*Q mod P)] * x[floor(n*Q/P) - k]

All output samples are computed in one batched step: a (N_out, taps) window
gather plus an elementwise product with the per-output subfilter and a lane
reduction — no serial loops, static shapes, vectorizes on the VPU. (A plain
XLA convolution would work on TPU but compiles pathologically on XLA CPU,
which the test mesh uses.)
"""

from __future__ import annotations

import functools
import math
from fractions import Fraction
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def design_lowpass(num_taps: int, cutoff: float, beta: float = 8.6) -> np.ndarray:
    """Kaiser-windowed sinc low-pass; cutoff in (0, 1] of Nyquist."""
    n = np.arange(num_taps) - (num_taps - 1) / 2
    h = np.sinc(cutoff * n) * cutoff
    h *= np.kaiser(num_taps, beta)
    return (h / h.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _polyphase_bank(p: int, q: int, taps_per_phase: int) -> np.ndarray:
    """(p, taps_per_phase) filter bank for interpolate-by-p/decimate-by-q.

    Prototype low-pass cutoff = 1/max(p, q) of the upsampled Nyquist, gain p
    (to compensate zero-stuffing).
    """
    num_taps = p * taps_per_phase
    h = design_lowpass(num_taps, cutoff=1.0 / max(p, q)) * p
    return h.reshape(taps_per_phase, p).T.copy()  # [phase, tap]


def _resample_1d(x: jax.Array, p: int, q: int, taps_per_phase: int) -> jax.Array:
    """Rational-resample one float channel; output length floor(len*p/q)."""
    n_in = x.shape[0]
    n_out = (n_in * p) // q
    bank = jnp.asarray(_polyphase_bank(p, q, taps_per_phase))  # (p, T)
    t = taps_per_phase

    n = jnp.arange(n_out, dtype=jnp.int32)
    nq = n * q
    base = nq // p                       # input anchor per output sample
    phase = nq - base * p                # n*q mod p
    # group delay centering: shift anchors by half the subfilter span
    base = base + (t // 2)
    k = jnp.arange(t, dtype=jnp.int32)
    idx = base[:, None] - k[None, :]     # (n_out, T)
    idx = jnp.clip(idx, 0, n_in - 1)
    windows = x[idx]                     # gather (n_out, T)
    coeffs = bank[phase]                 # gather (n_out, T)
    return jnp.sum(windows * coeffs, axis=-1)


@functools.partial(jax.jit, static_argnames=("p", "q", "taps_per_phase"))
def resample(x: jax.Array, p: int, q: int, taps_per_phase: int = 12) -> jax.Array:
    """Resample by rational p/q. Accepts float (N,), complex (N,), or the
    TPU-native float32 (N, 2) I/Q layout (each component filtered)."""
    if p == q == 1:
        return x
    if jnp.iscomplexobj(x):
        re = _resample_1d(jnp.real(x), p, q, taps_per_phase)
        im = _resample_1d(jnp.imag(x), p, q, taps_per_phase)
        return (re + 1j * im).astype(x.dtype)
    if x.ndim == 2 and x.shape[-1] == 2:
        return jnp.stack(
            [_resample_1d(x[:, 0], p, q, taps_per_phase),
             _resample_1d(x[:, 1], p, q, taps_per_phase)], axis=-1)
    return _resample_1d(x, p, q, taps_per_phase)


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
    resampled samples whose full filter window is available; filter history
    carries across calls, so concatenated outputs equal the offline
    `resample` of the concatenated input (after the fixed group-delay
    offset `self.delay_out` and away from the final tail).

    Internally processes fixed input strides (multiple of q) through one
    jitted fixed-shape kernel — no per-chunk recompiles.
    """

    def __init__(self, p: int, q: int, taps_per_phase: int = 12,
                 stride_blocks: int = 2048):
        self.p, self.q, self.t = int(p), int(q), int(taps_per_phase)
        self.stride = stride_blocks * self.q      # input samples per step
        self.n_out = self.stride * self.p // self.q
        # output-domain delay: outputs lag inputs by ~t/2 input samples
        # (rounded up so a stride's last output never needs future samples)
        self.delay_out = -(-((self.t // 2) + 1) * self.p // self.q) + 1
        self.hist = self.t + (self.delay_out * self.q) // self.p + 2
        self._pending = np.zeros(0, np.complex64)
        self._left = np.zeros(self.hist, np.complex64)
        self._stride_idx = 0
        self._kernel = jax.jit(self._make_kernel())

    def _make_kernel(self):
        p, q, t, hist, n_out = self.p, self.q, self.t, self.hist, self.n_out
        delay = self.delay_out
        bank_np = _polyphase_bank(p, q, t)

        def kernel(block, n0):
            # block: (hist + stride,) complex; n0: first global output index
            bank = jnp.asarray(bank_np)
            n = n0 + jnp.arange(n_out, dtype=jnp.int32)
            nq = n * q
            base = nq // p + (t // 2)
            phase = nq - (nq // p) * p
            k = jnp.arange(t, dtype=jnp.int32)
            # global input index -> local: subtract stride start, add hist
            g0 = ((n0 + delay) * q) // p  # global input index of stride start
            idx = base[:, None] - k[None, :] - g0 + hist
            idx = jnp.clip(idx, 0, block.shape[0] - 1)
            w = block[idx]
            c = bank[phase]
            return jnp.sum(jnp.real(w) * c, axis=-1) + \
                1j * jnp.sum(jnp.imag(w) * c, axis=-1)

        return kernel

    def push(self, x: np.ndarray) -> np.ndarray:
        self._pending = np.concatenate(
            [self._pending, np.asarray(x, np.complex64)])
        outs = []
        while len(self._pending) >= self.stride:
            chunk = self._pending[: self.stride]
            self._pending = self._pending[self.stride:]
            block = np.concatenate([self._left, chunk])
            n0 = self._stride_idx * self.n_out - self.delay_out
            y = np.asarray(self._kernel(block, np.int32(n0)))
            if self._stride_idx == 0:
                y = y[self.delay_out:]  # drop pre-stream outputs
            outs.append(y.astype(np.complex64))
            self._left = chunk[-self.hist:]
            self._stride_idx += 1
        if outs:
            return np.concatenate(outs)
        return np.zeros(0, np.complex64)

    def flush(self) -> np.ndarray:
        """Zero-pad the tail and emit the remaining outputs."""
        if len(self._pending) == 0 and self._stride_idx == 0:
            return np.zeros(0, np.complex64)
        pad = self.stride - len(self._pending)
        return self.push(np.zeros(pad, np.complex64))

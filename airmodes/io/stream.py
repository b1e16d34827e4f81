"""Pipelined host<->device streaming runner (SURVEY.md §7 hard part 4).

Keeps the chip busy: while block i computes on device, block i+1's transfer
is already dispatched and block i-1's packed table is being fetched/decoded
on host. JAX's async dispatch does the overlap; this runner just keeps a
bounded number of steps in flight and funnels results through the host
decode path in order.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from ..config import DspConfig
from ..dsp import host as host_mod
from ..dsp.pipeline import iq_to_device_layout, unpack_table


def _pallas_ok(cfg: DspConfig) -> bool:
    """Whether the planar Pallas path supports this cfg — resolved from
    the kernels' OWN predicate (supported_planar_tile) so this gate can
    never drift from the constraints it mirrors (r4 review: a
    hand-copied inline version re-implemented noise_window/alignment
    rules here)."""
    from ..kernels.preamble_pallas import supported_planar_tile
    return supported_planar_tile(cfg) is not None


def _default_step(cfg: DspConfig):
    """Pick the fastest available packed demod step for this backend.

    No silent fallback past the gate: if the kernels module is broken,
    raising an ImportError here beats an order-of-magnitude quiet
    throughput regression (r4 review)."""
    import jax
    from ..dsp.pipeline import demod_block_packed_jit
    if jax.default_backend() == "tpu":
        from ..kernels.preamble_pallas import (demod_block_packed_fast_jit,
                                               supported_2d_tile)
        tile = supported_2d_tile(cfg)
        if tile is not None:
            return lambda x, cfg: demod_block_packed_fast_jit(x, cfg,
                                                              tile=tile)
    return demod_block_packed_jit


def _batch_step(cfg: DspConfig):
    """Fastest available BATCHED (leading-axis) packed demod step."""
    import jax
    if jax.default_backend() == "tpu" and _pallas_ok(cfg):
        from ..kernels.preamble_pallas import (
            demod_batch_packed_fast_jit, demod_batch_packed_planar_jit,
            supported_2d_tile, to_planar_i8)
        # the planar int8 kernel tiles down to 4096 (default_tile); the
        # f32 2D kernel has its own tile chain — resolve it from the
        # kernels' own support predicate so the gate can never admit a
        # cfg the kernel then rejects (r4 review: a fixed 16384 did)
        f32_tile = supported_2d_tile(cfg)

        def step(xb, cfg):
            if xb.dtype == np.int8:
                # planar split on host (overlapped with device compute
                # by the in-flight window) -> traffic-minimal kernel
                xi, xq = to_planar_i8(xb, cfg)
                return demod_batch_packed_planar_jit(xi, xq, cfg)
            if f32_tile is not None:
                return demod_batch_packed_fast_jit(xb, cfg, tile=f32_tile)
            return _xla_batch_step(xb, cfg)
        return step
    return _xla_batch_step


def _xla_batch_step_impl():
    import functools
    import jax
    from ..dsp.pipeline import demod_block, pack_table

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step(xb, cfg):
        return jax.vmap(lambda x: pack_table(demod_block(x, cfg)))(xb)
    return step


_xla_batch_cache = None


def _xla_batch_step(xb, cfg):
    """Module-level XLA fallback: ONE jit wrapper for the process (a
    fresh wrapper per _batch_step() call re-traced and recompiled the
    identical program on every runner construction — r4 review)."""
    global _xla_batch_cache
    if _xla_batch_cache is None:
        _xla_batch_cache = _xla_batch_step_impl()
    return _xla_batch_cache(xb, cfg)


def _dev_layout(block, quantize_i8: bool):
    """(device array, full_scale): quantization applies a per-block gain
    of 120/peak and the kernels rescale int8 by 1/127, so the measured
    ref_level is (gain/127)^2 times the float power — full_scale carries
    that factor to table_to_messages so reported dBFS stays referenced
    to the ORIGINAL float full scale, consistent across blocks (the
    native C++ AGC path, iqstream.cc, applies the identical rule)."""
    x = iq_to_device_layout(block)
    fs = 1.0
    if quantize_i8 and x.dtype == np.float32:
        # finite-only peak: one corrupt Inf sample (random wire bytes
        # with exponent 0xFF) otherwise drives gain to 0 and the WHOLE
        # block quantizes to silence with no error (r5 review; the
        # native AGC framer guards identically)
        ax = np.abs(x)
        peak = float(np.max(ax, initial=0.0, where=np.isfinite(ax))) or 1.0
        gain = 120.0 / peak
        # the ONE quantization rule (dsp/host.py) — an inline copy here
        # could silently drift from the native/pod paths' dBFS reference
        x = host_mod.quantize_i8_np(x, gain)
        fs = gain / 127.0
    return x, fs


def _planar_f32(w: np.ndarray) -> np.ndarray:
    """complex64 (W,) window -> PLANAR (2, W) f32 — the fused resample
    path's input layout (an interleaved minor-dim-2 device array reads
    ~15x slower on TPU through a tile-padded relayout; two host strided
    copies are far cheaper — r5 stage probe)."""
    return np.stack([w.real, w.imag])


def _make_drain(cfg, epoch, stats, on_messages, batched: bool):
    """Entry drainer shared by the pipelined runners: entry =
    (dispatched packed table, starts, full_scales, n_real) -> per-block
    wire-message lists (padding rows beyond n_real dropped)."""
    def drain(entry):
        packed, starts, scales, n_real = entry
        arr = np.asarray(packed)
        out = []
        for j in range(n_real):
            table = unpack_table(arr[j] if batched else arr)
            msgs = host_mod.table_to_messages(
                table, starts[j], cfg.channel_rate, epoch=epoch,
                stats=stats, full_scale=scales[j])
            if on_messages:
                on_messages(msgs)
            out.append(msgs)
        return out
    return drain


def _pump(items, batch: int, depth: int, dispatch, drain):
    """Shared batching pump (one copy of the fill/pad/inflight logic —
    two hand-kept copies of exactly this code diverged in r4):
    group `batch` items per dispatch(group) (a trailing partial group is
    the dispatcher's to pad; its entry carries n_real so the drain drops
    padding), keep `depth` dispatched entries in flight, drain in order."""
    inflight: deque = deque()
    acc: List = []
    for item in items:
        acc.append(item)
        if len(acc) == batch:
            inflight.append(dispatch(acc))
            acc = []
            if len(inflight) > depth:
                yield from drain(inflight.popleft())
    if acc:
        inflight.append(dispatch(acc))
    while inflight:
        yield from drain(inflight.popleft())


def run_pipelined(
    blocks: Iterable[Tuple[np.ndarray, int]],
    cfg: DspConfig,
    *,
    epoch: float = 0.0,
    stats: Optional[host_mod.BlockStats] = None,
    depth: int = 2,
    step=None,
    quantize_i8: bool = False,
    batch: int = 1,
    on_messages: Optional[Callable[[List[str]], None]] = None,
) -> Iterator[List[str]]:
    """Drive framed blocks through the demod with `depth` steps in flight.

    batch > 1 stacks that many blocks per device call (amortizing per-call
    transfer and small-op overheads; requires the Pallas batched kernel or
    the vmapped XLA path). Yields the wire-message list per block, in
    stream order; a trailing partial batch is padded with the last block
    and the padding's messages dropped.
    """
    if batch > 1 and step is None:
        step = _batch_step(cfg)
    step = step or _default_step(cfg)

    def to_dev_layout(block):
        return _dev_layout(block, quantize_i8)

    drain = _make_drain(cfg, epoch, stats, on_messages, batched=batch > 1)

    if batch == 1:
        def dispatch1(acc):
            (block, start), = acc
            x, fs = to_dev_layout(block)
            return (step(x, cfg), [start], [fs], 1)
        yield from _pump(blocks, 1, depth, dispatch1, drain)
        return

    def dispatch(acc):
        # pad a partial batch with the last block's ALREADY-converted
        # form: a separate to_dev_layout(acc[-1]) call re-scanned +
        # re-quantized the full block a second time (r4 review)
        devs = [to_dev_layout(b) for b, _ in acc]
        devs += [devs[-1]] * (batch - len(acc))
        xb = np.stack([d for d, _ in devs])
        return (step(xb, cfg), [s for _, s in acc],
                [f for _, f in devs], len(acc))

    yield from _pump(blocks, batch, depth, dispatch, drain)


def run_resampled_fused(
    path: str,
    cfg: DspConfig,
    *,
    dtype: str,
    rate_in: float,
    start_sample: int = 0,
    epoch: float = 0.0,
    stats: Optional[host_mod.BlockStats] = None,
    depth: int = 2,
    batch: int = 1,
    scale: Optional[float] = None,
    max_blocks: Optional[int] = None,
    on_messages: Optional[Callable[[List[str]], None]] = None,
) -> Iterator[List[str]]:
    """Single-chip resampled product path with the PRODUCTION kernel.

    Frames the capture into RAW-rate windows (resample.fused.raw_geometry)
    and runs resample -> int8 quantize -> planar Pallas demod as ONE
    jitted program per batch (VERDICT r4 #1: the host-resample +
    demod_block route left the resampled front-end ~350x below the
    planar kernel). Per-window AGC gain (120/peak, or `scale` fixed)
    ships as a traced vector, so one compile covers every block.
    Yields the wire-message list per block, in stream order.
    (Ref: the reference's resampler insertion, python/radio.py:~150.)
    """
    import jax
    from ..resample.fused import raw_geometry, resample_demod_packed_planar_jit
    from ..resample.polyphase import rational_rate
    from ..io import sources as src_mod

    import itertools

    p_up, q_dn = rational_rate(rate_in, cfg.channel_rate)
    raw_left, raw_block, raw_right = raw_geometry(cfg, p_up, q_dn)[:3]
    interpret = jax.default_backend() != "tpu"
    req_start = start_sample
    if start_sample % p_up:
        # the raw-domain equivalent of start_sample must be an integer
        # raw sample: flooring a fractional seek shifts the resampler
        # grid sub-sample vs the reported counters (~83 ns of permanent
        # timestamp skew at 4 Msps — poison for the ns-grade mlat wire).
        # Snap DOWN to the nearest aligned resume point; messages whose
        # preamble precedes the REQUESTED start are filtered below, so
        # resume semantics stay exact for the caller.
        start_sample -= start_sample % p_up
    in_skip = start_sample * q_dn // p_up
    # framer counts RAW samples from the seek point (start 0); dispatch
    # converts k*raw_block -> start_sample + k*block (channel rate)
    framer = src_mod.buffered_framer(
        cfg, start_sample=0, geometry=(raw_left, raw_block, raw_right))

    def windows():
        for chunk in src_mod.raw_file_chunks(path, dtype=dtype,
                                             chunk_samples=1 << 22,
                                             offset_samples=in_skip):
            yield from framer.push(chunk)
        yield from framer.flush()

    def dispatch(acc):
        n_real = len(acc)
        acc = acc + [acc[-1]] * (batch - n_real)   # pad a partial batch;
        # PLANAR (B, 2, W) f32: a minor-dim-2 (W, 2) device array reads
        # ~15x slower through a tile-padded relayout (r5 stage probe)
        x = np.stack([_planar_f32(w) for w, _ in acc])
        # scale=None -> per-channel device AGC AFTER resampling (the
        # raw-window host peak underestimates resample overshoot and
        # quantize clipped the strongest pulses — r5 review)
        gain = None if scale is None else np.float32(scale)
        out = resample_demod_packed_planar_jit(x, gain, cfg, p_up, q_dn,
                                               interpret=interpret)
        return (out, [start_sample + s * p_up // q_dn for _, s in acc],
                n_real)

    yield from _pump(itertools.islice(windows(), max_blocks), batch, depth,
                     dispatch,
                     _make_fused_drain(cfg, epoch, stats, on_messages,
                                       req_start))


def _make_fused_drain(cfg, epoch, stats, on_messages, req_start: int):
    """Drainer for the fused runners: the packed table AND the device-AGC
    gains come back from the same program; messages before the REQUESTED
    resume point (possible only in a snapped first window) are dropped."""
    epoch_ns = int(round(epoch * 1e9))
    irate = int(cfg.channel_rate)

    def _sample_of(m: str) -> int:
        # recover the message's global sample index from the wire's
        # int64-ns field, EPOCH-RELATIVE: the old `t * rate` form used
        # the epoch-anchored float seconds field, so any nonzero epoch
        # (the CLI always passes one) made every message pass the
        # resume filter — and at epoch ~1.7e9 the product sits near
        # 2^53 anyway (r5 review). ns = epoch_ns + samples*1e9//rate,
        # so rounding (ns-epoch_ns)*rate/1e9 recovers samples exactly
        # for any integral rate < 1 GHz.
        ns = int(m.split()[6])
        return ((ns - epoch_ns) * irate + 500_000_000) // 1_000_000_000

    def drain(entry):
        (packed, gains), starts, n_real = entry
        arr = np.asarray(packed)
        gs = np.asarray(gains)
        out = []
        for j in range(n_real):
            table = unpack_table(arr[j])
            msgs = host_mod.table_to_messages(
                table, starts[j], cfg.channel_rate, epoch=epoch,
                stats=stats, full_scale=float(gs[j]) / 127.0)
            if starts[j] < req_start:
                msgs = [m for m in msgs if _sample_of(m) >= req_start]
            if on_messages:
                on_messages(msgs)
            out.append(msgs)
        return out
    return drain


def run_resampled_fused_channels(
    paths,
    cfg: DspConfig,
    *,
    dtype: str,
    rate_in: float,
    start_sample: int = 0,
    epoch: float = 0.0,
    stats: Optional[host_mod.BlockStats] = None,
    depth: int = 2,
    scale: Optional[float] = None,
    max_blocks: Optional[int] = None,
) -> Iterator[List[Optional[List[str]]]]:
    """Multi-channel twin of run_resampled_fused: C raw-rate captures,
    ONE batched fused device call (resample -> int8 quantize -> planar
    Pallas demod) per step — the "channel" data-parallel axis of
    run_channels, now for resampled sources too. Yields one
    List[Optional[List[str]]] per step; ended channels ride along as
    silence and yield None (same contract as run_channels)."""
    import itertools
    import jax
    from ..resample.fused import (raw_geometry,
                                  resample_demod_packed_planar_jit)
    from ..resample.polyphase import rational_rate
    from ..io import sources as src_mod

    p_up, q_dn = rational_rate(rate_in, cfg.channel_rate)
    raw_left, raw_block, raw_right = raw_geometry(cfg, p_up, q_dn)[:3]
    interpret = jax.default_backend() != "tpu"
    req_start = start_sample
    if start_sample % p_up:
        start_sample -= start_sample % p_up   # raw-integer resume point
        # (see run_resampled_fused: flooring a fractional raw seek skews
        # every timestamp of the resumed stream; pre-req_start messages
        # are filtered in the drain)
    in_skip = start_sample * q_dn // p_up

    def windows(path):
        framer = src_mod.buffered_framer(
            cfg, start_sample=0,
            geometry=(raw_left, raw_block, raw_right))

        def gen():
            for chunk in src_mod.raw_file_chunks(path, dtype=dtype,
                                                 chunk_samples=1 << 22,
                                                 offset_samples=in_skip):
                yield from framer.push(chunk)
            yield from framer.flush()
        return itertools.islice(gen(), max_blocks)

    iters = [iter(windows(p)) for p in paths]
    C = len(iters)
    if C == 0:
        return
    zero_win = np.zeros((2, raw_left + raw_block + raw_right), np.float32)
    inflight: deque = deque()
    fused_drain = _make_fused_drain(cfg, epoch, stats, None, req_start)

    def drain_one() -> List[Optional[List[str]]]:
        entry, live = inflight.popleft()
        msgs = fused_drain(entry)
        return [msgs[c] if live[c] else None for c in range(C)]

    while True:
        items = [next(it, None) for it in iters]
        live = [i is not None for i in items]
        if not any(live):
            break
        rows = [_planar_f32(items[c][0]) if live[c] else zero_win
                for c in range(C)]
        x = np.stack(rows)
        gain = None if scale is None else np.float32(scale)
        starts = [start_sample + (items[c][1] * p_up // q_dn if live[c]
                                  else 0) for c in range(C)]
        out = resample_demod_packed_planar_jit(x, gain, cfg, p_up, q_dn,
                                               interpret=interpret)
        inflight.append(((out, starts, C), live))
        if len(inflight) > depth:
            yield drain_one()
    while inflight:
        yield drain_one()


def run_channels(
    channel_blocks: List[Iterable[Tuple[np.ndarray, int]]],
    cfg: DspConfig,
    *,
    epoch: float = 0.0,
    stats: Optional[host_mod.BlockStats] = None,
    depth: int = 2,
    step=None,
    quantize_i8: bool = False,
) -> Iterator[List[Optional[List[str]]]]:
    """Concurrent multi-channel demod: C independent framed block iterators
    (one per SDR channel / capture) batched down the leading axis of ONE
    device call per time step — the single-chip realization of the mesh's
    "channel" data-parallel axis (SURVEY.md §2.7; BASELINE config 4's
    multi-channel batch). Yields one List[Optional[List[str]]] per step:
    entry c is channel c's wire messages, timestamped by that channel's
    own sample counter. Channels may end at different times; ended
    channels ride along as silence until all end, yielding None
    (distinct from a live channel's empty message list, so callers can
    account throughput by live channels only)."""
    C = len(channel_blocks)
    if C == 0:
        return
    iters = [iter(cb) for cb in channel_blocks]
    step = step or _batch_step(cfg)
    inflight: deque = deque()
    # converted silence for ended channels, built lazily PER LIVE DTYPE:
    # a complex64 zero block stacked against live int8 blocks would
    # upcast the whole batch to float32 — silently dropping the planar
    # int8 kernel and breaking the 1/127 dBFS rescale for every channel
    zero_dev: dict = {}

    def to_dev_layout(block):
        return _dev_layout(block, quantize_i8)

    def drain_one() -> List[Optional[List[str]]]:
        packed, starts, scales, live = inflight.popleft()
        arr = np.asarray(packed)
        out: List[Optional[List[str]]] = []
        for c in range(C):
            if not live[c]:
                out.append(None)
                continue
            table = unpack_table(arr[c])
            out.append(host_mod.table_to_messages(
                table, starts[c], cfg.channel_rate, epoch=epoch,
                stats=stats, full_scale=scales[c]))
        return out

    while True:
        items = [next(it, None) for it in iters]
        live = [it is not None for it in items]
        if not any(live):
            break
        devs: List = [None] * C
        for c in range(C):
            if live[c]:
                devs[c] = to_dev_layout(items[c][0])
        ref = next(d for d in devs if d is not None)
        dtypes = {d[0].dtype for d in devs if d is not None}
        if len(dtypes) > 1:
            # np.stack would silently UPCAST (int8+int16 -> int16,
            # int8+f32 -> f32), breaking the per-dtype 1/127 or 1/32767
            # full-scale accounting and dropping the planar kernel for
            # every channel — a misconfiguration, fail loudly
            raise ValueError(
                f"run_channels: mixed live-channel dtypes {dtypes}; "
                "give every channel the same sample format/quantization")
        zkey = ref[0].dtype
        if zkey not in zero_dev:
            zero_dev[zkey] = (np.zeros_like(ref[0]), 1.0)
        for c in range(C):
            if devs[c] is None:
                devs[c] = zero_dev[zkey]
        xb = np.stack([d for d, _ in devs])
        starts = [items[c][1] if live[c] else 0 for c in range(C)]
        inflight.append((step(xb, cfg), starts,
                         [f for _, f in devs], live))
        if len(inflight) > depth:
            yield drain_one()
    while inflight:
        yield drain_one()

"""Native-runtime product pipeline: C++ IQ framing -> planar int8 demod.

This is the default `modes_rx` driver for file/UDP sample sources when the
native toolchain is present (VERDICT r2 #2: the product path must reach the
measured transport ceiling). It removes every per-block host cost that the
pure-Python path serializes on the dispatch thread:

- file read + SDR wire-format conversion run in the C++ pump thread
  (native/iqstream.cc), filling a lock-free SPSC ring;
- overlap-save framing + per-block AGC (gain = 120/peak, the Python
  quantize_i8 rule) + int8 quantize + planar I/Q split happen in ONE
  fused C++ pass (`iq_stream_next_block_planar_agc`; `--i8-scale` picks
  the fixed-gain `..._planar_i8` variant) on a FEEDER thread — no
  float32 (N, 2) intermediate, no numpy quantize, no to_planar_i8 copy;
- device dispatch runs on its own thread with a bounded in-flight
  queue, so the H2D transfer of batch i+1 overlaps the caller's decode of
  batch i (unpack + wire formatting + parse + plugins all stay on the
  caller's thread, off the dispatch path).

Yields the same per-block wire-message lists as io.stream.run_pipelined,
in stream order (ref: GR top-block streaming role, python/radio.py:~40 +
thread-per-block scheduler the native runtime replaces, SURVEY.md §2.7).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, Optional

import numpy as np

from ..config import DspConfig
from ..dsp import host as host_mod
from ..dsp.pipeline import unpack_table
from .stream import _pallas_ok

# Fixed-gain quantize: int8 = round(f32 * 127); the kernels rescale by
# 1/127, so full_scale = 127/127 = 1.0 — dBFS stays referenced to f32
# full scale. The DEFAULT path (scale=None) instead applies per-block
# AGC in C++ (gain = 120/peak over the framed block — the same rule the
# Python path's quantize_i8 uses), carrying gain/127 as full_scale.
I8_SCALE = 127.0


def native_available() -> bool:
    try:
        from ..native import load
        load()
        return True
    except Exception:
        return False


def _planar_step(cfg: DspConfig):
    """(name, step(xi, xq) -> packed (B, K+1, 9), planar length P)."""
    import jax

    if jax.default_backend() == "tpu" and _pallas_ok(cfg):
        from ..kernels.preamble_pallas import (
            demod_batch_packed_planar_jit, planar_length)
        return ("pallas-planar-i8",
                lambda xi, xq: demod_batch_packed_planar_jit(xi, xq, cfg),
                planar_length(cfg))

    # XLA fallback (CPU tests / odd cfgs): rebuild (B, T, 2) int8 in-jit
    import functools
    import jax.numpy as jnp
    from ..dsp.pipeline import demod_block, pack_table

    T = cfg.left_halo + cfg.block_size + cfg.right_halo
    P = -(-T // 128) * 128

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def step(xi, xq, cfg):
        xb = jnp.stack([xi[:, :T], xq[:, :T]], axis=-1)
        return jax.vmap(lambda x: pack_table(demod_block(x, cfg)))(xb)

    return "xla-planar-i8", (lambda xi, xq: step(xi, xq, cfg)), P


class _PlanarSource:
    """One channel's native framer producing planar int8 rows (P is the
    padded row length callers size their buffers to)."""

    def __init__(self, cfg: DspConfig, P: int, *, path: Optional[str] = None,
                 fmt: str = "complex64", udp_host: str = "0.0.0.0",
                 udp_port: int = 10000, start_sample: int = 0,
                 throttle_sps: float = 0.0,
                 ring_samples: Optional[int] = None,
                 udp_timeout_s: float = 0.0):
        # udp_timeout_s <= 0 = never time out (the C++ pump sets no
        # SO_RCVTIMEO; close() shutdown()s the socket to unblock recv)
        from ..native import IQStream
        self.stream = IQStream(cfg, ring_samples=ring_samples)
        if P < self.stream.total:
            # P previously went unused here, implying validation that
            # never happened — fail at construction instead of per-row
            # (the C side rejects short rows with rc -2, but only after
            # buffers were allocated and threads started)
            raise ValueError(f"planar row length {P} < stream row "
                             f"{self.stream.total}")
        if path is not None:
            self.stream.start_file(path, fmt=fmt,
                                   throttle_sps=throttle_sps,
                                   offset_samples=start_sample)
        else:
            self.stream.start_udp(udp_host, udp_port,
                                  timeout_s=udp_timeout_s)

    @property
    def dropped(self) -> int:
        """Cumulative samples lost to real-time ring overrun (UDP)."""
        return self.stream.dropped

    def next_row(self, out_i: np.ndarray, out_q: np.ndarray,
                 scale: Optional[float] = I8_SCALE,
                 stop=None) -> Optional[tuple]:
        """Fill one planar row pair; returns (start_sample, full_scale)
        or None at end of stream. scale=None selects per-block AGC
        (gain = 120/peak — the Python quantize_i8 semantics); a float
        fixes the gain (full_scale = scale/127). A set `stop` event ends
        the wait early (returns None) so teardown never races a live
        native call."""
        if scale is None:
            nxt = self.stream.next_block_planar_agc(out_i, out_q,
                                                    target=120.0, stop=stop)
            if nxt is None:
                return None
            start, gain = nxt
            return start, gain / 127.0
        nxt = self.stream.next_block_planar_i8(out_i, out_q, scale=scale,
                                               stop=stop)
        if nxt is None:
            return None
        return nxt, scale / 127.0

    def close(self) -> None:
        self.stream.close()


def _pipeline(produce, dispatch, depth, on_exit):
    """Generic feeder -> dispatcher -> consumer pipeline.

    produce(stop) is a generator of feed items, run on a FEEDER thread
    (the native framing/AGC/quantize passes live there); dispatch(item)
    runs on a DISPATCH thread (device calls only); the returned
    generator yields dispatch results, in order, on the caller's thread.
    Exceptions from either thread re-raise in the caller. on_exit(dead)
    runs at teardown with whether both workers have exited — freeing
    native resources under a live worker is a use-after-free, so callers
    leak them instead when a worker is still inside a long native/device
    call (it hits the closed-handle guard when it returns).
    """
    feed_q: queue.Queue = queue.Queue(maxsize=2)
    out_q: queue.Queue = queue.Queue(maxsize=max(depth, 1))
    stop = threading.Event()
    sentinel = object()

    def feeder() -> None:
        try:
            for item in produce(stop):
                feed_q.put(item)
        except BaseException as e:
            feed_q.put(e)
        finally:
            feed_q.put(sentinel)

    def dispatcher() -> None:
        try:
            while not stop.is_set():
                item = feed_q.get()
                if item is sentinel:
                    break
                if isinstance(item, BaseException):
                    raise item
                out_q.put(dispatch(item))
        except BaseException as e:  # surface in the consumer
            out_q.put(e)
        finally:
            out_q.put(sentinel)

    fth = threading.Thread(target=feeder, daemon=True,
                           name="airmodes-feeder")
    dth = threading.Thread(target=dispatcher, daemon=True,
                           name="airmodes-dispatch")
    fth.start()
    dth.start()
    try:
        while True:
            item = out_q.get()
            if item is sentinel:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        _drain_until_dead(feed_q, fth)
        try:  # wake a dispatcher whose sentinel was consumed by the drain
            feed_q.put_nowait(sentinel)
        except queue.Full:
            pass
        _drain_until_dead(out_q, dth)
        on_exit(not fth.is_alive() and not dth.is_alive())


def _drain_until_dead(out_q: queue.Queue, th: threading.Thread,
                      deadline_s: float = 10.0) -> None:
    """Unblock a worker stuck in a full-queue put (including the sentinel
    put in its finally) by draining REPEATEDLY while joining — one drain
    is not enough: the unblocked put refills the bounded queue before
    the thread reaches its stop check."""
    import time as _t
    deadline = _t.time() + deadline_s
    while th.is_alive() and _t.time() < deadline:
        try:
            out_q.get_nowait()
        except queue.Empty:
            pass
        th.join(timeout=0.05)


def run_native_pipelined(
    cfg: DspConfig,
    *,
    path: Optional[str] = None,
    fmt: str = "complex64",
    udp_host: str = "0.0.0.0",
    udp_port: int = 10000,
    start_sample: int = 0,
    throttle_sps: float = 0.0,
    epoch: float = 0.0,
    stats: Optional[host_mod.BlockStats] = None,
    batch: int = 8,
    depth: int = 2,
    max_blocks: Optional[int] = None,
    scale: Optional[float] = None,
    ring_samples: Optional[int] = None,
    udp_timeout_s: float = 0.0,
) -> Iterator[List[str]]:
    """Drive a file/UDP capture through the native runtime + planar demod.

    Generator yielding one wire-message list per owned block, in stream
    order. Native framing runs on a feeder thread, device calls on a
    dispatch thread with `depth` batches in flight; decode (table fetch
    + unpack + message formatting) runs on the caller's thread, so
    plugin fan-out never stalls the device."""
    _, step, P = _planar_step(cfg)
    src = _PlanarSource(cfg, P, path=path, fmt=fmt, udp_host=udp_host,
                        udp_port=udp_port, start_sample=start_sample,
                        throttle_sps=throttle_sps,
                        ring_samples=ring_samples,
                        udp_timeout_s=udp_timeout_s)

    def produce(stop):
        n_done = 0
        while not stop.is_set():
            if max_blocks is not None and n_done >= max_blocks:
                return
            b = batch
            if max_blocks is not None:
                b = min(b, max_blocks - n_done)
            xi = np.zeros((batch, P), np.int8)
            xq = np.zeros((batch, P), np.int8)
            rows: List[tuple] = []     # (start_sample, full_scale)
            for j in range(b):
                st = src.next_row(xi[j], xq[j], scale=scale, stop=stop)
                if st is None:
                    break
                rows.append(st)
            if stats is not None:      # overrun gauge (real-time sources)
                stats.ring_dropped = src.dropped
            if not rows:
                return
            # padding rows stay zero (silence): no detections, cheap
            yield xi, xq, rows
            n_done += len(rows)
            if len(rows) < b:
                return

    def on_exit(dead: bool) -> None:
        if dead:
            src.close()

    for packed, rows in _pipeline(
            produce, lambda it: (step(it[0], it[1]), it[2]), depth,
            on_exit):
        arr = np.asarray(packed)
        for j, (start, fs) in enumerate(rows):
            table = unpack_table(arr[j])
            yield host_mod.table_to_messages(
                table, start, cfg.channel_rate, epoch=epoch,
                stats=stats, full_scale=fs)


def run_native_channels(
    paths: List[str],
    cfg: DspConfig,
    *,
    fmt: str = "complex64",
    start_sample: int = 0,
    epoch: float = 0.0,
    stats: Optional[host_mod.BlockStats] = None,
    depth: int = 2,
    max_blocks: Optional[int] = None,
    scale: Optional[float] = None,
    ring_samples: Optional[int] = None,
) -> Iterator[List[List[str]]]:
    """Native multi-channel loop: C file captures, one batched device call
    per time step down the channel axis (mirrors io.stream.run_channels
    with the native framer + planar kernel + threaded dispatch). Ended
    channels ride along as silence until all end, yielding None per dead
    channel (a live channel with no traffic yields [])."""
    from concurrent.futures import ThreadPoolExecutor

    _, step, P = _planar_step(cfg)
    srcs = [_PlanarSource(cfg, P, path=p, fmt=fmt,
                          start_sample=start_sample,
                          ring_samples=ring_samples) for p in paths]
    C = len(srcs)

    def produce(stop):
        ended = [False] * C
        n_steps = 0
        # per-channel framing (file read + AGC + quantize + planar split)
        # is a C call that RELEASES the GIL — a pool parallelizes the C
        # channels' host work instead of serializing it on this thread
        # (within one channel rows are stateful-stream-ordered, so the
        # parallelism axis is channels, not rows)
        pool = ThreadPoolExecutor(max_workers=min(C, 8)) if C > 1 else None
        try:
            while not stop.is_set() and not all(ended):
                if max_blocks is not None and n_steps >= max_blocks:
                    return
                xi = np.zeros((C, P), np.int8)
                xq = np.zeros((C, P), np.int8)
                starts = [0] * C
                scales = [1.0] * C
                live = [False] * C

                def fill(c):
                    if ended[c]:
                        return
                    st = srcs[c].next_row(xi[c], xq[c], scale=scale,
                                          stop=stop)
                    if st is None:
                        ended[c] = True
                        xi[c] = 0
                        xq[c] = 0
                    else:
                        starts[c], scales[c] = st
                        live[c] = True

                if pool is None:
                    fill(0)
                else:
                    list(pool.map(fill, range(C)))
                if stats is not None:  # overrun gauge (real-time sources)
                    stats.ring_dropped = sum(s.dropped for s in srcs)
                if not any(live):
                    return
                yield xi, xq, starts, scales, live
                n_steps += 1
        finally:
            if pool is not None:
                # wait=True is bounded: stop is set (or the stream ended),
                # so in-flight next_row calls exit their retry loops
                # within ~1 ms — and no worker can still be inside a C
                # call when on_exit frees the native streams
                pool.shutdown(wait=True)

    def on_exit(dead: bool) -> None:
        if dead:
            for s in srcs:
                s.close()

    for packed, starts, scales, live in _pipeline(
            produce, lambda it: (step(it[0], it[1]),) + it[2:], depth,
            on_exit):
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
        yield out

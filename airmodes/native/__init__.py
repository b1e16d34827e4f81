"""ctypes binding for the native IQ streaming runtime (iqstream.cc).

Builds the shared library on first use with g++ (cached next to the source);
`airmodes.io.sources` remains the pure-Python fallback when no compiler is
available. Python<->C boundary is a C ABI — no pybind11 dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "iqstream.cc")
_LIB = os.path.join(_HERE, "libiqstream.so")

_lib = None
_lib_lock = threading.Lock()


class NativeUnavailable(RuntimeError):
    pass


def _build() -> str:
    # build to a temp path and os.replace into place: two processes
    # racing the first build must never dlopen a half-written .so
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-pthread", _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass
    return _LIB


def load() -> ctypes.CDLL:
    """Load (building if needed) the native library."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        # a prebuilt .so with no source alongside (installed package) is
        # fine — only rebuild when the source exists and is newer
        have_src = os.path.exists(_SRC)
        if not os.path.exists(_LIB) or (
                have_src and os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            if not have_src:
                raise NativeUnavailable(
                    f"no prebuilt {_LIB} and no source {_SRC} to build from")
            try:
                _build()
            except (OSError, subprocess.CalledProcessError) as e:
                raise NativeUnavailable(f"cannot build iqstream: {e}") from e
        lib = ctypes.CDLL(_LIB)
        u64, i64, f32 = ctypes.c_uint64, ctypes.c_int64, ctypes.c_float
        vp, cp, ip = ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int
        lib.iq_stream_create.restype = vp
        lib.iq_stream_create.argtypes = [u64, u64, u64, u64]
        lib.iq_stream_destroy.argtypes = [vp]
        lib.iq_stream_push_f32.restype = u64
        lib.iq_stream_push_f32.argtypes = [vp, ctypes.c_void_p, u64]
        lib.iq_stream_push_uc8.restype = u64
        lib.iq_stream_push_uc8.argtypes = [vp, ctypes.c_void_p, u64]
        lib.iq_stream_push_sc16.restype = u64
        lib.iq_stream_push_sc16.argtypes = [vp, ctypes.c_void_p, u64]
        lib.iq_stream_set_eof.argtypes = [vp]
        lib.iq_stream_dropped.restype = u64
        lib.iq_stream_dropped.argtypes = [vp]
        lib.iq_stream_rcvbuf.restype = ip
        lib.iq_stream_rcvbuf.argtypes = [vp]
        lib.iq_quantize_planar_i8.restype = None
        lib.iq_quantize_planar_i8.argtypes = [vp, vp, vp, u64, f32]
        lib.iq_stream_start_file.restype = ip
        lib.iq_stream_start_file.argtypes = [vp, cp, ip, ctypes.c_double,
                                             u64]
        lib.iq_stream_start_udp.restype = ip
        lib.iq_stream_start_udp.argtypes = [vp, cp, ip, ctypes.c_double]
        lib.iq_stream_next_block.restype = ip
        lib.iq_stream_next_block.argtypes = [vp, ctypes.c_void_p,
                                             ctypes.POINTER(i64)]
        lib.iq_stream_next_block_i8.restype = ip
        lib.iq_stream_next_block_i8.argtypes = [vp, ctypes.c_void_p,
                                                ctypes.POINTER(i64), f32]
        lib.iq_stream_next_block_planar_i8.restype = ip
        lib.iq_stream_next_block_planar_i8.argtypes = [
            vp, ctypes.c_void_p, ctypes.c_void_p, u64,
            ctypes.POINTER(i64), f32]
        lib.iq_stream_next_block_planar_agc.restype = ip
        lib.iq_stream_next_block_planar_agc.argtypes = [
            vp, ctypes.c_void_p, ctypes.c_void_p, u64,
            ctypes.POINTER(i64), f32, ctypes.POINTER(f32)]
        lib.iq_stream_available.restype = u64
        lib.iq_stream_available.argtypes = [vp]
        _lib = lib
        return lib


_FMT = {"complex64": 0, "f32": 0, "sc16": 1, "uc8": 2}


def quantize_planar_i8(iq: np.ndarray, gain: float):
    """complex64 (..., N) -> planar int8 (I, Q) arrays of the same shape,
    int8 = round(f32 * gain) clipped to +-127 (np.round half-to-even
    semantics, matching the Python quantizer bit for bit) in ONE fused
    native pass — the pod streaming driver's per-step host conversion."""
    lib = load()
    arr = np.ascontiguousarray(iq, dtype=np.complex64)
    out_i = np.empty(arr.shape, np.int8)
    out_q = np.empty(arr.shape, np.int8)
    lib.iq_quantize_planar_i8(
        arr.ctypes.data_as(ctypes.c_void_p),
        out_i.ctypes.data_as(ctypes.c_void_p),
        out_q.ctypes.data_as(ctypes.c_void_p), arr.size, float(gain))
    return out_i, out_q


class IQStream:
    """Native streaming source: ring buffer + overlap-save framer.

    Drop-in high-throughput replacement for io.sources framing; yields
    (block_f32_pairs, start_sample) like the Python framer, or int8 blocks
    via next_block_i8 for the quantized device path.
    """

    def __init__(self, cfg, ring_samples: Optional[int] = None):
        lib = load()
        self._lib = lib
        self.cfg = cfg
        self.left, self.block, self.right = (
            cfg.left_halo, cfg.block_size, cfg.right_halo)
        self.total = self.left + self.block + self.right
        if self.block < self.left:
            # the carry (previous block's tail) is read from the ring
            # slots of ONE block; block < left would index below tail
            # (uint64 wrap in C) into producer-writable slots
            raise ValueError(
                f"block_size {self.block} < left_halo {self.left}: "
                "unsupported framer geometry")
        if ring_samples is None:
            # size follows the FRAME (2 frames of pump-ahead, >= 2^22
            # floor for UDP burst absorption = 2.1 s at 2 Msps; the C
            # side's round-up to a power of two adds >= 2x headroom on
            # top): a fixed 2^24 default allocated 128 MiB of ring per
            # channel regardless of block size (1 GiB for an 8-channel
            # run) and would hang ("ring too small") past 2^24-sample
            # blocks anyway. 2x (not 4x): at the common 2^22-sample
            # block, 4x total crosses 2^24 and the round-up DOUBLES the
            # allocation the old default made.
            ring_samples = max(2 * self.total, 1 << 22)
        elif ring_samples < self.block + self.right:
            raise ValueError(
                f"ring_samples {ring_samples} < block+right_halo "
                f"{self.block + self.right}: the framer could never emit")
        self._h = lib.iq_stream_create(ring_samples, self.left, self.block,
                                       self.right)
        # guards every C call against close() from another thread: a bare
        # `while self._h` check-then-call left a use-after-free window
        # (destroy frees the Stream between the check and the call — r5
        # review). The C calls are non-blocking, so hold times are short.
        import threading as _threading
        self._lock = _threading.Lock()

    def _handle(self):
        """The open C handle, or raise — every post-close call used to
        hand NULL to C and segfault the process (r5 review)."""
        h = self._h
        if not h:
            raise RuntimeError("IQStream is closed")
        return h

    # --- producer -----------------------------------------------------------

    def push(self, iq: np.ndarray) -> int:
        """Push complex64 or float32 (N,2) samples; returns samples taken.
        Other dtypes are converted (the C side reinterprets raw bytes as
        f32 pairs — handing it, say, complex128 silently fills the ring
        with garbage)."""
        arr = np.ascontiguousarray(iq)
        if arr.dtype == np.complex64:
            arr = arr.view(np.float32)
        elif np.iscomplexobj(arr):
            arr = np.ascontiguousarray(
                arr.astype(np.complex64)).view(np.float32)
        elif arr.dtype != np.float32:
            arr = np.ascontiguousarray(arr.astype(np.float32))
        n = arr.size // 2
        with self._lock:
            return int(self._lib.iq_stream_push_f32(
                self._handle(), arr.ctypes.data_as(ctypes.c_void_p), n))

    def start_file(self, path: str, fmt: str = "complex64",
                   throttle_sps: float = 0.0,
                   offset_samples: int = 0) -> None:
        with self._lock:
            rc = self._lib.iq_stream_start_file(
                self._handle(), path.encode(), _FMT[fmt],
                float(throttle_sps), int(offset_samples))
        if rc == -5:
            raise OSError("stream already started")
        if rc != 0:
            raise OSError(f"cannot open {path}")

    def start_udp(self, host: str = "0.0.0.0", port: int = 10000,
                  timeout_s: float = 5.0) -> None:
        """timeout_s > 0 ends the stream after that much receive silence
        (parity with io.sources.udp_source)."""
        with self._lock:
            rc = self._lib.iq_stream_start_udp(self._handle(),
                                               host.encode(), port,
                                               float(timeout_s))
        if rc == -5:
            raise OSError("stream already started")
        if rc == -3:
            # the C side fails loudly on non-numeric hosts (inet_pton);
            # folding it into "cannot bind" hid the actual problem
            raise OSError(f"udp host {host!r} is not a numeric IPv4 "
                          "address (hostnames are not resolved here — "
                          "use e.g. 127.0.0.1 or 0.0.0.0)")
        if rc != 0:
            raise OSError(f"cannot bind udp {host}:{port}")

    def set_eof(self) -> None:
        with self._lock:
            if self._h:
                self._lib.iq_stream_set_eof(self._h)

    @property
    def dropped(self) -> int:
        with self._lock:
            return int(self._lib.iq_stream_dropped(self._handle()))

    @property
    def rcvbuf(self) -> int:
        """Effective UDP socket receive buffer (bytes): the kernel may
        silently clamp the requested 8 MB to net.core.rmem_max."""
        with self._lock:
            return int(self._lib.iq_stream_rcvbuf(self._handle()))

    @property
    def available(self) -> int:
        with self._lock:
            return int(self._lib.iq_stream_available(self._handle()))

    # --- consumer -----------------------------------------------------------

    def next_block(self, out: Optional[np.ndarray] = None, stop=None
                   ) -> Optional[Tuple[np.ndarray, int]]:
        """Next framed block as float32 (total, 2), or None at end of
        stream. Blocks (with a short sleep loop) until data is available;
        a set `stop` threading.Event ends the wait early (returns None) —
        without it a consumer waiting on a quiet live source could never
        be torn down safely."""
        import time as _t
        if out is None:
            out = np.empty((self.total, 2), np.float32)
        self._check_out(out, np.float32)
        start = ctypes.c_int64(0)
        while not (stop is not None and stop.is_set()):
            with self._lock:
                if not self._h:
                    return None
                rc = self._lib.iq_stream_next_block(
                    self._h, out.ctypes.data_as(ctypes.c_void_p),
                    ctypes.byref(start))
            if rc == 1:
                return out, int(start.value)
            if rc == -1:
                return None
            _t.sleep(0.001)

    def next_block_i8(self, scale: float = 127.0,
                      out: Optional[np.ndarray] = None, stop=None
                      ) -> Optional[Tuple[np.ndarray, int]]:
        import time as _t
        if out is None:
            out = np.empty((self.total, 2), np.int8)
        self._check_out(out, np.int8)
        start = ctypes.c_int64(0)
        while not (stop is not None and stop.is_set()):
            with self._lock:
                if not self._h:
                    return None
                rc = self._lib.iq_stream_next_block_i8(
                    self._h, out.ctypes.data_as(ctypes.c_void_p),
                    ctypes.byref(start), float(scale))
            if rc == 1:
                return out, int(start.value)
            if rc == -1:
                return None
            _t.sleep(0.001)

    def next_block_planar_i8(self, out_i: np.ndarray, out_q: np.ndarray,
                             scale: float = 127.0, stop=None
                             ) -> Optional[int]:
        """Fill planar int8 I and Q rows (each len >= left+block+right,
        zero-padded past the frame) in one fused native pass; returns the
        start sample, or None at end of stream. Blocks until data is
        available."""
        import time as _t
        self._check_planar_out(out_i, out_q)
        start = ctypes.c_int64(0)
        while not (stop is not None and stop.is_set()):
            with self._lock:
                if not self._h:
                    return None
                rc = self._lib.iq_stream_next_block_planar_i8(
                    self._h, out_i.ctypes.data_as(ctypes.c_void_p),
                    out_q.ctypes.data_as(ctypes.c_void_p), out_i.size,
                    ctypes.byref(start), float(scale))
            if rc == 1:
                return int(start.value)
            if rc == -1:
                return None
            if rc == -2:
                raise ValueError(
                    f"planar row too short: {out_i.size} < {self.total}")
            _t.sleep(0.001)

    def next_block_planar_agc(self, out_i: np.ndarray, out_q: np.ndarray,
                              target: float = 120.0, stop=None
                              ) -> Optional[Tuple[int, float]]:
        """Planar int8 framing with per-block AGC (gain = target/peak over
        the framed block, Python quantize_i8 semantics); returns
        (start_sample, gain) or None at end of stream."""
        import time as _t
        self._check_planar_out(out_i, out_q)
        start = ctypes.c_int64(0)
        gain = ctypes.c_float(1.0)
        while not (stop is not None and stop.is_set()):
            with self._lock:
                if not self._h:
                    return None
                rc = self._lib.iq_stream_next_block_planar_agc(
                    self._h, out_i.ctypes.data_as(ctypes.c_void_p),
                    out_q.ctypes.data_as(ctypes.c_void_p), out_i.size,
                    ctypes.byref(start), float(target), ctypes.byref(gain))
            if rc == 1:
                return int(start.value), float(gain.value)
            if rc == -1:
                return None
            if rc == -2:
                raise ValueError(
                    f"planar row too short: {out_i.size} < {self.total}")
            _t.sleep(0.001)

    def _check_out(self, out, dtype) -> None:
        # the C side unconditionally writes total*2 elements: a wrong
        # dtype/shape/layout buffer is silent heap corruption, and these
        # must be REAL raises (asserts vanish under python -O) — r5 review
        if out.dtype != dtype or out.shape != (self.total, 2) \
                or not out.flags.c_contiguous:
            raise ValueError(
                f"out must be C-contiguous {np.dtype(dtype).name} "
                f"({self.total}, 2); got {out.dtype} {out.shape}")

    def _check_planar_out(self, out_i, out_q) -> None:
        if out_i.dtype != np.int8 or out_q.dtype != np.int8 \
                or not out_i.flags.c_contiguous \
                or not out_q.flags.c_contiguous \
                or out_q.size < out_i.size:
            # the C side writes BOTH buffers up to out_len (= out_i.size)
            raise ValueError(
                "planar outputs must be C-contiguous int8 with "
                f"out_q.size >= out_i.size; got {out_i.dtype} "
                f"{out_i.shape} / {out_q.dtype} {out_q.shape}")

    def blocks(self, i8: bool = False, scale: float = 127.0):
        """Generator over all blocks until end of stream."""
        while True:
            nxt = self.next_block_i8(scale) if i8 else self.next_block()
            if nxt is None:
                return
            yield nxt

    def close(self) -> None:
        with self._lock:
            if self._h:
                h, self._h = self._h, None
                self._lib.iq_stream_destroy(h)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

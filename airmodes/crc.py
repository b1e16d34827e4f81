"""Mode S CRC-24 — host (numpy) reference plus GF(2) linear-algebra form.

Reference behavior (gr-air-modes lib/slicer_impl.cc `modes_check_crc`,
python/parse.py `crc24`): bit-serial long division by the 25-bit generator
0x1FFF409 over the whole frame. A frame is parity-clean iff the remainder
("syndrome") is zero; for DFs whose AP field is parity XOR ICAO address,
the syndrome of a clean frame *is* the transmitter address.

TPU-native form: the syndrome is GF(2)-linear in the frame bits, so
  syndrome = XOR over set bits i of ROW[i],  ROW[i] = x^(n-1-i+0) mod G
which is a {0,1}-matrix multiply (frame_bits @ PARITY_MATRIX mod 2) — an
MXU-friendly matmul (see airmodes/dsp/crc_tpu.py). The same linearity gives
brute-force error correction by syndrome table lookup: flipping bit i XORs
ROW[i] into the syndrome.
"""

from __future__ import annotations

import functools

import numpy as np

from .constants import CRC_BITS, CRC_GENERATOR, MAX_FRAME_BITS, SHORT_FRAME_BITS

_TOP = 1 << CRC_BITS  # x^24


def poly_mod_bits(bits) -> int:
    """Remainder of the GF(2) polynomial given MSB-first `bits`, mod G.

    `poly_mod_bits(frame_bits) == 0` iff the frame's parity is clean.
    """
    r = 0
    for b in bits:
        r = (r << 1) | (int(b) & 1)
        if r & _TOP:
            r ^= CRC_GENERATOR
    return r & (_TOP - 1)


@functools.lru_cache(maxsize=1)
def _byte_table() -> tuple:
    """TABLE[b] = remainder of byte b shifted through 8 bit-steps mod G.

    Mode S frames are whole bytes (56/112 bits) and the CRC is a pure
    polynomial remainder (no init/xorout/reflection), so the classic
    byte-wise form applies; it is ~8x fewer Python ops than bit-serial
    and the CRC recompute dominates the host parse path (62% profiled)."""
    table = []
    for b in range(256):
        r = b << 16
        for _ in range(8):
            r <<= 1
            if r & _TOP:
                r ^= CRC_GENERATOR
        table.append(r & (_TOP - 1))
    return tuple(table)


def crc24(data: int, nbits: int) -> int:
    """Syndrome of an nbits-long frame given as a big integer (MSB first).

    The table loop computes remainder(msg * x^24) over the message part
    (everything above the 24 parity bits); the frame's own parity field
    has degree < 24 so it XORs in directly:
        syndrome = (msg << 24 | parity) mod G = tableCRC(msg) ^ parity
    """
    if nbits % 8:
        return poly_mod_bits((data >> (nbits - 1 - i)) & 1
                             for i in range(nbits))
    msg = data >> CRC_BITS
    r = 0
    for shift in range(nbits - CRC_BITS - 8, -8, -8):
        r = ((r << 8) ^ _TABLE[((r >> 16) ^ (msg >> shift)) & 0xFF]) \
            & (_TOP - 1)
    return r ^ (data & (_TOP - 1))


_TABLE = _byte_table()   # bound once: crc24 is the hottest parse-path call


def parity(data: int, nbits: int) -> int:
    """24-bit parity to append to an nbits-long message (encoder side)."""
    bits = [(data >> (nbits - 1 - i)) & 1 for i in range(nbits)]
    return poly_mod_bits(bits + [0] * CRC_BITS)


@functools.lru_cache(maxsize=None)
def syndrome_rows(nbits: int) -> np.ndarray:
    """ROW[i] = syndrome contribution of frame bit i (uint32, shape (nbits,))."""
    rows = np.zeros(nbits, dtype=np.uint32)
    for i in range(nbits):
        rows[i] = poly_mod_bits(1 if j == i else 0 for j in range(nbits))
    return rows


@functools.lru_cache(maxsize=None)
def parity_matrix(nbits: int) -> np.ndarray:
    """(nbits, 24) uint8 bit matrix: syndrome_bits = frame_bits @ M mod 2.

    Column 0 is the syndrome MSB (bit 23).
    """
    rows = syndrome_rows(nbits)
    cols = np.arange(CRC_BITS - 1, -1, -1, dtype=np.uint32)
    return ((rows[:, None] >> cols[None, :]) & 1).astype(np.uint8)


def syndrome_np(bits: np.ndarray, nbits: int | None = None) -> np.ndarray:
    """Vectorized syndrome of frames given as a (..., nbits) 0/1 array."""
    bits = np.asarray(bits)
    if nbits is None:
        nbits = bits.shape[-1]
    rows = syndrome_rows(nbits)
    sel = bits[..., :nbits].astype(bool)
    # XOR-accumulate rows of set bits.
    contrib = np.where(sel, rows, 0)
    return np.bitwise_xor.reduce(contrib, axis=-1)


def check_frame(data: int, nbits: int) -> int:
    """Syndrome of a frame; 0 means parity-clean (or PI with no interrogator)."""
    if nbits not in (SHORT_FRAME_BITS, MAX_FRAME_BITS):
        raise ValueError(f"frame length must be 56 or 112, got {nbits}")
    return crc24(data, nbits)

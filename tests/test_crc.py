"""CRC-24 unit tests: bit-serial reference, linearity, known protocol vectors."""

import numpy as np
import pytest

from airmodes import crc
from airmodes.constants import CRC_GENERATOR

# Well-known DF17 frames (mode-s.org worked examples); parity-clean.
KNOWN_CLEAN_FRAMES = [
    "8D4840D6202CC371C32CE0576098",   # ident KLM1023
    "8D40621D58C382D690C8AC2863A7",   # airborne position, even
    "8D40621D58C386435CC412692AD6",   # airborne position, odd
]


def test_generator_polynomial():
    assert CRC_GENERATOR == 0x1FFF409


@pytest.mark.parametrize("hexframe", KNOWN_CLEAN_FRAMES)
def test_known_frames_parity_clean(hexframe):
    data = int(hexframe, 16)
    assert crc.crc24(data, len(hexframe) * 4) == 0


def test_parity_roundtrip():
    rng = np.random.default_rng(1)
    for nbits in (32, 88):
        for _ in range(50):
            payload = int(rng.integers(0, 1 << 62)) | (1 << (nbits - 1))
            p = crc.parity(payload, nbits)
            frame = (payload << 24) | p
            assert crc.crc24(frame, nbits + 24) == 0


def test_syndrome_linearity():
    """syndrome(a ^ b) == syndrome(a) ^ syndrome(b) — basis of the matmul form."""
    rng = np.random.default_rng(2)
    for _ in range(20):
        a = int(rng.integers(0, 1 << 56))
        b = int(rng.integers(0, 1 << 56))
        assert crc.crc24(a ^ b, 56) == crc.crc24(a, 56) ^ crc.crc24(b, 56)


def test_syndrome_rows_match_single_bit_flips():
    rows = crc.syndrome_rows(112)
    for i in (0, 1, 55, 87, 111):
        assert crc.crc24(1 << (111 - i), 112) == rows[i]


def test_parity_matrix_matches_bit_serial():
    rng = np.random.default_rng(3)
    m = crc.parity_matrix(56)
    for _ in range(20):
        data = int(rng.integers(0, 1 << 56))
        bits = np.array([(data >> (55 - i)) & 1 for i in range(56)], np.uint8)
        synd_bits = bits @ m % 2
        synd = int("".join(map(str, synd_bits)), 2)
        assert synd == crc.crc24(data, 56)


def test_syndrome_np_vectorized():
    rng = np.random.default_rng(4)
    datas = rng.integers(0, 1 << 56, size=16)
    bits = ((datas[:, None] >> (55 - np.arange(56))[None, :]) & 1).astype(np.uint8)
    out = crc.syndrome_np(bits)
    for d, s in zip(datas, out):
        assert int(s) == crc.crc24(int(d), 56)

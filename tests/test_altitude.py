"""Altitude decode: Q-bit, Gillham gray code, 12-bit AC, metric error."""

import pytest

from airmodes.decode import altitude
from airmodes.exceptions import MetricAltError


def test_qbit_roundtrip_13bit():
    for alt in range(-1000, 50175 + 1, 25):
        enc = altitude.encode_alt_q(alt, bit13=True)
        assert altitude.decode_alt(enc, bit13=True) == alt


def test_qbit_roundtrip_12bit():
    for alt in range(-1000, 50175 + 1, 100):
        enc = altitude.encode_alt_12bit(alt)
        assert altitude.decode_alt(enc, bit13=False) == alt


def test_gillham_roundtrip():
    for alt in range(-1200, 126700 + 1, 100):
        enc = altitude.encode_alt_gillham(alt)
        assert enc & 0x0040 == 0, "M bit must be clear"
        assert altitude.decode_alt(enc, bit13=True) == alt


def test_metric_raises():
    with pytest.raises(MetricAltError):
        altitude.decode_alt(0x0040, bit13=True)


def test_known_qbit_value():
    # N = 0b11000111000 = 1592 -> 25*1592 - 1000 = 38800 ft
    n = 1592
    enc = ((n & 0x7E0) << 2) | ((n & 0x010) << 1) | (n & 0x00F) | 0x10
    assert altitude.decode_alt(enc) == 38800


def test_gray2bin():
    for v in range(256):
        g = v ^ (v >> 1)
        assert altitude.gray2bin(g) == v

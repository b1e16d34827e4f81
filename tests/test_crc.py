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


def test_pair_correction_matches_allpairs_oracle():
    """The static-pair ECC (first-L lowconf positions) matches the all-pairs
    i<j brute-force oracle on 256 random DF17 frames with injected double
    errors plus decoy low-confidence bits."""
    import jax
    import airmodes
    from airmodes.dsp import pipeline as P
    from airmodes import crc as crcmod

    cfg = airmodes.DspConfig()
    rng = np.random.default_rng(123)
    K, N = 256, 112
    r112, _ = P._crc_tables()
    bits = rng.integers(0, 2, size=(K, N)).astype(bool)
    conf = np.ones((K, N), bool)
    for k in range(K):
        bits[k, :5] = [(17 >> (4 - b)) & 1 for b in range(5)]
        data = 0
        for b in bits[k, :88]:
            data = (data << 1) | int(b)
        par = crcmod.parity(data, 88)
        for i in range(24):
            bits[k, 88 + i] = (par >> (23 - i)) & 1
        i, j = sorted(rng.choice(np.arange(5, N), size=2, replace=False))
        bits[k, i] ^= 1
        bits[k, j] ^= 1
        conf[k, i] = False
        conf[k, j] = False
        for d in rng.choice(np.arange(5, N), size=2, replace=False):
            conf[k, d] = False

    out_bits, df, nbits, synd, status = jax.jit(
        lambda b, c: P.crc_check_and_correct(b, c, cfg))(bits, conf)
    out_bits, synd, status = map(np.asarray, (out_bits, synd, status))

    n_pair = 0
    for k in range(K):
        fb = bits[k].astype(np.int64)
        s = 0
        for i in range(N):
            if fb[i]:
                s ^= int(r112[i])
        lc = ~conf[k]
        m1 = lc & (r112 == s)
        best = None
        for i in range(N):
            if not lc[i]:
                continue
            tgt = s ^ int(r112[i])
            for j in range(i + 1, N):
                if lc[j] and int(r112[j]) == tgt:
                    best = (i, j)
                    break
            if best:
                break
        if m1.any():
            fi = int(np.argmax(m1))
            exp = fb.copy()
            exp[fi] ^= 1
            assert np.array_equal(out_bits[k], exp.astype(bool))
            assert status[k] == 1
        elif best:
            i, j = best
            exp = fb.copy()
            exp[i] ^= 1
            exp[j] ^= 1
            assert np.array_equal(out_bits[k], exp.astype(bool)), (k, best)
            assert synd[k] == 0 and status[k] == 2
            n_pair += 1
        else:
            assert status[k] == 4
    assert n_pair >= K // 2  # the harness mostly injects correctable pairs


def test_byte_wise_crc_matches_bit_serial():
    """The table-driven crc24 must be bit-exact with the polynomial
    division for every frame length and random content."""
    import random
    from airmodes.crc import crc24, poly_mod_bits
    rng = random.Random(7)
    for nbits in (56, 112):
        for _ in range(200):
            data = rng.getrandbits(nbits)
            ref = poly_mod_bits((data >> (nbits - 1 - i)) & 1
                                for i in range(nbits))
            assert crc24(data, nbits) == ref
    # non-byte lengths still work (bit-serial fallback)
    assert crc24(0b1011, 4) == poly_mod_bits([1, 0, 1, 1])

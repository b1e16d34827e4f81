"""Native C++ IQ streaming runtime tests (ring buffer, framer, converters)."""

import socket
import time

import numpy as np
import pytest

from airmodes.config import DspConfig
from airmodes.io import sources

native = pytest.importorskip("airmodes.native")

try:
    native.load()
    HAVE = True
except native.NativeUnavailable:
    HAVE = False

pytestmark = pytest.mark.skipif(not HAVE, reason="no C++ toolchain")

CFG = DspConfig(block_size=4096)


def c64(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)


def test_framer_matches_python():
    iq = c64(3 * CFG.block_size + 777)
    ref = list(sources.frame_blocks(iq, CFG))
    st = native.IQStream(CFG)
    st.push(iq)
    st.set_eof()
    got = []
    for block, start in st.blocks():
        got.append((block.copy(), start))
    st.close()
    assert len(got) == len(ref)
    for (a, sa), (b, sb) in zip(ref, got):
        assert sa == sb
        a2 = np.ascontiguousarray(a).view(np.float32).reshape(-1, 2)
        np.testing.assert_array_equal(a2, b)


def test_chunked_push_matches():
    iq = c64(5 * CFG.block_size + 123, seed=1)
    ref = list(sources.frame_blocks(iq, CFG))
    st = native.IQStream(CFG)
    pos = 0
    got = []
    rng = np.random.default_rng(2)
    while pos < len(iq):
        n = int(rng.integers(1, 9000))
        st.push(iq[pos: pos + n])
        pos += n
        while st.available >= CFG.block_size + CFG.right_halo:
            blk = st.next_block()
            got.append((blk[0].copy(), blk[1]))
    st.set_eof()
    for blk, start in st.blocks():
        got.append((blk.copy(), start))
    st.close()
    assert len(got) == len(ref)
    for (a, sa), (b, sb) in zip(ref, got):
        assert sa == sb
        np.testing.assert_array_equal(
            np.ascontiguousarray(a).view(np.float32).reshape(-1, 2), b)


def test_file_pump(tmp_path):
    iq = c64(2 * CFG.block_size, seed=3)
    path = str(tmp_path / "c.c64")
    iq.tofile(path)
    st = native.IQStream(CFG)
    st.start_file(path)
    blocks = [(b.copy(), s) for b, s in st.blocks()]
    st.close()
    ref = list(sources.frame_blocks(iq, CFG))
    assert len(blocks) == len(ref)
    np.testing.assert_array_equal(
        np.ascontiguousarray(ref[0][0]).view(np.float32).reshape(-1, 2),
        blocks[0][0])


def test_uc8_conversion(tmp_path):
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 256, size=2 * CFG.block_size * 2, dtype=np.uint8)
    path = str(tmp_path / "c.uc8")
    raw.tofile(path)
    st = native.IQStream(CFG)
    st.start_file(path, fmt="uc8")
    blocks = [(b.copy(), s) for b, s in st.blocks()]
    st.close()
    want = ((raw.astype(np.float32) - 127.5) / 127.5).reshape(-1, 2)
    got = blocks[0][0][CFG.left_halo: CFG.left_halo + 100]
    np.testing.assert_allclose(got, want[:100], rtol=1e-6)


def test_udp_pump_data():
    port = 41234
    st = native.IQStream(CFG)
    try:
        st.start_udp("127.0.0.1", port)
    except OSError:
        st.close()
        pytest.skip("port busy")
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    iq = c64(CFG.block_size + CFG.right_halo + 100, seed=5)
    raw = iq.view(np.float32).tobytes()
    for off in range(0, len(raw), 8192):
        tx.sendto(raw[off: off + 8192], ("127.0.0.1", port))
    deadline = time.time() + 5
    while st.available < CFG.block_size + CFG.right_halo and time.time() < deadline:
        time.sleep(0.01)
    blk = st.next_block()
    assert blk is not None
    block, start = blk
    assert start == 0
    np.testing.assert_array_equal(
        block[CFG.left_halo: CFG.left_halo + 100],
        iq[:100].view(np.float32).reshape(-1, 2))
    tx.close()
    st.close()


def test_i8_quantized_block():
    iq = (c64(CFG.block_size + CFG.right_halo + 10, seed=6) * 0.3)
    st = native.IQStream(CFG)
    st.push(iq)
    st.set_eof()
    blk = st.next_block_i8(scale=127.0)
    assert blk is not None
    block, start = blk
    want = np.clip(np.round(
        iq[:100].view(np.float32).reshape(-1, 2) * 127.0), -127, 127)
    np.testing.assert_array_equal(
        block[CFG.left_halo: CFG.left_halo + 100], want.astype(np.int8))
    st.close()

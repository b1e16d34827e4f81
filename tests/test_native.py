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


def test_planar_i8_matches_python(tmp_path):
    """Fused native framing+quantize+planar == python framer -> quantize
    -> to_planar_i8, bit for bit, including rounding and zero padding."""
    from airmodes.dsp.pipeline import iq_to_device_layout
    iq = c64(3 * CFG.block_size + 777, seed=7) * 0.4
    T = CFG.left_halo + CFG.block_size + CFG.right_halo
    P = -(-T // 128) * 128
    st = native.IQStream(CFG)
    st.push(iq)
    st.set_eof()
    got = []
    while True:
        xi = np.empty(P, np.int8)
        xq = np.empty(P, np.int8)
        s = st.next_block_planar_i8(xi, xq, scale=127.0)
        if s is None:
            break
        got.append((xi, xq, s))
    st.close()
    ref = list(sources.frame_blocks(iq, CFG))
    assert len(got) == len(ref)
    for (xi, xq, s), (b, s2) in zip(got, ref):
        assert s == s2
        f = iq_to_device_layout(b)
        np.testing.assert_array_equal(
            xi[:T], np.clip(np.round(f[:, 0] * 127.0), -127, 127
                            ).astype(np.int8))
        np.testing.assert_array_equal(
            xq[:T], np.clip(np.round(f[:, 1] * 127.0), -127, 127
                            ).astype(np.int8))
        assert not xi[T:].any() and not xq[T:].any()


def test_file_offset_resume(tmp_path):
    """start_file(offset_samples=) resumes the global sample counter and
    frames the identical owned samples as the python file_source resume."""
    iq = c64(4 * CFG.block_size, seed=8)
    path = str(tmp_path / "r.c64")
    iq.tofile(path)
    resume = 2 * CFG.block_size
    st = native.IQStream(CFG)
    st.start_file(path, offset_samples=resume)
    blocks = [(b.copy(), s) for b, s in st.blocks()]
    st.close()
    ref = list(sources.file_source(path, CFG, start_sample=resume))
    assert [s for _, s in blocks] == [s for _, s in ref]
    assert blocks[0][1] == resume
    for (a, sa), (b, sb) in zip(blocks, ref):
        bf = np.ascontiguousarray(b).view(np.float32).reshape(-1, 2)
        # owned region matches exactly; the left halo differs at the
        # first resumed block only if python carries real look-back
        np.testing.assert_array_equal(
            a[CFG.left_halo:], bf[CFG.left_halo:])


def test_run_native_pipelined_decodes(tmp_path):
    """Full native product path on CPU (XLA planar fallback): uc8 capture
    -> native framer/planar -> demod -> wire messages match truth."""
    import airmodes
    from airmodes.io.native_stream import run_native_pipelined
    from airmodes.testing import encoder
    cfg = airmodes.DspConfig(block_size=1 << 16, max_detections=32)
    frames = encoder.random_df17_frames(12, seed=9)
    iq, truth = encoder.make_capture(
        frames, snr_db=20.0, spacing=9000, seed=9,
        total_samples=2 * cfg.block_size + 5000)
    peak = float(np.max(np.abs(iq))) or 1.0
    x = iq / peak * 0.9
    u = np.empty(2 * len(x), np.uint8)
    u[0::2] = np.round(x.real * 127.5 + 127.5).astype(np.uint8)
    u[1::2] = np.round(x.imag * 127.5 + 127.5).astype(np.uint8)
    path = str(tmp_path / "cap.uc8")
    u.tofile(path)
    msgs = []
    for block_msgs in run_native_pipelined(cfg, path=path, fmt="uc8",
                                           batch=2):
        msgs.extend(block_msgs)
    want = {t.hex for t in truth}
    got = {m.split()[1] for m in msgs}
    assert want <= got, f"missing {want - got}"


def test_run_native_channels_multi(tmp_path):
    """Native multi-channel loop: two captures with different traffic,
    per-channel messages keyed to each channel's own sample counter."""
    import airmodes
    from airmodes.io.native_stream import run_native_channels
    from airmodes.testing import encoder
    cfg = airmodes.DspConfig(block_size=1 << 16, max_detections=32)
    paths, wants = [], []
    for c in range(2):
        frames = encoder.random_df17_frames(6, seed=20 + c)
        iq, truth = encoder.make_capture(
            frames, snr_db=20.0, spacing=9000, seed=20 + c,
            total_samples=(2 + c) * cfg.block_size)  # unequal lengths
        p = str(tmp_path / f"ch{c}.c64")
        (iq * 0.5).astype(np.complex64).tofile(p)
        paths.append(p)
        wants.append({t.hex for t in truth})
    per_chan = [set(), set()]
    for step_msgs in run_native_channels(paths, cfg):
        for c, msgs in enumerate(step_msgs):
            per_chan[c] |= {m.split()[1] for m in (msgs or [])}
    assert wants[0] <= per_chan[0], f"ch0 missing {wants[0] - per_chan[0]}"
    assert wants[1] <= per_chan[1], f"ch1 missing {wants[1] - per_chan[1]}"


def test_planar_agc_matches_python_quantize():
    """Native per-block AGC planar framing == python framer ->
    quantize_i8 (gain = 120/peak over the framed block), including the
    reported gain."""
    from airmodes.dsp.pipeline import iq_to_device_layout
    iq = c64(2 * CFG.block_size + 321, seed=10) * 0.037   # quiet capture
    T = CFG.left_halo + CFG.block_size + CFG.right_halo
    P = -(-T // 128) * 128
    st = native.IQStream(CFG)
    st.push(iq)
    st.set_eof()
    got = []
    while True:
        xi = np.empty(P, np.int8)
        xq = np.empty(P, np.int8)
        nxt = st.next_block_planar_agc(xi, xq, target=120.0)
        if nxt is None:
            break
        got.append((xi, xq) + nxt)
    st.close()
    ref = list(sources.frame_blocks(iq, CFG))
    assert len(got) == len(ref)
    for (xi, xq, s, gain), (b, s2) in zip(got, ref):
        assert s == s2
        f = iq_to_device_layout(b)
        peak = float(np.max(np.abs(f))) or 1.0
        g = 120.0 / peak
        assert gain == pytest.approx(g, rel=1e-6)
        np.testing.assert_array_equal(
            xi[:T], np.clip(np.round(f[:, 0] * np.float32(gain)), -127, 127
                            ).astype(np.int8))
        np.testing.assert_array_equal(
            xq[:T], np.clip(np.round(f[:, 1] * np.float32(gain)), -127, 127
                            ).astype(np.int8))


def test_run_native_pipelined_early_close_cleans_up(tmp_path):
    """Breaking out of the generator (consumer stops early) must stop the
    dispatch thread and release the native stream, not deadlock on the
    bounded queue."""
    import threading
    import airmodes
    from airmodes.io.native_stream import run_native_pipelined
    from airmodes.testing import encoder
    cfg = airmodes.DspConfig(block_size=1 << 16, max_detections=32)
    frames = encoder.random_df17_frames(6, seed=12)
    iq, _ = encoder.make_capture(frames, snr_db=20.0, spacing=9000,
                                 seed=12, total_samples=8 * cfg.block_size)
    path = str(tmp_path / "c.c64")
    (iq * 0.5).astype(np.complex64).tofile(path)
    before = {t.name for t in threading.enumerate()}
    gen = run_native_pipelined(cfg, path=path, batch=1, depth=1)
    next(gen)                       # one block only
    gen.close()                     # GeneratorExit -> finally cleanup
    deadline = time.time() + 10
    while time.time() < deadline:
        alive = {t.name for t in threading.enumerate()} - before
        if not any(n.startswith("airmodes-dispatch") for n in alive):
            break
        time.sleep(0.05)
    alive = {t.name for t in threading.enumerate()} - before
    assert not any(n.startswith("airmodes-dispatch") for n in alive), alive


def test_ring_autosizes_for_large_blocks():
    """r3 review: a fixed 2^24 ring made block sizes past it hang forever
    (framer needs block+right buffered). The ring now sizes from the
    framer geometry."""
    big = DspConfig(block_size=1 << 24, max_detections=16)
    st = native.IQStream(big)        # would previously never emit
    try:
        n = big.block_size + big.right_halo
        rng = np.random.default_rng(11)
        # push in chunks to exercise ring wraparound paths
        chunk = (1 << 20)
        for off in range(0, n, chunk):
            m = min(chunk, n - off)
            x = (rng.standard_normal(2 * m) * 0.1).astype(np.float32)
            assert st.push(x.view(np.complex64)) == m
        st.set_eof()
        T = big.left_halo + big.block_size + big.right_halo
        P = -(-T // 128) * 128
        xi = np.empty(P, np.int8)
        xq = np.empty(P, np.int8)
        s = st.next_block_planar_i8(xi, xq, scale=127.0)
        assert s == 0
    finally:
        st.close()


def test_ring_too_small_rejected():
    with pytest.raises(ValueError, match="ring_samples"):
        native.IQStream(DspConfig(block_size=1 << 20, max_detections=16),
                        ring_samples=1 << 16)


def _free_udp_port():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_udp_overrun_drops_and_counts():
    """Real-time overrun semantics (VERDICT r3 weak #3): when the ring is
    full, the UDP pump drops the datagram tail and counts it — it must NOT
    block (that just moves the loss into the kernel socket buffer where no
    counter sees it)."""
    port = _free_udp_port()
    st = native.IQStream(CFG, ring_samples=CFG.block_size + CFG.right_halo + 1)
    try:
        st.start_udp("127.0.0.1", port, timeout_s=0.5)
    except OSError:
        st.close()
        pytest.skip("port busy")
    cap = 1
    while cap < CFG.block_size + CFG.right_halo + 1:
        cap <<= 1
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    payload = np.zeros(2 * 1024, np.float32).tobytes()   # 1024 samples
    n_sent = 0
    deadline = time.time() + 5
    # no consumer: ring fills at capacity, then every further datagram is
    # a counted drop
    while st.dropped == 0 and time.time() < deadline:
        tx.sendto(payload, ("127.0.0.1", port))
        n_sent += 1024
        if n_sent > 4 * cap:
            time.sleep(0.01)   # let the pump thread catch up
    tx.close()
    dropped = st.dropped
    st.close()
    assert dropped > 0, f"sent {n_sent} samples into a {cap} ring, 0 drops"


def test_file_pump_never_drops():
    """File sources block (pause the read) instead of dropping: a slow
    consumer loses nothing and the drop counter stays 0."""
    import os
    import tempfile
    iq = c64(4 * CFG.block_size, seed=9)
    fd, path = tempfile.mkstemp(suffix=".c64")
    os.close(fd)
    try:
        iq.tofile(path)
        st = native.IQStream(CFG,
                             ring_samples=CFG.block_size + CFG.right_halo + 1)
        st.start_file(path)
        n = 0
        for block, start in st.blocks():
            n += 1
            time.sleep(0.02)       # slow consumer: ring refills each block
        assert n == 4
        assert st.dropped == 0
        st.close()
    finally:
        os.remove(path)


def test_ring_dropped_surfaces_in_stats():
    """The overrun gauge reaches BlockStats.ring_dropped through the
    native product pipeline (modes_rx --stats-* / httpd read it there)."""
    import threading
    from airmodes.dsp import host as host_mod
    from airmodes.io.native_stream import run_native_pipelined

    port = _free_udp_port()
    stats = host_mod.BlockStats()
    done = threading.Event()
    err = []

    def consume():
        try:
            for _ in run_native_pipelined(
                    CFG, udp_port=port, batch=1, depth=1,
                    ring_samples=CFG.block_size + CFG.right_halo + 1,
                    udp_timeout_s=1.0, stats=stats):
                pass
        except Exception as e:         # surface in the main thread
            err.append(e)
        finally:
            done.set()

    th = threading.Thread(target=consume, daemon=True)
    th.start()
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    payload = np.zeros(2 * 1024, np.float32).tobytes()
    deadline = time.time() + 10
    # flood while the consumer is still compiling its first step; the tiny
    # ring overruns long before the first block is consumed
    while stats.ring_dropped == 0 and time.time() < deadline:
        for _ in range(64):
            tx.sendto(payload, ("127.0.0.1", port))
        time.sleep(0.01)
    tx.close()
    done.wait(timeout=30)
    th.join(timeout=5)
    assert not err, err
    assert stats.ring_dropped > 0


def test_double_start_raises_not_aborts():
    """Re-starting a started stream must be an OSError, not the
    std::terminate a joinable-thread move-assign causes (r4 review)."""
    import os
    import tempfile
    iq = c64(CFG.block_size, seed=11)
    fd, path = tempfile.mkstemp(suffix=".c64")
    os.close(fd)
    try:
        iq.tofile(path)
        st = native.IQStream(CFG)
        st.start_file(path)
        with pytest.raises(OSError, match="already started"):
            st.start_file(path)
        with pytest.raises(OSError, match="already started"):
            st.start_udp("127.0.0.1", _free_udp_port())
        st.close()
    finally:
        os.remove(path)


def test_block_smaller_than_left_halo_rejected():
    """block < left_halo would uint64-underflow the C carry indexing into
    producer-writable ring slots (r4 review) — reject at construction."""
    with pytest.raises(ValueError, match="left_halo"):
        native.IQStream(DspConfig(block_size=128, max_detections=4))


def test_tiny_udp_timeout_still_times_out():
    """A positive sub-us timeout used to truncate to a {0,0} timeval,
    which DISABLES the socket timeout (recv blocks forever)."""
    st = native.IQStream(CFG)
    try:
        st.start_udp("127.0.0.1", _free_udp_port(), timeout_s=1e-7)
    except OSError:
        st.close()
        pytest.skip("port busy")
    deadline = time.time() + 5
    blk = None
    got_end = False
    while time.time() < deadline:
        import threading
        ev = threading.Event()
        r = st.next_block(stop=ev)   # returns None at EOF
        if r is None:
            got_end = True
            break
        time.sleep(0.01)
    st.close()
    assert got_end, "silent UDP stream with tiny timeout never ended"


def test_rcvbuf_reports_effective_size():
    st = native.IQStream(CFG)
    try:
        st.start_udp("127.0.0.1", _free_udp_port())
    except OSError:
        st.close()
        pytest.skip("port busy")
    time.sleep(0.05)
    assert st.rcvbuf > 0     # kernel-clamped value, still nonzero
    st.close()


def test_stop_event_ends_quiet_wait_promptly():
    """The teardown path's bounded-drain guarantee rests on a set stop
    event ending next_row's wait on a quiet live source (r4 review: a
    feeder/pool worker inside the retry loop outlived the 10 s drain
    deadline and the native streams leaked)."""
    import threading
    from airmodes.io.native_stream import _PlanarSource
    from airmodes.kernels.preamble_pallas import planar_length

    P = planar_length(CFG)
    src = _PlanarSource(CFG, P, udp_port=_free_udp_port(),
                        udp_timeout_s=30.0)
    xi = np.zeros(P, np.int8)
    xq = np.zeros(P, np.int8)
    ev = threading.Event()
    out = []
    th = threading.Thread(
        target=lambda: out.append(src.next_row(xi, xq, stop=ev)),
        daemon=True)
    th.start()
    time.sleep(0.3)
    assert th.is_alive()          # quietly waiting (30 s UDP timeout)
    ev.set()
    th.join(timeout=2.0)
    assert not th.is_alive() and out == [None]
    src.close()


def test_quantize_planar_i8_bit_exact():
    """The fused native quantize+planar-split (pod streaming's per-step
    host conversion) matches the numpy round-half-even + clip rule bit
    for bit."""
    rng = np.random.default_rng(7)
    x = ((rng.standard_normal(65536) + 1j * rng.standard_normal(65536))
         .astype(np.complex64) * 0.03)
    for gain in (1333.3, 127.0, 37.3):
        i8, q8 = native.quantize_planar_i8(x, gain)
        np.testing.assert_array_equal(
            i8, np.clip(np.round(x.real * gain), -127, 127).astype(np.int8))
        np.testing.assert_array_equal(
            q8, np.clip(np.round(x.imag * gain), -127, 127).astype(np.int8))


def test_udp_duplicate_bind_fails_loudly():
    """No SO_REUSEADDR on the UDP socket: a second process binding the
    same port used to silently steal the stream while the first timed
    out as a normal EOF (r4 native review)."""
    from airmodes.native import IQStream
    cfg = DspConfig(block_size=1 << 14, max_detections=8)
    a = IQStream(cfg)
    a.start_udp("127.0.0.1", 0 or 47831)
    b = IQStream(cfg)
    try:
        with pytest.raises(OSError):
            b.start_udp("127.0.0.1", 47831)
    finally:
        b.close()
        a.close()


def test_udp_hostname_gets_clear_error():
    from airmodes.native import IQStream
    cfg = DspConfig(block_size=1 << 14, max_detections=8)
    st = IQStream(cfg)
    try:
        with pytest.raises(OSError, match="numeric IPv4"):
            st.start_udp("localhost", 47832)
    finally:
        st.close()


def test_set_eof_stops_live_udp_pump():
    """set_eof() on a live UDP stream must stop the producer BEFORE the
    consumer's EOF zero-pad writes the ring (SPSC single-writer; r4
    native review) — and the stream must then terminate cleanly."""
    import socket
    import numpy as np
    from airmodes.native import IQStream
    cfg = DspConfig(block_size=1 << 14, max_detections=8)
    st = IQStream(cfg)
    st.start_udp("127.0.0.1", 47833, timeout_s=30.0)
    snd = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    raw = np.zeros(2048, np.complex64).tobytes()
    for _ in range(4):
        snd.sendto(raw, ("127.0.0.1", 47833))
    snd.close()
    time.sleep(0.3)
    st.set_eof()                     # stops + joins the pump internally
    t0 = time.time()
    blocks = list(st.blocks())       # padded tail, then termination
    assert time.time() - t0 < 5.0    # not the 30 s socket timeout
    st.close()
    assert len(blocks) >= 1


def test_throttled_close_is_prompt():
    """close() during a slow throttled replay must interrupt the pacing
    sleep (it used to block CHUNK/throttle_sps seconds — r4 review)."""
    import numpy as np
    from airmodes.native import IQStream
    cfg = DspConfig(block_size=1 << 14, max_detections=8)
    iq = np.zeros(1 << 18, np.complex64)
    import tempfile, os
    d = tempfile.mkdtemp()
    p = os.path.join(d, "throttle.c64")
    iq.tofile(p)
    st = IQStream(cfg)
    st.start_file(p, throttle_sps=20_000.0)   # 65536-chunk pace = 3.3 s
    time.sleep(0.3)                           # pump inside the pacing sleep
    t0 = time.time()
    st.close()
    assert time.time() - t0 < 1.0


def test_closed_stream_raises_not_segfaults():
    """r5 review: every post-close handle call used to hand NULL to C
    and SIGSEGV the process; now they raise RuntimeError (or no-op for
    set_eof)."""
    import numpy as np
    import pytest
    from airmodes.native import IQStream
    st = IQStream(DspConfig(block_size=1 << 14, max_detections=8))
    st.close()
    with pytest.raises(RuntimeError):
        st.dropped
    with pytest.raises(RuntimeError):
        st.available
    with pytest.raises(RuntimeError):
        st.push(np.zeros(16, np.complex64))
    st.set_eof()                       # teardown helper: harmless no-op
    assert st.next_block() is None     # consumer loop: clean end
    st.close()                         # idempotent


def test_next_block_validates_out_buffer():
    """r5 review: the C side writes total*2 elements unconditionally; a
    wrong-shape/dtype out buffer was silent heap corruption."""
    import numpy as np
    import pytest
    from airmodes.native import IQStream
    st = IQStream(DspConfig(block_size=1 << 14, max_detections=8))
    try:
        with pytest.raises(ValueError):
            st.next_block(out=np.empty(st.total, np.float32))   # 1-D
        with pytest.raises(ValueError):
            st.next_block(out=np.empty((st.total, 2), np.float64))
        with pytest.raises(ValueError):
            st.next_block_planar_i8(np.empty(st.total, np.int16),
                                    np.empty(st.total, np.int8))
        with pytest.raises(ValueError):
            st.next_block_planar_agc(np.empty(st.total, np.int8),
                                     np.empty(st.total - 1, np.int8))
    finally:
        st.close()


def test_agc_survives_nonfinite_samples():
    """r5 review: one Inf sample drove the AGC gain to 0 and the whole
    block quantized to silence; NaN hit an undefined int8 cast. Now the
    peak scan is finite-only and the quantizer saturates/zeroes."""
    import numpy as np
    from airmodes.native import IQStream
    cfg = DspConfig(block_size=1 << 14, max_detections=8)
    st = IQStream(cfg)
    try:
        iq = (np.ones(st.total + 1024) * (0.25 + 0.25j)).astype(np.complex64)
        iq[100] = np.inf + 0j
        iq[200] = np.nan + 0j
        iq[300] = -np.inf * 1j
        off = 0
        while off < len(iq):
            off += st.push(iq[off:])
        st.set_eof()
        out_i = np.zeros(st.total, np.int8)
        out_q = np.zeros(st.total, np.int8)
        got = st.next_block_planar_agc(out_i, out_q)
        assert got is not None
        start, gain = got
        # the finite 0.25 samples must quantize to ~120, not 0
        assert abs(int(out_i[st.left + 1000]) - 120) <= 1
        assert abs(gain - 120.0 / 0.25) / (120.0 / 0.25) < 1e-5
        # non-finite samples saturate/zero instead of poisoning
        assert int(out_i[st.left + 100]) in (127, 0, -127)
    finally:
        st.close()


def test_fifo_source_teardown_does_not_hang():
    """r5 review: fread on a FIFO whose writer stalls blocked forever
    and destroy()'s join hung the caller; the non-regular-file pump
    polls with a timeout so close() returns promptly."""
    import os
    import tempfile
    import numpy as np
    from airmodes.native import IQStream
    d = tempfile.mkdtemp()
    path = os.path.join(d, "pump.fifo")
    os.mkfifo(path)
    fd = os.open(path, os.O_RDWR)      # keep a writer open (never EOF)
    cfg = DspConfig(block_size=1 << 14, max_detections=8)
    st = IQStream(cfg)
    try:
        st.start_file(path)
        # feed one block's worth through the pipe, then let it stall
        iq = (np.ones(st.total + 4096) * 0.5).astype(np.complex64)
        os.write(fd, iq.tobytes())
        got = st.next_block()
        assert got is not None
        t0 = time.time()
        st.close()                     # writer still open: pump must exit
        assert time.time() - t0 < 2.0, "FIFO teardown hung"
    finally:
        os.close(fd)
        os.unlink(path)

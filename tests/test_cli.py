"""modes_rx CLI end-to-end: file source -> demod -> plugins."""

import socket
import sqlite3
import threading

import numpy as np
import pytest

from airmodes.apps.modes_rx import build_argparser, main, parse_location
from airmodes.testing import encoder


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    frames = encoder.random_df17_frames(12, seed=90)
    iq, truth = encoder.make_capture(frames, snr_db=22.0, spacing=8000,
                                     seed=90, total_samples=1 << 17)
    path = str(d / "cap.c64")
    iq.tofile(path)
    return path, truth, d


def test_cli_file_to_db_and_print(capture, capsys):
    path, truth, d = capture
    db = str(d / "out.db")
    rc = main(["-s", path, "--block-size", "65536", "-d", db,
               "-l", "47.0,8.0", "--stats-interval", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Type 17" in out
    con = sqlite3.connect(db)
    n = con.execute("SELECT COUNT(*) FROM aircraft").fetchone()[0]
    assert n >= 10


def test_cli_resampled_file(tmp_path):
    frames = encoder.random_df17_frames(6, seed=91)
    iq, truth = encoder.make_capture(frames, rate=4e6, snr_db=25.0,
                                     spacing=16000, seed=91)
    path = str(tmp_path / "cap4m.c64")
    iq.tofile(path)
    rc = main(["-s", path, "-r", "4e6", "--block-size", "65536", "-n",
               "--stats-interval", "0"])
    assert rc == 0


def test_cli_batched_int8(capture, capsys):
    """--batch N / --int8 select the batched (and quantized) device path;
    decoded output matches the default path's messages."""
    path, truth, d = capture
    rc = main(["-s", path, "--block-size", "32768", "--batch", "3",
               "--int8", "--stats-interval", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    # every injected frame's ICAO appears in the printed reports
    import re
    icaos = {m for m in re.findall(r"from ([0-9a-f]{6})", out)}
    want = {f"{(t.frame >> 80) & 0xFFFFFF:06x}" for t in truth}
    assert want <= icaos, want - icaos


def test_cli_rejects_sdr_sources(capsys):
    assert main(["-s", "uhd"]) == 2


def test_cli_location_parsing():
    assert parse_location("47.5,8.25") == (47.5, 8.25, 0.0)
    assert parse_location("47.5,8.25,430") == (47.5, 8.25, 430.0)
    assert parse_location(None) is None


def test_cli_argparser_covers_reference_options():
    ap = build_argparser()
    args = ap.parse_args(["-s", "x.c64", "-r", "8e6", "-T", "6.5",
                          "-P", "30003", "-K", "k.kml", "-d", "a.db",
                          "-w", "9988", "-m", "localhost:5000",
                          "-l", "1,2", "-n", "-g", "30", "-f", "1090e6"])
    assert args.rate == 8e6 and args.threshold == 6.5
    assert args.sbs1 == 30003 and args.raw == 9988
    assert args.flightgear == "localhost:5000"


def test_framer_flush_owns_all_trailing_samples():
    """push() can hold back more than one block's worth; flush() must loop
    so every sample is OWNED by some block (regression: up to
    right_halo - 1 trailing samples were only ever halo, losing frames in
    the last ~120 us of a capture)."""
    from airmodes.io.sources import buffered_framer, frame_blocks
    from airmodes.config import DspConfig

    cfg = DspConfig(block_size=1 << 14, max_detections=16)
    n = 2 * cfg.block_size + cfg.right_halo - 1
    rng = np.random.default_rng(3)
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
          ).astype(np.complex64)

    ref = list(frame_blocks(iq, cfg))
    fr = buffered_framer(cfg)
    got = list(fr.push(iq)) + list(fr.flush())
    assert len(got) == len(ref) == 3
    for (a, sa), (b, sb) in zip(got, ref):
        assert sa == sb
        np.testing.assert_array_equal(a, b)


def test_long_stream_soak_counters_consistent():
    """30 blocks through the pipelined runner: stats counters must be
    internally consistent and every injected frame decoded exactly once."""
    from airmodes.config import DspConfig
    from airmodes.dsp import host as host_mod
    from airmodes.io import sources, stream

    cfg = DspConfig(block_size=1 << 14, max_detections=32)
    n_blocks = 30
    total = n_blocks * cfg.block_size
    frames = encoder.random_df17_frames(60, seed=55)
    iq, truth = encoder.make_capture(frames, snr_db=18.0,
                                     spacing=total // 60 - 37, seed=55,
                                     total_samples=total)
    stats = host_mod.BlockStats()
    msgs = [m for out in stream.run_pipelined(
        sources.frame_blocks(iq, cfg), cfg, stats=stats, batch=4)
        for m in out]
    hexes = [m.split()[1] for m in msgs]
    want = [t.hex for t in truth]
    for h in want:
        assert hexes.count(h) == 1, h
    assert stats.emitted == len(msgs)
    assert stats.crc_ok + stats.corrected <= stats.emitted
    assert stats.preambles >= stats.emitted
    assert stats.overflow == 0


def test_open_source_rejects_rate_mismatch():
    from airmodes.config import DspConfig, SourceConfig
    from airmodes.io.sources import open_source
    with pytest.raises(ValueError, match="resample"):
        open_source(SourceConfig(kind="synthetic", sample_rate=2.4e6),
                    DspConfig())


def test_framer_rejects_tiny_block():
    from airmodes.config import DspConfig
    from airmodes.io.sources import buffered_framer
    with pytest.raises(ValueError, match="left_halo"):
        buffered_framer(DspConfig(block_size=128, max_detections=4))


def test_udp_source_decodes_and_flushes():
    """Python udp_source: short transmission (under one block) decodes via
    the timeout flush; malformed datagrams are tolerated."""
    import socket as socketlib

    from airmodes.config import DspConfig
    from airmodes.dsp import host as host_mod
    from airmodes.dsp.pipeline import demod_block_jit
    from airmodes.io.sources import udp_source

    cfg = DspConfig(block_size=1 << 14, max_detections=16)
    frames = encoder.random_df17_frames(3, seed=91)
    iq, truth = encoder.make_capture(frames, snr_db=22.0, spacing=3000,
                                     seed=91, total_samples=12000)
    srv = socketlib.socket(socketlib.AF_INET, socketlib.SOCK_DGRAM)
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    snd = socketlib.socket(socketlib.AF_INET, socketlib.SOCK_DGRAM)
    snd.sendto(b"\x00" * 10, ("127.0.0.1", port))       # malformed
    raw = iq.astype(np.complex64).tobytes()
    for off in range(0, len(raw), 8192):
        snd.sendto(raw[off: off + 8192], ("127.0.0.1", port))
    snd.sendto(b"", ("127.0.0.1", port))                # empty datagram
    snd.close()
    msgs = []
    for block, start in udp_source(cfg, sock=srv, timeout_s=1.0):
        table = demod_block_jit(block, cfg)
        msgs.extend(host_mod.table_to_messages(table, start,
                                               cfg.channel_rate))
    got = {m.split()[1] for m in msgs}
    assert {t.hex for t in truth} <= got


def test_gui_default_synthetic_source(capsys):
    """Regression: -s became repeatable (a list) for multi-channel modes_rx;
    the GUI must still run with no -s at all (feed thread used to crash)."""
    from airmodes.apps.modes_gui import main as gui_main
    rc = gui_main(["--backend", "curses", "--duration", "2.0",
                   "--block-size", str(1 << 16), "--max-blocks", "2"])
    assert rc == 0
    out = capsys.readouterr()
    # headless fallback prints one row per decoded aircraft (icao first)
    import re
    assert re.search(r"^[0-9a-f]{6} ", out.out, re.M), out.out[:500]


def test_gui_rejects_multiple_sources(capture):
    from airmodes.apps.modes_gui import main as gui_main
    path, _, _ = capture
    rc = gui_main(["-s", path, "-s", path, "--backend", "curses",
                   "--duration", "1.0"])
    assert rc == 2


def test_gui_network_source(capsys):
    """The GUI dashboard can ride a remote beast:// feed (no local DSP)."""
    import time as _time
    from airmodes.apps.modes_gui import main as gui_main
    from airmodes.outputs.beast import output_beast
    from airmodes import crc

    frame = encoder.df17_frame(0xABC123, encoder.me_identification("GUINET"))
    synd = crc.crc24(frame, 112)
    srv = output_beast(port=0, host="127.0.0.1")
    stop = threading.Event()

    def feeder():
        while not stop.is_set():
            srv.output(f"17 {frame:028x} {synd:06x} 0 -20.00 "
                       f"{_time.time():.9f}")
            stop.wait(0.05)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    try:
        rc = gui_main(["-s", f"beast://127.0.0.1:{srv.port}",
                       "--backend", "curses", "--duration", "3.0"])
    finally:
        stop.set()
        t.join()
        srv.close()
    assert rc == 0
    out = capsys.readouterr()
    assert "GUINET" in out.out + out.err


def test_stats_json_output(capture, tmp_path, capsys):
    import json
    path, truth, _ = capture
    out = tmp_path / "stats.ndjson"
    rc = main(["-s", path, "-n", "--block-size", "65536",
               "--stats-json", str(out), "--stats-interval", "3600"])
    assert rc == 0
    recs = [json.loads(ln) for ln in out.read_text().splitlines()]
    assert recs, "no stats records written"
    final = recs[-1]
    assert final["crc_ok"] >= len(truth)
    assert final["emitted"] >= final["crc_ok"]
    assert {"ts", "msps", "blocks", "preambles", "corrected",
            "crc_fail", "overflow", "ring_dropped"} <= set(final)
    assert final["ring_dropped"] == 0   # file sources never overrun


def test_cli_native_matches_python_path(capture, tmp_path):
    """The native C++ product path (default) and --no-native decode the
    same message set with identical timestamps on a uc8 capture."""
    path, truth, d = capture
    iq = np.fromfile(path, np.complex64)
    peak = float(np.max(np.abs(iq))) or 1.0
    x = iq / peak * 0.9
    u = np.empty(2 * len(x), np.uint8)
    u[0::2] = np.round(x.real * 127.5 + 127.5).astype(np.uint8)
    u[1::2] = np.round(x.imag * 127.5 + 127.5).astype(np.uint8)
    upath = str(tmp_path / "cap.uc8")
    u.tofile(upath)

    outs = []
    for extra in ([], ["--no-native"]):
        raw = str(tmp_path / f"raw{len(extra)}.jsonl")
        rc = main(["-s", upath, "--file-format", "uc8", "--int8",
                   "--block-size", "32768", "--batch", "2", "-n",
                   "--stats-interval", "0", "--stats-json", raw] + extra)
        assert rc == 0
        outs.append(raw)
    # both runs emitted stats; compare decoded sets via a raw-port-free
    # channel: rerun capturing wire messages through a DB
    import sqlite3
    sets = []
    for extra in ([], ["--no-native"]):
        db = str(tmp_path / f"db{len(extra)}.db")
        rc = main(["-s", upath, "--file-format", "uc8", "--int8",
                   "--block-size", "32768", "--batch", "2", "-n", "-d", db,
                   "--stats-interval", "0"] + extra)
        assert rc == 0
        con = sqlite3.connect(db)
        # 'seen' carries each run's wall-clock epoch; compare the icao set
        # (the sample-counter part of the timestamps is pinned by the
        # resume test below and by tests/test_native.py bit-matches)
        sets.append({int(i) for (i,) in con.execute(
            "SELECT icao FROM aircraft").fetchall()})
        con.close()
    want = {f"{(t.frame >> 80) & 0xFFFFFF:06x}" for t in truth}
    got_native = {f"{i:06x}" for i in sets[0]}
    assert want <= got_native, want - got_native
    assert sets[0] == sets[1]     # same decoded aircraft set


def test_cli_native_start_sample_resume(capture, tmp_path):
    """--start-sample resume goes through the native file pump (seek +
    counter resume): messages after the resume point match a full run's."""
    path, truth, d = capture
    resume = 65536
    import re

    def icaos_after(args):
        import io
        from contextlib import redirect_stdout
        buf = io.StringIO()
        with redirect_stdout(buf):
            rc = main(args)
        assert rc == 0
        out = buf.getvalue()
        return set(re.findall(r"from ([0-9a-f]{6})", out))

    full = icaos_after(["-s", path, "--block-size", "32768", "--int8",
                        "--batch", "2", "--stats-interval", "0"])
    part = icaos_after(["-s", path, "--block-size", "32768", "--int8",
                        "--batch", "2", "--start-sample", str(resume),
                        "--stats-interval", "0"])
    assert part and part <= full


def test_cli_int8_quiet_c64_capture_uses_agc(tmp_path):
    """A c64 capture using 2% of full scale with --int8 must still
    decode: fixed-gain int8 quantize (the uc8 planar fast path) would
    crush it to ~2 counts, so non-uc8 formats take the per-block-AGC
    quantize path."""
    frames = encoder.random_df17_frames(8, seed=93)
    iq, truth = encoder.make_capture(frames, snr_db=22.0, spacing=7000,
                                     seed=93, total_samples=1 << 16)
    peak = float(np.max(np.abs(iq)))
    iq = (iq / peak * 0.02).astype(np.complex64)    # quiet recording
    path = str(tmp_path / "quiet.c64")
    iq.tofile(path)
    import io as _io
    import re
    from contextlib import redirect_stdout
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = main(["-s", path, "--block-size", "65536", "--int8",
                   "--batch", "2", "--stats-interval", "0"])
    assert rc == 0
    got = set(re.findall(r"from ([0-9a-f]{6})", buf.getvalue()))
    want = {f"{(t.frame >> 80) & 0xFFFFFF:06x}" for t in truth}
    assert want <= got, want - got


def test_cli_i8_scale_enables_planar_for_sc16(capture, tmp_path):
    """--i8-scale opts a non-uc8 format into the native fixed-gain planar
    fast path when the caller knows the capture's full-scale use."""
    path, truth, d = capture
    iq = np.fromfile(path, np.complex64)
    iq = iq / float(np.max(np.abs(iq))) * 0.9
    s16 = np.empty(2 * len(iq), np.int16)
    s16[0::2] = np.round(iq.real * 32767).astype(np.int16)
    s16[1::2] = np.round(iq.imag * 32767).astype(np.int16)
    spath = str(tmp_path / "cap.sc16")
    s16.tofile(spath)
    import io as _io
    import re
    from contextlib import redirect_stdout
    buf = _io.StringIO()
    with redirect_stdout(buf):
        rc = main(["-s", spath, "--file-format", "sc16", "--int8",
                   "--i8-scale", "127", "--block-size", "32768",
                   "--batch", "2", "--stats-interval", "0"])
    assert rc == 0
    got = set(re.findall(r"from ([0-9a-f]{6})", buf.getvalue()))
    want = {f"{(t.frame >> 80) & 0xFFFFFF:06x}" for t in truth}
    assert want <= got, want - got


def test_cli_all_plugins_soak(tmp_path):
    """Every output surface live at once on the native product path:
    SBS-1 + raw + Beast TCP servers with connected clients, SQLite, KML,
    aircraft.json, web server, wx feed, stats NDJSON — one run, clean
    shutdown, consistent outputs."""
    import json as _json
    import socket as socketlib
    import time as _time
    import urllib.request

    frames = encoder.random_df17_frames(10, seed=97)
    iq, truth = encoder.make_capture(frames, snr_db=20.0, spacing=8000,
                                     seed=97, total_samples=4 << 16)
    x = iq / float(np.max(np.abs(iq))) * 0.9
    u = np.empty(2 * len(x), np.uint8)
    u[0::2] = np.round(x.real * 127.5 + 127.5).astype(np.uint8)
    u[1::2] = np.round(x.imag * 127.5 + 127.5).astype(np.uint8)
    cap = str(tmp_path / "soak.uc8")
    u.tofile(cap)
    db = str(tmp_path / "soak.db")
    kml = str(tmp_path / "soak.kml")
    jsn = str(tmp_path / "soak.json")
    wx = str(tmp_path / "soak.wx")
    sj = str(tmp_path / "soak.stats")

    def free_port():
        s = socketlib.socket()
        s.bind(("127.0.0.1", 0))
        p = s.getsockname()[1]
        s.close()
        return p

    sbs_p, raw_p, beast_p, http_p = (free_port() for _ in range(4))
    received = {"sbs": b"", "raw": b"", "beast": b"", "http": None}
    done = threading.Event()

    def run():
        try:
            main(["-s", cap, "--file-format", "uc8", "--int8",
                  "--block-size", "65536", "--batch", "2", "-n",
                  "-P", str(sbs_p), "-w", str(raw_p), "-B", str(beast_p),
                  "--http", str(http_p), "-d", db, "-K", kml, "-j", jsn,
                  "--wx", wx, "--stats-json", sj, "-l", "47.0,8.0",
                  "--throttle", "--stats-interval", "0"])
        finally:
            done.set()

    th = threading.Thread(target=run, daemon=True)
    th.start()
    # connect clients while the (throttled ~2 s) run is live
    clients = {}
    deadline = _time.time() + 10
    for name, port in (("sbs", sbs_p), ("raw", raw_p), ("beast", beast_p)):
        while _time.time() < deadline:
            try:
                c = socketlib.create_connection(("127.0.0.1", port),
                                                timeout=1)
                c.settimeout(3)
                clients[name] = c
                break
            except OSError:
                _time.sleep(0.05)
    assert set(clients) == {"sbs", "raw", "beast"}
    try:
        received["http"] = _json.load(urllib.request.urlopen(
            f"http://127.0.0.1:{http_p}/data/stats.json", timeout=5))
    except Exception:
        pass
    for name, c in clients.items():
        try:
            while True:
                b = c.recv(65536)
                if not b:
                    break
                received[name] += b
        except OSError:
            pass
        c.close()
    assert done.wait(60)
    th.join(timeout=10)
    # every surface produced consistent output
    import sqlite3
    con = sqlite3.connect(db)
    n_db = con.execute("SELECT COUNT(*) FROM aircraft").fetchone()[0]
    con.close()
    want = {(t.frame >> 80) & 0xFFFFFF for t in truth}
    assert n_db >= len(want)
    assert received["sbs"].startswith(b"MSG,") and b"\r\n" in received["sbs"]
    assert received["raw"].startswith(b"*") and b";" in received["raw"]
    assert received["beast"][:1] == b"\x1a"
    assert open(kml).read().count("<Placemark") >= 1
    doc = _json.load(open(jsn))
    assert doc["aircraft"]
    stats_rec = [_json.loads(ln) for ln in open(sj)]
    assert stats_rec and stats_rec[-1]["emitted"] >= len(want)


def test_gui_resampled_file(tmp_path, capsys):
    """modes_gui used to silently ignore -r/--rate and frame a non-2-Msps
    capture at 2 Msps — garbage decode with no error (r4 review)."""
    from airmodes.apps.modes_gui import main as gui_main
    frames = encoder.random_df17_frames(6, seed=92)
    iq, truth = encoder.make_capture(frames, rate=4e6, snr_db=25.0,
                                     spacing=16000, seed=92)
    path = str(tmp_path / "gcap4m.c64")
    iq.tofile(path)
    rc = gui_main(["-s", path, "-r", "4e6", "--backend", "curses",
                   "--duration", "8.0", "--block-size", "65536"])
    assert rc == 0
    out = capsys.readouterr().out
    import re
    assert re.search(r"^[0-9a-f]{6} ", out, re.M), out[:500]


def test_gui_rejects_frame_format_for_nonfile_sources(capsys):
    """--file-format beast with -s udp used to kill the feed thread with
    a dtype ValueError while the GUI showed 0 aircraft forever."""
    from airmodes.apps.modes_gui import main as gui_main
    rc = gui_main(["-s", "udp", "--file-format", "beast",
                   "--backend", "curses", "--duration", "1.0"])
    assert rc == 2
    rc = gui_main(["-s", "udp", "-r", "4e6",
                   "--backend", "curses", "--duration", "1.0"])
    assert rc == 2          # resample is only wired for file sources


def test_gui_frame_replay(tmp_path, capsys):
    """modes_gui replays recorded Beast frame captures through the decode
    stack like modes_rx (it used to pass 'beast' to file_source as an IQ
    dtype)."""
    from airmodes.apps.modes_gui import main as gui_main
    from airmodes.outputs.beast import beast_encode
    frame = encoder.df17_frame(0xABC123, encoder.me_identification("GUIRPL"))
    data = b"".join(beast_encode(f"{frame:028x}", -20.0, 1.0 + 0.1 * i)
                    for i in range(5))
    p = tmp_path / "rec.beast"
    p.write_bytes(data)
    rc = gui_main(["-s", str(p), "--file-format", "beast",
                   "--backend", "curses", "--duration", "3.0"])
    assert rc == 0
    assert "abc123" in capsys.readouterr().out


def test_cli_bad_location_clean_error(capture, capsys):
    """A typo'd -l must be a clean CLI error (rc 2), not an IndexError
    traceback (r4 review)."""
    path, _, _ = capture
    for bad in ("47.0", "47.0,abc", "x"):
        rc = main(["-s", path, "-l", bad])
        assert rc == 2, bad
    with pytest.raises(ValueError):
        parse_location("47.0")
    assert parse_location("47.0,8.0,500") == (47.0, 8.0, 500.0)


def test_mlat_bad_station_clean_error(capsys):
    """A malformed -S station spec must be a clean CLI error (rc 2), not
    a ValueError traceback (r4 review)."""
    from airmodes.apps.modes_mlat import main as mlat_main
    assert mlat_main(["-S", "47.0,8.0@zmq://x"]) == 2      # missing alt
    assert mlat_main(["-S", "47.0,8.0,500"]) == 2          # missing @URL


def test_udp_source_timeout_zero_never_gives_up():
    """timeout_s=0 disables the silence timeout entirely (a live
    receiver must survive upstream feeder restarts, r4 review); the
    stream still ends promptly via max_blocks."""
    import socket as socketlib
    import time as _time

    from airmodes.config import DspConfig
    from airmodes.io.sources import udp_source

    # small blocks: everything sent must FIT in the kernel receive buffer
    # (~212 KB unprivileged) before the reader starts, or the dropped
    # tail leaves the framer short of a block and recvfrom (timeout
    # None) blocks the test forever
    cfg = DspConfig(block_size=1 << 12, max_detections=16)
    srv = socketlib.socket(socketlib.AF_INET, socketlib.SOCK_DGRAM)
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    snd = socketlib.socket(socketlib.AF_INET, socketlib.SOCK_DGRAM)
    raw = (np.zeros(4 * (1 << 12), np.complex64)).tobytes()
    for off in range(0, len(raw), 8192):
        snd.sendto(raw[off: off + 8192], ("127.0.0.1", port))
    snd.close()
    t0 = _time.time()
    blocks = list(udp_source(cfg, sock=srv, timeout_s=0, max_blocks=1))
    assert len(blocks) == 1
    assert _time.time() - t0 < 5.0      # ended via max_blocks, not a wait
    # and the flag is plumbed through the CLI
    args = build_argparser().parse_args(["--udp-timeout", "3.5"])
    assert args.udp_timeout == 3.5


def test_gui_rejects_sdr_and_missing_file_cleanly(capsys):
    """-s uhd / a typo'd path used to die inside the daemon feed thread
    (empty UI forever); now a clean rc-2 CLI error like modes_rx."""
    from airmodes.apps.modes_gui import main as gui_main
    assert gui_main(["-s", "uhd", "--backend", "curses",
                     "--duration", "1.0"]) == 2
    assert gui_main(["-s", "/no/such/capture.c64", "--backend", "curses",
                     "--duration", "1.0"]) == 2


def test_validation_failure_closes_registered_plugins(capture, capsys):
    """r5 review follow-up: every post-registration validation failure
    must close already-registered plugins (_close_all), not just the
    build_msg_iter ValueError path. Thread-owning plugins (the kml
    rewrite thread holds a self-reference) outlive main() otherwise —
    refcounting cannot reap them, so a library caller leaked a thread
    (and its DB handle) per failed call."""
    import threading
    path, _, d = capture
    db, kml = str(d / "leak.db"), str(d / "leak.kml")
    cases = [
        ["-s", "beast://127.0.0.1:1", "-s", path, "-d", db, "--kml", kml,
         "--stats-interval", "0"],                       # mixed sources
        ["-s", "beast://::1", "-d", db, "--kml", kml,
         "--stats-interval", "0"],                       # bad net URL
        ["-s", path, "--file-format", "beast", "-s", path, "-d", db,
         "--kml", kml, "--stats-interval", "0"],         # replay misuse
        ["-s", path, "--kml", kml,
         "--stats-interval", "0"],                       # kml w/o db
    ]
    for argv in cases:
        before = set(threading.enumerate())
        rc = main(argv)
        assert rc == 2, argv
        capsys.readouterr()
        leftover = [t for t in threading.enumerate() if t not in before]
        assert not leftover, (argv, leftover)

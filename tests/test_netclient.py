"""Beast/AVR network interop: binary framing round trips, CRC acceptance
rules for remote frames, the TCP client, and aggregator-mode modes_rx."""

import socket
import threading
import time

import pytest

from airmodes import crc
from airmodes.decode.parse import parse
from airmodes.io.netclient import (avr_to_hex, beast_parser, frame_to_wire,
                                   net_client, parse_net_url)
from airmodes.outputs.beast import (ESC, MLAT_HZ, beast_encode, output_beast,
                                    signal_byte, signal_dbfs)
from airmodes.testing import encoder

ICAO = 0x4840D6
DF17 = encoder.df17_frame(ICAO, encoder.me_identification("KLM1023", tc=4))
DF17_HEX = f"{DF17:028x}"
DF4 = encoder.df4_frame(ICAO, 0x1234)
DF4_HEX = f"{DF4:014x}"
DF11 = encoder.df11_frame(ICAO)
DF11_HEX = f"{DF11:014x}"


# --- Beast binary encode/decode ------------------------------------------

def test_beast_roundtrip_long_and_short():
    p = beast_parser()
    ts = 1700000000.123456
    frames = p.push(beast_encode(DF17_HEX, -20.0, ts) +
                    beast_encode(DF4_HEX, -3.5, ts + 1.0))
    assert len(frames) == 2
    (t0, mlat0, sig0, pay0), (t1, mlat1, sig1, pay1) = frames
    assert t0 == 0x33 and pay0.hex() == DF17_HEX
    assert t1 == 0x32 and pay1.hex() == DF4_HEX
    # 12 MHz counter round-trips to sub-us precision (mod 2^48)
    assert mlat0 == int(ts * MLAT_HZ) & ((1 << 48) - 1)
    assert (mlat1 - mlat0) == pytest.approx(1.0 * MLAT_HZ, abs=1)
    # signal byte inverts within quantization error
    assert signal_dbfs(sig0) == pytest.approx(-20.0, abs=0.2)
    assert signal_dbfs(sig1) == pytest.approx(-3.5, abs=0.2)


def test_beast_escape_doubling():
    # force ESC bytes into every body field: a timestamp and signal of 0x1A
    ts = (0x1A1A1A1A1A1A) / MLAT_HZ
    dbfs = signal_dbfs(0x1A)
    wire = beast_encode(DF17_HEX, dbfs, ts)
    # every 0x1A after the type byte must be doubled
    body = wire[2:]
    i = 0
    while i < len(body):
        if body[i] == ESC:
            assert body[i + 1] == ESC
            i += 2
        else:
            i += 1
    ((mtype, mlat, sig, payload),) = beast_parser().push(wire)
    assert mlat == 0x1A1A1A1A1A1A and sig == 0x1A
    assert payload.hex() == DF17_HEX


def test_beast_parser_resync_and_partial():
    p = beast_parser()
    whole = beast_encode(DF17_HEX, -20.0, 1.0)
    # garbage + a truncated frame + a whole frame, fed one byte at a time
    stream = b"\x00garbage\x1a" + whole[:9] + whole
    got = []
    for i in range(len(stream)):
        got += p.push(stream[i:i + 1])
    assert len(got) == 1
    assert got[0][3].hex() == DF17_HEX


def test_beast_encode_rejects_bad_input():
    assert beast_encode("zz", -10.0, 0.0) is None
    assert beast_encode("0011", -10.0, 0.0) is None  # 2 bytes: not Mode S
    assert signal_byte(0.0) == 255 and signal_byte(-200.0) == 0


# --- AVR records ----------------------------------------------------------

def test_avr_to_hex():
    assert avr_to_hex(f"*{DF17_HEX}") == (DF17_HEX, None)
    mlat = 0x123456789ABC
    rec = f"@{mlat:012x}{DF4_HEX}"
    assert avr_to_hex(rec) == (DF4_HEX, mlat)
    assert avr_to_hex("garbage") is None
    assert avr_to_hex("") is None


# --- frame_to_wire acceptance rules --------------------------------------

def test_frame_to_wire_df17_parses():
    w = frame_to_wire(DF17_HEX, ref_dbfs=-20.0, timestamp=1700000000.0)
    rep = parse().parse(w)
    assert rep.df == 17 and rep.icao == ICAO and rep.callsign == "KLM1023"


def test_frame_to_wire_ap_overlay_recovers_icao():
    w = frame_to_wire(DF4_HEX, timestamp=1700000000.0)
    rep = parse().parse(w)
    assert rep.df == 4 and rep.icao == ICAO


def test_frame_to_wire_rejects_corrupt_df17():
    bad = f"{DF17 ^ 1:028x}"  # flip one bit -> parity fails
    assert frame_to_wire(bad) is None


def test_frame_to_wire_df11_acceptance():
    # clean DF11 (syndrome 0) accepted; interrogator II in low 7 bits too
    assert frame_to_wire(DF11_HEX, timestamp=1.0) is not None
    ii = encoder.df11_frame(ICAO, interrogator=5)
    assert frame_to_wire(f"{ii:014x}", timestamp=1.0) is not None
    # corrupting a bit makes the high-17 syndrome bits nonzero -> rejected
    assert frame_to_wire(f"{DF11 ^ (1 << 40):014x}") is None


def test_frame_to_wire_rejects_bad_lengths():
    assert frame_to_wire("00") is None
    assert frame_to_wire("xx" * 7) is None
    # DF17 bits in a 56-bit frame: DF/length mismatch
    short_df17 = (17 << 51) >> 56 if False else (17 << (56 - 5))
    assert frame_to_wire(f"{short_df17:014x}") is None


def test_frame_to_wire_df24():
    f24 = encoder.df24_frame(ICAO, nd=1, md=0xAB)
    w = frame_to_wire(f"{f24:028x}", timestamp=1.0)
    assert w is not None and w.split()[0] == "24"
    rep = parse().parse(w)
    assert rep.df == 24 and rep.icao == ICAO


def test_parse_net_url():
    assert parse_net_url("beast://rx1:30005") == ("beast", "rx1", 30005)
    assert parse_net_url("avr://10.0.0.2:30002") == ("avr", "10.0.0.2", 30002)
    assert parse_net_url("capture.c64") is None
    with pytest.raises(ValueError):
        parse_net_url("beast://noport")
    # bracketed IPv6 literal: socket APIs take the bare address (r5
    # review: brackets left on -> every connect gaierror'd forever)
    assert parse_net_url("beast://[2001:db8::1]:30005") == \
        ("beast", "2001:db8::1", 30005)


def test_mlat_counter_survives_2pow47_wrap(monkeypatch):
    """r5 review: the anchor-relative signed-modular delta wrapped at
    2^47 ticks (~11.65 days of healthy uptime) and GUARANTEED a spurious
    reanchor; per-frame unwrapped accumulation must ride through both
    the half-range point and the true 2^48 counter wrap."""
    from airmodes.io import netclient as nc

    clock = [1000.0]
    monkeypatch.setattr(nc.time, "time", lambda: clock[0])
    reanchors = []
    c = nc.net_client("h", 1, lambda m: None, fmt="beast",
                      timestamps="mlat")
    c.on_reanchor = lambda: reanchors.append(1)
    start = (1 << 48) - nc.MLAT_HZ * 86400        # 1 day before 2^48
    c._emit("8d" + "0" * 26, 100, start)          # anchors
    day_ticks = nc.MLAT_HZ * 86400
    for d in range(1, 16):                        # 15 days, one frame/day
        clock[0] = 1000.0 + 86400.0 * d
        ctr = (start + day_ticks * d) & ((1 << 48) - 1)   # wraps at day 1
        c._emit("8d" + "0" * 26, 100, ctr)
    assert not reanchors, "wrap misread as counter reset"


def test_mlat_reanchor_tolerates_sdr_clock_drift(monkeypatch):
    """A healthy day-old feed whose 12 MHz counter runs 50 ppm fast
    (typical rtl-sdr) must NOT be misread as a counter reset (r5 review:
    a fixed 5 s divergence bound false-fired ~daily, trashing trained
    mlat clock-sync state); a true reset (counter restart) still must."""
    from airmodes.io import netclient as nc

    clock = [1000.0]
    monkeypatch.setattr(nc.time, "time", lambda: clock[0])
    reanchors = []
    c = nc.net_client("h", 1, lambda m: None, fmt="beast",
                      timestamps="mlat")
    c.on_reanchor = lambda: reanchors.append(1)
    c._emit("8d" + "0" * 26, 100, 0)            # anchors at counter 0
    clock[0] += 86400.0                          # one day of host time
    tick = int(86400 * nc.MLAT_HZ * (1 + 50e-6))  # 50 ppm fast counter
    c._emit("8d" + "0" * 26, 100, tick)
    assert not reanchors, "healthy drift misread as counter reset"
    c._emit("8d" + "0" * 26, 100, 1000)          # true restart near zero
    assert reanchors


# --- end-to-end over loopback TCP ----------------------------------------

def _wire(frame, nbits, ts=1700000000.0):
    synd = crc.crc24(frame, nbits)
    return (f"{frame >> (nbits - 5)} {frame:0{nbits // 4}x} {synd:06x} "
            f"0 -20.00 {ts:.9f}")


def test_beast_server_to_client_roundtrip():
    """output_beast server -> net_client: frames survive the full wire."""
    srv = output_beast(port=0, host="127.0.0.1")
    got, done = [], threading.Event()

    def cb(w):
        got.append(w)
        if len(got) >= 3:
            done.set()

    cli = net_client("127.0.0.1", srv.port, cb, fmt="beast").start()
    msgs = [_wire(DF17, 112), _wire(DF4, 56), _wire(DF11, 56)]
    deadline = time.time() + 10
    while time.time() < deadline and not done.is_set():
        for m in msgs:  # resend until the client connects (accept is lazy)
            srv.output(m)
        done.wait(0.1)
    cli.close()
    srv.close()
    assert done.is_set(), f"only {len(got)} frames arrived"
    hexes = {w.split()[1] for w in got}
    assert hexes == {DF17_HEX, DF4_HEX, DF11_HEX}
    p = parse()
    assert {p.parse(w).icao for w in got} == {ICAO}


def test_avr_server_to_client_roundtrip():
    """output_raw (the reference's AVR feed) -> net_client in avr mode."""
    from airmodes.outputs.raw_server import output_raw
    srv = output_raw(port=0, host="127.0.0.1")
    got, done = [], threading.Event()

    def cb(w):
        got.append(w)
        done.set()

    cli = net_client("127.0.0.1", srv.port, cb, fmt="auto").start()
    deadline = time.time() + 10
    while time.time() < deadline and not done.is_set():
        srv.output(_wire(DF17, 112))
        done.wait(0.1)
    cli.close()
    srv.close()
    assert done.is_set()
    assert got[0].split()[1] == DF17_HEX


def test_net_client_reconnects():
    """Client survives the server going away and coming back on a new
    accept (reconnect loop)."""
    lsock = socket.socket()
    lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    port = lsock.getsockname()[1]
    got, done = [], threading.Event()
    cli = net_client("127.0.0.1", port, lambda w: (got.append(w), done.set()),
                     fmt="avr", reconnect_s=0.1).start()
    # first connection: close immediately (simulates server restart)
    c1, _ = lsock.accept()
    c1.close()
    # second connection: deliver a frame
    lsock.settimeout(10)
    c2, _ = lsock.accept()
    c2.sendall(f"*{DF17_HEX};\n".encode())
    assert done.wait(10)
    c2.close()
    cli.close()
    lsock.close()
    assert got[0].split()[1] == DF17_HEX


def test_net_client_survives_raising_callback(capsys):
    """r5 review: the feed-error guard (a raising consumer must not
    silently kill the feed thread) had no coverage. The client must log
    the error, reconnect, and keep feeding."""
    lsock = socket.socket()
    lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(1)
    port = lsock.getsockname()[1]
    got, done = [], threading.Event()

    def cb(w):
        if not got:
            got.append("boom")
            raise RuntimeError("consumer bug")
        got.append(w)
        done.set()

    cli = net_client("127.0.0.1", port, cb, fmt="avr", reconnect_s=0.1)
    cli.start()
    lsock.settimeout(10)
    c1, _ = lsock.accept()
    c1.sendall(f"*{DF17_HEX};\n".encode())   # triggers the raise
    # the client must drop the connection and come back
    c2, _ = lsock.accept()
    c1.close()
    c2.sendall(f"*{DF17_HEX};\n".encode())
    assert done.wait(10), "feed thread died after a callback exception"
    c2.close()
    cli.close()
    lsock.close()
    assert got[-1].split()[1] == DF17_HEX
    assert "feed error" in capsys.readouterr().err


def test_modes_rx_aggregator_cli():
    """modes_rx -s beast://... consumes a remote feed end to end."""
    from airmodes.apps.modes_rx import main
    srv = output_beast(port=0, host="127.0.0.1")
    feeding = threading.Event()

    def feeder():
        while not feeding.is_set():
            srv.output(_wire(DF17, 112))
            time.sleep(0.05)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    try:
        rc = main(["-s", f"beast://127.0.0.1:{srv.port}", "-n",
                   "--max-messages", "3", "--stats-interval", "0"])
    finally:
        feeding.set()
        t.join()
        srv.close()
    assert rc == 0


def test_modes_rx_rejects_mixed_sources(capsys):
    from airmodes.apps.modes_rx import main
    rc = main(["-s", "beast://h:1", "-s", "synthetic", "-n"])
    assert rc == 2


def test_replay_beast_file(tmp_path):
    from airmodes.io.netclient import replay_file
    from airmodes.outputs.beast import beast_encode
    path = tmp_path / "rec.beast"
    blob = b"".join(beast_encode(h, -15.0, 100.0 + i * 0.25)
                    for i, h in enumerate([DF17_HEX, DF4_HEX, DF11_HEX]))
    path.write_bytes(blob)
    got = list(replay_file(str(path), epoch=5000.0))
    assert [w.split()[1] for w, _ in got] == [DF17_HEX, DF4_HEX, DF11_HEX]
    offs = [off for _, off in got]
    assert offs == pytest.approx([0.0, 0.25, 0.5], abs=1e-6)
    # wire timestamps ride the epoch + counter offset
    assert float(got[1][0].split()[5]) == pytest.approx(5000.25, abs=1e-6)


def test_replay_avr_file(tmp_path):
    from airmodes.io.netclient import replay_file
    path = tmp_path / "rec.avr"
    mlat = 24_000_000  # 2.0 s on the 12 MHz counter
    path.write_text(f"*{DF17_HEX};\n@{mlat:012x}{DF4_HEX};\njunk;\n")
    got = list(replay_file(str(path), fmt="avr", epoch=1.0))
    assert [w.split()[1] for w, _ in got] == [DF17_HEX, DF4_HEX]


def test_modes_rx_frame_replay_cli(tmp_path, capsys):
    from airmodes.apps.modes_rx import main
    from airmodes.outputs.beast import beast_encode
    rec = tmp_path / "rec.beast"
    rec.write_bytes(beast_encode(DF17_HEX, -15.0, 1.0) * 2 +
                    beast_encode(DF4_HEX, -15.0, 2.0))
    db = tmp_path / "out.db"
    rc = main(["-s", str(rec), "--file-format", "beast", "-n",
               "-d", str(db), "--stats-interval", "0"])
    assert rc == 0
    import sqlite3
    con = sqlite3.connect(str(db))
    ident = con.execute("SELECT ident FROM aircraft").fetchone()[0]
    assert ident == "KLM1023"
    rc = main(["-s", "synthetic", "--file-format", "beast", "-n"])
    assert rc == 2


# --- GPS-disciplined timestamps & dedup ----------------------------------

def test_gps_counter_roundtrip():
    from airmodes.io.netclient import gps_counter_to_utc
    from airmodes.outputs.beast import gps_counter
    ts = 1_700_000_000.123456789
    back = gps_counter_to_utc(gps_counter(ts), host_now=ts + 0.5)
    assert back == pytest.approx(ts, abs=1e-6)
    # rollover: frame stamped just before UTC midnight, received just after
    day = ts - (ts % 86400.0)
    before = day + 86399.9
    back = gps_counter_to_utc(gps_counter(before), host_now=day + 86400.1)
    assert back == pytest.approx(before, abs=1e-6)
    # and the reverse skew (receiver clock slightly behind)
    after = day + 0.1
    back = gps_counter_to_utc(gps_counter(after), host_now=day - 0.1 + 86400)
    assert back == pytest.approx(after + 86400, abs=1e-6) or \
        back == pytest.approx(after, abs=1e-6)


def test_client_for_url_schemes():
    from airmodes.io.netclient import client_for_url
    cb = lambda w: None
    c = client_for_url("beastgps://h:30005", cb)
    assert c.fmt == "beast" and c.timestamps == "gps"
    c = client_for_url("beast://h:30005", cb)
    assert c.fmt == "beast" and c.timestamps == "host"
    assert client_for_url("capture.c64", cb) is None


def test_frame_deduper():
    from airmodes.io.netclient import frame_deduper
    d = frame_deduper(window_s=1.0)
    assert d.accept("aa", now=10.0)
    assert not d.accept("aa", now=10.5)      # duplicate within window
    assert d.accept("bb", now=10.5)          # different frame
    assert d.accept("aa", now=11.5)          # same frame, legit repeat
    # memory bound: entries beyond the cap are purged once stale
    d2 = frame_deduper(window_s=0.1, max_entries=10)
    for i in range(20):
        d2.accept(f"{i:02x}", now=100.0)
    d2.accept("ff", now=101.0)
    assert len(d2._last) <= 12


def test_aggregator_dedups_overlapping_feeds():
    """Two feeds delivering the same frame -> one merged emit."""
    from airmodes.apps.modes_rx import main
    srvs = [output_beast(port=0, host="127.0.0.1") for _ in range(2)]
    feeding = threading.Event()

    def feeder():
        while not feeding.is_set():
            for s in srvs:  # same frame on BOTH feeds
                s.output(_wire(DF17, 112))
            time.sleep(0.05)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    try:
        # --max-messages counts MERGED emits; dedup window far longer than
        # the run, so every accepted merged emit must be a unique frame —
        # with only one distinct frame the run can only finish via the
        # window expiring... use 2 messages with window 0.5 s instead:
        rc = main(["-s", f"beast://127.0.0.1:{srvs[0].port}",
                   "-s", f"beast://127.0.0.1:{srvs[1].port}", "-n",
                   "--max-messages", "3", "--dedup-window", "0.5",
                   "--stats-interval", "0"])
    finally:
        feeding.set()
        t.join()
        for s in srvs:
            s.close()
    assert rc == 0


def test_mlat_over_beastgps_feeds():
    """Full loop: 4 GPS-disciplined Beast stations -> modes_mlat solves the
    aircraft position from TDOA (SURVEY.md §3.5, online)."""
    import numpy as np
    from airmodes.apps.modes_mlat import main as mlat_main
    from airmodes.decode import mlat as M

    C_LIGHT = 299792458.0
    stations = [(47.00, 8.00, 500.0), (47.25, 8.05, 420.0),
                (46.95, 8.40, 610.0), (47.15, 8.30, 800.0)]
    aircraft = (47.10, 8.20, 10000.0)
    ac = M.llh2ecef(aircraft)
    t_emit = time.time()
    arrivals = [t_emit + float(np.linalg.norm(ac - M.llh2ecef(s))) / C_LIGHT
                for s in stations]
    frame = encoder.df17_frame(0x4840D6, encoder.me_identification("MLAT01"))
    flushf = encoder.df17_frame(0x111111, encoder.me_identification("FLUSH"))

    srvs = [output_beast(port=0, host="127.0.0.1", gps_time=True)
            for _ in stations]
    feeding = threading.Event()

    def feeder():
        while not feeding.is_set():
            for i, s in enumerate(srvs):
                s.output(_wire(frame, 112, ts=arrivals[i]))
                # a later unrelated frame ages the correlation window out
                s.output(_wire(flushf, 112, ts=arrivals[i] + 1.0))
            time.sleep(0.05)

    th = threading.Thread(target=feeder, daemon=True)
    th.start()
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    try:
        argv = []
        for (lat, lon, alt), s in zip(stations, srvs):
            argv += ["-S", f"{lat},{lon},{alt}@beastgps://127.0.0.1:{s.port}"]
        # generous wall deadline + early exit on the first solution:
        # a fixed short deadline flaked when the suite ran under CPU
        # contention (connections + clock aging need wall time)
        argv += ["--alt-datum", "ellipsoid", "--max-seconds", "60",
                 "--max-solutions", "1"]
        with redirect_stdout(buf):
            rc = mlat_main(argv)
    finally:
        feeding.set()
        th.join()
        for s in srvs:
            s.close()
    assert rc == 0
    sols = [ln for ln in buf.getvalue().splitlines()
            if ln.startswith("mlat") and "4840d6" in ln]
    assert sols, f"no mlat solution: {buf.getvalue()!r}"
    lat = float(sols[0].split("(")[1].split(",")[0])
    lon = float(sols[0].split(",")[1].split(")")[0])
    assert abs(lat - aircraft[0]) < 0.02 and abs(lon - aircraft[1]) < 0.02


# --- review-finding regressions ------------------------------------------

def test_frame_to_wire_rejects_undefined_dfs():
    """Same DF whitelist as the slicer: DF1-3/6-10/12-15/19/22/23 are noise."""
    for df in (1, 2, 3, 6, 7, 8, 9, 10, 12, 13, 14, 15):
        body = df << 51
        frame = (body << 24) | crc.parity(body >> 24 if False else body, 32)
        # build a parity-clean 56-bit frame with this DF
        payload = df << 27  # 32 message bits
        frame = (payload << 24) | crc.parity(payload, 32)
        assert frame_to_wire(f"{frame:014x}") is None, df
    for df in (19, 22, 23):
        payload = df << 83  # 88 message bits of a 112-bit frame
        frame = (payload << 24) | crc.parity(payload, 88)
        assert frame_to_wire(f"{frame:028x}") is None, df


def test_replay_gps_layout_spacing(tmp_path):
    """A -B --beast-gps recording replays with true 1 s spacing, not the
    2^30/12e6 ~ 89.5 s a classic-counter interpretation would produce."""
    from airmodes.io.netclient import replay_file
    from airmodes.outputs.beast import beast_encode
    base = 1_700_000_000.25
    blob = b"".join(beast_encode(h, -15.0, base + i, gps_time=True)
                    for i, h in enumerate([DF17_HEX, DF4_HEX, DF11_HEX]))
    p = tmp_path / "rec.beastgps"
    p.write_bytes(blob)
    offs = [off for _, off in replay_file(str(p), fmt="beast",
                                          gps_time=True, epoch=100.0)]
    assert offs == pytest.approx([0.0, 1.0, 2.0], abs=1e-6)
    # classic interpretation really would be wrong (guards the guard)
    offs_classic = [off for _, off in replay_file(str(p), epoch=100.0)]
    assert offs_classic[1] > 80.0


def test_replay_gps_midnight_rollover(tmp_path):
    from airmodes.io.netclient import replay_file
    from airmodes.outputs.beast import beast_encode
    day = 1_700_006_400.0 - (1_700_006_400.0 % 86400.0)
    blob = (beast_encode(DF17_HEX, -15.0, day + 86399.5, gps_time=True) +
            beast_encode(DF4_HEX, -15.0, day + 86400.5, gps_time=True))
    p = tmp_path / "mid.beastgps"
    p.write_bytes(blob)
    offs = [off for _, off in replay_file(str(p), fmt="beast",
                                          gps_time=True, epoch=0.0)]
    assert offs == pytest.approx([0.0, 1.0], abs=1e-6)


def test_frame_deduper_hard_cap():
    from airmodes.io.netclient import frame_deduper
    d = frame_deduper(window_s=300.0, max_entries=100)
    for i in range(500):
        d.accept(f"{i:06x}", now=1000.0 + i * 0.01)  # all within window
    assert len(d._last) <= 101
    # newest entries retained: an immediate duplicate is still suppressed
    assert not d.accept(f"{499:06x}", now=1005.0)


def test_beast_parser_skips_radarcape_status():
    from airmodes.outputs.beast import beast_encode
    status = b"\x1a\x34" + bytes(6) + b"\x00" + bytes(range(14))
    whole = beast_encode(DF17_HEX, -20.0, 1.0)
    frames = beast_parser().push(status + whole + status)
    mtypes = [f[0] for f in frames]
    assert 0x33 in mtypes
    assert [f[3].hex() for f in frames if f[0] == 0x33] == [DF17_HEX]


def test_modes_rx_rejects_bad_net_url(capsys):
    from airmodes.apps.modes_rx import main
    assert main(["-s", "beast://rx30005", "-n"]) == 2     # missing colon
    err = capsys.readouterr().err
    assert "beast://rx30005" in err


def test_modes_rx_rejects_net_url_replay(capsys):
    from airmodes.apps.modes_rx import main
    rc = main(["-s", "beast://rx:30005", "--file-format", "beast", "-n"])
    assert rc == 2


def test_modes_gui_rejects_bad_net_url(capsys):
    from airmodes.apps.modes_gui import main as gui_main
    assert gui_main(["-s", "beast://rx30005", "--backend", "curses",
                     "--duration", "1"]) == 2
    assert gui_main(["-s", "ftp://rx:1", "--backend", "curses",
                     "--duration", "1"]) == 2


def test_modes_rx_beast_port_zero_starts_server(tmp_path):
    """-B 0 (OS-assigned port) must start the server, not silently skip."""
    import airmodes.outputs.beast as beast_mod
    from airmodes.apps.modes_rx import main
    made = []
    real = beast_mod.output_beast

    class spy(real):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            made.append(self.port)

    beast_mod.output_beast = spy
    try:
        rc = main(["-s", "synthetic", "-n", "-B", "0", "--max-blocks", "1",
                   "--block-size", str(1 << 16), "--stats-interval", "0"])
    finally:
        beast_mod.output_beast = real
    assert rc == 0 and made and made[0] > 0


def test_mlat_clock_sync_over_plain_beast_feeds():
    """Flagship: TDOA over receivers with FREE-RUNNING 12 MHz counters and
    different boot epochs (no GPS discipline) — DF17 position frames train
    per-station clock offsets; a DF4 target then solves."""
    import numpy as np
    from airmodes.apps.modes_mlat import main as mlat_main
    from airmodes.decode import mlat as M
    from airmodes.decode.altitude import encode_alt_q

    C_LIGHT = 299792458.0
    stations = [(47.00, 8.00, 500.0), (47.25, 8.05, 420.0),
                (46.95, 8.40, 610.0), (47.15, 8.30, 800.0)]
    ref_pos = (47.08, 8.12, 10000.0)
    target = (47.12, 8.28, 9500.0)
    boot = [0.0, 1234.5, 99.25, 7.75]           # different boot epochs
    ref_icao, tgt_icao = 0x4840D6, 0xABCDEF
    tgt_frame = encoder.df4_frame(tgt_icao, encode_alt_q(target[2] / 0.3048))

    def arrivals(pos, t_emit):
        p = M.llh2ecef(pos)
        return [t_emit + float(np.linalg.norm(p - M.llh2ecef(s))) / C_LIGHT
                for s in stations]

    srvs = [output_beast(port=0, host="127.0.0.1") for _ in stations]
    stop = threading.Event()

    def feeder():
        k = 0
        while not stop.is_set():
            t = time.time()
            batch = []
            for odd in (False, True):
                me = encoder.me_airborne_position(
                    ref_pos[2] / 0.3048, ref_pos[0], ref_pos[1], odd=odd)
                batch.append((encoder.df17_frame(ref_icao, me), 112, ref_pos))
            batch.append((tgt_frame, 56, target))
            for j, (frame, nbits, pos) in enumerate(batch):
                ts = arrivals(pos, t + 0.02 * j)
                for s, srv in enumerate(srvs):
                    srv.output(_wire(frame, nbits, ts=ts[s] + boot[s]))
            k += 1
            stop.wait(0.2)

    th = threading.Thread(target=feeder, daemon=True)
    th.start()
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    try:
        argv = []
        for (lat, lon, alt), s in zip(stations, srvs):
            argv += ["-S", f"{lat},{lon},{alt}@beast://127.0.0.1:{s.port}"]
        # generous wall deadline + early exit after a few solutions:
        # fixed short deadlines flake under full-suite CPU contention
        argv += ["--alt-datum", "ellipsoid", "--clock-sync",
                 "--max-seconds", "90", "--max-solutions", "3"]
        with redirect_stdout(buf):
            rc = mlat_main(argv)
    finally:
        stop.set()
        th.join()
        for s in srvs:
            s.close()
    assert rc == 0
    want_hex = f"{tgt_frame:014x}"
    sols = [ln for ln in buf.getvalue().splitlines()
            if ln.startswith("mlat") and want_hex in ln]
    assert sols, f"target never solved: {buf.getvalue()!r}"
    lat = float(sols[-1].split("(")[1].split(",")[0])
    lon = float(sols[-1].split(",")[1].split(")")[0])
    assert abs(lat - target[0]) < 0.03 and abs(lon - target[1]) < 0.03


def test_beast_parser_fuzz_never_crashes():
    """Arbitrary bytes (any chunking) must never crash the de-framer or
    yield payloads of impossible length; real frames interleaved with
    garbage still come through."""
    import random
    rng = random.Random(1234)
    p = beast_parser()
    real = beast_encode(DF17_HEX, -20.0, 1.0)
    stream = bytearray()
    for _ in range(200):
        stream += bytes(rng.randrange(256) for _ in range(rng.randrange(40)))
        stream += real
    i = 0
    got = []
    while i < len(stream):
        n = rng.randrange(1, 64)
        got += p.push(bytes(stream[i:i + n]))
        i += n
    for mtype, mlat, sig, payload in got:
        assert mtype in (0x31, 0x32, 0x33, 0x34)
        assert len(payload) in (2, 7, 14)
        assert 0 <= mlat < (1 << 48) and 0 <= sig < 256
    # the real frames survive the garbage (resync can consume a frame
    # adjacent to pathological bytes, but the vast majority decode)
    real_count = sum(1 for f in got if f[3].hex() == DF17_HEX)
    assert real_count >= 150


def test_frame_to_wire_fuzz_never_crashes():
    import random
    rng = random.Random(99)
    for _ in range(500):
        n = rng.choice((14, 28, rng.randrange(0, 40)))
        s = "".join(rng.choice("0123456789abcdefxyz_") for _ in range(n))
        w = frame_to_wire(s)   # must return str or None, never raise
        if w is not None:
            parts = w.split()
            assert len(parts) == 6 and parts[1] == s.lower()


def test_ns_roundtrip_beast_gps_loop():
    """Wire ns -> output_beast GPS counter -> parse -> replay wire: the
    1 ns counter resolution survives the full record/replay loop (float64
    wire seconds alone would quantize to ~238 ns)."""
    from airmodes.outputs.beast import beast_encode, gps_counter_ns
    from airmodes.io.netclient import beast_parser, replay_file
    import tempfile, os
    from airmodes.testing import encoder

    frame = encoder.df17_frame(0xABC123, encoder.me_identification("NSRT"))
    hexframe = f"{frame:028x}"
    base_ns = 1_700_000_000_123_456_789
    offs = [0, 437, 83_333, 1_000_000_007]        # ns offsets, sub-us apart
    buf = b""
    for o in offs:
        buf += beast_encode(hexframe, -20.0, (base_ns + o) * 1e-9,
                            gps_time=True, timestamp_ns=base_ns + o)
    # counters decode back exactly
    recs = list(beast_parser().push(buf))
    assert len(recs) == len(offs)
    for (mtype, mlat, sig, payload), o in zip(recs, offs):
        assert mlat == gps_counter_ns(base_ns + o)
    # replay regenerates wire messages whose ns field preserves spacing
    with tempfile.NamedTemporaryFile(suffix=".beast", delete=False) as f:
        f.write(buf)
        path = f.name
    try:
        wires = [w for w, _ in replay_file(path, fmt="beast",
                                           epoch=1000.0, gps_time=True)]
    finally:
        os.unlink(path)
    ns_vals = [int(w.split()[6]) for w in wires]
    spac = [b - a for a, b in zip(ns_vals, ns_vals[1:])]
    want = [b - a for a, b in zip(offs, offs[1:])]
    assert spac == want, (spac, want)


# ---- r4 review-sweep regressions -------------------------------------------

def test_avr_counter_strict_hex():
    """int(x, 16) accepts '-'/'_'/whitespace — a garbled '@' record must
    drop, not mint a bogus (even negative) mlat counter."""
    from airmodes.io.netclient import avr_to_hex
    assert avr_to_hex("@-23456789ab8d4840d6202cc371c32ce0576098;") is None
    assert avr_to_hex("@1_234567890a8d4840d6202cc371c32ce0576098;") is None
    assert avr_to_hex("@ 1234567890a8d4840d6202cc371c32ce0576098;") is None
    got = avr_to_hex("@0123456789ab8d4840d6202cc371c32ce0576098;")
    assert got is not None and got[1] == 0x0123456789AB


def test_close_before_start_is_safe():
    """client_for_url returns UNSTARTED clients; error-path cleanup may
    close one before start (joining a never-started thread raises)."""
    from airmodes.io.netclient import net_client
    cli = net_client("127.0.0.1", 1, lambda m: None)
    cli.close()          # must not raise


def test_gps_mode_drops_counterless_records():
    """timestamps='gps' must not silently stamp host time (ms jitter)
    onto a ns-grade feed — counter-less records drop, like 'mlat' mode."""
    from airmodes.io.netclient import net_client
    got = []
    cli = net_client("127.0.0.1", 1, got.append, timestamps="gps")
    cli._emit("8d4840d6202cc371c32ce0576098", None, None)
    assert got == [] and cli.n_dropped == 1
    cli._emit("8d4840d6202cc371c32ce0576098", None,
              (43200 << 30) | 500)     # GPS counter present: emitted
    assert len(got) == 1 and len(got[0].split()) == 7


def test_replay_classic_counter_reset_reanchors(tmp_path):
    """A recording whose remote receiver restarted mid-capture (12 MHz
    counter resets near 0) must keep stream time monotonic instead of
    jumping months negative."""
    from airmodes.io.netclient import replay_file
    from airmodes.outputs.beast import beast_encode
    frames = [encoder.df17_frame(0x400000 + k,
                                 encoder.me_identification(f"R{k}"))
              for k in range(4)]
    path = tmp_path / "reset.beast"
    with open(path, "wb") as f:
        # two frames at 1 s / 2 s of counter time, then a reset to near
        # zero (counter = timestamp * 12 MHz)
        for k, ts in enumerate([1.0, 2.0, 5e-5, 1.00005]):
            data = beast_encode(f"{frames[k]:028x}", -20.0, ts)
            f.write(data)
    out = list(replay_file(str(path), fmt="beast", epoch=1000.0))
    assert len(out) == 4
    offs = [off for _, off in out]
    assert offs == sorted(offs), offs            # monotonic stream time
    assert all(o >= 0 for o in offs), offs
    # spacing after the reset is preserved (1 s between frames 3 and 4)
    assert abs((offs[3] - offs[2]) - 1.0) < 1e-6


def test_zmq_pubaddr_only_local_subscribers_fire():
    """r4 review: with only a PUB socket (no SUB bridge), local
    subscribers were registered but never invoked."""
    zmq = pytest.importorskip("zmq")
    from airmodes.io.relay import zmq_pubsub_iface
    iface = zmq_pubsub_iface(pubaddr="tcp://127.0.0.1:*")
    got = []
    iface.subscribe("dl_data", got.append)
    iface.publish("dl_data", "hello")
    iface.close()
    assert got == ["hello"]


def test_replay_gps_long_gap_and_multiday(tmp_path):
    """GPS sec-of-day replay must stay monotone across gaps > 12 h and
    across MULTIPLE midnights: the old one-shot +-12 h patch (relative
    to the first frame) replayed a 13 h-later frame 11 h BEFORE the
    start and aliased days 2+ onto day one (r4 io review, repro'd)."""
    from airmodes.io.netclient import replay_file
    from airmodes.outputs.beast import beast_encode
    day = 1_700_006_400.0 - (1_700_006_400.0 % 86400.0)
    times = [day + 23 * 3600.0,            # 23:00 day 0
             day + 23 * 3600.0 + 10.0,
             day + 86400.0 + 12 * 3600.0,  # 12:00 day 1 (13 h gap)
             day + 86400.0 + 12 * 3600.0 + 10.0,
             day + 2 * 86400.0 + 1 * 3600.0]   # 01:00 day 2
    blob = b"".join(beast_encode(DF17_HEX, -15.0, t, gps_time=True)
                    for t in times)
    p = tmp_path / "multiday.beastgps"
    p.write_bytes(blob)
    offs = [off for _, off in replay_file(str(p), fmt="beast",
                                          gps_time=True, epoch=0.0)]
    want = [t - times[0] for t in times]
    assert offs == pytest.approx(want, abs=1e-6), offs


def test_net_client_gps_rejects_out_of_layout_counters():
    """A counter outside the GPS layout's domain (sod >= 86400 or
    ns >= 1e9 — an unlocked/misconfigured receiver) must be dropped and
    counted, not mapped to a plausible UTC time and fed to mlat as
    GPS-grade (r4 io review)."""
    from airmodes.io.netclient import net_client
    got = []
    cli = net_client("127.0.0.1", 1, got.append, fmt="beast",
                     timestamps="gps")
    bad_sod = (100_000 << 30) | 5        # sod 100000 > 86399
    bad_ns = (100 << 30) | 1_073_000_000  # ns part >= 1e9
    good = (100 << 30) | 5
    n0 = cli.n_dropped
    cli._emit(DF17_HEX, 0x40, bad_sod)
    cli._emit(DF17_HEX, 0x40, bad_ns)
    assert cli.n_dropped == n0 + 2 and got == []
    cli._emit(DF17_HEX, 0x40, good)
    assert len(got) == 1 and cli.n_dropped == n0 + 2


def test_zmq_unsubscribe_releases_publisher_side():
    """unsubscribe() must queue a zmq UNSUBSCRIBE (not only remove the
    local callback): the class's design drops unwanted topics at the
    PUBLISHER, and the old code kept shipping them over TCP forever
    (r4 io review). Re-subscribing must restore delivery (both op kinds
    flow through the bridge thread)."""
    from airmodes.io.relay import zmq_pubsub_iface, HAVE_ZMQ
    if not HAVE_ZMQ:
        pytest.skip("pyzmq unavailable")
    import zmq as zmq_mod
    pub = zmq_pubsub_iface(pubaddr="tcp://127.0.0.1:*")
    addr = pub._pub.getsockopt(zmq_mod.LAST_ENDPOINT).decode()
    sub = zmq_pubsub_iface(subaddr=addr)
    got = []
    cb = got.append
    sub.subscribe("t1", cb)
    deadline = time.time() + 5
    while not got and time.time() < deadline:
        pub.publish("t1", "hello")
        time.sleep(0.05)
    assert got
    sub.unsubscribe("t1", cb)
    time.sleep(0.3)                      # bridge applies the UNSUBSCRIBE
    n = len(got)
    for _ in range(5):
        pub.publish("t1", "gone")
        time.sleep(0.05)
    assert len(got) == n                 # nothing delivered post-unsub
    sub.subscribe("t1", cb)              # resubscribe restores delivery
    deadline = time.time() + 5
    while len(got) == n and time.time() < deadline:
        pub.publish("t1", "back")
        time.sleep(0.05)
    assert len(got) > n and got[-1] == "back"
    sub.close()
    pub.close()

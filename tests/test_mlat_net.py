"""Online mlat correlator + modes_mlat app (SURVEY.md §3.5 closed loop)."""

import threading
import time

import numpy as np
import pytest

from airmodes.decode import mlat as M
from airmodes.decode.mlat_net import mlat_correlator
from airmodes.testing import encoder

C_LIGHT = 299792458.0

STATIONS = [(47.00, 8.00, 500.0), (47.25, 8.05, 420.0),
            (46.95, 8.40, 610.0), (47.15, 8.30, 800.0)]
AIRCRAFT = (47.10, 8.20, 10000.0)


def _arrivals(aircraft, stations, t_emit=100.0):
    ac = M.llh2ecef(aircraft)
    return [t_emit + float(np.linalg.norm(ac - M.llh2ecef(s))) / C_LIGHT
            for s in stations]


def _wire(frame, nbits, ts):
    df = frame >> (nbits - 5)
    return f"{df} {frame:0{nbits // 4}x} 000000 0 -20.0 {ts:.9f}"


def test_correlator_solves_4_station_frame():
    corr = mlat_correlator(STATIONS, alt_datum="ellipsoid")
    frame = encoder.df17_frame(0x4840D6, encoder.me_identification("MLAT01"))
    ts = _arrivals(AIRCRAFT, STATIONS)
    sols = []
    for i in range(4):
        sols += corr.feed(i, _wire(frame, 112, ts[i]))
    assert sols == []                       # window not aged yet
    sols = corr.flush(now=ts[0] + 1.0)
    assert len(sols) == 1
    s = sols[0]
    assert s.n_stations == 4 and s.icao == 0x4840D6
    assert abs(s.lat - AIRCRAFT[0]) < 0.01
    assert abs(s.lon - AIRCRAFT[1]) < 0.01
    assert abs(s.alt_m - AIRCRAFT[2]) < 300.0
    assert corr.flush(now=ts[0] + 2.0) == []   # cleared


def test_correlator_3_station_altitude_constraint():
    from airmodes.decode.altitude import encode_alt_q
    alt_ft = AIRCRAFT[2] / 0.3048
    frame = encoder.df4_frame(0xABCDEF, encode_alt_q(alt_ft))
    corr = mlat_correlator(STATIONS[:3], alt_datum="ellipsoid")
    ts = _arrivals(AIRCRAFT, STATIONS[:3])
    for i in range(3):
        corr.feed(i, _wire(frame, 56, ts[i]))
    sols = corr.flush(now=ts[0] + 1.0)
    assert len(sols) == 1
    s = sols[0]
    assert s.icao is None                   # AP-overlaid frame
    assert abs(s.lat - AIRCRAFT[0]) < 0.02
    assert abs(s.lon - AIRCRAFT[1]) < 0.02


def test_correlator_keeps_earliest_arrival_and_needs_min():
    corr = mlat_correlator(STATIONS, min_stations=3,
                           alt_datum="ellipsoid")
    # altitude-carrying position frame: 3-station groups need the
    # altitude constraint (2 TDOAs cannot fix 3 unknowns)
    frame = encoder.df17_frame(0x111111, encoder.me_airborne_position(
        AIRCRAFT[2] / 0.3048, AIRCRAFT[0], AIRCRAFT[1], odd=False))
    ts = _arrivals(AIRCRAFT, STATIONS)
    corr.feed(0, _wire(frame, 112, ts[0]))
    corr.feed(0, _wire(frame, 112, ts[0] + 2e-6))  # multipath copy: later
    corr.feed(1, _wire(frame, 112, ts[1]))
    # only 2 stations: aged entry is dropped without a solution
    assert corr.flush(now=ts[0] + 1.0) == []
    # fresh cycle with 3 stations solves
    for i in range(3):
        corr.feed(i, _wire(frame, 112, ts[i]))
    assert len(corr.flush(now=ts[0] + 1.0)) == 1


def test_modes_mlat_app_over_zmq(capsys):
    """Three zmq publishers -> modes_mlat main -> printed solution."""
    zmq = pytest.importorskip("zmq")
    from airmodes.io.relay import zmq_pubsub_iface
    from airmodes.apps import modes_mlat

    pubs, addrs = [], []
    for _ in range(3):
        p = zmq_pubsub_iface(pubaddr="tcp://127.0.0.1:*")
        pubs.append(p)
        addrs.append(p._pub.getsockopt(zmq.LAST_ENDPOINT).decode())

    argv = [f"-S{STATIONS[i][0]},{STATIONS[i][1]},{STATIONS[i][2]}"
            f"@{addrs[i]}" for i in range(3)]
    argv += ["--alt-datum", "ellipsoid", "--max-seconds", "6"]
    th = threading.Thread(target=modes_mlat.main, args=(argv,), daemon=True)
    th.start()
    time.sleep(1.0)                         # let SUB sockets connect

    frame = encoder.df17_frame(0x4840D6, encoder.me_airborne_position(
        AIRCRAFT[2] / 0.3048, AIRCRAFT[0], AIRCRAFT[1], odd=False))
    ts = _arrivals(AIRCRAFT, STATIONS[:3])
    for i in range(3):
        pubs[i].publish("dl_data", _wire(frame, 112, ts[i]))
    time.sleep(0.3)
    # a later unrelated message ages the window out
    other = encoder.df17_frame(0x222222, encoder.me_identification("AGE"))
    pubs[0].publish("dl_data", _wire(other, 112, ts[0] + 1.0))
    th.join(timeout=10)
    for p in pubs:
        p.close()
    out = capsys.readouterr().out
    assert "mlat " in out and "4840d6" in out, out


# --- clock sync: mlat without GPS-disciplined receivers -------------------

def test_clock_sync_estimates_offsets():
    from airmodes.decode.mlat_net import clock_sync
    sync = clock_sync(STATIONS, min_updates=3)
    true_off = [0.0, 0.004, -0.0035, 0.0012]
    ref_ac = [(47.05, 8.10, 9000.0), (47.20, 8.25, 11000.0),
              (46.99, 8.15, 8000.0)]
    for pos in ref_ac:
        t = _arrivals((pos[0], pos[1], pos[2]), STATIONS)
        arr = {s: t[s] + true_off[s] for s in range(4)}
        sync.update(arr, (pos[0], pos[1], pos[2]))
    for s in range(1, 4):
        assert sync.offset[s] == pytest.approx(true_off[s], abs=1e-7)
    corrected = sync.correct({s: 100.0 + true_off[s] for s in range(4)})
    assert corrected is not None
    vals = list(corrected.values())
    assert max(vals) - min(vals) < 1e-6


def test_clock_sync_correlator_solves_unsynced_feeds():
    """DF17 position frames train the offsets; a DF4 target then solves
    with sub-km accuracy despite ms-scale clock offsets."""
    from airmodes.decode.altitude import encode_alt_q
    from airmodes.decode.mlat_net import mlat_correlator
    from airmodes import crc

    def wire_crc(frame, nbits, ts):
        s = crc.crc24(frame, nbits)
        return (f"{frame >> (nbits - 5)} {frame:0{nbits // 4}x} {s:06x} 0 "
                f"-20.0 {ts:.9f}")

    true_off = [0.0, 0.006, -0.004, 0.002]
    corr = mlat_correlator(STATIONS, alt_datum="ellipsoid", window_s=0.1,
                           clock_sync_enabled=True)
    ref_pos = (47.08, 8.12, 10000.0)
    target = (47.12, 8.28, 9500.0)
    tgt_frame = encoder.df4_frame(0xABCDEF,
                                  encode_alt_q(target[2] / 0.3048))
    sols = []
    t_emit = 100.0
    for k in range(6):
        for odd in (False, True):
            me = encoder.me_airborne_position(
                ref_pos[2] / 0.3048, ref_pos[0], ref_pos[1], odd=odd)
            f = encoder.df17_frame(0x4840D6, me)
            ts = _arrivals(ref_pos, STATIONS, t_emit)
            for s in range(4):
                sols += corr.feed(s, wire_crc(f, 112, ts[s] + true_off[s]))
            t_emit += 0.5
        ts = _arrivals(target, STATIONS, t_emit)
        for s in range(4):
            sols += corr.feed(s, wire_crc(tgt_frame, 56,
                                          ts[s] + true_off[s]))
        t_emit += 0.5
    sols += corr.flush(now=t_emit + 10.0, force=True)
    tgt_sols = [s for s in sols if s.hexframe == f"{tgt_frame:014x}"]
    assert tgt_sols, "target never solved"
    s = tgt_sols[0]
    assert abs(s.lat - target[0]) < 0.01
    assert abs(s.lon - target[1]) < 0.01
    # the reference's own frames never produce TDOA output
    assert all(sol.icao != 0x4840D6 for sol in sols)


def test_clock_sync_blocks_unconverged_stations():
    from airmodes.decode.mlat_net import clock_sync
    sync = clock_sync(STATIONS, min_updates=3)
    # only one reference observation: stations 1-3 not converged
    t = _arrivals((47.05, 8.10, 9000.0), STATIONS)
    sync.update({s: t[s] for s in range(4)}, (47.05, 8.10, 9000.0))
    assert sync.correct({0: 1.0, 1: 1.0}) is None
    assert sync.correct({0: 1.0}) is not None  # anchor alone is converged


def test_clock_sync_tracks_counter_drift():
    """ppm-level crystal drift is extrapolated, so a target solved seconds
    after the last reference still corrects to us level."""
    from airmodes.decode.mlat_net import clock_sync
    sync = clock_sync(STATIONS, min_updates=3)
    rates = [0.0, 5e-6, -3e-6, 8e-6]          # 3-8 ppm drift
    base = [0.0, 0.002, -0.001, 0.0005]

    def off(s, t):
        return base[s] + rates[s] * (t - 100.0)

    for k in range(20):                        # references 1 s apart
        pos = (47.05 + 0.001 * k, 8.10, 9000.0)
        ts = _arrivals(pos, STATIONS, 100.0 + k)
        sync.update({s: ts[s] + off(s, ts[s]) for s in range(4)}, pos)
    for s in range(1, 4):
        assert sync.rate[s] == pytest.approx(rates[s], abs=5e-7)
    # 10 s after the last reference: a constant-offset model would be off
    # by up to 80 us (24 km); the drift model stays within ~1 us
    t = 130.0
    corrected = sync.correct({s: t + off(s, t) for s in range(4)})
    vals = list(corrected.values())
    assert max(vals) - min(vals) < 2e-6


def test_ap_overlay_solution_carries_icao():
    """DF4 targets are AP-overlaid: the wire syndrome IS the address, and
    the TDOA solution must carry it (not be anonymous)."""
    from airmodes.decode.altitude import encode_alt_q
    frame = encoder.df4_frame(0xABCDEF, encode_alt_q(30000.0))
    corr = mlat_correlator(STATIONS, alt_datum="ellipsoid")
    ts = _arrivals(AIRCRAFT, STATIONS)

    def wire_addr(f, nbits, t):
        from airmodes import crc
        s = crc.crc24(f, nbits)
        return f"{f >> (nbits - 5)} {f:0{nbits // 4}x} {s:06x} 3 -20.0 {t:.9f}"

    for i in range(4):
        corr.feed(i, wire_addr(frame, 56, ts[i]))
    sols = corr.flush(now=ts[0] + 1.0)
    assert len(sols) == 1 and sols[0].icao == 0xABCDEF


# --- clock-sync robustness (review findings) ------------------------------

def _train(sync, true_off, n=5, t0=100.0):
    for k in range(n):
        pos = (47.05 + 0.001 * k, 8.10, 9000.0)
        ts = _arrivals(pos, STATIONS, t0 + k)
        sync.update({s: ts[s] + true_off[s] for s in range(4)}, pos)
    return t0 + n


def test_clock_sync_reset_station():
    from airmodes.decode.mlat_net import clock_sync
    sync = clock_sync(STATIONS, min_updates=3)
    _train(sync, [0.0, 0.002, -0.001, 0.0005])
    assert sync.correct({s: 110.0 for s in range(4)}) is not None
    sync.reset_station(2)
    assert sync.n_updates[2] == 0 and sync.offset[2] == 0.0
    assert sync.correct({0: 110.0, 2: 110.0}) is None    # must re-converge
    assert sync.correct({0: 110.0, 1: 110.0}) is not None


def test_clock_sync_anchor_promotion_when_station0_dead():
    """Anchor feed offline at cold start: another station is promoted so
    the healthy subset still converges."""
    from airmodes.decode.mlat_net import clock_sync
    sync = clock_sync(STATIONS, min_updates=3)
    off = [None, 0.003, -0.002, 0.001]   # station 0 never reports
    for k in range(30):
        pos = (47.05 + 0.0005 * k, 8.10, 9000.0)
        ts = _arrivals(pos, STATIONS, 100.0 + k * 0.5)
        sync.update({s: ts[s] + off[s] for s in (1, 2, 3)}, pos)
    assert sync.anchor in (1, 2, 3)
    t = 120.0
    corrected = sync.correct({s: t + off[s] for s in (1, 2, 3)})
    assert corrected is not None
    vals = list(corrected.values())
    assert max(vals) - min(vals) < 1e-6


def test_clock_sync_outlier_rejected():
    from airmodes.decode.mlat_net import clock_sync
    sync = clock_sync(STATIONS, min_updates=3)
    off = [0.0, 0.002, -0.001, 0.0005]
    t_end = _train(sync, off)
    before = sync.offset[1]
    # one garbled reference: 50 ms residual must NOT move the offset
    pos = (47.05, 8.10, 9000.0)
    ts = _arrivals(pos, STATIONS, t_end)
    bad = {s: ts[s] + off[s] for s in range(4)}
    bad[1] += 0.050
    sync.update(bad, pos)
    assert sync.offset[1] == pytest.approx(before, abs=1e-9)
    assert sync.n_outliers[1] == 1


def test_clock_sync_staleness_blocks_solving():
    from airmodes.decode.mlat_net import clock_sync
    sync = clock_sync(STATIONS, min_updates=3, max_age_s=60.0)
    off = [0.0, 0.002, -0.001, 0.0005]
    t_end = _train(sync, off)
    assert sync.correct({s: t_end + 30 for s in range(4)}) is not None
    assert sync.correct({s: t_end + 120 for s in range(4)}) is None


def test_correlator_spread_gate_rejects_merged_transmissions():
    """Two interrogation replies 30 ms apart with disjoint station sets
    merge under the wide clock-sync window -> rejected, not solved."""
    from airmodes.decode.mlat_net import mlat_correlator
    from airmodes.decode.altitude import encode_alt_q
    from airmodes import crc
    corr = mlat_correlator(STATIONS, alt_datum="ellipsoid", window_s=0.05,
                           clock_sync_enabled=True)
    # converge the sync first
    for k in range(5):
        pos = (47.05 + 0.001 * k, 8.10, 9000.0)
        me_e = encoder.me_airborne_position(pos[2] / 0.3048, pos[0],
                                            pos[1], odd=False)
        me_o = encoder.me_airborne_position(pos[2] / 0.3048, pos[0],
                                            pos[1], odd=True)
        for me in (me_e, me_o):
            f = encoder.df17_frame(0x4840D6, me)
            s_ = crc.crc24(f, 112)
            ts = _arrivals(pos, STATIONS, 100.0 + k)
            for s in range(4):
                corr.feed(s, f"17 {f:028x} {s_:06x} 0 -20.0 "
                          f"{ts[s]:.9f}")
    tgt = encoder.df4_frame(0xABCDEF, encode_alt_q(30000.0))
    s_ = crc.crc24(tgt, 56)
    ts1 = _arrivals(AIRCRAFT, STATIONS, 200.0)
    ts2 = _arrivals(AIRCRAFT, STATIONS, 200.030)   # second reply 30 ms on
    sols = []
    for s in (0, 1):                               # stations 0,1 hear #1
        sols += corr.feed(s, f"4 {tgt:014x} {s_:06x} 3 -20.0 {ts1[s]:.9f}")
    for s in (2, 3):                               # stations 2,3 hear #2
        sols += corr.feed(s, f"4 {tgt:014x} {s_:06x} 3 -20.0 {ts2[s]:.9f}")
    sols += corr.flush(now=210.0, force=True)
    assert not [x for x in sols if x.hexframe == f"{tgt:014x}"]


def test_net_client_signed_counter_and_counterless_drop():
    from airmodes.io.netclient import net_client
    got = []
    cli = net_client("h", 1, got.append, fmt="beast", timestamps="mlat")
    frame = f"{encoder.df4_frame(0x4840D6, 0x1234):014x}"
    # anchor on first frame; a counter 12 ticks BELOW anchor is ~1 us
    # early, not +271 days
    c0 = 10_000_000
    cli._emit(frame, 100, c0)
    cli._emit(frame, 100, c0 - 12)
    assert len(got) == 2
    t0, t1 = (float(w.split()[5]) for w in got)
    # tolerance: float64 ulp at unix-epoch magnitude is ~0.24 us — the
    # inherent quantization of absolute-seconds wire timestamps
    assert t1 - t0 == pytest.approx(-1e-6, abs=3e-7)
    # counter-less record under mlat mode: dropped, not host-stamped
    n = cli.n_dropped
    cli._emit(frame, 100, None)
    assert cli.n_dropped == n + 1 and len(got) == 2
    # a huge counter jump (remote reset) re-anchors and notifies
    hits = []
    cli.on_reanchor = lambda: hits.append(1)
    cli._emit(frame, 100, c0 + 2 * 3600 * 12_000_000)
    assert hits == [1] and len(got) == 3


def test_net_client_no_false_reanchor_on_old_connection():
    """A healthy hour-old connection must NOT trip the counter-reset
    detector (divergence, not age, marks a reset)."""
    import time as _time
    from airmodes.io.netclient import net_client, MLAT_HZ
    got, hits = [], []
    cli = net_client("h", 1, got.append, fmt="beast", timestamps="mlat")
    cli.on_reanchor = lambda: hits.append(1)
    frame = f"{encoder.df4_frame(0x4840D6, 0x1234):014x}"
    c0 = 5_000_000_000
    cli._anchor = (_time.time() - 7200.0, c0)   # anchored 2 h ago
    cli._emit(frame, 100, c0 + int(7200.0 * MLAT_HZ))  # counter tracked
    assert hits == [] and len(got) == 1
    # counter that did NOT advance with wall time -> genuine reset
    cli._emit(frame, 100, c0 + 1000)
    assert hits == [1]


def test_clock_sync_anchor_reset_resets_everyone():
    from airmodes.decode.mlat_net import clock_sync
    sync = clock_sync(STATIONS, min_updates=3)
    _train(sync, [0.0, 0.002, -0.001, 0.0005])
    sync.reset_station(sync.anchor)   # anchor timebase stepped
    for s in range(1, 4):
        assert sync.n_updates[s] == 0
    assert sync.correct({0: 1.0, 1: 1.0}) is None


def test_clock_sync_promotion_after_partial_training():
    """Anchor dies after ONE reference (stations partially trained below
    min_updates): promotion must still unblock the healthy subset."""
    from airmodes.decode.mlat_net import clock_sync
    sync = clock_sync(STATIONS, min_updates=3)
    off = [0.0, 0.003, -0.002, 0.001]
    pos = (47.05, 8.10, 9000.0)
    ts = _arrivals(pos, STATIONS, 100.0)
    sync.update({s: ts[s] + off[s] for s in range(4)}, pos)  # one ref
    assert 0 < sync.n_updates[1] < sync.min_updates
    for k in range(30):                        # anchor now silent
        p = (47.05 + 0.0005 * k, 8.10, 9000.0)
        ts = _arrivals(p, STATIONS, 101.0 + k * 0.5)
        sync.update({s: ts[s] + off[s] for s in (1, 2, 3)}, p)
    assert sync.anchor in (1, 2, 3)
    t = 120.0
    corrected = sync.correct({s: t + off[s] for s in (1, 2, 3)})
    assert corrected is not None


def test_clock_sync_outlier_escape_self_heals():
    """A genuine timebase step on a station (no on_reanchor, e.g. zmq
    feed restart) re-converges after ~10 consistent 'outliers' instead of
    locking the station out forever."""
    from airmodes.decode.mlat_net import clock_sync
    sync = clock_sync(STATIONS, min_updates=3)
    off = [0.0, 0.002, -0.001, 0.0005]
    t_end = _train(sync, off)
    off = [0.0, 0.009, -0.001, 0.0005]         # station 1 stepped +7 ms
    for k in range(15):
        pos = (47.05, 8.10 + 0.001 * k, 9000.0)
        ts = _arrivals(pos, STATIONS, t_end + k)
        sync.update({s: ts[s] + off[s] for s in range(4)}, pos)
    t = t_end + 16
    corrected = sync.correct({s: t + off[s] for s in range(4)})
    assert corrected is not None
    vals = list(corrected.values())
    assert max(vals) - min(vals) < 1e-6


def test_modes_mlat_http_map(tmp_path):
    """--http serves solved positions as aircraft.json."""
    import json as _json
    import urllib.request
    from airmodes.apps.modes_mlat import main as mlat_main
    from airmodes.decode.altitude import encode_alt_q
    from airmodes.outputs.beast import output_beast
    from airmodes import crc

    target = (47.12, 8.28, 9500.0)
    tgt = encoder.df4_frame(0xABCDEF, encode_alt_q(target[2] / 0.3048))
    flush = encoder.df17_frame(0x111111, encoder.me_identification("AGE"))
    srvs = [output_beast(port=0, host="127.0.0.1", gps_time=True)
            for _ in STATIONS]
    stop = threading.Event()

    def wire_crc(f, n, ts):
        s = crc.crc24(f, n)
        return f"{f >> (n - 5)} {f:0{n // 4}x} {s:06x} 0 -20.00 {ts:.9f}"

    def feeder():
        while not stop.is_set():
            t = time.time()
            ts = _arrivals(target, STATIONS, t)
            for s, srv in enumerate(srvs):
                srv.output(wire_crc(tgt, 56, ts[s]))
            # WALL-clock gap before the ager frame: feed() flushes on each
            # incoming message's wire timestamp, so an already-future-
            # stamped ager racing ahead of the other stations' DF4 copies
            # would drop the group at 1 station (scheduling-dependent)
            stop.wait(0.3)
            t2 = time.time()
            for s, srv in enumerate(srvs):
                srv.output(wire_crc(flush, 112, t2))
            stop.wait(0.1)

    threading.Thread(target=feeder, daemon=True).start()
    import socket as socketlib
    probe = socketlib.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    argv = []
    for (lat, lon, alt), s in zip(STATIONS, srvs):
        argv += ["-S", f"{lat},{lon},{alt}@beastgps://127.0.0.1:{s.port}"]
    argv += ["--alt-datum", "ellipsoid", "--max-seconds", "12",
             "--http", str(port)]
    th = threading.Thread(target=mlat_main, args=(argv,), daemon=True)
    th.start()
    doc = None
    deadline = time.time() + 11
    try:
        while time.time() < deadline:
            try:
                doc = _json.load(urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/data/aircraft.json",
                    timeout=1))
                if any(a["hex"] == "abcdef" for a in doc["aircraft"]):
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        th.join(timeout=20)
        stop.set()
        for s in srvs:
            s.close()
    assert doc and doc["aircraft"], "no mlat aircraft served"
    ac = [a for a in doc["aircraft"] if a["hex"] == "abcdef"]
    assert ac and abs(ac[0]["lat"] - target[0]) < 0.03


def test_icao_hint_bounded_without_solving():
    """ADVICE r2: _icao_hint must be bounded at INSERT time — a correlator
    that never solves (sync unconverged) must not grow it without limit."""
    corr = mlat_correlator(STATIONS, clock_sync_enabled=True)
    for k in range(5000):
        hexframe = f"{0x20000000000000 | k:014x}"   # distinct DF4 frames
        corr.feed(0, f"4 {hexframe} abc123 3 -20.0 {100.0 + k * 0.001:.9f}")
    assert len(corr._icao_hint) <= 4096


def test_clock_sync_promotion_past_dead_converged_station():
    """ADVICE r2: a station that converged and then went silent must not
    block anchor promotion forever once it is stale."""
    from airmodes.decode.mlat_net import clock_sync
    sync = clock_sync(STATIONS, min_updates=3, max_age_s=60.0)
    off = [0.0, 0.002, -0.001, 0.0005]
    # train ONLY station 1 (arrivals {0,1}); stations 2/3 stay cold
    t_end = 100.0
    for k in range(5):
        pos = (47.05 + 0.001 * k, 8.10, 9000.0)
        ts = _arrivals(pos, STATIONS, 100.0 + k)
        sync.update({s: ts[s] + off[s] for s in (0, 1)}, pos)
        t_end = 100.0 + k
    assert sync.n_updates[1] >= sync.min_updates
    # anchor (0) and station 1 both die; 2/3 start reporting much later.
    # No converged station is ever present in arrivals, so without the
    # staleness carve-out the all() promotion check deadlocks on dead
    # station 1's frozen n_updates.
    t = t_end + 300.0                         # station 1 now stale
    promoted = False
    for k in range(30):
        pos = (47.05 + 0.0005 * k, 8.10, 9000.0)
        ts = _arrivals(pos, STATIONS, t + k * 0.5)
        sync.update({s: ts[s] + off[s] for s in (2, 3)}, pos)
        if sync.anchor in (2, 3):
            promoted = True
    assert promoted, "dead converged station blocked promotion"
    tq = t + 40.0
    corrected = sync.correct({s: tq + off[s] for s in (2, 3)})
    assert corrected is not None
    vals = list(corrected.values())
    assert max(vals) - min(vals) < 1e-6


def test_ns_extension_breaks_float64_floor():
    """VERDICT r2 #7: GPS-grade int64-ns wire timestamps drop the TDOA
    floor below 50 m. Absolute unix-epoch arrival times quantized to
    float64 (~238 ns ulp = ~70 m pseudorange) previously floored accuracy
    at ~0.1-0.2 km; the ns extension carries the exact stamps through."""
    frame = encoder.df17_frame(0x4840D6, encoder.me_identification("NSTEST"))
    unix_ns = 1_700_000_000_000_000_000

    def solve(with_ns: bool):
        corr = mlat_correlator(STATIONS, alt_datum="ellipsoid")
        ts = _arrivals(AIRCRAFT, STATIONS, 0.0)
        for i in range(4):
            ns = unix_ns + int(round(ts[i] * 1e9))
            wire = f"17 {frame:028x} 000000 0 -20.0 {ns * 1e-9:.9f}"
            if with_ns:
                wire += f" {ns}"
            corr.feed(i, wire)
        (sol,) = corr.flush(now=1e9, force=True)
        # great-circle-ish planar error in meters
        dlat = (sol.lat - AIRCRAFT[0]) * 111_320.0
        dlon = (sol.lon - AIRCRAFT[1]) * 111_320.0 * np.cos(
            np.radians(AIRCRAFT[0]))
        return float(np.hypot(dlat, dlon)), sol

    err_ns, sol = solve(with_ns=True)
    assert err_ns < 50.0, f"ns-stamped TDOA error {err_ns:.1f} m"
    assert abs(sol.timestamp - unix_ns * 1e-9) < 1.0  # absolute reporting
    # and the float-only floor is genuinely worse on the same geometry
    # (the quantization error direction is arbitrary; just pin that the
    # ns path achieves what the float path cannot GUARANTEE: run a small
    # ensemble and require the worst float error to exceed the worst ns
    # error)
    errs_f, errs_n = [], []
    for k in range(6):
        global AIRCRAFT
        ac = (47.10 + 0.01 * k, 8.20 - 0.005 * k, 10000.0)
        old = AIRCRAFT
        try:
            AIRCRAFT = ac
            errs_f.append(solve(with_ns=False)[0])
            errs_n.append(solve(with_ns=True)[0])
        finally:
            AIRCRAFT = old
    assert max(errs_n) < 50.0, errs_n
    assert max(errs_f) > max(errs_n), (errs_f, errs_n)


def test_ns_and_float_stations_mix_consistently():
    """A network where only some stations emit the ns extension must
    still group and solve — ns and float arrivals share one epoch-
    relative timebase (accuracy degrades only to the float stations'
    quantization, not to garbage)."""
    frame = encoder.df17_frame(0x4840D6, encoder.me_identification("MIX1"))
    unix_ns = 1_700_000_000_000_000_000
    corr = mlat_correlator(STATIONS, alt_datum="ellipsoid")
    ts = _arrivals(AIRCRAFT, STATIONS, 0.0)
    for i in range(4):
        ns = unix_ns + int(round(ts[i] * 1e9))
        wire = f"17 {frame:028x} 000000 0 -20.0 {ns * 1e-9:.9f}"
        if i % 2 == 0:
            wire += f" {ns}"        # stations 0/2 ns-grade, 1/3 float
        corr.feed(i, wire)
    (sol,) = corr.flush(now=1e9, force=True)
    assert sol.n_stations == 4
    dlat = (sol.lat - AIRCRAFT[0]) * 111_320.0
    dlon = (sol.lon - AIRCRAFT[1]) * 111_320.0 * np.cos(
        np.radians(AIRCRAFT[0]))
    err = float(np.hypot(dlat, dlon))
    assert err < 500.0, err        # float-station quantization bounds it
    assert abs(sol.timestamp - unix_ns * 1e-9) < 1.0


# ---- r4 review-sweep regressions -------------------------------------------

def test_malformed_remote_messages_never_crash():
    """Untrusted network input: non-numeric wire fields, wrong-length
    frames, and NaN timestamps drop instead of raising (r4 review: parse()
    and the layout extractors raise plain ValueError past the old guard)."""
    corr = mlat_correlator(STATIONS, window_s=0.05,
                           clock_sync_enabled=True)
    bad = [
        "17 8d4840d6202cc371c32ce0576098 zz 0 -3.0 1.5",     # bad syndrome
        "xx 8d4840d6202cc371c32ce0576098 000000 0 -3.0 1.5",  # bad df
        "17 8d4840d6202cc371c32ce0576098 000000 0 nope 1.5",  # bad dbfs
        "4 0 000000 0 -3.0 1.5",                    # 4-bit frame
        "4 20010380b60fc6aa 000000 0 -3.0 1.5",     # 64-bit frame
        "16 8d4840d6202cc3 000000 0 -3.0 1.6",      # 112-bit DF in 56 bits
        "17 8d4840d6202cc371c32ce0576098 000000 0 -3.0 nan "
        "1755700000123456789",                      # NaN ts despite ns
    ]
    for s in range(3):
        for m in bad:
            assert corr.feed(s, m) == []
    # the wrong-length frames must also never reach the solver layouts
    corr2 = mlat_correlator(STATIONS, window_s=0.001)
    for s in range(4):
        corr2.feed(s, f"4 {0:01x} 000000 0 -3.0 {10.0 + s * 1e-6:.9f}")
        corr2.feed(s, f"16 8d4840d6202cc3 000000 0 -3.0 "
                   f"{10.0 + s * 1e-6:.9f}")
    assert corr2.flush(now=20.0, force=True) == []


def test_trailing_nonint_field_still_accepted():
    """The 7th wire field is the OPTIONAL ns extension; a feed appending
    some other token must not lose the message (consumers accept >= 6
    fields — r4 review: the old combined try rejected the whole line)."""
    corr = mlat_correlator(STATIONS, alt_datum="ellipsoid")
    frame = encoder.df17_frame(0x4840D6,
                               encoder.me_identification("MLAT02"))
    ts = _arrivals(AIRCRAFT, STATIONS)
    for i in range(4):
        corr.feed(i, _wire(frame, 112, ts[i]) + " sig=-12")
    sols = corr.flush(now=ts[0] + 1.0)
    assert len(sols) == 1 and sols[0].n_stations == 4


def test_lagged_copy_of_earlier_transmission_dropped():
    """A feed lagging by more than the window delivers a copy of an
    EARLIER transmission after a newer group formed: it must not merge
    (the keep-earliest rule would adopt the wrong transmission's time)."""
    from airmodes.decode.altitude import encode_alt_q
    frame = encoder.df4_frame(0xABCDEF,
                              encode_alt_q(AIRCRAFT[2] / 0.3048))
    corr = mlat_correlator(STATIONS, alt_datum="ellipsoid")
    ts = _arrivals(AIRCRAFT, STATIONS, t_emit=10.0)
    for i in range(3):
        corr.feed(i, _wire(frame, 56, ts[i]))
    # station 3's copy of a transmission from 2 s earlier arrives late
    corr.feed(3, _wire(frame, 56, ts[3] - 2.0))
    sols = corr.flush(now=ts[0] + 1.0)
    assert len(sols) == 1
    assert sols[0].n_stations == 3          # the stale copy stayed out
    assert abs(sols[0].lat - AIRCRAFT[0]) < 0.01


def test_duplicate_station_coordinates_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        mlat_correlator([STATIONS[0], STATIONS[1], STATIONS[0]])


def test_flush_insertion_order_aging():
    """Groups age from creation in insertion order (r4 review: the per-
    message full rescan was O(pending); the scan now early-stops)."""
    corr = mlat_correlator(STATIONS, alt_datum="ellipsoid", window_s=0.01)
    f1 = encoder.df17_frame(0x111111, encoder.me_identification("AAA"))
    f2 = encoder.df17_frame(0x222222, encoder.me_identification("BBB"))
    ts = _arrivals(AIRCRAFT, STATIONS, t_emit=10.0)
    for i in range(4):
        corr.feed(i, _wire(f1, 112, ts[i]))
    for i in range(4):
        corr.feed(i, _wire(f2, 112, ts[i] + 0.005))
    out = corr.flush(now=ts[0] + 0.012)
    assert [s.icao for s in out] == [0x111111]      # f2 still in window
    out = corr.flush(now=ts[0] + 0.02)
    assert [s.icao for s in out] == [0x222222]


def test_relay_reference_survives_dead_anchor():
    """With the anchor feed dead, the converged relay station serves as
    reference; serving must count as activity (r4 review: its frozen
    offset_t staleness-rejected every group containing it after
    max_age_s, while its converged state blocked anchor promotion — a
    permanent silent blackout)."""
    from airmodes.decode.mlat_net import clock_sync
    sync = clock_sync(STATIONS, min_updates=3, max_age_s=60.0)
    ref_ac = (47.05, 8.10, 9000.0)
    t_emit = 100.0
    # converge everyone with the anchor alive
    for _ in range(4):
        t = _arrivals(ref_ac, STATIONS, t_emit)
        sync.update({s: t[s] for s in range(4)}, ref_ac)
        t_emit += 1.0
    # anchor (0) dies; references keep flowing for > max_age_s
    for _ in range(70):
        t = _arrivals(ref_ac, STATIONS, t_emit)
        sync.update({s: t[s] for s in range(1, 4)}, ref_ac)
        t_emit += 1.0
    t = _arrivals(AIRCRAFT, STATIONS, t_emit)
    corrected = sync.correct({s: t[s] for s in range(1, 4)})
    assert corrected is not None, \
        "groups containing the relay reference must keep solving"
    vals = list(corrected.values())
    # and the corrections stay mutually consistent (sub-us spread of a
    # same-emission arrival set)
    spread = (max(vals) - min(vals)) - (max(t[1:]) - min(t[1:]))
    assert abs(spread) < 2e-6


def test_correlator_residual_bound_follows_wire_grade(monkeypatch):
    """Float-only wire timestamps quantize at ~238 ns (~70 m/station):
    the no-sync residual bound must widen to 300 m for them and stay
    100 m only when EVERY arrival carried the int64-ns extension (r4
    review: it was hard-coded 100 m, intermittently refusing legitimate
    fixes on float-timestamped feeds)."""
    from airmodes.decode import mlat_net

    captured = []
    real_mlat = M.mlat

    def spy(replies, altitude_ft=None, **kw):
        captured.append(kw.get("max_resid_m"))
        return real_mlat(replies, altitude_ft=altitude_ft, **kw)

    monkeypatch.setattr(mlat_net.mlat_mod, "mlat", spy)
    frame = encoder.df17_frame(0x4840D6, encoder.me_identification("GRADE1"))
    ts = _arrivals(AIRCRAFT, STATIONS)

    corr = mlat_correlator(STATIONS, alt_datum="ellipsoid")
    for i in range(4):   # float-only wire: 6 fields
        corr.feed(i, _wire(frame, 112, ts[i]))
    corr.flush(now=ts[0] + 1.0)
    assert captured and captured[-1] == 300.0

    corr2 = mlat_correlator(STATIONS, alt_datum="ellipsoid")
    for i in range(4):   # every arrival ns-stamped -> tight bound
        ns = int(round(ts[i] * 1e9))
        corr2.feed(i, _wire(frame, 112, ts[i]) + f" {ns}")
    corr2.flush(now=ts[0] + 1.0)
    assert captured[-1] == 100.0

    corr3 = mlat_correlator(STATIONS, alt_datum="ellipsoid")
    for i in range(4):   # ONE float arrival degrades the whole group
        msg = _wire(frame, 112, ts[i])
        if i:
            msg += f" {int(round(ts[i] * 1e9))}"
        corr3.feed(i, msg)
    corr3.flush(now=ts[0] + 1.0)
    assert captured[-1] == 300.0


def test_parse_wire_obs_shared_gate():
    """The single shared untrusted-input gate + epoch anchor for the
    correlator AND the coordinator (r4: two hand-kept copies drifted
    twice — length guard, trailing-token tolerance)."""
    import math
    from airmodes.decode.mlat_net import epoch_timebase, parse_wire_obs
    hx = "8d4840d6202cc371c32ce0576098"
    hexframe, t, ns = parse_wire_obs(
        f"17 {hx} 000000 0 -20.0 1700000000.5 123456789")
    assert hexframe == hx and t == 1700000000.5 and ns == 123456789
    assert parse_wire_obs("short") is None
    assert parse_wire_obs("17 zznothex 000000 0 -20.0 1.0") is None
    assert parse_wire_obs("4 a 000000 0 -3 1.0") is None     # bad length
    # junk trailing token degrades to ns=None; the message is kept
    assert parse_wire_obs(f"17 {hx} 000000 0 -20.0 1.0 junk")[2] is None
    # non-finite float is RETURNED, not rejected: the coordinator keeps
    # ns-grade messages with a broken float field, the correlator drops
    # them (clock-sync re-parses the float into the CPR cache)
    assert math.isnan(parse_wire_obs(f"17 {hx} 000000 0 -20.0 nan")[1])

    tb = epoch_timebase()
    ns0 = 1_700_000_000_123_456_789
    r = tb.rel(ns0 * 1e-9, ns0)
    # the absolute round trip is only float64-ulp-exact (~0.24 us at
    # unix magnitude — the quantization the anchor exists to beat)
    assert tb.abs_(r) == pytest.approx(ns0 * 1e-9, abs=1e-6)
    # ns deltas survive exactly (the entire point of the anchor)
    assert tb.rel(float("nan"), ns0 + 1000) - r == pytest.approx(1e-6,
                                                                 abs=1e-12)


def test_anon_df18_solution_keeps_anon_namespace():
    """An mlat-solved DF18 CF=1 frame must carry the parser's anon-ICAO
    namespacing so --http/SBS consumers never collide it with a real
    aircraft (r4 review follow-up)."""
    from airmodes.constants import ANON_ICAO_BIT
    corr = mlat_correlator(STATIONS, alt_datum="ellipsoid")
    frame = encoder.df18_frame(0x4840D6,
                               encoder.me_identification("ANONML"), cf=1)
    ts = _arrivals(AIRCRAFT, STATIONS)
    for i in range(4):
        corr.feed(i, _wire(frame, 112, ts[i]))
    sols = corr.flush(now=ts[0] + 1.0)
    assert len(sols) == 1
    assert sols[0].icao == (0x4840D6 | ANON_ICAO_BIT)
    # plain DF17 stays un-namespaced
    corr2 = mlat_correlator(STATIONS, alt_datum="ellipsoid")
    f17 = encoder.df17_frame(0x4840D6, encoder.me_identification("REALML"))
    for i in range(4):
        corr2.feed(i, _wire(f17, 112, ts[i]))
    assert corr2.flush(now=ts[0] + 1.0)[0].icao == 0x4840D6


def test_mlat_consumers_survive_wire_fuzz():
    """The correlator (plain + clock-sync) and coordinator must never
    raise on hostile wire strings — same standing property as the
    output-plugin fuzz (r4: crashes kept surfacing one consumer at a
    time: negative shifts, layout ValueErrors, NaN poisoning)."""
    import random

    from airmodes.decode.mlat import mlat_coordinator

    rng = random.Random(99)
    frame = encoder.df17_frame(0x4840D6, encoder.me_airborne_position(
        30000.0, 47.1, 8.2, odd=False))
    good = _wire(frame, 112, 100.0)
    hostile = ["nan", "inf", "1e30", "-1", "zz", "", "a", "x" * 300,
               "99999999999999999999999", "0x10", "17", "8d"]

    def mutate(msg):
        parts = msg.split()
        i = rng.randrange(len(parts))
        parts[i] = rng.choice(hostile)
        if rng.random() < 0.3:      # sometimes append a junk ns field
            parts.append(rng.choice(hostile))
        return " ".join(parts)

    corr = mlat_correlator(STATIONS, alt_datum="ellipsoid")
    corr_cs = mlat_correlator(STATIONS, alt_datum="ellipsoid",
                              window_s=0.05, clock_sync_enabled=True)
    coord = mlat_coordinator({f"st{i}": s for i, s in enumerate(STATIONS)})
    for k in range(400):
        r = rng.random()
        if r < 0.2:
            msg = good
        elif r < 0.8:
            msg = mutate(good)
        else:
            msg = " ".join(rng.choice(hostile)
                           for _ in range(rng.randrange(1, 9)))
        st = rng.randrange(4)
        corr.feed(st, msg)          # must never raise
        corr_cs.feed(st, msg)
        coord.report(f"st{st}", msg)
        coord.report("unknown", msg)
    corr.flush(now=1e6, force=True)
    corr_cs.flush(now=1e6, force=True)

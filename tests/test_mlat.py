"""Multilateration solver tests with synthetic station/timestamp data
(replacing the reference's python/mlat.py __main__ self-test)."""

import numpy as np
import pytest

from airmodes.decode import mlat
from airmodes.exceptions import MlatNonConvergeError


def test_llh_ecef_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(100):
        lat = float(rng.uniform(-85, 85))
        lon = float(rng.uniform(-180, 180))
        alt = float(rng.uniform(0, 12000))
        la, lo, al = mlat.ecef2llh(mlat.llh2ecef((lat, lon, alt)))
        assert abs(la - lat) < 1e-6
        assert abs(lo - lon) < 1e-6
        assert abs(al - alt) < 1e-2


def _synthesize(target_llh, stations_llh, jitter_ns=0.0, seed=0):
    rng = np.random.default_rng(seed)
    target = mlat.llh2ecef(target_llh)
    replies = {}
    for s in stations_llh:
        d = np.linalg.norm(mlat.llh2ecef(s) - target)
        t = d / mlat.C + rng.standard_normal() * jitter_ns * 1e-9
        replies[tuple(s)] = float(t)
    return replies


STATIONS4 = [
    (47.0, 8.0, 500.0),
    (47.3, 8.5, 600.0),
    (46.8, 8.6, 450.0),
    (47.2, 7.7, 550.0),
]


def test_mlat_4_stations_exact():
    target = (47.1, 8.25, 10000.0)
    replies = _synthesize(target, STATIONS4)
    lat, lon, alt = mlat.mlat(replies)
    assert abs(lat - target[0]) < 1e-3
    assert abs(lon - target[1]) < 1e-3
    assert abs(alt - target[2]) < 150.0


def test_mlat_4_stations_jittered():
    target = (47.05, 8.3, 11000.0)
    replies = _synthesize(target, STATIONS4, jitter_ns=30.0, seed=3)
    lat, lon, alt = mlat.mlat(replies)
    # 30 ns timing jitter -> tens-of-meters-to-km class error
    assert abs(lat - target[0]) < 0.05
    assert abs(lon - target[1]) < 0.05


def test_mlat_3_stations_with_altitude():
    target = (47.1, 8.25, 9144.0)  # 30000 ft
    replies = _synthesize(target, STATIONS4[:3])
    lat, lon, alt = mlat.mlat(replies, altitude_ft=30000.0)
    assert abs(lat - target[0]) < 5e-3
    assert abs(lon - target[1]) < 5e-3
    assert abs(alt - target[2]) < 50.0


def test_mlat_too_few_stations():
    target = (47.1, 8.25, 10000.0)
    replies = _synthesize(target, STATIONS4[:2])
    with pytest.raises(MlatNonConvergeError):
        mlat.mlat(replies)


def test_geoid_lookup_sane():
    assert -110.0 < mlat.llh2geoid(47.0, 8.0) < 90.0
    assert -110.0 < mlat.llh2geoid(-30.0, 150.0) < 90.0


def test_mlat_coordinator_from_messages():
    from airmodes.decode.mlat import mlat_coordinator, llh2ecef, C
    from airmodes.testing import encoder
    target = (47.1, 8.25, 9144.0)
    stations = {f"st{i}": s for i, s in enumerate(STATIONS4)}
    coord = mlat_coordinator(stations, min_stations=4)
    frame = encoder.df17_frame(0x4840D6, encoder.me_identification("TEST"))
    t_ecef = llh2ecef(target)
    pos = None
    for name, s in stations.items():
        d = np.linalg.norm(llh2ecef(s) - t_ecef)
        t = 1000.0 + d / C
        msg = f"17 {frame:028x} 000000 0 -20.0 {t:.9f}"
        pos = coord.report(name, msg) or pos
    assert pos is not None
    lat, lon, alt = pos
    assert abs(lat - target[0]) < 1e-3
    assert abs(lon - target[1]) < 1e-3


def test_coordinator_drops_malformed_messages():
    from airmodes.decode.mlat import mlat_coordinator
    coord = mlat_coordinator({f"st{i}": s for i, s in enumerate(STATIONS4)})
    assert coord.report("st0", "17 8d4840d6 000000 0 -20.0 notanumber") is None
    assert coord.report("st0", "17 zznothex 000000 0 -20.0 1.0") is None
    assert coord.report("st0", "short") is None
    assert coord.report("unknown", "17 8d4840d6 000000 0 -20.0 1.0") is None
    # sub-quorum returns are also None, so pin the actual rejection:
    # nothing malformed (or from an unknown station) may be enqueued
    assert coord._pending == {}


def test_mlat_msl_datum_roundtrip():
    """Stations + aircraft altitude given as MSL heights: the geoid
    undulation is applied on the way in and removed on the way out."""
    lat_t, lon_t, alt_msl = 47.1, 8.25, 9144.0
    und = mlat.llh2geoid(lat_t, lon_t)
    target_ell = (lat_t, lon_t, alt_msl + und)
    replies = {}
    t_ecef = mlat.llh2ecef(target_ell)
    for (la, lo, alt) in STATIONS4[:3]:
        s_ell = (la, lo, alt + mlat.llh2geoid(la, lo))
        d = np.linalg.norm(mlat.llh2ecef(s_ell) - t_ecef)
        replies[(la, lo, alt)] = float(d / mlat.C)   # station alt is MSL
    lat, lon, alt = mlat.mlat(replies, altitude_ft=alt_msl / 0.3048,
                              alt_datum="msl")
    assert abs(lat - lat_t) < 5e-3
    assert abs(lon - lon_t) < 5e-3
    assert abs(alt - alt_msl) < 50.0


def test_coordinator_ns_extension_sub_50m():
    """r3 review: the coordinator must keep the ns extension's precision
    (relative timebase) instead of collapsing it back into a 238 ns-ulp
    unix float — GPS-grade stamps at unix epoch solve < 50 m."""
    from airmodes.decode.mlat import mlat_coordinator, llh2ecef, C
    from airmodes.testing import encoder
    target = (47.1, 8.25, 9144.0)
    stations = {f"st{i}": s for i, s in enumerate(STATIONS4)}
    coord = mlat_coordinator(stations, min_stations=4)
    frame = encoder.df17_frame(0x4840D6, encoder.me_identification("NSCO"))
    t_ecef = llh2ecef(target)
    unix_ns = 1_700_000_000_000_000_000
    pos = None
    for name, s in stations.items():
        d = np.linalg.norm(llh2ecef(s) - t_ecef)
        ns = unix_ns + int(round(float(d) / C * 1e9))
        msg = f"17 {frame:028x} 000000 0 -20.0 {ns * 1e-9:.9f} {ns}"
        pos = coord.report(name, msg) or pos
    assert pos is not None
    lat, lon, alt = pos
    dlat = (lat - target[0]) * 111_320.0
    dlon = (lon - target[1]) * 111_320.0 * np.cos(np.radians(target[0]))
    assert float(np.hypot(dlat, dlon)) < 50.0


def test_coordinator_keeps_earliest_arrival_and_tombstones():
    """r5 review: (a) a station's own later multipath copy must not
    OVERWRITE its direct-path arrival (last-wins injected km of
    pseudorange; mlat_correlator keeps earliest); (b) late copies of an
    already-solved transmission must not re-create the group and mint a
    second, worse-geometry position for the same frame."""
    from airmodes.decode.mlat import C, llh2ecef, mlat_coordinator
    from airmodes.testing import encoder
    target = (47.1, 8.25, 9144.0)
    stations = {f"st{i}": s for i, s in enumerate(STATIONS4)}
    coord = mlat_coordinator(stations, min_stations=4)
    frame = encoder.df17_frame(0x4840D6, encoder.me_identification("EARL"))
    t_ecef = llh2ecef(target)
    unix_ns = 1_700_000_000_000_000_000

    def msg(s, extra_ns=0):
        d = np.linalg.norm(llh2ecef(s) - t_ecef)
        ns = unix_ns + int(round(float(d) / C * 1e9)) + extra_ns
        return f"17 {frame:028x} 000000 0 -20.0 {ns * 1e-9:.9f} {ns}"

    names = list(stations)
    pos = None
    for name in names[:3]:
        assert coord.report(name, msg(stations[name])) is None
        # multipath copy 30 us later: must NOT replace the direct path
        assert coord.report(name, msg(stations[name],
                                      extra_ns=30_000)) is None
    pos = coord.report(names[3], msg(stations[names[3]]))
    assert pos is not None
    lat, lon, _ = pos
    dlat = (lat - target[0]) * 111_320.0
    dlon = (lon - target[1]) * 111_320.0 * np.cos(np.radians(target[0]))
    assert float(np.hypot(dlat, dlon)) < 100.0, "late copies biased solve"
    # tombstone: late copies of the SAME transmission from the other
    # stations must not mint a second group/solution
    for name in names:
        assert coord.report(name, msg(stations[name],
                                      extra_ns=50_000)) is None
    assert coord._pending == {}


def test_timebase_rejects_implausible_anchor():
    """r5 review: one absurd-but-FINITE first timestamp (1e200, or a
    30-digit ns token) anchored the shared timebase so far away that
    every later arrival collapsed to one float — silently disabling the
    solver forever. rel() must refuse to anchor on it AND the message
    must drop."""
    import math
    from airmodes.decode.mlat import mlat_coordinator
    from airmodes.decode.mlat_net import epoch_timebase
    tb = epoch_timebase()
    assert math.isnan(tb.rel(1e200, None))
    assert tb.base_ns is None                  # anchor untouched
    # absurd ns token + sane float: degrades to the float path and
    # anchors from the FLOAT, never the poisoned ns
    t = tb.rel(5.0, 10 ** 30)
    assert math.isfinite(t) and tb.base_ns == 5_000_000_000
    assert math.isfinite(tb.rel(1.5, None))
    # coordinator end-to-end: poison first, then a normal group solves
    stations = {f"st{i}": s for i, s in enumerate(STATIONS4)}
    coord = mlat_coordinator(stations, min_stations=4)
    from airmodes.testing import encoder
    frame = encoder.df17_frame(0x4840D6, encoder.me_identification("PSON"))
    assert coord.report("st0",
                        f"17 {frame:028x} 000000 0 -20.0 1e200") is None
    assert coord._pending == {}
    assert coord._tb.base_ns is None


def test_mlat_outlier_rejection_leave_one_out():
    """A garbled arrival (multipath / counter glitch) silently biases
    plain least squares; with reject_outliers and identifiable
    redundancy (subsets over-determined by >= 2: n >= 6 with altitude,
    n >= 7 without) the solver drops it and recovers the position.
    Below the floor it refuses a tripped bound rather than emitting a
    confidently wrong fix."""
    target = (47.1, 8.25, 9144.0)
    alt_ft = target[2] / 0.3048
    stations6 = STATIONS4 + [(47.30, 8.35, 700.0), (46.90, 8.10, 550.0)]
    t_ecef = mlat.llh2ecef(target)
    replies = {}
    for s in stations6:
        d = np.linalg.norm(mlat.llh2ecef(s) - t_ecef)
        replies[s] = float(d / mlat.C)
    bad = stations6[4]
    replies[bad] += 5e-6                     # ~1.5 km pseudorange error

    lat_b, lon_b, _ = mlat.mlat(replies)     # parity path: biased
    err_b = np.hypot((lat_b - target[0]) * 111_320.0,
                     (lon_b - target[1]) * 111_320.0 *
                     np.cos(np.radians(target[0])))
    lat_r, lon_r, _ = mlat.mlat(replies, altitude_ft=alt_ft,
                                reject_outliers=True, max_resid_m=100.0)
    err_r = np.hypot((lat_r - target[0]) * 111_320.0,
                     (lon_r - target[1]) * 111_320.0 *
                     np.cos(np.radians(target[0])))
    assert err_r < 50.0, err_r
    assert err_b > 10 * max(err_r, 1.0), (err_b, err_r)

    # below the identifiability floor (n=5, altitude known): refuse once
    # the bound trips, never emit a confidently wrong fix
    sub = {s: replies[s] for s in stations6[:5]}   # keeps the bad one
    assert mlat.mlat(sub) is not None              # parity path solves
    with pytest.raises(MlatNonConvergeError):
        mlat.mlat(sub, altitude_ft=alt_ft, reject_outliers=True,
                  max_resid_m=50.0)


def test_coordinator_rejects_bad_hexframe_length():
    """A 1-hex-char frame reaching _frame_altitude_ft would compute a
    negative shift count and crash the coordinator (r4 review) — it must
    drop like every other malformed message."""
    from airmodes.decode.mlat import mlat_coordinator
    stations = {f"st{i}": s for i, s in enumerate(STATIONS4)}
    coord = mlat_coordinator(stations, min_stations=4)
    for name in stations:
        assert coord.report(name, f"4 a 000000 0 -3 1.0") is None
    assert coord._pending == {}


def test_coordinator_duplicate_station_coords_rejected():
    """Duplicate station coordinates silently collapse two stations into
    one observation (replies are keyed by position) — misconfiguration
    must fail loudly at startup, matching mlat_correlator (r4 review)."""
    from airmodes.decode.mlat import mlat_coordinator
    with pytest.raises(ValueError):
        mlat_coordinator({"a": STATIONS4[0], "b": STATIONS4[0],
                          "c": STATIONS4[1], "d": STATIONS4[2]})


def test_coordinator_stale_earlier_copy_does_not_wipe_group():
    """A lagged feed delivering a copy of an EARLIER transmission of the
    same hex must be dropped, not reset the in-progress group (r4 review:
    mirror case of the retransmission-split rule; mlat_correlator already
    handled it)."""
    from airmodes.decode.mlat import mlat_coordinator, llh2ecef, C
    from airmodes.testing import encoder
    target = (47.1, 8.25, 9144.0)
    stations = {f"st{i}": s for i, s in enumerate(STATIONS4)}
    coord = mlat_coordinator(stations, min_stations=4)
    frame = encoder.df17_frame(0x4840D6, encoder.me_identification("TEST"))
    t_ecef = llh2ecef(target)
    names = list(stations)
    arrivals = {n: 1000.0 + float(np.linalg.norm(llh2ecef(stations[n])
                                                 - t_ecef)) / C
                for n in names}
    pos = None
    for n in names[:3]:
        pos = coord.report(
            n, f"17 {frame:028x} 000000 0 -20.0 {arrivals[n]:.9f}") or pos
    # stale copy of an earlier transmission (5 s before) from st0
    assert coord.report(
        names[0], f"17 {frame:028x} 000000 0 -20.0 {995.0:.9f}") is None
    # the 4th fresh copy must still complete the original group
    pos = coord.report(
        names[3],
        f"17 {frame:028x} 000000 0 -20.0 {arrivals[names[3]]:.9f}") or pos
    assert pos is not None
    assert abs(pos[0] - target[0]) < 1e-3 and abs(pos[1] - target[1]) < 1e-3

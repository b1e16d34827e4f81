"""CPR encode/decode vectors: global pair, local, surface, boundary straddle.

Replaces the reference's embedded self-test main in python/cpr.py with real
pytest coverage, including the mode-s.org worked example pair.
"""

import numpy as np
import pytest

from airmodes.decode import cpr
from airmodes.exceptions import CPRNoPositionError


def test_straddling_pair_falls_back_to_own_position_local():
    """An aircraft crossing an NL zone boundary straddles on EVERY
    even/odd pair; with a fresh own-position reference the decoder must
    fall back to local decode instead of blacking out for the whole
    crossing (r5 review)."""
    lo, hi = 10.0, 11.0          # bisect an NL transition latitude
    while hi - lo > 1e-9:
        mid = (lo + hi) / 2
        if cpr.nl(mid) == cpr.nl(lo):
            lo = mid
        else:
            hi = mid
    b = hi
    dec = cpr.cpr_decoder(my_location=None)
    icao, lon = 0x123456, 8.0
    below = b - 0.03
    # clean pair below the boundary establishes the own-position cache
    yz, xz = cpr.cpr_encode(below, lon, odd=False, surface=False)
    with pytest.raises(CPRNoPositionError):
        dec.decode(icao, yz, xz, 0, timestamp=0.0)   # unpaired first frame
    yz, xz = cpr.cpr_encode(below, lon, odd=True, surface=False)
    got = dec.decode(icao, yz, xz, 1, timestamp=1.0)
    assert got[0] is not None and abs(got[0] - below) < 1e-3
    # the aircraft crosses: even just below, odd just above the boundary
    yz0, xz0 = cpr.cpr_encode(b - 0.001, lon, odd=False, surface=False)
    yz1, xz1 = cpr.cpr_encode(b + 0.001, lon, odd=True, surface=False)
    assert cpr.nl(b - 0.001) != cpr.nl(b + 0.001)
    dec.decode(icao, yz0, xz0, 0, timestamp=2.0)
    lat2, lon2 = dec.decode(icao, yz1, xz1, 1, timestamp=2.5)[:2]
    assert lat2 is not None and abs(lat2 - (b + 0.001)) < 5e-3
    assert abs(lon2 - lon) < 5e-3


def test_nl_values():
    assert cpr.nl(0) == 59
    assert cpr.nl(10.4704713) == 58   # just inside first transition
    assert cpr.nl(87) == 2
    assert cpr.nl(89) == 1
    assert cpr.nl(-45) == cpr.nl(45)
    # monotone non-increasing with |lat|
    vals = [cpr.nl(lat) for lat in np.linspace(0, 86.9, 200)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_known_global_pair():
    """mode-s.org example: even 58C382D690C8AC / odd 58C386435CC412."""
    even = (int("10110101101001000", 2), int("01100100010101100", 2))
    odd = (int("10010000110101110", 2), int("01100010000010010", 2))
    lat, lon = cpr.decode_global(even, odd, most_recent_odd=False)
    assert abs(lat - 52.25720) < 1e-4
    assert abs(lon - 3.91937) < 1e-4


def test_global_roundtrip_airborne():
    rng = np.random.default_rng(0)
    ok = 0
    for _ in range(300):
        lat = float(rng.uniform(-85, 85))
        lon = float(rng.uniform(-180, 180))
        even = cpr.cpr_encode(lat, lon, odd=False, surface=False)
        odd = cpr.cpr_encode(lat, lon, odd=True, surface=False)
        try:
            dlat, dlon = cpr.decode_global(even, odd, most_recent_odd=True)
        except CPRNoPositionError:
            continue  # genuine NL boundary straddle
        ok += 1
        assert abs(dlat - lat) < 1e-3
        assert abs((dlon - lon + 180) % 360 - 180) < 1e-3
    # straddles are rare: an over-tight check must not silently skip all
    assert ok >= 250, ok


def test_local_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(300):
        lat = float(rng.uniform(-85, 85))
        lon = float(rng.uniform(-180, 180))
        odd = bool(rng.integers(0, 2))
        enc = cpr.cpr_encode(lat, lon, odd=odd, surface=False)
        # reference position within ~40 NM
        ref = (lat + float(rng.uniform(-0.5, 0.5)),
               lon + float(rng.uniform(-0.5, 0.5)))
        dlat, dlon = cpr.decode_local(enc, odd, ref)
        assert abs(dlat - lat) < 1e-3
        assert abs((dlon - lon + 180) % 360 - 180) < 1e-3


def test_surface_local_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(100):
        lat = float(rng.uniform(-80, 80))
        lon = float(rng.uniform(-179, 179))
        odd = bool(rng.integers(0, 2))
        enc = cpr.cpr_encode(lat, lon, odd=odd, surface=True)
        ref = (lat + 0.05, lon - 0.05)
        dlat, dlon = cpr.decode_local(enc, odd, ref, surface=True)
        assert abs(dlat - lat) < 5e-4
        assert abs((dlon - lon + 180) % 360 - 180) < 5e-4


def test_decoder_cache_global_then_local():
    dec = cpr.cpr_decoder(my_location=None)
    icao = 0xABCDEF
    lat, lon = 47.5, 8.5
    even = cpr.cpr_encode(lat, lon, odd=False, surface=False)
    odd = cpr.cpr_encode(lat, lon, odd=True, surface=False)
    with pytest.raises(CPRNoPositionError):
        dec.decode(icao, even[0], even[1], 0, timestamp=100.0)
    dlat, dlon, rng_, brg = dec.decode(icao, odd[0], odd[1], 1, timestamp=101.0)
    assert abs(dlat - lat) < 1e-3 and abs(dlon - lon) < 1e-3
    # subsequent single frame decodes locally off the cached position
    enc2 = cpr.cpr_encode(lat + 0.01, lon + 0.01, odd=False, surface=False)
    dlat2, dlon2, _, _ = dec.decode(icao, enc2[0], enc2[1], 0, timestamp=102.0)
    assert abs(dlat2 - (lat + 0.01)) < 1e-3


def test_decoder_range_check():
    dec = cpr.cpr_decoder(my_location=(0.0, 0.0), max_range_nm=100.0)
    far = (45.0, 45.0)
    even = cpr.cpr_encode(*far, odd=False, surface=False)
    odd = cpr.cpr_encode(*far, odd=True, surface=False)
    dec.lkplist[1] = {0: (*even, 100.0, False)}
    with pytest.raises(CPRNoPositionError):
        dec.decode(1, odd[0], odd[1], 1, timestamp=100.5)


def test_range_bearing():
    rng_nm, brg = cpr.range_bearing((0.0, 0.0), (1.0, 0.0))
    assert abs(rng_nm - 60.0) < 0.1 and abs(brg - 0.0) < 0.1
    rng_nm, brg = cpr.range_bearing((0.0, 0.0), (0.0, 1.0))
    assert abs(rng_nm - 60.0) < 0.1 and abs(brg - 90.0) < 0.1


def test_maintain_evicts():
    dec = cpr.cpr_decoder()
    dec.lkplist[1] = {0: (1, 2, 100.0, False)}
    dec.poslist[1] = (1.0, 2.0, 100.0)
    dec.maintain(now=100.0 + 120.0)
    assert not dec.lkplist and not dec.poslist


def test_surface_global_decode_southern_hemisphere():
    """Surface CPR in the southern hemisphere: NL must come from the
    resolved (negative) latitude, not its northern image — nl(56) != nl(-34)
    puts longitude in the wrong zone entirely (regression)."""
    truth = (-33.95, 151.18)   # near Sydney
    dec = cpr.cpr_decoder(my_location=(-33.94, 151.17))
    yz0, xz0 = cpr.cpr_encode(truth[0], truth[1], odd=False, surface=True)
    yz1, xz1 = cpr.cpr_encode(truth[0], truth[1], odd=True, surface=True)
    with pytest.raises(CPRNoPositionError):
        # first frame alone: poslist empty; local decode via my_location OK
        # only because my_location is set — force the global path by using
        # a decoder without a position history
        cpr.cpr_decoder(my_location=None).decode(0x123456, yz0, xz0, 0,
                                                 surface=True, timestamp=0.0)
    lat, lon, rng, brg = dec.decode(0x123456, yz0, xz0, 0, surface=True,
                                    timestamp=0.0)
    lat, lon, rng, brg = dec.decode(0x123456, yz1, xz1, 1, surface=True,
                                    timestamp=1.0)
    assert abs(lat - truth[0]) < 1e-3
    assert abs(lon - truth[1]) < 1e-3


def test_global_decode_rejects_impossible_latitude():
    """An inconsistent even/odd pair that lands rlat outside [-90, 90] must
    raise, not return latitude 120 (regression)."""
    yz1 = int(round((2.0 / 3.0) * (1 << 17)))   # rlat0 = 120 deg
    with pytest.raises(CPRNoPositionError):
        cpr.decode_global((0, 0), (yz1, 0), most_recent_odd=True,
                          surface=False)


def test_stale_pair_does_not_block_local_fallback():
    """Both parities cached but 10 minutes old: the receiver-location local
    decode must still work (the stale pair is pruned), instead of raising
    CPRNoPositionError (regression)."""
    truth = (47.2, 8.4)
    dec = cpr.cpr_decoder(my_location=(47.0, 8.0))
    yz0, xz0 = cpr.cpr_encode(truth[0], truth[1], odd=False, surface=False)
    yz1, xz1 = cpr.cpr_encode(truth[0], truth[1], odd=True, surface=False)
    dec.decode(0xABC, yz0, xz0, 0, timestamp=0.0)
    dec.decode(0xABC, yz1, xz1, 1, timestamp=1.0)
    # aircraft silent for 10 minutes, then one odd frame
    lat, lon, rng, brg = dec.decode(0xABC, yz1, xz1, 1, timestamp=600.0)
    assert abs(lat - truth[0]) < 1e-3
    assert abs(lon - truth[1]) < 1e-3


def test_cache_bounded_by_periodic_maintain():
    dec = cpr.cpr_decoder(my_location=(47.0, 8.0))
    yz, xz = cpr.cpr_encode(47.5, 8.5, odd=False, surface=False)
    for i in range(4000):
        try:
            dec.decode(0x100000 + i, yz, xz, 0, timestamp=float(i))
        except CPRNoPositionError:
            pass
    # 60 s eviction + maintain every 128 decodes: far fewer than 4000 live
    assert len(dec.lkplist) < 300
    assert len(dec.poslist) < 300


def test_air_ground_transition_does_not_mix_cpr_pair():
    """Landing aircraft: a cached airborne even frame must not global-
    pair with a fresh surface odd frame (6 deg vs 1.5 deg zone sizes
    decode mixed pairs into arbitrary positions that can pass every
    sanity gate)."""
    truth = (47.3, 8.2)
    dec = cpr.cpr_decoder(my_location=None)
    ev_air = cpr.cpr_encode(*truth, odd=False, surface=False)
    od_sur = cpr.cpr_encode(*truth, odd=True, surface=True)
    with pytest.raises(CPRNoPositionError):   # single frame, no ref
        dec.decode(1, ev_air[0], ev_air[1], 0, surface=False,
                   timestamp=100.0)
    # mixed pair with no reference: the cached airborne even must be
    # invalidated (not paired) -> still no position, never garbage
    with pytest.raises(CPRNoPositionError):
        dec.decode(1, od_sur[0], od_sur[1], 1, surface=True,
                   timestamp=103.0)
    assert 0 not in dec.lkplist[1]            # stale airborne pruned
    # a matching surface even completes a clean surface pair (with ref)
    dec2 = cpr.cpr_decoder(my_location=(47.0, 8.0))
    ev_sur = cpr.cpr_encode(*truth, odd=False, surface=True)
    dec2.decode(2, ev_air[0], ev_air[1], 0, surface=False, timestamp=100.0)
    dec2.decode(2, ev_sur[0], ev_sur[1], 0, surface=True, timestamp=102.0)
    lat, lon, _, _ = dec2.decode(2, od_sur[0], od_sur[1], 1, surface=True,
                                 timestamp=103.0)
    assert abs(lat - truth[0]) < 0.01 and abs(lon - truth[1]) < 0.01


def test_global_first_requires_pair_for_first_fix():
    """global_first=True: no receiver-referenced local decode (which is
    zone-alias-limited); the first fix needs an even/odd pair, after
    which single frames decode off the aircraft's own position."""
    truth = (47.3, 8.2)
    dec = cpr.cpr_decoder(my_location=(47.0, 8.0), global_first=True)
    even = cpr.cpr_encode(*truth, odd=False, surface=False)
    odd = cpr.cpr_encode(*truth, odd=True, surface=False)
    with pytest.raises(CPRNoPositionError):
        dec.decode(1, even[0], even[1], 0, timestamp=0.0)
    lat, lon, _, _ = dec.decode(1, odd[0], odd[1], 1, timestamp=1.0)
    assert abs(lat - truth[0]) < 1e-3 and abs(lon - truth[1]) < 1e-3
    # subsequent single frame: own cached position is a valid local ref
    enc2 = cpr.cpr_encode(47.31, 8.21, odd=False, surface=False)
    lat2, lon2, _, _ = dec.decode(1, enc2[0], enc2[1], 0, timestamp=2.0)
    assert abs(lat2 - 47.31) < 1e-3 and abs(lon2 - 8.21) < 1e-3
    # default decoder keeps the reference behavior (immediate first fix)
    dec2 = cpr.cpr_decoder(my_location=(47.0, 8.0))
    lat3, _, _, _ = dec2.decode(2, even[0], even[1], 0, timestamp=0.0)
    assert abs(lat3 - truth[0]) < 1e-3

"""Top-level parser tests against encoder-built golden frames."""

import pytest

from airmodes.decode.parse import parse
from airmodes.exceptions import ADSBError, ParserError
from airmodes.testing import encoder


def wire(frame: int, nbits: int, syndrome: int = 0, status: int = 0,
         ts: float = 1.0) -> str:
    return f"{frame >> (nbits - 5)} {frame:0{nbits // 4}x} {syndrome:06x} {status} -20.00 {ts:.9f}"


def test_parse_known_ident():
    p = parse()
    rep = p.parse("17 8d4840d6202cc371c32ce0576098 000000 0 -20.00 1.000000000")
    assert rep.df == 17
    assert rep.icao == 0x4840D6
    assert rep.callsign == "KLM1023"
    assert rep.bds == "BDS0,8"


def test_parse_known_position_pair():
    p = parse()
    r1 = p.parse("17 8d40621d58c386435cc412692ad6 000000 0 -20.00 1.0")
    assert r1.altitude_ft == 38000
    assert r1.lat is None  # only one frame so far
    r2 = p.parse("17 8d40621d58c382d690c8ac2863a7 000000 0 -20.00 2.0")
    assert r2.lat is not None
    assert abs(r2.lat - 52.2572) < 1e-3
    assert abs(r2.lon - 3.91937) < 1e-3


def test_parse_df17_velocity():
    me = encoder.me_velocity(250.0, 45.0, -1280.0)
    frame = encoder.df17_frame(0x123456, me)
    rep = parse().parse(wire(frame, 112))
    assert rep.bds == "BDS0,9"
    assert abs(rep.speed_kt - 250.0) < 2.0
    assert abs(rep.heading_deg - 45.0) < 1.0
    assert abs(rep.vertical_rate_fpm + 1280.0) < 64.0


def test_parse_df11():
    frame = encoder.df11_frame(0xABCDEF, ca=5)
    rep = parse().parse(wire(frame, 56))
    assert rep.df == 11 and rep.icao == 0xABCDEF and rep.capability == 5


def test_parse_df4_altitude():
    from airmodes.decode.altitude import encode_alt_q
    frame = encoder.df4_frame(0x123456, encode_alt_q(25000))
    rep = parse().parse(wire(frame, 56, syndrome=0x123456, status=3))
    assert rep.df == 4 and rep.icao == 0x123456 and rep.altitude_ft == 25000


def test_parse_df5_squawk():
    from airmodes.decode.fields import encode_squawk
    frame = encoder.df5_frame(0x654321, encode_squawk(7700))
    rep = parse().parse(wire(frame, 56, syndrome=0x654321, status=3))
    assert rep.squawk == 7700


def test_parse_df20():
    from airmodes.decode.altitude import encode_alt_q
    frame = encoder.df20_frame(0x00AB12, encode_alt_q(10000))
    rep = parse().parse(wire(frame, 112, syndrome=0x00AB12, status=3))
    assert rep.df == 20 and rep.altitude_ft == 10000


def test_parse_rejects_bad_crc():
    frame = encoder.df17_frame(0x4840D6, encoder.me_identification("TEST")) ^ 1
    with pytest.raises(ParserError):
        parse().parse(wire(frame, 112))


def test_parse_rejects_fail_status():
    with pytest.raises(ADSBError):
        parse().parse("17 8d4840d6202cc371c32ce0576098 000000 4 -20.00 1.0")


def test_parse_df17_position_local_roundtrip():
    p = parse(my_position=(47.0, 8.0))
    me = encoder.me_airborne_position(30000.0, 47.3, 8.2, odd=False)
    frame = encoder.df17_frame(0x111111, me)
    rep = p.parse(wire(frame, 112))
    assert rep.lat is not None
    assert abs(rep.lat - 47.3) < 1e-3 and abs(rep.lon - 8.2) < 1e-3
    assert rep.range_nm is not None and rep.range_nm < 30


def test_parse_known_velocity_vector():
    """mode-s.org worked example: DF17 BDS0,9 subtype 1 ground speed."""
    rep = parse().parse("17 8d485020994409940838175b284f 000000 0 -20.0 1.0")
    assert rep.icao == 0x485020
    assert rep.bds == "BDS0,9"
    assert abs(rep.speed_kt - 159.20) < 0.01
    assert abs(rep.heading_deg - 182.88) < 0.01
    assert rep.vertical_rate_fpm == -832.0
    assert rep.speed_type == "GS"


def test_parse_fuzz_never_crashes():
    """Malformed wire strings raise ADSBError subclasses, never anything
    else (the receive loop's drop-and-continue contract)."""
    import random

    from airmodes.exceptions import ADSBError

    rng = random.Random(7)
    p = parse()
    hexchars = "0123456789abcdef"
    samples = ["", "17", "xx yy", "17 zz 000000 0 -20.0 1.0",
               "17 8d4840d6202cc371c32ce0576098 000000 0 -20.0",  # 5 fields
               "99 8d4840d6202cc371c32ce0576098 000000 0 -20.0 1.0",
               "17 8d4840d6202cc371c32ce05760 000000 0 -20.0 1.0",  # 108 bit
               "17 8d4840d6202cc371c32ce0576099 000000 0 -20.0 1.0"]  # bad crc
    for _ in range(500):
        nbits = rng.choice((56, 112, 88, 4))
        frame = "".join(rng.choice(hexchars) for _ in range(nbits // 4))
        df = rng.randrange(0, 32)
        synd = rng.randrange(0, 1 << 24)
        samples.append(f"{df} {frame} {synd:06x} 0 -20.0 1.0")
    decoded = 0
    for s in samples:
        try:
            p.parse(s)
            decoded += 1
        except ADSBError:
            pass
    # random frames essentially never pass the CRC re-check
    assert decoded <= 2


def test_surface_movement_speed_table():
    """DO-260 movement quantization (regression: bands above 15 kt were
    decoded up to 60 kt low)."""
    f = parse._surface_speed
    assert f(2) == 0.125
    assert f(8) == 0.875
    assert f(9) == 1.0
    assert f(13) == 2.0
    assert f(38) == 14.5
    assert f(39) == 15.0
    assert f(93) == 69.0
    assert f(94) == 70.0
    assert f(108) == 98.0
    assert f(109) == 100.0
    assert f(123) == 170.0
    assert f(124) == 175.0


def test_df16_acas_resolution_advisory():
    """DF16 MV with VDS 3,0 decodes the active RA (beyond-reference)."""
    from airmodes import crc
    from airmodes.decode import acas
    from airmodes.decode.altitude import encode_alt_q
    from airmodes.outputs.msprint import output_print
    from airmodes.testing import encoder

    # corrective descend RA, altitude crossing, threat named by ICAO.
    # ARA bit 1 = RA active; bits 2-7 = corrective, downward, increased
    # rate, reversal, crossing, positive (Annex 10 bits 41-47)
    ara = 0b11100110000000
    rac = 0b0000
    tti = 1
    tid = 0x7C6B1D << 2
    mv = (0x30 << 48) | (ara << 34) | (rac << 30) | (0 << 29) | (0 << 28) \
        | (tti << 26) | tid
    frame = encoder.df16_frame(0xABCDEF, encode_alt_q(31000.0), mv=mv)
    wire = f"16 {frame:028x} {crc.crc24(frame, 112):06x} 0 -18.0 4.0"
    rep = parse().parse(wire)
    assert rep.df == 16 and rep.icao == 0xABCDEF
    assert rep.altitude_ft == 31000
    assert rep.bds == "BDS3,0"
    ra = rep.acas_ra
    assert ra["corrective"] and ra["downward_sense"] and ra["positive"]
    assert ra["altitude_crossing"] and not ra["increased_rate"]
    assert ra["threat_icao"] == 0x7C6B1D
    line = output_print.format_report(rep)
    assert "RA[corrective descend, crossing, threat 7c6b1d]" in line, line
    # MV without an advisory: no RA attached
    quiet = encoder.df16_frame(0xABCDEF, encode_alt_q(31000.0),
                               mv=(0x30 << 48))
    rep2 = parse().parse(
        f"16 {quiet:028x} {crc.crc24(quiet, 112):06x} 0 -18.0 4.0")
    assert rep2.acas_ra is None
    # RA-terminated summary
    mv3 = (0x30 << 48) | (1 << 29)
    assert acas.summarize(acas.decode_mv(mv3)) == "RA terminated"


def test_df16_ara_active_bit_gates_flags():
    """ARA bit 1 is the RA-active indicator, not a descriptor: with it
    clear and MTE set, bits 2-7 are the multi-threat encoding and must not
    be read as sense flags (regression: flags were shifted one bit high,
    printing 'descend' for a climb RA)."""
    from airmodes.decode import acas
    # real TCAS 'Climb' RA: active, corrective, upward, positive
    mv = (0x30 << 48) | (0b11000010000000 << 34)
    ra = acas.decode_mv(mv)
    assert ra["ra_active"] and ra["corrective"] and ra["positive"]
    assert not ra["downward_sense"]
    assert "corrective climb" in acas.summarize(ra)
    # multi-threat encoding: bit 1 clear, MTE set — no sense flags emitted
    mv2 = (0x30 << 48) | (0b01100000000000 << 34) | (1 << 28)
    ra2 = acas.decode_mv(mv2)
    assert not ra2["ra_active"] and ra2["multiple_threats"]
    assert "downward_sense" not in ra2
    assert "multi-threat" in acas.summarize(ra2)


def test_coordinator_rejects_nonfinite_timestamp():
    """A nan/inf timestamp must be DROPPED, not enqueued: sub-quorum
    reports also return None, so assert on the pending table and on the
    final solve staying finite when one station sends nan."""
    import math as _math

    import numpy as np
    from airmodes.decode.mlat import C, llh2ecef, mlat_coordinator

    stations = {"a": (47.0, 8.0, 500.0), "b": (47.3, 8.5, 600.0),
                "c": (46.8, 8.6, 450.0), "d": (47.2, 7.7, 550.0)}
    coord = mlat_coordinator(stations, min_stations=4)
    assert coord.report("a", "17 8d4840d6 000000 0 -20.0 nan") is None
    assert coord._pending == {}          # rejected, not enqueued
    target = llh2ecef((47.1, 8.25, 10000.0))
    pos = None
    for i, (name, s) in enumerate(stations.items()):
        d = float(np.linalg.norm(llh2ecef(s) - target))
        t = "nan" if name == "b" else f"{1000.0 + d / C:.9f}"
        pos = coord.report(name, f"17 8d4840d6 000000 0 -20.0 {t}") or pos
    # station b dropped -> only 3 of min 4 -> no (nan, nan, nan) fix
    assert pos is None or all(_math.isfinite(v) for v in pos)


def test_bds20_rejects_interior_gaps():
    from airmodes.decode import commb
    from airmodes.constants import CALLSIGN_CHARMAP
    # 'A_B_12__' has interior gaps: not a left-aligned ident
    cs = 0
    for i, ch in enumerate("A_B_12__"):
        cs |= CALLSIGN_CHARMAP.index(ch) << (42 - 6 * i)
    assert not commb.is_bds20((0x20 << 48) | cs)


# --- DF17 TC0/28/29/31 (aircraft status, target state, operational status) ---

def test_parse_tc0_altitude_without_position():
    from airmodes.decode.altitude import encode_alt_12bit
    me = encode_alt_12bit(25000.0) << 36  # ftc=0, alt in BDS0,5 position
    frame = encoder.df17_frame(0x3C6614, me)
    rep = parse().parse(wire(frame, 112))
    assert rep.bds == "BDS0,5"
    assert rep.altitude_ft == 25000
    assert rep.lat is None


def test_parse_tc28_emergency_status():
    me = encoder.me_emergency_status(5, squawk=7500)
    frame = encoder.df17_frame(0x4840D6, me)
    rep = parse().parse(wire(frame, 112))
    assert rep.bds == "BDS6,1"
    assert rep.emergency == "unlawful interference"
    assert rep.squawk == 7500


def test_parse_tc28_ra_broadcast_matches_df16_decode():
    """TC28/2 carries the same ARA/RAC payload as the DF16 MV BDS3,0."""
    from airmodes import crc
    from airmodes.decode.altitude import encode_alt_q
    ara = (1 << 13) | (1 << 12) | (1 << 11) | (1 << 7)  # active, corrective,
    # downward sense, positive
    me = encoder.me_ra_broadcast(ara, rac=0b0100, mte=0, tti=1,
                                 tid=0xABCDEF << 2)
    frame = encoder.df17_frame(0x4840D6, me)
    rep = parse().parse(wire(frame, 112))
    assert rep.bds == "BDS6,1"
    ra = rep.acas_ra
    assert ra["ra_active"] and ra["corrective"] and ra["downward_sense"]
    assert ra["positive"] and not ra["increased_rate"]
    assert ra["complements"] == ["do_not_pass_above"]
    assert ra["threat_icao"] == 0xABCDEF
    assert ra["bds"] == "6,1"  # labeled by the CARRYING register

    mv = (0x30 << 48) | (me & ((1 << 48) - 1))
    df16 = encoder.df16_frame(0x4840D6, encode_alt_q(31000.0), mv=mv)
    rep16 = parse().parse(
        f"16 {df16:028x} {crc.crc24(df16, 112):06x} 0 -18.0 4.0")
    ra16 = rep16.acas_ra
    assert ra16["bds"] == "3,0"
    # identical payload decode, differing only in the carrying register
    assert {k: v for k, v in ra16.items() if k != "bds"} == \
        {k: v for k, v in ra.items() if k != "bds"}


def test_parse_tc28_reserved_subtype_carried_raw():
    """TC28 subtypes other than 1/2 are reserved: carried raw, not dropped
    (downstream counters distinguish 'reserved' from 'unknown')."""
    me = (28 << 51) | (5 << 48) | 0xDEADBEEF
    rep = parse().parse(wire(encoder.df17_frame(0x4840D6, me), 112))
    assert rep.bds == "BDS6,1"
    assert rep.me_raw == me
    assert rep.emergency is None and rep.acas_ra is None


def test_parse_tc29_do260a_subtype0_carried_raw():
    """DO-260A target state & status (TC29 subtype 0) is known but
    undecoded: carried raw rather than raising NoHandlerError."""
    me = (29 << 51) | (0 << 49) | 0x1234567
    rep = parse().parse(wire(encoder.df17_frame(0x4840D6, me), 112))
    assert rep.bds == "BDS6,2"
    assert rep.me_raw == me
    assert rep.tss is None


def test_parse_tc29_target_state_roundtrip():
    me = encoder.me_target_state(
        sel_alt_ft=36000, fms=False, baro_mb=1013.6, sel_hdg_deg=270.0,
        nacp=9, sil=3, nic_baro=1,
        modes={"autopilot": True, "vnav": True, "lnav": True})
    frame = encoder.df17_frame(0xA1B2C3, me)
    rep = parse().parse(wire(frame, 112))
    assert rep.bds == "BDS6,2"
    t = rep.tss
    assert t["selected_altitude_ft"] == 36000
    assert t["altitude_source"] == "MCP/FCU"
    assert abs(t["baro_setting_mb"] - 1013.6) < 0.41
    assert abs(t["selected_heading_deg"] - 270.0) < 0.36
    assert t["autopilot"] and t["vnav"] and t["lnav"]
    assert not t["approach"] and not t["altitude_hold"]
    assert t["nacp"] == 9 and t["sil"] == 3 and t["nic_baro"] == 1
    assert t["tcas_operational"]


def test_parse_tc29_no_data_fields_omitted():
    me = encoder.me_target_state(tcas_op=False)
    rep = parse().parse(wire(encoder.df17_frame(0xA1B2C3, me), 112))
    t = rep.tss
    assert "selected_altitude_ft" not in t
    assert "baro_setting_mb" not in t
    assert "selected_heading_deg" not in t
    assert "autopilot" not in t  # mode bits invalid when status bit clear
    assert not t["tcas_operational"]


def test_parse_tc31_operational_status_airborne():
    me = encoder.me_op_status(surface=False, version=2, nacp=10, sil=3,
                              gva=2, nic_baro=1, hrd=0)
    rep = parse().parse(wire(encoder.df17_frame(0x111111, me), 112))
    assert rep.bds == "BDS6,5"
    o = rep.opstatus
    assert not o["surface"] and not rep.on_surface
    assert o["version"] == 2 and o["nacp"] == 10 and o["sil"] == 3
    assert o["gva"] == 2 and o["nic_baro"] == 1
    assert o["heading_reference"] == "true"


def test_parse_tc31_operational_status_surface():
    me = encoder.me_op_status(surface=True, version=2, nacp=8, sil=2,
                              lw=9, trk_hdg=1, hrd=1)
    rep = parse().parse(wire(encoder.df17_frame(0x222222, me), 112))
    o = rep.opstatus
    assert o["surface"] and rep.on_surface
    assert o["length_width_code"] == 9
    assert o["track_angle_not_heading"]
    assert o["heading_reference"] == "magnetic"
    assert "gva" not in o


def test_parse_reserved_tcs_still_raise():
    from airmodes.exceptions import NoHandlerError
    for tc in (23, 24, 25, 26, 27, 30):
        me = tc << 51
        with pytest.raises(NoHandlerError):
            parse().parse(wire(encoder.df17_frame(0x333333, me), 112))


def test_msprint_formats_new_bds_types():
    from airmodes.outputs.msprint import output_print
    me = encoder.me_emergency_status(1, squawk=7700)
    rep = parse().parse(wire(encoder.df17_frame(0x4840D6, me), 112))
    line = output_print.format_report(rep)
    assert "EMERGENCY: general" in line and "squawk 7700" in line

    me = encoder.me_target_state(sel_alt_ft=4000, baro_mb=1020.0)
    rep = parse().parse(wire(encoder.df17_frame(0x4840D6, me), 112))
    line = output_print.format_report(rep)
    assert "sel alt 4000 ft" in line and "QNH" in line

    me = encoder.me_op_status(version=2, nacp=9, sil=3)
    rep = parse().parse(wire(encoder.df17_frame(0x4840D6, me), 112))
    assert "ADS-B v2 NACp 9 SIL 3" in output_print.format_report(rep)


def test_df18_cf_dispatch():
    """DF18 dispatches on the control field: only ADS-B/fine-TIS-B/ADS-R
    CF values carry a standard ME; management/coarse/reserved carry raw
    (r4 review: parse18 = parse17 ignored CF entirely)."""
    me = encoder.me_identification("TISB42")
    rep = parse().parse(wire(encoder.df18_frame(0x123456, me, cf=2), 112))
    assert rep.df == 18 and rep.callsign == "TISB42"
    assert not rep.address_anon
    # CF=4 (TIS-B/ADS-R management): NOT an ADS-B ME — carried raw
    rep4 = parse().parse(wire(encoder.df18_frame(0x123456, me, cf=4), 112))
    assert rep4.callsign is None and rep4.me_raw == me
    # CF=3 (coarse TIS-B, different layout) and CF=7 (reserved): raw too
    for cf in (3, 7):
        r = parse().parse(wire(encoder.df18_frame(0x123456, me, cf=cf), 112))
        assert r.callsign is None and r.me_raw == me
    # CF=1: ADS-B with a non-ICAO (anonymous) address
    rep1 = parse().parse(wire(encoder.df18_frame(0x123456, me, cf=1), 112))
    assert rep1.address_anon and rep1.callsign == "TISB42"


def test_df18_anon_address_does_not_cross_pair_cpr():
    """A CF=1 anonymous address numerically equal to a real ICAO must not
    pair CPR frames with that aircraft (disjoint cache namespace)."""
    p = parse()
    ev = encoder.me_airborne_position(30000.0, 47.3, 8.2, odd=False)
    od = encoder.me_airborne_position(30000.0, 47.3, 8.2, odd=True)
    r1 = p.parse(wire(encoder.df17_frame(0xABC123, ev), 112, ts=1.0))
    assert r1.lat is None
    # same 24-bit address, but anonymous: would global-pair if shared
    r2 = p.parse(wire(encoder.df18_frame(0xABC123, od, cf=1), 112, ts=2.0))
    assert r2.lat is None
    # the real aircraft's own odd frame still pairs normally
    r3 = p.parse(wire(encoder.df17_frame(0xABC123, od), 112, ts=3.0))
    assert r3.lat is not None and abs(r3.lat - 47.3) < 1e-3


def test_tc20_gnss_altitude_flagged_geometric():
    """TC20-22 carry GNSS HAE in the same AC12 encoding (the dump1090-fa
    reading — raw meters caps at 4095 m and cannot represent en-route
    traffic); the report flags it geometric so consumers keep it apart
    from barometric altitude (r4 review)."""
    from airmodes.decode.mlat_net import _frame_altitude_ft
    me = encoder.me_airborne_position(30000.0, 47.3, 8.2, odd=False, tc=20)
    frame = encoder.df17_frame(0x111111, me)
    rep = parse().parse(wire(frame, 112))
    assert rep.altitude_gnss
    assert rep.altitude_ft == 30000
    # the mlat altitude constraint uses the same decode
    assert _frame_altitude_ft(f"{frame:028x}") == 30000
    # TC9-18 stays baro and is NOT flagged geometric
    me_baro = encoder.me_airborne_position(30000.0, 47.3, 8.2, odd=False)
    rep_b = parse().parse(wire(encoder.df17_frame(0x111111, me_baro), 112))
    assert rep_b.altitude_ft == 30000 and not rep_b.altitude_gnss


def test_tc19_reserved_subtype_carried_raw():
    """BDS0,9 subtypes 0/5-7 are reserved: their bits are undefined, so no
    vertical rate / GNSS-baro diff may be minted from them (r4 review)."""
    for sub in (0, 5, 6, 7):
        me = (19 << 51) | (sub << 48) | 0x1FFF_FFFF  # junk in the body
        rep = parse().parse(wire(encoder.df17_frame(0x222222, me), 112))
        assert rep.bds == "BDS0,9" and rep.me_raw == me
        assert rep.vertical_rate_fpm is None
        assert rep.gnss_baro_diff_ft is None
        assert rep.speed_kt is None


def test_tc31_reserved_subtype_carried_raw():
    """TC31 reserved subtypes (2-7) carry raw like TC28/29 reserved
    subtypes instead of raising NoHandlerError (r4 review)."""
    for sub in (2, 5, 7):
        me = (31 << 51) | (sub << 48) | 0xABC
        rep = parse().parse(wire(encoder.df17_frame(0x333333, me), 112))
        assert rep.bds == "BDS6,5" and rep.me_raw == me
        assert rep.opstatus is None


def test_parse_nonnumeric_tokens_raise_parsererror():
    """Non-numeric df/syndrome/status/dbfs/timestamp tokens raise
    ParserError (an ADSBError), never plain ValueError — output sinks
    catch only ADSBError (r4 review)."""
    good = "17 8d4840d6202cc371c32ce0576098 000000 0 -20.00 1.0"
    for i, bad in [(0, "seventeen"), (2, "zz"), (3, "q"),
                   (4, "loud"), (5, "never")]:
        parts = good.split()
        parts[i] = bad
        with pytest.raises(ADSBError):
            parse().parse(" ".join(parts))


def test_parse_nonhex_frame_raises_parsererror():
    """A valid-length frame token of non-hex characters must raise
    ParserError, not plain ValueError (r5 review: the int(hex, 16) sat
    outside the try, killing every ADSBError-only output sink)."""
    with pytest.raises(ADSBError):
        parse().parse("17 " + "Z" * 28 + " 000000 0 -20.0 1.0")
    with pytest.raises(ADSBError):
        parse().parse("4 " + "Q" * 14 + " 000000 3 -20.0 1.0")


def test_surveillance_fs_maps_on_surface():
    """DF4/5/20/21 flight status 1/3 = on the ground; the report (and
    thus the SBS-1 ground flag) must say so (r5 review: only DF0/16's
    VS bit was mapped)."""
    from airmodes.decode.altitude import encode_alt_q
    for fs, expect in ((0, False), (1, True), (2, False), (3, True)):
        f4 = encoder.df4_frame(0x123456, encode_alt_q(10000.0), fs=fs)
        rep = parse().parse(wire(f4, 56, syndrome=0x123456, status=3))
        assert rep.on_surface is expect, (fs, expect)
        f5 = encoder.df5_frame(0x123456, 0o1234, fs=fs)
        rep5 = parse().parse(wire(f5, 56, syndrome=0x123456, status=3))
        assert rep5.on_surface is expect


def test_elm_flush_anchor_survives_timestamp_regression():
    """A replay restart jumps wire timestamps backwards; the idle-ELM
    flush high-water mark must re-anchor instead of stalling flushes
    until time climbs past the old mark (r5 review)."""
    p = parse()
    f = encoder.df17_frame(0x4840D6, encoder.me_identification("ELMT"))
    p.parse(wire(f, 112, ts=1000.0))
    assert p._elm_flush_t == 1000.0
    p.parse(wire(f, 112, ts=3.0))       # regression: re-anchor
    assert p._elm_flush_t == 3.0


def test_parse_wrong_length_for_df_raises_adsberror():
    """A 56-bit frame whose header claims a 112-bit DF must raise an
    ADSBError from layout extraction, not plain ValueError (r4 review:
    one such message used to kill every output sink)."""
    frame, n = encoder.build_frame(17 << 27, 32)   # 56-bit "DF17"
    assert n == 56
    with pytest.raises(ADSBError):
        parse().parse(wire(frame, 56))

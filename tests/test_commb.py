"""Comm-B BDS register inference + decoding (beyond-reference capability)."""

import pytest

from airmodes import crc
from airmodes.decode import commb
from airmodes.decode.altitude import encode_alt_q
from airmodes.decode.parse import parse
from airmodes.testing import encoder


def pack(*fields):
    """Pack (value, width) pairs MSB-first into a 56-bit MB payload."""
    mb = 0
    total = 0
    for value, width in fields:
        assert 0 <= value < (1 << width), (value, width)
        mb = (mb << width) | value
        total += width
    assert total == 56, total
    return mb


def mb_bds40(mcp_ft=None, fms_ft=None, baro_mb=None, modes=None, tgt=None):
    m_st = 1 if modes is not None else 0
    vnav, hold, app = modes or (0, 0, 0)
    return pack(
        (1 if mcp_ft is not None else 0, 1), (int((mcp_ft or 0) / 16), 12),
        (1 if fms_ft is not None else 0, 1), (int((fms_ft or 0) / 16), 12),
        (1 if baro_mb is not None else 0, 1),
        (int(round(((baro_mb or 800.0) - 800.0) / 0.1)), 12),
        (0, 8), (m_st, 1), (vnav, 1), (hold, 1), (app, 1), (0, 2),
        (1 if tgt is not None else 0, 1), (tgt or 0, 2))


def signed_field(value_scaled: int, bits: int):
    """(sign, magnitude-field) for a two's-complement scaled value."""
    if value_scaled < 0:
        return 1, value_scaled + (1 << bits)
    return 0, value_scaled


def mb_bds50(roll_raw=0, trk_raw=0, gs_raw=0, tr_raw=0, tas_raw=0):
    rs, rv = signed_field(roll_raw, 9)
    ts, tv = signed_field(trk_raw, 10)
    trs, trv = signed_field(tr_raw, 9)
    return pack((1, 1), (rs, 1), (rv, 9),
                (1, 1), (ts, 1), (tv, 10),
                (1, 1), (gs_raw, 10),
                (1, 1), (trs, 1), (trv, 9),
                (1, 1), (tas_raw, 10))


def mb_bds60(hdg_raw=0, ias=0, mach_raw=0, vrb_raw=0, vri_raw=0):
    hs, hv = signed_field(hdg_raw, 10)
    bs, bv = signed_field(vrb_raw, 9)
    is_, iv = signed_field(vri_raw, 9)
    return pack((1, 1), (hs, 1), (hv, 10),
                (1, 1), (ias, 10),
                (1, 1), (mach_raw, 10),
                (1, 1), (bs, 1), (bv, 9),
                (1, 1), (is_, 1), (iv, 9))


def test_bds40_decode():
    mb = mb_bds40(mcp_ft=10000, baro_mb=1013.2, modes=(1, 0, 0), tgt=3)
    out = commb.decode_bds40(mb)
    assert out["mcp_altitude_ft"] == 10000.0
    assert out["baro_setting_mb"] == pytest.approx(1013.2)
    assert out["vnav"] is True and out["alt_hold"] is False
    assert out["target_alt_source"] == "fms"
    assert "fms_altitude_ft" not in out
    assert commb.infer(mb) == ["BDS4,0"]


def test_bds50_decode():
    # roll -10.546875 deg (raw -60), track 120.9375 (raw 688), GS 220 kt,
    # track rate +0.5 deg/s (raw 16), TAS 230 kt
    mb = mb_bds50(roll_raw=-60, trk_raw=688, gs_raw=110, tr_raw=16,
                  tas_raw=115)
    out = commb.decode_bds50(mb)
    assert out["roll_deg"] == pytest.approx(-60 * 45.0 / 256.0)
    assert out["track_deg"] == pytest.approx(688 * 90.0 / 512.0)
    assert out["groundspeed_kt"] == 220.0
    assert out["track_rate_dps"] == pytest.approx(0.5)
    assert out["tas_kt"] == 230.0
    assert "BDS5,0" in commb.infer(mb)


def test_bds60_decode():
    # heading 42.71 (raw 243), IAS 252 kt, Mach 0.42 (raw 105),
    # baro rate -1920 fpm (raw -60), inertial -2048 fpm (raw -64)
    mb = mb_bds60(hdg_raw=243, ias=252, mach_raw=105, vrb_raw=-60,
                  vri_raw=-64)
    out = commb.decode_bds60(mb)
    assert out["mag_heading_deg"] == pytest.approx(243 * 90.0 / 512.0)
    assert out["ias_kt"] == 252.0
    assert out["mach"] == pytest.approx(0.42)
    assert out["baro_vertical_rate_fpm"] == -1920.0
    assert out["inertial_vertical_rate_fpm"] == -2048.0
    assert "BDS6,0" in commb.infer(mb)


def test_bds20_decode():
    me = encoder.me_identification("KLM1023")
    mb = (0x20 << 48) | (me & ((1 << 48) - 1))
    out = commb.decode_bds20(mb)
    assert out["callsign"] == "KLM1023"
    assert commb.infer(mb) == ["BDS2,0"]


def test_bds17_decode():
    # capability flags for BDS 0,5 / 0,8 / 2,0 / 4,0 / 5,0 / 6,0
    flags = 0
    for svc in ("0,5", "0,8", "2,0", "4,0", "5,0", "6,0"):
        flags |= 1 << (23 - commb.BDS17_SERVICES.index(svc))
    mb = flags << 32
    out = commb.decode_bds17(mb)
    assert out["gicb_services"] == ["0,5", "0,8", "2,0", "4,0", "5,0", "6,0"]
    assert commb.infer(mb) == ["BDS1,7"]


def test_status_zero_forces_value_zero():
    # BDS4,0 with mcp_status=0 but mcp_alt nonzero is inconsistent
    bad = pack((0, 1), (625, 12), (0, 1), (0, 12), (0, 1), (0, 12),
               (0, 8), (0, 1), (0, 1), (0, 1), (0, 1), (0, 2), (0, 1), (0, 2))
    assert not commb.is_bds40(bad)
    # reserved bits nonzero also rejects
    bad2 = mb_bds40(mcp_ft=10000) | (1 << 12)   # inside _r1
    assert not commb.is_bds40(bad2)


def test_bds50_jetstream_groundspeed_accepted():
    # GS 640 kt / TAS 480 kt: routine for a jet in a strong tailwind —
    # must stay consistent with BDS5,0 (regression: caps were once 600/200)
    mb = mb_bds50(roll_raw=5, trk_raw=300, gs_raw=320, tr_raw=0, tas_raw=240)
    assert "BDS5,0" in commb.infer(mb)
    assert commb.decode_bds50(mb)["groundspeed_kt"] == 640.0


def test_implausible_values_reject():
    assert not commb.is_bds50(mb_bds50(roll_raw=400, trk_raw=0, gs_raw=100,
                                       tr_raw=0, tas_raw=100))   # |roll|>50
    assert not commb.is_bds60(mb_bds60(hdg_raw=100, ias=900, mach_raw=100,
                                       vrb_raw=0, vri_raw=0))    # IAS 900

def test_empty_mb_infers_nothing():
    assert commb.infer(0) == []
    assert commb.decode(0) is None


def test_ambiguous_mb_not_decoded():
    # craft a payload passing >= 2 probes: verify decode() stays None.
    # (BDS1,7-shaped: flags-only; also shaped like a BDS4,0 with only MCP
    # data would collide if reserved bits allow — assert behavior, not a
    # specific register set.)
    for mb in (mb_bds50(roll_raw=0, trk_raw=100, gs_raw=110, tr_raw=0,
                        tas_raw=110),
               mb_bds60(hdg_raw=10, ias=252, mach_raw=105, vrb_raw=0,
                        vri_raw=0)):
        matches = commb.infer(mb)
        if len(matches) > 1:
            assert commb.decode(mb) is None
        else:
            name, _ = commb.decode(mb)
            assert name in matches


def test_df20_wire_integration():
    icao = 0xABCDEF
    mb = mb_bds40(mcp_ft=25600, baro_mb=1020.0)
    frame = encoder.df20_frame(icao, encode_alt_q(25000.0), mb=mb)
    syndrome = crc.crc24(frame, 112)
    assert syndrome == icao            # AP overlaid with the ICAO address
    wire = f"20 {frame:028x} {syndrome:06x} 0 -20.0 1.0"
    rep = parse().parse(wire)
    assert rep.icao == icao
    assert rep.altitude_ft == 25000
    assert rep.bds == "BDS4,0"
    assert rep.commb["mcp_altitude_ft"] == 25600.0
    assert rep.commb["baro_setting_mb"] == pytest.approx(1020.0)


def test_df21_wire_integration_callsign():
    icao = 0x4840D6
    me = encoder.me_identification("ABC9876")
    mb = (0x20 << 48) | (me & ((1 << 48) - 1))
    from airmodes.decode.fields import encode_squawk
    frame = encoder.df21_frame(icao, encode_squawk(7421), mb=mb)
    wire = f"21 {frame:028x} {crc.crc24(frame, 112):06x} 0 -20.0 1.0"
    rep = parse().parse(wire)
    assert rep.squawk == 7421
    assert rep.callsign == "ABC9876"
    assert rep.bds == "BDS2,0"


def mb_bds44(wind=None, temp_c=0.0, press=None, turb=None, hum=None, fom=1):
    ws, wd = wind or (0, 0)
    t_raw = int(round(temp_c / 0.25))
    t_s, t_v = signed_field(t_raw, 10)
    return pack((fom, 4),
                (1 if wind is not None else 0, 1), (ws, 9),
                (int(round(wd * 256.0 / 180.0)), 9),
                (t_s, 1), (t_v, 10),
                (1 if press is not None else 0, 1), (press or 0, 11),
                (1 if turb is not None else 0, 1), (turb or 0, 2),
                (1 if hum is not None else 0, 1), (hum or 0, 6))


def test_bds44_decode():
    mb = mb_bds44(wind=(85, 270.0), temp_c=-52.25, press=1005, turb=1,
                  hum=32)
    out = commb.decode_bds44(mb)
    assert out["wind_speed_kt"] == 85.0
    assert out["wind_dir_deg"] == pytest.approx(270.0, abs=0.5)
    assert out["temperature_c"] == -52.25
    assert out["pressure_hpa"] == 1005.0
    assert out["turbulence"] == "light"
    assert out["humidity_pct"] == 50.0
    assert "BDS4,4" in commb.infer(mb)


def test_bds44_rejects():
    # no wind report -> not in use as MRAR
    assert not commb.is_bds44(mb_bds44(wind=None, temp_c=-50.0))
    # implausible temperature
    assert not commb.is_bds44(mb_bds44(wind=(50, 90.0), temp_c=100.0))
    # implausible wind speed
    assert not commb.is_bds44(mb_bds44(wind=(400, 90.0), temp_c=-50.0))


def mb_bds45(hazards=None, temp_c=0.0, press=None, rh_ft=None):
    """hazards: dict of {turb,ws,mb,ice,wake} -> 0..3 levels."""
    hz = hazards or {}
    t_raw = int(round(temp_c / 0.25))
    t_s, t_v = signed_field(t_raw, 9)
    fields = []
    for key in ("turb", "ws", "mb", "ice", "wake"):
        fields += [(1 if key in hz else 0, 1), (hz.get(key, 0), 2)]
    fields += [(1, 1), (t_s, 1), (t_v, 9),
               (1 if press is not None else 0, 1), (press or 0, 11),
               (1 if rh_ft is not None else 0, 1),
               (int((rh_ft or 0) / 16), 12),
               (0, 5)]
    return pack(*fields)


def test_bds45_decode():
    mb = mb_bds45(hazards={"turb": 2, "ice": 1}, temp_c=-51.25,
                  press=220, rh_ft=2400)
    out = commb.decode_bds45(mb)
    assert out["turbulence"] == "moderate"
    assert out["icing"] == "light"
    assert "wind_shear" not in out          # status 0: not reported
    assert out["temperature_c"] == -51.25
    assert out["pressure_hpa"] == 220.0
    assert out["radio_height_ft"] == 2400.0
    assert "BDS4,5" in commb.infer(mb)


def test_bds45_rejects():
    # status-0 hazard with nonzero level bits (ws level high bit, no status)
    mb = mb_bds45(hazards={"turb": 2}, temp_c=-50.0, rh_ft=800)
    assert commb.is_bds45(mb)
    assert not commb.is_bds45(mb | (1 << 51))
    # implausible SAT
    assert not commb.is_bds45(
        mb_bds45(hazards={"turb": 1}, temp_c=80.0, rh_ft=800))
    # reserved bits must be zero
    assert not commb.is_bds45(
        mb_bds45(hazards={"turb": 1}, temp_c=-10.0, rh_ft=800) | 1)
    # implausible static pressure
    assert not commb.is_bds45(mb_bds45(hazards={"turb": 1}, press=50))
    # SAT+hazards alone (no pressure, no radio height) is indistinguishable
    # from a common BDS1,7 capability set -> rejected to keep 1,7 unique
    assert not commb.is_bds45(mb_bds45(hazards={"turb": 1}, temp_c=-10.0))


def test_bds45_unique_inference_end_to_end():
    from airmodes.decode.parse import parse as parse_cls
    from airmodes.testing import encoder
    from airmodes import crc
    mb = mb_bds45(hazards={"turb": 3, "ws": 2}, temp_c=-40.0, rh_ft=1600)
    if commb.decode(mb) is None:
        pytest.skip("payload not uniquely inferable (acceptable)")
    frame = encoder.df20_frame(0x4840D6, 0x1234, mb=mb)
    synd = crc.crc24(frame, 112)
    w = f"20 {frame:028x} {synd:06x} 3 -20.00 1700000000.0"
    rep = parse_cls().parse(w)
    assert rep.bds == "BDS4,5"
    assert rep.commb["turbulence"] == "severe"

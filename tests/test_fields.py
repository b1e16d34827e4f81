"""Bitfield layouts, squawk, callsign charmap."""

import pytest

from airmodes.decode import fields
from airmodes.exceptions import FieldNotInPacket, NoHandlerError


def test_data_field_extraction():
    df = fields.data_field(0xABCD, 16, [("hi", 8), ("lo", 8)])
    assert df["hi"] == 0xAB and df["lo"] == 0xCD
    with pytest.raises(FieldNotInPacket):
        df["nope"]


def test_layout_widths_sum():
    for dfnum, layout in fields.MODES_LAYOUTS.items():
        total = sum(w for _, w in layout)
        expected = 112 if dfnum >= 16 else 56
        assert total == expected, f"DF{dfnum} layout sums to {total}"


def test_modes_reply_df17():
    frame = int("8D4840D6202CC371C32CE0576098", 16)
    rep = fields.modes_reply(frame, 112)
    assert rep["df"] == 17
    assert rep["ca"] == 5
    assert rep["aa"] == 0x4840D6
    assert rep["me"] == 0x202CC371C32CE0


def test_callsign_known():
    me = 0x202CC371C32CE0
    rep = fields.me_reply(me)
    assert rep["ftc"] == 4
    assert fields.decode_callsign(rep["ident"]) == "KLM1023"


def test_squawk_roundtrip():
    for code in (0, 1200, 7500, 7600, 7700, 4215, 7777):
        assert fields.decode_squawk(fields.encode_squawk(code)) == code


def test_me_reply_dispatch():
    assert fields.me_reply(4 << 51)["ftc"] == 4
    assert fields.me_reply(6 << 51)["ftc"] == 6
    assert fields.me_reply(11 << 51)["ftc"] == 11
    assert fields.me_reply((19 << 51) | (1 << 48))["sub"] == 1
    assert fields.me_reply((19 << 51) | (3 << 48))["sub"] == 3
    with pytest.raises(NoHandlerError):
        fields.me_reply(25 << 51)

"""DF24 Comm-D ELM segment reassembly round-trip (beyond the reference,
which carries DF24 raw — python/parse.py DF24 layout)."""

from airmodes.decode.elm import elm_reassembler
from airmodes.decode.parse import parse
from airmodes.testing import encoder

ICAO = 0x4840D6


def _wire(frame: int, ts: float) -> str:
    return f"24 {frame:028x} {ICAO:06x} 3 -20.0 {ts:.9f}"


def test_elm_roundtrip_via_cycle_restart():
    data = bytes(range(25))                       # 3 segments (last padded)
    frames = encoder.df24_segments(ICAO, data)
    assert len(frames) == 3
    p = parse()
    reps = [p.parse(_wire(f, 1.0 + i * 0.01)) for i, f in enumerate(frames)]
    assert [r.elm_nd for r in reps] == [0, 1, 2]
    assert all(r.elm_ke == 0 and r.bds == "Comm-D" for r in reps)
    assert all(r.elm_data is None for r in reps)  # cycle still open
    assert reps[1].elm_md == int.from_bytes(data[10:20], "big")
    assert reps[0].icao == ICAO                   # AP-overlaid address

    # a NEW cycle starting (segment 0 again, different payload) emits the
    # previous complete cycle
    f2 = encoder.df24_segments(ICAO, b"NEXTCYCLE!")[0]
    r = p.parse(_wire(f2, 2.0))
    assert r.elm_data is not None
    assert r.elm_data[:25] == data
    assert r.elm_data == data + b"\0" * 5         # 10-byte segment padding


def test_elm_flush_idle_and_force():
    e = elm_reassembler(timeout_s=5.0)
    for i, f in enumerate(encoder.df24_segments(ICAO, b"A" * 20)):
        nd, md = i, int.from_bytes((b"A" * 20)[i * 10:(i + 1) * 10], "big")
        assert e.add(ICAO, 0, nd, md, 1.0 + i * 0.01) is None
    assert e.flush(2.0) == []                     # not idle yet
    out = e.flush(10.0)                           # idle past timeout
    assert out == [(ICAO, b"A" * 20)]
    assert e.flush(99.0) == []                    # cleared
    # force=True emits regardless of age (end of stream)
    e.add(ICAO, 0, 0, 7, 1.0)
    assert e.flush(1.0, force=True) == [(ICAO, (7).to_bytes(10, "big"))]


def test_elm_incomplete_cycle_not_emitted():
    e = elm_reassembler(timeout_s=5.0)
    e.add(ICAO, 0, 0, 111, 1.0)
    e.add(ICAO, 0, 2, 333, 1.1)                   # hole at nd=1
    assert e.flush(100.0) == []                   # worthless partial dropped
    e.add(ICAO, 0, 1, 222, 200.0)                 # segment 1 alone
    assert e.flush(300.0) == []                   # no segment 0


def test_elm_pure_retransmission_is_not_a_restart():
    e = elm_reassembler(timeout_s=5.0)
    e.add(ICAO, 0, 0, 111, 1.0)
    e.add(ICAO, 0, 1, 222, 1.1)
    assert e.add(ICAO, 0, 1, 222, 1.2) is None    # same nd, same payload
    out = e.flush(100.0)
    assert out and out[0][1][-10:] == (222).to_bytes(10, "big")


def test_elm_uplink_ack_ignored():
    e = elm_reassembler()
    assert e.add(ICAO, 1, 0, 999, 1.0) is None
    assert e.flush(100.0, force=True) == []
    p = parse()
    f = encoder.df24_frame(ICAO, 0, 0, ke=1)
    r = p.parse(_wire(f, 1.0))
    assert r.elm_ke == 1 and r.elm_data is None


def test_elm_console_line():
    from airmodes.outputs.msprint import output_print
    p = parse()
    frames = encoder.df24_segments(ICAO, b"HELLOELM??")
    line = output_print.format_report(p.parse(_wire(frames[0], 1.0)))
    assert "Comm-D segment 0" in line and "4840d6" in line
    # restart completes the single-segment cycle
    f2 = encoder.df24_segments(ICAO, b"0123456789")[0]
    line = output_print.format_report(p.parse(_wire(f2, 2.0)))
    assert "ELM complete 10B" in line
    assert b"HELLOELM??".hex() in line


def test_elm_eviction_bounds_memory():
    e = elm_reassembler(max_aircraft=4)
    for i in range(10):
        e.add(0x100000 + i, 0, 0, i, float(i))
    assert len(e._buf) <= 4
    # the freshest aircraft survived
    assert 0x100009 in e._buf


def test_idle_elm_surfaces_via_parse_clock():
    """A cycle that ends without a restart segment must still emit: the
    parser flushes idle ELMs on later messages (its only clock)."""
    from airmodes.decode.parse import parse
    from airmodes.outputs.msprint import output_print
    from airmodes.testing import encoder
    from airmodes import crc

    def wire(frame, nbits, ts):
        s = crc.crc24(frame, nbits)
        return (f"{frame >> (nbits - 5)} {frame:0{nbits // 4}x} {s:06x} "
                f"0 -20.00 {ts:.9f}")

    p = parse()
    lines = []
    plug = output_print(parser=p, callback=lines.append)
    payload = bytes(range(30))
    for i, f in enumerate(encoder.df24_segments(0xAABBCC, payload)):
        plug.output(wire(f, 112, 1000.0 + 0.1 * i))
    # no restart; an unrelated message 10 s later drives the flush
    other = encoder.df11_frame(0x123456)
    plug.output(wire(other, 56, 1011.0))
    done = [ln for ln in lines if "ELM complete (idle)" in ln]
    assert len(done) == 1
    assert payload.hex() in done[0] and "aabbcc" in done[0]


def test_elm_stale_leftovers_do_not_merge_into_new_cycle():
    """r5 review: segments of a NEW transmission after an idle gap must
    not merge with stale leftovers of an old one — the spliced result
    passed the contiguity check and minted a corrupted 'complete' ELM."""
    from airmodes.decode.elm import elm_reassembler
    r = elm_reassembler(timeout_s=5.0)
    old = bytes(range(10))
    # old cycle: caught segments 2,3 only (0,1 missed)
    assert r.add(1, 0, 2, int.from_bytes(old, "big"), 0.0) is None
    assert r.add(1, 0, 3, int.from_bytes(old, "big"), 0.1) is None
    # 100 s later: a new ELM's segments 0,1 arrive (2,3 missed this time)
    new = bytes(range(100, 110))
    assert r.add(1, 0, 0, int.from_bytes(new, "big"), 100.0) is None
    r.add(1, 0, 1, int.from_bytes(new, "big"), 100.1)
    # nothing contiguous may ever be emitted from the spliced halves
    for _, data in r.flush(200.0, force=True):
        assert old not in data, "stale segments merged into a new cycle"


def test_elm_restart_does_not_evict_other_aircraft():
    """r5 review: a cycle RESTART replaces the aircraft's own slot; at
    capacity it must not evict an unrelated aircraft's in-progress ELM."""
    from airmodes.decode.elm import elm_reassembler
    r = elm_reassembler(timeout_s=1000.0, max_aircraft=2)
    r.add(0xA, 0, 0, 1, 1.0)
    r.add(0xB, 0, 0, 2, 2.0)          # buffer at capacity
    # aircraft A restarts (same nd, different payload): no net insert
    r.add(0xA, 0, 0, 3, 3.0)
    assert 0xB in r._buf, "restart evicted an unrelated aircraft"

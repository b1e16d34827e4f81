"""End-to-end DSP pipeline tests: encoder capture -> device demod -> messages.

This is milestone M1 from SURVEY.md §7: file capture -> detect -> slice ->
CRC -> hex messages, bit-matched against ground truth.
"""

import numpy as np
import pytest

from airmodes.config import DspConfig
from airmodes.dsp import host
from airmodes.dsp.pipeline import demod_block_jit
from airmodes.io import sources
from airmodes.testing import encoder

CFG = DspConfig(block_size=1 << 16, max_detections=64)


def run_capture(iq, cfg=CFG):
    msgs = []
    stats = host.BlockStats()
    for block, start in sources.frame_blocks(iq, cfg):
        table = demod_block_jit(block, cfg)
        msgs.extend(host.table_to_messages(table, start, cfg.channel_rate,
                                           stats=stats))
    return msgs, stats


def hex_set(msgs):
    return {m.split()[1] for m in msgs}


def test_single_df17_high_snr():
    frames = [(int("8d4840d6202cc371c32ce0576098", 16), 112)]
    iq, truth = encoder.make_capture(frames, snr_db=25.0, seed=1)
    msgs, stats = run_capture(iq)
    assert hex_set(msgs) == {"8d4840d6202cc371c32ce0576098"}
    # timestamp matches the injected sample index
    ts = float(msgs[0].split()[5])
    assert abs(ts - truth[0].sample_index / 2e6) < 1e-6


def test_many_df17_frames_bit_match():
    frames = encoder.random_df17_frames(60, seed=7)
    iq, truth = encoder.make_capture(frames, snr_db=22.0, spacing=3000, seed=7)
    msgs, stats = run_capture(iq)
    want = {t.hex for t in truth}
    got = hex_set(msgs)
    assert want <= got, f"missing {len(want - got)} of {len(want)}"
    assert stats.crc_ok >= len(want)


def test_short_frames_df11():
    frames = [(encoder.df11_frame(0x4840D6 + i), 56) for i in range(10)]
    iq, truth = encoder.make_capture(frames, snr_db=25.0, seed=3)
    msgs, _ = run_capture(iq)
    got = hex_set(msgs)
    assert {t.hex for t in truth} <= got


def test_df4_df5_address_recovery():
    from airmodes.decode.altitude import encode_alt_q
    from airmodes.decode.fields import encode_squawk
    frames = [(encoder.df4_frame(0x123456, encode_alt_q(30000)), 56),
              (encoder.df5_frame(0x654321, encode_squawk(7700)), 56)]
    iq, truth = encoder.make_capture(frames, snr_db=25.0, seed=4)
    msgs, _ = run_capture(iq)
    by_hex = {m.split()[1]: m for m in msgs}
    for t in truth:
        assert t.hex in by_hex
        syndrome = int(by_hex[t.hex].split()[2], 16)
        icao = 0x123456 if t.df == 4 else 0x654321
        assert syndrome == icao


def test_block_boundary_straddle():
    """A frame whose preamble starts near the end of a block must decode
    exactly once (overlap-save halo, no duplicate from the next block)."""
    cfg = DspConfig(block_size=1 << 14, max_detections=32)
    frame = int("8d4840d6202cc371c32ce0576098", 16)
    hits = []
    for offset in [cfg.block_size - 5, cfg.block_size - 120,
                   cfg.block_size - 240, cfg.block_size + 3]:
        iq, truth = encoder.make_capture(
            [(frame, 112)], snr_db=25.0, start=offset, seed=5,
            total_samples=3 * cfg.block_size)
        msgs, _ = run_capture(iq, cfg)
        matching = [m for m in msgs if m.split()[1] == "8d4840d6202cc371c32ce0576098"]
        hits.append((offset, len(matching)))
    assert all(n == 1 for _, n in hits), hits


def test_ecc_corrects_low_confidence_bit():
    """Knock one data chip down so its bit is ambiguous: brute-force ECC must
    recover the frame (ref: slicer DF17 low-confidence flips)."""
    frame = int("8d4840d6202cc371c32ce0576098", 16)
    iq, truth = encoder.make_capture([(frame, 112)], snr_db=25.0,
                                     noise_power=1e-2, seed=6,
                                     random_phase=False)
    p = truth[0].sample_index
    # bit 40 of the data: chips at 16 + 80, 16 + 81. Erase both chips so the
    # pair compares on noise alone -> low confidence either way.
    for chip in (16 + 80, 16 + 81):
        iq[p + chip] = 0.05 + 0j
    msgs, stats = run_capture(iq)
    got = hex_set(msgs)
    assert "8d4840d6202cc371c32ce0576098" in got
    statuses = [int(m.split()[3]) for m in msgs if m.split()[1] == truth[0].hex]
    assert statuses[0] in (0, 1)  # likely corrected, maybe clean by luck


def test_low_snr_no_false_positives():
    """Pure noise must produce (nearly) no emitted messages."""
    rng = np.random.default_rng(8)
    iq = ((rng.standard_normal(1 << 17) + 1j * rng.standard_normal(1 << 17))
          * np.sqrt(5e-3)).astype(np.complex64)
    msgs, stats = run_capture(iq)
    assert len(msgs) <= 2  # allow a rare noise-triggered AP-type frame


def test_detection_overflow_counter():
    cfg = DspConfig(block_size=1 << 15, max_detections=4)
    frames = encoder.random_df17_frames(12, seed=9)
    iq, _ = encoder.make_capture(frames, snr_db=25.0, spacing=1500, seed=9,
                                 total_samples=cfg.block_size)
    msgs, stats = run_capture(iq, cfg)
    assert stats.overflow > 0
    assert stats.preambles >= 12


def test_compact_two_stage_matches_dense():
    """Two-stage grouped compaction == plain top_k on typical masks, and
    accounts per-group spill into the overflow counter."""
    from airmodes.dsp.pipeline import compact_detections
    rng = np.random.default_rng(5)
    n = 1 << 15
    mask = np.zeros(n, bool)
    mask[rng.choice(n, 40, replace=False)] = True
    det, valid, n_det, ovf = (np.asarray(x) for x in
                              compact_detections(mask, 64))
    want = np.flatnonzero(mask)
    assert list(det[valid == 1]) == list(want)
    assert int(n_det) == 40 and int(ovf) == 0

    # pathological: 30 hits inside ONE 1024-sample group (> per_group=16)
    mask2 = np.zeros(n, bool)
    mask2[2048:2048 + 60:2] = True
    det2, valid2, n_det2, ovf2 = (np.asarray(x) for x in
                                  compact_detections(mask2, 64))
    kept = det2[valid2 == 1]
    assert int(n_det2) == 30
    assert len(kept) == 16          # per-group cap
    assert int(ovf2) == 30 - 16     # spill is accounted, not silent
    assert list(kept) == list(np.flatnonzero(mask2)[:16])


def test_buffered_framer_matches_frame_blocks():
    cfg = DspConfig(block_size=4096)
    rng = np.random.default_rng(10)
    iq = (rng.standard_normal(3 * 4096 + 777) +
          1j * rng.standard_normal(3 * 4096 + 777)).astype(np.complex64)
    ref_blocks = list(sources.frame_blocks(iq, cfg))
    fr = sources.buffered_framer(cfg)
    stream_blocks = []
    pos = 0
    for chunk in np.array_split(iq, 17):
        stream_blocks.extend(fr.push(chunk))
    stream_blocks.extend(fr.flush())
    assert len(ref_blocks) == len(stream_blocks)
    for (a, sa), (b, sb) in zip(ref_blocks, stream_blocks):
        assert sa == sb
        np.testing.assert_array_equal(a, b)


def test_float32_iq_layout_matches_complex():
    """TPU-native (N,2) float32 I/Q layout must produce identical tables."""
    from airmodes.dsp.pipeline import iq_to_device_layout
    frames = encoder.random_df17_frames(8, seed=11)
    iq, _ = encoder.make_capture(frames, snr_db=20.0, seed=11)
    cfg = CFG
    for block, start in sources.frame_blocks(iq, cfg):
        t_c = demod_block_jit(block, cfg)
        t_f = demod_block_jit(iq_to_device_layout(block), cfg)
        for a, b in zip(t_c, t_f):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_table_roundtrip():
    from airmodes.dsp.pipeline import demod_block_packed_jit, unpack_table
    frames = encoder.random_df17_frames(10, seed=12)
    iq, truth = encoder.make_capture(frames, snr_db=20.0, seed=12)
    for block, start in sources.frame_blocks(iq, CFG):
        ref = demod_block_jit(block, CFG)
        packed = demod_block_packed_jit(block, CFG)
        got = unpack_table(packed)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        msgs = host.table_to_messages(got, start, CFG.channel_rate)
        assert msgs == host.table_to_messages(ref, start, CFG.channel_rate)


def test_run_pipelined_batched_matches_serial():
    from airmodes.io.stream import run_pipelined
    frames = encoder.random_df17_frames(20, seed=13)
    iq, truth = encoder.make_capture(frames, snr_db=20.0, spacing=6000,
                                     seed=13, total_samples=5 * CFG.block_size)
    serial = [m for msgs in run_pipelined(
        sources.frame_blocks(iq, CFG), CFG) for m in msgs]
    batched = [m for msgs in run_pipelined(
        sources.frame_blocks(iq, CFG), CFG, batch=2) for m in msgs]
    assert serial == batched
    assert {t.hex for t in truth} <= {m.split()[1] for m in serial}


def test_file_source_resume(tmp_path):
    """Resuming from a sample counter yields the same remaining messages."""
    frames = encoder.random_df17_frames(10, seed=14)
    iq, truth = encoder.make_capture(frames, snr_db=25.0, spacing=9000,
                                     seed=14, total_samples=2 * CFG.block_size)
    path = str(tmp_path / "cap.c64")
    iq.tofile(path)
    full = []
    for block, start in sources.file_source(path, CFG):
        t = demod_block_jit(block, CFG)
        full.extend(host.table_to_messages(t, start, CFG.channel_rate))
    resume_at = CFG.block_size
    tail = []
    for block, start in sources.file_source(path, CFG,
                                            start_sample=resume_at):
        t = demod_block_jit(block, CFG)
        tail.extend(host.table_to_messages(t, start, CFG.channel_rate))
    # all full-run messages with timestamps past the resume point (plus a
    # halo margin) must appear identically in the resumed run
    margin = (resume_at + CFG.left_halo) / CFG.channel_rate
    want = [m for m in full if float(m.split()[5]) > margin]
    assert set(want) <= set(tail)


def test_pure_noise_no_false_messages():
    """Gaussian noise only: the CRC gate must reject everything the
    detector tentatively fires on (false-decode rate ~0 by construction —
    a random 112-bit frame passes CRC with p = 2^-24, and DF17 correction
    is bounded to low-confidence flips)."""
    rng = np.random.default_rng(99)
    cfg = DspConfig(block_size=1 << 16, max_detections=64)
    msgs = []
    n_det = 0
    for _ in range(4):
        n = cfg.left_halo + cfg.block_size + cfg.right_halo
        iq = (rng.standard_normal((n, 2)) * 0.1).astype(np.float32)
        table = demod_block_jit(iq, cfg)
        n_det += int(np.asarray(table.n_detected))
        msgs.extend(host.table_to_messages(table, 0, cfg.channel_rate))
    assert msgs == [], f"false decodes from noise: {msgs} ({n_det} cands)"


def test_boundary_preamble_cluster_decoded_once():
    """At sps > 1 the detector fires on several sample offsets around a true
    preamble (chip-energy smoothing) and NMS picks the peak. When that
    cluster straddles a block boundary, the blocked pipeline must still
    decode the frame exactly once — the NMS window reads real halo data,
    not zero padding (regression: each block kept its own local max)."""
    cfg = DspConfig(channel_rate=4e6, block_size=1 << 14, max_detections=16)
    frame = int("8d4840d6202cc371c32ce0576098", 16)
    for delta in (-2, -1, 0, 1, 2):
        start = cfg.block_size * 2 + delta
        iq, _ = encoder.make_capture(
            [(frame, 112)], rate=4e6, snr_db=25.0, start=start, seed=5,
            total_samples=4 * cfg.block_size)
        msgs = []
        for block, s0 in sources.frame_blocks(iq, cfg):
            table = demod_block_jit(block, cfg)
            msgs.extend(host.table_to_messages(table, s0, cfg.channel_rate))
        hexes = [m.split()[1] for m in msgs]
        assert hexes.count("8d4840d6202cc371c32ce0576098") == 1, (delta, hexes)


def test_comm_d_df_normalized_on_wire():
    """DF first-5-bits 24..31 are all Comm-D ELM; the wire string must say
    24 (what the parser dispatches on), not the raw value."""
    from airmodes.constants import STATUS_ADDR

    class T:
        index = np.array([10])
        status = np.array([STATUS_ADDR])
        df = np.array([26])
        nbits = np.array([112])
        syndrome = np.array([0xABCDEF])
        ref_level = np.array([0.5])
        bits = np.zeros((1, 112), np.uint8)
        n_detected = np.array(1)
        n_overflow = np.array(0)
    T.bits[0, :2] = 1                      # first two bits 11 -> Comm-D
    T.bits[0, 4] = 0
    msgs = host.table_to_messages(T, 0, 2e6)
    assert msgs and msgs[0].split()[0] == "24"


def test_compact_detections_small_block_large_k():
    """block_size small relative to max_detections must route to the simple
    top_k path (regression: the grouped path asked top_k for more
    candidates than exist — a trace-time crash for block_size 4096 with
    the default max_detections=128)."""
    cfg = DspConfig(block_size=4096, max_detections=128, noise_window=64)
    n = cfg.left_halo + cfg.block_size + cfg.right_halo
    rng = np.random.default_rng(1)
    iq = (rng.standard_normal((n, 2)) * 0.05).astype(np.float32)
    table = demod_block_jit(iq, cfg)   # must trace and run
    assert np.asarray(table.index).shape == (128,)


def test_planar_kernel_rejects_high_sps():
    import pytest
    from airmodes.kernels.preamble_pallas import demod_batch_planar
    cfg = DspConfig(channel_rate=20e6, block_size=1 << 14,
                    max_detections=16)   # sps = 10
    xi = np.zeros((1, 1 << 15), np.int8)
    with pytest.raises(ValueError, match="sps <= 9"):
        demod_batch_planar(xi, xi, cfg, interpret=True)


# ---- r4 review-sweep regressions -------------------------------------------

def test_ecc_flip_of_df_bits_reports_corrected_df():
    """The brute force may flip DF-field bits (lanes 0-4): the emitted df
    must describe the CORRECTED frame (r4 review, reproduced: a DF21
    received as DF17 was 'corrected' back to DF21 bits but emitted as
    df=17, and the parser decoded garbage from a CRC-clean message)."""
    import numpy as np
    from airmodes import crc
    from airmodes.constants import STATUS_CORRECTED_1
    from airmodes.dsp.pipeline import crc_check_and_correct

    cfg = DspConfig(max_lowconf_bits=5)
    # parity-clean 112-bit frame with DF=21 (AP for address 0 == CRC)
    body = (21 << 107) | (0x123456789A << 50) | (0xBEEF << 30)
    synd = crc.crc24(body, 112)
    frame = body | synd               # crc24(frame) == 0
    assert crc.crc24(frame, 112) == 0
    # corrupt DF bit 2 (10101 -> 10001): received as DF17
    rx = frame ^ (1 << (112 - 1 - 2))
    bits = np.array([[(rx >> (111 - i)) & 1 for i in range(112)]], bool)
    conf = np.ones((1, 112), bool)
    conf[0, 2] = False                # the corrupted bit is low-confidence
    import jax.numpy as jnp
    out_bits, df, nbits, out_synd, status = crc_check_and_correct(
        jnp.asarray(bits), jnp.asarray(conf), cfg)
    assert int(status[0]) == STATUS_CORRECTED_1
    assert int(df[0]) == 21, f"emitted df {int(df[0])} for a DF21 frame"
    fixed = 0
    for b in np.asarray(out_bits)[0]:
        fixed = (fixed << 1) | int(b)
    assert fixed == frame


def test_magnitude_squared_rejects_uint8():
    import numpy as np
    import pytest
    from airmodes.dsp.pipeline import magnitude_squared
    with pytest.raises(TypeError, match="uint8"):
        magnitude_squared(np.full((16, 2), 200, np.uint8))

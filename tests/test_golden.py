"""Cross-validation against the numpy reference decoder, SNR sweep shape,
and ECC fault injection (SURVEY.md §5.3 rebuild requirements)."""

import numpy as np
import pytest

from airmodes.config import DspConfig
from airmodes.dsp import host
from airmodes.dsp.pipeline import demod_block_jit
from airmodes.io import sources
from airmodes.testing import encoder, golden

CFG = DspConfig(block_size=1 << 16, max_detections=64)


def jax_decode(iq, cfg=CFG):
    out = []
    for block, start in sources.frame_blocks(iq, cfg):
        table = demod_block_jit(block, cfg)
        for m in host.table_to_messages(table, start, cfg.channel_rate):
            parts = m.split()
            out.append((int(float(parts[5]) * cfg.channel_rate + 0.5), parts[1]))
    return sorted(out)


def test_jax_matches_numpy_reference_decoder():
    """The vectorized device pipeline and the sequential numpy oracle must
    produce the identical (index, hex) detection set."""
    frames = encoder.random_df17_frames(25, seed=40)
    frames += [(encoder.df11_frame(0x600000 + i), 56) for i in range(5)]
    iq, truth = encoder.make_capture(frames, snr_db=14.0, spacing=2000,
                                     seed=40)
    ref = sorted(golden.reference_decode(iq, CFG))
    got = jax_decode(iq)
    assert got == ref
    # and both found (at least) the injected traffic at this healthy SNR
    hexes = {h for _, h in got}
    missing = [t.hex for t in truth if t.hex not in hexes]
    assert len(missing) <= 2  # a couple may fall below threshold at 14 dB


def test_jax_matches_reference_near_threshold():
    """Agreement must hold even at marginal SNR where edge decisions bite."""
    frames = encoder.random_df17_frames(30, seed=41)
    iq, _ = encoder.make_capture(frames, snr_db=8.0, spacing=2000, seed=41)
    assert jax_decode(iq) == sorted(golden.reference_decode(iq, CFG))


def test_snr_sweep_monotone():
    """Decode rate is (near-)monotone in SNR with a bound at EVERY point —
    a broken mid-SNR point must fail, not hide between endpoints."""
    pts = golden.snr_sweep([3.0, 7.0, 10.0, 14.0, 20.0], n_msgs=25, seed=7)
    rates = [p.rate for p in pts]
    assert pts[0].injected == 25
    # adjacent points: allow one marginal message of non-monotonicity
    # (different captures per point), no more
    slack = 1.0 / 25
    for lo, hi in zip(rates, rates[1:]):
        assert hi >= lo - slack, rates
    assert rates[0] <= 0.8           # 3 dB genuinely loses messages
    assert rates[2] >= 0.5           # 10 dB decodes most traffic
    assert rates[3] >= 0.9           # 14 dB decodes nearly everything
    assert rates[4] >= 0.95          # 20 dB decodes (essentially) all


def test_noise_only_false_positive_bound():
    """Pure noise must mint NO CRC-validated messages (DF11/17/18) and no
    ECC 'corrections'. AP-overlaid DFs (0/4/5/...) are unverifiable by
    construction (the reference emits them too — address = syndrome), so
    only the CRC-checked families are pinned here. 4M samples at the
    default threshold; stats.crc_fail records the preamble-level noise
    pressure without failing the run."""
    cfg = DspConfig(block_size=1 << 20, max_detections=128)
    rng = np.random.default_rng(123)
    n = 4 * cfg.block_size
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) \
        .astype(np.complex64) * 0.05
    stats = host.BlockStats()
    msgs = []
    for block, start in sources.frame_blocks(iq, cfg):
        table = demod_block_jit(block, cfg)
        msgs.extend(host.table_to_messages(table, start, cfg.channel_rate,
                                           stats=stats))
    validated = [m for m in msgs if int(m.split()[0]) in (11, 17, 18)]
    assert validated == [], validated
    assert stats.corrected == 0
    # and the counters stay coherent: everything surfaced is accounted
    assert stats.emitted == len(msgs)


def test_ecc_fault_injection_single_bit():
    frames = [(int("8d4840d6202cc371c32ce0576098", 16), 112)]
    iq, truth = encoder.make_capture(frames, snr_db=25.0, seed=42,
                                     random_phase=False)
    bad = golden.inject_chip_errors(iq, truth[0], [55], mode="erase")
    got = {h for _, h in jax_decode(bad)}
    assert "8d4840d6202cc371c32ce0576098" in got


def test_ecc_fault_injection_two_bits():
    frames = [(int("8d4840d6202cc371c32ce0576098", 16), 112)]
    iq, truth = encoder.make_capture(frames, snr_db=25.0, seed=43,
                                     random_phase=False)
    bad = golden.inject_chip_errors(iq, truth[0], [30, 77], mode="erase")
    got = {h for _, h in jax_decode(bad)}
    assert "8d4840d6202cc371c32ce0576098" in got


def test_confident_flip_not_corrected():
    """A confidently-wrong bit (pulse in the wrong chip) must NOT be
    corrected — the reference only flips low-confidence bits."""
    frames = [(int("8d4840d6202cc371c32ce0576098", 16), 112)]
    iq, truth = encoder.make_capture(frames, snr_db=25.0, seed=44,
                                     random_phase=False)
    bad = golden.inject_chip_errors(iq, truth[0], [40], mode="flip")
    got = {h for _, h in jax_decode(bad)}
    assert "8d4840d6202cc371c32ce0576098" not in got


def test_too_many_lowconf_bits_rejected():
    """More erased bits than max_lowconf_bits -> frame dropped, not wrongly
    'corrected' (bounded brute force, ref semantics)."""
    frames = [(int("8d4840d6202cc371c32ce0576098", 16), 112)]
    iq, truth = encoder.make_capture(frames, snr_db=25.0, seed=45,
                                     random_phase=False)
    bad = golden.inject_chip_errors(iq, truth[0], [10, 30, 50, 70, 90, 100],
                                    mode="erase")
    got = {h for _, h in jax_decode(bad)}
    assert "8d4840d6202cc371c32ce0576098" not in got


def test_df11_nonzero_interrogator_accepted():
    """A clean DF11 interrogated by II != 0 has syndrome == II (low bits):
    it must decode (regression: the acceptance mask was inverted and
    dropped every II != 0 all-call reply)."""
    from airmodes import crc as crcmod

    icao = 0x3C6614
    frame = encoder.df11_frame(icao, interrogator=5)
    assert crcmod.crc24(frame, 56) == 5
    iq, truth = encoder.make_capture([(frame, 56)], snr_db=25.0, seed=11)
    got = jax_decode(iq)
    assert any(h == truth[0].hex for _, h in got), got
    # oracle agrees
    assert sorted(golden.reference_decode(iq, CFG)) == got


def test_df11_garbage_syndrome_multiple_of_128_rejected():
    """A DF11 whose syndrome is a nonzero multiple of 128 is corrupt (no
    interrogator ID reaches the high 17 bits) and must NOT be emitted
    (the old inverted mask accepted exactly these)."""
    from airmodes import crc as crcmod

    base = encoder.df11_frame(0x3C6614, interrogator=0)
    # flip data bits until the syndrome is a nonzero multiple of 128
    frame = None
    for flip in range(6, 30):
        cand = base ^ (1 << flip) ^ (1 << (flip + 7))
        s = crcmod.crc24(cand, 56)
        if s != 0 and (s & 0x7F) == 0:
            frame = cand
            break
    if frame is None:
        import pytest
        pytest.skip("no 2-bit corruption with syndrome % 128 == 0 found")
    iq, _ = encoder.make_capture([(frame, 56)], snr_db=25.0, seed=12)
    hexes = {h for _, h in jax_decode(iq)}
    assert f"{frame:014x}" not in hexes


def test_marginal_snr_spurious_provenance():
    """VERDICT r2 #3: in the presence of real MARGINAL traffic (not pure
    noise), any spurious decode must come from the brute-force ECC
    re-targeting a damaged frame's CRC (status corrected_1/2) — never
    from a clean CRC pass (status 0), and bounded to ~1% of the injected
    count. Pure-noise minting is pinned to zero separately above; this is
    the operationally relevant mixed case (ref: lib/slicer_impl.cc:~150
    brute-force policy hazard)."""
    from airmodes.constants import STATUS_CRC_OK
    cfg = DspConfig(block_size=1 << 17, max_detections=128)
    n_inj = 0
    spurious_status = []
    for seed in (60, 61, 62):
        frames = encoder.random_df17_frames(70, seed=seed)
        iq, truth = encoder.make_capture(frames, snr_db=10.0, spacing=5500,
                                         seed=seed)
        msgs = []
        for block, start in sources.frame_blocks(iq, cfg):
            table = demod_block_jit(block, cfg)
            msgs.extend(host.table_to_messages(table, start,
                                               cfg.channel_rate))
        want = {t.hex for t in truth}
        n_inj += len(want)
        seen = set()
        for m in msgs:
            p = m.split()
            # CRC-checked families only: AP-overlaid DFs are unverifiable
            # by construction (address == syndrome)
            if p[1] not in want and p[1] not in seen \
                    and int(p[0]) in (11, 17, 18):
                seen.add(p[1])
                spurious_status.append(int(p[3]))
    clean = [s for s in spurious_status if s == STATUS_CRC_OK]
    assert clean == [], f"noise/marginal traffic minted clean-CRC " \
                        f"frames: {clean}"
    assert len(spurious_status) <= max(1, n_inj // 100), spurious_status


def test_oracle_ecc_single_bit_correction_matches_pipeline():
    """Drive the numpy ORACLE into its correction branch (r4 review: the
    np.int64 shift overflowed on every correction; the branch had zero
    coverage because erase-mode leaves the read polarity to noise)."""
    frames = [(int("8d4840d6202cc371c32ce0576098", 16), 112)]
    iq, truth = encoder.make_capture(frames, snr_db=25.0, seed=46,
                                     random_phase=False)
    bad = golden.inject_chip_errors(iq, truth[0], [55], mode="dim")
    ref = sorted(golden.reference_decode(bad, CFG))
    assert "8d4840d6202cc371c32ce0576098" in {h for _, h in ref}
    assert jax_decode(bad) == ref


def test_oracle_ecc_two_bit_correction_matches_pipeline():
    frames = [(int("8d4840d6202cc371c32ce0576098", 16), 112)]
    iq, truth = encoder.make_capture(frames, snr_db=25.0, seed=47,
                                     random_phase=False)
    bad = golden.inject_chip_errors(iq, truth[0], [30, 77], mode="dim")
    ref = sorted(golden.reference_decode(bad, CFG))
    assert "8d4840d6202cc371c32ce0576098" in {h for _, h in ref}
    assert jax_decode(bad) == ref


def test_oracle_class_flip_rejected_matches_pipeline():
    """A received frame reading DF17 whose single-bit correction flips
    the DF into the short length class: the pipeline sets STATUS_FAIL
    (r4 rule) and the oracle must drop identically instead of emitting
    a 112-bit 'DF1' (r4 review, reproduced divergence)."""
    payload = (1 << 83) | (0x123456 << 56) | 0xABCDEF   # df=1, 112-bit
    F, n = encoder.build_frame(payload, 88)
    assert n == 112
    R = F ^ (1 << 111)          # reads df=17; syndrome == rows112[0]
    iq, truth = encoder.make_capture([(R, 112)], snr_db=25.0, seed=48,
                                     random_phase=False)
    # bit 0 low-confidence but read as transmitted: the slicer sees a
    # DF17 frame whose only correction candidate crosses the class
    bad = golden.inject_chip_errors(iq, truth[0], [0], mode="dim_keep")
    assert golden.reference_decode(bad, CFG) == []
    assert jax_decode(bad) == []


def test_make_capture_rejects_near_miss_rate():
    """The rate-validity tolerance is the same ABSOLUTE 1e-3 Hz as
    DspConfig.sps: 2_000_000.5 used to pass the old relative bound and
    produce a capture no DspConfig could decode (r4 review)."""
    with pytest.raises(ValueError):
        encoder.make_capture([(0x123, 56)], rate=2_000_000.5)


def test_snr_sweep_honors_cfg_channel_rate():
    """snr_sweep used to generate at the 2 Msps default regardless of
    cfg.channel_rate, silently reporting ~0% at every SNR (r4 review)."""
    cfg4 = DspConfig(channel_rate=4e6, block_size=1 << 16,
                     max_detections=32)
    pts = golden.snr_sweep([25.0], n_msgs=4, seed=5, cfg=cfg4)
    assert pts[0].rate >= 0.75, pts


def test_oracle_matches_pipeline_at_capture_start():
    """A frame whose preamble lands in the first noise_window samples
    decodes on the device path (zero left halo deflates the noise floor)
    — the oracle must see it too, and the two must still be bit-identical
    (r5 review: the oracle's candidate loop started at w+1 and never
    examined the capture head)."""
    frames = encoder.random_df17_frames(3, seed=77)
    iq, truth = encoder.make_capture(frames, snr_db=20.0, start=40,
                                     spacing=9000, seed=77)
    ref = sorted(golden.reference_decode(iq, CFG))
    got = jax_decode(iq)
    assert got == ref
    assert any(idx == 40 for idx, _ in got), got[:3]

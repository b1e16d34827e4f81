"""Fused resample -> on-device int8 quantize -> planar Pallas demod
(VERDICT r4 #1): the resampled front-end on the PRODUCTION kernel.

Covers airmodes/resample/fused.py, io/stream.run_resampled_fused, and
dist/sharded.make_sharded_resample_demod(planar=True) on the CPU mesh
(Pallas interpret mode)."""

import os
import tempfile

import numpy as np
import jax
import pytest

import airmodes
from airmodes.dsp import host
from airmodes.dsp.pipeline import unpack_table
from airmodes.io.sources import buffered_framer
from airmodes.resample import fused
from airmodes.testing import encoder, golden


def _planar(w):
    """complex (W,) -> the fused path's planar (1, 2, W) f32 input."""
    return np.stack([w.real, w.imag]).astype(np.float32)[None]

CFG = airmodes.DspConfig(channel_rate=4e6, block_size=1 << 16,
                         max_detections=32)
P_UP, Q_DN = 2, 3          # 6 Msps raw -> 4 Msps (sps=2)


def _raw_capture(n_windows, snr_db=15.0, n_msgs=6, seed=7):
    _, rb, _, _ = fused.raw_geometry(CFG, P_UP, Q_DN)
    total = n_windows * rb
    frames = encoder.random_df17_frames(n_msgs, seed=seed)
    iq, truth = encoder.make_capture(
        frames, rate=6e6, snr_db=snr_db, spacing=total // (n_msgs + 1),
        seed=seed, total_samples=total)
    return iq, truth


def _windows(iq_raw):
    rl, rb, rr, _ = fused.raw_geometry(CFG, P_UP, Q_DN)
    fr = buffered_framer(CFG, geometry=(rl, rb, rr))
    return list(fr.push(iq_raw)) + list(fr.flush())


def test_raw_geometry_alignment():
    rl, rb, rr, off = fused.raw_geometry(CFG, P_UP, Q_DN)
    gi = 128 * Q_DN
    assert rl % gi == 0 and rb % gi == 0 and rr % gi == 0
    # the raw halos must cover the demod halos after resampling
    assert (rl - gi) * P_UP // Q_DN >= CFG.left_halo
    assert (rr - gi) * P_UP // Q_DN >= CFG.right_halo
    assert off >= 0
    with pytest.raises(ValueError):
        fused.raw_geometry(
            airmodes.DspConfig(channel_rate=4e6, block_size=(1 << 16) + 128),
            P_UP, Q_DN)


def test_fused_oracle_parity_sps2_15db():
    """The golden gate for the fused path (r4 #1 'done' criterion):
    quantization after resampling changes bit-level inputs, so the oracle
    consumes EXACTLY the int8 stream the fused demod sees — decode sets
    must match index-for-index, bit for bit, at marginal (15 dB) SNR."""
    iq_raw, truth = _raw_capture(2, snr_db=15.0, n_msgs=8, seed=11)
    gain = np.float32(120.0 / float(np.abs(iq_raw).max()))
    got = []
    ref = []
    for w, s in _windows(iq_raw):
        x = _planar(w)
        table, _ = jax.jit(
            fused.resample_demod_planar,
            static_argnames=("cfg", "p", "q", "interpret"))(
                x, gain, cfg=CFG, p=P_UP, q=Q_DN, interpret=True)
        sub = type(table)(*(np.asarray(f)[0] for f in table))
        start = s * P_UP // Q_DN
        for m in host.table_to_messages(sub, start, CFG.channel_rate):
            idx = int(float(m.split()[5]) * CFG.channel_rate + 0.5) - start
            got.append((idx, m.split()[1], start))
        y8 = np.asarray(fused.resample_quantize_planar(
            x, gain, CFG, P_UP, Q_DN)[0])[0]
        iq8 = y8[0].astype(np.float32) + 1j * y8[1].astype(np.float32)
        for idx, hexmsg in golden.reference_decode(iq8, CFG):
            own = idx - CFG.left_halo
            if 0 <= own < CFG.block_size:
                ref.append((own, hexmsg, start))
    assert sorted(got) == sorted(ref)
    # and the capture's traffic actually decodes (the gate is not vacuous)
    want = {t.hex for t in truth}
    assert len(want - {h for _, h, _ in got}) <= 1, want


def test_fused_front_matches_offline_resample():
    """Window alignment: the fused front half must equal the OFFLINE
    resample of the whole stream (to quantization of a <=1-ulp matmul
    association difference) on every owned sample."""
    from airmodes.resample.polyphase import resample

    iq_raw, _ = _raw_capture(2, snr_db=20.0, seed=13)
    gain = np.float32(100.0)
    y_off = np.asarray(resample(iq_raw.astype(np.complex64), P_UP, Q_DN))
    xi_off, xq_off = host.quantize_planar_i8_np(y_off, float(gain))
    for w, s in _windows(iq_raw):
        x = _planar(w)
        y8 = np.asarray(fused.resample_quantize_planar(
            x, gain, CFG, P_UP, Q_DN)[0])[0]
        start = s * P_UP // Q_DN        # owned channel-rate start
        own_i = y8[0, CFG.left_halo: CFG.left_halo + CFG.block_size]
        own_q = y8[1, CFG.left_halo: CFG.left_halo + CFG.block_size]
        ref_i = xi_off[start: start + CFG.block_size]
        ref_q = xq_off[start: start + CFG.block_size]
        n = len(ref_i)
        di = np.abs(own_i[:n].astype(np.int32) - ref_i.astype(np.int32))
        dq = np.abs(own_q[:n].astype(np.int32) - ref_q.astype(np.int32))
        assert di.max(initial=0) <= 1 and dq.max(initial=0) <= 1
        assert (di > 0).mean() < 1e-3 and (dq > 0).mean() < 1e-3


def test_device_agc_and_identity_passthrough():
    """gain=None runs per-channel AGC on the RESAMPLED waveform (peak ->
    exactly 120, so quantize can never clip resample overshoot — r5
    review), and p=q=1 passes the stream through instead of applying the
    half-sample group interpolator."""
    iq_raw, _ = _raw_capture(1, snr_db=20.0, seed=37)
    w, _ = _windows(iq_raw)[0]
    x = _planar(w)
    y8, gains = fused.resample_quantize_planar(x, None, CFG, P_UP, Q_DN)
    y8, gains = np.asarray(y8), np.asarray(gains)
    assert gains.shape == (1,) and gains[0] > 0
    assert 115 <= np.abs(y8).max() <= 120      # AGC: peak == round(120)
    # p=q=1 identity: the window slice must equal the input quantized
    cfg1 = airmodes.DspConfig(channel_rate=2e6, block_size=1 << 16,
                              max_detections=16)
    rl, rb, rr, _ = fused.raw_geometry(cfg1, 1, 1)
    rng = np.random.default_rng(5)
    w = (rng.standard_normal((rl + rb + rr, 2)) * 0.1).astype(np.float32)
    y1, g1 = fused.resample_quantize_planar(
        np.ascontiguousarray(w.T)[None], np.float32(100.0), cfg1, 1, 1)
    y1 = np.asarray(y1)[0]
    win = cfg1.left_halo + cfg1.block_size + cfg1.right_halo
    lo = rl - cfg1.left_halo
    ref = host.quantize_i8_np(w[lo: lo + win], 100.0)
    assert np.array_equal(y1[0], ref[:, 0]) and np.array_equal(y1[1],
                                                               ref[:, 1])


def test_resampler_group_delay_unbiased():
    """The polyphase prototype's group delay must cancel the anchor
    advance exactly (r5 review: the (N-1)/2 prototype left every
    resampled stream half an upsampled tick early — a constant
    1/(2*p*rate_in) timestamp bias, ~12 m of TDOA for resampled mlat
    stations). Metric: p/q-then-q/p round trip of band-limited noise,
    delay from the cross-spectrum phase slope; must be exactly zero."""
    from airmodes.resample.polyphase import resample
    rng = np.random.default_rng(0)
    n = 1 << 14
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    X = np.fft.fft(x)
    X[n // 8: -n // 8] = 0                      # band-limit to 1/4 Nyq
    x = np.fft.ifft(X).astype(np.complex64)
    for p, q in ((2, 3), (3, 2), (1, 4), (5, 3)):
        y = np.asarray(resample(np.asarray(resample(x, p, q)), q, p))
        m = min(len(x), len(y))
        a, b = x[256: m - 256], y[256: m - 256]
        S = np.fft.fft(b) * np.conj(np.fft.fft(a))
        k = np.fft.fftfreq(len(S))
        band = np.abs(k) < 0.1
        lag = -np.polyfit(k[band], np.angle(S[band]), 1)[0] / (2 * np.pi)
        assert abs(lag) < 0.01, (p, q, lag)


def test_run_resampled_fused_runner():
    """The single-chip CLI runner end to end: temp capture file -> raw
    framing -> fused batched steps -> wire messages (AGC gains, stats)."""
    from airmodes.io.stream import run_resampled_fused

    iq_raw, truth = _raw_capture(3, snr_db=18.0, n_msgs=9, seed=17)
    with tempfile.NamedTemporaryFile(suffix=".c64", delete=False) as f:
        path = f.name
        iq_raw.astype(np.complex64).tofile(f)
    try:
        stats = host.BlockStats()
        msgs = []
        for block_msgs in run_resampled_fused(
                path, CFG, dtype="complex64", rate_in=6e6, batch=2,
                stats=stats):
            msgs.extend(block_msgs)
        got = {m.split()[1] for m in msgs}
        want = {t.hex for t in truth}
        assert len(want - got) <= 1, want - got
        assert stats.emitted == len(msgs) and stats.crc_ok > 0
        # timestamps monotonic across block boundaries
        ts = [float(m.split()[5]) for m in msgs]
        assert ts == sorted(ts)
    finally:
        os.unlink(path)


def test_run_resampled_fused_start_sample():
    """Resume: start_sample (channel-rate units) seeks the raw capture and
    keeps the global counter continuous."""
    from airmodes.io.stream import run_resampled_fused

    iq_raw, truth = _raw_capture(2, snr_db=20.0, n_msgs=6, seed=19)
    with tempfile.NamedTemporaryFile(suffix=".c64", delete=False) as f:
        path = f.name
        iq_raw.astype(np.complex64).tofile(f)
    try:
        start = CFG.block_size
        msgs = []
        for bm in run_resampled_fused(path, CFG, dtype="complex64",
                                      rate_in=6e6, start_sample=start):
            msgs.extend(bm)
        # every resumed message timestamps at/after the resume point and
        # matches a second-half truth frame
        late = {t.hex for t in truth
                if t.sample_index * P_UP // Q_DN >= start + CFG.left_halo}
        got = {m.split()[1] for m in msgs}
        assert late - got == set()
        for m in msgs:
            assert float(m.split()[5]) * CFG.channel_rate >= start
    finally:
        os.unlink(path)


def test_run_resampled_fused_channels():
    """Multi-channel fused runner: two captures of different lengths, one
    batched device call per step; the shorter channel ends first and
    yields None while the longer finishes (run_channels contract)."""
    from airmodes.io.stream import run_resampled_fused_channels

    paths = []
    truths = []
    try:
        for c, n_win in enumerate((1, 2)):
            iq_raw, truth = _raw_capture(n_win, snr_db=20.0,
                                         n_msgs=3 * n_win, seed=23 + c)
            f = tempfile.NamedTemporaryFile(suffix=".c64", delete=False)
            iq_raw.astype(np.complex64).tofile(f)
            f.close()
            paths.append(f.name)
            truths.append({t.hex for t in truth})
        stats = host.BlockStats()
        steps = list(run_resampled_fused_channels(
            paths, CFG, dtype="complex64", rate_in=6e6, stats=stats))
        assert len(steps) == 2
        got = [set(), set()]
        for step in steps:
            for c, msgs in enumerate(step):
                if msgs is not None:
                    got[c] |= {m.split()[1] for m in msgs}
        assert steps[1][0] is None          # short channel ended
        assert steps[1][1] is not None
        for c in range(2):
            assert len(truths[c] - got[c]) <= 1, truths[c] - got[c]
    finally:
        for p in paths:
            os.unlink(p)


def test_sharded_resample_planar_mesh():
    """make_sharded_resample_demod(planar=True) on a 2x4 CPU mesh: int8
    ICI demod halos + on-device quantize, decode parity with truth and
    with the f32 XLA path."""
    from airmodes.dist import sharded

    cfg = airmodes.DspConfig(channel_rate=4e6, block_size=1 << 14,
                             max_detections=16)
    n_time = 4
    raw_total = n_time * cfg.block_size * Q_DN // P_UP
    frames = encoder.random_df17_frames(8, seed=9)
    iq_raw, truth = encoder.make_capture(
        frames, rate=6e6, snr_db=20.0, spacing=raw_total // 9, seed=9,
        total_samples=raw_total)
    want = {t.hex for t in truth}
    mesh = sharded.make_mesh(n_channel=2, n_time=n_time)
    x = np.tile(_planar(iq_raw), (2, 1, 1))
    gain = np.float32(120.0 / float(np.abs(iq_raw).max()))

    fn = sharded.make_sharded_resample_demod(mesh, cfg, P_UP, Q_DN,
                                             planar=True, interpret=True)
    table = jax.block_until_ready(
        fn(sharded.shard_input_resample_planar(x, mesh), gain))

    def decode(tbl):
        got = set()
        for c in range(2):
            for t in range(n_time):
                sub = type(tbl)(*(np.asarray(f)[c, t] for f in tbl))
                for m in host.table_to_messages(sub, 0, cfg.channel_rate):
                    got.add(m.split()[1])
        return got

    got = decode(table)
    assert want <= got, want - got

    fn32 = sharded.make_sharded_resample_demod(mesh, cfg, P_UP, Q_DN,
                                               planar=False)
    x32 = np.tile(np.stack([iq_raw.real, iq_raw.imag],
                           -1).astype(np.float32)[None], (2, 1, 1))
    got32 = decode(jax.block_until_ready(
        fn32(sharded.shard_input(x32, mesh))))
    assert want <= got32


def test_sharded_shard_size_mismatch_raises():
    """r5 review (probe-confirmed): mis-sized time shards were silent
    corruption — undersized planar shards zero-padded and decoded the
    right halo as owned (duplicate frames, wrong indices); oversized f32
    shards truncated (traffic vanished). Now a trace-time ValueError."""
    from airmodes.dist import sharded

    cfg = airmodes.DspConfig(block_size=1 << 14, max_detections=16)
    mesh = sharded.make_mesh(n_channel=1, n_time=2)
    # f32 path: per-shard 2x the block
    fn = sharded.make_sharded_demod(mesh, cfg)
    big = np.zeros((1, 2 * 2 * cfg.block_size, 2), np.float32)
    with pytest.raises(ValueError, match="shard owns"):
        fn(sharded.shard_input(big, mesh))
    # planar path: per-shard half the block
    fnp = sharded.make_sharded_demod_planar(
        mesh, airmodes.DspConfig(block_size=16384, max_detections=16),
        interpret=True)
    small = np.zeros((1, 2 * 8192), np.int8)
    with pytest.raises(ValueError, match="shard owns"):
        fnp(*sharded.shard_input_planar(small, small, mesh))


def test_sharded_resample_per_channel_gain_on_sharded_mesh():
    """r5 review (probe-confirmed): a (C,) per-channel gain vector on a
    channel-SHARDED mesh failed at trace time (the replicated vector was
    indexed with the local channel count); each shard now slices its own
    channels."""
    from airmodes.dist import sharded

    cfg = airmodes.DspConfig(channel_rate=4e6, block_size=1 << 14,
                             max_detections=16)
    mesh = sharded.make_mesh(n_channel=2, n_time=2)
    raw_total = 2 * cfg.block_size * Q_DN // P_UP
    frames = encoder.random_df17_frames(4, seed=43)
    iq_raw, truth = encoder.make_capture(
        frames, rate=6e6, snr_db=20.0, spacing=raw_total // 5, seed=43,
        total_samples=raw_total)
    x = np.tile(_planar(iq_raw), (2, 1, 1))
    gains = np.float32([120.0 / float(np.abs(iq_raw).max())] * 2)
    fn = sharded.make_sharded_resample_demod(mesh, cfg, P_UP, Q_DN,
                                             planar=True, interpret=True)
    table = jax.block_until_ready(
        fn(sharded.shard_input_resample_planar(x, mesh), gains))
    got = set()
    for c in range(2):
        for t in range(2):
            sub = type(table)(*(np.asarray(f)[c, t] for f in table))
            for m in host.table_to_messages(sub, 0, cfg.channel_rate):
                got.add(m.split()[1])
    assert {t.hex for t in truth} <= got


def test_fused_nonfinite_raw_samples_do_not_silence_block():
    """r5 review: the device AGC peak scan must be FINITE-ONLY (like
    _dev_layout's host scan) and the device quantize_i8 must map NaN->0
    like quantize_i8_np — f32->int8 convert of NaN is XLA-undefined.
    One corrupt raw sample otherwise drove the channel's AGC gain to
    NaN and silenced the WHOLE block; frames away from the corrupt
    group window must keep decoding."""
    iq_raw, truth = _raw_capture(1, snr_db=20.0, n_msgs=4, seed=21)
    guard = np.zeros(len(iq_raw), bool)
    for t in truth:
        guard[max(0, t.sample_index - 3000): t.sample_index + 4000] = True
    free = np.flatnonzero(~guard)
    iq_bad = iq_raw.copy()
    iq_bad[free[100]] = complex(np.nan, np.nan)
    iq_bad[free[len(free) // 2]] = complex(np.inf, 0.0)
    got = set()
    for w, s in _windows(iq_bad):
        table, gains = jax.jit(
            fused.resample_demod_planar,
            static_argnames=("cfg", "p", "q", "interpret"))(
                _planar(w), None, cfg=CFG, p=P_UP, q=Q_DN, interpret=True)
        assert np.isfinite(np.asarray(gains)).all()
        sub = type(table)(*(np.asarray(f)[0] for f in table))
        start = s * P_UP // Q_DN
        got |= {m.split()[1] for m in host.table_to_messages(
            sub, start, CFG.channel_rate)}
    want = {t.hex for t in truth}
    assert len(want - got) <= 1, want - got
    # device quantize matches the host bit contract on non-finite input
    lace = np.array([np.nan, np.inf, -np.inf, 0.4, -127.6, 200.0, -0.5],
                    np.float32)
    dev = np.asarray(fused.quantize_i8(lace, 1.0))
    assert np.array_equal(dev, host.quantize_i8_np(lace, 1.0))


def test_run_resampled_fused_snapped_resume_with_epoch():
    """r5 review: the snapped-resume filter recovered sample indices as
    timestamp * rate from the EPOCH-ANCHORED float seconds field — any
    nonzero epoch (the CLI always passes one) made every message pass,
    so pre-request messages leaked on odd resume points. The filter now
    recovers indices from the int64-ns wire field, epoch-relative."""
    from airmodes.io.stream import run_resampled_fused

    iq_raw, truth = _raw_capture(2, snr_db=20.0, n_msgs=8, seed=19)
    with tempfile.NamedTemporaryFile(suffix=".c64", delete=False) as f:
        path = f.name
        iq_raw.astype(np.complex64).tofile(f)
    epoch = 1.7e9
    try:
        # full pass: learn each frame's detected channel-rate index
        full = {}
        for bm in run_resampled_fused(path, CFG, dtype="complex64",
                                      rate_in=6e6, epoch=epoch):
            for m in bm:
                ns = int(m.split()[6]) - int(round(epoch * 1e9))
                full[m.split()[1]] = (ns * int(CFG.channel_rate)
                                      + 500_000_000) // 1_000_000_000
        # resume ONE sample past an even-indexed frame: start is odd, so
        # it snaps down and the first window re-detects that frame at a
        # sample BELOW the requested start — it must be filtered out
        cand = sorted((si, h) for h, si in full.items()
                      if si % P_UP == 0 and si > 0)
        assert cand, "need an even-indexed frame for the snap case"
        si, boundary_hex = cand[len(cand) // 2]
        req = si + 1
        msgs = []
        for bm in run_resampled_fused(path, CFG, dtype="complex64",
                                      rate_in=6e6, start_sample=req,
                                      epoch=epoch):
            msgs.extend(bm)
        got = {}
        for m in msgs:
            ns = int(m.split()[6]) - int(round(epoch * 1e9))
            got[m.split()[1]] = (ns * int(CFG.channel_rate)
                                 + 500_000_000) // 1_000_000_000
        assert all(s >= req for s in got.values()), got
        assert boundary_hex not in got
        late = {h for h, s in full.items() if s >= req}
        assert late - set(got) == set(), late - set(got)
    finally:
        os.unlink(path)

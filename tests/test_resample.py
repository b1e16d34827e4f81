"""Polyphase resampler tests: spectral fidelity + end-to-end demod at SDR rates."""

import numpy as np
import pytest

from airmodes.config import DspConfig
from airmodes.dsp import host
from airmodes.dsp.pipeline import demod_block_jit
from airmodes.io import sources
from airmodes.resample import polyphase
from airmodes.testing import encoder


def test_rational_rate():
    assert polyphase.rational_rate(8e6, 2e6) == (1, 4)
    assert polyphase.rational_rate(10e6, 2e6) == (1, 5)
    assert polyphase.rational_rate(2.4e6, 2e6) == (5, 6)
    assert polyphase.rational_rate(3e6, 2e6) == (2, 3)
    with pytest.raises(ValueError):
        polyphase.rational_rate(np.pi * 1e6, 2e6)


def test_tone_preserved():
    """A tone well inside the output passband must survive with correct
    frequency and near-unit amplitude."""
    fs_in, fs_out = 8e6, 2e6
    t = np.arange(1 << 15) / fs_in
    f0 = 300e3
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    y = np.asarray(polyphase.resample_to_rate(x, fs_in, fs_out))
    y = y[200:-200]  # trim filter edges
    spec = np.fft.fft(y * np.hanning(len(y)))
    freqs = np.fft.fftfreq(len(y), 1 / fs_out)
    peak = freqs[np.argmax(np.abs(spec))]
    assert abs(peak - f0) < 2e3
    assert np.median(np.abs(y)) > 0.9


def test_against_scipy_resample_poly():
    """On a band-limited signal (inside both passbands) our polyphase output
    must track scipy's up to a small integer lag (different prototype
    filters differ only near Nyquist)."""
    from scipy.signal import resample_poly
    rng = np.random.default_rng(0)
    x = rng.standard_normal(4096)
    # band-limit to 0.3 Nyquist so both anti-alias filters are transparent
    spec = np.fft.rfft(x)
    spec[int(0.3 * len(spec)):] = 0
    x = np.fft.irfft(spec).astype(np.float32)
    p, q = 5, 6
    ours = np.asarray(polyphase.resample(x, p, q))
    theirs = resample_poly(x, p, q, window=("kaiser", 8.6))
    n = min(len(ours), len(theirs)) - 64

    def up8(v):  # 8x FFT interpolation for sub-sample alignment
        spec = np.fft.rfft(v)
        return np.fft.irfft(spec, 8 * len(v)) * 8

    a, b = up8(ours[32:n]), up8(theirs[32:n])
    best = max(
        np.corrcoef(a[64 + lag: -64 + lag], b[64: -64])[0, 1]
        for lag in range(-24, 25))
    assert best > 0.999, f"correlation {best}"


def run_resampled_demod(iq, fs_in):
    iq2 = np.asarray(polyphase.resample_to_rate(iq, fs_in, 2e6))
    cfg = DspConfig(block_size=1 << 16, max_detections=64)
    msgs = []
    for block, start in sources.frame_blocks(iq2, cfg):
        table = demod_block_jit(block, cfg)
        msgs.extend(host.table_to_messages(table, start, 2e6))
    return {m.split()[1] for m in msgs}


@pytest.mark.parametrize("fs_in,start", [(4e6, 1024), (8e6, 1026),
                                         (10e6, 1024)])
def test_demod_after_resample(fs_in, start):
    """Capture at an SDR rate -> polyphase to 2 Msps -> full demod chain.

    2 Msps output is 1 sample/chip: which sub-chip phase the decimator
    samples decides decodability (the r4 physics cliff — resample to
    sps >= 2 in production). Since the r5 group-delay fix the resampler
    is phase-EXACT (no half-tick bias), so each rate's frame start is
    pinned to a decodable phase here; the complementary phase losing the
    frames is expected physics, not a resampler bug."""
    frames = encoder.random_df17_frames(10, seed=31)
    iq, truth = encoder.make_capture(
        frames, rate=fs_in, snr_db=25.0, start=start,
        spacing=int(3000 * fs_in / 2e6), seed=31)
    got = run_resampled_demod(iq, fs_in)
    want = {t.hex for t in truth}
    assert want <= got, f"missing {len(want - got)}/{len(want)} at {fs_in}"


def test_demod_fractional_rate_2p4():
    """rtl-sdr style 2.4 Msps -> 5/6 polyphase -> 2 Msps demod.

    The encoder only emits integer samples-per-chip, so build the 2.4 Msps
    stream by encoding at 12 Msps and taking every 5th sample."""
    frames = encoder.random_df17_frames(8, seed=32)
    iq12, truth = encoder.make_capture(
        frames, rate=12e6, snr_db=25.0, spacing=18000, seed=32)
    iq24 = iq12[::5].copy()
    got = run_resampled_demod(iq24, 2.4e6)
    want = {t.hex for t in truth}
    assert want <= got, f"missing {len(want - got)}/{len(want)}"


@pytest.mark.parametrize("pq", [(1, 4), (5, 6), (2, 3), (4, 1)])
def test_streaming_matches_offline(pq):
    """Chunked streaming output must equal the offline resample (after the
    fixed group-delay offset), regardless of chunk boundaries."""
    p, q = pq
    rng = np.random.default_rng(5)
    n = 40 * 1024
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    offline = np.asarray(polyphase.resample(x, p, q))
    rs = polyphase.streaming_resampler(p, q, stride_blocks=1024)
    outs = []
    pos = 0
    for size in (777, 5000, 12345, 4096, n):  # ragged chunks
        chunk = x[pos: pos + size]
        pos += len(chunk)
        outs.append(rs.push(chunk))
        if pos >= n:
            break
    outs.append(rs.flush())
    streamed = np.concatenate(outs)
    # flush trims to exactly floor(N*p/q): streaming output matches the
    # offline resample sample-for-sample, length included. The streaming
    # path runs the SAME group matmuls against the same globally-aligned
    # input groups, but XLA reassociates the contraction differently for
    # different batch shapes -> 1-ULP tolerance.
    assert len(streamed) == len(offline)
    np.testing.assert_allclose(streamed, offline, rtol=3e-6, atol=3e-6)
    # flush ended the stream: a second flush emits nothing
    assert len(rs.flush()) == 0


def test_streaming_resampler_rejects_huge_ratio():
    with pytest.raises(ValueError, match="MB"):
        polyphase.streaming_resampler(100, 61)


def test_resample_empty_output():
    # slice-form path with input shorter than one output sample
    y = np.asarray(polyphase.resample(np.zeros(3, np.float32), 17, 19))
    assert y.shape[0] == 2  # floor(3*17/19)
    y2 = np.asarray(polyphase._resample_cols(
        np.zeros((1, 1), np.float32), 1, 3, 12))
    assert y2.shape[0] == 0


def test_antialias_attenuation_decimation_ratios():
    """r4 review (measured): p-scaled prototype length left only 12 taps
    against a 1/q cutoff for pure decimation — alias bands at -5.5 dB
    folded out-of-band noise into the channel. The bank now scales with
    max(p, q); worst alias gain must stay below -50 dB on the common
    SDR ratios."""
    import numpy as np
    from airmodes.resample.polyphase import _polyphase_bank

    for p, q in [(1, 3), (1, 4), (1, 5), (2, 3), (5, 6)]:
        proto = _polyphase_bank(p, q, 12).T.flatten()
        H = np.abs(np.fft.rfft(proto, 16384))
        H /= H[0]
        w = np.fft.rfftfreq(16384)
        cut = 1.0 / max(p, q) / 2
        worst = 20 * np.log10(H[w > 1.5 * cut].max() + 1e-12)
        assert worst < -50.0, f"p={p} q={q}: {worst:.1f} dB"


def test_streaming_resampler_tiny_chunks_match_bulk():
    """push() in UDP-sized chunks must emit exactly the same stream as
    one bulk push (pins the r4 list-of-parts pending buffer rewrite)."""
    import numpy as np
    from airmodes.resample.polyphase import streaming_resampler

    rng = np.random.default_rng(11)
    n = 200_000
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    a = streaming_resampler(2, 3)
    bulk = np.concatenate([a.push(x), a.flush()])
    b = streaming_resampler(2, 3)
    outs = []
    i = 0
    while i < n:     # ragged small chunks incl. empties
        step = [0, 1, 977, 1024, 4096][i % 5]
        outs.append(b.push(x[i: i + step]))
        i += step if step else 1
        if step == 0:
            outs.append(b.push(x[i - 1: i]))
    outs.append(b.flush())
    tiny = np.concatenate(outs)
    np.testing.assert_array_equal(bulk, tiny)


def test_resample_rejects_planar_2d_layout():
    """A (2, N) planar array used to crash deep inside the group matmul
    with an unrelated unpack error; now a clear shape error at the
    misuse site (r4 review)."""
    import numpy as np
    import pytest
    from airmodes.resample.polyphase import resample

    with pytest.raises(ValueError, match="planar"):
        resample(np.zeros((2, 1024), np.float32), 2, 3)
    with pytest.raises(ValueError, match="1-D"):
        resample(np.zeros((4, 4, 4), np.float32), 2, 3)

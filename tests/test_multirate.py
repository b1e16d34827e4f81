"""Native multi-rate demod: the pipeline at 4/10 Msps channel rates
(integer samples-per-chip, no resampling) — ref: modes_rx -r option."""

import numpy as np
import pytest

from airmodes.config import DspConfig
from airmodes.dsp import host
from airmodes.dsp.pipeline import demod_block_jit, iq_to_device_layout
from airmodes.io import sources
from airmodes.testing import encoder, golden


@pytest.mark.parametrize("rate", [4e6, 10e6])
def test_native_rate_demod(rate):
    cfg = DspConfig(channel_rate=rate, block_size=1 << 17, max_detections=64)
    assert cfg.sps == int(rate // 2e6)
    frames = encoder.random_df17_frames(12, seed=int(rate) % 97)
    iq, truth = encoder.make_capture(
        frames, rate=rate, snr_db=20.0, spacing=int(4000 * cfg.sps),
        seed=int(rate) % 97)
    msgs = []
    for block, start in sources.frame_blocks(iq, cfg):
        t = demod_block_jit(block, cfg)
        msgs.extend(host.table_to_messages(t, start, rate))
    got = {m.split()[1] for m in msgs}
    want = {t.hex for t in truth}
    assert want <= got, f"missing {len(want-got)}/{len(want)} at {rate}"
    # timestamps still in seconds of the native rate
    ts = sorted(float(m.split()[5]) for m in msgs)
    assert ts[0] * rate >= 256


def test_native_rate_matches_oracle():
    cfg = DspConfig(channel_rate=4e6, block_size=1 << 16, max_detections=64)
    frames = encoder.random_df17_frames(10, seed=23)
    iq, _ = encoder.make_capture(frames, rate=4e6, snr_db=10.0,
                                 spacing=8000, seed=23)
    ref = sorted(golden.reference_decode(iq, cfg))
    got = []
    for block, start in sources.frame_blocks(iq, cfg):
        t = demod_block_jit(block, cfg)
        for m in host.table_to_messages(t, start, cfg.channel_rate):
            got.append((int(float(m.split()[5]) * cfg.channel_rate + 0.5),
                        m.split()[1]))
    assert sorted(got) == ref


def test_pallas_kernel_sps2():
    from airmodes.dsp import pipeline as P
    from airmodes.kernels.preamble_pallas import preamble_detect_pallas
    import jax
    cfg = DspConfig(channel_rate=4e6, block_size=1 << 15, max_detections=32)
    frames = encoder.random_df17_frames(6, seed=24)
    iq, _ = encoder.make_capture(frames, rate=4e6, snr_db=20.0, spacing=6000,
                                 seed=24, total_samples=cfg.block_size)
    block, _ = next(sources.frame_blocks(iq, cfg))
    x = P.iq_to_device_layout(block)
    mp, rp = preamble_detect_pallas(x, cfg, tile=4096, interpret=True)
    mag2 = P.magnitude_squared(jax.numpy.asarray(x))
    noise = P.noise_floor(mag2, cfg.noise_window)
    mj, rj = P.preamble_detect(mag2, noise, cfg, cfg.left_halo, cfg.block_size)
    np.testing.assert_array_equal(np.asarray(mp).astype(bool), np.asarray(mj))

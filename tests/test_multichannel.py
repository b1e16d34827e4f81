"""Multi-channel operation: C captures batched down one device call per
step (BASELINE config 4), per-channel message sets identical to
single-channel runs."""

import numpy as np

from airmodes.config import DspConfig
from airmodes.io.sources import frame_blocks
from airmodes.io.stream import run_channels, run_pipelined
from airmodes.testing import encoder

CFG = DspConfig(block_size=1 << 16, max_detections=64)


def _capture(seed, total):
    frames = encoder.random_df17_frames(8, seed=seed)
    iq, truth = encoder.make_capture(frames, snr_db=22.0, spacing=6000,
                                     seed=seed, total_samples=total)
    return iq, truth


def _single(iq):
    return [m for msgs in run_pipelined(frame_blocks(iq, CFG), CFG)
            for m in msgs]


def test_run_channels_matches_single_channel_runs():
    """Two DIFFERENT captures decoded concurrently produce exactly the
    wire messages of their single-channel runs — including when one
    channel ends early (shorter capture rides as silence)."""
    iq_a, truth_a = _capture(95, 3 * CFG.block_size)
    iq_b, truth_b = _capture(96, 2 * CFG.block_size + 777)  # shorter

    per_channel = [[], []]
    for step in run_channels([frame_blocks(iq_a, CFG),
                              frame_blocks(iq_b, CFG)], CFG):
        assert len(step) == 2
        for c in range(2):
            per_channel[c].extend(step[c] or [])

    assert per_channel[0] == _single(iq_a)
    assert per_channel[1] == _single(iq_b)
    got_a = {m.split()[1] for m in per_channel[0]}
    got_b = {m.split()[1] for m in per_channel[1]}
    assert {t.hex for t in truth_a} <= got_a
    assert {t.hex for t in truth_b} <= got_b


def test_cli_multichannel_two_files(tmp_path, capsys):
    """`modes_rx -s a.c64 -s b.c64` decodes both captures in one process."""
    from airmodes.apps.modes_rx import main
    iq_a, truth_a = _capture(97, 1 << 17)
    iq_b, truth_b = _capture(98, 1 << 17)
    pa, pb = str(tmp_path / "a.c64"), str(tmp_path / "b.c64")
    iq_a.tofile(pa)
    iq_b.tofile(pb)
    rc = main(["-s", pa, "-s", pb, "--block-size", "65536",
               "--stats-interval", "0"])
    assert rc == 0
    out = capsys.readouterr().out
    import re
    icaos = set(re.findall(r"from ([0-9a-f]{6})", out))
    want = {f"{(t.frame >> 80) & 0xFFFFFF:06x}"
            for t in list(truth_a) + list(truth_b)}
    assert want <= icaos, want - icaos


def test_multichannel_resampled_files(tmp_path):
    """Two 4 Msps captures resample per channel and decode in one batched
    call per step; each channel's topic carries its own messages."""
    from airmodes.apps.modes_rx import main
    from airmodes.testing import encoder

    paths, wants = [], []
    for ch, seed in enumerate((91, 92)):
        frames = encoder.random_df17_frames(5, seed=seed)
        iq, truth = encoder.make_capture(frames, rate=4e6, snr_db=25.0,
                                         spacing=16000, seed=seed)
        p = str(tmp_path / f"cap{ch}.c64")
        iq.tofile(p)
        paths.append(p)
        wants.append({t.hex for t in truth})

    import airmodes.io.relay as relay_mod
    got = [set(), set()]
    real_pubsub = relay_mod.local_pubsub

    class spy_bus(real_pubsub):
        def publish(self, topic, msg):
            for c in (0, 1):
                if topic == f"dl_data/ch{c}":
                    got[c].add(msg.split()[1])
            super().publish(topic, msg)

    relay_mod.local_pubsub = spy_bus
    try:
        rc = main(["-s", paths[0], "-s", paths[1], "-r", "4e6",
                   "--block-size", "65536", "-n", "--stats-interval", "0"])
    finally:
        relay_mod.local_pubsub = real_pubsub
    assert rc == 0
    assert wants[0] <= got[0] and wants[1] <= got[1]
    # channel isolation: ch0's frames don't appear on ch1's topic
    assert not (wants[0] & got[1]) and not (wants[1] & got[0])


def test_run_channels_keeps_int8_after_channel_ends():
    """r3 review: the ended-channel silence pad must match the live
    blocks' dtype — a complex64 zero upcast the whole np.stack to
    float32, silently dropping the planar int8 kernel on TPU and
    breaking the 1/127 dBFS rescale."""
    from airmodes.dsp.pipeline import demod_block, pack_table
    import functools
    import jax

    seen_dtypes = []

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def _steP(xb, cfg):
        return jax.vmap(lambda x: pack_table(demod_block(x, cfg)))(xb)

    def spy_step(xb, cfg):
        seen_dtypes.append(xb.dtype)
        return _steP(xb.astype(np.float32) / (127.0 if xb.dtype == np.int8
                                              else 1.0), cfg)

    def i8_blocks(n):
        T = CFG.left_halo + CFG.block_size + CFG.right_halo
        rng = np.random.default_rng(n)
        for k in range(n):
            yield (rng.integers(-20, 20, size=(T, 2)).astype(np.int8),
                   k * CFG.block_size)

    steps = list(run_channels([i8_blocks(3), i8_blocks(1)], CFG,
                              step=spy_step))
    assert len(steps) == 3
    assert steps[1][1] is None and steps[2][1] is None   # ch1 ended
    assert all(d == np.int8 for d in seen_dtypes), seen_dtypes


def test_run_channels_mixed_dtypes_rejected():
    """np.stack would silently upcast mixed dtypes (breaking full-scale
    accounting + dropping the planar kernel) — fail loudly (r4 review)."""
    import numpy as np
    import pytest
    from airmodes.config import DspConfig
    from airmodes.io.stream import run_channels
    cfg = DspConfig(block_size=1 << 12, max_detections=8, noise_window=64)
    T = cfg.left_halo + cfg.block_size + cfg.right_halo

    def chan(dtype):
        yield np.zeros((T, 2), dtype), 0

    with pytest.raises(ValueError, match="mixed"):
        list(run_channels([chan(np.int8), chan(np.float32)], cfg))


def test_supported_2d_tile_matches_kernel_constraints():
    from airmodes.config import DspConfig
    from airmodes.kernels.preamble_pallas import supported_2d_tile
    assert supported_2d_tile(
        DspConfig(block_size=1 << 20)) == 16384
    assert supported_2d_tile(
        DspConfig(block_size=8192)) == 8192        # r4 review: the old
    #   fixed-16384 f32 branch crashed exactly here
    assert supported_2d_tile(DspConfig(block_size=20480)) == 4096
    assert supported_2d_tile(
        DspConfig(block_size=1 << 20, noise_window=64)) is None
    assert supported_2d_tile(
        DspConfig(block_size=1 << 20, channel_rate=20e6)) is None  # sps 10

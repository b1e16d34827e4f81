"""PodPipeline streaming driver on the virtual CPU mesh."""

import numpy as np
import pytest

from airmodes.config import DspConfig
from airmodes.dist.multihost import PodPipeline
from airmodes.testing import encoder

CFG = DspConfig(block_size=1 << 14, max_detections=32)


def test_pod_pipeline_stream_decodes():
    pipe = PodPipeline(CFG, n_channel=2, n_time=4)
    assert pipe.samples_per_step == 4 * CFG.block_size
    frames = encoder.random_df17_frames(10, seed=80)
    total = pipe.samples_per_step
    iq, truth = encoder.make_capture(frames, snr_db=20.0,
                                     spacing=total // 12, seed=80,
                                     total_samples=total + 5000)
    # two channels carry different halves of the traffic
    ch0 = iq.copy()
    ch1 = np.roll(iq, 1111)
    chunks = [np.stack([ch0[: total // 2], ch1[: total // 2]]),
              np.stack([ch0[total // 2:], ch1[total // 2:]])]
    msgs = []
    for out in pipe.run_stream(chunks):
        msgs.extend(out)
    got = {m.split()[1] for m in msgs}
    want = {t.hex for t in truth}
    assert want <= got
    # timestamps are sorted within each step batch
    assert msgs == sorted(msgs, key=lambda m: float(m.split()[5]))


def test_pod_pipeline_step_offsets():
    """Messages in later steps carry correctly offset timestamps."""
    pipe = PodPipeline(CFG, n_channel=1, n_time=8)
    frame = int("8d4840d6202cc371c32ce0576098", 16)
    total = pipe.samples_per_step
    pos = total + 3 * CFG.block_size + 100  # inside the SECOND step
    iq, truth = encoder.make_capture([(frame, 112)], snr_db=25.0, start=pos,
                                     seed=81, total_samples=2 * total)
    msgs = []
    for out in pipe.run_stream([iq[None, :]]):
        msgs.extend(out)
    matching = [m for m in msgs if m.split()[1] == "8d4840d6202cc371c32ce0576098"]
    assert len(matching) == 1
    ts = float(matching[0].split()[5])
    assert abs(ts - pos / CFG.channel_rate) < 1e-6


def test_step_boundary_frame_decoded(monkeypatch):
    """A frame straddling two consecutive STEPS of run_stream must decode
    exactly once (regression: each step's outer halos were zeros, so the
    frame body read silence and CRC-failed)."""
    from airmodes.dist.multihost import PodPipeline

    cfg = DspConfig(block_size=1 << 14, max_detections=16)
    pipe = PodPipeline(cfg, n_channel=1, n_time=2)
    S = pipe.samples_per_step
    frame = int("8d4840d6202cc371c32ce0576098", 16)
    # preamble starts 100 samples before the step boundary: body crosses it
    iq, truth = encoder.make_capture(
        [(frame, 112)], snr_db=25.0, start=S - 100, seed=8,
        total_samples=2 * S)
    chunks = [iq[None, :S // 2], iq[None, S // 2: S + 777],
              iq[None, S + 777:]]
    msgs = [m for out in pipe.run_stream(chunks) for m in out]
    hexes = [m.split()[1] for m in msgs]
    assert hexes.count(truth[0].hex) == 1, hexes

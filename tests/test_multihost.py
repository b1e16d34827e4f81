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


def test_step_boundary_frame_decoded_planar():
    """Same step-straddle guarantee on the PLANAR int8 streaming path —
    the production TPU driver (interpret-mode Pallas on the CPU mesh)."""
    from airmodes.dist.multihost import PodPipeline

    cfg = DspConfig(block_size=1 << 14, max_detections=16)
    pipe = PodPipeline(cfg, n_channel=1, n_time=2, planar=True)
    S = pipe.samples_per_step
    frame = int("8d4840d6202cc371c32ce0576098", 16)
    iq, truth = encoder.make_capture(
        [(frame, 112)], snr_db=25.0, start=S - 100, seed=8,
        total_samples=2 * S)
    chunks = [iq[None, :S // 2], iq[None, S // 2: S + 777],
              iq[None, S + 777:]]
    msgs = [m for out in pipe.run_stream(chunks) for m in out]
    hexes = [m.split()[1] for m in msgs]
    assert hexes.count(truth[0].hex) == 1, hexes
    # dBFS referenced to the float full scale despite int8 quantization:
    # a ~0.5-amplitude pulse reads ~ -12..0 dBFS, not shifted by the gain
    ref = float(msgs[0].split()[4])
    assert -30.0 < ref < 1.0, ref


def test_planar_stream_matches_f32_stream():
    """Planar streaming decodes the same message set as the f32 ctx path
    over a multi-step capture with traffic near every boundary."""
    from airmodes.dist.multihost import PodPipeline

    cfg = DspConfig(block_size=1 << 14, max_detections=32)
    n_time = 2
    S = n_time * cfg.block_size
    frames = encoder.random_df17_frames(8, seed=91)
    iq, truth = encoder.make_capture(frames, snr_db=22.0, spacing=S // 5,
                                     seed=91, total_samples=2 * S + 3000)
    chunks = lambda: [iq[None, :S - 50], iq[None, S - 50:]]
    f32 = PodPipeline(cfg, n_channel=1, n_time=n_time, planar=False)
    pl = PodPipeline(cfg, n_channel=1, n_time=n_time, planar=True)
    got_f32 = {m.split()[1] for out in f32.run_stream(chunks())
               for m in out}
    got_pl = {m.split()[1] for out in pl.run_stream(chunks())
              for m in out}
    want = {t.hex for t in truth}
    assert want <= got_f32
    assert want <= got_pl


def test_ici_scaling_model_meets_target():
    """The halo-cost extrapolation says the >= 0.8 ICI weak-scaling target
    holds for the production config with wide margin — and still holds at
    10x worse interconnect assumptions."""
    from airmodes.dist.multihost import ici_scaling_model
    cfg = DspConfig(block_size=1 << 22, max_detections=256)
    m = ici_scaling_model(cfg, device_msps=9300.0, planar=True)
    assert m["meets_target"] and m["efficiency"] > 0.98, m
    # conservative: 10x slower links, 10x hop latency, f32 halos
    worse = ici_scaling_model(cfg, device_msps=9300.0, planar=False,
                              ici_bytes_per_s=4.5e9, hop_latency_s=2e-5)
    assert worse["efficiency"] >= 0.8, worse
    # the model is honest about where it breaks: tiny blocks at high rate
    tiny = ici_scaling_model(DspConfig(block_size=4096), 9300.0,
                             ici_bytes_per_s=4.5e9, hop_latency_s=2e-5)
    assert tiny["efficiency"] < 0.8


def test_pod_stream_tail_longer_than_one_step():
    """EOF tail spanning MORE than one full step drains step by step
    (regression guard for the old convoluted tail loop)."""
    cfg = DspConfig(block_size=1 << 14, max_detections=16)
    pipe = PodPipeline(cfg, n_channel=1, n_time=2)
    S = pipe.samples_per_step
    frames = encoder.random_df17_frames(6, seed=92)
    # 3.6 steps of data, delivered as ONE chunk: after the first step is
    # emitted the remaining 2.6 steps are all "tail"
    total = int(3.6 * S)
    iq, truth = encoder.make_capture(frames, snr_db=22.0,
                                     spacing=total // 7, seed=92,
                                     total_samples=total)
    outs = list(pipe.run_stream([iq[None, :]]))
    assert len(outs) == 4  # ceil(3.6)
    got = {m.split()[1] for out in outs for m in out}
    want = {t.hex for t in truth}
    assert want <= got
    # messages fall in their owning step's sample range
    for i, out in enumerate(outs):
        for m in out:
            ts = float(m.split()[5])
            assert i * S <= ts * cfg.channel_rate < (i + 1) * S


def test_pod_samples_per_step_int32_guard():
    """Step-global detection indices are int32 on the wire: a step past
    2^31 samples must fail loudly at construction (r4 review), not wrap
    negative and silently drop frames."""
    import pytest
    from airmodes.config import DspConfig
    with pytest.raises(ValueError, match="2\\^31|int32"):
        PodPipeline(DspConfig(block_size=1 << 30, max_detections=16),
                    n_channel=1, n_time=2, planar=False)


def test_pod_stream_many_tiny_chunks():
    """UDP-sized chunk feeds (hundreds per step) decode identically —
    the chunk buffer must assemble steps without O(buffered) re-copies
    (r4 review) and without losing samples at chunk splits."""
    import numpy as np
    from airmodes.config import DspConfig
    from airmodes.testing import encoder
    cfg = DspConfig(block_size=1 << 14, max_detections=32)
    pipe = PodPipeline(cfg, n_channel=1, n_time=2, planar=False)
    S = pipe.samples_per_step
    total = 2 * S + 777                 # ragged tail
    frames = encoder.random_df17_frames(12, seed=21)
    iq, truth = encoder.make_capture(frames, snr_db=20.0,
                                     spacing=total // 13, seed=21,
                                     total_samples=total)
    rng = np.random.default_rng(4)
    chunks = []
    pos = 0
    while pos < total:
        n = int(rng.integers(1, 700))   # tiny ragged chunks
        chunks.append(iq[None, pos: pos + n])
        pos += n
    got = set()
    for msgs in pipe.run_stream(iter(chunks)):
        got |= {m.split()[1] for m in msgs}
    want = {t.hex for t in truth}
    assert want <= got, want - got


def test_pod_stream_rejects_channel_mismatch():
    """A chunk with the wrong channel count must fail loudly: numpy
    would otherwise BROADCAST a (1, N) chunk across every channel in
    take_step, emitting each frame n_channel times with plausible
    per-channel provenance (r5 review)."""
    import numpy as np
    import pytest
    from airmodes.config import DspConfig
    cfg = DspConfig(block_size=1 << 14, max_detections=16)
    pipe = PodPipeline(cfg, n_channel=2, n_time=1, planar=False)
    bad = np.zeros((1, 2048), np.complex64)
    with pytest.raises(ValueError, match="channel"):
        list(pipe.run_stream(iter([bad])))


def test_initialize_calls_jax_distributed_on_pod_metadata(monkeypatch):
    """A Cloud TPU pod slice without JAX_COORDINATOR_ADDRESS coordinates
    via TPU metadata that jax.distributed.initialize() only discovers
    when CALLED — the no-arg fallback must fire there too (r4 review:
    each pod host silently ran single-process)."""
    import jax
    from airmodes.dist import multihost

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    multihost.initialize()              # single worker: stays a no-op
    assert calls == []
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "h0,h1")
    multihost.initialize()
    assert len(calls) == 1              # metadata auto-config engaged

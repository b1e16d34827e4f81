"""Benchmark: sustained demod throughput (Msamples/s per chip).

Runs the full single-chip demod pipeline (magnitude -> noise floor ->
preamble detect -> slice -> CRC/ECC -> detection table) over a synthetic
2 Msps capture containing real Mode S traffic, including host->device
transfer of the IQ stream and device->host fetch of the detection tables
(the honest streaming cost).

Baseline: the reference (gr-air-modes) sustains real-time on a desktop CPU
at its highest supported channel rate, 10 Msps (BASELINE.md — no published
numbers; design throughput 2-10 Msamples/s). vs_baseline = value / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def build_capture(cfg, n_blocks: int, msg_rate_hz: float = 100.0, seed: int = 0):
    """Synthetic capture with a realistic message density (~100 msg/s).

    Blocks ship as int8 (I,Q) pairs — the SDR's native quantization and 4x
    less host->device traffic than float32; the device rescales.
    """
    from airmodes.testing import encoder
    from airmodes.io import sources
    from airmodes.dsp.pipeline import iq_to_device_layout

    total = n_blocks * cfg.block_size
    duration_s = total / cfg.channel_rate
    n_msgs = max(int(duration_s * msg_rate_hz), 8)
    frames = encoder.random_df17_frames(n_msgs, seed=seed)
    spacing = total // n_msgs
    iq, truth = encoder.make_capture(
        frames, rate=cfg.channel_rate, snr_db=15.0, spacing=spacing,
        seed=seed, total_samples=total)
    peak = float(np.max(np.abs(iq))) or 1.0
    scale = 120.0 / peak
    blocks = []
    for b, _ in sources.frame_blocks(iq, cfg):
        f = iq_to_device_layout(b)
        blocks.append(np.clip(np.round(f * scale), -127, 127).astype(np.int8))
    return blocks, truth


def main():
    import jax
    import numpy as np
    import airmodes
    from airmodes.dsp import host
    from airmodes.dsp.pipeline import demod_block_packed_jit, unpack_table

    cfg = airmodes.DspConfig(block_size=1 << 20, max_detections=128)
    n_blocks = 8
    blocks, truth = build_capture(cfg, n_blocks)

    # Prefer the fused Pallas front-end (2x the XLA path on TPU); fall back
    # to the pure-XLA program if the backend can't compile it.
    step = demod_block_packed_jit
    kernel = "xla"
    t0 = time.time()
    try:
        from airmodes.kernels.preamble_pallas import demod_block_packed_pallas_jit
        jax.block_until_ready(demod_block_packed_pallas_jit(blocks[0], cfg))
        step = demod_block_packed_pallas_jit
        kernel = "pallas"
    except Exception as e:
        print(f"# pallas front-end unavailable ({type(e).__name__}); "
              "using XLA path", file=sys.stderr)
        jax.block_until_ready(step(blocks[0], cfg))
    compile_s = time.time() - t0

    # correctness gate: the bench capture must decode its injected traffic
    msgs = []
    for i, b in enumerate(blocks):
        t = unpack_table(step(b, cfg))
        msgs.extend(host.table_to_messages(t, i * cfg.block_size,
                                           cfg.channel_rate))
    want = {t.hex for t in truth}
    got = {m.split()[1] for m in msgs}
    missing = len(want - got)

    # timed: sustained streaming loop — H2D of each block, device demod, and
    # the single packed D2H fetch per block (the honest end-to-end cost).
    # Two steps kept in flight so transfers overlap compute.
    iters = 24
    t0 = time.time()
    inflight = []
    for i in range(iters):
        inflight.append(step(blocks[i % n_blocks], cfg))
        if len(inflight) > 2:
            np.asarray(inflight.pop(0))
    for o in inflight:
        np.asarray(o)
    dt = time.time() - t0

    msps = iters * cfg.block_size / dt / 1e6
    baseline_msps = 10.0  # reference real-time ceiling on desktop CPU
    result = {
        "metric": "demod_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / baseline_msps, 2),
    }
    # device-resident compute throughput (the per-chip kernel number,
    # independent of this environment's host<->device relay)
    dev = jax.device_put(blocks[0])
    jax.block_until_ready(step(dev, cfg))
    t0 = time.time()
    for _ in range(16):
        o = step(dev, cfg)
    jax.block_until_ready(o)
    dev_msps = 16 * cfg.block_size / (time.time() - t0) / 1e6

    print(json.dumps(result))
    print(f"# backend={jax.default_backend()} kernel={kernel} "
          f"compile={compile_s:.1f}s block={cfg.block_size} iters={iters} "
          f"wall={dt:.3f}s decoded={len(got)}/{len(want)} missing={missing} "
          f"device_compute={dev_msps:.0f} Msamples/s",
          file=sys.stderr)
    return 0 if missing == 0 else 1


if __name__ == "__main__":
    sys.exit(main())

"""Tile/nbuf re-sweep with the SUM-SYNCED timing methodology.

The r1/r2 tile and nbuf sweeps (tpu_bigtile_probe, tpu_planar_nbuf_probe)
concluded "flat" under full-table-fetch timing, whose relay noise
(±25-35% session band, r3) could hide effects up to ~10%. The r3
sum-synced loop measures 0.2% run spread, so this re-sweeps the planar
kernel's tile size and DMA prefetch depth with resolving power.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_tile_resweep_probe.py
"""

import os
import sys
import threading
import time

import numpy as np

DEADLINE_S = 2700


def _die():
    print("# deadline hit; clean exit", flush=True)
    os._exit(4)


t = threading.Timer(DEADLINE_S, _die)
t.daemon = True
t.start()

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
print("devices:", jax.devices(), flush=True)

import jax.numpy as jnp  # noqa: E402
import airmodes  # noqa: E402
from airmodes.io import sources  # noqa: E402
from airmodes.dsp.pipeline import iq_to_device_layout  # noqa: E402
from airmodes.kernels.preamble_pallas import (  # noqa: E402
    DEFAULT_NBUF, demod_batch_packed_planar_jit, planar_length)
from airmodes.testing import encoder  # noqa: E402

cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
C = 16
REPS = 16
total = C * cfg.block_size
n_msgs = max(int(total / cfg.channel_rate * 100.0), 8)
frames = encoder.random_df17_frames(n_msgs, seed=0)
iq, truth = encoder.make_capture(frames, rate=cfg.channel_rate, snr_db=15.0,
                                 spacing=total // n_msgs, seed=0,
                                 total_samples=total)
peak = float(np.max(np.abs(iq))) or 1.0
scale = 120.0 / peak
want = {t.hex for t in truth}
print(f"capture: {total} samples, {n_msgs} msgs", flush=True)


def capture_for(p):
    xi = np.zeros((C, p), np.int8)
    xq = np.zeros((C, p), np.int8)
    for k, (b, _) in enumerate(sources.frame_blocks(iq, cfg)):
        f = iq_to_device_layout(b)
        n = f.shape[0]
        xi[k, :n] = np.clip(np.round(f[:, 0] * scale), -127, 127)
        xq[k, :n] = np.clip(np.round(f[:, 1] * scale), -127, 127)
    return xi, xq


def decode_check(arr):
    from airmodes.dsp import host
    from airmodes.dsp.pipeline import unpack_table
    got = set()
    for i in range(C):
        tb = unpack_table(np.asarray(arr)[i])
        got |= {m.split()[1] for m in host.table_to_messages(
            tb, i * cfg.block_size, cfg.channel_rate)}
    return len(want - got), len(got - want)


results = []


def bench_variant(label, tile, nbuf):
    p = planar_length(cfg, tile)
    xi, xq = capture_for(p)

    def raw_step(a, b):
        return demod_batch_packed_planar_jit(a, b, cfg, tile=tile,
                                             nbuf=nbuf)

    sum_step = jax.jit(lambda a, b: (lambda t: (t, jnp.sum(t)))(
        raw_step(a, b)))
    t0 = time.time()
    arr = raw_step(xi, xq)
    missing, spurious = decode_check(arr)
    print(f"# {label}: first run {time.time() - t0:.0f}s "
          f"missing={missing} spurious={spurious}", flush=True)
    if missing > max(1, len(want) // 1000):
        print(f"# {label}: DECODE REGRESSION, skipping timing", flush=True)
        return
    di = jax.device_put(np.tile(xi, (REPS, 1)))
    dq = jax.device_put(np.tile(xq, (REPS, 1)))
    jax.block_until_ready((di, dq))
    np.asarray(sum_step(di, dq)[1])

    def loop(iters=8):
        t0 = time.time()
        inflight = []
        for _ in range(iters):
            inflight.append(sum_step(di, dq)[1])
            if len(inflight) > 1:
                np.asarray(inflight.pop(0))
        for o in inflight:
            np.asarray(o)
        return iters * REPS * C * cfg.block_size / (time.time() - t0) / 1e6

    loop(iters=2)
    runs = sorted(loop() for _ in range(3))
    med = runs[1]
    results.append((label, med))
    print(f"# {label}: {[round(r) for r in runs]} median {med:.0f} Msps",
          flush=True)
    del di, dq


# Full swept set (r3 measured): tiles at nbuf=2, then nbuf variants at
# the winning tile. 524288 exceeds the 16 MB scoped-VMEM limit and is
# expected to fail compile; it stays in the list so the boundary is
# re-checked when the kernel or toolchain changes.
VARIANTS = [(t, DEFAULT_NBUF) for t in
            (16384, 32768, 65536, 131072, 262144, 524288)] + \
           [(131072, n) for n in (1, 3, 4)]
for tile, nbuf in VARIANTS:
    try:
        bench_variant(f"tile={tile} nbuf={nbuf}", tile, nbuf)
    except Exception as e:
        print(f"# tile={tile} nbuf={nbuf}: {type(e).__name__}: {e}",
              flush=True)

best = max(results, key=lambda r: r[1])[0] if results else None
print("RESULT", results, "best:", best, flush=True)
os._exit(0)

"""A/B probe: HEAD planar kernel vs the r1-snapshot kernel (eb33a22).

BENCH_r03 measured the device-resident loop at median 6.77 Gsps vs r1's
9.32; r2 probes of the current kernel measured 9.2-9.3 in isolation, so
the suspects are (a) a post-r1 kernel regression (d5c2ede sparse-slice /
deterministic empty rows), (b) platform/relay drift between rounds, or
(c) bench-context contamination. This runs the bench's exact device loop
for both kernel generations in ONE process — if both are slow it's (b)
(or this session's relay), if only HEAD is slow it's (a).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_regress_probe.py
"""

import os
import sys
import threading
import time

import numpy as np

DEADLINE_S = 2400


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

import airmodes  # noqa: E402
from airmodes.io import sources  # noqa: E402
from airmodes.dsp.pipeline import iq_to_device_layout  # noqa: E402
from airmodes.testing import encoder  # noqa: E402

cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
C = 16
total = C * cfg.block_size
duration_s = total / cfg.channel_rate
n_msgs = max(int(duration_s * 100.0), 8)
frames = encoder.random_df17_frames(n_msgs, seed=0)
iq, truth = encoder.make_capture(frames, rate=cfg.channel_rate, snr_db=15.0,
                                 spacing=total // n_msgs, seed=0,
                                 total_samples=total)
peak = float(np.max(np.abs(iq))) or 1.0
scale = 120.0 / peak
print(f"capture built: {total} samples, {n_msgs} msgs", flush=True)


def capture_for(mod):
    p = mod.planar_length(cfg)
    xi = np.zeros((C, p), np.int8)
    xq = np.zeros((C, p), np.int8)
    for k, (b, _) in enumerate(sources.frame_blocks(iq, cfg)):
        f = iq_to_device_layout(b)
        n = f.shape[0]
        xi[k, :n] = np.clip(np.round(f[:, 0] * scale), -127, 127)
        xq[k, :n] = np.clip(np.round(f[:, 1] * scale), -127, 127)
    return xi, xq


def bench_mod(name, mod, reps=16, iters=8, runs=3):
    xi, xq = capture_for(mod)
    step = mod.demod_batch_packed_planar_jit
    t0 = time.time()
    out = np.asarray(step(xi, xq, cfg))
    print(f"# {name}: full-batch compile+run {time.time() - t0:.1f}s, "
          f"out {out.shape}", flush=True)
    di = jax.device_put(np.tile(xi, (reps, 1)))
    dq = jax.device_put(np.tile(xq, (reps, 1)))
    jax.block_until_ready((di, dq))
    np.asarray(step(di, dq, cfg))
    rates = []
    for r in range(runs):
        t0 = time.time()
        inflight = []
        for i in range(iters):
            inflight.append(step(di, dq, cfg))
            if len(inflight) > 1:
                np.asarray(inflight.pop(0))
        for o in inflight:
            np.asarray(o)
        rates.append(iters * reps * C * cfg.block_size
                     / (time.time() - t0) / 1e6)
    print(f"# {name}: {[round(r, 1) for r in sorted(rates)]} Msps "
          f"(median {sorted(rates)[len(rates) // 2]:.0f})", flush=True)
    del di, dq
    return sorted(rates)[len(rates) // 2]


from airmodes.kernels import preamble_pallas as head_mod  # noqa: E402

head = bench_mod("HEAD", head_mod)

try:
    from airmodes.kernels import preamble_pallas_r1 as r1_mod
    r1 = bench_mod("r1-eb33a22", r1_mod)
except Exception as e:
    print(f"# r1 kernel failed: {type(e).__name__}: {e}", flush=True)
    r1 = None

print(f"RESULT head={head:.0f} r1={r1 and round(r1)} Msps", flush=True)
os._exit(0)

"""Why is sps=5 (10 Msps) 2.5x slower per sample than sps=1?

VERDICT r4 weak #4: 9832 -> 3887 Msps while the jaxpr op count only grows
84.9 -> 108.4 ops/sample (1.28x). If the drop were detect-VPU-inherent the
ratio would match the op count; the gap (~2x) must live in (a) the detect
kernel executing its ops less efficiently at sps=5 (wider rolls), or
(b) the decode tail (slice kernel windows + _tail_from_power spans scale
with sps at FIXED table capacity K).

Same-process A/B (the only trustworthy comparison, CLAUDE.md):
  for sps in (1, 5):
    full path K=256        (the bench's shape)
    full path K=64         (tail capacity ablation)
    detect+compact only    (sum of det_idx/n_det — detect kernel cannot be
                            DCE'd; attributes everything downstream)
All sum-synced, median of 5, device-resident inputs.
"""
import os
import sys
import threading
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def die():
    print("# internal deadline hit; clean exit", flush=True)
    os._exit(0)


threading.Timer(40 * 60, die).start()

import jax                                               # noqa: E402
import jax.numpy as jnp                                  # noqa: E402

print("devices:", jax.devices(), flush=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")
import airmodes                                          # noqa: E402
from airmodes.io import sources                          # noqa: E402
from airmodes.kernels.preamble_pallas import (           # noqa: E402
    cand_capacity, compact_candidates_unordered, default_tile,
    demod_batch_packed_planar_jit, planar_length,
    preamble_detect_cands_planar, to_planar_i8)
from airmodes.testing import encoder                     # noqa: E402


def make_inputs(cfg, C, seed):
    P = planar_length(cfg)
    xi = np.zeros((C, P), np.int8)
    xq = np.zeros((C, P), np.int8)
    for k in range(C):
        frames = encoder.random_df17_frames(42, seed=seed + k)
        iq, _ = encoder.make_capture(
            frames, rate=cfg.channel_rate, snr_db=15.0,
            spacing=cfg.block_size // 43, seed=seed + k,
            total_samples=cfg.block_size)
        block, _ = next(sources.frame_blocks(iq, cfg))
        x2 = np.stack([block.real, block.imag], -1)
        peak = float(np.abs(x2).max()) or 1.0
        b8 = np.clip(np.round(x2 / peak * 120), -127, 127).astype(np.int8)
        pi, pq = to_planar_i8(b8, cfg)
        xi[k], xq[k] = pi[0], pq[0]
    return xi, xq


def timed(step, di, dq, total_samples, n_runs=5, iters=6):
    np.asarray(step(di, dq))                 # compile + warm
    rates = []
    for _ in range(n_runs):
        t0 = time.time()
        inflight = []
        for _ in range(iters):
            inflight.append(step(di, dq))
            if len(inflight) > 1:
                np.asarray(inflight.pop(0))
        for o in inflight:
            np.asarray(o)
        rates.append(iters * total_samples / (time.time() - t0) / 1e6)
    rates.sort()
    return rates[len(rates) // 2], rates


def main():
    C, reps = 4, 8
    for rate, sps in ((2e6, 1), (10e6, 5)):
        cfg = airmodes.DspConfig(channel_rate=rate, block_size=1 << 22,
                                 max_detections=256)
        cfg64 = airmodes.DspConfig(channel_rate=rate, block_size=1 << 22,
                                   max_detections=64)
        xi, xq = make_inputs(cfg, C, seed=100)
        di = jax.device_put(np.tile(xi, (reps, 1)))
        dq = jax.device_put(np.tile(xq, (reps, 1)))
        jax.block_until_ready((di, dq))
        total = reps * C * cfg.block_size
        tile = default_tile(cfg)
        per_lane = min(cand_capacity(tile)[1], 4)

        def full(cfgx):
            return jax.jit(lambda a, b: jnp.sum(
                demod_batch_packed_planar_jit(a, b, cfgx)))

        def detect_only():
            def f(a, b):
                cands = preamble_detect_cands_planar(
                    a, b, cfg, tile=tile, per_lane=per_lane, ordered=False)
                det_idx, valid, n_det, ovf = jax.vmap(
                    lambda cc: compact_candidates_unordered(
                        cc, cfg, tile, per_lane=per_lane))(cands)
                return (jnp.sum(det_idx) + jnp.sum(n_det) + jnp.sum(ovf)
                        + jnp.sum(valid.astype(jnp.int32)))
            return jax.jit(f)

        for name, step in (("full_k256", full(cfg)),
                           ("full_k64", full(cfg64)),
                           ("detect_compact", detect_only())):
            m, runs = timed(step, di, dq, total)
            print(f"sps={sps} {name}: {m:.0f} Msps "
                  f"(runs {' '.join(f'{r:.0f}' for r in runs)})",
                  flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()

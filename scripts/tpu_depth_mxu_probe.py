"""A/B in one session: mxu_window_sum on/off on the full packed step, and
dev-loop pipeline depth 1-4 (10 iters each, fetch-synced totals).

Usage: python scripts/tpu_depth_mxu_probe.py [C]
"""
import dataclasses
import functools
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import airmodes
from airmodes.kernels.preamble_pallas import (
    demod_batch_packed_planar_jit, planar_length)

DEADLINE = time.time() + 1500
print(jax.devices(), flush=True)

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
cfg_mxu = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
cfg_vpu = dataclasses.replace(cfg_mxu, mxu_window_sum=False)
p = planar_length(cfg_mxu)
rng = np.random.default_rng(0)
xi = jax.device_put((rng.standard_normal((C, p)) * 6).astype(np.int8))
xq = jax.device_put((rng.standard_normal((C, p)) * 6).astype(np.int8))
jax.block_until_ready((xi, xq))
nsamp = C * cfg_mxu.block_size


def step(cfg):
    return demod_batch_packed_planar_jit(xi, xq, cfg)


def sync_best(name, cfg):
    if time.time() > DEADLINE:
        print(f"{name} SKIPPED", flush=True)
        return
    t0 = time.time()
    np.asarray(step(cfg))
    comp = time.time() - t0
    ts = []
    for _ in range(6):
        t0 = time.time()
        np.asarray(step(cfg))
        ts.append(time.time() - t0)
    print(f"{name:10s} compile+1st={comp:7.2f}s best={min(ts)*1e3:8.2f} ms "
          f"-> {nsamp/min(ts)/1e9:6.2f} Gsps "
          f"(all {[f'{t*1e3:.1f}' for t in ts]})", flush=True)


def pipelined(name, cfg, depth, iters=10):
    if time.time() > DEADLINE:
        print(f"{name} SKIPPED", flush=True)
        return
    np.asarray(step(cfg))
    t0 = time.time()
    inflight = []
    for _ in range(iters):
        inflight.append(step(cfg))
        if len(inflight) > depth - 1:
            np.asarray(inflight.pop(0))
    for o in inflight:
        np.asarray(o)
    dt = time.time() - t0
    print(f"{name:10s} {dt*1e3/iters:8.2f} ms/dispatch -> "
          f"{iters*nsamp/dt/1e9:6.2f} Gsps", flush=True)


sync_best("sync-mxu", cfg_mxu)
sync_best("sync-vpu", cfg_vpu)
for depth in (1, 2, 3, 4):
    pipelined(f"mxu-d{depth}", cfg_mxu, depth)
for depth in (2, 3):
    pipelined(f"vpu-d{depth}", cfg_vpu, depth)
# repeat the winners to gauge run-to-run noise
pipelined("mxu-d2b", cfg_mxu, 2)
pipelined("mxu-d3b", cfg_mxu, 3)
print("done", flush=True)

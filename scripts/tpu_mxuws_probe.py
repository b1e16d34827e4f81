"""A/B the detect kernel's noise-window sum: VPU shifted-add chain vs two
MXU matmuls (cfg.mxu_window_sum). Kernel-only step, fetch-synced.

Usage: python scripts/tpu_mxuws_probe.py [C] [TILE] [NBUF]
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
    planar_length, preamble_detect_cands_planar)

DEADLINE = time.time() + 1500
print(jax.devices(), flush=True)

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
TILE = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
NBUF = int(sys.argv[3]) if len(sys.argv) > 3 else 2
cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
cfg_mxu = dataclasses.replace(cfg, mxu_window_sum=True)
p = planar_length(cfg, TILE)
rng = np.random.default_rng(0)
xi = jax.device_put((rng.standard_normal((C, p)) * 6).astype(np.int8))
xq = jax.device_put((rng.standard_normal((C, p)) * 6).astype(np.int8))
jax.block_until_ready((xi, xq))
nsamp = C * cfg.block_size


@functools.partial(jax.jit, static_argnames=("c",))
def step_k(a, b, c):
    cands = preamble_detect_cands_planar(a, b, c, tile=TILE, nbuf=NBUF,
                                         ordered=False)
    return cands[:, ::7, ::3, ::31]


def timeit(name, fn, *args):
    if time.time() > DEADLINE:
        print(f"{name} SKIPPED (deadline)", flush=True)
        return
    t0 = time.time()
    try:
        jax.tree.map(np.asarray, fn(*args))
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return
    comp = time.time() - t0
    ts = []
    for _ in range(6):
        if time.time() > DEADLINE:
            break
        t0 = time.time()
        jax.tree.map(np.asarray, fn(*args))
        ts.append(time.time() - t0)
    if ts:
        best = min(ts)
        print(f"{name:8s} compile+1st={comp:7.2f}s best={best*1e3:8.2f} ms "
              f"-> {nsamp/best/1e9:6.2f} Gsps "
              f"(all {[f'{t*1e3:.1f}' for t in ts]})", flush=True)


timeit("k-vpu", step_k, xi, xq, cfg)
timeit("k-mxu", step_k, xi, xq, cfg_mxu)
# decision parity on-device: same candidate blocks either way
a = np.asarray(step_k(xi[:2], xq[:2], cfg))
b = np.asarray(step_k(xi[:2], xq[:2], cfg_mxu))
print("cands equal:", np.array_equal(a, b), flush=True)
print("done", flush=True)

"""Detect-kernel geometry sweep now that the tail is ~free: tile 64K vs
128K, nbuf 2 vs 3, on the full production step (one packed fetch each).

Usage: python scripts/tpu_tile128_probe.py [C]
"""
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
cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
rng = np.random.default_rng(0)
nsamp = C * cfg.block_size

data = {}
for tile in (65536, 131072):
    p = planar_length(cfg, tile)
    xi = jax.device_put((rng.standard_normal((C, p)) * 6).astype(np.int8))
    xq = jax.device_put((rng.standard_normal((C, p)) * 6).astype(np.int8))
    jax.block_until_ready((xi, xq))
    data[tile] = (xi, xq)


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
        print(f"{name:18s} compile+1st={comp:7.2f}s best={best*1e3:8.2f} ms "
              f"-> {nsamp/best/1e9:6.2f} Gsps "
              f"(all {[f'{t*1e3:.1f}' for t in ts]})", flush=True)


for tile in (65536, 131072):
    for nbuf in (2, 3):
        xi, xq = data[tile]
        timeit(f"tile{tile//1024}k-nbuf{nbuf}",
               functools.partial(demod_batch_packed_planar_jit, tile=tile,
                                 nbuf=nbuf),
               xi, xq, cfg)
print("done", flush=True)

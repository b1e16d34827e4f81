"""Prefetch-depth (nbuf) x tile sweep of the v3 planar detect kernel.

The C-scaling probe showed the device kernel at ~5.5 us per 16K-sample
grid step — dominated by serialized DMA issue latency, not transfer or
compute. nbuf-deep prefetch keeps nbuf-1 window DMAs in flight; larger
tiles amortize the latency over more samples. Sweep both.

usage: tpu_planar_nbuf_probe.py [C] [combo...]  combos like 16384x4
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import airmodes
from airmodes.kernels.preamble_pallas import (
    demod_batch_packed_planar_jit, planar_length)

DEADLINE = time.time() + 2400
print(jax.devices(), flush=True)

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
rng = np.random.default_rng(0)

combos = [(16384, 4), (16384, 8), (65536, 4), (32768, 4)]
if len(sys.argv) > 2:
    combos = [tuple(map(int, a.split("x"))) for a in sys.argv[2:]]

for tile, nbuf in combos:
    if time.time() > DEADLINE:
        print(f"tile={tile} nbuf={nbuf} SKIPPED (deadline)", flush=True)
        continue
    p = planar_length(cfg, tile)
    one_i = (rng.standard_normal(p) * 0.05 * 127).astype(np.int8)
    one_q = (rng.standard_normal(p) * 0.05 * 127).astype(np.int8)
    xi = jax.device_put(np.broadcast_to(one_i, (C, p)).copy())
    xq = jax.device_put(np.broadcast_to(one_q, (C, p)).copy())
    jax.block_until_ready((xi, xq))
    try:
        t0 = time.time()
        np.asarray(demod_batch_packed_planar_jit(xi, xq, cfg, tile=tile,
                                                 nbuf=nbuf))
        comp = time.time() - t0
    except Exception as e:
        print(f"tile={tile} nbuf={nbuf} FAILED: {type(e).__name__}: {e}",
              flush=True)
        del xi, xq
        continue
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(demod_batch_packed_planar_jit(xi, xq, cfg, tile=tile,
                                                 nbuf=nbuf))
        ts.append(time.time() - t0)
    ser = sorted(ts)[len(ts) // 2]
    iters = 8
    t0 = time.time()
    inflight = []
    for _ in range(iters):
        inflight.append(demod_batch_packed_planar_jit(xi, xq, cfg, tile=tile,
                                                      nbuf=nbuf))
        if len(inflight) > 1:
            np.asarray(inflight.pop(0))
    for o in inflight:
        np.asarray(o)
    pipe = (time.time() - t0) / iters
    print(f"C={C} tile={tile:6d} nbuf={nbuf} serial {ser*1e3:7.1f} ms "
          f"{C*cfg.block_size/ser/1e6:7.0f} Msps | pipelined {pipe*1e3:7.1f} ms "
          f"{C*cfg.block_size/pipe/1e6:7.0f} Msps (compile {comp:.0f}s)",
          flush=True)
    del xi, xq
print("done", flush=True)

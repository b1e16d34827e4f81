"""Tile-size scaling of the v3 planar-int8 detect kernel.

At tile=16384 (trows=128) the fixed 32-row DMA halo is a 25% read
overhead and the grid has C*256 steps; tile=65536 (trows=512) cuts the
halo to 6% and the steps 4x. VMEM check: the f32 conversion window is
(trows+32, 128) f32 = ~280 KB at trows=512; the detect body's live
intermediates stay well under the ~16 MB VMEM budget.

Runs the full packed planar step at a fixed C for tile in {16384, 32768,
65536}, serial + pipelined.
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

DEADLINE = time.time() + 1800
print(jax.devices(), flush=True)

C = int(sys.argv[1]) if len(sys.argv) > 1 else 64
cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
rng = np.random.default_rng(0)

for tile, db in ((16384, True), (65536, False), (65536, True),
                 (131072, True), (32768, True)):
    if time.time() > DEADLINE:
        print(f"tile={tile} db={db} SKIPPED (deadline)", flush=True)
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
                                                 double_buffer=db))
        comp = time.time() - t0
    except Exception as e:
        print(f"tile={tile} db={db} FAILED: {type(e).__name__}: {e}",
              flush=True)
        del xi, xq
        continue
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(demod_batch_packed_planar_jit(xi, xq, cfg, tile=tile,
                                                 double_buffer=db))
        ts.append(time.time() - t0)
    ser = sorted(ts)[len(ts) // 2]
    iters = 8
    t0 = time.time()
    inflight = []
    for _ in range(iters):
        inflight.append(demod_batch_packed_planar_jit(xi, xq, cfg, tile=tile,
                                                      double_buffer=db))
        if len(inflight) > 1:
            np.asarray(inflight.pop(0))
    for o in inflight:
        np.asarray(o)
    pipe = (time.time() - t0) / iters
    print(f"C={C} tile={tile:6d} db={int(db)} serial {ser*1e3:7.1f} ms "
          f"{C*cfg.block_size/ser/1e6:7.0f} Msps | pipelined {pipe*1e3:7.1f} ms "
          f"{C*cfg.block_size/pipe/1e6:7.0f} Msps (compile {comp:.0f}s)",
          flush=True)
    del xi, xq
print("done", flush=True)

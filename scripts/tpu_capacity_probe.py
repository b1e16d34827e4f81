"""Throughput of the planar path vs (tile, per_tile, per_lane) capacity.

Isolates two costs the stage profile surfaced at large tiles:
  - in-kernel ordered extraction scales with per_tile (sequential
    min+where chain) — does density-preserving capacity erode the
    large-tile win?
  - XLA-side compaction: rank-onehot matmul replaced the K-scatter
    (~23 ms/call at C=64, tile=262144).

usage: tpu_capacity_probe.py [C] [combo...]   combos tile:per_tile:per_lane
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

combos = [(65536, 16, 4), (65536, 64, 4), (262144, 16, 4), (262144, 256, 8)]
if len(sys.argv) > 2:
    combos = [tuple(map(int, a.split(":"))) for a in sys.argv[2:]]

for tile, per_tile, per_lane in combos:
    if time.time() > DEADLINE:
        print(f"{tile}:{per_tile}:{per_lane} SKIPPED (deadline)", flush=True)
        continue
    p = planar_length(cfg, tile)
    one_i = (rng.standard_normal(p) * 0.05 * 127).astype(np.int8)
    one_q = (rng.standard_normal(p) * 0.05 * 127).astype(np.int8)
    xi = jax.device_put(np.broadcast_to(one_i, (C, p)).copy())
    xq = jax.device_put(np.broadcast_to(one_q, (C, p)).copy())
    jax.block_until_ready((xi, xq))
    kw = dict(tile=tile, nbuf=2, per_tile=per_tile, per_lane=per_lane)
    try:
        t0 = time.time()
        np.asarray(demod_batch_packed_planar_jit(xi, xq, cfg, **kw))
        comp = time.time() - t0
    except Exception as e:
        print(f"{tile}:{per_tile}:{per_lane} FAILED: "
              f"{type(e).__name__}: {e}", flush=True)
        del xi, xq
        continue
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(demod_batch_packed_planar_jit(xi, xq, cfg, **kw))
        ts.append(time.time() - t0)
    ser = sorted(ts)[len(ts) // 2]
    # pipelined: keep 3 calls in flight, fetch-synced on the oldest
    outs = []
    t0 = time.time()
    nrep = 10
    for r in range(nrep):
        outs.append(demod_batch_packed_planar_jit(xi, xq, cfg, **kw))
        if len(outs) > 3:
            np.asarray(outs.pop(0))
    while outs:
        np.asarray(outs.pop(0))
    pipe = (time.time() - t0) / nrep
    n = C * cfg.block_size
    print(f"C={C} tile={tile:6d} pt={per_tile:3d} pl={per_lane} "
          f"serial {ser*1e3:7.1f} ms {n/ser/1e6:7.0f} Msps | "
          f"pipelined {pipe*1e3:7.1f} ms {n/pipe/1e6:7.0f} Msps "
          f"(compile {comp:.0f}s)", flush=True)

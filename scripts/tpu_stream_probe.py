"""Probe streaming variants: dispatch depth, device_put, block size."""
import time, numpy as np, jax
import airmodes
from airmodes.kernels.preamble_pallas import demod_block_packed_pallas_jit as step

def make_blocks(cfg, n=4, dtype=np.int8):
    nn = cfg.left_halo + cfg.block_size + cfg.right_halo
    rng = np.random.default_rng(0)
    f = [(rng.standard_normal((nn, 2)) * 0.05).astype(np.float32) for _ in range(n)]
    return [np.clip(b * 127 * 8, -127, 127).astype(dtype) for b in f]

def run(label, cfg, blocks, depth, use_put, iters=20):
    jax.block_until_ready(step(blocks[0], cfg))
    t0 = time.time()
    inflight = []
    for i in range(iters):
        b = blocks[i % len(blocks)]
        if use_put:
            b = jax.device_put(b)
        inflight.append(step(b, cfg))
        if len(inflight) > depth:
            np.asarray(inflight.pop(0))
    for o in inflight:
        np.asarray(o)
    dt = (time.time() - t0) / iters
    print(f'{label}: {dt*1e3:.1f} ms/iter -> {cfg.block_size/dt/1e6:.1f} Msamples/s', flush=True)

cfg20 = airmodes.DspConfig(block_size=1 << 20, max_detections=128)
blocks20 = make_blocks(cfg20)
run('b20 jitarg d2', cfg20, blocks20, 2, False)
run('b20 jitarg d4', cfg20, blocks20, 4, False)
run('b20 devput d2', cfg20, blocks20, 2, True)

cfg22 = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
blocks22 = make_blocks(cfg22, n=3)
run('b22 jitarg d2', cfg22, blocks22, 2, False, iters=10)
run('b22 jitarg d3', cfg22, blocks22, 3, False, iters=10)

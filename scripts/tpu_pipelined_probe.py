"""One-off probe: pipelined H2D/compute/D2H throughput on the real TPU."""
import time, numpy as np, jax
import airmodes
from airmodes.dsp.pipeline import demod_block_packed_jit

cfg = airmodes.DspConfig(block_size=1 << 20, max_detections=128)
n = cfg.left_halo + cfg.block_size + cfg.right_halo
rng = np.random.default_rng(0)
f32blocks = [(rng.standard_normal((n, 2)) * 0.05).astype(np.float32) for _ in range(4)]
i8blocks = [np.clip(b * 127 * 8, -127, 127).astype(np.int8) for b in f32blocks]

def pipelined(blocks, iters=16, label=''):
    jax.block_until_ready(demod_block_packed_jit(blocks[0], cfg))
    t0 = time.time()
    d = jax.device_put(blocks[0])
    outs = []
    for i in range(iters):
        d_next = jax.device_put(blocks[(i + 1) % 4])
        outs.append(demod_block_packed_jit(d, cfg))
        if len(outs) > 1:
            np.asarray(outs.pop(0))
        d = d_next
    for o in outs:
        np.asarray(o)
    dt = (time.time() - t0) / iters
    print(f'{label}: {dt*1e3:.1f} ms/iter -> {cfg.block_size/dt/1e6:.1f} Msamples/s', flush=True)

pipelined(f32blocks, label='f32 pipelined')
pipelined(i8blocks, label='int8 pipelined')

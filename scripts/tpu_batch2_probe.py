"""Probe: batched pallas demod on TPU — correctness + honest throughput.

Ensures distinct buffers per call by mutating one input each iteration (the
relay appears to cache identical execute requests, giving bogus timings)."""
import time, functools
import numpy as np
import jax
from airmodes.config import DspConfig
from airmodes.dsp import pipeline as P
from airmodes.kernels.preamble_pallas import (demod_batch_packed_pallas_jit,
                                              demod_block_packed_pallas_jit)
from airmodes.testing import encoder
from airmodes.io import sources

cfg = DspConfig(block_size=1 << 20, max_detections=128)
C = 4
blocks = []
truths = []
for c in range(C):
    frames = encoder.random_df17_frames(30, seed=100 + c)
    iq, tr = encoder.make_capture(frames, snr_db=18.0, spacing=30000,
                                  seed=100 + c, total_samples=cfg.block_size)
    blocks.append(P.iq_to_device_layout(next(sources.frame_blocks(iq, cfg))[0]))
    truths.append(tr)
batch = np.stack(blocks)

t0 = time.time()
out = jax.block_until_ready(demod_batch_packed_pallas_jit(batch, cfg))
print(f'batched compile {time.time()-t0:.1f}s', flush=True)
# correctness
ok = True
for c in range(C):
    tbl = P.unpack_table(np.asarray(out)[c])
    from airmodes.dsp import host
    got = {m.split()[1] for m in host.table_to_messages(tbl, 0, 2e6)}
    want = {t.hex for t in truths[c]}
    if not want <= got:
        ok = False
        print(f'channel {c}: MISSING {len(want-got)}', flush=True)
print('batched decode correct:', ok, flush=True)

# throughput with varied inputs (defeat relay caching)
variants = [jax.device_put(batch * s) for s in (1.0, 1.01, 0.99, 1.02)]
jax.block_until_ready(variants)
t0 = time.time()
outs = []
for i in range(12):
    outs.append(demod_batch_packed_pallas_jit(variants[i % 4], cfg))
    if len(outs) > 2:
        np.asarray(outs.pop(0))
for o in outs:
    np.asarray(o)
dt = (time.time() - t0) / 12
print(f'batched C={C}: {dt*1e3:.1f} ms/call -> {C*cfg.block_size/dt/1e6:.0f} Msamples/s', flush=True)

# single-block with varied inputs for comparison
sv = [jax.device_put(blocks[0] * s) for s in (1.0, 1.01, 0.99, 1.02)]
jax.block_until_ready(jax.block_until_ready(demod_block_packed_pallas_jit(sv[0], cfg)))
t0 = time.time()
outs = []
for i in range(12):
    outs.append(demod_block_packed_pallas_jit(sv[i % 4], cfg))
    if len(outs) > 2:
        np.asarray(outs.pop(0))
for o in outs:
    np.asarray(o)
dt = (time.time() - t0) / 12
print(f'single: {dt*1e3:.1f} ms/call -> {cfg.block_size/dt/1e6:.0f} Msamples/s', flush=True)

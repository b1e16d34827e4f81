"""Profile the post-detect XLA tail stages on TPU + test a cumsum+scatter
compaction alternative to the full-block top_k."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from airmodes.config import DspConfig
from airmodes.dsp import pipeline as P
from airmodes.testing import encoder
from airmodes.io import sources

cfg = DspConfig(block_size=1 << 20, max_detections=128)
frames = encoder.random_df17_frames(60, seed=61)
iq, _ = encoder.make_capture(frames, snr_db=18.0, spacing=12000, seed=61,
                             total_samples=cfg.block_size)
block, _ = next(sources.frame_blocks(iq, cfg))
x = jax.device_put(P.iq_to_device_layout(block))

mag2 = jax.jit(P.magnitude_squared)(x)
noise = jax.jit(functools.partial(P.noise_floor, window=128))(mag2)
mask, ref = jax.jit(lambda m, nf: P.preamble_detect(m, nf, cfg, cfg.left_halo, cfg.block_size))(mag2, noise)
jax.block_until_ready((mag2, noise, mask, ref))

def bench(name, fn, *args, iters=30):
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    print(f'{name}: {(time.time()-t0)/iters*1e3:.3f} ms', flush=True)
    return o

comp = bench('compact topk', lambda mk: P.compact_detections(mk, cfg.max_detections), mask)
det_idx, valid, n_det, ovf = comp

def compact_scan(mk, K):
    n = mk.shape[0]
    mi = mk.astype(jnp.int32)
    rows = mi.reshape(-1, 128)
    rowsum = rows.sum(axis=1)
    row_off = jnp.cumsum(rowsum) - rowsum
    within = jnp.cumsum(rows, axis=1) - rows
    rank = (row_off[:, None] + within).reshape(n)
    out_pos = jnp.where(mk, jnp.minimum(rank, K), K)
    det = jnp.full((K + 1,), -1, jnp.int32).at[out_pos].set(
        jnp.arange(n, dtype=jnp.int32), mode='drop')[:K]
    # .at[].set with duplicate K index: dropped via [:K]... use min to keep first
    n_det = rowsum.sum()
    return det, det >= 0, n_det, jnp.maximum(n_det - K, 0)

comp2 = bench('compact scan+scatter', lambda mk: compact_scan(mk, cfg.max_detections), mask)
d1 = np.asarray(det_idx); d2 = np.asarray(comp2[0])
print('compaction equal:', bool((d1 == d2).all()), flush=True)

safe = jnp.where(valid, det_idx, 0)
rl = ref[safe]
sl = bench('slice gather', lambda m, di, v, r: P.slice_bits(m, di, v, r, cfg, cfg.left_halo), mag2, det_idx, valid, rl)
bits, conf = sl
bench('crc+ecc', lambda b, c: P.crc_check_and_correct(b, c, cfg), bits, conf)
tb = bench('pack', lambda: P.pack_table(P.demod_block(x, cfg)), iters=10)

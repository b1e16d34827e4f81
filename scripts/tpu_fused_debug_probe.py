"""Isolate the fused sharded resample+demod 0/24 TPU parity failure.

Stages, each parity-checked on the real chip:
  A. _to_planar / _to_interleaved MXU permutes vs numpy transpose
  B. plain XLA demod_block on TPU at 2 Msps (the fused path's demod)
  C. offline polyphase resample (resample_to_rate) on TPU -> demod parity
  D. the fused make_sharded_resample_demod 1x1 step, with table forensics
     (n_detected / status histogram), plus a variant forcing the
     transpose (non-MXU) planar path.
"""
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

DEADLINE = time.time() + float(os.environ.get("PROBE_DEADLINE_S", 2100))
print(jax.devices(), flush=True)

import jax.numpy as jnp
import airmodes
from airmodes.dsp import host
from airmodes.dsp.pipeline import demod_block_jit, iq_to_device_layout
from airmodes.io import sources
from airmodes.testing import encoder
from airmodes.resample import polyphase


def bail(tag):
    if time.time() > DEADLINE:
        print(f"DEADLINE before {tag}", flush=True)
        os._exit(4)


# ---- A. planar permutes ------------------------------------------------------
rng = np.random.default_rng(0)
x2 = rng.standard_normal((100000, 2)).astype(np.float32)
xp = np.asarray(jax.jit(polyphase._to_planar)(x2))
print("A to_planar:", "PASS" if np.allclose(xp, x2.T, atol=1e-6)
      else f"FAIL maxerr {np.abs(xp - x2.T).max()}", flush=True)
yi = np.asarray(jax.jit(polyphase._to_interleaved)(xp))
print("A to_interleaved:", "PASS" if np.allclose(yi, x2, atol=1e-6)
      else f"FAIL maxerr {np.abs(yi - x2).max()}", flush=True)

# ---- B. XLA demod on TPU -----------------------------------------------------
bail("B")
cfg = airmodes.DspConfig(block_size=1 << 20, max_detections=64)
frames = encoder.random_df17_frames(24, seed=55)
iq2, truth2 = encoder.make_capture(
    frames, rate=2e6, snr_db=25.0, spacing=cfg.block_size // 25, seed=55,
    total_samples=cfg.block_size)
want2 = {t.hex for t in truth2}
t0 = time.time()
block, start = next(sources.frame_blocks(iq2, cfg))
tb = demod_block_jit(iq_to_device_layout(block), cfg)
got2 = {m.split()[1] for m in host.table_to_messages(tb, start, 2e6)}
print(f"B xla demod on tpu: {len(got2 & want2)}/{len(want2)} "
      f"(n_det {int(np.asarray(tb.n_detected))}, "
      f"compile+run {time.time()-t0:.0f}s)", flush=True)

# ---- C. offline resample on TPU + demod --------------------------------------
bail("C")
raw_total = cfg.block_size * 3
iq_raw, truth = encoder.make_capture(
    frames, rate=6e6, snr_db=25.0, spacing=raw_total // 25, seed=55,
    total_samples=raw_total)
want = {t.hex for t in truth}
t0 = time.time()
iq_rs = np.asarray(polyphase.resample_to_rate(iq_raw, 6e6, 2e6))
block, start = next(sources.frame_blocks(iq_rs, cfg))
tb = demod_block_jit(iq_to_device_layout(block), cfg)
gotc = {m.split()[1] for m in host.table_to_messages(tb, start, 2e6)}
print(f"C resample(tpu)+demod(tpu): {len(gotc & want)}/{len(want)} "
      f"(n_det {int(np.asarray(tb.n_detected))}, {time.time()-t0:.0f}s)",
      flush=True)

# ---- D. fused step forensics -------------------------------------------------
bail("D")
from airmodes.dist import sharded
mesh = sharded.make_mesh(n_channel=1, n_time=1)
fn = sharded.make_sharded_resample_demod(mesh, cfg, 1, 3)
x = iq_to_device_layout(iq_raw)[None]
table = jax.block_until_ready(fn(sharded.shard_input(x, mesh)))
sub = type(table)(*(np.asarray(f)[0, 0] for f in table))
gotd = {m.split()[1] for m in host.table_to_messages(sub, 0, 2e6)}
idx = np.asarray(sub.index)
st = np.asarray(sub.status)
import collections
hist = collections.Counter(int(s) for i, s in zip(idx, st) if i >= 0)
print(f"D fused: {len(gotd & want)}/{len(want)} n_det "
      f"{int(np.asarray(sub.n_detected))} status_hist {dict(hist)}",
      flush=True)

print("done", flush=True)
os._exit(0)

"""Real-chip validation of the reference's full rate range (VERDICT r3 #3).

1. The production planar kernel at 10 Msps (sps=5): decode parity vs the
   injected truth on-device + a sum-synced device_msps_sps5 figure.
2. One real-chip 1x1 execution of the fused sharded resample+demod
   (6 Msps raw -> 2 Msps, make_sharded_resample_demod): compile + parity
   + per-step timing.

Warms the persistent compile cache so bench.py's r4 additions reuse the
compiled programs. Internal deadline + clean exit (a timeout-kill wedges
the chip claim, CLAUDE.md).
"""
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

DEADLINE = time.time() + float(os.environ.get("PROBE_DEADLINE_S", 2400))
print(jax.devices(), flush=True)

import jax.numpy as jnp
import airmodes
from airmodes.dsp import host
from airmodes.io import sources
from airmodes.testing import encoder
from airmodes.kernels.preamble_pallas import (
    demod_batch_packed_planar_jit, to_planar_i8, planar_length)
from airmodes.dsp.pipeline import unpack_table


def bail(tag):
    if time.time() > DEADLINE:
        print(f"DEADLINE before {tag}", flush=True)
        os._exit(4)


# ---- 1. planar kernel at 10 Msps --------------------------------------------
cfg5 = airmodes.DspConfig(channel_rate=10e6, block_size=1 << 22,
                          max_detections=256)
C = 4
P = planar_length(cfg5)
xi = np.zeros((C, P), np.int8)
xq = np.zeros((C, P), np.int8)
want = set()
for k in range(C):
    frames = encoder.random_df17_frames(42, seed=100 + k)
    iq, truth = encoder.make_capture(
        frames, rate=10e6, snr_db=15.0, spacing=cfg5.block_size // 43,
        seed=100 + k, total_samples=cfg5.block_size)
    want |= {t.hex for t in truth}
    block, _ = next(sources.frame_blocks(iq, cfg5))
    x2 = np.stack([block.real, block.imag], -1)
    peak = float(np.abs(x2).max()) or 1.0
    b8 = np.clip(np.round(x2 / peak * 120), -127, 127).astype(np.int8)
    pi, pq = to_planar_i8(b8, cfg5)
    xi[k], xq[k] = pi[0], pq[0]

bail("sps5 compile")
t0 = time.time()
arr = np.asarray(demod_batch_packed_planar_jit(xi, xq, cfg5))
print(f"sps5 compile+run: {time.time()-t0:.1f}s", flush=True)
got = set()
for k in range(C):
    for m in host.table_to_messages(unpack_table(arr[k]),
                                    k * cfg5.block_size, 10e6):
        got.add(m.split()[1])
missing = want - got
print(f"sps5 parity: {len(got & want)}/{len(want)} decoded, "
      f"missing {len(missing)}, spurious {len(got - want)}", flush=True)

# sum-synced device loop (device-resident input, 4-byte fetch per call)
bail("sps5 timing")
reps = 8
di = jax.device_put(np.tile(xi, (reps, 1)))
dq = jax.device_put(np.tile(xq, (reps, 1)))
sum_step = jax.jit(lambda a, b: (lambda t: (t, jnp.sum(t)))(
    demod_batch_packed_planar_jit(a, b, cfg5)))
np.asarray(sum_step(di, dq)[1])
rates = []
for _ in range(5):
    t0 = time.time()
    inflight = []
    for i in range(8):
        inflight.append(sum_step(di, dq)[1])
        if len(inflight) > 1:
            np.asarray(inflight.pop(0))
    for o in inflight:
        np.asarray(o)
    rates.append(8 * reps * C * cfg5.block_size / (time.time() - t0) / 1e6)
rates.sort()
print(f"device_msps_sps5: median {rates[2]:.0f} "
      f"(runs {' '.join(f'{r:.0f}' for r in rates)})", flush=True)

# ---- 2. fused sharded resample+demod, 1x1, real chip ------------------------
bail("fused resample")
from airmodes.dist import sharded
from airmodes.dsp.pipeline import iq_to_device_layout

cfgr = airmodes.DspConfig(channel_rate=4e6, block_size=1 << 20,
                          max_detections=64)
p_up, q_dn = 2, 3    # 6 Msps capture -> 4 Msps channel (the robust sps=2
#                      operating point: decimating to 1 sps drops frames
#                      at 1-of-q sub-chip phases — see bench_sharded_resample)
raw_total = cfgr.block_size * q_dn // p_up
frames = encoder.random_df17_frames(24, seed=55)
iq_raw, truth_r = encoder.make_capture(
    frames, rate=6e6, snr_db=25.0, spacing=raw_total // 25, seed=55,
    total_samples=raw_total)
mesh = sharded.make_mesh(n_channel=1, n_time=1)
fn = sharded.make_sharded_resample_demod(mesh, cfgr, p_up, q_dn)
x = iq_to_device_layout(iq_raw)[None]
t0 = time.time()
table = jax.block_until_ready(fn(sharded.shard_input(x, mesh)))
print(f"fused resample+demod compile+run: {time.time()-t0:.1f}s", flush=True)
sub = type(table)(*(np.asarray(f)[0, 0] for f in table))
got_r = {m.split()[1]
         for m in host.table_to_messages(sub, 0, cfgr.channel_rate)}
want_r = {t.hex for t in truth_r}
print(f"fused parity: {len(got_r & want_r)}/{len(want_r)} decoded, "
      f"missing {len(want_r - got_r)}", flush=True)

bail("fused timing")
from airmodes.dsp.pipeline import pack_table as _pt
_pack2 = jax.vmap(jax.vmap(_pt))
sum_fn = jax.jit(lambda a: jnp.sum(_pack2(fn(a))))
dx = jax.device_put(x)
np.asarray(sum_fn(dx))
t0 = time.time()
for _ in range(4):
    np.asarray(sum_fn(dx))
dt = (time.time() - t0) / 4
print(f"fused step: {dt*1e3:.1f} ms/step = "
      f"{cfgr.block_size/dt/1e6:.0f} Msps (channel-rate samples), "
      f"{raw_total/dt/1e6:.0f} Msps raw", flush=True)
print("done", flush=True)
os._exit(0)

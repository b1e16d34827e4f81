"""Fused resample+demod 0/24 on TPU — stage isolation, single process.

D1: the fused math WITHOUT shard_map (pad -> to_planar -> group matmul
    resample -> to_interleaved -> zero halos -> demod_block) on TPU,
    with the resampled stream compared against a NUMPY group-matmul
    reference, then decoded.
D2: make_sharded_demod (shard_map, no resample) on the host-resampled
    stream on TPU.
D3: the full fused make_sharded_resample_demod, with table forensics.
"""
import os
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
from airmodes.testing import encoder
from airmodes.resample import polyphase

cfg = airmodes.DspConfig(block_size=1 << 20, max_detections=64)
p_up, q_dn = 1, 3
gi = 128 * q_dn
raw_total = cfg.block_size * q_dn
frames = encoder.random_df17_frames(24, seed=55)
iq_raw, truth = encoder.make_capture(
    frames, rate=6e6, snr_db=25.0, spacing=raw_total // 25, seed=55,
    total_samples=raw_total)
want = {t.hex for t in truth}
x = iq_to_device_layout(iq_raw)          # (raw_total, 2) f32

# numpy reference of the group-matmul resample with zero edge halos
mats = polyphase._group_matrices(p_up, q_dn, 12)
xc_np = np.pad(x.T, ((0, 0), (gi, gi)))  # (2, gi + raw + gi)
ng = raw_total // gi
xg = xc_np.reshape(2, ng + 2, gi)
y_np = (xg[:, 0:ng].reshape(2 * ng, gi) @ mats[0]
        + xg[:, 1:ng + 1].reshape(2 * ng, gi) @ mats[1]
        + xg[:, 2:ng + 2].reshape(2 * ng, gi) @ mats[2])
y_np = y_np.reshape(2, cfg.block_size)   # planar resampled (2, block)


def bail(tag):
    if time.time() > DEADLINE:
        print(f"DEADLINE before {tag}", flush=True)
        os._exit(4)


# ---- D1: fused math, no shard_map -------------------------------------------
@jax.jit
def fused_noshard(x2):
    padded = jnp.pad(x2[None], ((0, 0), (gi, gi), (0, 0)))
    xc = jax.vmap(polyphase._to_planar)(padded).reshape(2, -1)
    yc = polyphase.resample_groups_halo(xc, p_up, q_dn, 12)
    y = jax.vmap(polyphase._to_interleaved)(yc.reshape(1, 2, -1))[0]
    return y                               # (block, 2)


y_tpu = np.asarray(fused_noshard(x))
err = np.abs(y_tpu.T - y_np).max()
scale = np.abs(y_np).max()
print(f"D1 resample vs numpy: maxerr {err:.3e} (scale {scale:.3e})",
      flush=True)

yb = np.zeros((cfg.left_halo + cfg.block_size + cfg.right_halo, 2),
              np.float32)
yb[cfg.left_halo: cfg.left_halo + cfg.block_size] = y_tpu
tb = demod_block_jit(yb, cfg)
got1 = {m.split()[1] for m in host.table_to_messages(tb, 0, 2e6)}
print(f"D1 decode: {len(got1 & want)}/{len(want)} "
      f"(n_det {int(np.asarray(tb.n_detected))})", flush=True)

# also decode the NUMPY-resampled stream as a control
yb2 = yb.copy()
yb2[cfg.left_halo: cfg.left_halo + cfg.block_size] = y_np.T
tb2 = demod_block_jit(yb2, cfg)
got1n = {m.split()[1] for m in host.table_to_messages(tb2, 0, 2e6)}
print(f"D1 control (numpy resample) decode: {len(got1n & want)}/{len(want)}",
      flush=True)

# ---- D2: shard_map demod (no resample) on the resampled stream --------------
bail("D2")
from airmodes.dist import sharded
mesh = sharded.make_mesh(n_channel=1, n_time=1)
fn2 = sharded.make_sharded_demod(mesh, cfg)
t2 = jax.block_until_ready(fn2(sharded.shard_input(y_np.T[None].copy(), mesh)))
sub2 = type(t2)(*(np.asarray(f)[0, 0] for f in t2))
got2 = {m.split()[1] for m in host.table_to_messages(sub2, 0, 2e6)}
print(f"D2 shard_map demod: {len(got2 & want)}/{len(want)} "
      f"(n_det {int(np.asarray(sub2.n_detected))})", flush=True)

# ---- D3: full fused, forensics ----------------------------------------------
bail("D3")
fn3 = sharded.make_sharded_resample_demod(mesh, cfg, p_up, q_dn)
t3 = jax.block_until_ready(fn3(sharded.shard_input(x[None].copy(), mesh)))
sub3 = type(t3)(*(np.asarray(f)[0, 0] for f in t3))
got3 = {m.split()[1] for m in host.table_to_messages(sub3, 0, 2e6)}
idx = np.asarray(sub3.index)
st = np.asarray(sub3.status)
import collections
hist = collections.Counter(int(s) for i, s in zip(idx, st) if i >= 0)
print(f"D3 fused: {len(got3 & want)}/{len(want)} "
      f"n_det {int(np.asarray(sub3.n_detected))} "
      f"status_hist {dict(hist)}", flush=True)
print("done", flush=True)
os._exit(0)

"""Fetch-synced split of the fast batched path + batch scaling."""
import functools
import time

T_START = time.time()
DEADLINE = 420.0  # exit cleanly well before any external timeout


def out_of_time():
    if time.time() - T_START > DEADLINE:
        print("deadline reached; exiting cleanly", flush=True)
        return True
    return False

import jax
import jax.numpy as jnp
import numpy as np

import airmodes
from airmodes.dsp import pipeline as P
from airmodes.kernels import preamble_pallas as K

cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
n = cfg.left_halo + cfg.block_size + cfg.right_halo
rng = np.random.default_rng(0)
C = 8
iq = (rng.standard_normal((C, n, 2)) * 6.0).astype(np.int8)
dev = jax.device_put(iq)
jax.block_until_ready(dev)


def case(name, fn, *args, iters=5):
    t0 = time.time()
    np.asarray(fn(*args))
    comp = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:36s} {med*1e3:8.1f} ms/call (compile {comp:.0f}s, "
          f"min {min(ts)*1e3:.1f})", flush=True)


@jax.jit
def det_compact(x):
    mask, ref = K.preamble_detect_pallas_2d_batch(x, cfg)

    def cc(m):
        det_idx, valid, n_det, ovf = P.compact_detections(
            m.astype(bool), cfg.max_detections)
        return det_idx
    return jax.vmap(cc)(mask)




@jax.jit
def det_gather(x):
    mask, ref = K.preamble_detect_pallas_2d_batch(x, cfg)

    def cc(iq_c, m, r):
        det_idx, valid, n_det, ovf = P.compact_detections(
            m.astype(bool), cfg.max_detections)
        sps = cfg.sps
        W = cfg.noise_window + 242 * sps
        safe_idx = jnp.where(valid, det_idx, 0)
        start = cfg.left_halo + safe_idx - cfg.noise_window
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(iq_c, (s, 0), (W, 2)))(start)
        return jnp.sum(win.astype(jnp.float32))
    return jax.vmap(cc)(x, mask, ref)

if not out_of_time():
    case("detect2d + compact + gather", det_gather, dev)

stepb = functools.partial(K.demod_batch_packed_fast_jit, cfg=cfg)
if not out_of_time():
    case("FULL fast batch C=8", stepb, dev)

for C2 in (16, 32):
    if out_of_time():
        break
    iq2 = (rng.standard_normal((C2, n, 2)) * 6.0).astype(np.int8)
    dev2 = jax.device_put(iq2)
    jax.block_until_ready(dev2)
    t0 = time.time()
    np.asarray(stepb(dev2))
    comp = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(stepb(dev2))
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    msps = C2 * cfg.block_size / med / 1e6
    print(f"FULL fast batch C={C2:3d} {med*1e3:8.1f} ms/call {msps:8.0f} Msps "
          f"(compile {comp:.0f}s)", flush=True)

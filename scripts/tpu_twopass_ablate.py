"""Ablation: what would a two-pass detect buy?

The planar detect kernel is VPU-compute-bound (~85 ops/sample). A two-pass
design would keep only the CHEAP candidate mask dense (magnitude, window
sum, 4-pulse threshold/tolerance, local peak — the pmin test alone has a
~3e-6 noise pass rate at 5 dB) and move the quiet-chip folds + NMS to the
K-sized tail. This probe measures the ceiling of that idea by timing the
production path with the detect body progressively stripped:

  full      — production body (quiet folds + NMS)
  no_nms    — quiet folds kept, NMS window-max dropped
  cheap     — pulse tests only (what pass 1 of a two-pass design costs)

Timing-only for the stripped variants (they over-detect slightly; the
bench capture's decode gate still holds because pmin is selective).

RESULT (TPU v5 lite, C_dev=256, fetch-synced):
  full 9.10 Gsps | no_nms 9.03 | cheap (pulse tests only) 9.79
Removing the quiet folds AND the NMS window-max buys only ~8%: the
kernel's cost is dominated by the irreducible part (int8 read + power +
window sums + pulse tests). A two-pass detect would cap at ~+8% for
substantial complexity and bit-exactness risk — NOT worth building.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, "/root/repo")
import airmodes  # noqa: E402
from airmodes.constants import (  # noqa: E402
    PREAMBLE_PULSE_CHIPS, PREAMBLE_QUIET_CHIPS)
from airmodes.kernels import preamble_pallas as K  # noqa: E402
from bench import build_capture  # noqa: E402

DEADLINE = time.time() + 1800


def make_body(mode: str):
    orig = K._detect_keep_2d

    def body(xi, xq, *, cfg, tile):
        if mode == "full":
            return orig(xi, xq, cfg=cfg, tile=tile)
        sps = cfg.sps
        half = cfg.nms_chips * sps
        trows = tile // 128
        m = xi * xi + xq * xq
        if cfg.mxu_window_sum:
            t_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            c_i = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            a_up = (t_i >= c_i).astype(jnp.float32)
            a_lo = (t_i < c_i).astype(jnp.float32)
            nr = m.shape[0] - 1
            hi = jax.lax.Precision.HIGHEST
            ws = (jax.lax.dot(m[:nr], a_up, precision=hi) +
                  jax.lax.dot(m[1:nr + 1], a_lo, precision=hi))
        else:
            ws = m
            for s in (1, 2, 4, 8, 16, 32, 64):
                nr = ws.shape[0] - 1
                ws = ws[:nr] + K._shift2d(ws, s, 0, nr)
        nrows = trows + 2 + K._wmax_levels(half)
        pulses = [K._shift2d(m, c * sps, 1, nrows)
                  for c in PREAMBLE_PULSE_CHIPS]
        ref = (pulses[0] + pulses[1] + pulses[2] + pulses[3]) * 0.25
        nf = ws[0:nrows] * (1.0 / 128.0)
        ok = pulses[0] >= K._shift2d(m, -1, 1, nrows)
        ok &= pulses[0] > K._shift2d(m, 1, 1, nrows)
        pmin = jnp.minimum(jnp.minimum(pulses[0], pulses[1]),
                           jnp.minimum(pulses[2], pulses[3]))
        ok &= (pmin > nf * jnp.float32(cfg.threshold)) & \
              (pmin > ref * jnp.float32(cfg.pulse_tolerance))
        if mode == "no_nms":
            qtol = jnp.float32(cfg.quiet_tolerance)
            nq2 = m.shape[0] - 1
            q2 = jnp.maximum(m[:nq2], K._shift2d(m, sps, 0, nq2))
            nq4 = nq2 - 1
            q4 = jnp.maximum(q2[:nq4], K._shift2d(q2, 2 * sps, 0, nq4))
            quiet = jnp.maximum(K._shift2d(m, 1 * sps, 1, nrows),
                                K._shift2d(q4, 3 * sps, 1, nrows))
            quiet = jnp.maximum(quiet, K._shift2d(m, 8 * sps, 1, nrows))
            quiet = jnp.maximum(quiet, K._shift2d(q4, 10 * sps, 1, nrows))
            quiet = jnp.maximum(quiet, K._shift2d(q2, 14 * sps, 1, nrows))
            ok &= quiet < ref * qtol
        return ok[1: 1 + trows], ref[1: 1 + trows]

    return body


def main():
    print("devices:", jax.devices(), flush=True)
    cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
    C, reps = 16, 16
    xi, xq, truth = build_capture(cfg, C)
    want = {t.hex for t in truth}
    di = jax.device_put(np.tile(xi, (reps, 1)))
    dq = jax.device_put(np.tile(xq, (reps, 1)))
    jax.block_until_ready((di, dq))
    results = {}
    orig = K._detect_keep_2d
    for mode in ("full", "cheap", "no_nms"):
        if time.time() > DEADLINE:
            print("deadline; stopping", flush=True)
            break
        K._detect_keep_2d = make_body(mode)
        try:
            t0 = time.time()
            arr = np.asarray(K.demod_batch_packed_planar_jit(di, dq, cfg))
            compile_s = time.time() - t0
            from airmodes.dsp import host
            from airmodes.dsp.pipeline import unpack_table
            msgs = []
            for i in range(C):
                t = unpack_table(arr[i])
                msgs.extend(host.table_to_messages(
                    t, i * cfg.block_size, cfg.channel_rate))
            got = {m.split()[1] for m in msgs}
            missing = len(want - got)
            iters = 8
            t0 = time.time()
            inflight = []
            for _ in range(iters):
                inflight.append(K.demod_batch_packed_planar_jit(di, dq, cfg))
                if len(inflight) > 1:
                    np.asarray(inflight.pop(0))
            for o in inflight:
                np.asarray(o)
            dt = time.time() - t0
            gsps = iters * reps * C * cfg.block_size / dt / 1e9
            results[mode] = gsps
            print(f"{mode}: {gsps:.2f} Gsps (compile {compile_s:.0f}s, "
                  f"missing {missing}/{len(want)})", flush=True)
        finally:
            K._detect_keep_2d = orig
        # distinct cache keys per mode: clear jit caches between modes
        K.demod_batch_packed_planar_jit.clear_cache()
    print("RESULTS", results, flush=True)


if __name__ == "__main__":
    main()

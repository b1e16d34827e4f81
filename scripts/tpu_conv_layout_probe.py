"""Which conv dimension layout avoids the TPU padding blowup for the
resampler's 1D dilated conv? Variants at N=8M and p/q=5/6, t=12:
  a: lhs (nc, 1, N)  NCW, batch=nc              (current — 128x pad on I=1)
  b: lhs (1, nc, N)  NCW, feature_group_count=nc
  c: lhs (1, N, nc)  NWC, feature_group_count=nc
  d: chunked batch: (nc*B, 1, W) NCW, B=64 overlapped chunks
"""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
from airmodes.resample.polyphase import design_lowpass

DEADLINE = time.time() + 1400
print(jax.devices(), flush=True)

N = 1 << 23
P, Q, T = 5, 6, 12
rng = np.random.default_rng(0)
x2 = jax.device_put(rng.standard_normal((N, 2)).astype(np.float32))
jax.block_until_ready(x2)
h = design_lowpass(P * T, cutoff=1.0 / max(P, Q)) * P
PL = T * P - 1 - (T // 2) * P
HI = jax.lax.Precision.HIGHEST
n_out = N * P // Q


@jax.jit
def conv_a(x):
    lhs = x.T[:, None, :]
    rhs = jnp.asarray(h[::-1].copy())[None, None, :]
    v = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(Q,), padding=[(PL, T * P)],
        lhs_dilation=(P,), precision=HI)
    return v[:, 0, :n_out].T


@jax.jit
def conv_b(x):
    lhs = x.T[None, :, :]                      # (1, nc, N)
    rhs = jnp.tile(jnp.asarray(h[::-1].copy())[None, None, :], (2, 1, 1))
    v = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(Q,), padding=[(PL, T * P)],
        lhs_dilation=(P,), feature_group_count=2, precision=HI)
    return v[0, :, :n_out].T


@jax.jit
def conv_c(x):
    lhs = x[None, :, :]                        # (1, N, nc)
    rhs = jnp.asarray(h[::-1].copy())[:, None, None] * jnp.eye(2)[None]
    v = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(Q,), padding=[(PL, T * P)],
        lhs_dilation=(P,),
        dimension_numbers=("NWC", "WIO", "NWC"), precision=HI)
    return v[0, :n_out, :]


def timeit(name, fn):
    if time.time() > DEADLINE:
        print(f"{name} SKIPPED", flush=True)
        return None
    t0 = time.time()
    try:
        out = np.asarray(fn(x2))
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None
    comp = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(fn(x2))
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{name} compile+1st={comp:6.1f}s best={best*1e3:8.2f} ms -> "
          f"{N/best/1e9:5.2f} Gsps-in", flush=True)
    return out


ya = timeit("a", conv_a)
yb = timeit("b", conv_b)
yc = timeit("c", conv_c)
for nm, y in (("b", yb), ("c", yc)):
    if ya is not None and y is not None:
        print(f"{nm} vs a: max|diff| = {np.max(np.abs(y - ya)):.2e}",
              flush=True)
print("done", flush=True)

"""Primitive speed checks for a 2D-layout XLA resampler, N=32M f32:
  rowstride : x2d[j::q] row-strided slice (+ trivial fma), q=6
  permmm    : x2d @ P (128x128 f32 permutation, HIGHEST)
  slice1d   : 1D contiguous slice at odd offset + fma, 12 terms
  shift2d   : lane roll + select + fma on (rows, 128), 12 terms
"""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp

DEADLINE = time.time() + 1400
print(jax.devices(), flush=True)

N = 1 << 25
Q = 6
rng = np.random.default_rng(0)
x2d = jax.device_put(
    rng.standard_normal((N // 128, 128)).astype(np.float32))
x1d = jax.device_put(rng.standard_normal(N).astype(np.float32))
jax.block_until_ready((x2d, x1d))
HI = jax.lax.Precision.HIGHEST
perm = np.zeros((128, 128), np.float32)
perm[np.arange(128), (np.arange(128) * 7) % 128] = 1.0


@jax.jit
def rowstride(x):
    acc = 0.0
    for j in range(Q):
        s = x[j::Q]
        acc = acc + jnp.float32(0.1 * j + 0.3) * s[: (N // 128) // Q - 1]
    return jnp.sum(acc[::511])


@jax.jit
def permmm(x):
    p = jnp.asarray(perm)
    y = jnp.matmul(x, p, precision=HI)
    return jnp.sum(y[::511])


@jax.jit
def slice1d(x):
    acc = jnp.zeros((N - 4096,), jnp.float32)
    for k in range(12):
        acc = acc + jnp.float32(0.1 * k + 0.2) * jax.lax.slice_in_dim(
            x, 37 + k, 37 + k + N - 4096)
    return jnp.sum(acc[::8191])


@jax.jit
def shift2d(x):
    rows = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows - 1, 128), 1)
    acc = jnp.zeros((rows - 1, 128), jnp.float32)
    for k in range(12):
        kk = (k * 5 + 1) % 128
        z = jnp.roll(x, -kk, axis=1)
        y = jnp.where(lane < 128 - kk, z[: rows - 1], z[1: rows])
        acc = acc + jnp.float32(0.1 * k + 0.2) * y
    return jnp.sum(acc[::511])


def timeit(name, fn, x):
    if time.time() > DEADLINE:
        print(f"{name} SKIPPED", flush=True)
        return
    t0 = time.time()
    try:
        np.asarray(fn(x))
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return
    comp = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(fn(x))
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{name:9s} compile+1st={comp:6.1f}s best={best*1e3:8.2f} ms -> "
          f"{N/best/1e9:6.2f} Gsps-in", flush=True)


timeit("rowstride", rowstride, x2d)
timeit("permmm", permmm, x2d)
timeit("slice1d", slice1d, x1d)
timeit("shift2d", shift2d, x2d)
print("done", flush=True)

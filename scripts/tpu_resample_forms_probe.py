"""Resampler formulations on TPU, N=8M per channel, p/q=5/6, t=12:
  v1: 1D planar strided slices  (p*t strided slices + fma per channel)
  v2: transpose form — xp.reshape(M, q).T once, then every (phase, tap)
      term is a CONTIGUOUS row slice + fma
Both compared numerically against the numpy oracle interior.
"""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import jax.numpy as jnp
from airmodes.resample.polyphase import _polyphase_bank

DEADLINE = time.time() + 1400
print(jax.devices(), flush=True)

N = 1 << 23
P, Q, T = 5, 6, 12
rng = np.random.default_rng(0)
x1 = jax.device_put(rng.standard_normal(N).astype(np.float32))
jax.block_until_ready(x1)
n_out = N * P // Q
m_rows = -(-n_out // P)
bank = _polyphase_bank(P, Q, T)
base0 = [(r * Q) // P + (T // 2) for r in range(P)]
phase = [(r * Q) % P for r in range(P)]
LPAD = T
# enough right pad for both forms
RPAD = max(base0) + m_rows * Q + Q


@jax.jit
def v1(x):
    xp = jnp.concatenate([jnp.zeros(LPAD, jnp.float32), x,
                          jnp.zeros(RPAD, jnp.float32)])
    rows = []
    for r in range(P):
        acc = jnp.zeros((m_rows,), jnp.float32)
        h = bank[phase[r]]
        for k in range(T):
            s = LPAD + base0[r] - k
            col = jax.lax.slice(xp, (s,), (s + (m_rows - 1) * Q + 1,), (Q,))
            acc = acc + jnp.float32(h[k]) * col
        rows.append(acc)
    return jnp.stack(rows, axis=1).reshape(m_rows * P)[:n_out]


@jax.jit
def v2(x):
    xp = jnp.concatenate([jnp.zeros(LPAD, jnp.float32), x,
                          jnp.zeros(RPAD, jnp.float32)])
    mq = (xp.shape[0] // Q) * Q
    xt = xp[:mq].reshape(-1, Q).T            # (Q, M') one relayout
    rows = []
    for r in range(P):
        acc = jnp.zeros((m_rows,), jnp.float32)
        h = bank[phase[r]]
        for k in range(T):
            o = LPAD + base0[r] - k
            col = jax.lax.slice(xt, (o % Q, o // Q),
                                (o % Q + 1, o // Q + m_rows))[0]
            acc = acc + jnp.float32(h[k]) * col
        rows.append(acc)
    return jnp.stack(rows, axis=1).reshape(m_rows * P)[:n_out]


def oracle(x, p, q, t, n):
    b = _polyphase_bank(p, q, t)
    y = np.zeros(n, np.float64)
    xi = np.asarray(x, np.float64)
    for j in range(n):
        bb = (j * q) // p + t // 2
        ph = (j * q) % p
        for k in range(t):
            i = bb - k
            if 0 <= i < len(xi):
                y[j] += b[ph, k] * xi[i]
    return y


def timeit(name, fn):
    if time.time() > DEADLINE:
        print(f"{name} SKIPPED", flush=True)
        return None
    t0 = time.time()
    try:
        out = np.asarray(fn(x1))
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)
        return None
    comp = time.time() - t0
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(fn(x1))
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{name} compile+1st={comp:6.1f}s best={best*1e3:8.2f} ms -> "
          f"{N/best/1e9:5.3f} Gsps-in", flush=True)
    return out


want = oracle(np.asarray(x1)[:40000], P, Q, T, 30000)
for name, fn in (("v1", v1), ("v2", v2)):
    y = timeit(name, fn)
    if y is not None:
        err = np.max(np.abs(y[T:30000] - want[T:30000]))
        print(f"{name} interior max err = {err:.2e} "
              f"{'OK' if err < 1e-4 else 'FAIL'}", flush=True)
print("done", flush=True)

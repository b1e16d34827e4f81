"""Resampler on TPU: dilated-conv path — correctness vs the numpy oracle
(small N) and throughput (64M-sample (N, 2) float32 stream)."""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
from airmodes.resample.polyphase import (_polyphase_bank, resample,
    resample_planar)

DEADLINE = time.time() + 1200
print(jax.devices(), flush=True)


def oracle(x2, p, q, t):
    n_in = x2.shape[0]
    n_out = (n_in * p) // q
    bank = _polyphase_bank(p, q, t)
    y = np.zeros((n_out, x2.shape[1]), np.float64)
    for n in range(n_out):
        b = (n * q) // p + t // 2
        ph = (n * q) % p
        for k in range(t):
            i = b - k
            if 0 <= i < n_in:
                y[n] += bank[ph, k] * x2[i].astype(np.float64)
    return y


rng = np.random.default_rng(0)
small = rng.standard_normal((1 << 14, 2)).astype(np.float32)
for (p, q) in ((5, 6), (1, 4), (2, 5)):
    y = np.asarray(resample(jax.device_put(small), p, q))
    want = oracle(small, p, q, 12)
    t = 12
    sl = slice(t, -t if len(y) > 2 * t else None)
    err = np.max(np.abs(y[sl] - want[: len(y)][sl]))
    print(f"p/q={p}/{q} interior max err = {err:.2e} "
          f"{'OK' if err < 1e-4 else 'FAIL'}", flush=True)

N = 1 << 26
x = jax.device_put(rng.standard_normal((2, N)).astype(np.float32))
jax.block_until_ready(x)
for (p, q) in ((5, 6), (1, 4)):
    if time.time() > DEADLINE:
        break
    t0 = time.time()
    np.asarray(resample_planar(x, p, q))[:, :4]
    comp = time.time() - t0
    ts = []
    for _ in range(5):
        if time.time() > DEADLINE:
            break
        t0 = time.time()
        np.asarray(resample_planar(x, p, q)[:, ::65537])
        ts.append(time.time() - t0)
    if ts:
        best = min(ts)
        print(f"p/q={p}/{q} compile+1st={comp:6.1f}s best={best*1e3:7.2f} ms"
              f" -> {N/best/1e9:5.2f} Gsps-in", flush=True)
print("done", flush=True)

"""Raw HBM bandwidth probes: what does this chip actually sustain?

Measures (fetch-synced, big arrays so relay overhead is amortized):
  - XLA elementwise copy (y = x + 1) over 1 GB f32
  - XLA reduction (sum) over 1 GB f32 (read-only)
  - Pallas copy kernel, VMEM BlockSpec pipelined blocks
  - Pallas read+tiny-write kernel (manual DMA, like the detect skeleton)
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEADLINE = time.time() + 1400
print(jax.devices(), flush=True)

ROWS, LANES = 1 << 21, 128          # 2^21 x 128 f32 = 1 GiB
x = jax.device_put(
    np.random.default_rng(0).standard_normal((ROWS, LANES)).astype(np.float32))
np.asarray(jax.jit(lambda v: v[0, 0])(x))
GB = ROWS * LANES * 4 / 1e9


def timeit(name, fn, bytes_moved, iters=5):
    if time.time() > DEADLINE:
        print(f"{name:28s} SKIPPED", flush=True)
        return
    t0 = time.time()
    np.asarray(jax.tree_util.tree_leaves(fn(x))[0])
    comp = time.time() - t0
    ts = []
    for _ in range(iters):
        t0 = time.time()
        out = fn(x)
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)
        ts.append(time.time() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:28s} {med*1e3:8.1f} ms  {bytes_moved/med/1e9:7.1f} GB/s"
          f"  (compile {comp:.0f}s)", flush=True)


@jax.jit
def xla_copy(v):
    return (v + 1.0)[::65536, ::67]          # force full compute, tiny fetch


@jax.jit
def xla_sum(v):
    return jnp.sum(v)


TROWS = 1024


def copy_kernel(in_ref, out_ref):
    out_ref[:] = in_ref[:] + 1.0


@jax.jit
def pallas_copy(v):
    y = pl.pallas_call(
        copy_kernel,
        grid=(ROWS // TROWS,),
        in_specs=[pl.BlockSpec((TROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.float32),
    )(v)
    return y[::65536, ::67]


WROWS = 144  # ~ the detect kernel's DMA window (146 rows ~ 150 KB)


def dma_kernel(hbm, out_ref, win, sem):
    i = pl.program_id(0)
    d = pltpu.make_async_copy(hbm.at[pl.ds(i * WROWS, WROWS), :], win, sem)
    d.start()
    d.wait()
    out_ref[:] = jnp.sum(win[:], axis=0, keepdims=True) * jnp.ones(
        (8, LANES), jnp.float32)


@jax.jit
def pallas_dma_read(v):
    steps = ROWS // WROWS
    y = pl.pallas_call(
        dma_kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((8, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * 8, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((WROWS, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )(v)
    return y[::997, ::67]


def dma2_kernel(hbm, out_ref, win, sems):
    """Double-buffered variant of dma_kernel."""
    i = pl.program_id(0)
    steps = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)

    def dma(s, step):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(step * WROWS, WROWS), :], win.at[s], sems.at[s])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < steps)
    def _():
        dma(1 - slot, i + 1).start()

    dma(slot, i).wait()
    out_ref[:] = jnp.sum(win[slot], axis=0, keepdims=True) * jnp.ones(
        (8, LANES), jnp.float32)


@jax.jit
def pallas_dma2_read(v):
    steps = ROWS // WROWS
    y = pl.pallas_call(
        dma2_kernel,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((8, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps * 8, LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, WROWS, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(v)
    return y[::997, ::67]


timeit("xla copy (R+W)", xla_copy, 2 * GB * 1e9)
timeit("xla sum (R)", xla_sum, GB * 1e9)
timeit("pallas blockspec copy (R+W)", pallas_copy, 2 * GB * 1e9)
timeit("pallas manual DMA read (R)", pallas_dma_read, GB * 1e9)
timeit("pallas dbl-buf DMA read (R)", pallas_dma2_read, GB * 1e9)
print("done", flush=True)

"""Benchmark: sustained demod throughput (Msamples/s per chip).

Runs the full demod pipeline (magnitude -> noise floor -> preamble detect ->
slice -> CRC/ECC -> detection table) over a synthetic 2 Msps capture
containing real Mode S traffic. Two figures:

- primary `value`: per-chip demod throughput with device-resident input
  blocks, fetch-synced via a 4-byte device-side reduction of the packed
  table per call (the table remains a program output; only fixed RPC
  cost rides the relay, so the figure tracks kernel capability instead
  of relay bulk-rate mood — see device_msps_tablefetch for the r1/r2
  full-fetch methodology).
- `streaming_incl_relay_msps`: the same loop but shipping each int8 batch
  host->device first. In this dev harness the TPU sits behind a zero-egress
  loopback relay (~6 ms fixed + 30-400 MB/s, high run-to-run variance),
  which caps this figure far below what PCIe-attached hosts see.

Baseline: the reference (gr-air-modes) sustains real-time on a desktop CPU
at its highest supported channel rate, 10 Msps (BASELINE.md — no published
numbers; design throughput 2-10 Msamples/s). vs_baseline = value / 10.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# Optional internal deadline (seconds): exits 4 CLEANLY instead of being
# timeout-killed — a SIGKILLed TPU process wedges the chip claim for
# minutes (CLAUDE.md). Uncached kernel compiles can legitimately take
# 10-20 min, so default generous.
_deadline = float(os.environ.get("BENCH_DEADLINE_S", "0") or 0)
if _deadline > 0:
    import threading

    def _bench_die():
        print(f"# BENCH_DEADLINE_S={_deadline:.0f} hit; exiting cleanly",
              file=sys.stderr, flush=True)
        os._exit(4)

    _t = threading.Timer(_deadline, _bench_die)
    _t.daemon = True
    _t.start()


def build_capture(cfg, n_blocks: int, msg_rate_hz: float = 100.0, seed: int = 0):
    """Synthetic capture with a realistic message density (~100 msg/s).

    MIXED traffic (VERDICT r4 #3): ~60% DF17 plus DF0/4/5/11/16/20/21/24,
    so the 56-bit length dispatch, DF11 II acceptance, and AP-overlay
    recovery run under bench/real-chip conditions every round (the
    reference's de-facto integration test was mixed live traffic,
    SURVEY §4). Blocks ship as PLANAR int8 I and Q streams — the SDR's
    native quantization (4x less host->device traffic than float32) in
    the layout the traffic-minimal kernel DMAs directly; the device
    rescales.
    """
    from airmodes.testing import encoder
    from airmodes.io import sources
    from airmodes.dsp.pipeline import iq_to_device_layout
    from airmodes.kernels.preamble_pallas import planar_length

    total = n_blocks * cfg.block_size
    duration_s = total / cfg.channel_rate
    n_msgs = max(int(duration_s * msg_rate_hz), 8)
    frames = encoder.random_mixed_frames(n_msgs, seed=seed)
    spacing = total // n_msgs
    iq, truth = encoder.make_capture(
        frames, rate=cfg.channel_rate, snr_db=15.0, spacing=spacing,
        seed=seed, total_samples=total)
    peak = float(np.max(np.abs(iq))) or 1.0
    scale = 120.0 / peak
    p = planar_length(cfg)
    xi = np.zeros((n_blocks, p), np.int8)
    xq = np.zeros((n_blocks, p), np.int8)
    for k, (b, _) in enumerate(sources.frame_blocks(iq, cfg)):
        f = iq_to_device_layout(b)
        n = f.shape[0]
        xi[k, :n] = np.clip(np.round(f[:, 0] * scale), -127, 127)
        xq[k, :n] = np.clip(np.round(f[:, 1] * scale), -127, 127)
    return xi, xq, truth


def pick_step(cfg, xi, xq):
    """Fastest available batched packed step, with fallbacks.

    Returns (name, step) where step takes the planar (C, P) int8 pair."""
    import jax
    from airmodes.dsp.pipeline import demod_block, pack_table
    import functools

    candidates = []
    try:
        from airmodes.kernels.preamble_pallas import (
            demod_batch_packed_planar_jit)
        candidates.append(
            ("pallas-planar-i8",
             lambda a, b, cfg: demod_batch_packed_planar_jit(a, b, cfg)))
    except Exception:
        pass
    try:
        from airmodes.kernels.preamble_pallas import demod_batch_packed_fast_jit
        candidates.append(
            ("pallas2d-fast",
             lambda a, b, cfg: demod_batch_packed_fast_jit(
                 jnp_stack_iq(a, b), cfg)))
    except Exception:
        pass

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def xla_step(a, b, cfg):
        return jax.vmap(
            lambda x: pack_table(demod_block(x, cfg)))(jnp_stack_iq(a, b))

    candidates.append(("xla", xla_step))
    for name, step in candidates:
        try:
            # probe with the FULL (C, P) batch: a (1, P)-shaped trial is a
            # separate XLA compile (measured up to ~20 min uncached) that
            # nothing else reuses; the full-shape output doubles as the
            # correctness-gate decode input
            out = np.asarray(step(xi, xq, cfg))
            assert out.shape[0] == xi.shape[0]
            return name, step, out
        except Exception as e:
            print(f"# {name} unavailable ({type(e).__name__}: {e})",
                  file=sys.stderr)
    raise RuntimeError("no demod step compiled")


def jnp_stack_iq(a, b):
    """Planar (C, P) int8 pair -> interleaved (C, P, 2) for legacy steps."""
    import jax.numpy as jnp
    return jnp.stack([jnp.asarray(a), jnp.asarray(b)], axis=-1)


def write_uc8_capture(cfg, path: str, n_blocks: int, seed: int = 1):
    """Write a uc8 (rtl-sdr byte format) capture with known MIXED traffic
    (r5: every supported DF, like build_capture); returns the injected
    ICAO set (AP-overlay addresses recovered via encoder.frame_icao)."""
    from airmodes.testing import encoder

    icaos = set()
    with open(path, "wb") as f:
        for b in range(n_blocks):
            frames = encoder.random_mixed_frames(13, seed=seed * 1000 + b)
            iq, truth = encoder.make_capture(
                frames, rate=cfg.channel_rate, snr_db=18.0,
                spacing=cfg.block_size // 14, seed=seed * 1000 + b,
                total_samples=cfg.block_size)
            icaos |= {encoder.frame_icao(t.frame, t.nbits) for t in truth}
            peak = float(np.max(np.abs(iq))) or 1.0
            x = iq / peak * 0.9
            u = np.empty(2 * cfg.block_size, np.uint8)
            u[0::2] = np.round(x.real * 127.5 + 127.5).astype(np.uint8)
            u[1::2] = np.round(x.imag * 127.5 + 127.5).astype(np.uint8)
            u.tofile(f)
    return icaos


def bench_parse_fanout(cfg, msgs, density_msgs_per_msample: float):
    """Host decode-fanout ceiling (VERDICT r4 weak #6 / #5): wire strings
    through the full parse + CPR stack, relay-free. Returns
    (msgs_per_s, ceiling_msps): the second converts the message rate to
    an equivalent samples/s ceiling AT BENCH TRAFFIC DENSITY, so the
    product-claim min() can carry a parse term — at the device's ~10 Gsps
    the parser sees ~5000x the reference's real-time message rate, and
    without this term a parse regression is invisible to the bench."""
    from airmodes.decode.parse import parse as parse_cls

    wire = list(msgs)
    if not wire:
        return 0.0, float("inf")
    reps = max(1, 20000 // len(wire))
    wire = wire * reps
    p = parse_cls(my_position=None)
    t0 = time.time()
    n = 0
    for m in wire:
        try:
            p.parse(m)
        except Exception:
            pass
        n += 1
    dt = time.time() - t0
    rate = n / dt
    ceiling = rate / density_msgs_per_msample  # Msamples/s equivalent
    print(f"# parse fan-out: {rate:.0f} msg/s single-threaded "
          f"({n} msgs, wall {dt:.2f}s) -> {ceiling:.0f} Msps ceiling at "
          f"bench density {density_msgs_per_msample:.2f} msg/Msample",
          file=sys.stderr)
    return rate, ceiling


def bench_host_only(cfg, path: str, n_blocks: int):
    """The native feeder in ISOLATION (VERDICT r3 #1): C++ uc8 read +
    f32 ring + overlap-save framing + per-block AGC + int8 quantize +
    planar split, NO device call. This is the relay-independent host
    term of the product claim min(host_only, h2d, device) — it cannot
    be moved by relay mood, so e2e regressions decompose cleanly."""
    from airmodes.io.native_stream import _PlanarSource
    from airmodes.kernels.preamble_pallas import planar_length

    P = planar_length(cfg)
    xi = np.zeros(P, np.int8)
    xq = np.zeros(P, np.int8)
    best = 0.0
    for _ in range(3):
        src = _PlanarSource(cfg, P, path=path, fmt="uc8")
        n = 0
        t0 = time.time()
        while src.next_row(xi, xq, scale=None) is not None:
            n += 1
        dt = time.time() - t0
        src.close()
        assert n == n_blocks, (n, n_blocks)
        best = max(best, n * cfg.block_size / dt / 1e6)
    print(f"# host-only native feeder: {best:.1f} Msps "
          f"({n_blocks} blocks, best of 3)", file=sys.stderr)
    return best


def bench_e2e(cfg, path: str, icaos, n_blocks: int = 32):
    """The PRODUCT path, end to end: modes_rx on a uc8 capture file ->
    framer -> int8 quantize -> batched planar demod -> wire messages ->
    parser -> SQLite plugin. Returns (msps, ok).

    Runs in-process with the same cfg/batch shape as the kernel bench so
    the jit cache is already warm — the figure measures the steady-state
    product loop (disk read + host framing/quantize + device + parse +
    DB), not compilation."""
    import os
    import sqlite3
    import tempfile
    from airmodes.apps.modes_rx import main as rx_main

    db = os.path.join(tempfile.mkdtemp(prefix="airmodes_bench_"), "out.db")
    args = ["-s", path, "--file-format", "uc8", "--int8",
            "--block-size", str(cfg.block_size),
            "--max-detections", str(cfg.max_detections),
            "--batch", "16", "-n", "-d", db, "--stats-interval", "0",
            "--compile-cache", "/root/repo/.jax_cache"]
    rx_main(args + ["--max-blocks", "2"])      # warm the in-process jits
    t0 = time.time()
    rc = rx_main(args)
    dt = time.time() - t0
    msps = n_blocks * cfg.block_size / dt / 1e6

    con = sqlite3.connect(db)
    n_aircraft = con.execute("SELECT COUNT(*) FROM aircraft").fetchone()[0]
    con.close()
    ok = rc == 0 and n_aircraft >= int(0.9 * len(icaos))
    print(f"# e2e modes_rx: {msps:.1f} Msps over {n_blocks} blocks "
          f"(wall {dt:.2f}s), {n_aircraft}/{len(icaos)} aircraft in DB",
          file=sys.stderr)
    try:
        os.remove(db)
    except OSError:
        pass
    return msps, ok


def bench_e2e_multichannel(cfg, n_channels: int = 4, n_blocks: int = 8,
                           seed: int = 3):
    """The aggregate north star END TO END (VERDICT r3 #4): C uc8
    captures through modes_rx multi-channel mode — one batched (C, P)
    device call per step via run_native_channels, full decode + plugin
    fan-out. Returns (aggregate_msps, ok). The aggregate should approach
    C x the single-channel e2e figure measured in the same session
    (shared fixed costs amortize across the channel batch)."""
    import os
    import tempfile
    from airmodes.apps.modes_rx import main as rx_main

    d = tempfile.mkdtemp(prefix="airmodes_benchmc_")
    paths = []
    icaos = set()
    for c in range(n_channels):
        p = os.path.join(d, f"ch{c}.uc8")
        icaos |= write_uc8_capture(cfg, p, n_blocks, seed=seed * 100 + c)
        paths.append(p)
    import sqlite3
    db = os.path.join(d, "out.db")
    srcs = []
    for p in paths:
        srcs += ["-s", p]
    args = srcs + ["--file-format", "uc8", "--int8",
                   "--block-size", str(cfg.block_size),
                   "--max-detections", str(cfg.max_detections),
                   "-n", "-d", db, "--stats-interval", "0",
                   "--compile-cache", "/root/repo/.jax_cache"]
    rx_main(args + ["--max-blocks", "1"])      # warm the (C, P) jit
    t0 = time.time()
    rc = rx_main(args)
    dt = time.time() - t0
    msps = n_channels * n_blocks * cfg.block_size / dt / 1e6
    con = sqlite3.connect(db)
    n_aircraft = con.execute("SELECT COUNT(*) FROM aircraft").fetchone()[0]
    con.close()
    # decode gate, like bench_e2e: a multichannel path regression that
    # decodes nothing must FAIL the bench, not just exit 0
    ok = rc == 0 and n_aircraft >= int(0.9 * len(icaos))
    print(f"# e2e multichannel: {msps:.1f} Msps aggregate over "
          f"{n_channels} channels x {n_blocks} blocks (wall {dt:.2f}s), "
          f"{n_aircraft}/{len(icaos)} aircraft in DB", file=sys.stderr)
    for p in paths:
        try:
            os.remove(p)
        except OSError:
            pass
    return msps, ok


def bench_sps5(n_runs: int = 5, seed: int = 100):
    """The reference's TOP supported rate (10 Msps, sps=5) on the real
    chip (VERDICT r3 #3): decode parity + a sum-synced device figure for
    the production planar kernel at channel_rate=10e6. Every other
    hardware number is sps=1; this is the hardware evidence for the full
    2-10 Msps range (python/radio.py rate options).

    Returns (device_msps_sps5, ok)."""
    import jax
    import jax.numpy as jnp
    import airmodes
    from airmodes.dsp import host
    from airmodes.dsp.pipeline import unpack_table
    from airmodes.io import sources
    from airmodes.kernels.preamble_pallas import (
        demod_batch_packed_planar_jit, planar_length, to_planar_i8)
    from airmodes.testing import encoder

    cfg5 = airmodes.DspConfig(channel_rate=10e6, block_size=1 << 22,
                              max_detections=256)
    C = 4
    P = planar_length(cfg5)
    xi = np.zeros((C, P), np.int8)
    xq = np.zeros((C, P), np.int8)
    want = set()
    for k in range(C):
        frames = encoder.random_df17_frames(42, seed=seed + k)
        iq, truth = encoder.make_capture(
            frames, rate=10e6, snr_db=15.0, spacing=cfg5.block_size // 43,
            seed=seed + k, total_samples=cfg5.block_size)
        want |= {t.hex for t in truth}
        block, _ = next(sources.frame_blocks(iq, cfg5))
        x2 = np.stack([block.real, block.imag], -1)
        peak = float(np.abs(x2).max()) or 1.0
        b8 = np.clip(np.round(x2 / peak * 120), -127, 127).astype(np.int8)
        pi, pq = to_planar_i8(b8, cfg5)
        xi[k], xq[k] = pi[0], pq[0]

    arr = np.asarray(demod_batch_packed_planar_jit(xi, xq, cfg5))
    got = set()
    for k in range(C):
        for m in host.table_to_messages(unpack_table(arr[k]),
                                        k * cfg5.block_size, 10e6):
            got.add(m.split()[1])
    ok = (len(want - got) <= max(1, len(want) // 1000)
          and len(got - want) <= max(1, len(want) // 100))

    # 256 blocks per dispatch, SAME as the primary device loop: the r4
    # figure (3887, reps=8 = 32 blocks/call) was dispatch-floor-bound,
    # not kernel-bound — the ~40 ms fixed relay RPC ate ~60% of each
    # 28 ms call. The r5 batch sweep (scripts/tpu_sps5_ablate.py +
    # same-process reps sweep) measured 4191/7664/8121 Msps at
    # 32/128/256 blocks/call; at 256 the sps5/sps1 ratio matches the
    # per-sps VPU op counts (112.5/89.0 -> 0.79), i.e. the kernel is
    # ~95% VPU-bound at sps=5 with no sps-specific inefficiency.
    reps = 64
    di = jax.device_put(np.tile(xi, (reps, 1)))
    dq = jax.device_put(np.tile(xq, (reps, 1)))
    sum_step = jax.jit(lambda a, b: (lambda t: (t, jnp.sum(t)))(
        demod_batch_packed_planar_jit(a, b, cfg5)))
    np.asarray(sum_step(di, dq)[1])
    rates = []
    for _ in range(n_runs):
        t0 = time.time()
        inflight = []
        for i in range(8):
            inflight.append(sum_step(di, dq)[1])
            if len(inflight) > 1:
                np.asarray(inflight.pop(0))
        for o in inflight:
            np.asarray(o)
        rates.append(8 * reps * C * cfg5.block_size
                     / (time.time() - t0) / 1e6)
    rates.sort()
    msps = rates[len(rates) // 2]
    print(f"# sps5 (10 Msps): {msps:.0f} Msps device, decoded "
          f"{len(got & want)}/{len(want)}, spurious {len(got - want)}",
          file=sys.stderr)
    return msps, ok


def bench_sharded_resample(seed: int = 55):
    """Real-chip 1x1 execution of the fused sharded resample+demod:
    6 Msps raw capture -> group-matmul polyphase resample to 4 Msps
    (sps=2) -> ON-DEVICE int8 quantize -> planar Pallas demod, ONE
    shard_map program (VERDICT r4 #1: the previous demod_block form ran
    ~350x below the production kernel). Returns (msps_channel_rate, ok)
    — decode parity is the gate. 4 Msps is the ROBUST operating point
    (polyphase.py): the r4 debug probes showed decimating all the way to
    2 Msps (1 sample/chip) drops every frame whose preamble lands at the
    wrong 1-of-q sub-chip phase (a physics limit of 1 sps after a narrow
    anti-alias filter, not a kernel defect)."""
    import jax
    import jax.numpy as jnp
    import airmodes
    from airmodes.dist import sharded
    from airmodes.dsp import host
    from airmodes.dsp.pipeline import iq_to_device_layout
    from airmodes.testing import encoder

    cfgr = airmodes.DspConfig(channel_rate=4e6, block_size=1 << 22,
                              max_detections=64)
    p_up, q_dn = 2, 3
    raw_total = cfgr.block_size * q_dn // p_up
    frames = encoder.random_df17_frames(24, seed=seed)
    iq_raw, truth = encoder.make_capture(
        frames, rate=6e6, snr_db=25.0, spacing=raw_total // 25, seed=seed,
        total_samples=raw_total)
    mesh = sharded.make_mesh(n_channel=1, n_time=1)
    planar = jax.default_backend() == "tpu"
    fn = sharded.make_sharded_resample_demod(mesh, cfgr, p_up, q_dn,
                                             planar=planar)
    gain = np.float32(120.0 / (float(np.abs(iq_raw).max()) or 1.0))
    if planar:
        # PLANAR (C, 2, N) f32 (minor-dim-2 interleaved reads relayout
        # ~15x slower — r5 stage probe)
        x = np.stack([iq_raw.real, iq_raw.imag]).astype(np.float32)[None]
        args = (jax.device_put(x), gain)
    else:
        x = iq_to_device_layout(iq_raw)[None]
        args = (sharded.shard_input(x, mesh),)
    table = jax.block_until_ready(fn(*args))
    sub = type(table)(*(np.asarray(f)[0, 0] for f in table))
    fs = float(gain) / 127.0 if planar else 1.0
    got = {m.split()[1]
           for m in host.table_to_messages(sub, 0, cfgr.channel_rate,
                                           full_scale=fs)}
    want = {t.hex for t in truth}
    ok = len(want - got) <= max(1, len(want) // 100)

    # timed loop: 16-channel batch (the channel axis of the same mesh
    # program) x an in-jit scan of R applications per dispatch, pipelined
    # 2-in-flight. One raw block per dispatch measured the ~30 ms fixed
    # relay RPC floor (115 Msps in the r5 smoke), and even 8-channel
    # single-application calls stayed half floor (the r5 matmul probe
    # measured EVERY variant at 27-31 ms/call regardless of FLOPs); the
    # scan steps the same program R times per dispatch — over slightly
    # different gains so XLA cannot CSE the iterations — so the figure
    # tracks the fused program, not the dev-harness RPC. Sum the PACKED
    # table: summing only t.index would let XLA dead-code-eliminate the
    # slice/CRC/ECC stages (CLAUDE.md det_idx note).
    from airmodes.dsp.pipeline import pack_table
    C, R = 16, 4
    pack2 = jax.vmap(jax.vmap(pack_table))
    dx = jax.device_put(np.tile(x, (C, 1, 1)))
    if planar:
        gains = jnp.float32(gain) * (1.0 + 1e-6 * jnp.arange(R))

        @jax.jit
        def sum_fn(a, gs):
            def body(carry, g):
                return carry + jnp.sum(pack2(fn(a, g))), None
            return jax.lax.scan(body, jnp.int32(0), gs)[0]

        dargs = (dx, gains)
    else:
        R = 1
        sum_fn = jax.jit(lambda a: jnp.sum(pack2(fn(a))))
        dargs = (dx,)
    np.asarray(sum_fn(*dargs))
    rates = []
    iters = 4
    for _ in range(5):
        t0 = time.time()
        inflight = []
        for _ in range(iters):
            inflight.append(sum_fn(*dargs))
            if len(inflight) > 1:
                np.asarray(inflight.pop(0))
        for o in inflight:
            np.asarray(o)
        rates.append(iters * R * C * cfgr.block_size
                     / (time.time() - t0) / 1e6)
    rates.sort()
    msps = rates[len(rates) // 2]
    print(f"# fused resample+demod 1x1 (planar={planar}, {C}-channel "
          f"batch x {R}-scan): {msps:.0f} Msps (channel rate), decoded "
          f"{len(got & want)}/{len(want)}", file=sys.stderr)
    return msps, ok


def bench_podpipeline(cfg, n_steps: int = 14, seed: int = 2):
    """The production multi-chip streaming driver (dist.multihost
    PodPipeline) timed on a 1x1 mesh — measures the shard_map +
    stream-context + vmapped-pack wrapper cost relative to the plain
    streaming loop (VERDICT r2 #4; r4 weak #2).

    r5: STEADY STATE, not fill/drain. The r4 bench timed 3 passes of a
    3-step stream, so nearly every timed step was pipeline fill/drain
    plus the per-pass zeros edge step — the driver artifact read 0.44x
    streaming while a same-session probe at steady state read 0.99x.
    Now ONE long stream of n_steps (>= 12) pod-realistic steps (2^23
    samples — a real pod step is n_time x block), timestamping each
    yield and rating the interior span only (yields 2 .. n_steps-2),
    which excludes compile/fill at the head and drain at the tail."""
    from airmodes.dist.multihost import PodPipeline
    from airmodes.testing import encoder

    pipe = PodPipeline(cfg, n_channel=1, n_time=1)
    S = pipe.samples_per_step
    frames = encoder.random_df17_frames(
        max(int(S / cfg.channel_rate * 100.0), 8), seed=seed)
    iq, truth = encoder.make_capture(
        frames, rate=cfg.channel_rate, snr_db=15.0,
        spacing=S // max(len(frames), 1), seed=seed, total_samples=S)
    peak = float(np.max(np.abs(iq))) or 1.0
    pipe.gain = 120.0 / peak

    def chunks(n):
        # the same step capture n times (fresh traffic each step would
        # need n x the host memory; the device work is identical)
        for _ in range(n):
            yield iq[None]

    got = set()
    for msgs in pipe.run_stream(chunks(3)):     # compile + warm + parity
        got |= {m.split()[1] for m in msgs}
    want = {t.hex for t in truth}
    ok = len(want - got) <= max(1, len(want) // 100)

    stamps = []
    for msgs in pipe.run_stream(chunks(n_steps)):
        stamps.append(time.time())
    k0, k1 = 2, n_steps - 2
    msps = (k1 - k0) * S / (stamps[k1] - stamps[k0]) / 1e6
    print(f"# podpipeline 1x1: {msps:.1f} Msps steady-state over steps "
          f"{k0}..{k1} of {n_steps} (planar={pipe.planar}, step {S}), "
          f"decoded {len(got & want)}/{len(want)}", file=sys.stderr)
    return msps, ok


# Implied VPU utilization of the detect-dominated planar kernel. The
# ops/sample figure is DERIVED from the kernel itself (jaxpr elementwise
# op count of the per-tile body, airmodes.kernels.opcount — validated to
# 0.2% against the r2/r3 ablation-probe measurement of ~85), so a kernel
# change moves the canary honestly instead of skewing it (VERDICT r3
# weak #5; tests/test_pallas.py pins the count against the checked-in
# airmodes/kernels/vpu_ops.json). The (8,128)-lane f32 VPU peak at
# ~940 MHz is ~0.96 Tops/s — an estimate; the field exists so a silent
# throughput regression shows up as implausible utilization, not to
# claim 2-digit precision.
def vpu_ops_per_sample(cfg) -> float:
    try:
        from airmodes.kernels.opcount import detect_ops_per_sample
        return detect_ops_per_sample(cfg)
    except Exception as e:
        print(f"# opcount derivation failed ({e}); using pinned value",
              file=sys.stderr)
        import json as _json
        with open("/root/repo/airmodes/kernels/vpu_ops.json") as f:
            return _json.load(f)["vpu_ops_per_sample"]


VPU_PEAK_F32 = 8 * 128 * 0.94e9


def main():
    import jax
    try:
        # persistent compile cache: repeat bench runs skip the ~80 s compile
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass
    import airmodes
    from airmodes.dsp import host
    from airmodes.dsp.pipeline import unpack_table

    cfg = airmodes.DspConfig(block_size=1 << 22, max_detections=256)
    C = 16
    xi, xq, truth = build_capture(cfg, C)

    t0 = time.time()
    kernel, step, arr0 = pick_step(cfg, xi, xq)
    compile_s = time.time() - t0

    # correctness gate: the bench capture must decode its injected traffic.
    # At 15 dB SNR an occasional message is genuinely marginal (the CPU
    # reference path misses the same ones — verified), so the gate is
    # >= 99.9% rather than exact. The SPURIOUS side is gated too: hexes
    # decoded that were never injected (noise or ECC minting a valid-CRC
    # frame from a marginal one) must stay under 1% of the injected count
    # — a false-positive regression fails the bench, not just a miss.
    # Spurious counts are split by table status (VERDICT r2 #3): a
    # clean-CRC spurious would be noise minting a valid frame (must be 0,
    # pinned by tests/test_golden.py); corrected-status spurious is the
    # brute-force ECC re-targeting a marginal frame's CRC (bounded).
    # DECISION (r3): measured provenance is 21/21 status=addr —
    # AP-overlaid DFs minted from corrupted marginal DF17s, unverifiable
    # by construction (reference emits them identically); corrected_1/2
    # spurious measured ZERO, so no stricter pair-flip acceptance is
    # warranted. Display-layer mitigation: the dashboard's icao gate
    # (outputs/gui_model.py) blocks these phantoms from the UI.
    arr = arr0
    msgs = []
    for i in range(C):
        t = unpack_table(arr[i])
        msgs.extend(host.table_to_messages(t, i * cfg.block_size,
                                           cfg.channel_rate))
    want = {t.hex for t in truth}
    got = {m.split()[1] for m in msgs}
    missing = len(want - got)
    spurious = len(got - want)
    # per-DF decode parity (VERDICT r4 #3): the mixed capture injects
    # every supported DF; each class must decode on the real chip, so a
    # regression in the 56-bit dispatch / DF11 II acceptance / AP-overlay
    # recovery fails the bench even when DF17 traffic is fine
    df_decode = {}
    df_ok = True
    for t in truth:
        # DF24 frames carry KE/ND bits inside the top-5-bit field (the
        # df "24-31" family); normalize like the wire does (host.py
        # df_wire = min(df, 24)) so the class gates as ONE bucket
        d = df_decode.setdefault(f"df{min(t.df, 24)}", [0, 0])
        d[0] += 1
        d[1] += int(t.hex in got)
    for k, (n_inj, n_dec) in sorted(df_decode.items()):
        if n_inj - n_dec > max(1, n_inj // 20):
            df_ok = False
    df_decode = {k: f"{v[1]}/{v[0]}" for k, v in sorted(df_decode.items())}
    status_name = {0: "crc_ok", 1: "corrected_1", 2: "corrected_2",
                   3: "addr"}
    spurious_by_status = {}
    spurious_hexes = got - want
    for m in msgs:
        parts = m.split()
        if parts[1] in spurious_hexes:
            k = status_name.get(int(parts[3]), str(parts[3]))
            spurious_by_status[k] = spurious_by_status.get(k, 0) + 1
            spurious_hexes.discard(parts[1])   # count each hex once

    # host decode-fanout ceiling (VERDICT r4 #5): relay-free, so it can
    # run up front; the ceiling enters the product-claim min() below
    density = len(msgs) / (C * cfg.block_size / 1e6)   # msg per Msample
    parse_rate, parse_ceiling_msps = bench_parse_fanout(cfg, msgs, density)

    # primary metric FIRST (before the relay-heavy streaming/h2d loops):
    # r3 root-cause work (scripts/tpu_regress_probe.py, CLAUDE.md) showed
    # the relay-session band is ±25-35% when each iteration fetches the
    # full 2.4 MB packed table (identical code measured 8796 then 5733
    # median an hour apart — the fetch rides relay bulk rate, 50-400
    # MB/s). The primary loop therefore fetches a 4-byte device-side
    # REDUCTION of the packed table per call — the table stays a program
    # output (no layout pathology, CLAUDE.md det_idx note) and the fetch
    # still syncs the full computation, but only fixed RPC cost (~24 ms,
    # stable) rides the relay. The full-table-fetch figure is kept as
    # device_msps_tablefetch for continuity with r1/r2 methodology.
    import jax.numpy as jnp

    sum_step = jax.jit(
        lambda a, b: (lambda t: (t, jnp.sum(t)))(step(a, b, cfg)))
    reps = 16
    di = jax.device_put(np.tile(xi, (reps, 1)))
    dq = jax.device_put(np.tile(xq, (reps, 1)))
    jax.block_until_ready((di, dq))
    np.asarray(sum_step(di, dq)[1])

    def timed_loop(iters=10, sync_sum=True):
        # 2 dispatches in flight (swept best: deeper queues measured slower)
        t0 = time.time()
        inflight = []
        for i in range(iters):
            inflight.append(sum_step(di, dq)[1] if sync_sum
                            else step(di, dq, cfg))
            if len(inflight) > 1:
                np.asarray(inflight.pop(0))
        for o in inflight:
            np.asarray(o)
        return iters * reps * C * cfg.block_size / (time.time() - t0) / 1e6

    timed_loop(iters=2)   # discard: the first loop after compile still
    # ramps relay/session state (try3 measured its run 0 at 6.0 vs the
    # 8.8-9.0 steady state) — the median tolerates it, but warming keeps
    # the spread describing steady state
    n_runs = 5
    dev_runs = sorted(timed_loop() for _ in range(n_runs))
    dev_msps = dev_runs[n_runs // 2]          # median
    ops_per_sample = vpu_ops_per_sample(cfg)
    vpu_util = dev_msps * 1e6 * ops_per_sample / VPU_PEAK_F32
    tf_runs = sorted(timed_loop(sync_sum=False) for _ in range(3))
    tablefetch_msps = tf_runs[1]
    del di, dq

    # streaming loop — H2D of each int8 batch + demod + packed D2H per call
    iters = 4
    t0 = time.time()
    inflight = []
    for i in range(iters):
        inflight.append(step(xi, xq, cfg))
        if len(inflight) > 1:
            np.asarray(inflight.pop(0))
    for o in inflight:
        np.asarray(o)
    stream_dt = time.time() - t0
    stream_msps = iters * C * cfg.block_size / stream_dt / 1e6

    # relay-ceiling proof: the SAME loop with no demod at all — ship each
    # int8 batch host->device and fetch an 8-lane touch. If this matches
    # the streaming figure, the transport (dev-harness relay), not the
    # demod design, is the streaming ceiling. Measured TWICE, bracketing
    # the e2e run below: the relay's bulk rate drifts within a session
    # (r3 sessions measured e2e/h2d ratios 0.6-1.9 from mood alone), so
    # the product-path ratio is only meaningful against near-in-time
    # controls.

    @jax.jit
    def touch(a, b):
        return (a[0, :8].astype(jnp.int32).sum()
                + b[0, :8].astype(jnp.int32).sum())

    def h2d_control():
        # median of 5 samples (VERDICT r4 #6: single 4-iter runs read
        # 8.7 and 13.0 Msps minutes apart — pure relay mood); report the
        # sample spread so a noisy session is visible in the artifact
        np.asarray(touch(xi, xq))
        runs = []
        for _ in range(5):
            t0 = time.time()
            for _ in range(3):
                np.asarray(touch(xi, xq))
            runs.append(3 * C * cfg.block_size / (time.time() - t0) / 1e6)
        runs.sort()
        return runs[2], runs

    h2d_msps, h2d_runs1 = h2d_control()

    # the reference's top rate (10 Msps) + fused resample on the chip
    # (VERDICT r3 #3) — device figures, so they run before the
    # relay-heavy product passes
    sps5_msps, sps5_ok = bench_sps5()
    cfg5 = airmodes.DspConfig(channel_rate=10e6, block_size=1 << 22,
                              max_detections=256)
    ops_sps5 = vpu_ops_per_sample(cfg5)
    vpu_util_sps5 = sps5_msps * 1e6 * ops_sps5 / VPU_PEAK_F32
    fused_msps, fused_ok = bench_sharded_resample()

    # production streaming driver, 1x1 mesh (VERDICT r2 #4); pod-realistic
    # step size (a real pod step is n_time x block — one 2^23 block here)
    # step 2^24 (a real pod step is n_time x block — n_time=8 would be
    # 64M samples; 2^23 left the per-step fixed relay RPCs at ~18% of
    # the step and read 0.82x streaming in the r5 smoke). The pod figure
    # is transport-bound on the relay, so the meaningful ratio is
    # against a NEAR-IN-TIME h2d control (the streaming loop ran minutes
    # earlier under a different relay mood — r5 runs measured
    # pod/streaming anywhere in 0.62-1.9 from mood alone)
    h2d_pre_pod = h2d_control()[0]
    pod_msps, pod_ok = bench_podpipeline(
        airmodes.DspConfig(block_size=1 << 24, max_detections=1024))
    pod_vs_h2d = pod_msps / h2d_pre_pod if h2d_pre_pod > 0 else 0.0

    # product path end-to-end (modes_rx: disk -> ... -> parse -> SQLite),
    # decomposed (VERDICT r3 #1) into min(host_only, h2d, device):
    # host_only is relay-independent (the C++ feeder in isolation), the
    # h2d controls bracket the e2e run in time, and the claimable product
    # rate is the min of the three terms measured in THIS session.
    import tempfile
    e2e_blocks = 64        # 4 batches of 16: amortizes the non-overlapped
    #                        first-feed/last-fetch tails that made the r3
    #                        32-block figure read below even the transport
    #                        control (2 batches = no steady state)
    d = tempfile.mkdtemp(prefix="airmodes_bench_")
    cap_path = os.path.join(d, "cap.uc8")
    cap_icaos = write_uc8_capture(cfg, cap_path, e2e_blocks)
    host_only_msps = bench_host_only(cfg, cap_path, e2e_blocks)
    e2e_msps, e2e_ok = bench_e2e(cfg, cap_path, cap_icaos,
                                 n_blocks=e2e_blocks)
    h2d_msps2, h2d_runs2 = h2d_control()
    try:
        os.remove(cap_path)
    except OSError:
        pass
    h2d_near = (h2d_msps + h2d_msps2) / 2.0
    h2d_agree = (min(h2d_msps, h2d_msps2) / max(h2d_msps, h2d_msps2)
                 if max(h2d_msps, h2d_msps2) > 0 else 0.0)
    if h2d_agree < 0.85:
        print(f"# RELAY-MOOD WARNING: bracketing h2d medians disagree "
              f"{h2d_msps:.1f} vs {h2d_msps2:.1f} Msps (ratio "
              f"{h2d_agree:.2f}); transport-relative figures carry that "
              "noise", file=sys.stderr)
    e2e_vs_h2d = e2e_msps / h2d_near if h2d_near > 0 else 0.0
    product_claim = min(host_only_msps, h2d_near, dev_msps,
                        parse_ceiling_msps)

    # aggregate north star end-to-end: C=4 channels, one batched device
    # call per step (VERDICT r3 #4)
    mc_msps, mc_ok = bench_e2e_multichannel(cfg)

    baseline_msps = 10.0  # reference real-time ceiling on desktop CPU
    result = {
        "metric": "demod_throughput",
        "value": round(dev_msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(dev_msps / baseline_msps, 2),
        "device_msps_runs": [round(r, 1) for r in dev_runs],
        "device_msps_min": round(dev_runs[0], 1),
        "device_msps_max": round(dev_runs[-1], 1),
        "device_msps_tablefetch": round(tablefetch_msps, 1),
        "vpu_util_est": round(vpu_util, 3),
        "vpu_ops_per_sample": round(ops_per_sample, 2),
        "streaming_incl_relay_msps": round(stream_msps, 2),
        "podpipeline_msps": round(pod_msps, 2),
        "podpipeline_vs_h2d": round(pod_vs_h2d, 3),
        "device_msps_sps5": round(sps5_msps, 1),
        "vpu_util_est_sps5": round(vpu_util_sps5, 3),
        "vpu_ops_per_sample_sps5": round(ops_sps5, 2),
        "sharded_resample_demod_msps": round(fused_msps, 1),
        "kernel": kernel,
        "batch_blocks": reps * C,
        "spurious": spurious,
        "spurious_by_status": spurious_by_status,
        "decoded_by_df": df_decode,
        "host_only_msps": round(host_only_msps, 2),
        "parse_only_msgs_per_s": round(parse_rate, 0),
        "parse_ceiling_msps": round(parse_ceiling_msps, 1),
        "e2e_modes_rx_msps": round(e2e_msps, 2),
        "e2e_multichannel_aggregate_msps": round(mc_msps, 2),
        "h2d_only_msps": round(h2d_msps, 2),
        "h2d_only_msps_post": round(h2d_msps2, 2),
        "h2d_runs": [round(r, 1) for r in h2d_runs1 + h2d_runs2],
        "h2d_bracket_agreement": round(h2d_agree, 3),
        "e2e_vs_h2d": round(e2e_vs_h2d, 3),
        "product_claim_msps": round(product_claim, 2),
    }
    print(json.dumps(result))
    print(f"# backend={jax.default_backend()} kernel={kernel} "
          f"compile={compile_s:.1f}s block={cfg.block_size} C={C} "
          f"stream={stream_msps:.1f} Msps (wall {stream_dt:.2f}s) "
          f"device={dev_msps:.0f} Msps (runs {dev_runs[0]:.0f}.."
          f"{dev_runs[-1]:.0f}) decoded={len(got)}/{len(want)} "
          f"missing={missing} spurious={spurious} "
          f"by_status={spurious_by_status} by_df={df_decode}",
          file=sys.stderr)
    # Gates (r5, mixed traffic): DF17 keeps the tight 99.9% bound (ECC
    # rescues marginal frames); the AP-overlaid classes have NO ECC by
    # protocol — a single bit error at 15 dB mints a wrong-address
    # frame (a missing+spurious pair the reference emits identically) —
    # so they carry the per-class 5% bound (df_ok) and the spurious cap
    # widens to 2%. The real safety gate is unchanged: a clean-CRC
    # spurious (noise minting a valid frame) must never happen.
    n17 = [0, 0]
    for t in truth:
        if t.df == 17:
            n17[0] += 1
            n17[1] += int(t.hex not in got)
    ok = (n17[1] <= max(1, n17[0] // 1000)
          and spurious <= max(1, len(want) // 50)
          and spurious_by_status.get("crc_ok", 0) == 0
          and df_ok
          and e2e_ok and pod_ok and sps5_ok and fused_ok and mc_ok)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

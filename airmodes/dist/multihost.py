"""Multi-host pod driver (SURVEY.md §2.7 / §5.8 tier c).

The reference's cross-machine story is a ZeroMQ TCP relay; the TPU-native
equivalent is `jax.distributed` over DCN for the control plane plus the
("channel","time") mesh spanning all hosts' devices, with ICI carrying the
overlap-save halos. Each host feeds its local time shards, the jitted step
runs SPMD, and each host converts only the detection-table shards it owns to
wire messages (the fan-out stays host-local, exactly like the reference's
per-process plugins), or forwards them to host 0 over the zmq relay.

This module is exercised on a virtual CPU mesh in tests; on a real pod it is
driven by `initialize()` with the standard coordinator env/args.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np
import jax

from ..config import DspConfig
from ..dsp import host as host_mod
from ..dsp.pipeline import iq_to_device_layout
from . import sharded


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize passthrough.

    With explicit args, passes them through (including a bare process_id
    — dropping it would let jax guess a different coordination slot).
    With no args, falls back to jax.distributed's standard
    environment-based auto-configuration when a coordinator is configured
    (JAX_COORDINATOR_ADDRESS / TPU metadata) — a plain no-op would
    silently leave each pod host with a local-only mesh, each
    demodulating the full stream independently.
    """
    import os
    if num_processes is not None:
        if num_processes <= 1:
            return
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return
    if coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   process_id=process_id)
    elif (len(os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",")) > 1
          or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ):
        # MULTI-worker Cloud TPU pod slice: coordination comes from TPU
        # metadata that jax.distributed.initialize() only discovers when
        # actually CALLED — without this branch a pod host silently ran
        # single-process (local-only mesh, N-fold duplicate decode).
        # Gated on >1 worker: single-host dev environments legitimately
        # set TPU_WORKER_HOSTNAMES=localhost and need no coordination.
        jax.distributed.initialize()


@dataclasses.dataclass
class PodPipeline:
    """Streaming multi-device demod over a mesh spanning all local (and on a
    pod, all global) devices.

    planar=None auto-selects the production planar-int8 Pallas path on TPU
    (8x less ICI halo traffic, 4x less H2D; the kernel that wins the bench
    is also the one that streams); False keeps the f32 XLA path (the CPU
    test meshes default here — interpret-mode Pallas is slow). gain is the
    int8 quantization gain applied to complex chunks in planar run_stream;
    reported dBFS stays referenced to the float full scale."""

    cfg: DspConfig
    n_channel: int = 1
    n_time: Optional[int] = None
    planar: Optional[bool] = None
    gain: float = 120.0

    def __post_init__(self):
        from ..dsp.pipeline import pack_table
        n_dev = len(jax.devices())
        if self.n_time is None:
            self.n_time = max(n_dev // self.n_channel, 1)
        self.mesh = sharded.make_mesh(self.n_channel, self.n_time)
        if self.n_time * self.cfg.block_size >= (1 << 31):
            # detection indices are step-global int32 on the wire
            # (pack_table): past 2^31 samples/step they wrap negative and
            # frames silently vanish. Shard such workloads over "channel"
            # instead (indices stay per-channel-step).
            raise ValueError(
                f"samples_per_step {self.n_time * self.cfg.block_size} "
                ">= 2^31 overflows the int32 detection index; use more "
                "channel shards / smaller blocks")
        if self.planar is None:
            # gate from the kernels' OWN predicate — a hand-copied
            # constraint list here drifted from the kernel's asserts
            # before (CLAUDE.md kernels-owned-gate rule)
            from ..kernels.preamble_pallas import supported_planar_tile
            self.planar = (jax.default_backend() == "tpu"
                           and supported_planar_tile(self.cfg) is not None)
        # pack device-side: the whole step comes back as ONE
        # (C, T, K+1, 9) int32 fetch instead of 10 per-field transfers
        # (each np.asarray costs ~24 ms fixed on relay/DCN paths)
        pack2 = jax.vmap(jax.vmap(pack_table))
        left, right = self.cfg.left_halo, self.cfg.right_halo
        if self.planar:
            base = sharded.make_sharded_demod_planar_ctx(self.mesh, self.cfg)
            self.step_fn = jax.jit(
                lambda xi, xq, li, lq, ri, rq:
                pack2(base(xi, xq, li, lq, ri, rq)))

            # device-resident stream context (VERDICT r3 #2): step n's left
            # context IS the tail of step n-1's input and its right context
            # the head of step n+1's — both already on device when run_stream
            # ships each step exactly once. Slicing them INSIDE the jit
            # removes the 4 per-step ctx H2D round trips the host-carried
            # form paid (zeros only at the true stream edges).
            def _step3(pi, pq, ci, cq, ni, nq):
                return pack2(base(ci, cq, pi[:, -left:], pq[:, -left:],
                                  ni[:, :right], nq[:, :right]))

            self.step3_fn = jax.jit(_step3)
        else:
            base = sharded.make_sharded_demod_ctx(self.mesh, self.cfg)
            self.step_fn = jax.jit(lambda x, l, r: pack2(base(x, l, r)))

            def _step3(pv, cur, nx):
                return pack2(base(cur, pv[:, -left:], nx[:, :right]))

            self.step3_fn = jax.jit(_step3)
        self.samples_per_step = self.n_time * self.cfg.block_size

    def _emit(self, packed, step_start_sample: int, epoch: float,
              stats, full_scale: float = 1.0) -> List[str]:
        from ..dsp.pipeline import unpack_table
        msgs: List[str] = []

        def emit(arr):
            for c in range(arr.shape[0]):
                for t in range(arr.shape[1]):
                    sub = unpack_table(arr[c, t])
                    msgs.extend(host_mod.table_to_messages(
                        sub, step_start_sample, self.cfg.channel_rate,
                        epoch=epoch, stats=stats, full_scale=full_scale))

        if jax.process_count() == 1:
            emit(np.asarray(packed))              # the step's ONE fetch
        else:
            # multi-host: a global np.asarray would raise (the array spans
            # non-addressable devices) — each host converts only the shards
            # it OWNS, which also keeps the message fan-out host-local and
            # duplicate-free (every (channel, time) shard has one owner)
            for shard in packed.addressable_shards:
                emit(np.asarray(shard.data))
        return sorted(msgs, key=lambda m: float(m.split()[5]))

    def run_step(self, iq_step: np.ndarray, step_start_sample: int,
                 epoch: float = 0.0,
                 stats: Optional[host_mod.BlockStats] = None,
                 lctx: Optional[np.ndarray] = None,
                 rctx: Optional[np.ndarray] = None) -> List[str]:
        """One SPMD step over (n_channel, n_time*block, 2) float32 input.

        lctx/rctx: (n_channel, left_halo/right_halo, 2) stream context
        around the step (zeros = stream edge). Returns the wire messages
        for every channel/time shard, indices globalized with
        step_start_sample.
        """
        if self.planar:
            raise ValueError("planar pipeline: use run_step_planar "
                             "or run_stream")
        x = iq_to_device_layout(iq_step)
        if lctx is None:
            lctx = np.zeros((self.n_channel, self.cfg.left_halo, 2),
                            np.float32)
        if rctx is None:
            rctx = np.zeros((self.n_channel, self.cfg.right_halo, 2),
                            np.float32)
        packed = self.step_fn(sharded.shard_input(x, self.mesh), lctx, rctx)
        return self._emit(packed, step_start_sample, epoch, stats)

    def run_step_planar(self, xi: np.ndarray, xq: np.ndarray,
                        step_start_sample: int, epoch: float = 0.0,
                        stats: Optional[host_mod.BlockStats] = None,
                        lctx=None, rctx=None,
                        full_scale: float = 1.0) -> List[str]:
        """One SPMD step over planar (n_channel, n_time*block) int8 I/Q.

        lctx/rctx: ((C, left_halo), (C, left_halo)) / ((C, right_halo),
        (C, right_halo)) int8 planar (I, Q) context pairs around the step
        (None = stream edge, zeros). full_scale rescales reported dBFS to
        the pre-quantization float full scale (gain/127 for a host
        quantizer with gain)."""
        if not self.planar:
            raise ValueError("f32 pipeline: use run_step or run_stream")
        if lctx is None:
            z = np.zeros((self.n_channel, self.cfg.left_halo), np.int8)
            lctx = (z, z)
        if rctx is None:
            z = np.zeros((self.n_channel, self.cfg.right_halo), np.int8)
            rctx = (z, z)
        di, dq = sharded.shard_input_planar(xi, xq, self.mesh)
        packed = self.step_fn(di, dq, lctx[0], lctx[1], rctx[0], rctx[1])
        return self._emit(packed, step_start_sample, epoch, stats,
                          full_scale=full_scale)

    def run_stream(self, chunks: Iterable[np.ndarray], epoch: float = 0.0,
                   stats: Optional[host_mod.BlockStats] = None,
                   depth: int = 2) -> Iterable[List[str]]:
        """Drive a (n_channel, N) complex64 chunk iterator through steps.

        Each step's input ships to the device exactly ONCE; the step
        program slices its left context from the PREVIOUS step's (still
        device-resident) input and its right context from the NEXT step's
        (VERDICT r3 #2 — the host-carried context form paid 4 extra H2D
        round trips per step for data the device already had). A single
        cached device-zeros step serves both true stream edges, so a
        frame straddling two consecutive steps still decodes exactly
        once (owned by the step containing its preamble start) and a
        tail of any length drains zero-padded only past the stream end.
        In planar mode chunks are quantized to int8 with self.gain
        before shipping.

        Step n dispatches once step n+1's input is buffered (one step of
        look-ahead — this is a throughput driver; the live low-latency
        path is io.native_stream), and `depth` dispatched steps stay in
        flight so step i+1's H2D overlaps step i's compute and fetch."""
        from collections import deque
        S = self.samples_per_step
        # chunk buffer as a LIST of arrays, concatenated once per step:
        # repeated np.concatenate on a growing array is O(buffered) per
        # chunk — ~500x write amplification at UDP-sized chunks into a
        # multi-Msample step (r4 review)
        parts: List[np.ndarray] = []
        buffered = 0

        def take_step():
            """Pop exactly S samples (zero-padded past stream end)."""
            nonlocal parts, buffered
            have = min(buffered, S)
            out = np.zeros((self.n_channel, S), np.complex64)
            pos = 0
            while pos < have:
                p = parts[0]
                n = min(p.shape[1], have - pos)
                out[:, pos: pos + n] = p[:, :n]
                if n == p.shape[1]:
                    parts.pop(0)
                else:
                    parts[0] = p[:, n:]
                pos += n
            buffered -= have
            return out

        if self.planar:
            # one fused native pass when the toolchain is present (the
            # numpy form costs ~5 full-array passes per step); results
            # are bit-identical (same round-half-even + clip rule)
            try:
                from ..native import quantize_planar_i8 as _q
                _q(np.zeros(1, np.complex64), 1.0)   # build/load check

                def conv(x):
                    return _q(x, self.gain)
            except Exception:
                def conv(x):
                    return host_mod.quantize_planar_i8_np(x, self.gain)

            def ship(step):
                return sharded.shard_input_planar(step[0], step[1],
                                                  self.mesh)

            def dispatch(pv, cu, nx):
                return self.step3_fn(pv[0], pv[1], cu[0], cu[1],
                                     nx[0], nx[1])
        else:
            from ..dsp.pipeline import iq_to_device_layout as conv
            # zero-copy complex64 -> (..., 2) float32 view (run_step uses
            # the same helper; the stack+astype it replaced copied twice)

            def ship(step):
                return sharded.shard_input(step, self.mesh)

            dispatch = self.step3_fn

        full_scale = (self.gain / 127.0) if self.planar else 1.0
        zeros = ship(conv(np.zeros((self.n_channel, S), np.complex64)))
        prev = zeros                      # device tail provider for step 0
        cur = None                        # (shipped device step, start)
        start = 0
        done = False
        chunks = iter(chunks)
        inflight: deque = deque()
        while True:
            while not done and buffered < S:
                try:
                    c = np.ascontiguousarray(next(chunks))
                    if c.shape[0] != self.n_channel:
                        # numpy would BROADCAST a (1, N) chunk across all
                        # channels in take_step — every frame silently
                        # decoded n_channel times with plausible
                        # per-channel provenance (r5 review)
                        raise ValueError(
                            f"run_stream chunk has {c.shape[0]} channels; "
                            f"pipeline was built with n_channel="
                            f"{self.n_channel}")
                    parts.append(c)
                    buffered += c.shape[1]
                except StopIteration:
                    done = True
            if buffered == 0:
                break
            dev = ship(conv(take_step()))   # zero-pads only at EOF
            if cur is not None:           # step k runs once k+1 is shipped
                inflight.append((dispatch(prev, cur[0], dev), cur[1]))
                prev = cur[0]
            cur = (dev, start)
            start += S
            if len(inflight) >= max(depth, 1):
                packed, st = inflight.popleft()
                yield self._emit(packed, st, epoch, stats,
                                 full_scale=full_scale)
        if cur is not None:               # last step: silence to the right
            inflight.append((dispatch(prev, cur[0], zeros), cur[1]))
        while inflight:
            packed, st = inflight.popleft()
            yield self._emit(packed, st, epoch, stats,
                             full_scale=full_scale)


def ici_scaling_model(cfg: DspConfig, device_msps: float,
                      planar: bool = True,
                      ici_bytes_per_s: float = 45e9,
                      hop_latency_s: float = 2e-6) -> dict:
    """Analytic weak-scaling efficiency of time-sharding over ICI.

    The CPU-mesh scaling_report demonstrates the machinery but not the
    >= 0.8 ICI target (one real chip here); this model extrapolates from
    the measured single-chip rate. Per step each shard exchanges its halo
    with both ring neighbors (lax.ppermute): overlap is CONSTANT per chip
    while compute scales with the block, so efficiency is independent of
    chip count (weak scaling) —

        eff = t_compute / (t_compute + t_halo)
        t_halo = halo_bytes / ICI_BW + n_msgs * hop_latency
        n_msgs = 4 planar (I and Q exchange separately, both directions)
                 2 interleaved f32

    Defaults are conservative public v4-generation per-link numbers; the
    production planar halos are ~1 KB against ~450 us of compute, so eff
    stays > 0.99 even at 10x worse ICI assumptions. Returns the terms so
    callers/tests can re-derive with their own hardware numbers."""
    bytes_per_sample = 2 if planar else 8      # I+Q int8 vs (N, 2) f32
    halo_samples = cfg.left_halo + cfg.right_halo
    halo_bytes = halo_samples * bytes_per_sample
    n_msgs = 4 if planar else 2
    t_halo = halo_bytes / ici_bytes_per_s + n_msgs * hop_latency_s
    t_compute = cfg.block_size / (device_msps * 1e6)
    eff = t_compute / (t_compute + t_halo)
    return {"halo_bytes": halo_bytes, "t_halo_s": t_halo,
            "t_compute_s": t_compute, "efficiency": eff,
            "meets_target": eff >= 0.8}


def scaling_report(cfg: DspConfig, meshes: Sequence[Tuple[int, int]],
                   n_steps: int = 4, seed: int = 0,
                   baseline: Optional[dict] = None) -> List[dict]:
    """Measure samples/s over several mesh shapes (scaling efficiency).

    Each entry carries `efficiency` relative to the first mesh's
    per-device rate (the BASELINE north star asks >= 0.8)."""
    import time
    from ..testing import encoder
    out = []
    for n_ch, n_t in meshes:
        # planar=False: this report drives run_step (the f32 path); the
        # TPU auto-select would otherwise build a planar pipeline whose
        # run_step raises by design
        pipe = PodPipeline(cfg, n_channel=n_ch, n_time=n_t, planar=False)
        total = pipe.samples_per_step
        frames = encoder.random_df17_frames(16, seed=seed)
        iq, _ = encoder.make_capture(frames, snr_db=18.0,
                                     spacing=total // 20, seed=seed,
                                     total_samples=total)
        step = np.stack([np.stack([iq.real, iq.imag], -1)] * n_ch
                        ).astype(np.float32)
        pipe.run_step(step, 0)  # compile
        t0 = time.time()
        for _ in range(n_steps):
            pipe.run_step(step, 0)
        dt = (time.time() - t0) / n_steps
        n_dev = n_ch * n_t
        rate = n_ch * total / dt
        entry = {"mesh": (n_ch, n_t), "devices": n_dev,
                 "samples_per_s": rate, "per_device": rate / n_dev}
        # efficiency vs a caller-provided baseline (e.g. a real-TPU
        # per_device figure from a previous run) or, absent one, vs the
        # first mesh of THIS sweep — `baseline` used to be accepted and
        # silently ignored
        ref = baseline or (out[0] if out else entry)
        entry["efficiency"] = entry["per_device"] / ref["per_device"]
        out.append(entry)
    return out


if __name__ == "__main__":
    # `python -m airmodes.dist.multihost` — weak-scaling sweep over the
    # available devices (use XLA_FLAGS=--xla_force_host_platform_device_count
    # =N JAX_PLATFORMS=cpu off-hardware; on CPU the numbers demonstrate the
    # machinery, not TPU throughput).
    import json
    import sys

    n = len(jax.devices())
    meshes = [(1, 1)]
    t = 2
    while t <= n:
        meshes.append((1, t))
        t *= 2
    if n >= 4:
        meshes.append((2, n // 2))
    cfg = DspConfig(block_size=1 << 16, max_detections=64)
    for row in scaling_report(cfg, meshes, n_steps=3):
        print(json.dumps(row))
    sys.exit(0)

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
from typing import Callable, Iterable, List, Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DspConfig
from ..dsp import host as host_mod
from ..dsp.pipeline import iq_to_device_layout
from . import sharded


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize passthrough.

    With explicit args, passes them through. With no args, falls back to
    jax.distributed's standard environment-based auto-configuration when a
    coordinator is configured (JAX_COORDINATOR_ADDRESS / TPU metadata) —
    a plain no-op would silently leave each pod host with a local-only
    mesh, each demodulating the full stream independently.
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
        jax.distributed.initialize(coordinator_address=coordinator_address)


@dataclasses.dataclass
class PodPipeline:
    """Streaming multi-device demod over a mesh spanning all local (and on a
    pod, all global) devices."""

    cfg: DspConfig
    n_channel: int = 1
    n_time: Optional[int] = None

    def __post_init__(self):
        from ..dsp.pipeline import pack_table
        n_dev = len(jax.devices())
        if self.n_time is None:
            self.n_time = max(n_dev // self.n_channel, 1)
        self.mesh = sharded.make_mesh(self.n_channel, self.n_time)
        base_fn = sharded.make_sharded_demod_ctx(self.mesh, self.cfg)
        # pack device-side: the whole step comes back as ONE
        # (C, T, K+1, 9) int32 fetch instead of 10 per-field transfers
        # (each np.asarray costs ~24 ms fixed on relay/DCN paths)
        self.step_fn = jax.jit(lambda x, l, r: jax.vmap(
            jax.vmap(pack_table))(base_fn(x, l, r)))
        self.samples_per_step = self.n_time * self.cfg.block_size

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
        x = iq_to_device_layout(iq_step)
        if lctx is None:
            lctx = np.zeros((self.n_channel, self.cfg.left_halo, 2),
                            np.float32)
        if rctx is None:
            rctx = np.zeros((self.n_channel, self.cfg.right_halo, 2),
                            np.float32)
        from ..dsp.pipeline import unpack_table
        packed = self.step_fn(sharded.shard_input(x, self.mesh), lctx, rctx)
        msgs: List[str] = []

        def emit(arr):
            for c in range(arr.shape[0]):
                for t in range(arr.shape[1]):
                    sub = unpack_table(arr[c, t])
                    msgs.extend(host_mod.table_to_messages(
                        sub, step_start_sample, self.cfg.channel_rate,
                        epoch=epoch, stats=stats))

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

    def run_stream(self, chunks: Iterable[np.ndarray],
                   epoch: float = 0.0) -> Iterable[List[str]]:
        """Drive a (n_channel, N) complex64 chunk iterator through steps.

        Steps are emitted once the FOLLOWING right_halo samples are also
        buffered, so each step's last shard sees real stream data as its
        right halo and each step's first shard gets the previous step's
        tail as its left halo — a frame straddling two steps decodes
        exactly once (owned by the step containing its preamble start)."""
        left, right = self.cfg.left_halo, self.cfg.right_halo
        pending = np.zeros((self.n_channel, 0), np.complex64)
        carry_l = np.zeros((self.n_channel, left, 2), np.float32)
        start = 0

        def to_f32(x):
            return np.stack([x.real, x.imag], axis=-1).astype(np.float32)

        for chunk in chunks:
            pending = np.concatenate([pending, chunk], axis=1)
            while pending.shape[1] >= self.samples_per_step + right:
                step = pending[:, : self.samples_per_step]
                rctx = to_f32(pending[:,
                                      self.samples_per_step:
                                      self.samples_per_step + right])
                pending = pending[:, self.samples_per_step:]
                buf = to_f32(step)
                yield self.run_step(buf, start, epoch=epoch,
                                    lctx=carry_l, rctx=rctx)
                carry_l = buf[:, -left:]
                start += self.samples_per_step
        while pending.shape[1]:
            pad = np.zeros((self.n_channel, self.samples_per_step),
                           np.complex64)
            n = min(pending.shape[1], self.samples_per_step + right)
            pad[:, : min(n, self.samples_per_step)] = \
                pending[:, : self.samples_per_step]
            rctx = np.zeros((self.n_channel, right, 2), np.float32)
            if pending.shape[1] > self.samples_per_step:
                extra = pending[:, self.samples_per_step:
                                self.samples_per_step + right]
                rctx[:, : extra.shape[1]] = to_f32(extra)
            buf = to_f32(pad)
            yield self.run_step(buf, start, epoch=epoch,
                                lctx=carry_l, rctx=rctx)
            carry_l = buf[:, -left:]
            start += self.samples_per_step
            if pending.shape[1] <= self.samples_per_step:
                break
            pending = pending[:, self.samples_per_step:]


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
        pipe = PodPipeline(cfg, n_channel=n_ch, n_time=n_t)
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
        ref = out[0] if out else entry
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

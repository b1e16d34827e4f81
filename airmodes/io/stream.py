"""Pipelined host<->device streaming runner (SURVEY.md §7 hard part 4).

Keeps the chip busy: while block i computes on device, block i+1's transfer
is already dispatched and block i-1's packed table is being fetched/decoded
on host. JAX's async dispatch does the overlap; this runner just keeps a
bounded number of steps in flight and funnels results through the host
decode path in order.
"""

from __future__ import annotations

from collections import deque
from typing import Callable, Iterable, Iterator, List, Optional, Tuple

import numpy as np

from ..config import DspConfig
from ..dsp import host as host_mod
from ..dsp.pipeline import iq_to_device_layout, unpack_table


def _default_step(cfg: DspConfig):
    """Pick the fastest available packed demod step for this backend."""
    import jax
    from ..dsp.pipeline import demod_block_packed_jit
    if jax.default_backend() == "tpu":
        try:
            from ..kernels.preamble_pallas import demod_block_packed_pallas_jit
            return demod_block_packed_pallas_jit
        except Exception:
            pass
    return demod_block_packed_jit


def run_pipelined(
    blocks: Iterable[Tuple[np.ndarray, int]],
    cfg: DspConfig,
    *,
    epoch: float = 0.0,
    stats: Optional[host_mod.BlockStats] = None,
    depth: int = 2,
    step=None,
    quantize_i8: bool = False,
    on_messages: Optional[Callable[[List[str]], None]] = None,
) -> Iterator[List[str]]:
    """Drive framed blocks through the demod with `depth` steps in flight.

    Yields the wire-message list per block, in stream order.
    """
    step = step or _default_step(cfg)
    inflight: deque = deque()

    def drain_one():
        packed, start = inflight.popleft()
        table = unpack_table(packed)
        msgs = host_mod.table_to_messages(
            table, start, cfg.channel_rate, epoch=epoch, stats=stats)
        if on_messages:
            on_messages(msgs)
        return msgs

    for block, start in blocks:
        x = iq_to_device_layout(block)
        if quantize_i8 and x.dtype == np.float32:
            peak = float(np.max(np.abs(x))) or 1.0
            x = np.clip(np.round(x * (120.0 / peak)), -127, 127).astype(np.int8)
        inflight.append((step(x, cfg), start))
        if len(inflight) > depth:
            yield drain_one()
    while inflight:
        yield drain_one()

"""Multi-chip sharded demod pipeline (SURVEY.md §2.7 / §5.7 / §5.8).

The reference scales by thread-per-block pipelining on one machine; the TPU
rebuild shards over a device mesh instead:

  - axis "channel": data parallelism over SDR channels / capture shards
  - axis "time":    sequence parallelism over time blocks of one stream,
                    with overlap-save halo exchange between neighboring
                    shards via `lax.ppermute` over ICI — the stream analog
                    of GNU Radio's set_history look-back.

Each time shard owns `block` samples; it receives the last `left_halo`
samples of its left neighbor (noise-floor warmup + peak look-back) and the
first `right_halo` samples of its right neighbor (a frame starting near the
shard edge extends 240 chips into the neighbor). Detections are claimed by
the shard that owns the preamble start sample, so the overlap region never
duplicates or drops a frame.

Detection tables stay fixed-shape per shard; indices are globalized with the
shard's time offset before being returned (gathered to host by jit's output
sharding, or all_gather'd explicitly for multi-host).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DspConfig
from ..dsp.pipeline import DetectionTable, demod_block


def _table_specs(spec):
    """out_specs for a DetectionTable - field count derived, not the
    magic '* 10' five hand-kept copies carried (r5 review)."""
    return DetectionTable(*([spec] * len(DetectionTable._fields)))


def _check_shard_block(n_loc: int, want: int, what: str = "time"):
    """Per-shard owned length must BE the expected block: a mismatch is
    silent corruption, not an error, downstream - undersized planar
    shards zero-pad and decode the right halo as owned (duplicate
    frames, wrong global indices), oversized f32 shards truncate (half
    the traffic vanishes) - r5 review, probe-confirmed. Shapes are
    static under jit, so this is a trace-time check."""
    if n_loc != want:
        raise ValueError(
            f"{what} shard owns {n_loc} samples but the expected "
            f"per-shard block is {want}: size the global input as "
            f"n_time * block (and the mesh to match)")


def _planar_defaults(cfg: DspConfig, tile, interpret):
    from ..kernels.preamble_pallas import default_tile
    if tile is None:
        tile = default_tile(cfg)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return tile, interpret


def _splice_ctx(x, lctx, rctx, left: int, right: int, axis: str = "time"):
    """First/last time shards take their outer halo from the provided
    stream context instead of the ring's zeros (ONE copy of the edge
    rule - it was hand-kept in both ctx builders, r5 review)."""
    t = jax.lax.axis_index(axis)
    nt = jax.lax.axis_size(axis)
    head = jnp.where(t == 0, lctx, x[:, :left])
    tail = jnp.where(t == nt - 1, rctx, x[:, -right:])
    return jnp.concatenate([head, x[:, left:-right], tail], axis=1)


def make_mesh(n_channel: int = 1, n_time: int = 1,
              devices=None) -> Mesh:
    """Build a ("channel", "time") mesh over the available devices.

    When the mesh uses ALL devices, lay it out with
    mesh_utils.create_device_mesh so time-axis ring neighbors are
    ICI-adjacent on a real pod (a naive jax.devices() reshape follows
    process/device ids, not torus coordinates — each ppermute halo hop
    could cross multiple links). Partial meshes / explicit device lists
    keep the caller's order."""
    import numpy as np
    explicit = devices is not None
    devices = devices if devices is not None else jax.devices()
    n = n_channel * n_time
    if n > len(devices):
        raise ValueError(f"mesh {n_channel}x{n_time} needs {n} devices, "
                         f"have {len(devices)}")
    if not explicit and n == len(devices) and n > 1:
        try:
            from jax.experimental import mesh_utils
            devs = mesh_utils.create_device_mesh((n_channel, n_time),
                                                 devices=devices)
            return Mesh(devs, ("channel", "time"))
        except Exception:
            pass          # fall back to the naive layout
    devs = np.asarray(devices[:n]).reshape(n_channel, n_time)
    return Mesh(devs, ("channel", "time"))


def _exchange_halos(x: jax.Array, left: int, right: int,
                    axis: str = "time") -> jax.Array:
    """Ring halo exchange along the time axis of the mesh.

    x: (C_loc, N_loc, ...) owned samples (interleaved (C, N, 2) float or
    planar (C, N) int8 — any trailing dims). Returns (C_loc, L+N_loc+R, ...)
    with the left halo from the previous shard and the right halo from the
    next (zeros at the stream boundaries — same semantics as the start/end
    of a file capture).
    """
    n_shards = jax.lax.axis_size(axis)
    # Send my tail to my right neighbor -> it becomes their left halo.
    tail = x[:, -left:]
    left_halo = jax.lax.ppermute(
        tail, axis, [(i, i + 1) for i in range(n_shards - 1)])
    # Send my head to my left neighbor -> it becomes their right halo.
    head = x[:, :right]
    right_halo = jax.lax.ppermute(
        head, axis, [(i + 1, i) for i in range(n_shards - 1)])
    return jnp.concatenate([left_halo, x, right_halo], axis=1)


def _globalize(table: DetectionTable, block: int,
               axis: str = "time") -> DetectionTable:
    """Local detection indices -> global sample offsets within the step."""
    offset = jax.lax.axis_index(axis).astype(jnp.int32) * block
    valid = table.index >= 0
    new_index = jnp.where(valid, table.index + offset, -1)
    return table._replace(index=new_index)


def make_sharded_demod(mesh: Mesh, cfg: DspConfig, *,
                       ablate_halos: bool = False):
    """Build the jitted multi-device demod step.

    Returns fn(iq) where iq is a global float32 array of shape
    (n_channels, n_time_shards * block_size, 2) sharded
    P("channel", "time", None); output DetectionTable arrays have a leading
    (n_channels, n_time_shards) axis pair, indices global in the step.

    ablate_halos=True replaces the ppermute halo exchange with local
    zeros — identical compute shape, zero communication. MEASUREMENT
    ONLY (frames straddling shard edges are lost): the with/without
    step-time delta is the empirical halo-exchange cost backing
    multihost.ici_scaling_model (VERDICT r2 #5).
    """
    left, right = cfg.left_halo, cfg.right_halo

    def shard_fn(iq_shard):
        # iq_shard: (C_loc, N_loc, 2) float32
        _check_shard_block(iq_shard.shape[1], cfg.block_size)
        if ablate_halos:
            padded = jnp.pad(iq_shard, ((0, 0), (left, right), (0, 0)))
        else:
            padded = _exchange_halos(iq_shard, left, right)
        table = jax.vmap(lambda x: demod_block(x, cfg))(padded)
        table = _globalize(table, cfg.block_size)
        # keep a leading time axis of size 1 per shard for clean stacking
        return jax.tree.map(lambda a: a[:, None], table)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=P("channel", "time", None),
        out_specs=_table_specs(P("channel", "time")),
    )
    return jax.jit(fn)


def _place(x, sharding: NamedSharding):
    """Host array -> sharded device array, multi-process-safe.

    Single process: plain device_put. Multi-process (a mesh spanning
    non-addressable devices): every process passes the SAME full array and
    contributes only its addressable shards via make_array_from_callback —
    the jax.distributed analog of the reference's per-machine zmq feed."""
    if jax.process_count() > 1:
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx])
    return jax.device_put(x, sharding)


def shard_input(iq, mesh: Mesh):
    """Place a host (C, T, 2) float32 array with the pipeline's sharding."""
    return _place(iq, NamedSharding(mesh, P("channel", "time", None)))


def make_sharded_demod_ctx(mesh: Mesh, cfg: DspConfig):
    """Sharded demod step with STREAM context at the step edges.

    fn(iq, lctx, rctx): iq as in make_sharded_demod; lctx (C, left_halo, 2)
    is the stream immediately BEFORE this step and rctx (C, right_halo, 2)
    immediately AFTER it (zeros at the true stream start/end). The interior
    shards still exchange halos over ICI; the first/last time shards take
    their outer halo from the provided context instead of zeros — without
    this, a frame straddling two consecutive steps of a long stream is
    silently lost (its body reads zeros). Used by dist.multihost.PodPipeline,
    whose run_stream slices the context from the neighboring steps'
    device-resident inputs inside the jit (r4; run_step still takes host
    arrays).
    """
    left, right = cfg.left_halo, cfg.right_halo

    def shard_fn(iq_shard, lctx, rctx):
        _check_shard_block(iq_shard.shape[1], cfg.block_size)
        padded = _splice_ctx(_exchange_halos(iq_shard, left, right),
                             lctx, rctx, left, right)
        table = jax.vmap(lambda x: demod_block(x, cfg))(padded)
        table = _globalize(table, cfg.block_size)
        return jax.tree.map(lambda a: a[:, None], table)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("channel", "time", None),
                  P("channel", None, None), P("channel", None, None)),
        out_specs=_table_specs(P("channel", "time")),
    )
    return jax.jit(fn)


def make_sharded_demod_planar(mesh: Mesh, cfg: DspConfig, tile: int = None,
                              interpret: bool = None):
    """The production planar-int8 Pallas demod under shard_map.

    Same mesh semantics as make_sharded_demod, but the per-shard compute is
    the traffic-minimal fused kernel (demod_batch_planar) and the streams
    stay PLANAR int8 end to end — the ppermute halos carry 1 byte/sample
    per stream over ICI, 8x less than the f32 (N, 2) layout.

    Returns fn(xi, xq): two global int8 arrays of shape
    (n_channels, n_time_shards * block_size) sharded P("channel", "time").
    interpret=None auto-selects Pallas interpret mode off-TPU (the CPU-mesh
    test/dryrun path); on TPU the compiled kernel runs per chip.
    """
    from ..kernels.preamble_pallas import demod_batch_planar, planar_length

    tile, interpret = _planar_defaults(cfg, tile, interpret)
    left, right = cfg.left_halo, cfg.right_halo
    p = planar_length(cfg, tile)

    def shard_fn(xi_shard, xq_shard):
        # (C_loc, N_loc) int8 owned samples per planar stream
        _check_shard_block(xi_shard.shape[1], cfg.block_size)
        xi = _exchange_halos(xi_shard, left, right)
        xq = _exchange_halos(xq_shard, left, right)
        pad = p - xi.shape[1]
        xi = jnp.pad(xi, ((0, 0), (0, pad)))
        xq = jnp.pad(xq, ((0, 0), (0, pad)))
        table = demod_batch_planar(xi, xq, cfg, tile=tile,
                                   interpret=interpret)
        table = _globalize(table, cfg.block_size)
        return jax.tree.map(lambda a: a[:, None], table)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("channel", "time"), P("channel", "time")),
        out_specs=_table_specs(P("channel", "time")),
        # pallas_call outputs don't carry vma metadata; skip the check
        check_vma=False,
    )
    return jax.jit(fn)


def shard_input_planar(xi, xq, mesh: Mesh):
    """Place host (C, T) int8 planar streams with the pipeline's sharding."""
    s = NamedSharding(mesh, P("channel", "time"))
    return _place(xi, s), _place(xq, s)


def shard_input_resample_planar(iqp, mesh: Mesh):
    """Place a host PLANAR (C, 2, T_raw) f32 array with the fused
    resample pipeline's sharding (make_sharded_resample_demod
    planar=True)."""
    return _place(iqp, NamedSharding(mesh, P("channel", None, "time")))


def make_sharded_demod_planar_ctx(mesh: Mesh, cfg: DspConfig,
                                  tile: int = None, interpret: bool = None):
    """Planar-int8 sharded demod with STREAM context at the step edges.

    The ctx analog of make_sharded_demod_ctx for the production planar
    kernel: fn(xi, xq, li, lq, ri, rq) where xi/xq are the global
    (n_channels, n_time_shards * block_size) int8 planar streams sharded
    P("channel", "time"), li/lq are (C, left_halo) int8 context immediately
    BEFORE this step and ri/rq (C, right_halo) immediately AFTER it (zeros
    at the true stream start/end). Interior shards exchange halos over ICI
    (1 byte/sample/stream — 8x less than the f32 layout); the first/last
    time shards take their outer halo from the provided context, so a frame
    straddling two consecutive steps of a long stream decodes exactly once.
    Used by dist.multihost.PodPipeline(planar=True). (Ref: GR history
    semantics, gr::block::set_history in lib/preamble_impl.cc.)
    """
    from ..kernels.preamble_pallas import demod_batch_planar, planar_length

    tile, interpret = _planar_defaults(cfg, tile, interpret)
    left, right = cfg.left_halo, cfg.right_halo
    p = planar_length(cfg, tile)

    def one_stream(x_shard, lctx, rctx):
        _check_shard_block(x_shard.shape[1], cfg.block_size)
        x = _splice_ctx(_exchange_halos(x_shard, left, right),
                        lctx, rctx, left, right)
        return jnp.pad(x, ((0, 0), (0, p - x.shape[1])))

    def shard_fn(xi_shard, xq_shard, li, lq, ri, rq):
        xi = one_stream(xi_shard, li, ri)
        xq = one_stream(xq_shard, lq, rq)
        table = demod_batch_planar(xi, xq, cfg, tile=tile,
                                   interpret=interpret)
        table = _globalize(table, cfg.block_size)
        return jax.tree.map(lambda a: a[:, None], table)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P("channel", "time"), P("channel", "time"),
                  P("channel", None), P("channel", None),
                  P("channel", None), P("channel", None)),
        out_specs=_table_specs(P("channel", "time")),
        # pallas_call outputs don't carry vma metadata; skip the check
        check_vma=False,
    )
    return jax.jit(fn)


def make_sharded_resample_demod(mesh: Mesh, cfg: DspConfig,
                                p: int, q: int, taps_per_phase: int = 12,
                                planar: bool = False, tile: int = None,
                                interpret: bool = None):
    """Fused resample + demod in ONE sharded XLA program.

    For SDR captures at rate != channel_rate the single-chip CLI runs the
    polyphase resampler as a separate program in front of the demod; here
    both stages fuse into one shard_map step so multi-chip streams never
    round-trip through HBM-visible intermediates or the host:

      raw-rate shard --ppermute 128q-group halos--> group-matmul resample
        --on-device int8 quantize--> ppermute demod halos (int8 planar,
        1 byte/sample/stream) --> planar Pallas demod

    planar=True selects the production planar-int8 Pallas kernel (r4 #1:
    the demod_block fallback runs ~350x below it — gathers lower
    sequentially on TPU); the default False keeps the f32 XLA path.
    EXPLICIT, not backend-auto: planar changes the returned arity (gain
    argument), so an environment-dependent default would break callers.

    Planar: fn(iqp, gain) — iqp is PLANAR float32
    (n_channels, 2, n_time * raw_block) sharded P("channel", None,
    "time") (a minor-dim-2 interleaved device array reads ~15x slower
    through a tile-padded relayout — r5 stage probe; hosts split I/Q
    with two strided copies); gain is the REQUIRED int8 quantization
    gain (traced scalar or (C,) per-channel vector; report dBFS with
    full_scale = gain/127 — device AGC is single-chip-only, see
    resample/fused.py: per-shard AGC would mint different full_scales
    per time shard). ONE-SHOT semantics: both stream edges read zeros —
    there is no ctx variant yet, so multi-step streaming through this
    builder would lose frames straddling step boundaries (use
    PodPipeline + host resample, or add a ctx variant first). f32: fn(iq) with iq
    interleaved (n_channels, n_time * raw_block, 2) sharded
    P("channel", "time", None). raw_block = cfg.block_size * q / p
    (must be an integer multiple of 128q — i.e. cfg.block_size a multiple
    of 128p). Detection indices are global in the RESAMPLED (channel-rate)
    domain, matching what a host-side resample-then-demod produces.
    """
    from ..resample.fused import quantize_i8, raw_geometry
    from ..resample.polyphase import (_to_interleaved, _to_planar,
                                      resample_groups_halo)

    gi = 128 * q
    raw_geometry(cfg, p, q)        # validates block alignment + pq cap
    raw_block = cfg.block_size * q // p
    left, right = cfg.left_halo, cfg.right_halo
    on_tpu = jax.default_backend() == "tpu"

    def to_planar(x2):
        # (N, 2) -> (2, N): on TPU ANY op materializing a minor-dim-2
        # array relayouts through a 64x tile-padded buffer — permute lanes
        # on the MXU instead (polyphase._to_planar)
        return _to_planar(x2) if on_tpu else x2.T

    def to_interleaved(yc):
        return _to_interleaved(yc) if on_tpu else yc.T

    def resample_shard(iq_shard):
        # (C_loc, raw_block, 2) f32 at the raw rate -> (C_loc, 2, block)
        _check_shard_block(iq_shard.shape[1], raw_block, "raw-rate time")
        padded = _exchange_halos(iq_shard, gi, gi)       # resample halos
        c_loc = padded.shape[0]
        xc = jax.vmap(to_planar)(padded).reshape(2 * c_loc, -1)
        yc = resample_groups_halo(xc, p, q, taps_per_phase)
        return yc.reshape(c_loc, 2, -1)

    if not planar:
        def shard_fn(iq_shard):
            y = jax.vmap(to_interleaved)(resample_shard(iq_shard))
            y = _exchange_halos(y, left, right)          # demod halos
            table = jax.vmap(lambda x: demod_block(x, cfg))(y)
            table = _globalize(table, cfg.block_size)
            return jax.tree.map(lambda a: a[:, None], table)

        fn = shard_map(
            shard_fn, mesh=mesh,
            in_specs=P("channel", "time", None),
            out_specs=_table_specs(P("channel", "time")),
        )
        return jax.jit(fn)

    from ..kernels.preamble_pallas import (default_tile, demod_batch_planar,
                                           planar_length)
    if tile is None:
        tile = default_tile(cfg)
    if interpret is None:
        interpret = not on_tpu
    plen = planar_length(cfg, tile)

    def shard_fn_planar(iqp_shard, gain):
        # (C_loc, 2, raw_block) PLANAR f32 at the raw rate
        _check_shard_block(iqp_shard.shape[2], raw_block, "raw-rate time")
        c_loc = iqp_shard.shape[0]
        ri = _exchange_halos(iqp_shard[:, 0], gi, gi)     # resample halos
        rq = _exchange_halos(iqp_shard[:, 1], gi, gi)
        xc = jnp.concatenate([ri[:, None], rq[:, None]],
                             axis=1).reshape(2 * c_loc, -1)
        yc = resample_groups_halo(xc, p, q, taps_per_phase)
        y = yc.reshape(c_loc, 2, -1)
        # gain is caller-supplied here (scalar or per-channel) — device
        # AGC inside shard_map would mint a DIFFERENT gain per time
        # shard, breaking the one-full_scale-per-stream dBFS contract;
        # the single-chip fused path (resample/fused.py) offers AGC
        g = jnp.asarray(gain, jnp.float32)
        if g.ndim == 0:
            gain_c = jnp.broadcast_to(g, (c_loc,))
        else:
            # the (C,) vector rides in replicated (in_spec P()); each
            # shard takes its own channel slice — indexing the full
            # vector with c_loc < C failed at trace time on any
            # channel-sharded mesh (r5 review, probe-confirmed)
            n_ch = c_loc * jax.lax.axis_size("channel")
            if g.shape[0] != n_ch:
                # dynamic_slice CLAMPS out-of-range starts: a wrong-
                # length vector would silently reuse tail gains (wrong
                # full_scale/dBFS) instead of failing loudly
                raise ValueError(f"gain vector has {g.shape[0]} entries "
                                 f"for {n_ch} channels")
            off = jax.lax.axis_index("channel") * c_loc
            gain_c = jax.lax.dynamic_slice_in_dim(g, off, c_loc)
        y8 = quantize_i8(y, jnp.repeat(gain_c, 2).reshape(c_loc, 2, 1))
        xi = _exchange_halos(y8[:, 0], left, right)       # int8 ICI halos
        xq = _exchange_halos(y8[:, 1], left, right)
        pad = plen - xi.shape[1]
        xi = jnp.pad(xi, ((0, 0), (0, pad)))
        xq = jnp.pad(xq, ((0, 0), (0, pad)))
        table = demod_batch_planar(xi, xq, cfg, tile=tile,
                                   interpret=interpret)
        table = _globalize(table, cfg.block_size)
        return jax.tree.map(lambda a: a[:, None], table)

    fn = shard_map(
        shard_fn_planar, mesh=mesh,
        in_specs=(P("channel", None, "time"), P()),
        out_specs=_table_specs(P("channel", "time")),
        # pallas_call outputs don't carry vma metadata; skip the check
        check_vma=False,
    )
    return jax.jit(fn)

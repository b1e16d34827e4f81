"""Evidence-based VPU ops/sample for the planar detect kernel.

bench.py's `vpu_util_est` canary used a hard-coded 85.0 ops/sample
(folklore from the r2/r3 ablation probes, VERDICT r3 weak #5): any kernel
change that altered the op count silently skewed the very regression
canary the number exists for. This module derives the figure from the
kernel itself: trace the per-tile compute body (`_detect_keep_2d` + the
int8 load conversion + unordered candidate extraction — exactly what
`_detect_kernel_cands_i8_db` runs per tile) to a jaxpr and count
elementwise vector-op output elements, normalized per owned sample.

The model: every elementwise primitive (arithmetic, compare, logical,
select, convert, cross-lane roll) costs one (8, 128)-lane VPU pass per
output element; pure data movement the compiler folds away (slice,
broadcast, reshape) costs zero; `dot_general` rides the MXU and is
reported separately as MACs. This is the same first-order model the
ablation probes validated (measured stage deltas tracked the shift/pass
counts), so the derived number lands in the probes' 80-90 band — but now
it moves WITH the kernel instead of rotting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import DspConfig

# one VPU pass per output element
_VPU_PRIMS = {
    "add", "sub", "mul", "div", "neg", "abs", "sign",
    "max", "min", "and", "or", "not", "xor",
    "lt", "le", "gt", "ge", "eq", "ne",
    "select_n", "convert_element_type", "integer_pow",
    "tpu_roll", "roll", "rem", "shift_right_logical", "shift_left",
    "exp", "log", "rsqrt", "sqrt",
}
# zero-cost data movement / layout (folded by Mosaic/XLA)
_FREE_PRIMS = {
    "slice", "squeeze", "broadcast_in_dim", "reshape", "concatenate",
    "transpose", "iota", "copy", "stop_gradient", "pad", "rev",
}
# pathological on TPU (sequential lowering, ~2.5 us per element/slice —
# CLAUDE.md): counted at output size AND surfaced like unknowns, so a
# kernel revision that reintroduces one fails the canary test instead of
# being silently scored cheap (r5 review: these sat in _FREE_PRIMS,
# bypassing exactly the drift detection they most need)
_SEQUENTIAL_PRIMS = {"gather", "dynamic_slice", "scatter",
                     "dynamic_update_slice", "sort"}
# reductions: one pass over the INPUT elements
_REDUCE_PRIMS = {"reduce_sum", "reduce_max", "reduce_min", "reduce_and",
                 "reduce_or", "argmax", "argmin", "cumsum", "cumlogsumexp"}


def count_ops(fn, *avals):
    """Trace fn on ShapeDtypeStructs and count vector-op elements.

    Returns {"vpu_elems": int, "mxu_macs": int, "by_prim": dict,
    "unknown": set, "sequential": set} — unknown primitives are counted
    as VPU passes too (conservative: a new primitive inflates rather
    than hides cost) and surfaced so the test catches model drift;
    "sequential" surfaces gather/scatter-class primitives the same way
    (they lower to per-element loops on TPU — a kernel must never
    contain one).
    """
    jaxpr = jax.make_jaxpr(fn)(*avals)
    vpu = 0
    macs = 0
    by_prim: dict = {}
    unknown = set()
    sequential = set()
    # compile-time-constant value tracking: iota outputs, literals, and
    # any op of only-static inputs are folded by the compiler (e.g. the
    # lane masks `iota < k` in _shift2d cost nothing at run time)
    static_vars: set = set()

    def size(v):
        n = 1
        for d in v.aval.shape:
            n *= d
        return n

    def is_static(v):
        return not hasattr(v, "count") or v in static_vars

    def walk(jxp):
        nonlocal vpu, macs
        for eqn in jxp.eqns:
            name = eqn.primitive.name
            if name in ("pjit", "jit", "closed_call", "custom_jvp_call",
                        "custom_vjp_call", "remat", "checkpoint"):
                sub = (eqn.params.get("jaxpr")
                       or eqn.params.get("call_jaxpr"))
                if sub is not None:
                    inner = sub.jaxpr if hasattr(sub, "jaxpr") else sub
                    # propagate static-ness across the call boundary
                    for outer, invar in zip(eqn.invars, inner.invars):
                        if is_static(outer):
                            static_vars.add(invar)
                    walk(inner)
                    for outer, outvar in zip(eqn.outvars, inner.outvars):
                        if is_static(outvar):
                            static_vars.add(outer)
                continue
            if name == "iota" or all(is_static(v) for v in eqn.invars):
                static_vars.update(eqn.outvars)
                continue
            if name == "dot_general":
                a = eqn.invars[0].aval
                out = size(eqn.outvars[0])
                ((lc, _rc), _) = eqn.params["dimension_numbers"]
                k = 1
                for d in lc:
                    k *= a.shape[d]
                macs += out * k
                by_prim[name] = by_prim.get(name, 0) + out * k
                continue
            if name in _FREE_PRIMS:
                continue
            if name in _REDUCE_PRIMS:
                n = size(eqn.invars[0])
            elif name in _SEQUENTIAL_PRIMS:
                sequential.add(name)
                n = size(eqn.outvars[0]) if eqn.outvars else 0
            elif name in _VPU_PRIMS:
                n = size(eqn.outvars[0])
            else:
                unknown.add(name)
                n = size(eqn.outvars[0]) if eqn.outvars else 0
            vpu += n
            by_prim[name] = by_prim.get(name, 0) + n

    walk(jaxpr.jaxpr)
    return {"vpu_elems": vpu, "mxu_macs": macs, "by_prim": by_prim,
            "unknown": unknown, "sequential": sequential}


def detect_ops_per_sample(cfg: DspConfig, tile: int = None) -> float:
    """VPU ops per owned sample of the production planar detect tile.

    Traces the exact per-tile body `_detect_kernel_cands_i8_db` executes
    (int8->f32 load scale, `_detect_keep_2d`, unordered candidate
    extraction) on the real window geometry.
    """
    from .preamble_pallas import (_COUNT_ROW, _detect_keep_2d,
                                  _extract_cands_unordered,
                                  _planar_geometry, cand_capacity,
                                  DEFAULT_NBUF, default_tile)
    if tile is None:
        tile = default_tile(cfg)
    trows, rows_w, _, _ = _planar_geometry(cfg, tile)
    # the unordered layout physically caps per_lane at the count rows
    # (same clamp preamble_detect_cands_planar applies)
    per_lane = min(cand_capacity(tile)[1], _COUNT_ROW)
    nbuf = DEFAULT_NBUF
    scale = jnp.float32(1.0 / 127.0)

    def body(i8_slots, q8_slots, slot):
        # mirror _detect_kernel_cands_i8_db's per-tile compute EXACTLY,
        # including the nbuf rotating-slot select (one extra convert +
        # select per stream window at nbuf=2 — ~4 ops/sample the r5
        # review found undercounted)
        xi = i8_slots[0].astype(jnp.float32)
        xq = q8_slots[0].astype(jnp.float32)
        for s in range(1, nbuf):
            xi = jnp.where(slot == s, i8_slots[s].astype(jnp.float32), xi)
            xq = jnp.where(slot == s, q8_slots[s].astype(jnp.float32), xq)
        keep, _ = _detect_keep_2d(xi * scale, xq * scale, cfg=cfg,
                                  tile=tile)
        return _extract_cands_unordered(keep, trows, per_lane)

    aval = jax.ShapeDtypeStruct((nbuf, rows_w, 128), jnp.int8)
    c = count_ops(body, aval, aval,
                  jax.ShapeDtypeStruct((), jnp.int32))
    # the canary must never silently absorb a mismodeled primitive in
    # ANY part of the traced body (the test additionally checks the
    # detect core alone)
    assert not c["unknown"], c["unknown"]
    assert not c["sequential"], c["sequential"]
    return c["vpu_elems"] / float(tile)


if __name__ == "__main__":
    # `python -m airmodes.kernels.opcount` — regenerate the checked-in
    # evidence file the regression test pins bench.py's canary against.
    import json
    import os

    cfg = DspConfig(block_size=1 << 22, max_detections=256)
    ops = detect_ops_per_sample(cfg)
    # per-sps entries (VERDICT r4 #4): the kernel costs more per sample
    # at sps > 1 (chip-energy integration + quiet offsets span 16*sps
    # samples); pinning each supported rate's count lets bench derive
    # utilization at the 10 Msps (sps=5) operating point too
    per_sps = {}
    for rate in (2e6, 4e6, 10e6):
        c = DspConfig(channel_rate=rate, block_size=1 << 22,
                      max_detections=256)
        per_sps[str(c.sps)] = round(detect_ops_per_sample(c), 3)
    out = {"vpu_ops_per_sample": round(ops, 3),
           "per_sps": per_sps,
           "cfg": {"block_size": cfg.block_size, "sps": cfg.sps,
                   "mxu_window_sum": cfg.mxu_window_sum},
           "method": "jaxpr elementwise-op count of the per-tile kernel "
                     "body (airmodes.kernels.opcount)"}
    path = os.path.join(os.path.dirname(__file__), "vpu_ops.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))

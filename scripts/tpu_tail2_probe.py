"""Probe faster slice + ECC formulations."""
import time, functools
import numpy as np
import jax, jax.numpy as jnp
from airmodes.config import DspConfig
from airmodes.dsp import pipeline as P
from airmodes.testing import encoder
from airmodes.io import sources

cfg = DspConfig(block_size=1 << 20, max_detections=128)
frames = encoder.random_df17_frames(60, seed=61)
iq, _ = encoder.make_capture(frames, snr_db=18.0, spacing=12000, seed=61,
                             total_samples=cfg.block_size)
block, _ = next(sources.frame_blocks(iq, cfg))
x = jax.device_put(P.iq_to_device_layout(block))
mag2 = jax.block_until_ready(jax.jit(P.magnitude_squared)(x))
noise = jax.jit(functools.partial(P.noise_floor, window=128))(mag2)
mask, ref = jax.jit(lambda m, nf: P.preamble_detect(m, nf, cfg, cfg.left_halo, cfg.block_size))(mag2, noise)
det_idx, valid, n_det, ovf = jax.jit(lambda mk: P.compact_detections(mk, cfg.max_detections))(mask)
safe = jnp.where(valid, det_idx, 0)
rl = ref[safe]
jax.block_until_ready((det_idx, rl))

def bench(name, fn, *args, iters=30):
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))
    t0 = time.time()
    for _ in range(iters):
        o = f(*args)
    jax.block_until_ready(o)
    print(f'{name}: {(time.time()-t0)/iters*1e3:.3f} ms', flush=True)
    return o

b0 = bench('slice gather (old)', lambda m, di, v, r: P.slice_bits(m, di, v, r, cfg, cfg.left_halo), mag2, det_idx, valid, rl)

def slice_v2(m, det_idx, valid, ref_level):
    sps = cfg.sps
    base = cfg.left_halo + jnp.where(valid, det_idx, 0) + 16 * sps
    win = 224 * sps
    wins = jax.vmap(lambda b: jax.lax.dynamic_slice(m, (b,), (win,)))(base)
    if sps > 1:
        wins = wins.reshape(-1, 224, sps).mean(axis=-1)
    e0 = wins[:, 0::2]
    e1 = wins[:, 1::2]
    bits = e0 > e1
    level = ref_level[:, None] * jnp.float32(cfg.confidence_level)
    confd = jnp.logical_xor(e0 > level, e1 > level)
    return bits, confd

b1 = bench('slice dynslice (new)', slice_v2, mag2, det_idx, valid, rl)
print('slice equal:', bool(np.array_equal(np.asarray(b0[0]), np.asarray(b1[0]))) and
      bool(np.array_equal(np.asarray(b0[1]), np.asarray(b1[1]))), flush=True)

bits, conf = b0
c0 = bench('crc+ecc (old)', lambda b, c: P.crc_check_and_correct(b, c, cfg), bits, conf)

def crc_v2(bits, confidence):
    import numpy as _np
    from airmodes import crc as _crc
    rows112 = jnp.asarray(_crc.syndrome_rows(112).astype(_np.int32))
    rows56 = jnp.zeros(112, jnp.int32).at[:56].set(
        jnp.asarray(_crc.syndrome_rows(56).astype(_np.int32)))
    k = bits.shape[0]
    bits_i = bits.astype(jnp.int32)
    df = jnp.sum(bits_i[:, :5] << (4 - jnp.arange(5, dtype=jnp.int32))[None, :], axis=1)
    is_long = df >= 16
    nbits = jnp.where(is_long, 112, 56)
    lane = jnp.arange(112, dtype=jnp.int32)
    in_frame = lane[None, :] < nbits[:, None]
    fbits = jnp.where(in_frame, bits_i, 0)
    synd112 = P._packed_syndrome(fbits, rows112)
    synd56 = P._packed_syndrome(fbits, rows56)
    synd = jnp.where(is_long, synd112, synd56)
    rows = jnp.where(is_long[:, None], rows112[None, :], rows56[None, :])

    lowconf = jnp.logical_not(confidence) & in_frame
    n_lowconf = jnp.sum(lowconf.astype(jnp.int32), axis=1)

    # gather the first 8 low-confidence positions per frame
    L = 8
    lcscore = jnp.where(lowconf, 112 - lane[None, :], 0)
    _, lcpos = jax.lax.top_k(lcscore, L)                       # (K, L) ascending pos
    lcvalid = jnp.take_along_axis(lowconf, lcpos, axis=1)      # (K, L)
    lcrows = jnp.take_along_axis(rows, lcpos, axis=1)          # (K, L)
    lcrows = jnp.where(lcvalid, lcrows, -1)  # -1 never matches a 24-bit value

    match1 = lcrows == synd[:, None]                           # (K, L)
    has1 = jnp.any(match1, axis=1)
    flip1 = jnp.take_along_axis(lcpos, jnp.argmax(match1, axis=1)[:, None], 1)[:, 0]

    pair = (synd[:, None, None] ^ lcrows[:, :, None]) == lcrows[:, None, :]
    pair &= lcvalid[:, :, None] & lcvalid[:, None, :]
    iL = jnp.arange(L)
    pair &= iL[None, :, None] < iL[None, None, :]
    has2 = jnp.any(pair, axis=(1, 2))
    pf = pair.reshape(k, -1)
    first = jnp.argmax(pf, axis=1)
    f2i = jnp.take_along_axis(lcpos, (first // L)[:, None], 1)[:, 0]
    f2j = jnp.take_along_axis(lcpos, (first % L)[:, None], 1)[:, 0]

    ecc_allowed = ((df == 17) | (df == 18)) & (n_lowconf <= cfg.max_lowconf_bits)
    ok0 = synd == 0
    use1 = ecc_allowed & ~ok0 & has1
    use2 = ecc_allowed & ~ok0 & ~has1 & has2
    flip_mask = (use1[:, None] & (lane[None, :] == flip1[:, None]))
    flip_mask |= (use2[:, None] & ((lane[None, :] == f2i[:, None]) |
                                   (lane[None, :] == f2j[:, None])))
    out_bits = jnp.logical_xor(bits, flip_mask)
    out_synd = jnp.where(use1 | use2, 0, synd)
    df11_ok = (df == 11) & ((synd & 0x7F) == 0)
    df17_ok = ((df == 17) | (df == 18)) & (ok0 | use1 | use2)
    addr_type = ((df == 0) | (df == 4) | (df == 5) | (df == 16) |
                 (df == 20) | (df == 21) | (df >= 24))
    status = jnp.full((k,), P.STATUS_FAIL, jnp.int32)
    status = jnp.where(addr_type, P.STATUS_ADDR, status)
    status = jnp.where(df17_ok & ok0, P.STATUS_CRC_OK, status)
    status = jnp.where(use1, P.STATUS_CORRECTED_1, status)
    status = jnp.where(use2, P.STATUS_CORRECTED_2, status)
    status = jnp.where(df11_ok, P.STATUS_CRC_OK, status)
    return out_bits, df, nbits, out_synd, status

c1 = bench('crc+ecc (lcpos)', crc_v2, bits, conf)
eq = all(bool(np.array_equal(np.asarray(a), np.asarray(b))) for a, b in zip(c0, c1))
print('crc equal:', eq, flush=True)

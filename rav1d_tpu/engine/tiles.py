"""Tiled inter execution (engine v2).

Every inter pixel job — 8-tap/bilin puts, warp tiles, compound preps and
combines, OBMC lap blends — decomposes into 8x8 destination tiles against
a device-resident stack of reference planes. Tiles of every block size,
subpel phase, and reference share the same fixed-chunk kernels, so the jit
key space is a small constant per (frame shape, bitdepth): the per-tile
parameters (stack row, source position, phases, filter, destination, valid
extents, mask addressing) are DATA in the frame's single packed upload.

Role parity: src/recon.rs mc:2025 / warp_affine:2311 / obmc:2205 and the
compound combiners of src/mc.rs:1322-1338, re-expressed as batched
gather->filter->scatter over tile descriptors. Bit-exactness per tile holds
because the reference's filters are pointwise over output pixels with
pixel-clamped source gathers (emu_edge semantics), so any block/tile
decomposition computes identical values.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ref.mc import FILTER_DIR, intermediate_bits
from ..tables.spec_data import MC_SUBPEL_FILTERS, MC_WARP_FILTER

TB = 1024  # tiles per dispatch chunk (batch length never enters jit keys)

# descriptor rows (put/prep): see _put_desc
D_SROW, D_SY, D_SX, D_MX, D_MY, D_F2D, D_FLAT0, D_TW, D_TH, D_BW, D_BH = \
    range(11)
NPUT = 11


def _i16(a):
    return ((a + 0x8000) & 0xFFFF) - 0x8000


def _gather(srcstack, srow, y0, nrow, x0, ncol, vw, vh):
    rows = jnp.clip(y0[:, None] + jnp.arange(nrow)[None, :], 0, vh - 1)
    cols = jnp.clip(x0[:, None] + jnp.arange(ncol)[None, :], 0, vw - 1)
    return srcstack[
        srow[:, None, None], rows[:, :, None], cols[:, None, :]
    ].astype(jnp.int32)


def _filters(d, w_is_4_col, h_is_4_col):
    F = jnp.asarray(np.asarray(MC_SUBPEL_FILTERS), jnp.int32)
    FD = jnp.asarray(np.asarray(FILTER_DIR), jnp.int32)[d[D_F2D]]
    hi = jnp.where(d[D_BW] > 4, FD[:, 0], 3 + (FD[:, 0] & 1))
    vi = jnp.where(d[D_BH] > 4, FD[:, 1], 3 + (FD[:, 1] & 1))
    return F[hi, d[D_MX] - 1], F[vi, d[D_MY] - 1]


def _scatter(pf, out, d, aw):
    r = jnp.arange(8)
    idx = d[D_FLAT0][:, None, None] + r[None, :, None] * aw + r[None, None, :]
    valid = (r[None, :, None] < d[D_TH][:, None, None]) & (
        r[None, None, :] < d[D_TW][:, None, None]
    )
    big = jnp.iinfo(jnp.int32).max
    return pf.at[jnp.where(valid, idx, big)].set(out, mode="drop")


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8), donate_argnums=(0,))
def put_tiles(pf, srcstack, d, case_h, case_v, vw, vh, bpc, aw):
    """8-tap put over 8x8 tiles (mc.rs put_8tap_rust:130 semantics)."""
    fh, fv = _filters(d, None, None)
    ib = intermediate_bits(bpc)
    pxmax = (1 << bpc) - 1
    sy, sx = d[D_SY], d[D_SX]
    if case_h and case_v:
        win = _gather(srcstack, d[D_SROW], sy - 3, 15, sx - 3, 15, vw, vh)
        mid = jnp.zeros((win.shape[0], 15, 8), jnp.int32)
        for k in range(8):
            mid = mid + fh[:, k, None, None] * win[:, :, k : k + 8]
        sh = 6 - ib
        mid = _i16((mid + ((1 << sh) >> 1)) >> sh)
        out = jnp.zeros((win.shape[0], 8, 8), jnp.int32)
        for k in range(8):
            out = out + fv[:, k, None, None] * mid[:, k : k + 8, :]
        sh = 6 + ib
        out = jnp.clip((out + ((1 << sh) >> 1)) >> sh, 0, pxmax)
    elif case_h:
        win = _gather(srcstack, d[D_SROW], sy, 8, sx - 3, 15, vw, vh)
        out = jnp.zeros((win.shape[0], 8, 8), jnp.int32)
        for k in range(8):
            out = out + fh[:, k, None, None] * win[:, :, k : k + 8]
        rnd = 32 + ((1 << (6 - ib)) >> 1)
        out = jnp.clip((out + rnd) >> 6, 0, pxmax)
    elif case_v:
        win = _gather(srcstack, d[D_SROW], sy - 3, 15, sx, 8, vw, vh)
        out = jnp.zeros((win.shape[0], 8, 8), jnp.int32)
        for k in range(8):
            out = out + fv[:, k, None, None] * win[:, k : k + 8, :]
        out = jnp.clip((out + 32) >> 6, 0, pxmax)
    else:
        out = _gather(srcstack, d[D_SROW], sy, 8, sx, 8, vw, vh)
    return _scatter(pf, out, d, aw)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8), donate_argnums=(0,))
def prep_tiles(pool, srcstack, d, case_h, case_v, vw, vh, bpc, aw):
    """8-tap prep over 8x8 tiles into the compound pool (mc.rs
    prep_8tap_rust:277 semantics; aw = pool row stride = 8)."""
    fh, fv = _filters(d, None, None)
    ib = intermediate_bits(bpc)
    bias = 0 if bpc == 8 else 8192
    sy, sx = d[D_SY], d[D_SX]
    if case_h and case_v:
        win = _gather(srcstack, d[D_SROW], sy - 3, 15, sx - 3, 15, vw, vh)
        mid = jnp.zeros((win.shape[0], 15, 8), jnp.int32)
        for k in range(8):
            mid = mid + fh[:, k, None, None] * win[:, :, k : k + 8]
        sh = 6 - ib
        mid = _i16((mid + ((1 << sh) >> 1)) >> sh)
        out = jnp.zeros((win.shape[0], 8, 8), jnp.int32)
        for k in range(8):
            out = out + fv[:, k, None, None] * mid[:, k : k + 8, :]
        out = ((out + 32) >> 6) - bias
    elif case_h:
        win = _gather(srcstack, d[D_SROW], sy, 8, sx - 3, 15, vw, vh)
        out = jnp.zeros((win.shape[0], 8, 8), jnp.int32)
        for k in range(8):
            out = out + fh[:, k, None, None] * win[:, :, k : k + 8]
        sh = 6 - ib
        out = ((out + ((1 << sh) >> 1)) >> sh) - bias
    elif case_v:
        win = _gather(srcstack, d[D_SROW], sy - 3, 15, sx, 8, vw, vh)
        out = jnp.zeros((win.shape[0], 8, 8), jnp.int32)
        for k in range(8):
            out = out + fv[:, k, None, None] * win[:, k : k + 8, :]
        sh = 6 - ib
        out = ((out + ((1 << sh) >> 1)) >> sh) - bias
    else:
        out = (_gather(srcstack, d[D_SROW], sy, 8, sx, 8, vw, vh) << ib) - bias
    return _scatter(pool, _i16(out), d, aw)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7), donate_argnums=(0,))
def bilin_tiles(pf, srcstack, d, is_prep, vw, vh, bpc, aw):
    """Bilinear put/prep tiles; all four phase cases fused with selects
    (mc.rs put_bilin_rust:431 / prep_bilin_rust:543)."""
    ib = intermediate_bits(bpc)
    ird = (1 << ib) >> 1
    pxmax = (1 << bpc) - 1
    bias = 0 if bpc == 8 else 8192
    win = _gather(srcstack, d[D_SROW], d[D_SY], 9, d[D_SX], 9, vw, vh)
    mx = d[D_MX][:, None, None]
    my = d[D_MY][:, None, None]
    sh_h = 4 - ib
    hrnd = (1 << sh_h) >> 1
    hsrc = win[:, :, :8]
    hf = 16 * hsrc + mx * (win[:, :, 1:9] - hsrc)
    mid_f = _i16((hf + hrnd) >> sh_h)
    vf_f = 16 * mid_f[:, :8, :] + my * (mid_f[:, 1:9, :] - mid_f[:, :8, :])
    vf_r = 16 * hsrc[:, :8, :] + my * (hsrc[:, 1:9, :] - hsrc[:, :8, :])
    if is_prep:
        out = jnp.where(
            my != 0,
            jnp.where(mx != 0, (vf_f + 8) >> 4, (vf_r + hrnd) >> sh_h),
            jnp.where(mx != 0, (hf[:, :8, :] + hrnd) >> sh_h,
                      hsrc[:, :8, :] << ib),
        )
        out = _i16(out - bias)
    else:
        sh_v = 4 + ib
        out = jnp.where(
            my != 0,
            jnp.where(mx != 0, (vf_f + ((1 << sh_v) >> 1)) >> sh_v,
                      (vf_r + 8) >> 4),
            jnp.where(mx != 0, (mid_f[:, :8, :] + ird) >> ib, hsrc[:, :8, :]),
        )
        out = jnp.clip(out, 0, pxmax)
    return _scatter(pf, out, d, aw)


# warp descriptor rows: [srow, sy, sx, a, b, c, dlt, mx, my, flat0, tw, th]
W_SROW, W_SY, W_SX, W_A, W_B, W_C, W_D, W_MX, W_MY, W_FLAT0, W_TW, W_TH = \
    range(12)
NWARP = 12


def _warp_core(srcstack, d, vw, vh, bpc):
    F = jnp.asarray(np.asarray(MC_WARP_FILTER), jnp.int32)
    ib = intermediate_bits(bpc)
    region = _gather(srcstack, d[W_SROW], d[W_SY] - 3, 15, d[W_SX] - 3, 15,
                     vw, vh)
    ys = jnp.arange(15)[None, :, None]
    xs = jnp.arange(8)[None, None, :]
    tmx = (d[W_MX][:, None, None] + ys * d[W_B][:, None, None]
           + xs * d[W_A][:, None, None])
    taps = F[64 + ((tmx + 512) >> 10)]
    sh = 7 - ib
    mid = jnp.zeros(region.shape[:2] + (8,), jnp.int32)
    for k in range(8):
        mid = mid + taps[:, :, :, k] * region[:, :, k : k + 8]
    mid = _i16((mid + ((1 << sh) >> 1)) >> sh)
    ys8 = jnp.arange(8)[None, :, None]
    tmy = (d[W_MY][:, None, None] + ys8 * d[W_D][:, None, None]
           + xs * d[W_C][:, None, None])
    vtaps = F[64 + ((tmy + 512) >> 10)]
    v = jnp.zeros((region.shape[0], 8, 8), jnp.int32)
    for k in range(8):
        v = v + vtaps[:, :, :, k] * mid[:, k : k + 8, :]
    return v


def _wscatter(pf, out, d, aw):
    r = jnp.arange(8)
    idx = (d[W_FLAT0][:, None, None] + r[None, :, None] * aw
           + r[None, None, :])
    valid = (r[None, :, None] < d[W_TH][:, None, None]) & (
        r[None, None, :] < d[W_TW][:, None, None]
    )
    big = jnp.iinfo(jnp.int32).max
    return pf.at[jnp.where(valid, idx, big)].set(out, mode="drop")


@partial(jax.jit, static_argnums=(3, 4, 5, 6), donate_argnums=(0,))
def warp_tiles(pf, srcstack, d, vw, vh, bpc, aw):
    """8x8 warp put tiles (mc.rs warp_affine_8x8_rust:896)."""
    ib = intermediate_bits(bpc)
    v = _warp_core(srcstack, d, vw, vh, bpc)
    sh = 7 + ib
    out = jnp.clip((v + ((1 << sh) >> 1)) >> sh, 0, (1 << bpc) - 1)
    return _wscatter(pf, out, d, aw)


@partial(jax.jit, static_argnums=(3, 4, 5, 6), donate_argnums=(0,))
def warp_prep_tiles(pool, srcstack, d, vw, vh, bpc, aw):
    """8x8 warp prep tiles (mc.rs warp_affine_8x8t_rust: prep rounding)."""
    v = _warp_core(srcstack, d, vw, vh, bpc)
    bias = 0 if bpc == 8 else 8192
    out = _i16(((v + 64) >> 7) - bias)
    return _wscatter(pool, out, d, aw)


# combiner descriptor rows: [r0, r1, flat0, p0, p1, p2, tw, th]
C_R0, C_R1, C_FLAT0, C_P0, C_P1, C_P2, C_TW, C_TH = range(8)
NCOMB = 8


def _cscatter(pf, out, d, aw):
    r = jnp.arange(8)
    idx = (d[C_FLAT0][:, None, None] + r[None, :, None] * aw
           + r[None, None, :])
    valid = (r[None, :, None] < d[C_TH][:, None, None]) & (
        r[None, None, :] < d[C_TW][:, None, None]
    )
    big = jnp.iinfo(jnp.int32).max
    return pf.at[jnp.where(valid, idx, big)].set(out, mode="drop")


@partial(jax.jit, static_argnums=(3, 4), donate_argnums=(0,))
def wavg_tiles(pf, pool, d, bpc, aw):
    """avg / w_avg compound tiles; avg == w_avg with weight 8 exactly
    (mc.rs avg_rust:654, w_avg_rust:681). p0 = weight."""
    ib = intermediate_bits(bpc)
    rnd = (8 << ib) + (0 if bpc == 8 else 8192) * 16
    t1 = pool[d[C_R0]]
    t2 = pool[d[C_R1]]
    wt = d[C_P0][:, None, None]
    out = (t1 * wt + t2 * (16 - wt) + rnd) >> (ib + 4)
    return _cscatter(pf, jnp.clip(out, 0, (1 << bpc) - 1), d, aw)


@partial(jax.jit, static_argnums=(4, 5), donate_argnums=(0,))
def mask_tiles(pf, pool, maskbuf, d, bpc, aw):
    """Masked compound tiles (mc.rs mask_rust:711); the per-pixel 0..64
    mask gathers from maskbuf at p0 + r*p1 + c (wedge tables uploaded in
    the blob, or the seg mask pool computed by segy_tiles)."""
    ib = intermediate_bits(bpc)
    rnd = (32 << ib) + (0 if bpc == 8 else 8192) * 64
    t1 = pool[d[C_R0]]
    t2 = pool[d[C_R1]]
    r = jnp.arange(8)
    midx = (d[C_P0][:, None, None] + r[None, :, None] * d[C_P1][:, None, None]
            + r[None, None, :])
    m = maskbuf[jnp.clip(midx, 0, maskbuf.shape[0] - 1)].astype(jnp.int32)
    out = (t1 * m + t2 * (64 - m) + rnd) >> (ib + 6)
    return _cscatter(pf, jnp.clip(out, 0, (1 << bpc) - 1), d, aw)


@partial(jax.jit, static_argnums=(4, 5, 6, 7), donate_argnums=(0, 1))
def segy_tiles(pf, maskpool, pool, d, ss_hor, ss_ver, bpc, aw):
    """w_mask compound tiles (mc.rs w_mask_rust:814): combine t1/t2 by the
    difference-derived mask, and write the chroma-subsampled mask into the
    mask pool at p0 + subr*p1 + subc (p2 = sign)."""
    ib = intermediate_bits(bpc)
    rnd = (32 << ib) + (0 if bpc == 8 else 8192) * 64
    mask_sh = bpc + ib - 4
    mask_rnd = 1 << (mask_sh - 5)
    t1 = pool[d[C_R0]]
    t2 = pool[d[C_R1]]
    m = jnp.minimum(38 + ((jnp.abs(t1 - t2) + mask_rnd) >> mask_sh), 64)
    out = (t1 * m + t2 * (64 - m) + rnd) >> (ib + 6)
    pf = _cscatter(pf, jnp.clip(out, 0, (1 << bpc) - 1), d, aw)
    signs = d[C_P2][:, None, None]
    if ss_hor:
        mn = m[:, :, 0::2] + m[:, :, 1::2]
        if ss_ver:
            msk = (mn[:, 0::2, :] + mn[:, 1::2, :] + 2 - signs) >> 2
        else:
            msk = (mn + 1 - signs) >> 1
    else:
        msk = m
    mh, mw = 8 >> ss_ver, 8 >> ss_hor
    r = jnp.arange(mh)
    c = jnp.arange(mw)
    midx = (d[C_P0][:, None, None] + r[None, :, None] * d[C_P1][:, None, None]
            + c[None, None, :])
    valid = (r[None, :, None] < ((d[C_TH][:, None, None] + ss_ver) >> ss_ver)) & (
        c[None, None, :] < ((d[C_TW][:, None, None] + ss_hor) >> ss_hor)
    )
    big = jnp.iinfo(jnp.int32).max
    maskpool = maskpool.at[jnp.where(valid, midx, big)].set(msk, mode="drop")
    return pf, maskpool


# blend descriptor rows: [laprow, flat0, moff, mrs, mcs, tw, th]
B_ROW, B_FLAT0, B_MOFF, B_MRS, B_MCS, B_TW, B_TH = range(7)
NBLEND = 7


@partial(jax.jit, static_argnums=(3,), donate_argnums=(0,))
def blend_tiles(pf, lappool, maskbuf, aw, d):
    """OBMC lap blends over the frame planes (mc.rs blend_v/h_rust): the
    per-pixel 0..64 mask gathers from maskbuf at moff + r*mrs + c*mcs
    (host-expanded obmc mask columns/rows; zero rows beyond the lap)."""
    r = jnp.arange(8)
    idx = (d[B_FLAT0][:, None, None] + r[None, :, None] * aw
           + r[None, None, :])
    a = pf[jnp.clip(idx, 0, pf.shape[0] - 1)]
    b = lappool[d[B_ROW]]
    midx = (d[B_MOFF][:, None, None] + r[None, :, None] * d[B_MRS][:, None, None]
            + r[None, None, :] * d[B_MCS][:, None, None])
    m = maskbuf[jnp.clip(midx, 0, maskbuf.shape[0] - 1)].astype(jnp.int32)
    out = (a * (64 - m) + b * m + 32) >> 6
    valid = (r[None, :, None] < d[B_TH][:, None, None]) & (
        r[None, None, :] < d[B_TW][:, None, None]
    )
    big = jnp.iinfo(jnp.int32).max
    return pf.at[jnp.where(valid, idx, big)].set(out, mode="drop")

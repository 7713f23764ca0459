"""Batched motion compensation on TPU (jax.numpy, jit-compiled).

The same gather→separable-filter→scatter dataflow as the CPU batch
executors (ops/ref/mc.py compute_8tap_batch / warp_affine_8x8_batch),
expressed in jnp: per-block subpel filter rows are fetched with one take,
the 8-tap convolutions unroll into 8 fused multiply-adds over shifted
window slices (VPU-friendly; the MXU path is a (N*h, 8) x (8,) contraction
XLA forms from the same graph). Exact integer arithmetic in int32.

Parity: src/mc.rs put_8tap_rust:130 / warp_affine_8x8_rust:896 semantics,
validated against ops/ref/mc.py in tests/test_tpu_mc.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...tables.spec_data import MC_SUBPEL_FILTERS, MC_WARP_FILTER
from ..ref.mc import FILTER_DIR, intermediate_bits


def _i16(a):
    return ((a + 0x8000) & 0xFFFF) - 0x8000


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def mc_8tap_batch(src, sys_, sxs, w, h, has_h, has_v, vis_w, vis_h, bpc,
                  mxs=None, mys=None, f2ds=None):
    """Batched put_8tap: src (H, W) int32 plane; sys_/sxs (N,) full-pel
    coords; mxs/mys (N,) subpel phases; f2ds (N,) filter2d codes.
    Returns (N, h, w) int32 pixels. Coordinate clamping == emu_edge."""
    F = jnp.asarray(np.asarray(MC_SUBPEL_FILTERS), jnp.int32)
    FD = jnp.asarray(np.asarray(FILTER_DIR), jnp.int32)[f2ds]
    ib = intermediate_bits(bpc)
    pxmax = (1 << bpc) - 1

    def gather(y0s, nrow, x0s, ncol):
        rows = jnp.clip(y0s[:, None] + jnp.arange(nrow)[None, :], 0, vis_h - 1)
        cols = jnp.clip(x0s[:, None] + jnp.arange(ncol)[None, :], 0, vis_w - 1)
        return src[rows[:, :, None], cols[:, None, :]].astype(jnp.int32)

    def hrow():
        i = jnp.where(w > 4, FD[:, 0], 3 + (FD[:, 0] & 1))
        return F[i, mxs - 1]

    def vrow():
        i = jnp.where(h > 4, FD[:, 1], 3 + (FD[:, 1] & 1))
        return F[i, mys - 1]

    if has_h and has_v:
        win = gather(sys_ - 3, h + 7, sxs - 3, w + 7)
        fh, fv = hrow(), vrow()
        mid = jnp.zeros((win.shape[0], h + 7, w), jnp.int32)
        for k in range(8):
            mid = mid + fh[:, k, None, None] * win[:, :, k : k + w]
        sh = 6 - ib
        mid = _i16((mid + ((1 << sh) >> 1)) >> sh)
        out = jnp.zeros((win.shape[0], h, w), jnp.int32)
        for k in range(8):
            out = out + fv[:, k, None, None] * mid[:, k : k + h, :]
        sh = 6 + ib
        out = jnp.clip((out + ((1 << sh) >> 1)) >> sh, 0, pxmax)
    elif has_h:
        win = gather(sys_, h, sxs - 3, w + 7)
        fh = hrow()
        out = jnp.zeros((win.shape[0], h, w), jnp.int32)
        for k in range(8):
            out = out + fh[:, k, None, None] * win[:, :, k : k + w]
        rnd = 32 + ((1 << (6 - ib)) >> 1)
        out = jnp.clip((out + rnd) >> 6, 0, pxmax)
    elif has_v:
        win = gather(sys_ - 3, h + 7, sxs, w)
        fv = vrow()
        out = jnp.zeros((win.shape[0], h, w), jnp.int32)
        for k in range(8):
            out = out + fv[:, k, None, None] * win[:, k : k + h, :]
        out = jnp.clip((out + 32) >> 6, 0, pxmax)
    else:
        out = gather(sys_, h, sxs, w)
    return out


_WARP_F_NP = np.asarray(MC_WARP_FILTER)


def _warp_filters():
    # converted per trace (folds to a constant; caching a jnp array in a
    # global would leak tracers across jit scopes)
    return jnp.asarray(_WARP_F_NP, jnp.int32)


@partial(jax.jit, static_argnums=(6, 7, 8))
def warp_8x8_batch(src, sys_, sxs, abcds, mxs, mys, vis_w, vis_h, bpc):
    """Batched 8x8 warp tiles: per-tile affine phase ramps select the 64
    warp filter rows; two 8-tap passes over a 15x15 clamp-gathered window.
    Parity: warp_affine_8x8 (ops/ref/mc.py warp_affine_8x8_batch)."""
    F = _warp_filters()
    ib = intermediate_bits(bpc)
    pxmax = (1 << bpc) - 1

    rows = jnp.clip(sys_[:, None] - 3 + jnp.arange(15)[None, :], 0, vis_h - 1)
    cols = jnp.clip(sxs[:, None] - 3 + jnp.arange(15)[None, :], 0, vis_w - 1)
    region = src[rows[:, :, None], cols[:, None, :]].astype(jnp.int32)

    ys = jnp.arange(15)[None, :, None]
    xs = jnp.arange(8)[None, None, :]
    tmx = mxs[:, None, None] + ys * abcds[:, 1, None, None] + xs * abcds[:, 0, None, None]
    taps = F[64 + ((tmx + 512) >> 10)]  # (N, 15, 8, 8)
    sh = 7 - ib
    mid = jnp.zeros(region.shape[:2] + (8,), jnp.int32)
    for k in range(8):
        mid = mid + taps[:, :, :, k] * region[:, :, k : k + 8]
    mid = _i16((mid + ((1 << sh) >> 1)) >> sh)  # (N, 15, 8)

    ys8 = jnp.arange(8)[None, :, None]
    tmy = mys[:, None, None] + ys8 * abcds[:, 3, None, None] + xs * abcds[:, 2, None, None]
    vtaps = F[64 + ((tmy + 512) >> 10)]  # (N, 8, 8, 8)
    v = jnp.zeros((region.shape[0], 8, 8), jnp.int32)
    for k in range(8):
        v = v + vtaps[:, :, :, k] * mid[:, k : k + 8, :]
    sh = 7 + ib
    return jnp.clip((v + ((1 << sh) >> 1)) >> sh, 0, pxmax)

"""Device wave step: one jit call executes every wavefront item of one
(wave, tx-size) group — edge gather from the planes, intra prediction
(mode-selected across the batched kernels of ops/tpu/ipred.py), residual
add from the residual plane, and a disjoint scatter back into the planes.

The planes are donated through the call chain, so a frame's wave schedule
executes as an in-place sequence of device steps with no host sync.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.tpu import ipred as I
from .plan import (
    MODE_CFL_128,
    MODE_CFL_DC,
    MODE_CFL_LEFT,
    MODE_CFL_TOP,
    MODE_IDENT,
)
from ..syntax.levels import (
    DC_128_PRED,
    DC_PRED,
    FILTER_PRED,
    HOR_PRED,
    LEFT_DC_PRED,
    PAETH_PRED,
    SMOOTH_H_PRED,
    SMOOTH_PRED,
    SMOOTH_V_PRED,
    TOP_DC_PRED,
    VERT_PRED,
    Z1_PRED,
    Z2_PRED,
    Z3_PRED,
)

_BASE_FNS = [
    (DC_PRED, I.ipred_dc_batch),
    (VERT_PRED, I.ipred_v_batch),
    (HOR_PRED, I.ipred_h_batch),
    (LEFT_DC_PRED, I.ipred_dc_left_batch),
    (TOP_DC_PRED, I.ipred_dc_top_batch),
    (DC_128_PRED, I.ipred_dc_128_batch),
    (SMOOTH_PRED, I.ipred_smooth_batch),
    (SMOOTH_V_PRED, I.ipred_smooth_v_batch),
    (SMOOTH_H_PRED, I.ipred_smooth_h_batch),
    (PAETH_PRED, I.ipred_paeth_batch),
]

_CFL_DC_FNS = {
    MODE_CFL_DC: I.ipred_dc_batch,
    MODE_CFL_TOP: I.ipred_dc_top_batch,
    MODE_CFL_LEFT: I.ipred_dc_left_batch,
    MODE_CFL_128: I.ipred_dc_128_batch,
}


@partial(
    jax.jit,
    static_argnums=(2, 3, 4, 5, 6, 7),
    donate_argnums=(0,),
)
def wave_step(planes, resid, w, h, bpc, feats, ss_hor, ss_ver,
              coords=None, modes=None, angles=None, flat0=None, rmask=None,
              z2mw=None, z2mh=None, z2sm=None,
              cfl_alpha=None, cfl_l0=None, cfl_wpad=None, cfl_hpad=None):
    """planes: (3, ah, aw) int32 (donated); resid: (3*ah*aw,) int32.
    coords: (N, EL) int32 edge plans (index or -(const+1)); flat0: (N,) the
    item's top-left flat plane index (OOB for padded lanes -> dropped).
    feats: sorted tuple from {"z", "filter", "cfl", "ident"}."""
    off = 2 * h
    ah_aw = planes.shape[1] * planes.shape[2]
    pf = planes.reshape(-1)
    pxmax = (1 << bpc) - 1

    edge = jnp.where(
        coords < 0, -coords - 1, pf[jnp.clip(coords, 0, pf.shape[0] - 1)]
    )

    out = I.ipred_dc_batch(edge, off, w, h, bpc)
    m3 = modes[:, None, None]
    for code, fn in _BASE_FNS[1:]:
        out = jnp.where(m3 == code, fn(edge, off, w, h, bpc), out)
    if "z" in feats:
        out = jnp.where(
            m3 == Z1_PRED, I.ipred_z1_batch(edge, off, w, h, bpc, angles), out
        )
        out = jnp.where(
            m3 == Z2_PRED,
            I.ipred_z2_batch(edge, off, w, h, bpc, angles, z2mw, z2mh, z2sm),
            out,
        )
        out = jnp.where(
            m3 == Z3_PRED, I.ipred_z3_batch(edge, off, w, h, bpc, angles), out
        )
    if "filter" in feats:
        out = jnp.where(
            m3 == FILTER_PRED,
            I.ipred_filter_batch(edge, off, w, h, bpc, angles), out,
        )

    dy = jnp.arange(h)[None, :, None] * planes.shape[2]
    dx = jnp.arange(w)[None, None, :]
    idx = flat0[:, None, None] + dy + dx

    if "ident" in feats:
        own = pf[jnp.clip(idx, 0, pf.shape[0] - 1)]
        out = jnp.where(m3 == MODE_IDENT, own, out)
    if "cfl" in feats:
        ldy = jnp.arange(h << ss_ver)[None, :, None] * planes.shape[2]
        ldx = jnp.arange(w << ss_hor)[None, None, :]
        lidx = cfl_l0[:, None, None] + ldy + ldx
        ypx = pf[jnp.clip(lidx, 0, pf.shape[0] - 1)]
        ac = I.cfl_ac_batch(ypx, w, h, ss_hor, ss_ver,
                            w_pads=cfl_wpad, h_pads=cfl_hpad)
        for code, fn in _CFL_DC_FNS.items():
            dc = fn(edge, off, w, h, bpc)[:, 0, 0]
            pred = I.cfl_pred_batch(dc, ac, cfl_alpha, bpc)
            out = jnp.where(m3 == code, pred, out)

    res = resid[jnp.clip(idx, 0, resid.shape[0] - 1)]
    out = jnp.where(
        rmask[:, None, None], jnp.clip(out + res, 0, pxmax), out
    )
    pf = pf.at[idx].set(out, mode="drop")
    return pf.reshape(planes.shape)

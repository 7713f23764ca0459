"""Engine executor: ship the frame plan to the device, run the dense pass
there (residual scatter -> palette scatter -> wave schedule), and write the
pixels back into the frame's host planes.

All device calls are enqueued asynchronously; the only host sync is the
final plane download (device_get), which E3 replaces with lazy output
fetch + device-resident post-filters.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tpu.itx import itx_core
from .wave import wave_step


def _pow2(n, lo=8):
    # quantize batch sizes to powers of 4: fewer jit specializations at a
    # bounded (<4x) padding waste on the batch axis
    p = lo
    while p < n:
        p <<= 2
    return p


# sticky per-(w, h, bpc) feature sets: once a size class has seen a feature
# anywhere in the stream, keep tracing it — monotonic growth keeps the jit
# key count bounded (recompiles happen only when a feature first appears)
_STICKY_FEATS = {}


def setup_cache():
    """Persistent XLA compilation cache: the wave/phase kernels specialize
    per (size, feats, N); caching across processes makes repeat runs (tests,
    bench) start hot."""
    try:
        cache = os.environ.get(
            "RAV1D_JAX_CACHE",
            os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


setup_cache()


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7), donate_argnums=(0,))
def _resid_scatter(residf, cfs, flat0, w, h, txtp, bpc, aw):
    """Inverse-transform a (N, sh*sw) coefficient batch and scatter the
    residuals to their plane positions in the flat residual buffer."""
    sh, sw = min(h, 32), min(w, 32)
    # store cf layout is "rc": coeff[y + x*sh] (see ref inv_txfm_add)
    cb = cfs.reshape(cfs.shape[0], sw, sh).transpose(0, 2, 1)
    res = itx_core(cb, w, h, txtp, bpc)
    idx = (
        flat0[:, None, None]
        + jnp.arange(h)[None, :, None] * aw
        + jnp.arange(w)[None, None, :]
    )
    return residf.at[idx].set(res, mode="drop")


def execute(f, plan):
    from ..headers import PixelLayout

    ah, aw = plan.ah, plan.aw
    psz = ah * aw
    bpc = f.cur.bpc
    layout = f.cur.layout
    ss_ver = 1 if layout == PixelLayout.I420 else 0
    ss_hor = 1 if layout != PixelLayout.I444 else 0

    planes = jnp.zeros((3, ah, aw), jnp.int32)
    residf = jnp.zeros(3 * psz, jnp.int32)

    # --- residual phase: batched itx per (w, h, txtp) straight from the
    # coefficient store (rav1d pass-2 read_coef replay, batched) ---
    store = f.coef_store
    sel = plan.wavefront_tx
    if sel.size:
        sel = sel[store.eob[sel] >= 0]
    if sel.size:
        ws = store.txw[sel].astype(np.int64)
        hs = store.txh[sel].astype(np.int64)
        tps = store.txtp[sel].astype(np.int64)
        key = (ws * 2048 + hs) * 32 + tps
        uniq, inv = np.unique(key, return_inverse=True)
        for g in range(len(uniq)):
            gsel = sel[inv == g]
            w = int(store.txw[gsel[0]])
            h = int(store.txh[gsel[0]])
            txtp = int(store.txtp[gsel[0]])
            sh, sw = min(h, 32), min(w, 32)
            sz = sh * sw
            n = len(gsel)
            npad = _pow2(n)
            offs = store.cf_off[gsel]
            cfs = np.zeros((npad, sz), np.int32)
            cfs[:n] = store.cf[offs[:, None] + np.arange(sz)[None, :]]
            flat0 = np.full(npad, 3 * psz, np.int32)
            flat0[:n] = (
                store.txpl[gsel].astype(np.int64) * psz
                + store.txy[gsel].astype(np.int64) * aw
                + store.txx[gsel]
            )
            residf = _resid_scatter(
                residf, jnp.asarray(cfs), jnp.asarray(flat0),
                w, h, txtp, bpc, aw,
            )

    # --- palette scatter (entropy-determined pixels; pre-wavefront) ---
    for pl, y, x, pix in plan.pal:
        planes = planes.at[pl, y : y + pix.shape[0], x : x + pix.shape[1]].set(
            jnp.asarray(pix)
        )

    # --- wave schedule ---
    groups = {}
    for it in plan.items:
        groups.setdefault((it.wave, it.w, it.h), []).append(it)
    for (wv, w, h), its in sorted(groups.items()):
        n = len(its)
        npad = _pow2(n)
        EL = 2 * h + 1 + 2 * w
        coords = np.full((npad, EL), -1, np.int32)
        modes = np.zeros(npad, np.int32)
        angles = np.zeros(npad, np.int32)
        flat0 = np.full(npad, 3 * psz, np.int32)
        rmask = np.zeros(npad, bool)
        z2mw = np.zeros(npad, np.int32)
        z2mh = np.zeros(npad, np.int32)
        z2sm = np.zeros(npad, bool)
        cfl_alpha = np.zeros(npad, np.int32)
        cfl_l0 = np.zeros(npad, np.int32)
        cfl_wpad = np.zeros(npad, np.int32)
        cfl_hpad = np.zeros(npad, np.int32)
        feats = set()
        for k, it in enumerate(its):
            coords[k] = it.coords
            modes[k] = it.mode
            angles[k] = it.angle
            flat0[k] = it.pl * psz + it.y * aw + it.x
            rmask[k] = it.tx >= 0
            z2mw[k] = it.z2_mw
            z2mh[k] = it.z2_mh
            z2sm[k] = it.z2_sm
            if it.mode in (6, 7, 8):
                feats.add("z")
            elif it.mode == 13:
                feats.add("filter")
            elif it.mode == 14:
                feats.add("ident")
            elif it.mode >= 15:
                feats.add("cfl")
                cfl_alpha[k] = it.cfl_alpha
                cfl_l0[k] = it.cfl_ly * aw + it.cfl_lx
                cfl_wpad[k] = it.cfl_wpad
                cfl_hpad[k] = it.cfl_hpad
        sticky = _STICKY_FEATS.setdefault((w, h, bpc), set())
        sticky |= feats
        feats = sticky
        planes = wave_step(
            planes, residf, w, h, bpc, tuple(sorted(feats)), ss_hor, ss_ver,
            coords=jnp.asarray(coords), modes=jnp.asarray(modes),
            angles=jnp.asarray(angles), flat0=jnp.asarray(flat0),
            rmask=jnp.asarray(rmask), z2mw=jnp.asarray(z2mw),
            z2mh=jnp.asarray(z2mh), z2sm=jnp.asarray(z2sm),
            cfl_alpha=jnp.asarray(cfl_alpha), cfl_l0=jnp.asarray(cfl_l0),
            cfl_wpad=jnp.asarray(cfl_wpad), cfl_hpad=jnp.asarray(cfl_hpad),
        )

    # --- writeback (E1: host post-filters still consume numpy planes) ---
    host = np.asarray(jax.device_get(planes))
    f.cur.y[:, :] = host[0].astype(f.cur.y.dtype)
    if f.cur.u is not None:
        ach, acw = f.cur.u.shape
        f.cur.u[:, :] = host[1, :ach, :acw].astype(f.cur.u.dtype)
        f.cur.v[:, :] = host[2, :ach, :acw].astype(f.cur.v.dtype)

"""Engine executor: ship the frame plan to the device, run the dense pass
there (residual scatter -> palette scatter -> one wave-scan dispatch), and
fetch the pixels once, packed at the output bit width.

Dispatch budget per frame: one upload per descriptor array (~a dozen), one
`_resid_scatter` per (w, h, txtp) group reading a single uploaded
coefficient buffer, one `wave_scan` (the whole wavefront as a lax.scan,
engine/wave2.py), and ONE device->host transfer of uint8/uint16 pixels —
the shape that survives the tunnel's dispatch latency and narrow
device->host path. Role parity: rav1d's fn-ptr DSP dispatch + recon replay
(src/internal.rs:112-121, src/recon.rs:2402)."""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tpu.itx import itx_core
from .plan import CLS_L, CLS_S, MODE_CFL_DC, MODE_IDENT, item_class
from .wave2 import wave_scan


def _pow2(n, lo=8):
    p = lo
    while p < n:
        p <<= 1
    return p


def _bucket_waves(n):
    """Pad the wave count to a bounded bucket set (pow2 and 1.5*pow2) so the
    scan length — part of the jit key — takes few distinct values."""
    b = 16
    while True:
        if n <= b:
            return b
        if n <= b + (b >> 1):
            return b + (b >> 1)
        b <<= 1


# sticky per-(class, bpc) feature sets: once a feature appears in a stream,
# keep tracing it — monotonic growth keeps the jit key count bounded
_STICKY_FEATS = {}


def setup_cache():
    """Persistent XLA compilation cache so repeat runs start hot."""
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


@partial(jax.jit, static_argnums=(4, 5, 6, 7, 8), donate_argnums=(0,))
def _resid_scatter(residf, cfbuf, offs, flat0, w, h, txtp, bpc, aw):
    """Inverse-transform a batch of coefficient blocks (gathered from the
    frame's single uploaded cf buffer) and scatter the residuals to their
    plane positions in the flat residual buffer."""
    sh, sw = min(h, 32), min(w, 32)
    cfs = cfbuf[offs[:, None] + jnp.arange(sh * sw)[None, :]]
    # store cf layout is "rc": coeff[y + x*sh] (see ref inv_txfm_add)
    cb = cfs.reshape(cfs.shape[0], sw, sh).transpose(0, 2, 1)
    res = itx_core(cb, w, h, txtp, bpc)
    idx = (
        flat0[:, None, None]
        + jnp.arange(h)[None, :, None] * aw
        + jnp.arange(w)[None, None, :]
    )
    return residf.at[idx].set(res, mode="drop")


@partial(jax.jit, donate_argnums=(0,))
def _pal_scatter(pf, pix, flat0, aw):
    """Scatter N same-size palette pixel blocks into the flat planes."""
    idx = (
        flat0[:, None, None]
        + jnp.arange(pix.shape[1])[None, :, None] * aw
        + jnp.arange(pix.shape[2])[None, None, :]
    )
    return pf.at[idx].set(pix, mode="drop")


@partial(jax.jit, static_argnums=(1, 2, 3))
def _pack_out(planes, ach, acw, bpc):
    """Pack Y + chroma planes into one flat output buffer at the output bit
    width — the only device->host transfer of the dense pass."""
    y = planes[0].reshape(-1)
    u = planes[1, :ach, :acw].reshape(-1)
    v = planes[2, :ach, :acw].reshape(-1)
    flat = jnp.concatenate([y, u, v])
    return flat.astype(jnp.uint8 if bpc == 8 else jnp.uint16)


def _pack_class(items, NW, B, EL, psz):
    """Pack one class's items into the (NW, B, EL + N_FIELDS) int32 blob
    (layout in wave2.FIELDS): one upload per class per frame."""
    from .wave2 import FIELDS, N_FIELDS

    blob = np.zeros((NW, B, EL + N_FIELDS), np.int32)
    blob[:, :, :EL] = -1  # coords default: constant 0
    fi = {k: EL + i for i, k in enumerate(FIELDS)}
    blob[:, :, fi["flat0"]] = 3 * psz  # padded lanes scatter out of bounds
    blob[:, :, fi["w"]] = 4
    blob[:, :, fi["h"]] = 4
    blob[:, :, fi["iioff"]] = -1
    fill = np.zeros(NW, np.int32)
    feats = set()
    for it, aw in items:
        wv = it.wave - 1
        k = fill[wv]
        fill[wv] += 1
        row = blob[wv, k]
        row[: len(it.coords)] = it.coords
        row[fi["modes"]] = it.mode
        row[fi["angles"]] = it.angle
        row[fi["flat0"]] = it.pl * psz + it.y * aw + it.x
        row[fi["rmask"]] = it.tx >= 0
        row[fi["z2mw"]] = it.z2_mw
        row[fi["z2mh"]] = it.z2_mh
        row[fi["z2sm"]] = it.z2_sm
        row[fi["w"]] = it.w
        row[fi["h"]] = it.h
        row[fi["iioff"]] = it.iioff
        if it.iioff >= 0:
            feats.add("ii")
        if it.mode in (6, 7, 8):
            feats.add("z")
        elif it.mode == 13:
            feats.add("filter")
        elif it.mode == MODE_IDENT:
            feats.add("ident")
        elif it.mode >= MODE_CFL_DC:
            feats.add("cfl")
            row[fi["cfla"]] = it.cfl_alpha
            row[fi["cfl0"]] = it.cfl_ly * aw + it.cfl_lx
            row[fi["cflwp"]] = it.cfl_wpad
            row[fi["cflhp"]] = it.cfl_hpad
    return blob, feats


def _scatter_resid_groups(residf, store, sel, cfbuf, psz, aw, bpc):
    """Batched itx per (w, h, txtp) straight from the coefficient store
    (rav1d pass-2 read_coef replay, batched); groups gather their indices
    from one packed upload."""
    sel = sel[store.eob[sel] >= 0]
    if not sel.size:
        return residf
    ws = store.txw[sel].astype(np.int64)
    hs = store.txh[sel].astype(np.int64)
    tps = store.txtp[sel].astype(np.int64)
    key = (ws * 2048 + hs) * 32 + tps
    uniq, inv = np.unique(key, return_inverse=True)
    groups = []
    chunks = []
    pos = 0
    for g in range(len(uniq)):
        gsel = sel[inv == g]
        n = len(gsel)
        npad = _pow2(n)
        offs = np.zeros(npad, np.int32)
        offs[:n] = store.cf_off[gsel]
        flat0 = np.full(npad, 3 * psz, np.int32)
        flat0[:n] = (
            store.txpl[gsel].astype(np.int64) * psz
            + store.txy[gsel].astype(np.int64) * aw
            + store.txx[gsel]
        )
        chunks.append(offs)
        chunks.append(flat0)
        groups.append(
            (int(store.txw[gsel[0]]), int(store.txh[gsel[0]]),
             int(store.txtp[gsel[0]]), pos, npad)
        )
        pos += 2 * npad
    idxbuf = jnp.asarray(np.concatenate(chunks))
    for w, h, txtp, pos, npad in groups:
        residf = _resid_scatter(
            residf, cfbuf, idxbuf[pos : pos + npad],
            idxbuf[pos + npad : pos + 2 * npad],
            w, h, txtp, bpc, aw,
        )
    return residf


@partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def _resid_add(planes, residb, bpc):
    """Fused whole-plane residual add for batch-phase blocks (regions
    without residuals hold zeros; clip is then the identity)."""
    r = residb.reshape(planes.shape)
    return jnp.clip(planes + r, 0, (1 << bpc) - 1)


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

    store = f.coef_store
    cfbuf = None
    if store.tx_pos:
        cfbuf = jnp.asarray(store.cf[: store.cf_pos])
    if plan.wavefront_tx is not None and plan.wavefront_tx.size:
        residf = _scatter_resid_groups(
            residf, store, plan.wavefront_tx, cfbuf, psz, aw, bpc
        )

    # --- inter batch phase: MC/warp/compound/OBMC into the planes, then
    # the fused batch residual add (engine/inter.py) ---
    if plan.inter is not None:
        from .inter import exec_inter

        planes = exec_inter(f, plan, planes)
        if plan.batch_tx is not None and plan.batch_tx.size:
            residb = jnp.zeros(3 * psz, jnp.int32)
            residb = _scatter_resid_groups(
                residb, store, plan.batch_tx, cfbuf, psz, aw, bpc
            )
            planes = _resid_add(planes, residb, bpc)

    # --- palette scatter (entropy-determined pixels; pre-wavefront),
    # batched per block shape ---
    if plan.pal:
        pf = planes.reshape(-1)
        groups = {}
        for pl, y, x, pix in plan.pal:
            groups.setdefault(pix.shape, []).append(
                (pl * psz + y * aw + x, pix)
            )
        for shape, blocks in groups.items():
            flat0 = np.fromiter((b[0] for b in blocks), np.int32,
                                count=len(blocks))
            pix = np.stack([b[1] for b in blocks])
            pf = _pal_scatter(pf, jnp.asarray(pix), jnp.asarray(flat0), aw)
        planes = pf.reshape(planes.shape)

    # --- wavefront: one scan dispatch over wave levels ---
    sitems = [(it, aw) for it in plan.items if item_class(it.w, it.h) == 0]
    litems = [(it, aw) for it in plan.items if item_class(it.w, it.h) == 1]
    NW = _bucket_waves(max(plan.n_waves, 1))
    sdesc = ldesc = None
    featsS = featsL = None
    if sitems:
        cnt = np.zeros(NW, np.int64)
        for it, _ in sitems:
            cnt[it.wave - 1] += 1
        B = _pow2(int(cnt.max()), lo=8)
        EL = 2 * CLS_S[1] + 1 + 2 * CLS_S[0]
        blob, feats = _pack_class(sitems, NW, B, EL, psz)
        sticky = _STICKY_FEATS.setdefault((0, bpc), set())
        sticky |= feats
        featsS = tuple(sorted(sticky))
        sdesc = jnp.asarray(blob)
    if litems:
        cnt = np.zeros(NW, np.int64)
        for it, _ in litems:
            cnt[it.wave - 1] += 1
        B = _pow2(int(cnt.max()), lo=2)
        EL = 2 * CLS_L[1] + 1 + 2 * CLS_L[0]
        blob, feats = _pack_class(litems, NW, B, EL, psz)
        sticky = _STICKY_FEATS.setdefault((1, bpc), set())
        sticky |= feats
        featsL = tuple(sorted(sticky))
        ldesc = jnp.asarray(blob)
    if featsS is not None or featsL is not None:
        if plan.ii_masks:
            mflat = np.concatenate(plan.ii_masks)
            mbuf = np.zeros(_pow2(mflat.size, lo=64), np.int32)
            mbuf[: mflat.size] = mflat
            maskbuf = jnp.asarray(mbuf)
        else:
            maskbuf = jnp.zeros(1, jnp.int32)
        planes = wave_scan(
            planes, residf, sdesc, ldesc, maskbuf, bpc=bpc,
            ss_hor=ss_hor, ss_ver=ss_ver, featsS=featsS, featsL=featsL,
        )

    # --- writeback: one packed fetch (host post-filters consume numpy
    # planes until they move on device) ---
    if f.cur.u is not None:
        ach, acw = f.cur.u.shape
    else:
        ach = acw = 0
    flat = np.asarray(jax.device_get(_pack_out(planes, ach, acw, bpc)))
    f.cur.y[:, :] = flat[:psz].reshape(ah, aw)
    if f.cur.u is not None:
        csz = ach * acw
        f.cur.u[:, :] = flat[psz : psz + csz].reshape(ach, acw)
        f.cur.v[:, :] = flat[psz + csz :].reshape(ach, acw)

"""Engine v2 fixed-key kernels.

The axon tunnel's cost model (measured): ~30-40 ms fixed cost per
host<->device transfer, ~10-18 MB/s bandwidth, ~0.07 ms per dispatch,
~0.4 s per XLA compilation. The round-2 engine paid one jit key per
(w, h, txtp, subpel-case, batch-pow2) combination — 1,800+ compilations
for one 320x240 stream. These kernels bound the key space instead:

- itx: ONE kernel per (w, h, bpc): the tx type becomes data. All 1-D
  variants valid for the size (dct/adst/flipadst/identity) are computed and
  selected per lane with jnp.where — compute is cheap on the VPU, keys are
  not. Batches run in fixed-size chunks so the batch length never enters
  the key (role parity: the itxfm_add[19][17] fn-ptr table,
  src/itx.rs:194, collapsed into data-driven dispatch).
- mc/warp/compound (tiles.py + this module): every block decomposes into
  8x8 destination tiles against a device-resident reference plane stack;
  one kernel per (phase case, plane kind, bpc).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.ref import itx as R
from ..ops.tpu.itx import _Lanes, _apply_1d
from ..syntax.levels import WHT_WHT

# 1-D variant order; per-block codes index into this
VARIANTS = ("dct", "adst", "flipadst", "identity")
_VCODE = {name: i for i, name in enumerate(VARIANTS)}

# txtp -> (first_code, second_code); WHT handled separately
TXTP_FIRST = np.zeros(17, np.int32)
TXTP_SECOND = np.zeros(17, np.int32)
for _tp, (_f, _s) in R._TXTP_1D.items():
    TXTP_FIRST[_tp] = _VCODE[_f]
    TXTP_SECOND[_tp] = _VCODE[_s]


def _variants_for(n):
    """1-D variants AV1 allows at size n (adst families stop at 16)."""
    if n <= 16:
        return VARIANTS
    if n == 32:
        return ("dct", "identity")
    return ("dct",)


def _sel_pass(vals_in, variants, codes, n, mn, mx):
    """Run every 1-D variant over the lane list and select per batch lane.
    vals_in: list of n arrays (N, L); codes: (N,) variant codes."""
    outs = []
    for name in variants:
        lanes = _Lanes(list(vals_in))
        _apply_1d(name, n, lanes, mn, mx)
        outs.append([lanes.vals[i] for i in range(n)])
    if len(variants) == 1:
        return outs[0]
    sel = []
    c = codes[:, None]
    for i in range(n):
        v = outs[0][i]
        for k, name in enumerate(variants[1:], start=1):
            v = jnp.where(c == _VCODE[name], outs[k][i], v)
        sel.append(v)
    return sel


def itx_any_core(cb, firstv, secondv, w, h, bpc):
    """Inverse-transform a batch with per-block tx types.

    cb: (N, sh, sw) int32 coefficients in natural (y, x) order;
    firstv/secondv: (N,) VARIANTS codes. Returns (N, h, w) int32 residuals.
    Semantics identical to ops.tpu.itx.itx_core per block
    (src/itx.rs inv_txfm_add_rust:64)."""
    shift = R._SHIFTS[(w, h)]
    is_rect2 = w * 2 == h or h * 2 == w
    rnd = (1 << shift) >> 1
    sh = min(h, 32)
    sw = min(w, 32)
    if bpc == 8:
        row_clip_min = col_clip_min = -(1 << 15)
    else:
        bitdepth_max = (1 << bpc) - 1
        row_clip_min = (~bitdepth_max) << 7
        col_clip_min = (~bitdepth_max) << 5
    row_clip_max = ~row_clip_min
    col_clip_max = ~col_clip_min

    cb = cb.astype(jnp.int32)
    if is_rect2:
        cb = (cb * 181 + 128) >> 8

    zeros = jnp.zeros((cb.shape[0], sh), jnp.int32)
    vals = [cb[:, :, x] if x < sw else zeros for x in range(w)]
    vals = _sel_pass(vals, _variants_for(w), firstv, w,
                     row_clip_min, row_clip_max)
    mid = jnp.stack(vals, axis=2)  # (N, sh, w)
    mid = ((mid + rnd) >> shift).clip(col_clip_min, col_clip_max)

    zeros2 = jnp.zeros((cb.shape[0], w), jnp.int32)
    vals = [mid[:, y, :] if y < sh else zeros2 for y in range(h)]
    vals = _sel_pass(vals, _variants_for(h), secondv, h,
                     col_clip_min, col_clip_max)
    res = jnp.stack(vals, axis=1)  # (N, h, w)
    return (res + 8) >> 4


def wht_core(cb):
    """4x4 Walsh-Hadamard (lossless; src/itx_1d.rs inv_wht4_1d).
    cb: (N, 4, 4) int32. Returns (N, 4, 4) int32 residuals (added as-is)."""
    t = cb >> 2

    def wht4(l0, l1, l2, l3):
        a = l0 + l1
        d = l3 - l2
        e = (a - d) >> 1
        b = e - l1
        c = e - l2
        return a - b, b, c, d + c

    # rows (transform over x), then columns (over y)
    r = [t[:, :, i] for i in range(4)]
    r = wht4(*r)
    m = jnp.stack(r, axis=2)
    c = [m[:, i, :] for i in range(4)]
    c = wht4(*c)
    return jnp.stack(c, axis=1)


@partial(jax.jit, static_argnums=(5, 6, 7, 8), donate_argnums=(0,))
def resid_scatter_any(residf, cfbuf, offs, flat0, fs, w, h, bpc, aw):
    """Inverse-transform a fixed-size chunk of blocks gathered from the
    frame coefficient buffer and scatter residuals into the flat residual
    plane. fs: (2, B) first/second variant codes. Padded lanes carry
    flat0 >= len(residf) and drop."""
    sh, sw = min(h, 32), min(w, 32)
    cfs = cfbuf[offs[:, None] + jnp.arange(sh * sw)[None, :]].astype(jnp.int32)
    # store layout is "rc": coeff[y + x*sh]
    cb = cfs.reshape(cfs.shape[0], sw, sh).transpose(0, 2, 1)
    res = itx_any_core(cb, fs[0], fs[1], w, h, bpc)
    idx = (
        flat0[:, None, None]
        + jnp.arange(h)[None, :, None] * aw
        + jnp.arange(w)[None, None, :]
    )
    return residf.at[idx].set(res, mode="drop")


@partial(jax.jit, static_argnums=(4, 5), donate_argnums=(0,))
def wht_scatter(residf, cfbuf, offs, flat0, bpc, aw):
    """WHT 4x4 chunk: gather, transform, scatter (lossless frames)."""
    cfs = cfbuf[offs[:, None] + jnp.arange(16)[None, :]].astype(jnp.int32)
    cb = cfs.reshape(cfs.shape[0], 4, 4).transpose(0, 2, 1)
    res = wht_core(cb)
    idx = (
        flat0[:, None, None]
        + jnp.arange(4)[None, :, None] * aw
        + jnp.arange(4)[None, None, :]
    )
    return residf.at[idx].set(res, mode="drop")


def chunk_for(w, h):
    """Fixed chunk size per tx size: the batch length never enters the jit
    key; chunks keep per-dispatch work roughly even."""
    b = 16384 // (w * h)
    p = 32
    while p < b:
        p <<= 1
    return min(p, 1024)


def plan_residuals(blob, store, sel, psz, aw):
    """Pack chunked itx descriptors for `sel` store indices into the frame
    blob; returns ops for run_residuals. One (w, h) jit key per tx size —
    tx types ride as data (replaces the per-(w, h, txtp, pow2) key model)."""
    ops = []
    sel = sel[store.eob[sel] >= 0]
    if not sel.size:
        return ops
    tps = store.txtp[sel].astype(np.int64)
    wht = tps == WHT_WHT
    ws = store.txw[sel].astype(np.int64)
    hs = store.txh[sel].astype(np.int64)
    key = np.where(wht, -1, ws * 2048 + hs)
    flat0_all = (
        store.txpl[sel].astype(np.int64) * psz
        + store.txy[sel].astype(np.int64) * aw
        + store.txx[sel]
    ).astype(np.int32)
    uniq = np.unique(key)
    oob = np.int32(3 * psz)
    for k in uniq:
        gsel = key == k
        offs = store.cf_off[sel[gsel]].astype(np.int32)
        flat0 = flat0_all[gsel]
        n = offs.size
        if k == -1:
            w = h = 4
            B = 256
            fsv = ssv = None
        else:
            w = int(k) // 2048
            h = int(k) % 2048
            B = chunk_for(w, h)
            fsv = TXTP_FIRST[tps[gsel]]
            ssv = TXTP_SECOND[tps[gsel]]
        for i in range(0, n, B):
            m = min(B, n - i)
            o = np.zeros(B, np.int32)
            f = np.full(B, oob, np.int32)
            o[:m] = offs[i : i + m]
            f[:m] = flat0[i : i + m]
            if k == -1:
                ops.append(("wht", blob.add(o), blob.add(f), None, w, h))
            else:
                fs = np.zeros((2, B), np.int32)
                fs[0, :m] = fsv[i : i + m]
                fs[1, :m] = ssv[i : i + m]
                ops.append(
                    ("itx", blob.add(o), blob.add(f), blob.add(fs), w, h)
                )
    return ops


def run_residuals(residf, cfbuf, dev, ops, bpc, aw):
    """Execute planned itx chunks against the uploaded blob."""
    from .blob import view

    for kind, ho, hf, hfs, w, h in ops:
        if kind == "wht":
            residf = wht_scatter(residf, cfbuf, view(dev, ho), view(dev, hf),
                                 bpc, aw)
        else:
            residf = resid_scatter_any(
                residf, cfbuf, view(dev, ho), view(dev, hf), view(dev, hfs),
                w, h, bpc, aw,
            )
    return residf

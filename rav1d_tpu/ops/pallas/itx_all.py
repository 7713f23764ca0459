"""Pallas inverse-transform families for the engine's residual program.

Generalizes ops/pallas/itx8.py (the 8x8 DCT_DCT prototype) to the decoder's
hot transform classes WITH data-driven tx types: one kernel per (w, h, bpc)
class, batch elements on the 128-lane axis, coefficient positions on the
sublane axis. Every 1-D variant AV1 allows at the size (dct / adst /
flipadst / identity) is computed in-kernel and selected per lane by the
block's variant code — the same key-stability trick as
engine/kernels.itx_any_core (whose XLA lowering these kernels replace on
TPU), but as straight-line VPU code instead of an XLA op-soup: the measured
A/B on the 8x8 prototype was ~700x per batch (tools_py/pallas_ab.py).

The 1-D integer butterflies are REUSED from ops/ref/itx.py (`_FAMILY`):
they are pure `+ * >> clip` arithmetic over a lane-list adapter, so they
trace identically inside a Pallas kernel body, under XLA jit, and over
numpy scalars — one normative implementation, three backends
(parity: src/itx_1d.rs, dispatched via src/itx.rs:194 itxfm_add[19][17]).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ...ops.tpu.itx import _Lanes, _apply_1d
from ...ops.ref import itx as R

LANES = 128

# variant code order must match engine/kernels.VARIANTS
VARIANTS = ("dct", "adst", "flipadst", "identity")
_VCODE = {name: i for i, name in enumerate(VARIANTS)}

# (w, h) classes wired into resid_prog. 32/64-point sizes stay on the XLA
# path: dct32/64 unrolls to very long straight-line kernels for little
# gain (they are rare in conformance streams).
PALLAS_SIZES = {
    (4, 4), (4, 8), (8, 4), (8, 8),
    (4, 16), (16, 4), (8, 16), (16, 8), (16, 16),
}


def _variants_for(n):
    if n <= 16:
        return VARIANTS
    if n == 32:
        return ("dct", "identity")
    return ("dct",)


def _clips(bpc):
    if bpc == 8:
        rmn = cmn = -(1 << 15)
    else:
        bmax = (1 << bpc) - 1
        rmn = (~bmax) << 7
        cmn = (~bmax) << 5
    return rmn, ~rmn, cmn, ~cmn


def _pass_1d(base, n, variants, code, mn, mx):
    """One 1-D pass over an n-list of lane vectors: every allowed variant,
    selected per lane by `code`."""
    if len(variants) == 1:
        lanes = _Lanes(list(base))
        _apply_1d(variants[0], n, lanes, mn, mx)
        return [lanes.vals[i] for i in range(n)]
    outs = []
    for name in variants:
        lanes = _Lanes(list(base))
        _apply_1d(name, n, lanes, mn, mx)
        outs.append([lanes.vals[i] for i in range(n)])
    sel = []
    for i in range(n):
        v = outs[0][i]
        for k, name in enumerate(variants[1:], start=1):
            v = jnp.where(code == _VCODE[name], outs[k][i], v)
        sel.append(v)
    return sel


def _kernel(x_ref, c_ref, o_ref, *, w, h, shift, rect2,
            rmn, rmx, cmn, cmx):
    f = c_ref[0, :]
    s = c_ref[1, :]
    rnd = (1 << shift) >> 1
    vw = _variants_for(w)
    vh = _variants_for(h)
    # row pass: 1-D over x for each y
    mid = [[None] * w for _ in range(h)]
    for y in range(h):
        base = [x_ref[y * w + x, :] for x in range(w)]
        if rect2:
            base = [(v * 181 + 128) >> 8 for v in base]
        row = _pass_1d(base, w, vw, f, rmn, rmx)
        for x in range(w):
            mid[y][x] = ((row[x] + rnd) >> shift).clip(cmn, cmx)
    # column pass: 1-D over y for each x
    for x in range(w):
        col = _pass_1d([mid[y][x] for y in range(h)], h, vh, s, cmn, cmx)
        for y in range(h):
            o_ref[y * w + x, :] = (col[y] + 8) >> 4


@partial(jax.jit, static_argnums=(3, 4, 5))
def itx_pallas_core(cb, firstv, secondv, w, h, bpc):
    """Drop-in twin of engine/kernels.itx_any_core for (w, h) in
    PALLAS_SIZES: cb (N, h, w) int32 natural-order coefficients,
    firstv/secondv (N,) VARIANTS codes -> (N, h, w) int32 residuals,
    bit-exact per block vs ops.ref.itx."""
    assert (w, h) in PALLAS_SIZES, (w, h)
    n = cb.shape[0]
    npad = (-n) % LANES
    if npad:
        cb = jnp.concatenate(
            [cb, jnp.zeros((npad,) + cb.shape[1:], cb.dtype)]
        )
        firstv = jnp.concatenate([firstv, jnp.zeros(npad, firstv.dtype)])
        secondv = jnp.concatenate([secondv, jnp.zeros(npad, secondv.dtype)])
    nt = n + npad
    rmn, rmx, cmn, cmx = _clips(bpc)
    xt = cb.reshape(nt, h * w).T.astype(jnp.int32)  # (h*w, N) position-major
    codes = jnp.concatenate(
        [
            firstv.astype(jnp.int32)[None, :],
            secondv.astype(jnp.int32)[None, :],
            jnp.zeros((6, nt), jnp.int32),
        ]
    )
    interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        partial(
            _kernel, w=w, h=h, shift=R._SHIFTS[(w, h)],
            rect2=(w * 2 == h or h * 2 == w),
            rmn=rmn, rmx=rmx, cmn=cmn, cmx=cmx,
        ),
        out_shape=jax.ShapeDtypeStruct((h * w, nt), jnp.int32),
        grid=(nt // LANES,),
        in_specs=[
            pl.BlockSpec((h * w, LANES), lambda i: (0, i)),
            pl.BlockSpec((8, LANES), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((h * w, LANES), lambda i: (0, i)),
        interpret=interpret,
    )(xt, codes)
    res = out.T.reshape(nt, h, w)
    return res[:n] if npad else res

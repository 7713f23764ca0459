"""Pallas 8x8 inverse DCT batch — the decoder's hottest transform class.

Layout: the (N, 8, 8) coefficient batch is viewed as (64, N): coefficient
position y*8+x on the sublane axis, batch element on the lane axis. Both
1-D passes are then pure elementwise VPU ops over (128,)-wide lanes — the
integer butterflies of itx_1d.rs inv_dct8_1d (same add/mul/shift/clip
sequence as ops/ref/itx.py _dct8, which is the parity oracle), with zero
in-kernel transposes: the row pass walks sublanes y*8+{0..7}, the column
pass walks sublanes {0..7}*8+x.

Semantics identical per block to ops.tpu/engine itx (DCT_DCT, 8x8):
row clip at +-2^15 (8 bpc) / bitdepth-scaled (HBD), inter-pass
(v + 1) >> 1 with column clip, final (v + 8) >> 4."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _dct4(c, mn, mx):
    """In-place 1-D inverse DCT-4 over a 4-list of lane vectors
    (itx_1d.rs inv_dct4_1d)."""
    in0, in1, in2, in3 = c[0], c[1], c[2], c[3]
    t0 = ((in0 + in2) * 181 + 128) >> 8
    t1 = ((in0 - in2) * 181 + 128) >> 8
    t2 = ((in1 * 1567 - in3 * (3784 - 4096) + 2048) >> 12) - in3
    t3 = ((in1 * (3784 - 4096) + in3 * 1567 + 2048) >> 12) + in1
    c[0] = jnp.clip(t0 + t3, mn, mx)
    c[1] = jnp.clip(t1 + t2, mn, mx)
    c[2] = jnp.clip(t1 - t2, mn, mx)
    c[3] = jnp.clip(t0 - t3, mn, mx)


def _dct8(c, mn, mx):
    """In-place 1-D inverse DCT-8 over an 8-list of lane vectors
    (itx_1d.rs inv_dct8_1d)."""
    ev = [c[0], c[2], c[4], c[6]]
    _dct4(ev, mn, mx)
    in1, in3, in5, in7 = c[1], c[3], c[5], c[7]
    t4a = ((in1 * 799 - in7 * (4017 - 4096) + 2048) >> 12) - in7
    t5a = (in5 * 1703 - in3 * 1138 + 1024) >> 11
    t6a = (in5 * 1138 + in3 * 1703 + 1024) >> 11
    t7a = ((in1 * (4017 - 4096) + in7 * 799 + 2048) >> 12) + in1
    t4 = jnp.clip(t4a + t5a, mn, mx)
    t5a = jnp.clip(t4a - t5a, mn, mx)
    t7 = jnp.clip(t7a + t6a, mn, mx)
    t6a = jnp.clip(t7a - t6a, mn, mx)
    t5 = ((t6a - t5a) * 181 + 128) >> 8
    t6 = ((t6a + t5a) * 181 + 128) >> 8
    t0, t1, t2, t3 = ev
    c[0] = jnp.clip(t0 + t7, mn, mx)
    c[1] = jnp.clip(t1 + t6, mn, mx)
    c[2] = jnp.clip(t2 + t5, mn, mx)
    c[3] = jnp.clip(t3 + t4, mn, mx)
    c[4] = jnp.clip(t3 - t4, mn, mx)
    c[5] = jnp.clip(t2 - t5, mn, mx)
    c[6] = jnp.clip(t1 - t6, mn, mx)
    c[7] = jnp.clip(t0 - t7, mn, mx)


def _kernel(x_ref, o_ref, *, rmn, rmx, cmn, cmx):
    """One (64, LANES) block: full 8x8 inverse DCT for LANES blocks."""
    # row pass: 1-D over x for each y
    mid = [None] * 64
    for y in range(8):
        c = [x_ref[y * 8 + x, :] for x in range(8)]
        _dct8(c, rmn, rmx)
        for x in range(8):
            # inter-pass rounding (shift=1 for 8x8) + column clip
            mid[y * 8 + x] = jnp.clip((c[x] + 1) >> 1, cmn, cmx)
    # column pass: 1-D over y for each x
    for x in range(8):
        c = [mid[y * 8 + x] for y in range(8)]
        _dct8(c, cmn, cmx)
        for y in range(8):
            o_ref[y * 8 + x, :] = (c[y] + 8) >> 4


def _clips(bpc):
    if bpc == 8:
        rmn = cmn = -(1 << 15)
    else:
        bmax = (1 << bpc) - 1
        rmn = (~bmax) << 7
        cmn = (~bmax) << 5
    return rmn, ~rmn, cmn, ~cmn


@partial(jax.jit, static_argnums=(1,))
def idct8x8_batch_pallas(cb, bpc=8):
    """Inverse-transform a (N, 8, 8) int32 DCT_DCT batch; N % 128 == 0.
    Returns (N, 8, 8) int32 residuals, bit-exact vs ops.ref.itx."""
    n = cb.shape[0]
    assert n % LANES == 0, n
    rmn, rmx, cmn, cmx = _clips(bpc)
    xt = cb.reshape(n, 64).T  # (64, N): position-major, batch on lanes
    interpret = jax.default_backend() != "tpu"  # CPU: interpreter parity
    out = pl.pallas_call(
        partial(_kernel, rmn=rmn, rmx=rmx, cmn=cmn, cmx=cmx),
        out_shape=jax.ShapeDtypeStruct((64, n), jnp.int32),
        grid=(n // LANES,),
        in_specs=[pl.BlockSpec((64, LANES), lambda i: (0, i))],
        out_specs=pl.BlockSpec((64, LANES), lambda i: (0, i)),
        interpret=interpret,
    )(xt)
    return out.T.reshape(n, 8, 8)


@partial(jax.jit, static_argnums=(1,))
def idct8x8_batch_jnp(cb, bpc=8):
    """The jnp/XLA twin (engine kernel math restricted to DCT_DCT 8x8):
    the A/B baseline."""
    from ...engine.kernels import itx_any_core

    z = jnp.zeros(cb.shape[0], jnp.int32)
    return itx_any_core(cb, z, z, 8, 8, bpc)

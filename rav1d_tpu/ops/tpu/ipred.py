"""Batched intra prediction on TPU (jax.numpy, jit-compiled).

Each kernel predicts N same-size blocks from their prepared top-left edge
buffers at once — the wavefront executes per diagonal, batching every block
of a mode/size class along it. Covers the non-directional family
(DC/V/H/Paeth/Smooth{,V,H}); the directional z1/z2/z3 and FILTER_PRED
kernels run via the numpy reference for now (per-block edge upsampling).

Parity: src/ipred.rs ipred_*_rust semantics, validated against
ops/ref/ipred.py in tests/test_tpu_ipred.py.

Inputs: tls (N, L) int32 edge buffers, `off` the top-left index (same for
the whole batch — prepare_intra_edges uses a fixed buffer layout).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ref.ipred import SM_WEIGHTS as _SM_NP


def _ctz(v):
    v = int(v)
    return (v & -v).bit_length() - 1


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_dc_batch(tls, off, w, h, bpc):
    mult_1x2, mult_1x4, base_shift = (
        (0x5556, 0x3334, 16) if bpc == 8 else (0xAAAB, 0x6667, 17)
    )
    dc = (w + h) >> 1
    dc = dc + tls[:, off + 1 : off + 1 + w].sum(axis=1)
    dc = dc + tls[:, off - h : off].sum(axis=1)
    dc = dc >> _ctz(w + h)
    if w != h:
        mult = mult_1x4 if (w > h * 2 or h > w * 2) else mult_1x2
        dc = (dc * mult) >> base_shift
    return jnp.broadcast_to(dc[:, None, None], (tls.shape[0], h, w))


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_dc_top_batch(tls, off, w, h, bpc):
    dc = (tls[:, off + 1 : off + 1 + w].sum(axis=1) + (w >> 1)) >> _ctz(w)
    return jnp.broadcast_to(dc[:, None, None], (tls.shape[0], h, w))


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_dc_left_batch(tls, off, w, h, bpc):
    dc = (tls[:, off - h : off].sum(axis=1) + (h >> 1)) >> _ctz(h)
    return jnp.broadcast_to(dc[:, None, None], (tls.shape[0], h, w))


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_dc_128_batch(tls, off, w, h, bpc):
    dc = (1 << bpc) >> 1
    return jnp.full((tls.shape[0], h, w), dc, tls.dtype)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_v_batch(tls, off, w, h, bpc):
    return jnp.broadcast_to(
        tls[:, off + 1 : off + 1 + w][:, None, :], (tls.shape[0], h, w)
    )


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_h_batch(tls, off, w, h, bpc):
    left = tls[:, off - h : off][:, ::-1]
    return jnp.broadcast_to(left[:, :, None], (tls.shape[0], h, w))


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_paeth_batch(tls, off, w, h, bpc):
    topleft = tls[:, off][:, None, None]
    top = tls[:, off + 1 : off + 1 + w][:, None, :]
    left = tls[:, off - h : off][:, ::-1][:, :, None]
    base = left + top - topleft
    ldiff = jnp.abs(left - base)
    tdiff = jnp.abs(top - base)
    tldiff = jnp.abs(topleft - base)
    N = tls.shape[0]
    return jnp.where(
        (ldiff <= tdiff) & (ldiff <= tldiff),
        jnp.broadcast_to(left, (N, h, w)),
        jnp.where(
            tdiff <= tldiff,
            jnp.broadcast_to(top, (N, h, w)),
            jnp.broadcast_to(topleft, (N, h, w)),
        ),
    )


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_smooth_batch(tls, off, w, h, bpc):
    sm = jnp.asarray(np.asarray(_SM_NP), jnp.int32)
    wh = sm[w : w + w][None, None, :]
    wv = sm[h : h + h][None, :, None]
    right = tls[:, off + w][:, None, None]
    bottom = tls[:, off - h][:, None, None]
    top = tls[:, off + 1 : off + 1 + w][:, None, :]
    left = tls[:, off - h : off][:, ::-1][:, :, None]
    pred = wv * top + (256 - wv) * bottom + wh * left + (256 - wh) * right
    return (pred + 256) >> 9


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_smooth_v_batch(tls, off, w, h, bpc):
    sm = jnp.asarray(np.asarray(_SM_NP), jnp.int32)
    wv = sm[h : h + h][None, :, None]
    bottom = tls[:, off - h][:, None, None]
    top = tls[:, off + 1 : off + 1 + w][:, None, :]
    pred = wv * top + (256 - wv) * bottom
    return jnp.broadcast_to((pred + 128) >> 8, (tls.shape[0], h, w))


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_smooth_h_batch(tls, off, w, h, bpc):
    sm = jnp.asarray(np.asarray(_SM_NP), jnp.int32)
    wh = sm[w : w + w][None, None, :]
    right = tls[:, off + w][:, None, None]
    left = tls[:, off - h : off][:, ::-1][:, :, None]
    pred = wh * left + (256 - wh) * right
    return jnp.broadcast_to((pred + 128) >> 8, (tls.shape[0], h, w))

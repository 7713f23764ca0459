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


# ---------------------------------------------------------------------------
# Directional prediction (Z1/Z2/Z3), FILTER_PRED, CfL, palette.
#
# Per-item angle/upsample/filter-strength decisions are traced values, so a
# single jit specialization per (w, h, bpc) serves every block of that size
# (the engine's wavefront step fuses these with the edge gather). The edge
# filter/upsample passes mirror src/ipred.rs filter_edge/upsample_edge as
# positionwise selects over fixed-length vectors.
# ---------------------------------------------------------------------------

from ...tables.spec_data import DR_INTRA_DERIVATIVE, FILTER_INTRA_TAPS

_EDGE_KERNELS_NP = np.asarray(
    [[0, 4, 8, 4, 0], [0, 5, 6, 5, 0], [2, 4, 4, 4, 2]], np.int32
)


def _dr(angle_half):
    return jnp.asarray(np.asarray(DR_INTRA_DERIVATIVE), jnp.int32)[angle_half]


def _decode_angle(angle):
    """Split the packed angle (`angle | sm << 9 | ief << 10`)."""
    return angle & 511, (angle >> 9) & 1, angle >> 10


def _filter_strength(wh, angle, is_sm):
    """Vector _get_filter_strength (src/ipred.rs): wh static, angle/is_sm
    traced."""
    a = angle
    if wh <= 8:
        sm = jnp.where(a >= 64, 2, jnp.where(a >= 40, 1, 0))
        ns = jnp.where(a >= 56, 1, 0)
    elif wh <= 16:
        sm = jnp.where(a >= 48, 2, jnp.where(a >= 20, 1, 0))
        ns = jnp.where(a >= 40, 1, 0)
    elif wh <= 24:
        sm = jnp.where(a >= 4, 3, 0)
        ns = jnp.where(a >= 32, 3, jnp.where(a >= 16, 2, jnp.where(a >= 8, 1, 0)))
    elif wh <= 32:
        sm = jnp.full_like(a, 3)
        ns = jnp.where(a >= 32, 3, jnp.where(a >= 4, 2, 1))
    else:
        sm = jnp.full_like(a, 3)
        ns = jnp.full_like(a, 3)
    return jnp.where(is_sm != 0, sm, ns)


def _upsample_flag(wh, angle, is_sm):
    """Vector _get_upsample: wh static, angle/is_sm traced -> 0/1 int."""
    lim = jnp.where(is_sm != 0, 16 >> 1, 16)
    return ((angle < 40) & (wh <= lim)).astype(jnp.int32)


def _edge_src(tls, base, idx, lo, hi):
    """s(i) = tls[:, base + clip(idx, lo, hi - 1)] with traced bounds.
    idx: (L,) positions; lo/hi scalars or (N, 1) arrays."""
    j = base + jnp.clip(idx[None, :], lo, hi - 1)
    return jnp.take_along_axis(tls, jnp.clip(j, 0, tls.shape[1] - 1), axis=1)


def _filter_edge(tls, base, sz, lim_from, lim_to, src_from, src_to, strength):
    """(N, sz) filtered edge: smoothing inside [lim_from, lim_to), raw copy
    outside; strength 0 means raw everywhere. All limits may be traced."""
    K = jnp.asarray(_EDGE_KERNELS_NP)[jnp.maximum(strength, 1) - 1]  # (N, 5)
    i = jnp.arange(sz)
    raw = _edge_src(tls, base, i, src_from, src_to)
    acc = jnp.zeros_like(raw)
    for j in range(5):
        acc = acc + K[:, j : j + 1] * _edge_src(tls, base, i - 2 + j, src_from, src_to)
    smooth = (acc + 8) >> 4
    inside = (
        (i[None, :] >= lim_from) & (i[None, :] < lim_to)
        & (strength > 0)[:, None]
    )
    return jnp.where(inside, smooth, raw)


def _upsample_edge(tls, base, hsz_out, src_from, src_to, bpc):
    """(N, 2*hsz_out-1) upsampled edge (src/ipred.rs upsample_edge): even
    taps copy s(t/2), odd taps a clipped 4-tap interpolation. hsz_out is the
    static sample count; traced src bounds clip like the reference."""
    pxmax = (1 << bpc) - 1
    t = jnp.arange(2 * hsz_out - 1)
    k = t >> 1
    ev = _edge_src(tls, base, k, src_from, src_to)
    a = _edge_src(tls, base, k - 1, src_from, src_to)
    b = _edge_src(tls, base, k + 1, src_from, src_to)
    c = _edge_src(tls, base, k + 2, src_from, src_to)
    odd = jnp.clip((-a + 9 * ev + 9 * b - c + 8) >> 4, 0, pxmax)
    return jnp.where((t & 1)[None, :] == 0, ev, odd)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_z1_batch(tls, off, w, h, bpc, angles=None):
    """Batched Z1 (angle < 90; src/ipred.rs ipred_z1_rust)."""
    angle, is_sm, ief = _decode_angle(angles)
    dx = _dr(angle >> 1)
    wh = w + h
    ups = _upsample_flag(wh, 90 - angle, is_sm) * (ief != 0)
    fs = _filter_strength(wh, 90 - angle, is_sm) * (ief != 0)

    # candidate edge vectors indexed by base
    Lmax = 2 * wh
    raw = _edge_src(tls, off + 1, jnp.arange(Lmax), -1, w + min(w, h))
    flt = _filter_edge(tls, off + 1, Lmax, 0, wh, -1, w + min(w, h), fs)
    up = _upsample_edge(tls, off + 1, wh, -1, w + min(w, h), bpc)
    up = jnp.pad(up, ((0, 0), (0, Lmax - up.shape[1])))
    u = (ups != 0)[:, None]
    top = jnp.where(u, up, jnp.where((fs > 0)[:, None], flt, raw))
    max_base = jnp.where(
        ups != 0, 2 * wh - 2, jnp.where(fs > 0, wh - 1, w + min(w, h) - 1)
    )[:, None, None]

    dx_e = (dx << ups)[:, None, None]
    binc = (1 + ups)[:, None, None]
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    xpos = dx_e * (ys + 1)
    frac = xpos & 0x3E
    base = (xpos >> 6) + xs * binc
    idx = jnp.minimum(base, max_base)
    t0 = jnp.take_along_axis(top[:, None, :], idx.reshape(tls.shape[0], 1, -1), axis=2
                             ).reshape(base.shape)
    t1 = jnp.take_along_axis(top[:, None, :],
                             jnp.minimum(idx + 1, Lmax - 1).reshape(tls.shape[0], 1, -1),
                             axis=2).reshape(base.shape)
    interp = (t0 * (64 - frac) + t1 * frac + 32) >> 6
    fill = jnp.take_along_axis(top, max_base[:, :, 0], axis=1)[:, :, None]
    return jnp.where(base < max_base, interp, fill)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_z3_batch(tls, off, w, h, bpc, angles=None):
    """Batched Z3 (angle > 180; src/ipred.rs ipred_z3_rust). The left edge is
    re-indexed as B[base] = left[left_base - base] so the inner interpolation
    matches Z1 with (x, y) swapped."""
    angle, is_sm, ief = _decode_angle(angles)
    dy = _dr((270 - angle) >> 1)
    wh = w + h
    ups = _upsample_flag(wh, angle - 180, is_sm) * (ief != 0)
    fs = _filter_strength(wh, angle - 180, is_sm) * (ief != 0)

    Lmax = 2 * wh
    i = jnp.arange(Lmax)
    # raw: B[i] = tl[off - 1 - i]
    raw = _edge_src(tls, off - 1, -i, -(h + min(w, h) - 1), 1)
    # filtered: left_out over sz=wh from base off-wh, clip [max(w-h,0), wh+1);
    # B[i] = left_out[wh - 1 - i]
    flt_f = _filter_edge(tls, off - wh, Lmax, 0, wh, max(w - h, 0), wh + 1, fs)
    flt = flt_f[:, ::-1][:, Lmax - wh :]
    flt = jnp.pad(flt, ((0, 0), (0, Lmax - flt.shape[1])))
    # upsampled: left_out over hsz=wh samples; B[i] = left_out[2*wh - 2 - i]
    up_f = _upsample_edge(tls, off - wh, wh, max(w - h, 0), wh + 1, bpc)
    up = up_f[:, ::-1]
    up = jnp.pad(up, ((0, 0), (0, Lmax - up.shape[1])))
    u = (ups != 0)[:, None]
    left = jnp.where(u, up, jnp.where((fs > 0)[:, None], flt, raw))
    max_base = jnp.where(
        ups != 0, 2 * wh - 2, jnp.where(fs > 0, wh - 1, h + min(w, h) - 1)
    )[:, None, None]

    dy_e = (dy << ups)[:, None, None]
    binc = (1 + ups)[:, None, None]
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    ypos = dy_e * (xs + 1)
    frac = ypos & 0x3E
    base = (ypos >> 6) + ys * binc
    idx = jnp.minimum(base, max_base)
    N = tls.shape[0]
    t0 = jnp.take_along_axis(left[:, None, :], idx.reshape(N, 1, -1), axis=2
                             ).reshape(base.shape)
    t1 = jnp.take_along_axis(left[:, None, :],
                             jnp.minimum(idx + 1, Lmax - 1).reshape(N, 1, -1),
                             axis=2).reshape(base.shape)
    interp = (t0 * (64 - frac) + t1 * frac + 32) >> 6
    fillv = jnp.take_along_axis(left, max_base[:, 0, :], axis=1)[:, None, :]
    return jnp.where(base < max_base, interp, jnp.broadcast_to(fillv, base.shape))


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_z2_batch(tls, off, w, h, bpc, angles=None, max_ws=None, max_hs=None,
                   smooth_tl=None):
    """Batched Z2 (90 < angle < 180; src/ipred.rs ipred_z2_rust). smooth_tl
    applies the 5/6/5 top-left smoothing from rav1d_prepare_intra_edges
    (ipred_prepare.rs:184) before edge assembly."""
    angle, is_sm, ief = _decode_angle(angles)
    dy = _dr((angle - 90) >> 1)
    dx = _dr((180 - angle) >> 1)
    wh = w + h
    ua = _upsample_flag(wh, angle - 90, is_sm) * (ief != 0)
    ul = _upsample_flag(wh, 180 - angle, is_sm) * (ief != 0)
    fs_a = _filter_strength(wh, angle - 90, is_sm) * (ief != 0)
    fs_l = _filter_strength(wh, 180 - angle, is_sm) * (ief != 0)

    # top-left smoothing (a prepare_intra_edges responsibility, but it reads
    # neighbour pixel values so it executes on device with the kernel)
    if smooth_tl is not None:
        tl0 = tls[:, off]
        sm_tl = ((tls[:, off - 1] + tls[:, off + 1]) * 5 + tl0 * 6 + 8) >> 4
        tls = tls.at[:, off].set(jnp.where(smooth_tl, sm_tl, tl0))

    # edge buffer: positions j relative to the top-left sample, j in
    # [-2h, 2w]; stored as (N, 2h + 1 + 2w) with center at 2h
    c = 2 * h
    EL = 2 * h + 1 + 2 * w
    j = jnp.arange(EL) - c

    # above candidates (j >= 1)
    t = j  # upsample tap index (t = 0 at topleft)
    k = t >> 1
    ev_a = _edge_src(tls, off, k, 0, w + 1)
    a_a = _edge_src(tls, off, k - 1, 0, w + 1)
    b_a = _edge_src(tls, off, k + 1, 0, w + 1)
    c_a = _edge_src(tls, off, k + 2, 0, w + 1)
    pxmax = (1 << bpc) - 1
    odd_a = jnp.clip((-a_a + 9 * ev_a + 9 * b_a - c_a + 8) >> 4, 0, pxmax)
    up_above = jnp.where((t & 1)[None, :] == 0, ev_a, odd_a)
    i_a = j - 1  # filter_edge index over the above run (i >= 0 at first top)
    raw_a = _edge_src(tls, off + 1, i_a, -1, w)
    Ka = jnp.asarray(_EDGE_KERNELS_NP)[jnp.maximum(fs_a, 1) - 1]
    acc = jnp.zeros_like(raw_a)
    for jj in range(5):
        acc = acc + Ka[:, jj : jj + 1] * _edge_src(tls, off + 1, i_a - 2 + jj, -1, w)
    sm_a = (acc + 8) >> 4
    flt_a = jnp.where(
        (i_a[None, :] >= 0) & (i_a[None, :] < max_ws[:, None]) & (fs_a > 0)[:, None],
        sm_a, raw_a,
    )
    above = jnp.where((ua != 0)[:, None], up_above, flt_a)

    # below candidates (j <= -1)
    tb = j + 2 * h  # upsample tap index (t = 0 at tl[off - h])
    kb = tb >> 1
    ev_b = _edge_src(tls, off - h, kb, 0, h + 1)
    a_b = _edge_src(tls, off - h, kb - 1, 0, h + 1)
    b_b = _edge_src(tls, off - h, kb + 1, 0, h + 1)
    c_b = _edge_src(tls, off - h, kb + 2, 0, h + 1)
    odd_b = jnp.clip((-a_b + 9 * ev_b + 9 * b_b - c_b + 8) >> 4, 0, pxmax)
    up_below = jnp.where((tb & 1)[None, :] == 0, ev_b, odd_b)
    i_l = j + h  # filter_edge index over the left run
    raw_l = _edge_src(tls, off - h, i_l, 0, h + 1)
    Kl = jnp.asarray(_EDGE_KERNELS_NP)[jnp.maximum(fs_l, 1) - 1]
    accl = jnp.zeros_like(raw_l)
    for jj in range(5):
        accl = accl + Kl[:, jj : jj + 1] * _edge_src(tls, off - h, i_l - 2 + jj, 0, h + 1)
    sm_l = (accl + 8) >> 4
    flt_l = jnp.where(
        (i_l[None, :] >= (h - max_hs[:, None])) & (i_l[None, :] < h)
        & (fs_l > 0)[:, None],
        sm_l, raw_l,
    )
    below = jnp.where((ul != 0)[:, None], up_below, flt_l)

    edge = jnp.where(
        j[None, :] > 0, above, jnp.where(j[None, :] < 0, below, tls[:, off : off + 1])
    )

    dx_e = (dx << ua)[:, None, None]
    ys = jnp.arange(h)[None, :, None]
    xs = jnp.arange(w)[None, None, :]
    xpos = ((1 + ua) << 6)[:, None, None] - dx_e * (ys + 1)
    base_x = (xpos >> 6) + xs * (1 + ua)[:, None, None]
    frac_x = xpos & 0x3E
    ypos = (ys << (6 + ul)[:, None, None]) - (dy << ul)[:, None, None] * (xs + 1)
    base_y = ypos >> 6
    frac_y = ypos & 0x3E

    N = tls.shape[0]

    def egather(pos):
        p = jnp.clip(pos, 0, EL - 1).reshape(N, 1, -1)
        return jnp.take_along_axis(edge[:, None, :], p, axis=2).reshape(pos.shape)

    top_v = (
        egather(c + base_x) * (64 - frac_x) + egather(c + base_x + 1) * frac_x
    )
    left_off = c - (1 + ul)[:, None, None]
    left_v = (
        egather(left_off - base_y) * (64 - frac_y)
        + egather(left_off - base_y - 1) * frac_y
    )
    v = jnp.where(base_x >= 0, top_v, left_v)
    return (v + 32) >> 6


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def ipred_filter_batch(tls, off, w, h, bpc, filt_idx=None):
    """Batched FILTER_PRED (src/ipred.rs ipred_filter_rust): per item a
    sequential scan over 2x4 sub-blocks (each depends on the previous row and
    left column of output), vmapped over the batch."""
    taps = jnp.asarray(np.asarray(FILTER_INTRA_TAPS), jnp.int32)  # (5, 8, 7)
    pxmax = (1 << bpc) - 1
    nx = w // 4
    ny = h // 2

    def per_item(tl, fi):
        fm = taps[fi & 511]  # (8, 7)
        buf = jnp.zeros((h + 1, w + 1), jnp.int32)
        buf = buf.at[0, 1:].set(tl[off + 1 : off + 1 + w])
        buf = buf.at[1:, 0].set(tl[off - h : off][::-1])
        buf = buf.at[0, 0].set(tl[off])

        def step(i, buf):
            y = (i // nx) * 2
            x = (i % nx) * 4
            ps = jnp.stack([
                buf[y, x], buf[y, x + 1], buf[y, x + 2], buf[y, x + 3],
                buf[y, x + 4], buf[y + 1, x], buf[y + 2, x],
            ])
            acc = fm @ ps
            vals = jnp.clip((acc + 8) >> 4, 0, pxmax)
            buf = jax.lax.dynamic_update_slice(buf, vals[:4][None, :], (y + 1, x + 1))
            buf = jax.lax.dynamic_update_slice(buf, vals[4:][None, :], (y + 2, x + 1))
            return buf

        # row-major over 2x4 blocks: left blocks of a strip precede the
        # right ones, matching the reference's (y, x) loop nest
        buf = jax.lax.fori_loop(0, nx * ny, step, buf)
        return buf[1:, 1:]

    return jax.vmap(per_item)(tls, filt_idx)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def cfl_ac_batch(ypx, w, h, ss_hor, ss_ver, w_pads=None, h_pads=None):
    """Batched cfl_ac (src/ipred.rs cfl_ac_rust): ypx (N, h << ss_ver,
    w << ss_hor) luma pixels from the block origin; returns (N, h, w) int32
    ac values. Padding replication expressed as clamped gathers."""
    s = ypx.astype(jnp.int32)
    if ss_hor:
        s = s[:, :, 0::2] + s[:, :, 1::2]
    if ss_ver:
        s = s[:, 0::2, :] + s[:, 1::2, :]
    s = s << (1 + (ss_ver == 0) + (ss_hor == 0))
    valid_w = (w - 4 * w_pads)[:, None, None]
    valid_h = (h - 4 * h_pads)[:, None, None]
    ys = jnp.minimum(jnp.arange(h)[None, :, None], valid_h - 1)
    xs = jnp.minimum(jnp.arange(w)[None, None, :], valid_w - 1)
    N = ypx.shape[0]
    flat = s.reshape(N, -1)
    ac = jnp.take_along_axis(
        flat, (ys * w + xs).reshape(N, -1), axis=1
    ).reshape(N, h, w)
    log2sz = _ctz(w) + _ctz(h)
    avg = ((1 << log2sz >> 1) + ac.sum(axis=(1, 2))) >> log2sz
    return ac - avg[:, None, None]


@partial(jax.jit, static_argnums=(3,))
def cfl_pred_batch(dcs, acs, alphas, bpc):
    """Batched cfl_pred (src/ipred.rs cfl_pred_rust)."""
    diff = alphas[:, None, None] * acs
    adj = jnp.where(
        diff < 0, -((jnp.abs(diff) + 32) >> 6), (jnp.abs(diff) + 32) >> 6
    )
    return jnp.clip(dcs[:, None, None] + adj, 0, (1 << bpc) - 1)


@jax.jit
def pal_pred_batch(pals, idxs):
    """Batched pal_pred: pals (N, 8), idxs (N, h, w) palette indices."""
    N = pals.shape[0]
    return jnp.take_along_axis(
        pals, idxs.reshape(N, -1), axis=1
    ).reshape(idxs.shape)

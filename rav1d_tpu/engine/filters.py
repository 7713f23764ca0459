"""Device post-filter chain (engine v2).

In engine mode the reconstruction planes never leave the device between the
wave scan and the output fetch: deblock, CDEF, super-resolution, and loop
restoration all run as whole-frame jitted passes here, fed by the per-frame
mask/level/unit maps the host syntax pass recorded (packed into the single
frame blob). Role parity: the filter_sbrow chain (src/recon.rs:4047-4338)
and its drivers src/lf_apply.rs, src/cdef_apply.rs, src/lr_apply.rs, each
re-expressed as dense masked passes; bit-exactness per pass is held to the
host numpy drivers (recon/{lf,cdef_apply,lr_apply}.py), which the meson MD5
sweep oracles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..headers import PixelLayout, RestorationType
from ..ops.ref.lf import WRITE_EXTENT, calc_eih
from ..ops.tpu.cdef import MISSING, cdef_filter_batch, find_dir_batch
from ..ops.tpu.lf import filter_lines_batch
from ..ops.tpu.lr import sgr_batch, wiener_batch
from .blob import view

LR_CHUNK = 128  # stripes per LR dispatch


# --------------------------------------------------------------------------
# deblock
# --------------------------------------------------------------------------


def lf_dir_pass_raw(plane, cmap, lmap, eih, luma, hor, bpc):
    """All three width classes of one (plane, direction) deblock pass.

    plane: (H, W) int32; cmap/lmap: (nh4, nw4) final edge class / level maps
    (host-resolved: neighbour-level fallback + tile fixups done); eih: (2, 64)
    E/I luts. hor transposes in-kernel so the same math serves both
    directions (recon/lf.py run()).
    """
    if hor:
        plane = plane.T
    nh4, nw4 = cmap.shape
    H = nh4 * 4
    # zero padding mirrors the host driver's pad array exactly
    pad = jnp.pad(plane, ((8, 8), (8, 8 + 8)))
    Wp = pad.shape[1] - (pad.shape[1] % 4)
    padr = pad[:, :Wp].reshape(pad.shape[0], Wp // 4, 4)

    lines4 = jnp.repeat(lmap, 4, axis=0)  # (H, nw4)
    L = lines4.reshape(-1)
    E = eih[0][L]
    I = eih[1][L]
    Hh = L >> 4

    for cls_ in (1, 2, 3):
        wd = (4 << (cls_ - 1)) if luma else (4 + 2 * (cls_ - 1))
        # window col k for cell x lives at pad col x*4 + k = group x + k//4
        win = jnp.stack(
            [padr[8 : 8 + H, (k >> 2) : (k >> 2) + nw4, k & 3]
             for k in range(16)],
            axis=-1,
        )  # (H, nw4, 16)
        out = filter_lines_batch(win.reshape(-1, 16), E, I, Hh, wd, bpc)
        out = out.reshape(H, nw4, 16)
        sel = jnp.repeat((cmap == cls_) & (lmap != 0), 4, axis=0)
        lo, hi = WRITE_EXTENT[wd]
        for k in range(lo, hi):
            cur = padr[8 : 8 + H, (k >> 2) : (k >> 2) + nw4, k & 3]
            padr = padr.at[8 : 8 + H, (k >> 2) : (k >> 2) + nw4, k & 3].set(
                jnp.where(sel, out[:, :, k], cur)
            )
    res = padr.reshape(pad.shape[0], Wp)[8 : 8 + plane.shape[0],
                                         8 : 8 + plane.shape[1]]
    return res.T if hor else res


def plan_deblock(f, blob):
    """Resolve final class/level maps on the host (neighbour fallback, tile
    fixups) and pack them; returns the pass list for run_deblock."""
    from ..recon.lf import _fix_tile_cols

    frame_hdr = f.frame_hdr
    if frame_hdr.loopfilter.level_y == [0, 0] and (
        frame_hdr.loopfilter.level_u == 0 and frame_hdr.loopfilter.level_v == 0
    ):
        return None
    _fix_tile_cols(f)
    layout = f.cur.layout
    ss_ver = 1 if layout == PixelLayout.I420 else 0
    ss_hor = 1 if layout != PixelLayout.I444 else 0
    h4, w4 = f.bh, f.bw
    ch4 = (f.bh + ss_ver) >> ss_ver
    cw4 = (f.bw + ss_hor) >> ss_hor
    e_lut, i_lut = calc_eih(frame_hdr.loopfilter.sharpness)
    eih = blob.add(np.stack([np.asarray(e_lut, np.int32),
                             np.asarray(i_lut, np.int32)]))
    have_y = frame_hdr.loopfilter.level_y != [0, 0]
    have_uv = (
        layout != PixelLayout.I400
        and (frame_hdr.loopfilter.level_u or frame_hdr.loopfilter.level_v)
    )

    def resolve(cls_map, comp, nh4, nw4, horizontal):
        cm = np.asarray(cls_map[:nh4, :nw4], np.int32)
        lv = f.lf_level[:nh4, :nw4, comp].astype(np.int32)
        lprev = np.zeros_like(lv)
        if horizontal:
            lprev[1:, :] = lv[:-1, :]
            lv = np.where(lv != 0, lv, lprev)
            lv[0, :] = 0
        else:
            lprev[:, 1:] = lv[:, :-1]
            lv = np.where(lv != 0, lv, lprev)
            lv[:, 0] = 0
        cm = np.where(lv != 0, cm, 0)
        if horizontal:
            cm, lv = cm.T, lv.T  # kernel transposes the plane; maps match
        return blob.add(cm), blob.add(lv)

    passes = []  # (plane_idx, hcm, hlv, luma, hor)
    if have_y:
        passes.append((0, *resolve(f.lf_cls[0], 0, h4, w4, False), True, False))
    if have_uv:
        passes.append((1, *resolve(f.lf_cls[2], 2, ch4, cw4, False), False, False))
        passes.append((2, *resolve(f.lf_cls[2], 3, ch4, cw4, False), False, False))
    if have_y:
        passes.append((0, *resolve(f.lf_cls[1], 1, h4, w4, True), True, True))
    if have_uv:
        passes.append((1, *resolve(f.lf_cls[3], 2, ch4, cw4, True), False, True))
        passes.append((2, *resolve(f.lf_cls[3], 3, ch4, cw4, True), False, True))
    return (eih, passes)


def run_deblock(planes, dp, dev, bpc):
    """Chroma planes live top-left in the full (ah, aw) canvas, so each pass
    runs on the whole canvas — reads beyond the chroma region see zeros,
    exactly the host driver's zero pad."""
    if dp is None:
        return planes
    heih, passes = dp
    eih = view(dev, heih)
    for pl, hcm, hlv, luma, hor in passes:
        planes = planes.at[pl].set(
            lf_dir_pass(planes[pl], view(dev, hcm), view(dev, hlv), eih,
                        luma, hor, bpc)
        )
    return planes


# --------------------------------------------------------------------------
# cdef
# --------------------------------------------------------------------------


def cdef_pass_raw(planes, maps, damping, nby, nbx, bh, bw, ss_hor, ss_ver, uv422,
              bpc):
    """Dense whole-frame CDEF: direction search on pre-CDEF luma + filter of
    every active 8x8 unit, all planes (recon/cdef_apply.py apply_cdef)."""
    y_pri, y_sec, uv_lvl, uv_pri, uv_sec = (
        maps[0], maps[1], maps[2], maps[3], maps[4]
    )
    N = nby * nbx

    ys = jnp.arange(nby) * 8
    xs = jnp.arange(nbx) * 8
    ones_x = jnp.ones(nbx, bool)[None, :]
    # unit availability at frame edges (cdef_apply.rs:36)
    have_t = (jnp.arange(nby) > 0)[:, None] & ones_x
    have_b = ((jnp.arange(nby) * 2 + 2) < bh)[:, None] & ones_x
    have_l = jnp.ones(nby, bool)[:, None] & (jnp.arange(nbx) > 0)[None, :]
    have_r = jnp.ones(nby, bool)[:, None] & ((jnp.arange(nbx) * 2 + 2) < bw)[None, :]

    def windows(src, cys, cxs, ch, cw):
        padp = jnp.pad(src, 2, constant_values=MISSING)
        rows = cys[:, None] + jnp.arange(ch + 4)[None, :]
        cols = cxs[:, None] + jnp.arange(cw + 4)[None, :]
        win = padp[rows[:, None, :, None], cols[None, :, None, :]]
        # (nby, nbx, ch+4, cw+4); mask unavailable borders
        win = jnp.where(have_t[:, :, None, None]
                        | (jnp.arange(ch + 4) >= 2)[None, None, :, None],
                        win, MISSING)
        win = jnp.where(have_b[:, :, None, None]
                        | (jnp.arange(ch + 4) < ch + 2)[None, None, :, None],
                        win, MISSING)
        win = jnp.where(have_l[:, :, None, None]
                        | (jnp.arange(cw + 4) >= 2)[None, None, None, :],
                        win, MISSING)
        win = jnp.where(have_r[:, :, None, None]
                        | (jnp.arange(cw + 4) < cw + 2)[None, None, None, :],
                        win, MISSING)
        return win.reshape(N, ch + 4, cw + 4)

    # direction search on pre-CDEF luma
    pre_y = planes[0]
    rows = ys[:, None] + jnp.arange(8)[None, :]
    cols = xs[:, None] + jnp.arange(8)[None, :]
    blocks = pre_y[rows[:, None, :, None], cols[None, :, None, :]]
    direction, variance = find_dir_batch(
        blocks.reshape(N, 8, 8).astype(jnp.int32), bpc
    )

    ypri_f = y_pri.reshape(-1)
    ysec_f = y_sec.reshape(-1)
    # variance-adjusted primary strength (cdef.rs adjust_strength)
    v6 = variance >> 6
    lg = 31 - jax.lax.clz(jnp.maximum(jnp.minimum(v6, 4095), 1))
    i = jnp.where(v6 >= 4096, 12, jnp.minimum(lg, 12))
    adj = (ypri_f * (4 + i) + 8) >> 4
    pri_eff = jnp.where(ypri_f > 0, jnp.where(variance == 0, 0, adj), 0)
    dir_eff = jnp.where(ypri_f > 0, direction, 0)
    do_y = (pri_eff > 0) | (ysec_f > 0)

    wins = windows(pre_y, ys, xs, 8, 8)
    outy = cdef_filter_batch(wins, pri_eff, ysec_f, dir_eff,
                             jnp.full((N,), damping, jnp.int32), bpc)
    newy = planes[0]
    sel = do_y.reshape(nby, nbx)[:, :, None, None]
    blk = newy[rows[:, None, :, None], cols[None, :, None, :]]
    outy = jnp.where(sel, outy.reshape(nby, nbx, 8, 8), blk)
    newy = newy.at[rows[:, None, :, None], cols[None, :, None, :]].set(outy)
    planes = planes.at[0].set(newy)

    if uv422 >= 0:  # chroma present
        UV_DIRS = jnp.asarray(
            [[0, 1, 2, 3, 4, 5, 6, 7], [7, 0, 2, 4, 5, 6, 6, 6]], jnp.int32
        )[uv422]
        uvp = uv_pri.reshape(-1)
        uvs = uv_sec.reshape(-1)
        do_uv = uv_lvl.reshape(-1) != 0
        uvdir = jnp.where(uvp > 0, UV_DIRS[direction], 0)
        ch, cw = 8 >> ss_ver, 8 >> ss_hor
        cys = (ys >> ss_ver)
        cxs = (xs >> ss_hor)
        crows = cys[:, None] + jnp.arange(ch)[None, :]
        ccols = cxs[:, None] + jnp.arange(cw)[None, :]
        seluv = do_uv.reshape(nby, nbx)[:, :, None, None]
        for pl in (1, 2):
            src = planes[pl]
            wins = windows(src, cys, cxs, ch, cw)
            out = cdef_filter_batch(wins, uvp, uvs, uvdir,
                                    jnp.full((N,), damping - 1, jnp.int32),
                                    bpc)
            blk = src[crows[:, None, :, None], ccols[None, :, None, :]]
            out = jnp.where(seluv, out.reshape(nby, nbx, ch, cw), blk)
            src = src.at[crows[:, None, :, None],
                         ccols[None, :, None, :]].set(out)
            planes = planes.at[pl].set(src)
    return planes


def plan_cdef(f, blob):
    frame_hdr = f.frame_hdr
    cdef = frame_hdr.cdef
    if all(
        cdef.y_strength[i] == 0 and cdef.uv_strength[i] == 0
        for i in range(1 << cdef.n_bits)
    ):
        return None
    bpc = f.cur.bpc
    bdm8 = bpc - 8
    bw, bh = f.bw, f.bh
    nby, nbx = (bh + 1) >> 1, (bw + 1) >> 1
    noskip = f.noskip8[:nby, :nbx] != 0
    cdef_idx = f.cdef_idx[
        (np.arange(nby)[:, None] * 2) >> 4, (np.arange(nbx)[None, :] * 2) >> 4
    ].astype(np.int64)
    ok = (cdef_idx >= 0) & noskip
    y_str = np.asarray(cdef.y_strength, np.int64)
    uv_str = np.asarray(cdef.uv_strength, np.int64)
    y_lvl = np.where(ok, y_str[np.maximum(cdef_idx, 0)], 0)
    uv_lvl = np.where(ok, uv_str[np.maximum(cdef_idx, 0)], 0)
    keep = (y_lvl != 0) | (uv_lvl != 0)
    if not keep.any():
        return None
    y_lvl = np.where(keep, y_lvl, 0)
    uv_lvl = np.where(keep, uv_lvl, 0)
    y_pri = ((y_lvl >> 2) << bdm8).astype(np.int32)
    y_sec = y_lvl & 3
    y_sec = (np.where(y_sec == 3, 4, y_sec) << bdm8).astype(np.int32)
    uv_pri = ((uv_lvl >> 2) << bdm8).astype(np.int32)
    uv_sec = uv_lvl & 3
    uv_sec = (np.where(uv_sec == 3, 4, uv_sec) << bdm8).astype(np.int32)
    maps = np.stack([y_pri, y_sec, uv_lvl.astype(np.int32), uv_pri, uv_sec])
    return (blob.add(maps), cdef.damping + bdm8, nby, nbx)


def run_cdef(planes, cp, dev, f):
    if cp is None:
        return planes
    hmaps, damping, nby, nbx = cp
    layout = f.cur.layout
    ss_ver = 1 if layout == PixelLayout.I420 else 0
    ss_hor = 1 if layout != PixelLayout.I444 else 0
    uv422 = -1 if layout == PixelLayout.I400 else (
        1 if layout == PixelLayout.I422 else 0
    )
    return cdef_pass(planes, view(dev, hmaps), damping, nby, nbx,
                     f.bh, f.bw, ss_hor, ss_ver, uv422, f.cur.bpc)


# --------------------------------------------------------------------------
# super-resolution
# --------------------------------------------------------------------------


def resize_plane_raw(src, h, dst_w, src_w, dx, mx0, bpc, out_w):
    """Horizontal 8-tap resample (mc.rs resize_rust:1114) with traced
    step/start; out_w = padded output width (zero-filled tail)."""
    from ..tables import spec_data as _sd

    RF = jnp.asarray(np.asarray(_sd.RESIZE_FILTER), jnp.int32)
    pxmax = (1 << bpc) - 1
    pos = mx0 + jnp.arange(dst_w) * dx
    src_x = -1 + (pos >> 14) - (mx0 >> 14)
    filt = RF[(pos & 0x3FFF) >> 8]
    acc = jnp.zeros((h, dst_w), jnp.int32)
    for k in range(8):
        cols = jnp.clip(src_x + k - 3, 0, src_w - 1)
        acc = acc + filt[None, :, k] * src[:h, cols].astype(jnp.int32)
    out = jnp.clip((-acc + 64) >> 7, 0, pxmax)
    return jnp.pad(out, ((0, 0), (0, out_w - dst_w)))


# --------------------------------------------------------------------------
# loop restoration
# --------------------------------------------------------------------------

# stripe descriptor rows
(S_X0, S_Y0, S_W, S_H, S_XLO, S_XHI, S_TOP0, S_TOP1, S_BOT0, S_BOT1,
 S_P0, S_P1, S_P2, S_P3, S_P4, S_P5) = range(16)


def _gather_stripes(cat, d, W6):
    """cat: (2*H, W) concat(pre_lr, lpf); d: (16, N). -> (N, 70, W6)."""
    i = jnp.arange(70)[None, :]
    h = d[S_H][:, None]
    y0 = d[S_Y0][:, None]
    inner = y0 + jnp.clip(i - 3, 0, jnp.maximum(h - 1, 0))
    rmap = jnp.where(
        i < 2, d[S_TOP0][:, None],
        jnp.where(
            i < 3, d[S_TOP1][:, None],
            jnp.where(
                i < 3 + h, inner,
                jnp.where(i == 3 + h, d[S_BOT0][:, None], d[S_BOT1][:, None]),
            ),
        ),
    )
    c = jnp.arange(W6)[None, :]
    cmap = jnp.clip(d[S_X0][:, None] - 3 + c, d[S_XLO][:, None],
                    d[S_XHI][:, None])
    return cat[rmap[:, :, None], cmap[:, None, :]].astype(jnp.int32)


def _lr_scatter(pf, out, d, aw):
    r = jnp.arange(out.shape[1])
    c = jnp.arange(out.shape[2])
    idx = ((d[S_Y0][:, None, None] + r[None, :, None]) * aw
           + d[S_X0][:, None, None] + c[None, None, :])
    valid = (r[None, :, None] < d[S_H][:, None, None]) & (
        c[None, None, :] < d[S_W][:, None, None]
    )
    big = jnp.iinfo(jnp.int32).max
    return pf.at[jnp.where(valid, idx, big)].set(out, mode="drop")


def lr_wiener_pass_raw(pf, cat, d, W, bpc, aw):
    tmps = _gather_stripes(cat, d, W + 6)
    out = wiener_batch(tmps, jnp.stack([d[S_P0], d[S_P1], d[S_P2]], 1),
                       jnp.stack([d[S_P3], d[S_P4], d[S_P5]], 1), W, 64, bpc)
    return _lr_scatter(pf, out, d, aw)


def lr_sgr_pass_raw(pf, cat, d, W, kind, bpc, aw):
    tmps = _gather_stripes(cat, d, W + 6)
    cur = tmps[:, 3 : 3 + 64, 3 : 3 + W]
    out = sgr_batch(cur, tmps, d[S_P0], d[S_P1],
                    jnp.stack([d[S_P2], d[S_P3]], 1), W, 64, kind, bpc)
    return _lr_scatter(pf, out, d, aw)


def plan_lr(f, blob):
    """Walk the LR unit grid exactly like recon/lr_apply.py apply_lr and
    emit per-stripe descriptors (grouped by kernel kind and unit width)."""
    from ..recon.lr_apply import RestorationUnit, restore_planes_mask

    frame_hdr = f.frame_hdr
    restore_planes = restore_planes_mask(frame_hdr)
    if not restore_planes:
        return None
    seq_hdr = f.seq_hdr
    sb128 = seq_hdr.sb128
    layout = f.cur.layout
    sr = f.sr_cur
    groups = {}  # (kind, W) -> cols ; kind: 'w', 0, 1, 2

    def emit_stripes(plane_idx, x, y, unit_w, row_h, lr, plane_h, w_plane,
                     ss_ver, Wmax):
        chroma = 1 if plane_idx else 0
        bpc = f.cur.bpc  # noqa: F841
        stripe_h = min((64 - 8 * (1 if y == 0 else 0)) >> ss_ver, row_h - y)
        have_left = x > 0
        have_top = y > 0
        sby_cur = (y + ((8 << ss_ver) if y else 0)) >> (6 - ss_ver + sb128)
        while y + stripe_h <= row_h:
            have_bottom = sby_cur + 1 != f.sbh or y + stripe_h != row_h
            have_right = x + unit_w < w_plane
            below = y + stripe_h
            below2 = below if below + 1 == plane_h else below + 1
            H = plane_h  # rows per source in cat
            xlo = x - (3 if have_left else 0)
            xhi = x + unit_w - 1 + (3 if have_right else 0)
            if have_top:
                top0 = H + (y - 2)
                top1 = H + (y - 2) + 1
            else:
                top0 = top1 = y
            if have_bottom:
                bot0 = H + below
                bot1 = H + below2
            else:
                bot0 = bot1 = y + stripe_h - 1
            if lr.type == RestorationType.WIENER:
                key = ("w", Wmax, plane_idx)
                p = (lr.filter_h[0], lr.filter_h[1], lr.filter_h[2],
                     lr.filter_v[0], lr.filter_v[1], lr.filter_v[2])
            else:
                from ..tables.spec_data import SGR_PARAMS

                s0 = int(SGR_PARAMS[lr.sgr_idx][0])
                s1 = int(SGR_PARAMS[lr.sgr_idx][1])
                w0 = lr.sgr_weights[0]
                w1 = 128 - (lr.sgr_weights[0] + lr.sgr_weights[1])
                # kind: 0 = 5x5 only (uses w0), 1 = 3x3 only (uses w1),
                # 2 = mix (ops/ref/lr.py sgr:217-231)
                kind = 2 if (s0 and s1) else (0 if s0 else 1)
                key = (kind, Wmax, plane_idx)
                p = (s0, s1, w0, w1, 0, 0)
            groups.setdefault(key, []).append(
                (x, y, unit_w, stripe_h, xlo, xhi, top0, top1, bot0, bot1) + p
            )
            y += stripe_h
            stripe_h = min(64 >> ss_ver, row_h - y)
            if stripe_h == 0:
                break

    def walk_plane(plane_idx, w, h, ss_ver, ss_hor):
        unit_size_log2 = frame_hdr.restoration.unit_size[1 if plane_idx else 0]
        unit_size = 1 << unit_size_log2
        half_unit = unit_size >> 1
        max_unit_size = unit_size + half_unit
        Wmax = max_unit_size
        shift_hor = 7 - ss_hor
        for sby in range(f.sbh):
            offset = (8 >> ss_ver) if sby else 0
            not_last = 1 if sby + 1 < f.sbh else 0
            next_row_y = (sby + 1) << (6 - ss_ver + sb128)
            row_h = min(next_row_y - (8 >> ss_ver) * not_last, h)
            y_stripe = (sby << (6 - ss_ver + sb128)) - offset
            y = y_stripe
            row_y = y + ((8 >> ss_ver) if y else 0)
            aligned_unit_pos = row_y & ~(unit_size - 1)
            if aligned_unit_pos and aligned_unit_pos + half_unit > h:
                aligned_unit_pos -= unit_size
            aligned_unit_pos <<= ss_ver
            sb_idx = (aligned_unit_pos >> 7) * f.sr_sb128w
            unit_idx = ((aligned_unit_pos >> 6) & 1) << 1

            def get_unit(si, ui):
                u = f.lr_units.get((plane_idx, si, ui))
                return u if u is not None else RestorationUnit()

            lr = [get_unit(sb_idx, unit_idx), None]
            restore = lr[0].type != RestorationType.NONE
            x = 0
            bit = 0
            while x + max_unit_size <= w:
                next_x = x + unit_size
                next_u_idx = unit_idx + ((next_x >> (shift_hor - 1)) & 1)
                lr[1 - bit] = get_unit(sb_idx + (next_x >> shift_hor),
                                       next_u_idx)
                if restore:
                    emit_stripes(plane_idx, x, y, unit_size, row_h, lr[bit],
                                 h, w, ss_ver, Wmax)
                x = next_x
                restore = lr[1 - bit].type != RestorationType.NONE
                bit = 1 - bit
            if restore:
                emit_stripes(plane_idx, x, y, w - x, row_h, lr[bit], h, w,
                             ss_ver, Wmax)

    if restore_planes & 1:
        walk_plane(0, sr.w, sr.h, 0, 0)
    if layout != PixelLayout.I400 and restore_planes & 6:
        ss_ver = 1 if layout == PixelLayout.I420 else 0
        ss_hor = 1 if layout != PixelLayout.I444 else 0
        cw = (sr.w + ss_hor) >> ss_hor
        ch = (sr.h + ss_ver) >> ss_ver
        if restore_planes & 2:
            walk_plane(1, cw, ch, ss_ver, ss_hor)
        if restore_planes & 4:
            walk_plane(2, cw, ch, ss_ver, ss_hor)

    from .blob import bucket

    out = {}
    for key, cols in groups.items():
        n = len(cols)
        npad = bucket((n + LR_CHUNK - 1) // LR_CHUNK, lo=1) * LR_CHUNK
        d = np.zeros((16, npad), np.int32)
        d[:, :n] = np.asarray(cols, np.int32).T
        out[key] = blob.add(d)
    return out


def run_lr(planes, lrp, dev, pre_cdef, sr, bpc):
    """Apply planned LR stripes: per-plane cat(pre_lr, lpf) source (row
    plane_h + r addresses lpf row r — the descriptor layout plan_lr built),
    chunked kernel dispatches."""
    if lrp is None:
        return planes
    ss_hor, ss_ver = sr.ss_hor, sr.ss_ver
    vis = {
        0: sr.h,
        1: (sr.h + ss_ver) >> ss_ver,
        2: (sr.h + ss_ver) >> ss_ver,
    }
    aw = planes.shape[2]
    for pl in (0, 1, 2):
        keys = [k for k in lrp if k[2] == pl]
        if not keys:
            continue
        ph = vis[pl]
        plane = planes[pl]
        cat = jnp.concatenate([plane[:ph], pre_cdef[pl][:ph]])
        pf = plane.reshape(-1)
        for key in keys:
            kind, W, _ = key
            d = view(dev, lrp[key])
            for i in range(0, d.shape[1], LR_CHUNK):
                dd = d[:, i : i + LR_CHUNK]
                if kind == "w":
                    pf = lr_wiener_pass(pf, cat, dd, W, bpc, aw)
                else:
                    pf = lr_sgr_pass(pf, cat, dd, W, kind, bpc, aw)
        planes = planes.at[pl].set(pf.reshape(plane.shape))
    return planes

# jitted aliases (the per-call dispatch path; engine v3 traces the raw
# impls inside its single filter program instead)
lf_dir_pass = partial(jax.jit, static_argnums=(4, 5, 6), donate_argnums=(0,))(
    lf_dir_pass_raw
)
cdef_pass = partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10))(
    cdef_pass_raw
)
resize_plane = partial(jax.jit, static_argnums=(1, 2, 3, 6, 7))(
    resize_plane_raw
)
lr_wiener_pass = partial(
    jax.jit, static_argnums=(3, 4, 5), donate_argnums=(0,)
)(lr_wiener_pass_raw)
lr_sgr_pass = partial(
    jax.jit, static_argnums=(3, 4, 5, 6), donate_argnums=(0,)
)(lr_sgr_pass_raw)

"""CDEF: constrained directional enhancement filter.

Behavior parity: src/cdef.rs (cdef_filter_block_c, cdef_find_dir_rust) and
src/cdef_apply.rs (rav1d_cdef_brow). All neighbour pixels come from the
pre-CDEF image copy, which is exactly what rav1d's 2-line backups provide.
"""

from __future__ import annotations

import numpy as np

from ...tables.spec_data import CDEF_DIRECTIONS

MISSING = -32768  # i16::MIN fill for unavailable edges


def _ulog2(v):
    return v.bit_length() - 1


def constrain(diff, threshold, shift):
    adiff = abs(diff)
    v = min(adiff, max(0, threshold - (adiff >> shift)))
    return -v if diff < 0 else v


def find_dir(img, bpc):
    """img: (8,8) int array. Returns (dir, var) (cdef_find_dir_rust)."""
    bdm8 = bpc - 8
    partial_sum_hv = [[0] * 8, [0] * 8]
    partial_sum_diag = [[0] * 15, [0] * 15]
    partial_sum_alt = [[0] * 11 for _ in range(4)]
    for y in range(8):
        for x in range(8):
            px = (int(img[y, x]) >> bdm8) - 128
            partial_sum_diag[0][y + x] += px
            partial_sum_alt[0][y + (x >> 1)] += px
            partial_sum_hv[0][y] += px
            partial_sum_alt[1][3 + y - (x >> 1)] += px
            partial_sum_diag[1][7 + y - x] += px
            partial_sum_alt[2][3 - (y >> 1) + x] += px
            partial_sum_hv[1][x] += px
            partial_sum_alt[3][(y >> 1) + x] += px
    M = 0xFFFFFFFF
    cost = [0] * 8
    for n in range(8):
        cost[2] = (cost[2] + partial_sum_hv[0][n] ** 2) & M
        cost[6] = (cost[6] + partial_sum_hv[1][n] ** 2) & M
    cost[2] = (cost[2] * 105) & M
    cost[6] = (cost[6] * 105) & M
    div_table = [840, 420, 280, 210, 168, 140, 120]
    for n in range(7):
        d = div_table[n]
        cost[0] = (
            cost[0]
            + (partial_sum_diag[0][n] ** 2 + partial_sum_diag[0][14 - n] ** 2) * d
        ) & M
        cost[4] = (
            cost[4]
            + (partial_sum_diag[1][n] ** 2 + partial_sum_diag[1][14 - n] ** 2) * d
        ) & M
    cost[0] = (cost[0] + partial_sum_diag[0][7] ** 2 * 105) & M
    cost[4] = (cost[4] + partial_sum_diag[1][7] ** 2 * 105) & M
    for n in range(4):
        c = cost[n * 2 + 1]
        for m in range(5):
            c = (c + partial_sum_alt[n][3 + m] ** 2) & M
        c = (c * 105) & M
        for m in range(3):
            d = div_table[2 * m + 1]
            c = (
                c + (partial_sum_alt[n][m] ** 2 + partial_sum_alt[n][10 - m] ** 2) * d
            ) & M
        cost[n * 2 + 1] = c
    best_dir = 0
    best_cost = cost[0]
    for n in range(1, 8):
        if cost[n] > best_cost:
            best_cost = cost[n]
            best_dir = n
    var = ((best_cost - cost[best_dir ^ 4]) & M) >> 10
    return best_dir, var


def adjust_strength(strength, var):
    if var == 0:
        return 0
    i = min(_ulog2(var >> 6), 12) if (var >> 6) else 0
    return (strength * (4 + i) + 8) >> 4


def cdef_filter_block(
    dst, src, y0, x0, w, h, pri_strength, sec_strength, direction, damping,
    have_left, have_right, have_top, have_bottom, bpc,
):
    """Filter a w x h block at (y0, x0): read from `src` (pre-CDEF copy),
    write into `dst`. Parity: cdef_filter_block_c with padding()."""
    # build tmp with 2px border, MISSING where unavailable
    tmp = np.full((h + 4, w + 4), MISSING, dtype=np.int32)
    ph, pw = src.shape
    ys = y0 - 2 if have_top else y0
    ye = y0 + h + 2 if have_bottom else y0 + h
    xs = x0 - 2 if have_left else x0
    xe = x0 + w + 2 if have_right else x0 + w
    ys_c, ye_c = max(ys, 0), min(ye, ph)
    xs_c, xe_c = max(xs, 0), min(xe, pw)
    tmp[
        2 + (ys_c - y0) : 2 + (ye_c - y0), 2 + (xs_c - x0) : 2 + (xe_c - x0)
    ] = src[ys_c:ye_c, xs_c:xe_c]

    bdm8 = bpc - 8
    if pri_strength:
        pri_tap = 4 - ((pri_strength >> bdm8) & 1)
        pri_shift = max(0, damping - _ulog2(pri_strength))
    sec_shift = damping - _ulog2(sec_strength) if sec_strength else 0

    for yy in range(h):
        for xx in range(w):
            px = int(dst[y0 + yy, x0 + xx])
            ty, tx = 2 + yy, 2 + xx
            s = 0
            if pri_strength and sec_strength:
                mx = mn = px
                pri_tap_k = pri_tap
                for k in range(2):
                    o1 = CDEF_DIRECTIONS[direction + 2][k]
                    oy, ox = _off(o1)
                    p0 = int(tmp[ty + oy, tx + ox])
                    p1 = int(tmp[ty - oy, tx - ox])
                    s += pri_tap_k * constrain(p0 - px, pri_strength, pri_shift)
                    s += pri_tap_k * constrain(p1 - px, pri_strength, pri_shift)
                    pri_tap_k = (pri_tap_k & 3) | 2
                    mn = _umin(p0, mn)
                    mx = max(p0, mx)
                    mn = _umin(p1, mn)
                    mx = max(p1, mx)
                    o2 = CDEF_DIRECTIONS[direction + 4][k]
                    o3 = CDEF_DIRECTIONS[direction + 0][k]
                    oy2, ox2 = _off(o2)
                    oy3, ox3 = _off(o3)
                    s0 = int(tmp[ty + oy2, tx + ox2])
                    s1 = int(tmp[ty - oy2, tx - ox2])
                    s2 = int(tmp[ty + oy3, tx + ox3])
                    s3 = int(tmp[ty - oy3, tx - ox3])
                    sec_tap = 2 - k
                    s += sec_tap * constrain(s0 - px, sec_strength, sec_shift)
                    s += sec_tap * constrain(s1 - px, sec_strength, sec_shift)
                    s += sec_tap * constrain(s2 - px, sec_strength, sec_shift)
                    s += sec_tap * constrain(s3 - px, sec_strength, sec_shift)
                    for sv in (s0, s1, s2, s3):
                        mn = _umin(sv, mn)
                        mx = max(sv, mx)
                out = px + ((s - (1 if s < 0 else 0) + 8) >> 4)
                out = max(mn, min(out, mx))
                dst[y0 + yy, x0 + xx] = out
            elif pri_strength:
                pri_tap_k = pri_tap
                for k in range(2):
                    o1 = CDEF_DIRECTIONS[direction + 2][k]
                    oy, ox = _off(o1)
                    p0 = int(tmp[ty + oy, tx + ox])
                    p1 = int(tmp[ty - oy, tx - ox])
                    s += pri_tap_k * constrain(p0 - px, pri_strength, pri_shift)
                    s += pri_tap_k * constrain(p1 - px, pri_strength, pri_shift)
                    pri_tap_k = (pri_tap_k & 3) | 2
                dst[y0 + yy, x0 + xx] = px + ((s - (1 if s < 0 else 0) + 8) >> 4)
            else:
                for k in range(2):
                    o2 = CDEF_DIRECTIONS[direction + 4][k]
                    o3 = CDEF_DIRECTIONS[direction + 0][k]
                    oy2, ox2 = _off(o2)
                    oy3, ox3 = _off(o3)
                    s0 = int(tmp[ty + oy2, tx + ox2])
                    s1 = int(tmp[ty - oy2, tx - ox2])
                    s2 = int(tmp[ty + oy3, tx + ox3])
                    s3 = int(tmp[ty - oy3, tx - ox3])
                    sec_tap = 2 - k
                    s += sec_tap * constrain(s0 - px, sec_strength, sec_shift)
                    s += sec_tap * constrain(s1 - px, sec_strength, sec_shift)
                    s += sec_tap * constrain(s2 - px, sec_strength, sec_shift)
                    s += sec_tap * constrain(s3 - px, sec_strength, sec_shift)
                dst[y0 + yy, x0 + xx] = px + ((s - (1 if s < 0 else 0) + 8) >> 4)


def _umin(a, b):
    """min with u32-cast semantics (MISSING treated as huge)."""
    return b if (a & 0xFFFFFFFF) >= (b & 0xFFFFFFFF) else a


def _off(o):
    """Decode a packed cdef direction offset o = dy*12 + dx (dx in -2..2)."""
    o = int(o)
    dy = (o + 6) // 12
    return dy, o - dy * 12

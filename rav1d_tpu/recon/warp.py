"""Warped-motion parameter derivation (behavior parity: src/warpmv.rs).

Pure-Python control plane: shear validation, affine least-squares from
neighbour MVs. The actual warp filtering is in rav1d_tpu.ops.mc.
"""

from __future__ import annotations

# div_lut[f] = round(2^22 / (256 + f)) — the AV1 spec division LUT
# (spec 7.11.3.7); generated, identical in every conforming decoder.
DIV_LUT = [(2**22 + (256 + f) // 2) // (256 + f) for f in range(257)]


def iclip(v, lo, hi):
    return lo if v < lo else hi if v > hi else v


def apply_sign(v, s):
    return -v if s < 0 else v


def _iclip_wmp(v: int) -> int:
    cv = iclip(v, -32768, 32767)
    return apply_sign((abs(cv) + 32) >> 6, cv) * (1 << 6)


def _resolve_divisor_32(d: int):
    shift = d.bit_length() - 1
    e = d - (1 << shift)
    if shift > 8:
        f = (e + (1 << (shift - 9))) >> (shift - 8)
    else:
        f = e << (8 - shift)
    return shift + 14, DIV_LUT[f]


def _resolve_divisor_64(d: int):
    return _resolve_divisor_32(d)  # same formula; python ints are wide


def get_shear_params(wm) -> bool:
    """Compute alpha/beta/gamma/delta; returns True if params are INVALID
    (ref: src/warpmv.rs:51 rav1d_get_shear_params)."""
    mat = wm.matrix
    if mat[2] <= 0:
        return True
    alpha = _iclip_wmp(mat[2] - 0x10000)
    beta = _iclip_wmp(mat[3])
    shift, y = _resolve_divisor_32(abs(mat[2]))
    y = apply_sign(y, mat[2])
    v1 = mat[4] * 0x10000 * y
    rnd = (1 << shift) >> 1
    gamma = _iclip_wmp(apply_sign((abs(v1) + rnd) >> shift, v1))
    v2 = mat[3] * mat[4] * y
    delta = _iclip_wmp(mat[5] - apply_sign((abs(v2) + rnd) >> shift, v2) - 0x10000)
    wm.alpha, wm.beta, wm.gamma, wm.delta = alpha, beta, gamma, delta
    return (
        4 * abs(alpha) + 7 * abs(beta) >= 0x10000
        or 4 * abs(gamma) + 4 * abs(delta) >= 0x10000
    )


def _get_mult_shift_ndiag(px: int, idet: int, shift: int) -> int:
    v1 = px * idet
    v2 = apply_sign((abs(v1) + ((1 << shift) >> 1)) >> shift, v1)
    return iclip(v2, -0x1FFF, 0x1FFF)


def _get_mult_shift_diag(px: int, idet: int, shift: int) -> int:
    v1 = px * idet
    v2 = apply_sign((abs(v1) + ((1 << shift) >> 1)) >> shift, v1)
    return iclip(v2, 0xE001, 0x11FFF)


def set_affine_mv2d(bw4, bh4, mv_x, mv_y, wm, bx4, by4):
    """ref: src/warpmv.rs rav1d_set_affine_mv2d."""
    mat = wm.matrix
    rsuy = 2 * bh4 - 1
    rsux = 2 * bw4 - 1
    isuy = by4 * 4 + rsuy
    isux = bx4 * 4 + rsux
    mat[0] = iclip(
        mv_x * 0x2000 - (isux * (mat[2] - 0x10000) + isuy * mat[3]),
        -0x800000,
        0x7FFFFF,
    )
    mat[1] = iclip(
        mv_y * 0x2000 - (isux * mat[4] + isuy * (mat[5] - 0x10000)),
        -0x800000,
        0x7FFFFF,
    )


def find_affine_int(pts, np_, bw4, bh4, mv_x, mv_y, wm, bx4, by4) -> bool:
    """Least-squares affine fit from neighbour MVs; True on failure
    (ref: src/warpmv.rs rav1d_find_affine_int)."""
    mat = wm.matrix
    a = [[0, 0], [0, 0]]
    bx = [0, 0]
    by = [0, 0]
    rsuy = 2 * bh4 - 1
    rsux = 2 * bw4 - 1
    suy = rsuy * 8
    sux = rsux * 8
    duy = suy + mv_y
    dux = sux + mv_x
    isuy = by4 * 4 + rsuy
    isux = bx4 * 4 + rsux

    for p in pts[:np_]:
        dx = p[1][0] - dux
        dy = p[1][1] - duy
        sx = p[0][0] - sux
        sy = p[0][1] - suy
        if abs(sx - dx) < 256 and abs(sy - dy) < 256:
            a[0][0] += ((sx * sx) >> 2) + sx * 2 + 8
            a[0][1] += ((sx * sy) >> 2) + sx + sy + 4
            a[1][1] += ((sy * sy) >> 2) + sy * 2 + 8
            bx[0] += ((sx * dx) >> 2) + sx + dx + 8
            bx[1] += ((sy * dx) >> 2) + sy + dx + 4
            by[0] += ((sx * dy) >> 2) + sx + dy + 4
            by[1] += ((sy * dy) >> 2) + sy + dy + 8

    det = a[0][0] * a[1][1] - a[0][1] * a[0][1]
    if det == 0:
        return True
    shift, idet = _resolve_divisor_64(abs(det))
    idet = apply_sign(idet, det)
    shift -= 16
    if shift < 0:
        idet <<= -shift
        shift = 0

    mat[2] = _get_mult_shift_diag(a[1][1] * bx[0] - a[0][1] * bx[1], idet, shift)
    mat[3] = _get_mult_shift_ndiag(a[0][0] * bx[1] - a[0][1] * bx[0], idet, shift)
    mat[4] = _get_mult_shift_ndiag(a[1][1] * by[0] - a[0][1] * by[1], idet, shift)
    mat[5] = _get_mult_shift_diag(a[0][0] * by[1] - a[0][1] * by[0], idet, shift)
    mat[0] = iclip(
        mv_x * 0x2000 - (isux * (mat[2] - 0x10000) + isuy * mat[3]),
        -0x800000,
        0x7FFFFF,
    )
    mat[1] = iclip(
        mv_y * 0x2000 - (isux * mat[4] + isuy * (mat[5] - 0x10000)),
        -0x800000,
        0x7FFFFF,
    )
    return False

"""CDEF application driver (parity: src/cdef_apply.rs rav1d_cdef_brow).

Whole-frame formulation: neighbours read from the pre-CDEF frame copy
(equivalent to rav1d's 2-line/2x8 backups), output written in place.
"""

from __future__ import annotations

import numpy as np

from ..headers import PixelLayout
from ..ops.ref.cdef import adjust_strength, cdef_filter_block, find_dir

UV_DIRS = [
    [0, 1, 2, 3, 4, 5, 6, 7],
    [7, 0, 2, 4, 5, 6, 6, 6],  # 4:2:2
]


def apply_cdef(f):
    frame_hdr = f.frame_hdr
    cdef = frame_hdr.cdef
    if all(
        cdef.y_strength[i] == 0 and cdef.uv_strength[i] == 0
        for i in range(1 << cdef.n_bits)
    ):
        return
    layout = f.cur.layout
    ss_ver = 1 if layout == PixelLayout.I420 else 0
    ss_hor = 1 if layout != PixelLayout.I444 else 0
    bpc = f.cur.bpc
    bdm8 = bpc - 8
    damping = cdef.damping + bdm8
    uv_dir_map = UV_DIRS[1 if layout == PixelLayout.I422 else 0]

    y_src = f.cur.y.copy()
    if layout != PixelLayout.I400:
        u_src = f.cur.u.copy()
        v_src = f.cur.v.copy()

    bw, bh = f.bw, f.bh
    for by in range(0, bh, 2):
        have_top = by > 0
        have_bottom = by + 2 < bh
        for bx in range(0, bw, 2):
            have_left = bx > 0
            have_right = bx + 2 < bw
            if not f.noskip8[by >> 1, bx >> 1]:
                continue
            cdef_idx = int(f.cdef_idx[by >> 4, bx >> 4])
            if cdef_idx < 0:
                continue
            y_lvl = cdef.y_strength[cdef_idx]
            uv_lvl = cdef.uv_strength[cdef_idx]
            if y_lvl == 0 and uv_lvl == 0:
                continue
            y_pri = (y_lvl >> 2) << bdm8
            y_sec = y_lvl & 3
            y_sec += 1 if y_sec == 3 else 0
            y_sec <<= bdm8
            uv_pri = (uv_lvl >> 2) << bdm8
            uv_sec = uv_lvl & 3
            uv_sec += 1 if uv_sec == 3 else 0
            uv_sec <<= bdm8

            if y_pri or uv_pri:
                direction, variance = find_dir(
                    y_src[by * 4 : by * 4 + 8, bx * 4 : bx * 4 + 8], bpc
                )
            else:
                direction, variance = 0, 0

            if y_lvl:
                if y_pri:
                    adj = adjust_strength(y_pri, variance)
                    if adj or y_sec:
                        cdef_filter_block(
                            f.cur.y, y_src, by * 4, bx * 4, 8, 8,
                            adj, y_sec, direction, damping,
                            have_left, have_right, have_top, have_bottom, bpc,
                        )
                elif y_sec:
                    cdef_filter_block(
                        f.cur.y, y_src, by * 4, bx * 4, 8, 8,
                        0, y_sec, 0, damping,
                        have_left, have_right, have_top, have_bottom, bpc,
                    )
            if uv_lvl and layout != PixelLayout.I400:
                uvdir = uv_dir_map[direction] if uv_pri else 0
                cw = 8 >> ss_hor
                ch = 8 >> ss_ver
                cy = (by * 4) >> ss_ver
                cx = (bx * 4) >> ss_hor
                for pl, (dst, src) in enumerate(((f.cur.u, u_src), (f.cur.v, v_src))):
                    cdef_filter_block(
                        dst, src, cy, cx, cw, ch,
                        uv_pri, uv_sec, uvdir, damping - 1,
                        have_left, have_right, have_top, have_bottom, bpc,
                    )

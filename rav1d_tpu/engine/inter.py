"""Device execution of inter prediction (E2).

Collection reuses the host syntax products: every inter work item runs
through recon_b_inter's apply-phase walk with all pixel work deferred into
job lists (mc/bilin/warp/prep/compound-records/obmc-blends) — the same
lists the numpy path batches — and the engine translates them into device
descriptor groups that gather from device-resident reference planes and
scatter into the frame's device planes. Interintra blocks become wavefront
items (the intra pred + mask blend reads reconstructed neighbours), and
per-tx residuals route to the batch residual buffer (fused whole-plane
add) or the wavefront residual buffer.

Role parity: src/recon.rs recon_b_inter:3162 / mc:2025 / obmc:2205 /
warp_affine:2311 plus the compound combiners of src/mc.rs:1322-1338,
re-expressed as batched gather->filter->scatter device phases.

Dispatch discipline: every small index/parameter array of the frame packs
into ONE int32 upload (IdxBlob); groups slice it on device. Group kernels
fuse filter + scatter into a single jit with the planes donated through.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.tpu import mc as K
from ..syntax.levels import (
    INTER_INTRA_BLEND,
    INTER_INTRA_NONE,
    SMOOTH_PRED,
)
from ..tables.block_tables import BLOCK_DIMENSIONS
from ..tables.wedge import II_MASKS, WEDGE_MASKS


class IdxBlob:
    """Accumulates every small int array of a frame into one upload."""

    def __init__(self):
        self.chunks = []
        self.pos = 0

    def add(self, arr):
        a = np.ascontiguousarray(arr, dtype=np.int32)
        off = self.pos
        self.chunks.append(a.reshape(-1))
        self.pos += a.size
        return off, a.shape

    def upload(self):
        if not self.chunks:
            return jnp.zeros(1, jnp.int32)
        return jnp.asarray(np.concatenate(self.chunks))


def _slice(dev, off_shape):
    off, shape = off_shape
    n = int(np.prod(shape))
    return dev[off : off + n].reshape(shape)


def dev_plane(pic, pl):
    """Device twin of a completed picture's plane (cached; ref pictures are
    immutable once in the ref slots — src/decode.rs:5002 transactional
    update)."""
    cache = getattr(pic, "_dev_planes", None)
    if cache is None:
        cache = pic._dev_planes = {}
    if pl not in cache:
        cache[pl] = jnp.asarray((pic.y, pic.u, pic.v)[pl])
    return cache[pl]


class InterJobs:
    __slots__ = ("mc", "bilin", "warp", "warp_prep", "prep", "recs",
                 "blends", "warp_handles")

    def __init__(self):
        self.mc = []
        self.bilin = []
        self.warp = []
        self.warp_prep = []
        self.prep = []
        self.recs = []
        self.blends = []
        self.warp_handles = []


def collect_inter(t, f, plan):
    """Walk the frame's work items, planning intra/interintra blocks into
    the wavefront and translating inter pixel work into job lists. Returns
    None on an uncovered feature (caller falls back to the numpy path)."""
    from ..recon.inter import recon_b_inter
    from .plan import _plan_b_intra

    jobs = InterJobs()
    f.mc_jobs = jobs.mc
    f.bilin_jobs = jobs.bilin
    f.warp_jobs = jobs.warp
    f.warp_prep_jobs = jobs.warp_prep
    f.warp_prep_handles = jobs.warp_handles
    f.prep_jobs = jobs.prep
    f.comp_records = jobs.recs
    f.obmc_blends = jobs.blends
    f.seg_masks_n = 0
    f.seg_masks = {}
    f.engine_collect = True
    store = f.coef_store
    items = f.work_items
    n = len(items)
    ends = [items[i + 1].tx_pos if i + 1 < n else store.tx_pos
            for i in range(n)]
    wave_blocks = np.zeros(n, bool)
    try:
        for i, wi in enumerate(items):
            t.bx, t.by = wi.bx, wi.by
            if wi.kind == "intra":
                if wi.pal is not None:
                    t.pal = wi.pal
                    t.pal_idx = wi.pal_idx
                cur = [wi.tx_pos]
                _plan_b_intra(plan, t, f, wi.ts, wi.bs, wi.intra_edge_flags,
                              wi.b, wi, cur)
                wave_blocks[i] = True
            else:
                if wi.warpmv is not None:
                    t.warpmv = wi.warpmv
                t.tl_4x4_filter = wi.tl_4x4_filter
                recon_b_inter(t, f, wi.ts, wi.bs, wi.b, phase="apply",
                              item=wi, skip_residuals=True)
                if wi.b.interintra_type != INTER_INTRA_NONE:
                    _emit_ii_items(plan, t, f, wi, ends[i])
                    wave_blocks[i] = True
    finally:
        f.engine_collect = False
        f.mc_jobs = f.bilin_jobs = f.warp_jobs = None
        f.warp_prep_jobs = f.prep_jobs = f.warp_prep_handles = None
        f.comp_records = f.obmc_blends = None
    plan.inter = jobs
    starts = np.fromiter((wi.tx_pos for wi in items), np.int64, count=n)
    endsa = np.fromiter(ends, np.int64, count=n)
    wave_tx = np.zeros(store.tx_pos, bool)
    for i in np.nonzero(wave_blocks)[0]:
        wave_tx[starts[i] : endsa[i]] = True
    plan.wavefront_tx = np.nonzero(wave_tx)[0]
    plan.batch_tx = np.nonzero(~wave_tx)[0]
    return True


def _ii_mask_flat(mask, h, w):
    arr = np.asarray(mask)
    if arr.size >= h * w:
        return arr[: h * w].astype(np.int32)
    return np.broadcast_to(arr, (h, w)).ravel().astype(np.int32)


def _emit_ii_items(plan, t, f, wi, tx_end):
    """Interintra: the intra prediction + mask blend reads reconstructed
    neighbours, so it executes as wavefront items (the block's inter pred
    is already in the planes from the batch phase); residual txs become
    MODE_IDENT wave items (recon.rs recon_b_inter interintra section)."""
    from ..headers import PixelLayout
    from .plan import MODE_IDENT, _alloc_coords, _emit, plan_edges

    b = wi.b
    bs = wi.bs
    ts = wi.ts
    layout = f.cur.layout
    ss_ver = 1 if layout == PixelLayout.I420 else 0
    ss_hor = 1 if layout != PixelLayout.I444 else 0
    b_dim = BLOCK_DIMENSIONS[bs]
    bw4, bh4 = b_dim[0], b_dim[1]
    bpc = f.cur.bpc
    aw = plan.aw
    psz = plan.ah * plan.aw
    if layout == PixelLayout.I400:
        chr_layout_idx = 0
    else:
        chr_layout_idx = int(PixelLayout.I444) - int(layout)
    has_chroma = (
        layout != PixelLayout.I400
        and (bw4 > ss_hor or t.bx & 1)
        and (bh4 > ss_ver or t.by & 1)
    )
    mode = SMOOTH_PRED if b.interintra_mode == 3 else b.interintra_mode

    def emit_one(pl, x4, y4, w4, h4, cs, ce, rs, re, mask):
        w_px, h_px = 4 * w4, 4 * h4
        coords, coff = _alloc_coords(w4, h4)
        have_left = x4 > cs
        have_top = y4 > rs
        m, angle, sm_tl = plan_edges(
            coords, coff, x4, have_left, y4, have_top, ce, re, 0,
            pl * psz, aw, mode, 0, w4, h4, 0, bpc,
        )
        it = _emit(plan, f, pl, 4 * x4, 4 * y4, w_px, h_px, m, angle, -1,
                   coords, sm_tl, have_top=have_top, have_left=have_left)
        it.iioff = plan.ii_off
        flat = _ii_mask_flat(mask, h_px, w_px)
        plan.ii_masks.append(flat)
        plan.ii_off += flat.size

    if b.interintra_type == INTER_INTRA_BLEND:
        ymask = II_MASKS[bs][0][b.interintra_mode]
    else:
        ymask = WEDGE_MASKS[bs][0][0][b.wedge_idx]
    emit_one(0, t.bx, t.by, bw4, bh4, ts.col_start, ts.col_end,
             ts.row_start, ts.row_end, ymask)
    if has_chroma:
        cbw4 = (bw4 + ss_hor) >> ss_hor
        cbh4 = (bh4 + ss_ver) >> ss_ver
        if b.interintra_type == INTER_INTRA_BLEND:
            cmask = II_MASKS[bs][chr_layout_idx][b.interintra_mode]
        else:
            cmask = WEDGE_MASKS[bs][chr_layout_idx][0][b.wedge_idx]
        for pl in (1, 2):
            emit_one(pl, t.bx >> ss_hor, t.by >> ss_ver, cbw4, cbh4,
                     ts.col_start >> ss_hor, ts.col_end >> ss_hor,
                     ts.row_start >> ss_ver, ts.row_end >> ss_ver, cmask)

    # residual add as MODE_IDENT wave items (own pixels + residual, after
    # the blend; the last-writer grid orders them behind the ii items)
    store = f.coef_store
    for tx in range(wi.tx_pos, tx_end):
        if store.eob[tx] < 0:
            continue
        w_px = int(store.txw[tx])
        h_px = int(store.txh[tx])
        coords, _ = _alloc_coords(w_px >> 2, h_px >> 2)
        _emit(plan, f, int(store.txpl[tx]), int(store.txx[tx]),
              int(store.txy[tx]), w_px, h_px, MODE_IDENT, 0, tx, coords,
              False)


# ---------------------------------------------------------------------------
# device executors
# ---------------------------------------------------------------------------


def _grid_idx(flat0, h, w, aw):
    return (
        flat0[:, None, None]
        + jnp.arange(h)[None, :, None] * aw
        + jnp.arange(w)[None, None, :]
    )


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9, 10),
         donate_argnums=(0,))
def _put8_group(pf, src, d, w, h, hh, hv, vw, vh, bpc, aw):
    """d: (6, N) = [sys, sxs, mxs, mys, f2ds, flat0]."""
    out = K.mc_8tap_batch(src, d[0], d[1], w, h, hh, hv, vw, vh, bpc,
                          mxs=d[2], mys=d[3], f2ds=d[4])
    return pf.at[_grid_idx(d[5], h, w, aw)].set(out, mode="drop")


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8), donate_argnums=(0,))
def _bilin_group(pf, src, d, w, h, vw, vh, bpc, aw):
    out = K.bilin_batch(src, d[0], d[1], w, h, False, vw, vh, bpc,
                        mxs=d[2], mys=d[3])
    return pf.at[_grid_idx(d[5], h, w, aw)].set(out, mode="drop")


@partial(jax.jit, static_argnums=(3, 4, 5, 6), donate_argnums=(0,))
def _warp_put_group(pf, src, d, vw, vh, bpc, aw):
    """d: (9, N) = [sys, sxs, a, b, c, dlt, mxs, mys, flat0]."""
    abcds = jnp.stack([d[2], d[3], d[4], d[5]], axis=1)
    out = K.warp_8x8_batch(src, d[0], d[1], abcds, d[6], d[7], vw, vh, bpc)
    return pf.at[_grid_idx(d[8], 8, 8, aw)].set(out, mode="drop")


@partial(jax.jit, static_argnums=(3, 4, 5), donate_argnums=(0,))
def _warp_prep_group(poolf, src, d, vw, vh, bpc, pw):
    """d: (9, N) = [sys, sxs, a, b, c, dlt, mxs, mys, pool_flat0];
    poolf: flattened (Nh*h*w,) prep pool; pw = pool row width."""
    abcds = jnp.stack([d[2], d[3], d[4], d[5]], axis=1)
    out = K.warp_8x8t_batch(src, d[0], d[1], abcds, d[6], d[7], vw, vh, bpc)
    idx = (
        d[8][:, None, None]
        + jnp.arange(8)[None, :, None] * pw
        + jnp.arange(8)[None, None, :]
    )
    return poolf.at[idx].set(out, mode="drop")


@partial(jax.jit, static_argnums=(4, 5, 6, 7), donate_argnums=(0,))
def _avg_group(pf, pool, r0r1f, weights, w, h, bpc, aw):
    t1 = pool[r0r1f[0]]
    t2 = pool[r0r1f[1]]
    out = K.w_avg_batch(t1, t2, weights, bpc)
    return pf.at[_grid_idx(r0r1f[2], h, w, aw)].set(out, mode="drop")


@partial(jax.jit, static_argnums=(4, 5, 6, 7), donate_argnums=(0,))
def _mask_group(pf, pool, r0r1f, masks, w, h, bpc, aw):
    t1 = pool[r0r1f[0]]
    t2 = pool[r0r1f[1]]
    out = K.mask_batch(t1, t2, masks, bpc)
    return pf.at[_grid_idx(r0r1f[2], h, w, aw)].set(out, mode="drop")


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8), donate_argnums=(0,))
def _seg_y_group(pf, pool, r0r1fs, w, h, ssh, ssv, bpc, aw):
    """r0r1fs: (4, N) = [r0, r1, flat0, signs]. Returns (pf, msk)."""
    t1 = pool[r0r1fs[0]]
    t2 = pool[r0r1fs[1]]
    out, msk = K.w_mask_batch(t1, t2, r0r1fs[3], ssh, ssv, bpc)
    pf = pf.at[_grid_idx(r0r1fs[2], h, w, aw)].set(out, mode="drop")
    return pf, msk


@partial(jax.jit, static_argnums=(4, 5, 6, 7), donate_argnums=(0,))
def _seg_uv_group(pf, pool, mskstack, d, w, h, bpc, aw):
    """d: (4, N) = [r0, r1, flat0, mskrow]."""
    t1 = pool[d[0]]
    t2 = pool[d[1]]
    out = K.mask_batch(t1, t2, mskstack[d[3]], bpc)
    return pf.at[_grid_idx(d[2], h, w, aw)].set(out, mode="drop")


@partial(jax.jit, static_argnums=(4, 5, 6), donate_argnums=(0,))
def _blend_h_group(pf, laps, rows, flat0, w, h, aw):
    from ..tables.spec_data import OBMC_MASKS

    vh = (h * 3) >> 2
    m = jnp.concatenate([
        jnp.asarray(np.asarray(OBMC_MASKS), jnp.int32)[h : h + vh],
        jnp.zeros(h - vh, jnp.int32),
    ])[None, :, None]
    b = laps[rows][:, :, :w]
    b = (jnp.pad(b, ((0, 0), (0, h - b.shape[1]), (0, 0)))
         if b.shape[1] < h else b[:, :h])
    idx = _grid_idx(flat0, h, w, aw)
    a = pf[jnp.clip(idx, 0, pf.shape[0] - 1)]
    out = (a * (64 - m) + b * m + 32) >> 6
    return pf.at[idx].set(out, mode="drop")


@partial(jax.jit, static_argnums=(4, 5, 6), donate_argnums=(0,))
def _blend_v_group(pf, laps, rows, flat0, w, h, aw):
    from ..tables.spec_data import OBMC_MASKS

    vw = (w * 3) >> 2
    m = jnp.concatenate([
        jnp.asarray(np.asarray(OBMC_MASKS), jnp.int32)[w : w + vw],
        jnp.zeros(w - vw, jnp.int32),
    ])[None, None, :]
    b = laps[rows][:, :h, :]
    b = (jnp.pad(b, ((0, 0), (0, 0), (0, w - b.shape[2])))
         if b.shape[2] < w else b[:, :, :w])
    idx = _grid_idx(flat0, h, w, aw)
    a = pf[jnp.clip(idx, 0, pf.shape[0] - 1)]
    out = (a * (64 - m) + b * m + 32) >> 6
    return pf.at[idx].set(out, mode="drop")


def _pow2(n, lo=4):
    p = lo
    while p < n:
        p <<= 1
    return p


def exec_inter(f, plan, planes):
    """Run the frame's collected inter jobs on device; returns planes."""
    jobs = plan.inter
    aw = plan.aw
    psz = plan.ah * plan.aw
    bpc = f.cur.bpc
    OOB = 3 * psz
    pf = planes.reshape(-1)

    dstmap = {id(f.cur.y): 0}
    if f.cur.u is not None:
        dstmap[id(f.cur.u)] = 1
        dstmap[id(f.cur.v)] = 2
    srcdev = {}
    for i, refp in enumerate(f.refp):
        if refp is None:
            continue
        for pl, arr in enumerate((refp.y, refp.u, refp.v)):
            if arr is not None and id(arr) not in srcdev:
                srcdev[id(arr)] = (refp, pl)

    def get_src(plane):
        pic, pl = srcdev[id(plane)]
        return dev_plane(pic, pl)

    blob = IdxBlob()

    # ---- lap registry (OBMC): lap arrays become pool rows per shape ----
    lap_rows = {}   # id(lap) -> (shape, row)
    lap_counts = {}
    for kind, dst, dy, dx, lap, w, h in jobs.blends:
        shp = lap.shape
        row = lap_counts.get(shp, 0)
        lap_counts[shp] = row + 1
        lap_rows[id(lap)] = (shp, row)

    # ---- group put jobs (plane dst -> scatter; lap dst -> pool write) ----
    put_groups = {}
    lap_put = {}

    def add_put(job, bilin):
        dst, dsty, dstx, plane, dy, dx, w, h, fmx, fmy, f2d, vw, vh = job
        di = dstmap.get(id(dst))
        if di is not None:
            flat0 = di * psz + dsty * aw + dstx
            key = (bilin, id(plane), w, h, fmx != 0, fmy != 0)
            put_groups.setdefault(key, []).append(
                (plane, dy, dx, fmx, fmy, f2d, flat0, vw, vh)
            )
        else:
            shp, row = lap_rows[id(dst)]
            # lap pool writes: flat0 indexes the (Nrows, *shp) pool
            flat0 = row * shp[0] * shp[1] + dsty * shp[1] + dstx
            key = (bilin, id(plane), w, h, fmx != 0, fmy != 0, shp)
            lap_put.setdefault(key, []).append(
                (plane, dy, dx, fmx, fmy, f2d, flat0, vw, vh)
            )

    for job in jobs.mc:
        add_put(job, False)
    for job in jobs.bilin:
        add_put(job, True)

    put_descs = {}
    for key, lst in {**put_groups, **lap_put}.items():
        n = len(lst)
        npad = _pow2(n)
        d = np.zeros((6, npad), np.int32)
        d[5] = 1 << 30  # padded lanes scatter out of bounds (drop mode)
        for k, (plane, dy, dx, fmx, fmy, f2d, flat0, vw, vh) in enumerate(lst):
            d[0, k] = dy
            d[1, k] = dx
            d[2, k] = fmx
            d[3, k] = fmy
            d[4, k] = f2d
            d[5, k] = flat0
        put_descs[key] = (blob.add(d), lst[0][0], lst[0][7], lst[0][8])

    # ---- warp puts ----
    warp_groups = {}
    for dst, dsty, dstx, plane, dy, dx, abcd, mx, my, vw, vh in jobs.warp:
        di = dstmap[id(dst)]
        flat0 = di * psz + dsty * aw + dstx
        warp_groups.setdefault(id(plane), []).append(
            (plane, dy, dx, abcd, mx, my, flat0, vw, vh)
        )
    warp_descs = {}
    for key, lst in warp_groups.items():
        n = len(lst)
        npad = _pow2(n)
        d = np.zeros((9, npad), np.int32)
        d[8] = 1 << 30
        for k, (plane, dy, dx, abcd, mx, my, flat0, vw, vh) in enumerate(lst):
            d[0, k] = dy
            d[1, k] = dx
            d[2:6, k] = abcd
            d[6, k] = mx
            d[7, k] = my
            d[8, k] = flat0
        warp_descs[key] = (blob.add(d), lst[0][0], lst[0][7], lst[0][8])

    # ---- prep pools ----
    # pool layout per (w, h): [8tap groups..., warp handles..., uploads...]
    prep_groups = {}
    prep_rowmap = {}  # prep job idx -> ((w, h), local row *within group*)
    for idx, (plane, dy, dx, w, h, fmx, fmy, f2d, vw, vh) in enumerate(jobs.prep):
        key = (id(plane), w, h, fmx != 0, fmy != 0)
        g = prep_groups.setdefault(key, [])
        prep_rowmap[idx] = (key, len(g))
        g.append((plane, dy, dx, fmx, fmy, f2d, vw, vh))
    prep_descs = {}
    for key, lst in prep_groups.items():
        n = len(lst)
        npad = _pow2(n)
        d = np.zeros((5, npad), np.int32)
        for k, (plane, dy, dx, fmx, fmy, f2d, vw, vh) in enumerate(lst):
            d[0, k] = dy
            d[1, k] = dx
            d[2, k] = fmx
            d[3, k] = fmy
            d[4, k] = f2d
        prep_descs[key] = (blob.add(d), lst[0][0], lst[0][6], lst[0][7], npad)

    # warp-prep handles: pool rows per (h, w)
    wh_rows = {}     # handle idx -> ((h, w), row)
    wh_counts = {}
    for hnd in jobs.warp_handles:
        shp = (hnd.h, hnd.w)
        row = wh_counts.get(shp, 0)
        wh_counts[shp] = row + 1
        wh_rows[hnd.idx] = (shp, row)
    wprep_groups = {}
    for hidx, y, x, plane, dy, dx, abcd, mx, my, vw, vh in jobs.warp_prep:
        shp, row = wh_rows[hidx]
        flat0 = row * shp[0] * shp[1] + y * shp[1] + x
        wprep_groups.setdefault((id(plane), shp), []).append(
            (plane, dy, dx, abcd, mx, my, flat0, vw, vh)
        )
    wprep_descs = {}
    for key, lst in wprep_groups.items():
        n = len(lst)
        npad = _pow2(n)
        d = np.zeros((9, npad), np.int32)
        d[8] = (1 << 30)
        for k, (plane, dy, dx, abcd, mx, my, flat0, vw, vh) in enumerate(lst):
            d[0, k] = dy
            d[1, k] = dx
            d[2:6, k] = abcd
            d[6, k] = mx
            d[7, k] = my
            d[8, k] = flat0
        wprep_descs[key] = (blob.add(d), lst[0][0], lst[0][7], lst[0][8])

    # ---- compound records ----
    from ..recon.inter import _PrepHandle, _WarpPrepHandle

    # pool assembly plan per (w, h): prep groups in insertion order, then
    # warp pool, then uploaded host preps
    pool_plan = {}

    def pool_base(key_wh):
        return pool_plan.setdefault(
            key_wh, {"groups": [], "offsets": {}, "warp_off": None,
                     "uploads": [], "upload_rows": 0}
        )

    for key in prep_groups:
        _, w, h, _, _ = key
        pp = pool_base((w, h))
        pp["offsets"][key] = sum(prep_descs[g][4] for g in pp["groups"])
        pp["groups"].append(key)

    def src_row(s, w, h):
        pp = pool_base((w, h))
        if isinstance(s, _PrepHandle):
            key, local = prep_rowmap[s.idx]
            return pp["offsets"][key] + local
        n8 = sum(prep_descs[g][4] for g in pp["groups"])
        if isinstance(s, _WarpPrepHandle):
            shp, row = wh_rows[s.idx]
            assert shp == (h, w)
            return n8 + row
        # host-computed prep (rare: bilinear compound): uploaded
        n8w = n8 + wh_counts.get((h, w), 0)
        pp["uploads"].append(np.asarray(s, np.int32))
        pp["upload_rows"] += 1
        return n8w + pp["upload_rows"] - 1

    comb = {"avg": {}, "mask": {}, "seg_y": {}, "seg_uv": {}}
    seg_rowmap = {}
    for rec in jobs.recs:
        kind, pl, dy, dx, w, h, s0, s1, extra = rec
        flat0 = pl * psz + dy * aw + dx
        r0 = src_row(s0, w, h)
        r1 = src_row(s1, w, h)
        if kind in ("avg", "wavg"):
            wt = 8 if kind == "avg" else extra
            comb["avg"].setdefault((w, h), []).append((r0, r1, flat0, wt))
        elif kind == "mask":
            comb["mask"].setdefault((w, h), []).append(
                (r0, r1, flat0, np.asarray(extra, np.int32))
            )
        elif kind == "seg_y":
            sign, sh_, sv_, seg_id = extra
            g = comb["seg_y"].setdefault((w, h, sh_, sv_), [])
            seg_rowmap[seg_id] = ((w, h, sh_, sv_), len(g))
            g.append((r0, r1, flat0, sign))
        else:  # seg_uv
            lk, lrow = seg_rowmap[extra]
            comb["seg_uv"].setdefault((w, h, lk), []).append(
                (r0, r1, flat0, lrow)
            )

    comb_descs = {}
    for kind in ("avg", "seg_y", "seg_uv"):
        for key, lst in comb[kind].items():
            n = len(lst)
            npad = _pow2(n)
            d = np.zeros((4, npad), np.int32)
            d[2] = 1 << 30
            for k, (r0, r1, flat0, x) in enumerate(lst):
                d[0, k] = r0
                d[1, k] = r1
                d[2, k] = flat0
                d[3, k] = x
            comb_descs[(kind, key)] = blob.add(d)
    for key, lst in comb["mask"].items():
        w, h = key
        n = len(lst)
        npad = _pow2(n)
        d = np.zeros((3, npad), np.int32)
        d[2] = 1 << 30
        masks = np.zeros((npad, h, w), np.int32)
        for k, (r0, r1, flat0, m) in enumerate(lst):
            d[0, k] = r0
            d[1, k] = r1
            d[2, k] = flat0
            masks[k] = m
        comb_descs[("mask", key)] = (blob.add(d), blob.add(masks))

    # ---- obmc blends ----
    blend_groups = {}
    for kind, dst, dy, dx, lap, w, h in jobs.blends:
        di = dstmap[id(dst)]
        flat0 = di * psz + dy * aw + dx
        shp, row = lap_rows[id(lap)]
        blend_groups.setdefault((kind, shp, w, h), []).append((row, flat0))
    blend_descs = {}
    for key, lst in blend_groups.items():
        n = len(lst)
        npad = _pow2(n)
        d = np.zeros((2, npad), np.int32)
        d[1] = 1 << 30
        for k, (row, flat0) in enumerate(lst):
            d[0, k] = row
            d[1, k] = flat0
        blend_descs[key] = blob.add(d)

    # ================= device execution =================
    dev = blob.upload()

    # lap pools (written by lap_put groups)
    lap_pools = {}
    for shp, cnt in lap_counts.items():
        lap_pools[shp] = jnp.zeros((cnt * shp[0] * shp[1],), jnp.int32)

    # 1. put groups into planes
    for key, (ds, plane0, vw, vh) in put_descs.items():
        bilin = key[0]
        d = _slice(dev, ds)
        src = get_src(plane0)
        if key in put_groups:
            w, h, hh, hv = key[2], key[3], key[4], key[5]
            if bilin:
                pf = _bilin_group(pf, src, d, w, h, vw, vh, bpc, aw)
            else:
                pf = _put8_group(pf, src, d, w, h, hh, hv, vw, vh, bpc, aw)
        else:
            w, h, hh, hv, shp = key[2], key[3], key[4], key[5], key[6]
            lp = lap_pools[shp]
            if bilin:
                lp = _bilin_group(lp, src, d, w, h, vw, vh, bpc, shp[1])
            else:
                lp = _put8_group(lp, src, d, w, h, hh, hv, vw, vh, bpc, shp[1])
            lap_pools[shp] = lp

    # 2. warp puts
    for key, (ds, plane0, vw, vh) in warp_descs.items():
        pf = _warp_put_group(pf, get_src(plane0), _slice(dev, ds),
                             vw, vh, bpc, aw)

    # 3. prep pools
    pools = {}
    for key_wh, pp in pool_plan.items():
        parts = []
        for gkey in pp["groups"]:
            ds, plane0, vw, vh, npad = prep_descs[gkey]
            d = _slice(dev, ds)
            _, w, h, hh, hv = gkey
            parts.append(
                K.prep_8tap_batch(get_src(plane0), d[0], d[1], w, h, hh, hv,
                                  vw, vh, bpc, mxs=d[2], mys=d[3], f2ds=d[4])
            )
        w, h = key_wh
        nwarp = wh_counts.get((h, w), 0)
        if nwarp:
            poolf = jnp.zeros((nwarp * h * w,), jnp.int32)
            for (pid, shp), (ds, plane0, vw, vh) in wprep_descs.items():
                if shp != (h, w):
                    continue
                poolf = _warp_prep_group(poolf, get_src(plane0),
                                         _slice(dev, ds), vw, vh, bpc, w)
            parts.append(poolf.reshape(nwarp, h, w))
        if pp["uploads"]:
            parts.append(jnp.asarray(np.stack(pp["uploads"])))
        if parts:
            pools[key_wh] = (
                jnp.concatenate(parts) if len(parts) > 1 else parts[0]
            )

    # 4. compound combines: avg/wavg + wedge mask + seg luma, then seg chroma
    seg_msks = {}
    for (kind, key), ds in comb_descs.items():
        if kind == "avg":
            w, h = key
            d = _slice(dev, ds)
            pf = _avg_group(pf, pools[(w, h)], d, d[3], w, h, bpc, aw)
        elif kind == "mask":
            w, h = key
            dsd, dsm = ds
            d = _slice(dev, dsd)
            masks = _slice(dev, dsm)
            pf = _mask_group(pf, pools[(w, h)], d, masks, w, h, bpc, aw)
        elif kind == "seg_y":
            w, h, sh_, sv_ = key
            d = _slice(dev, ds)
            pf, msk = _seg_y_group(pf, pools[(w, h)], d, w, h, sh_, sv_,
                                   bpc, aw)
            seg_msks[key] = msk
    for (kind, key), ds in comb_descs.items():
        if kind != "seg_uv":
            continue
        w, h, lk = key
        d = _slice(dev, ds)
        pf = _seg_uv_group(pf, pools[(w, h)], seg_msks[lk], d, w, h, bpc, aw)

    # 5. obmc blends: top laps, then left laps (recon.rs obmc ordering)
    for kind_want, fn in (("h", _blend_h_group), ("v", _blend_v_group)):
        for (kind, shp, w, h), ds in blend_descs.items():
            if kind != kind_want:
                continue
            d = _slice(dev, ds)
            laps = lap_pools[shp].reshape(-1, shp[0], shp[1])
            pf = fn(pf, laps, d[0], d[1], w, h, aw)

    return pf.reshape(planes.shape)

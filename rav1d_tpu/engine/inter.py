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
# device planning / execution (engine v2: tiled, fixed-key — engine/tiles.py)
# ---------------------------------------------------------------------------


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


class _InterDevPlan:
    __slots__ = (
        "srcsY", "srcsC", "put_groups", "warp_groups", "prep_groups",
        "wprep_groups", "pool_rows", "host_pool", "comb_avg", "comb_mask",
        "comb_segy", "comb_seguv", "blends", "hmask", "maskpool_size",
        "lap_rows", "nlap",
    )


def _pad_desc(cols, nrows):
    """Stack per-tile descriptor columns into (nrows, bucket(n/TB)*TB): the
    padded width is length-bucketed so descriptor shapes (and the jit keys
    of their consumers) converge across frames (engine/blob.py)."""
    from .blob import bucket
    from .tiles import TB

    n = len(cols)
    npad = bucket((n + TB - 1) // TB, lo=1) * TB if n else 0
    d = np.zeros((nrows, npad), np.int32)
    if n:
        a = np.asarray(cols, np.int32).T
        d[:, :n] = a
    # padded lanes: scatter targets drop via tw/th = 0
    return d


def plan_inter_device(f, plan, blob):
    """Translate the collected job lists into tiled descriptor groups inside
    the frame blob. All geometry becomes data; see engine/tiles.py."""
    from .tiles import TB  # noqa: F401  (chunk size shared with exec)

    jobs = plan.inter
    ip = _InterDevPlan()
    ah, aw = plan.ah, plan.aw
    psz = ah * aw
    BIG = np.int32(2**31 - 1)

    # --- source stacks ---
    srcsY = []   # [(pic, pl)]
    srcsC = []
    srcrow = {}  # id(host plane) -> (kind, row)

    def src_of(plane):
        key = id(plane)
        if key not in srcrow:
            pic, pl = _src_pics[key]
            if pl == 0:
                srcrow[key] = (0, len(srcsY))
                srcsY.append((pic, pl))
            else:
                srcrow[key] = (1, len(srcsC))
                srcsC.append((pic, pl))
        return srcrow[key]

    _src_pics = {}
    for refp in f.refp:
        if refp is None:
            continue
        for pl, arr in enumerate((refp.y, refp.u, refp.v)):
            if arr is not None and id(arr) not in _src_pics:
                _src_pics[id(arr)] = (refp, pl)

    dstmap = {id(f.cur.y): 0}
    if f.cur.u is not None:
        dstmap[id(f.cur.u)] = 1
        dstmap[id(f.cur.v)] = 2

    # --- lap pool rows (OBMC lap buffers, 8x8-tiled) ---
    lap_rows = {}
    nlap = 0
    for kind, dst, dy, dx, lap, w, h in jobs.blends:
        if id(lap) not in lap_rows:
            lh, lw = lap.shape
            ntx = (lw + 7) >> 3
            nty = (lh + 7) >> 3
            lap_rows[id(lap)] = (nlap, ntx, nty, lw, lh)
            nlap += ntx * nty
    ip.lap_rows = lap_rows

    # --- put tiles (plane and lap destinations; 8-tap and bilin) ---
    put_groups = {}  # (bilin, kind, hh, hv, is_lap) -> list of tile cols

    def add_put(job, bilin):
        dst, dsty, dstx, plane, dy, dx, w, h, fmx, fmy, f2d, vw, vh = job
        kind, row = src_of(plane)
        di = dstmap.get(id(dst))
        key = (bilin, kind, fmx != 0, fmy != 0, di is None)
        g = put_groups.setdefault(key, [])
        for ty in range(0, h, 8):
            th = min(8, h - ty)
            for tx in range(0, w, 8):
                tw = min(8, w - tx)
                if di is not None:
                    flat0 = di * psz + (dsty + ty) * aw + (dstx + tx)
                else:
                    base, ntx, nty, lw, lh = lap_rows[id(dst)]
                    if dsty + ty >= lh or dstx + tx >= lw:
                        continue
                    flat0 = (base + ((dsty + ty) >> 3) * ntx
                             + ((dstx + tx) >> 3)) * 64
                g.append((row, dy + ty, dx + tx, fmx, fmy, f2d, flat0,
                          tw, th, w, h))

    for job in jobs.mc:
        add_put(job, False)
    for job in jobs.bilin:
        add_put(job, True)
    ip.put_groups = {
        k: blob.add(_pad_desc(v, 11)) for k, v in put_groups.items() if v
    }

    # --- warp put tiles ---
    warp_groups = {}
    for dst, dsty, dstx, plane, dy, dx, abcd, mx, my, vw, vh in jobs.warp:
        kind, row = src_of(plane)
        di = dstmap[id(dst)]
        flat0 = di * psz + dsty * aw + dstx
        warp_groups.setdefault(kind, []).append(
            (row, dy, dx, abcd[0], abcd[1], abcd[2], abcd[3], mx, my,
             flat0, 8, 8)
        )
    ip.warp_groups = {
        k: blob.add(_pad_desc(v, 12)) for k, v in warp_groups.items() if v
    }

    # --- compound prep pool: rows per 8x8 tile ---
    pool_rows = {}   # ('p', idx) | ('w', hidx) -> (base_row, ntx)
    npool = 0
    prep_groups = {}
    for idx, (plane, dy, dx, w, h, fmx, fmy, f2d, vw, vh) in enumerate(
            jobs.prep):
        kind, row = src_of(plane)
        ntx = (w + 7) >> 3
        nty = (h + 7) >> 3
        pool_rows[("p", idx)] = (npool, ntx)
        key = (kind, fmx != 0, fmy != 0)
        g = prep_groups.setdefault(key, [])
        for ty in range(0, h, 8):
            th = min(8, h - ty)
            for tx in range(0, w, 8):
                tw = min(8, w - tx)
                flat0 = (npool + (ty >> 3) * ntx + (tx >> 3)) * 64
                g.append((row, dy + ty, dx + tx, fmx, fmy, f2d, flat0,
                          tw, th, w, h))
        npool += ntx * nty
    ip.prep_groups = {
        k: blob.add(_pad_desc(v, 11)) for k, v in prep_groups.items() if v
    }

    wh_base = {}
    for hnd in jobs.warp_handles:
        ntx = (hnd.w + 7) >> 3
        nty = (hnd.h + 7) >> 3
        wh_base[hnd.idx] = (npool, ntx)
        pool_rows[("w", hnd.idx)] = (npool, ntx)
        npool += ntx * nty
    wprep_groups = {}
    for hidx, y, x, plane, dy, dx, abcd, mx, my, vw, vh in jobs.warp_prep:
        kind, row = src_of(plane)
        base, ntx = wh_base[hidx]
        flat0 = (base + (y >> 3) * ntx + (x >> 3)) * 64
        wprep_groups.setdefault(kind, []).append(
            (row, dy, dx, abcd[0], abcd[1], abcd[2], abcd[3], mx, my,
             flat0, 8, 8)
        )
    ip.wprep_groups = {
        k: blob.add(_pad_desc(v, 12)) for k, v in wprep_groups.items() if v
    }

    # --- host-computed preps (rare: bilinear compound) upload as pool tiles
    host_tiles = []
    host_rows = []

    def host_pool_rows(arr):
        nonlocal npool
        h, w = arr.shape
        ntx = (w + 7) >> 3
        nty = (h + 7) >> 3
        base = npool
        a = np.zeros((nty * 8, ntx * 8), np.int32)
        a[:h, :w] = arr
        for ty in range(nty):
            for tx in range(ntx):
                host_rows.append(base + ty * ntx + tx)
                host_tiles.append(a[ty * 8 : ty * 8 + 8, tx * 8 : tx * 8 + 8])
        npool += ntx * nty
        return (base, ntx)

    # --- compound combine tiles ---
    from ..recon.inter import _PrepHandle, _WarpPrepHandle

    def rows_of(s):
        if isinstance(s, _PrepHandle):
            return pool_rows[("p", s.idx)]
        if isinstance(s, _WarpPrepHandle):
            return pool_rows[("w", s.idx)]
        return host_pool_rows(np.asarray(s, np.int32))

    hmask_parts = []
    hmask_off = 0
    comb_avg = []
    comb_mask = []   # wedge etc: mask from blob maskbuf
    comb_segy = {}   # (ss_hor, ss_ver) -> cols
    comb_seguv = []  # mask from device mask pool
    seg_off = {}
    mask_off = 0     # device mask pool cursor
    for rec in jobs.recs:
        kind, pl, dy, dx, w, h, s0, s1, extra = rec
        (b0, ntx0) = rows_of(s0)
        (b1, ntx1) = rows_of(s1)
        flat00 = pl * psz + dy * aw + dx
        for ty in range(0, h, 8):
            th = min(8, h - ty)
            for tx in range(0, w, 8):
                tw = min(8, w - tx)
                r0 = b0 + (ty >> 3) * ntx0 + (tx >> 3)
                r1 = b1 + (ty >> 3) * ntx1 + (tx >> 3)
                flat0 = flat00 + ty * aw + tx
                if kind in ("avg", "wavg"):
                    wt = 8 if kind == "avg" else extra
                    comb_avg.append((r0, r1, flat0, wt, 0, 0, tw, th))
                elif kind == "mask":
                    moff = hmask_off + ty * w + tx
                    comb_mask.append((r0, r1, flat0, moff, w, 0, tw, th))
                elif kind == "seg_y":
                    sign, sh_, sv_, seg_id = extra
                    if seg_id not in seg_off:
                        seg_off[seg_id] = (mask_off, w >> sh_, sh_, sv_)
                        mask_off += (w >> sh_) * (h >> sv_)
                    mo, mw, _, _ = seg_off[seg_id]
                    p0 = mo + (ty >> sv_) * mw + (tx >> sh_)
                    comb_segy.setdefault((sh_, sv_), []).append(
                        (r0, r1, flat0, p0, mw, sign, tw, th)
                    )
                else:  # seg_uv
                    mo, mw, _, _ = seg_off[extra]
                    p0 = mo + ty * mw + tx
                    comb_seguv.append((r0, r1, flat0, p0, mw, 0, tw, th))
        if kind == "mask":
            m = np.zeros((h, w), np.uint8)
            me = np.asarray(extra)
            if me.ndim == 2:
                m[: me.shape[0], : me.shape[1]] = me[:h, :w]
            else:
                m[:, :] = np.broadcast_to(me.reshape(-1)[: h * w].reshape(h, w),
                                          (h, w))
            hmask_parts.append(m.reshape(-1))
            hmask_off += h * w

    from .blob import bucket

    # pool/lap/mask buffer row counts are traced shapes downstream: bucket
    # them so exec_inter_device's jit keys converge across frames
    ip.pool_rows = bucket(npool, lo=16) if npool else 0
    ip.host_pool = None
    if host_tiles:
        nh = len(host_tiles)
        nhp = bucket(nh, lo=4)
        rows = np.full(nhp, 1 << 20, np.int32)  # pad rows: scatter-dropped
        rows[:nh] = host_rows
        tiles = np.zeros((nhp, 8, 8), np.int16)
        tiles[:nh] = np.stack(host_tiles).astype(np.int16)
        ip.host_pool = (blob.add(rows), blob.add(tiles))
    ip.comb_avg = blob.add(_pad_desc(comb_avg, 8)) if comb_avg else None
    ip.comb_mask = blob.add(_pad_desc(comb_mask, 8)) if comb_mask else None
    ip.comb_segy = {
        k: blob.add(_pad_desc(v, 8)) for k, v in comb_segy.items()
    }
    ip.comb_seguv = blob.add(_pad_desc(comb_seguv, 8)) if comb_seguv else None
    ip.maskpool_size = bucket(max(mask_off, 1), lo=64)

    # --- OBMC blend tiles (mask vectors expanded per (dir, len), deduped)
    from ..tables.spec_data import OBMC_MASKS

    omask_off = {}
    blends_h = []
    blends_v = []
    for kind, dst, dy, dx, lap, w, h in jobs.blends:
        di = dstmap[id(dst)]
        base, ntx, nty, lw, lh = lap_rows[id(lap)]
        n = h if kind == "h" else w
        mk = (kind, n)
        if mk not in omask_off:
            vn = (n * 3) >> 2
            vec = np.zeros(n, np.uint8)
            vec[:vn] = np.asarray(OBMC_MASKS[n : n + vn], np.uint8)
            omask_off[mk] = hmask_off
            hmask_parts.append(vec)
            hmask_off += n
        mo = omask_off[mk]
        out = blends_h if kind == "h" else blends_v
        for ty in range(0, h, 8):
            th = min(8, h - ty)
            for tx in range(0, w, 8):
                tw = min(8, w - tx)
                flat0 = di * psz + (dy + ty) * aw + (dx + tx)
                if ty < lh and tx < lw:
                    row = base + (ty >> 3) * ntx + (tx >> 3)
                else:
                    row = base  # mask is zero there; any valid row works
                if kind == "h":
                    moff, mrs, mcs = mo + ty, 1, 0
                else:
                    moff, mrs, mcs = mo + tx, 0, 1
                out.append((row, flat0, moff, mrs, mcs, tw, th))
    ip.blends = (
        blob.add(_pad_desc(blends_h, 7)) if blends_h else None,
        blob.add(_pad_desc(blends_v, 7)) if blends_v else None,
    )
    ip.hmask = (
        blob.add(_bucket_pad(np.concatenate(hmask_parts)))
        if hmask_parts else None
    )
    ip.srcsY = srcsY
    ip.srcsC = srcsC
    ip.nlap = bucket(nlap, lo=16) if nlap else 0
    return ip


def _bucket_pad(a, lo=64):
    """Pad a 1-D array to a bucketed length (zeros) for shape convergence."""
    from .blob import bucket

    out = np.zeros(bucket(a.size, lo=lo), a.dtype)
    out[: a.size] = a
    return out


def _stack(srcs, pad_to):
    rows = [dev_plane(pic, pl) for pic, pl in srcs]
    if not rows:
        return None
    while len(rows) < pad_to:
        rows.append(rows[0])
    return jnp.stack(rows[:pad_to])


def exec_inter_device(f, ip, dev, planes):
    """Run the planned tile groups (see plan_inter_device); returns planes."""
    from .blob import view
    from .tiles import (
        TB, bilin_tiles, blend_tiles, mask_tiles, prep_tiles, put_tiles,
        segy_tiles, warp_prep_tiles, warp_tiles, wavg_tiles,
    )
    from ..headers import PixelLayout

    bpc = f.cur.bpc
    layout = f.cur.layout
    ss_ver = 1 if layout == PixelLayout.I420 else 0
    ss_hor = 1 if layout != PixelLayout.I444 else 0
    ah, aw = planes.shape[1], planes.shape[2]
    vwY, vhY = f.cur.w, f.cur.h
    vwC, vhC = (f.cur.w + ss_hor) >> ss_hor, (f.cur.h + ss_ver) >> ss_ver

    stackY = _stack(ip.srcsY, 8)
    stackC = _stack(ip.srcsC, 16)

    def kindargs(kind):
        return (stackY, vwY, vhY) if kind == 0 else (stackC, vwC, vhC)

    pf = planes.reshape(-1)
    lappool = (
        jnp.zeros((ip.nlap, 8, 8), jnp.int32) if ip.nlap else None
    )

    def chunked(fn, state, handle, *args):
        d = view(dev, handle)
        n = d.shape[1]
        for i in range(0, n, TB):
            state = fn(state, *args, d[:, i : i + TB])
        return state

    # 1. puts (plane + lap destinations)
    for (bilin, kind, hh, hv, is_lap), handle in ip.put_groups.items():
        stack, vw, vh = kindargs(kind)
        d = view(dev, handle)
        n = d.shape[1]
        for i in range(0, n, TB):
            dd = d[:, i : i + TB]
            if is_lap:
                if bilin:
                    lappool = bilin_tiles(
                        lappool.reshape(-1), stack, dd, False, vw, vh, bpc, 8
                    ).reshape(-1, 8, 8)
                else:
                    lappool = put_tiles(
                        lappool.reshape(-1), stack, dd, hh, hv, vw, vh, bpc, 8
                    ).reshape(-1, 8, 8)
            else:
                if bilin:
                    pf = bilin_tiles(pf, stack, dd, False, vw, vh, bpc, aw)
                else:
                    pf = put_tiles(pf, stack, dd, hh, hv, vw, vh, bpc, aw)

    # 2. warp puts
    for kind, handle in ip.warp_groups.items():
        stack, vw, vh = kindargs(kind)
        d = view(dev, handle)
        for i in range(0, d.shape[1], TB):
            pf = warp_tiles(pf, stack, d[:, i : i + TB], vw, vh, bpc, aw)

    # 3. prep pool
    pool = None
    if ip.pool_rows:
        poolf = jnp.zeros(ip.pool_rows * 64, jnp.int32)
        for (kind, hh, hv), handle in ip.prep_groups.items():
            stack, vw, vh = kindargs(kind)
            d = view(dev, handle)
            for i in range(0, d.shape[1], TB):
                poolf = prep_tiles(poolf, stack, d[:, i : i + TB], hh, hv,
                                   vw, vh, bpc, 8)
        for kind, handle in ip.wprep_groups.items():
            stack, vw, vh = kindargs(kind)
            d = view(dev, handle)
            for i in range(0, d.shape[1], TB):
                poolf = warp_prep_tiles(poolf, stack, d[:, i : i + TB],
                                        vw, vh, bpc, 8)
        pool = poolf.reshape(-1, 8, 8)
        if ip.host_pool is not None:
            hrows = view(dev, ip.host_pool[0])
            htiles = view(dev, ip.host_pool[1]).astype(jnp.int32)
            pool = pool.at[hrows].set(htiles)

    # 4. compound combines
    hmaskbuf = (
        view(dev, ip.hmask).astype(jnp.int32)
        if ip.hmask is not None
        else jnp.zeros(1, jnp.int32)
    )
    if ip.comb_avg is not None:
        d = view(dev, ip.comb_avg)
        for i in range(0, d.shape[1], TB):
            pf = wavg_tiles(pf, pool, d[:, i : i + TB], bpc, aw)
    maskpool = None
    if ip.comb_segy:
        maskpool = jnp.zeros(ip.maskpool_size, jnp.int32)
        for (sh_, sv_), handle in ip.comb_segy.items():
            d = view(dev, handle)
            for i in range(0, d.shape[1], TB):
                pf, maskpool = segy_tiles(pf, maskpool, pool,
                                          d[:, i : i + TB], sh_, sv_, bpc, aw)
    if ip.comb_mask is not None:
        d = view(dev, ip.comb_mask)
        for i in range(0, d.shape[1], TB):
            pf = mask_tiles(pf, pool, hmaskbuf, d[:, i : i + TB], bpc, aw)
    if ip.comb_seguv is not None:
        d = view(dev, ip.comb_seguv)
        for i in range(0, d.shape[1], TB):
            pf = mask_tiles(pf, pool, maskpool, d[:, i : i + TB], bpc, aw)

    # 5. OBMC blends: top laps, then left laps (recon.rs obmc ordering)
    for handle in ip.blends:
        if handle is None:
            continue
        d = view(dev, handle)
        for i in range(0, d.shape[1], TB):
            pf = blend_tiles(pf, lappool, hmaskbuf, aw, d[:, i : i + TB])

    return pf.reshape(planes.shape)

"""Multi-chip dense-plane execution: the frame's inverse-transform batch
sharded over a device mesh.

This is the decoder's multi-chip strategy made concrete on REAL frame
data (not synthetic tensors): the coefficient chunks that the engine's
single-device path feeds to resid_scatter_any (engine/kernels.py) are
split across the mesh's devices; every device inverse-transforms its
share of the blocks and scatters them into a local zero residual plane,
and one `psum` over the mesh combines the disjoint writes into the exact
residual plane the single-device path produces.

Role parity: rav1d distributes per-superblock recon tasks over worker
threads (src/thread_task.rs:714); here the same work-items distribute
over chips, with the ICI collective replacing shared memory. Bit-exact:
sharded output == engine single-device output for the itx classes it
covers (group_residuals excludes lossless WHT blocks, which route through
the dedicated WHT kernel on the single-device path; frames containing WHT
blocks are outside this oracle).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.kernels import TXTP_FIRST, TXTP_SECOND, chunk_for, itx_any_core
from ..syntax.levels import WHT_WHT


def group_residuals(store, psz, aw, n_shards):
    """Chunk a frame's coefficient store into per-(w, h) descriptor stacks,
    padded so every shard gets the same number of chunks.

    Returns [(w, h, offs (K, B), flat0 (K, B), fs (K, 2, B))] with
    K % n_shards == 0; padded lanes/chunks carry flat0 = 3*psz and drop at
    scatter time (same convention as engine/kernels.py plan_residuals)."""
    sel = np.arange(store.tx_pos)
    sel = sel[store.eob[sel] >= 0]
    if not sel.size:
        return []
    tps = store.txtp[sel].astype(np.int64)
    sel = sel[tps != WHT_WHT]  # WHT rides the engine's dedicated kernel
    tps = store.txtp[sel].astype(np.int64)
    ws = store.txw[sel].astype(np.int64)
    hs = store.txh[sel].astype(np.int64)
    flat0_all = (
        store.txpl[sel].astype(np.int64) * psz
        + store.txy[sel].astype(np.int64) * aw
        + store.txx[sel]
    ).astype(np.int32)
    key = ws * 2048 + hs
    groups = []
    oob = np.int32(3 * psz)
    for k in np.unique(key):
        gsel = key == k
        w = int(k) // 2048
        h = int(k) % 2048
        B = chunk_for(w, h)
        offs = store.cf_off[sel[gsel]].astype(np.int32)
        flat0 = flat0_all[gsel]
        fsv = TXTP_FIRST[tps[gsel]]
        ssv = TXTP_SECOND[tps[gsel]]
        n = offs.size
        K = -(-n // B)  # chunks
        K = -(-K // n_shards) * n_shards  # pad to shard multiple
        o = np.zeros((K, B), np.int32)
        f0 = np.full((K, B), oob, np.int32)
        fs = np.zeros((K, 2, B), np.int32)
        flat_o = o.reshape(-1)
        flat_f = f0.reshape(-1)
        flat_o[:n] = offs
        flat_f[:n] = flat0
        for i in range(0, n, B):
            m = min(B, n - i)
            ci = i // B
            fs[ci, 0, :m] = fsv[i : i + m]
            fs[ci, 1, :m] = ssv[i : i + m]
        groups.append((w, h, o, f0, fs))
    return groups


def sharded_residual_plane(mesh, axis, cfbuf, groups, psz, aw, bpc):
    """Compute the frame residual plane with the chunk batch sharded over
    `axis` of `mesh`. Returns a replicated (3*psz,) int32 plane equal to
    the single-device engine result."""
    residf = jnp.zeros(3 * psz, jnp.int32)

    for w, h, offs, flat0, fs in groups:
        sh, sw = min(h, 32), min(w, 32)

        def body(cf, o, f0, fsv, w=w, h=h, sh=sh, sw=sw):
            r = jnp.zeros(3 * psz, jnp.int32)
            for k in range(o.shape[0]):  # local chunks: static count
                cfs = cf[o[k][:, None] + jnp.arange(sh * sw)[None, :]]
                cb = cfs.astype(jnp.int32).reshape(-1, sw, sh)
                cb = cb.transpose(0, 2, 1)
                res = itx_any_core(cb, fsv[k, 0], fsv[k, 1], w, h, bpc)
                idx = (
                    f0[k][:, None, None]
                    + jnp.arange(h)[None, :, None] * aw
                    + jnp.arange(w)[None, None, :]
                )
                r = r.at[idx].set(res, mode="drop")
            return jax.lax.psum(r, axis)

        fn = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=P(),
        )
        # disjoint tx blocks: per-group planes add without overlap
        residf = residf + jax.jit(fn)(cfbuf, offs, flat0, fs)
    return residf


def single_device_residual_plane(cfbuf, groups, psz, aw, bpc):
    """Oracle: same math, no mesh (mirrors engine run_residuals)."""
    residf = jnp.zeros(3 * psz, jnp.int32)
    for w, h, offs, flat0, fs in groups:
        sh, sw = min(h, 32), min(w, 32)
        K = offs.shape[0]
        for k in range(K):
            cfs = cfbuf[offs[k][:, None] + jnp.arange(sh * sw)[None, :]]
            cb = cfs.astype(jnp.int32).reshape(-1, sw, sh).transpose(0, 2, 1)
            res = itx_any_core(cb, jnp.asarray(fs[k, 0]), jnp.asarray(fs[k, 1]),
                               w, h, bpc)
            idx = (
                jnp.asarray(flat0[k])[:, None, None]
                + jnp.arange(h)[None, :, None] * aw
                + jnp.arange(w)[None, None, :]
            )
            residf = residf.at[idx].set(res, mode="drop")
    return residf


def capture_frame(vec, frame_idx=0):
    """Decode a real stream (numpy path, synchronous) and capture the
    FrameContext of frame `frame_idx` after its syntax pass — real
    coefficients, real geometry — for multi-chip execution."""
    import os

    from ..decoder import Decoder, EAgain, Settings
    from ..io.ivf import IvfDemuxer
    from ..recon import frame as _frame

    captured = []
    orig = _frame.decode_frame_dense

    def hook(f):
        if len(captured) <= frame_idx:
            captured.append(f)
        return orig(f)

    prev_env = os.environ.get("RAV1D_ENGINE")
    os.environ["RAV1D_ENGINE"] = "np"
    _frame.decode_frame_dense = hook
    try:
        dec = Decoder(Settings(apply_grain=False))
        for pkt in IvfDemuxer(vec):
            dec.send_data(pkt.data, pkt.timestamp)
            while True:
                try:
                    dec.get_picture()
                except EAgain:
                    break
            if len(captured) > frame_idx:
                break
    finally:
        _frame.decode_frame_dense = orig
        if prev_env is None:
            os.environ.pop("RAV1D_ENGINE", None)
        else:
            os.environ["RAV1D_ENGINE"] = prev_env
    return captured[frame_idx]

"""Sharded dense-plane execution: tiles → chips with ICI halo exchange.

rav1d's boundary handling between concurrently-decoded tiles is shared
memory plus 2-line backups (src/cdef_apply.rs backup2lines). On a TPU mesh
the analog is: each chip owns a tile column of the frame; post-filters that
read across the tile edge (deblock, CDEF, LR: ≤8-px support) receive the
neighbour's border columns over ICI via `lax.ppermute` before filtering
locally. The work-item batch axes (itx residual blocks, CDEF units) are
data-parallel over the whole mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental.shard_map import shard_map
from jax.sharding import PartitionSpec as P

from ..ops.tpu.cdef import cdef_filter_batch
from ..ops.tpu.itx import itx_add_batch

HALO = 8  # border columns exchanged between neighbouring tile shards


def make_sharded_dense_step(mesh, bpc=8):
    """Build the jitted multi-chip dense step.

    Inputs (sharded):
      plane      (H, W) int32, W sharded over the ``tile`` axis — the frame
                 split into tile columns, one per chip group.
      pred,coeff (N, 8, 8) int32, N sharded over (tile, blk) — the itx
                 residual work-item batch (data-parallel).
      pri,sec,dirs,damp (M,) per-CDEF-unit params for the per-shard units.

    The step: (1) batched inverse transform + add on the block batch;
    (2) halo exchange of tile-column borders over ICI; (3) batched CDEF of
    every 8x8 unit in each tile column, using the halo for cross-tile taps.
    """
    tile_ax = "tile"

    def _local_cdef(plane_col, left_halo, right_halo, pri, sec, dirs, damp):
        """CDEF all 8x8 units of one tile column, halos appended."""
        H, Wl = plane_col.shape
        ext = jnp.concatenate([left_halo, plane_col, right_halo], axis=1)
        # 8x8 unit grid with 2-px ring windows out of the extended column
        ny, nx = H // 8, Wl // 8
        base_y = (jnp.arange(ny) * 8)[:, None]
        base_x = (jnp.arange(nx) * 8)[None, :] + HALO
        oy = jnp.arange(12)[None, None, :, None]
        ox = jnp.arange(12)[None, None, None, :]
        rows = base_y[:, :, None, None] - 2 + oy
        cols = base_x[:, :, None, None] - 2 + ox
        rows = jnp.clip(rows, 0, H - 1)
        cols = jnp.clip(cols, 0, ext.shape[1] - 1)
        wins = ext[rows, cols].reshape(ny * nx, 12, 12)
        out = cdef_filter_batch(wins, pri, sec, dirs, damp, bpc)
        return out.reshape(ny, nx, 8, 8).transpose(0, 2, 1, 3).reshape(H, Wl)

    def step(plane, pred, coeff, pri, sec, dirs, damp):
        # (1) residuals: data-parallel batched itx over the whole mesh
        recon = itx_add_batch(pred, coeff, 8, 8, 0, bpc)

        # (2+3) tile-column CDEF with ICI halo exchange
        def col_fn(plane_col, pri_l, sec_l, dirs_l, damp_l):
            plane_col = plane_col[0]
            idx = lax.axis_index(tile_ax)
            n = lax.psum(1, tile_ax)
            right_edge = plane_col[:, -HALO:]
            left_edge = plane_col[:, :HALO]
            # neighbour borders ride ICI (ring permute; frame edges clamp)
            from_left = lax.ppermute(
                right_edge, tile_ax, [(i, (i + 1) % n) for i in range(n)]
            )
            from_right = lax.ppermute(
                left_edge, tile_ax, [((i + 1) % n, i) for i in range(n)]
            )
            from_left = jnp.where(idx == 0, plane_col[:, :1], from_left)
            from_right = jnp.where(idx == n - 1, plane_col[:, -1:], from_right)
            out = _local_cdef(plane_col, from_left, from_right,
                              pri_l, sec_l, dirs_l, damp_l)
            return out[None]

        filtered = shard_map(
            col_fn,
            mesh=mesh,
            in_specs=(
                P(None, None, tile_ax),
                P(tile_ax), P(tile_ax), P(tile_ax), P(tile_ax),
            ),
            out_specs=P(None, None, tile_ax),
        )(plane[None], pri, sec, dirs, damp)[0]

        return recon, filtered

    return jax.jit(step)

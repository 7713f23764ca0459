"""Device-mesh policies for multi-chip decode.

Maps rav1d's parallelism axes (SURVEY.md §2.4; src/thread_task.rs worker
model) onto a `jax.sharding.Mesh`:

- ``tile`` axis — tile columns sharded across chips (rav1d: per-tile entropy
  state, src/internal.rs:824; boundary post-filter columns exchanged over
  ICI instead of shared memory).
- ``blk`` axis — the dense-plane work-item batch sharded data-parallel
  (rav1d: per-superblock tasks across worker threads).

Frame-level pipelining across hosts (rav1d's n_fc frame contexts ring,
src/lib.rs:160) stays host-side: one frame per host process, progress
watermarks over DCN (see decoder.py output-queue semantics).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tile_mesh(n_devices: int | None = None, tile: int | None = None):
    """Build a (tile, blk) mesh over the first n devices.

    ``tile`` defaults to the largest power-of-two ≤ min(n, 4) (AV1 streams
    rarely have more than 4-8 tile columns); the rest goes to ``blk``.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    if tile is None:
        tile = 1
        while tile * 2 <= min(n, 4) and n % (tile * 2) == 0:
            tile *= 2
    blk = n // tile
    arr = np.array(devs[: tile * blk]).reshape(tile, blk)
    return Mesh(arr, ("tile", "blk"))


def block_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard a work-item batch across every mesh device (leading axis)."""
    return NamedSharding(mesh, P(("tile", "blk"), *([None] * (ndim - 1))))


def column_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard a plane's width across the tile axis (tile-column split)."""
    return NamedSharding(mesh, P(*([None] * (ndim - 1)), "tile"))

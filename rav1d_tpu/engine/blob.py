"""Single-upload frame blob with a persistent, convergent slot layout.

Every host-produced array a frame's dense pass needs — coefficient buffer,
tile descriptors, wave descriptors, filter masks, palette pixels — packs
into ONE int32 word buffer uploaded with ONE device_put. The tunnel charges
~30-40 ms of fixed cost per transfer regardless of size, so N uploads lose
to one packed upload at any N > 1.

Key-space convergence (the round-2 lesson): everything about the blob that
enters an XLA compile key must stabilise across frames, or the engine
recompiles forever. Two mechanisms:

- Slot layout is PERSISTENT (process-wide): the Nth array of a given
  (dtype, shape) in a frame always lands at the same word offset, so the
  eager `view()` slices (dynamic_slice/bitcast/reshape) hit the same
  compiled key every frame. New (dtype, shape, occurrence) combinations
  extend the layout; it converges to the union of shapes the stream uses.
- The uploaded length is bucketed (pow2 / 1.25 / 1.5 / 1.75 steps), so the
  handful of layout-growth events early in a stream produce a handful of
  device buffer lengths, then stop.

Variable-length arrays must be length-bucketed by callers (see `bucket`)
before `add` so their (dtype, shape) key converges too. Slots not written
in a frame hold zeros and are never read (execution is driven by this
frame's op lists only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def bucket(n, lo=16):
    """Smallest {1, 1.25, 1.5, 1.75}*pow2 >= n: bounds the distinct padded
    lengths per site to O(log n) while wasting <= 25% space."""
    if n <= lo:
        return lo
    b = lo
    while True:
        for num in (4, 5, 6, 7):
            c = (b * num) // 4
            if n <= c:
                return c
        b <<= 1


class Blob:
    # process-wide persistent layout: (dtype.str, shape, occurrence) slots
    _layout: dict = {}
    _total = 0

    __slots__ = ("fills", "seen")

    def __init__(self):
        self.fills = []
        self.seen = {}

    def add(self, arr):
        """Pack arr (1/2/4-byte ndarray) into its stable slot; returns an
        opaque handle for device-side slicing."""
        a = np.ascontiguousarray(arr)
        assert a.dtype.itemsize in (1, 2, 4), a.dtype
        flat = a.reshape(-1)
        nbytes = flat.size * a.dtype.itemsize
        pad = (-nbytes) % 4
        raw = flat.view(np.uint8)
        if pad:
            raw = np.concatenate([raw, np.zeros(pad, np.uint8)])
        words = raw.view(np.int32)

        key = (a.dtype.str, a.shape)
        occ = self.seen.get(key, 0)
        self.seen[key] = occ + 1
        slots = Blob._layout.setdefault(key, [])
        if occ >= len(slots):
            slots.append(Blob._total)
            Blob._total += words.size
        off = slots[occ]
        self.fills.append((off, words))
        return (off, words.size, a.dtype, a.shape)

    def upload(self):
        cap = bucket(max(Blob._total, 1), lo=256)
        buf = np.zeros(cap, np.int32)
        for off, w in self.fills:
            buf[off : off + w.size] = w
        return jnp.asarray(buf)


def view(dev, handle):
    """Slice a packed array back out of the uploaded word buffer (device).
    Offsets/shapes are layout-stable, so the eager ops here compile once."""
    off, nwords, dtype, shape = handle
    w = jax.lax.dynamic_slice(dev, (off,), (nwords,))
    jd = jnp.dtype(dtype)
    if jd.itemsize == 4:
        out = w if jd == jnp.int32 else jax.lax.bitcast_convert_type(w, jd)
    else:
        out = jax.lax.bitcast_convert_type(w, jd).reshape(-1)
        n = int(np.prod(shape)) if shape else 1
        out = out[:n]
    return out.reshape(shape)

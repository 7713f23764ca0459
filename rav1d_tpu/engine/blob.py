"""Single-upload frame blob.

Every host-produced array a frame's dense pass needs — coefficient buffer,
tile descriptors, wave descriptors, filter masks, palette pixels — packs
into ONE int32 word buffer uploaded with ONE device_put. The tunnel charges
~30-40 ms of fixed cost per transfer regardless of size, so N uploads lose
to one packed upload at any N > 1. Sub-word dtypes (int16/uint8) are
view-cast into words on the host and bitcast back on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class Blob:
    __slots__ = ("chunks", "words")

    def __init__(self):
        self.chunks = []
        self.words = 0

    def add(self, arr):
        """Pack arr (int32/uint32/int16/uint16/int8/uint8 ndarray); returns
        an opaque handle for device-side slicing."""
        a = np.ascontiguousarray(arr)
        assert a.dtype.itemsize in (1, 2, 4), a.dtype
        flat = a.reshape(-1)
        nbytes = flat.size * a.dtype.itemsize
        pad = (-nbytes) % 4
        raw = flat.view(np.uint8)
        if pad:
            raw = np.concatenate([raw, np.zeros(pad, np.uint8)])
        words = raw.view(np.int32)
        off = self.words
        self.chunks.append(words)
        self.words += words.size
        return (off, words.size, a.dtype, a.shape)

    def upload(self):
        if not self.chunks:
            return jnp.zeros(1, jnp.int32)
        return jnp.asarray(np.concatenate(self.chunks))


def view(dev, handle):
    """Slice a packed array back out of the uploaded word buffer (device)."""
    off, nwords, dtype, shape = handle
    w = dev[off : off + nwords]
    jd = jnp.dtype(dtype)
    if jd.itemsize == 4:
        out = w if jd == jnp.int32 else jax.lax.bitcast_convert_type(w, jd)
    else:
        out = jax.lax.bitcast_convert_type(w, jd).reshape(-1)
        n = int(np.prod(shape)) if shape else 1
        out = out[:n]
    return out.reshape(shape)

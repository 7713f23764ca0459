"""Loop restoration on TPU (jax.numpy, jit-compiled).

Batched 7-tap separable Wiener over N padded stripes at once (per-stripe
filter taps — each LR unit carries its own coefficients). Parity:
src/looprestoration.rs wiener_rust, validated against ops/ref/lr.py in
tests/test_tpu_lr.py. (Self-guided restoration runs via the numpy
reference; its boxsum dataflow batches the same way and is next in line.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(3, 4, 5))
def wiener_batch(tmps, fhs, fvs, w, h, bpc):
    """tmps: (N, h+6, w+6) int32 padded stripes; fhs/fvs: (N, 3) taps.
    Returns (N, h, w) int32 restored pixels."""
    f3h = -(fhs[:, 0] + fhs[:, 1] + fhs[:, 2]) * 2 + (0 if bpc == 8 else 128)
    f3v = 128 - (fvs[:, 0] + fvs[:, 1] + fvs[:, 2]) * 2
    fh = [fhs[:, 0], fhs[:, 1], fhs[:, 2], f3h, fhs[:, 2], fhs[:, 1], fhs[:, 0]]
    fv = [fvs[:, 0], fvs[:, 1], fvs[:, 2], f3v, fvs[:, 2], fvs[:, 1], fvs[:, 0]]

    round_bits_h = 3 + (2 if bpc == 12 else 0)
    rounding_off_h = 1 << (round_bits_h - 1)
    clip_limit = 1 << (bpc + 1 + 7 - round_bits_h)
    t = tmps.astype(jnp.int32)
    acc = jnp.full(t.shape[:1] + (h + 6, w), 1 << (bpc + 6), jnp.int32)
    if bpc == 8:
        acc = acc + t[:, :, 3 : 3 + w] * 128
    for k in range(7):
        acc = acc + t[:, :, k : k + w] * fh[k][:, None, None]
    hor = jnp.clip((acc + rounding_off_h) >> round_bits_h, 0, clip_limit - 1)

    round_bits_v = 11 - (2 if bpc == 12 else 0)
    rounding_off_v = 1 << (round_bits_v - 1)
    round_offset = 1 << (bpc + round_bits_v - 1)
    acc = jnp.full(t.shape[:1] + (h, w), -round_offset, jnp.int32)
    for k in range(7):
        acc = acc + hor[:, k : k + h, :] * fv[k][:, None, None]
    return jnp.clip((acc + rounding_off_v) >> round_bits_v, 0, (1 << bpc) - 1)

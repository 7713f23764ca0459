"""Pallas 8x8 inverse-DCT parity vs the jnp engine twin (bit-exact).

On the CPU test mesh the kernel runs in interpreter mode; on the real
chip tools_py/pallas_ab.py measured it 700x faster than the jnp twin at
batch 16384 (0.046 ms vs 33 ms, bit_exact=true)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rav1d_tpu.ops.pallas.itx8 import (
    idct8x8_batch_jnp, idct8x8_batch_pallas,
)


@pytest.mark.parametrize("bpc", [8, 10, 12])
def test_idct8x8_parity(bpc):
    rng = np.random.default_rng(42 + bpc)
    hi = 1 << (bpc + 3)
    cb = jnp.asarray(rng.integers(-hi, hi, (256, 8, 8)), jnp.int32)
    a = np.asarray(idct8x8_batch_pallas(cb, bpc))
    b = np.asarray(idct8x8_batch_jnp(cb, bpc))
    np.testing.assert_array_equal(a, b)


def test_idct8x8_vs_ref_oracle():
    """Also pin against the scalar reference path (ops.ref.itx) so both
    device twins can't drift together."""
    from rav1d_tpu.ops.ref.itx import DCT_DCT, compute_residual_batch

    rng = np.random.default_rng(7)
    cb = rng.integers(-2048, 2048, (128, 8, 8)).astype(np.int64)
    res = np.asarray(idct8x8_batch_pallas(jnp.asarray(cb, jnp.int32), 8))
    # store layout "rc": coeff[y + x*sh] -> pass coefficients transposed
    cf = cb.transpose(0, 2, 1).reshape(128, 64)
    eobs = np.full(128, 63, np.int64)  # full blocks: no dc-only shortcut
    exp = compute_residual_batch(cf, eobs, 8, 8, DCT_DCT, 8)
    np.testing.assert_array_equal(res, exp)

"""Pallas itx families vs the engine's XLA itx core (checkasm analog).

Random coefficient batches with random per-block variant codes through
ops/pallas/itx_all (interpreter on CPU) must match engine/kernels
itx_any_core bit-for-bit — the same oracle chain that anchors the XLA
path to ops/ref/itx (src/itx_1d.rs butterflies)."""

import numpy as np
import pytest

from rav1d_tpu.engine.kernels import itx_any_core
from rav1d_tpu.ops.pallas.itx_all import PALLAS_SIZES, itx_pallas_core

def _cases():
    import jax

    if jax.default_backend() == "tpu":
        return sorted(PALLAS_SIZES)
    # CPU runs through the Pallas interpreter, which costs minutes for the
    # 16-point cases — cover the small classes here; the full set runs on
    # TPU via tools_py/pallas_ab.py (committed A/B artifact)
    return [(4, 4), (8, 4), (4, 8), (8, 8)]


CASES = _cases()


@pytest.mark.parametrize("wh", CASES, ids=[f"{w}x{h}" for w, h in CASES])
@pytest.mark.parametrize("bpc", [8, 10])
def test_pallas_matches_xla(wh, bpc):
    w, h = wh
    rng = np.random.default_rng(w * 1000 + h * 10 + bpc)
    n = 160  # not a LANES multiple: exercises the pad path
    cmax = (1 << (bpc + 7)) - 1
    cb = rng.integers(-cmax, cmax, size=(n, h, w), dtype=np.int32)
    nv_w = 4 if w <= 16 else 2
    nv_h = 4 if h <= 16 else 2
    f = rng.integers(0, nv_w, size=n).astype(np.int32)
    s = rng.integers(0, nv_h, size=n).astype(np.int32)
    ref = np.asarray(itx_any_core(cb, f, s, w, h, bpc))
    got = np.asarray(itx_pallas_core(cb, f, s, w, h, bpc))
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)

"""checkasm-style parity: TPU (jax) Wiener restoration vs numpy reference."""

import numpy as np
import pytest

from rav1d_tpu.ops.ref.lr import wiener as ref_wiener


@pytest.mark.parametrize("bpc", [8, 10, 12])
@pytest.mark.parametrize("w,h", [(256, 64), (64, 33), (96, 16)])
def test_wiener_batch_parity(bpc, w, h):
    from rav1d_tpu.ops.tpu.lr import wiener_batch

    rng = np.random.default_rng(w + h + bpc)
    N = 5
    mx = (1 << bpc) - 1
    tmps = rng.integers(0, mx, (N, h + 6, w + 6)).astype(np.int32)
    fhs = rng.integers(-16, 16, (N, 3)).astype(np.int32)
    fvs = rng.integers(-16, 16, (N, 3)).astype(np.int32)

    want = np.zeros((N, h, w), dtype=np.int32)
    for i in range(N):
        dst = np.zeros((h, w), dtype=np.int32)
        ref_wiener(dst, 0, 0, tmps[i], w, h, list(fhs[i]), list(fvs[i]), bpc)
        want[i] = dst
    got = np.asarray(wiener_batch(tmps, fhs, fvs, w, h, bpc))
    np.testing.assert_array_equal(got, want)

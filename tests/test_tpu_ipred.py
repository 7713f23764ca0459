"""checkasm-style parity: TPU (jax) intra prediction vs numpy reference."""

import numpy as np
import pytest

from rav1d_tpu.ops.ref import ipred as R

MODES = [
    ("dc", R.ipred_dc),
    ("dc_top", R.ipred_dc_top),
    ("dc_left", R.ipred_dc_left),
    ("dc_128", R.ipred_dc_128),
    ("v", R.ipred_v),
    ("h", R.ipred_h),
    ("paeth", R.ipred_paeth),
    ("smooth", R.ipred_smooth),
    ("smooth_v", R.ipred_smooth_v),
    ("smooth_h", R.ipred_smooth_h),
]


@pytest.mark.parametrize("bpc", [8, 10])
@pytest.mark.parametrize("w,h", [(4, 4), (8, 16), (32, 8), (64, 64)])
@pytest.mark.parametrize("name", [m[0] for m in MODES])
def test_ipred_batch_parity(name, w, h, bpc):
    from rav1d_tpu.ops.tpu import ipred as T

    ref_fn = dict(MODES)[name]
    tpu_fn = getattr(T, f"ipred_{name}_batch")
    rng = np.random.default_rng(hash((name, w, h, bpc)) & 0xFFFF)
    N = 7
    off = 2 * 64  # edge buffer center, matching ipred_prepare layout slack
    L = 2 * off + 1
    tls = rng.integers(0, (1 << bpc) - 1, (N, L)).astype(np.int32)

    want = np.zeros((N, h, w), dtype=np.int32)
    for i in range(N):
        ref_fn(want[i], tls[i], off, w, h, 0, w, h, bpc)
    got = np.asarray(tpu_fn(tls, off, w, h, bpc))
    np.testing.assert_array_equal(got, want)

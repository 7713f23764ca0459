"""checkasm-style parity: TPU (jax) mc/warp kernels vs numpy batch executors
on randomized inputs (tests/checkasm/mc.c analog)."""

import numpy as np
import pytest

from rav1d_tpu.ops.ref.mc import compute_8tap_batch, warp_affine_8x8_batch


@pytest.mark.parametrize("bpc", [8, 10])
@pytest.mark.parametrize("w,h", [(4, 4), (8, 8), (16, 8), (32, 32)])
@pytest.mark.parametrize("has_h,has_v", [(1, 1), (1, 0), (0, 1), (0, 0)])
def test_mc_8tap_batch_parity(bpc, w, h, has_h, has_v):
    from rav1d_tpu.ops.tpu.mc import mc_8tap_batch

    rng = np.random.default_rng(w * 100 + h + bpc)
    vis_w, vis_h = 96, 64
    src = rng.integers(0, (1 << bpc) - 1, (vis_h, vis_w)).astype(np.int32)
    N = 9
    sys_ = rng.integers(-4, vis_h, N)
    sxs = rng.integers(-4, vis_w, N)
    mxs = rng.integers(1, 16, N) * has_h
    mys = rng.integers(1, 16, N) * has_v
    f2ds = rng.integers(0, 9, N)  # exclude bilinear (9)

    want = compute_8tap_batch(src, sys_, sxs, w, h, mxs, mys, f2ds,
                              vis_w, vis_h, bpc)
    got = np.asarray(
        mc_8tap_batch(
            src, sys_, sxs, w, h, bool(has_h), bool(has_v), vis_w, vis_h, bpc,
            mxs=mxs, mys=mys, f2ds=f2ds,
        )
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("bpc", [8, 10])
def test_warp_8x8_batch_parity(bpc):
    from rav1d_tpu.ops.tpu.mc import warp_8x8_batch

    rng = np.random.default_rng(3 + bpc)
    vis_w, vis_h = 80, 64
    src = rng.integers(0, (1 << bpc) - 1, (vis_h, vis_w)).astype(np.int32)
    N = 11
    sys_ = rng.integers(-4, vis_h, N)
    sxs = rng.integers(-4, vis_w, N)
    abcds = rng.integers(-512, 512, (N, 4))
    mxs = rng.integers(-(1 << 14), 1 << 14, N) & ~0x3F
    mys = rng.integers(-(1 << 14), 1 << 14, N) & ~0x3F

    dst = np.zeros((vis_h + 32, vis_w + 32), dtype=np.uint16)
    dys = (np.arange(N) % 4) * 8
    dxs = (np.arange(N) // 4) * 8
    warp_affine_8x8_batch(dst, src, dys, dxs, sys_, sxs, abcds, mxs, mys,
                          vis_w, vis_h, bpc)
    want = np.stack([dst[dys[i] : dys[i] + 8, dxs[i] : dxs[i] + 8] for i in range(N)])

    got = np.asarray(
        warp_8x8_batch(src, sys_, sxs, abcds.astype(np.int32),
                       mxs.astype(np.int32), mys.astype(np.int32),
                       vis_w, vis_h, bpc)
    )
    np.testing.assert_array_equal(got, want)

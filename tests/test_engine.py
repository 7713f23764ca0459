"""Device-engine parity: full decodes through the engine (RAV1D_ENGINE=jax)
must reproduce the meson MD5 oracle bit-exactly (same oracle as the numpy
path; tests/conftest.py pins the CPU backend)."""

import pytest

from rav1d_tpu.testing import decode_md5
from tests.conftest import vector_path

VECTORS = [
    ("8-bit/size/av1-1-b8-01-size-16x16.ivf",
     "0d627c5089fa1595c6e7c0626b882bb4"),
    ("8-bit/size/av1-1-b8-01-size-32x16.ivf",
     "aa35af31b2ca478373b147cd18046be4"),
]


@pytest.mark.parametrize("rel,want", VECTORS)
def test_engine_md5(rel, want):
    got, _ = decode_md5(vector_path(rel), engine=True)
    assert got == want

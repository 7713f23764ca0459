"""Device-engine parity: full decodes through the engine (RAV1D_ENGINE=jax)
must reproduce the meson MD5 oracle bit-exactly (same oracle as the numpy
path; tests/conftest.py pins the CPU backend)."""

import hashlib
import os

import numpy as np
import pytest

from tests.conftest import vector_path

VECTORS = [
    ("8-bit/size/av1-1-b8-01-size-16x16.ivf",
     "0d627c5089fa1595c6e7c0626b882bb4"),
    ("8-bit/size/av1-1-b8-01-size-32x16.ivf",
     "aa35af31b2ca478373b147cd18046be4"),
]


def _decode_md5(path, engine):
    os.environ["RAV1D_ENGINE"] = "jax" if engine else "np"
    try:
        from rav1d_tpu.decoder import Decoder, EAgain, Settings
        from rav1d_tpu.io.ivf import IvfDemuxer

        dec = Decoder(Settings())
        md5 = hashlib.md5()

        def write(pic):
            for chunk in pic.iter_plane_rows():
                md5.update(chunk)

        for pkt in IvfDemuxer(path):
            dec.send_data(pkt.data, pkt.timestamp)
            while True:
                try:
                    write(dec.get_picture())
                except EAgain:
                    break
        while True:
            try:
                write(dec.get_picture())
            except EAgain:
                break
        return md5.hexdigest()
    finally:
        os.environ.pop("RAV1D_ENGINE", None)


@pytest.mark.parametrize("rel,want", VECTORS)
def test_engine_md5(rel, want):
    got = _decode_md5(vector_path(rel), engine=True)
    assert got == want

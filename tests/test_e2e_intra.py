"""End-to-end bit-exactness tests vs the dav1d MD5 oracle (intra path)."""

import pytest

from conftest import vector_path
from rav1d_tpu.decoder import Decoder, EAgain, Settings
from rav1d_tpu.io import probe_demuxer
from rav1d_tpu.io.muxers import Md5Muxer


def decode_md5(relpath, max_frames=None):
    demux = probe_demuxer(vector_path(relpath))
    dec = Decoder(Settings(apply_grain=False))  # test md5s are grain-free (dav1d --filmgrain 0)
    md5 = Md5Muxer()
    n = 0
    for pkt in demux:
        dec.send_data(pkt.data, pkt.timestamp)
        while True:
            try:
                md5.write_picture(dec.get_picture())
                n += 1
            except EAgain:
                break
        if max_frames and n >= max_frames:
            break
    return md5.digest(), n


@pytest.mark.parametrize(
    "rel,expected",
    [
        ("8-bit/issues/324_tennis.ivf", "53a0ba36b3a3656e6a12efb358d71f9e"),
        ("8-bit/issues/325_tennis.ivf", "54aa76d8f1aed2e86cc00c1b63ad9d53"),
    ],
)
def test_intra_bit_exact(rel, expected):
    got, n = decode_md5(rel)
    assert n == 1
    assert got == expected


@pytest.mark.parametrize(
    "rel,expected,frames",
    [
        ("8-bit/issues/320_tennis.ivf", "86e9c91b80bb738693c3781e728fd7f5", 1),
    ],
)
def test_intra_lr_bit_exact(rel, expected, frames):
    got, n = decode_md5(rel)
    assert n == frames
    assert got == expected


@pytest.mark.slow
def test_allintra_bit_exact():
    got, n = decode_md5("8-bit/intra/av1-1-b8-02-allintra.ivf")
    assert n == 39
    assert got == "4f00f5a1a173a99c1bf0406dea809182"


@pytest.mark.slow
def test_longleb_bit_exact():
    got, n = decode_md5("8-bit/features/long_leb.ivf")
    assert n == 1
    assert got == "d685b7961a77692eb4a1a4a22b3ab8ab"

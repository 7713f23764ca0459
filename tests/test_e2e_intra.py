"""End-to-end bit-exactness tests vs the dav1d MD5 oracle (intra path)."""

import pytest

from conftest import vector_path
from rav1d_tpu.decoder import Decoder, EAgain
from rav1d_tpu.io.ivf import IvfDemuxer
from rav1d_tpu.io.muxers import Md5Muxer


def decode_md5(relpath, max_frames=None):
    demux = IvfDemuxer(vector_path(relpath))
    dec = Decoder()
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

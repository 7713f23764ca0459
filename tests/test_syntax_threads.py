"""Thread-count invariance of the tile-parallel syntax plane: decoding
with --threads N must be bit-exact vs serial for any N (the reference's
gate re-runs MD5-verified vectors with --threads 2, test.sh:63-67; tiles
have independent entropy state, src/internal.rs:824-845)."""

import pytest

from conftest import vector_path
from rav1d_tpu.decoder import Decoder, EAgain, Settings
from rav1d_tpu.io.ivf import IvfDemuxer
from rav1d_tpu.io.muxers import Md5Muxer

# multi-tile vectors with their meson-oracle MD5s (8-bit/meson.build)
VECTORS = [
    ("8-bit/data/00000015.ivf", (3, 3)),   # 3x3 tile grid
    ("8-bit/data/00000009.ivf", (2, 2)),
    ("8-bit/data/00000029.ivf", (1, 5)),   # tile rows only
]


def _md5(path, threads):
    dec = Decoder(Settings(apply_grain=False, n_threads=threads))
    mux = Md5Muxer()
    n = 0
    for pkt in IvfDemuxer(path):
        dec.send_data(pkt.data, pkt.timestamp)
        while True:
            try:
                mux.write_picture(dec.get_picture())
                n += 1
            except EAgain:
                break
    assert n > 0
    return mux.digest()


@pytest.mark.parametrize("rel,grid", VECTORS)
def test_threads_invariant(rel, grid):
    path = vector_path(rel)
    serial = _md5(path, 1)
    for threads in (2, 4):
        assert _md5(path, threads) == serial, f"threads={threads}"

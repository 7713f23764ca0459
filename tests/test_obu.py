"""OBU / header parsing tests on real test vectors."""

import pytest

from conftest import vector_path
from rav1d_tpu.io.ivf import IvfDemuxer
from rav1d_tpu.decoder import Decoder
from rav1d_tpu.headers import PixelLayout, Profile


class _Stop(Exception):
    pass


def parse_first_tu(relpath):
    """Feed the first temporal unit, stopping at frame submission (headers
    fully parsed; decode itself is covered by the e2e tests)."""
    demux = IvfDemuxer(vector_path(relpath))
    dec = Decoder()

    def stop():
        raise _Stop

    dec.submit_frame = stop
    pkt = demux.read()
    try:
        dec.send_data(pkt.data, pkt.timestamp)
    except (_Stop, NotImplementedError):
        pass
    except Exception as e:
        # send_data wraps everything in DecodeError (poison-not-kill
        # contract); unwrap to find our stop sentinel
        causes = []
        c = e
        while c is not None:
            causes.append(type(c))
            c = c.__cause__
        if _Stop not in causes and NotImplementedError not in causes:
            raise
    return dec, demux


def test_seq_hdr_16x16():
    dec, demux = parse_first_tu("8-bit/size/av1-1-b8-01-size-16x16.ivf")
    sh = dec.seq_hdr
    assert sh is not None
    assert sh.profile == Profile.MAIN
    assert (sh.max_width, sh.max_height) == (16, 16)
    assert sh.layout == PixelLayout.I420
    assert sh.hbd == 0
    assert (demux.width, demux.height) == (16, 16)


def test_seq_hdr_allintra():
    dec, _ = parse_first_tu("8-bit/intra/av1-1-b8-02-allintra.ivf")
    sh = dec.seq_hdr
    assert (sh.max_width, sh.max_height) == (352, 288)
    assert sh.layout == PixelLayout.I420


def test_seq_hdr_10bit():
    import glob, os

    vecs = glob.glob(vector_path("10-bit/*/*.ivf"))
    assert vecs
    dec, _ = parse_first_tu(os.path.relpath(vecs[0], vector_path("")))
    assert dec.seq_hdr.hbd >= 1


def test_all_8bit_headers_parse():
    """Every 8-bit vector's first temporal unit parses without error."""
    import glob, os

    vecs = sorted(glob.glob(vector_path("8-bit/*/*.ivf")))
    assert len(vecs) > 50
    failures = []
    for v in vecs:
        try:
            parse_first_tu(os.path.relpath(v, vector_path("")))
        except NotImplementedError:
            pass
        except Exception as e:
            failures.append((os.path.basename(v), f"{type(e).__name__}: {e}"))
    assert not failures, failures

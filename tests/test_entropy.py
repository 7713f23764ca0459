"""msac range decoder + CDF context unit tests."""

from rav1d_tpu.entropy.msac import MsacContext
from rav1d_tpu.entropy.cdf import CdfContext, get_qcat_idx


def test_msac_init_state():
    s = MsacContext(bytes([0x80] + [0] * 31))
    assert s.rng == 0x8000
    # After init+refill the window holds the first bytes xor'd in
    assert s.cnt >= 0


def test_bool_equi_uniformity():
    # Decoding from random bytes should give roughly balanced booleans
    import random

    random.seed(7)
    data = bytes(random.randrange(256) for _ in range(4096))
    s = MsacContext(data)
    ones = sum(s.decode_bool_equi() for _ in range(10000))
    assert 4500 < ones < 5500


def test_symbol_adapt_updates_cdf():
    s = MsacContext(bytes(range(1, 65)))
    cdf = [28672, 21504, 13440, 0, 0]  # 4-symbol mv-joint style + counter
    before = list(cdf)
    for _ in range(10):
        v = s.decode_symbol_adapt(cdf, 3)
        assert 0 <= v <= 3
    assert cdf[3] == 10  # counter at slot n_symbols, counts up to 32
    assert cdf[:3] != before[:3]  # probabilities adapted


def test_symbol_no_update_when_disabled():
    s = MsacContext(bytes(range(1, 65)), disable_cdf_update=True)
    cdf = [28672, 21504, 13440, 0, 0]
    before = list(cdf)
    for _ in range(10):
        s.decode_symbol_adapt(cdf, 3)
    assert cdf == before


def test_decode_matches_reference_convention():
    # rng stays within [0x8000, 0xFFFF] after each norm
    import random

    random.seed(3)
    data = bytes(random.randrange(256) for _ in range(1024))
    s = MsacContext(data)
    cdf = [28672, 21504, 13440, 0, 0]
    for _ in range(500):
        s.decode_symbol_adapt(cdf, 3)
        assert 0x8000 <= s.rng <= 0xFFFF
        s.decode_bool(20000)
        assert 0x8000 <= s.rng <= 0xFFFF


def test_qcat():
    assert get_qcat_idx(0) == 0
    assert get_qcat_idx(21) == 1
    assert get_qcat_idx(61) == 2
    assert get_qcat_idx(121) == 3


def test_cdf_update_zeroes_counters():
    from rav1d_tpu.headers import FrameHeader, FrameType

    c = CdfContext.from_qindex(50)
    s = MsacContext(bytes(range(1, 129)))
    for _ in range(20):
        s.decode_symbol_adapt(c.m.y_mode[0], 12)
    assert c.m.y_mode[0][12] == 20
    hdr = FrameHeader()
    hdr.frame_type = FrameType.INTER
    in_cdf = CdfContext.from_qindex(50)
    u = c.updated(hdr, in_cdf)
    assert u.m.y_mode[0][12] == 0
    assert u.m.y_mode[0][:12] == c.m.y_mode[0][:12]
    # original untouched
    assert c.m.y_mode[0][12] == 20
    # unlisted tables (kfym) revert to the input cdf, not the tile state
    assert u.kfym == in_cdf.kfym

"""Encoder <-> scalar reference decoder round-trip tests.

The encoder (espflix_tpu/tools/mpeg1_encode.py) and the scalar decoder
(espflix_tpu/core/refdec.py) are independent inverse implementations of
the same spec subset; these tests pin their agreement on constructed and
randomized streams.  Bit-exactness against the C++ oracle is covered in
test_oracle.py; the batched device decoder in test_decode_batched.py.
"""

import numpy as np
import pytest

from espflix_tpu.core.refdec import Mpeg1Decoder, idct_ref
from espflix_tpu.tools import mpeg1_encode as E


def _decode(script):
    return Mpeg1Decoder().decode_es(E.encode_es(script))


def _uniform_I(dc_y, dc_u, dc_v, qscale=8, mb_w=22, mb_h=12):
    pic = {"type": "I", "slices": []}
    for row in range(mb_h):
        sl = {"row": row, "qscale": qscale, "mbs": [
            {"addr_inc": 1, "intra": True,
             "blocks": [[(0, dc_y)]] * 4 + [[(0, dc_u)]] + [[(0, dc_v)]]}
            for _ in range(mb_w)]}
        pic["slices"].append(sl)
    return pic


def test_dc_only_i_frame():
    script = {"width": 352, "height": 192,
              "pictures": [_uniform_I(100, 60, 200)]}
    (f,) = _decode(script)
    assert f.y.shape == (192, 352) and f.u.shape == (96, 176)
    assert (f.y == 100).all() and (f.u == 60).all() and (f.v == 200).all()


def test_dc_pin_clamps_to_248():
    script = {"width": 352, "height": 192,
              "pictures": [_uniform_I(255, 10, 10)]}
    (f,) = _decode(script)
    assert (f.y == 248).all()  # PIN saturation (player.cpp:183-236)


def test_p_frame_zero_mv_skip_copies_reference():
    i_pic = _uniform_I(80, 90, 110)
    # P picture: first MB of each row coded (required), rest skipped.
    p_pic = {"type": "P", "full_pel": 0, "f_code": 1, "slices": []}
    for row in range(12):
        mbs = [{"addr_inc": 1, "intra": False, "mv": None,
                "blocks": [[(1, 1)]] + [None] * 5}]
        mbs.append({"addr_inc": 21, "intra": False, "mv": None,
                    "blocks": [[(1, 1)]] + [None] * 5})
        p_pic["slices"].append({"row": row, "qscale": 1, "mbs": mbs})
    script = {"width": 352, "height": 192, "pictures": [i_pic, p_pic]}
    f0, f1 = _decode(script)
    # skipped/copied regions must equal the I frame exactly
    assert np.array_equal(f1.y[:, 16:-16], f0.y[:, 16:-16])
    assert np.array_equal(f1.u[:, 8:-8], f0.u[:, 8:-8])
    # coded first block differs somewhere
    assert not np.array_equal(f1.y[:16, :16], f0.y[:16, :16])


def test_p_frame_integer_mv_translation():
    # I frame with a horizontal ramp; P frame moves everything by (-32, 0)
    # half-pel = -16 full pixels using one MV per MB.
    mb_w, mb_h = 22, 12
    i_pic = {"type": "I", "slices": []}
    for row in range(mb_h):
        sl = {"row": row, "qscale": 8, "mbs": []}
        for x in range(mb_w):
            dc = (x * 11) % 240
            sl["mbs"].append({"addr_inc": 1, "intra": True,
                              "blocks": [[(0, dc)]] * 6})
        i_pic["slices"].append(sl)
    p_pic = {"type": "P", "full_pel": 0, "f_code": 2, "slices": []}
    for row in range(mb_h):
        sl = {"row": row, "qscale": 8, "mbs": []}
        for x in range(mb_w):
            mv = (-32, 0) if x > 0 else (0, 0)
            sl["mbs"].append({"addr_inc": 1, "intra": False, "mv": mv,
                              "blocks": [None] * 6})
        sl["mbs"][0]["blocks"] = [[(1, 1)]] + [None] * 5  # must code 1 blk
        p_pic["slices"].append(sl)
    script = {"width": 352, "height": 192, "pictures": [i_pic, p_pic]}
    f0, f1 = _decode(script)
    assert np.array_equal(f1.y[:, 16:], f0.y[:, :-16])


def test_half_pel_rounding():
    # two adjacent DC blocks 100 / 101 -> half-pel between = (100+101+1)>>1
    mb_w, mb_h = 22, 12
    i_pic = {"type": "I", "slices": []}
    for row in range(mb_h):
        sl = {"row": row, "qscale": 8, "mbs": []}
        for x in range(mb_w):
            dc = 100 + (x & 1)
            sl["mbs"].append({"addr_inc": 1, "intra": True,
                              "blocks": [[(0, dc)]] * 4
                              + [[(0, 128)]] * 2})
        i_pic["slices"].append(sl)
    p_pic = {"type": "P", "full_pel": 0, "f_code": 1, "slices": []}
    for row in range(mb_h):
        # right-edge MB can't take a +half-pel MV (the reference's overread
        # into adjacent strip memory is excluded behavior; see
        # espflix_tpu/tools/mpeg1_encode.py _safe_mv_range)
        sl = {"row": row, "qscale": 8,
              "mbs": [{"addr_inc": 1, "intra": False, "mv": (1, 0),
                       "blocks": [None] * 6} if 0 < x < mb_w - 1 else
                      {"addr_inc": 1, "intra": False, "mv": None,
                       "blocks": [[(1, 1)]] + [None] * 5}
                      for x in range(mb_w)]}
        p_pic["slices"].append(sl)
    script = {"width": 352, "height": 192, "pictures": [i_pic, p_pic]}
    f0, f1 = _decode(script)
    # across the 16px boundary of MBs with alternating DC, columns average
    # to 100/101 with +1 rounding.
    y = f1.y[0]
    src = f0.y[0].astype(np.int32)
    expect = (src[16:336] + src[17:337] + 1) >> 1
    assert np.array_equal(y[16:336], expect.astype(np.uint8))


def test_idct_dc_shortcut_equivalence():
    # a DC-only block through the full IDCT equals dc (the reference takes
    # a shortcut; they must agree for the values the shortcut produces)
    for dc in (0, 1, 100, 255):
        b = np.zeros(64, np.int32)
        b[0] = dc << 8
        out = idct_ref(b)
        assert (out == dc).all(), dc


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_random_roundtrip_decodes(seed, rng=None):
    rng = np.random.default_rng(seed)
    sc = E.random_script(rng, n_pictures=4, max_coeffs=10)
    frames = _decode(sc)
    assert len(frames) == 4
    for f in frames:
        assert f.y.max() <= 248 and f.u.max() <= 248 and f.v.max() <= 248


def test_determinism_across_runs():
    sc = E.random_script(np.random.default_rng(99), n_pictures=3)
    es = E.encode_es(sc)
    a = Mpeg1Decoder().decode_es(es)
    b = Mpeg1Decoder().decode_es(es)
    for x, y in zip(a, b):
        assert np.array_equal(x.y, y.y)
        assert np.array_equal(x.u, y.u)
        assert np.array_equal(x.v, y.v)

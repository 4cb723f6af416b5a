"""Batched device decoder vs scalar golden model: bit-exact YUV.

Every lane of the batched decoder (vlc_scan FSM + dense IDCT/mocomp)
must reproduce core/refdec.py exactly on randomized streams.
"""

import numpy as np
import pytest

from espflix_tpu.core.refdec import Mpeg1Decoder
from espflix_tpu.models import mpeg1 as M
from espflix_tpu.tools import mpeg1_encode as E


def ref_decode(es):
    return Mpeg1Decoder().decode_es(es)


def check_lanes(streams):
    outs = M.decode_es_batched(streams)
    for lane, es in enumerate(streams):
        ref = ref_decode(es)
        got = outs[lane]
        assert len(got) == len(ref), f"lane {lane} frame count"
        for k, (rf, (gy, gu, gv)) in enumerate(zip(ref, got)):
            assert np.array_equal(rf.y, gy), f"lane {lane} frame {k} Y"
            assert np.array_equal(rf.u, gu), f"lane {lane} frame {k} U"
            assert np.array_equal(rf.v, gv), f"lane {lane} frame {k} V"


# Small frames keep XLA compile times reasonable on the 1-core CPU host;
# decode semantics are resolution-independent.  One full-size test below.
SMALL = dict(width=96, height=64)


def test_single_lane_ip_full_size():
    rng = np.random.default_rng(22)
    sc = E.random_script(rng, n_pictures=3, max_coeffs=8)
    check_lanes([E.encode_es(sc)])


def test_four_lanes_divergent_streams():
    streams = []
    for seed in (31, 32, 33, 34):
        rng = np.random.default_rng(seed)
        sc = E.random_script(rng, n_pictures=4, max_coeffs=10, **SMALL)
        streams.append(E.encode_es(sc))
    check_lanes(streams)


def test_lanes_with_different_lengths():
    rng = np.random.default_rng(44)
    a = E.encode_es(E.random_script(rng, n_pictures=4, **SMALL))
    b = E.encode_es(E.random_script(rng, n_pictures=2, **SMALL))
    check_lanes([a, b])


@pytest.mark.parametrize("seed", [101, 202])
def test_dense_coefficients(seed):
    rng = np.random.default_rng(seed)
    sc = E.random_script(rng, n_pictures=2, max_coeffs=30, **SMALL)
    check_lanes([E.encode_es(sc)])

def _multirow_slice_es():
    """Hand-built I-picture whose single slice spans two macroblock rows.

    The reference slice loop (player.cpp slice(): mb_x wrap -> mb_y++)
    keeps decoding past the end of the start-code row until the
    bitstream runs out of macroblocks; slices are NOT bounded to one
    row.  12 DC-only intra MBs on a 6x2 MB picture, DC predictors
    chained across the row boundary.
    """
    from espflix_tpu.core.bitio import BitWriter

    w = BitWriter()
    W, H = 96, 32
    w.start_code(0xB3)
    w.put(W, 12); w.put(H, 12); w.put(1, 4); w.put(5, 4)
    w.put(2928, 18); w.put(1, 1); w.put(20, 10)
    w.put(0, 1); w.put(0, 1); w.put(0, 1)
    w.start_code(0x00)
    w.put(0, 10); w.put(1, 3); w.put(0xFFFF, 16); w.put(0, 1)
    w.start_code(0x01)            # slice row 0 carries BOTH rows
    w.put(8, 5); w.put(0, 1)      # qscale, no extra
    y_dc = u_dc = v_dc = 128
    for k in range(12):
        E.put_addr_inc(w, 1)
        w.put_str("1")            # mb_type: intra
        for b in range(6):
            dc = 40 + k * 10 + b
            if b < 4:
                E.put_dc(w, dc - y_dc, True); y_dc = dc
            elif b == 4:
                E.put_dc(w, dc - u_dc, False); u_dc = dc
            else:
                E.put_dc(w, dc - v_dc, False); v_dc = dc
            w.put_str("10")       # EOB
    w.align()
    w.start_code(0xB7)
    return w.tobytes()


def test_slice_spanning_multiple_mb_rows():
    es = _multirow_slice_es()
    ref = ref_decode(es)
    assert len(ref) == 1
    # second MB row was really decoded (dc deltas chained across rows)
    assert [int(ref[0].y[0, c * 16]) for c in range(6)] == \
        [40, 50, 60, 70, 80, 90]
    assert [int(ref[0].y[16, c * 16]) for c in range(6)] == \
        [100, 110, 120, 130, 140, 150]
    check_lanes([es])

    from espflix_tpu.tools import oracle
    if oracle.available():
        frames, _ = oracle.decode_mpeg1(es, max_frames=2,
                                        width=96, height=32)
        oy, ou, ov = frames[0]
        assert np.array_equal(ref[0].y, oy)
        assert np.array_equal(ref[0].u, ou)
        assert np.array_equal(ref[0].v, ov)

def test_mb_stuffing_and_escape_increment():
    """Hand-built stream exercising MB_STUFFING (discarded, ISO B.1)
    before an address increment, and MB_ESCAPE (+33) skips in a P
    picture -- neither is emitted by the in-tree encoder's random
    scripts with stuffing, so they get a dedicated fixture."""
    from espflix_tpu.core.bitio import BitWriter
    from espflix_tpu.core import vlc_tables as V

    inv = {v: k for k, v in V.MB_ADDR_INC.items()}
    W_, H_ = 96, 112                      # 6 x 7 MBs (42 total)
    w = BitWriter()
    w.start_code(0xB3)
    w.put(W_, 12); w.put(H_, 12); w.put(1, 4); w.put(5, 4)
    w.put(2928, 18); w.put(1, 1); w.put(20, 10)
    w.put(0, 1); w.put(0, 1); w.put(0, 1)

    # I picture: every MB coded, two stuffing codes mid-slice
    w.start_code(0x00)
    w.put(0, 10); w.put(1, 3); w.put(0xFFFF, 16); w.put(0, 1)
    y_dc = u_dc = v_dc = 128
    for row in range(7):
        w.start_code(row + 1)
        w.put(8, 5); w.put(0, 1)
        y_dc = u_dc = v_dc = 128
        for k in range(6):
            if k == 2:
                w.put_str(inv[V.MB_STUFFING])
                w.put_str(inv[V.MB_STUFFING])
            E.put_addr_inc(w, 1)
            w.put_str("1")
            for b in range(6):
                dc = 40 + row * 20 + k * 2 + b
                if b < 4:
                    E.put_dc(w, dc - y_dc, True); y_dc = dc
                elif b == 4:
                    E.put_dc(w, dc - u_dc, False); u_dc = dc
                else:
                    E.put_dc(w, dc - v_dc, False); v_dc = dc
                w.put_str("10")

    # P picture: first MB coded, then escape(+33)+2 = skip 34 -> lands
    # exactly 35 MBs later (wraps two rows), one slice for the picture
    w.start_code(0x00)
    w.put(1, 10); w.put(2, 3); w.put(0xFFFF, 16)
    w.put(0, 1); w.put(1, 3)              # full_pel=0, f_code=1
    w.put(0, 1)
    w.start_code(0x01)
    w.put(8, 5); w.put(0, 1)
    E.put_addr_inc(w, 1)
    w.put_str(E._INV_MB_TYPE_P[V.MBT_INTRA])
    for b in range(6):
        E.put_dc(w, 0, b < 4)
        w.put_str("10")
    w.put_str(inv[V.MB_ESCAPE])           # +33
    w.put_str(inv[2])                     # +2 -> increment 35
    w.put_str(E._INV_MB_TYPE_P[V.MBT_INTRA])   # intra (resets preds)
    for b in range(6):
        E.put_dc(w, 72 - 128 if b < 4 else 0, b < 4)
        w.put_str("10")
    w.align()
    w.start_code(0xB7)
    es = w.tobytes()

    ref = ref_decode(es)
    assert len(ref) == 2
    # stuffing was transparent: all I-frame MBs landed
    assert int(ref[0].y[0, 0]) == 40 and int(ref[0].y[32, 80]) == 90
    # escape skip: MBs 1..34 copied the I frame; MB 35 (row 5, col 5)
    # re-coded with dc 72
    assert np.array_equal(ref[1].y[16:80], ref[0].y[16:80])
    assert int(ref[1].y[80, 80]) == 72
    check_lanes([es])

    from espflix_tpu.tools import oracle
    if oracle.available():
        frames, _ = oracle.decode_mpeg1(es, max_frames=3,
                                        width=W_, height=H_)
        for fr, (oy, ou, ov) in zip(ref, frames):
            assert np.array_equal(fr.y, oy)
            assert np.array_equal(fr.u, ou)
            assert np.array_equal(fr.v, ov)


def _tiny_quant_script():
    """All-ones quant matrices + qscale 1: small levels truncate to 0 in
    dequant, hitting the reference's 0 -> +1 oddification
    (player.cpp:1114-1115; ADVICE r1).  Deterministic content."""
    W, H = 96, 64
    mb_w, mb_h = 6, 4
    iq = np.ones(64, np.uint8)
    nq = np.ones(64, np.uint8)

    def i_block(b):
        return [(0, 100 + 7 * b)] + [(1 + k, 1 + (k + b) % 3)
                                     for k in range(5)]

    pic_i = {"type": "I", "full_pel": 0, "f_code": 1, "slices": []}
    for row in range(mb_h):
        sl = {"row": row, "qscale": 1,
              "mbs": [{"addr_inc": 1, "intra": True, "quant": None,
                       "blocks": [i_block(b) for b in range(6)]}
                      for _ in range(mb_w)]}
        pic_i["slices"].append(sl)

    pic_p = {"type": "P", "full_pel": 0, "f_code": 1, "slices": []}
    for row in range(mb_h):
        mbs = []
        for x in range(mb_w):
            blocks = [None] * 6
            blocks[x % 6] = [(1, 1), (2, -1), (5, 2)]
            mbs.append({"addr_inc": 1, "intra": False, "quant": None,
                        "mv": None, "blocks": blocks})
        pic_p["slices"].append({"row": row, "qscale": 1, "mbs": mbs})

    return {"width": W, "height": H, "intra_q": iq, "non_intra_q": nq,
            "pictures": [pic_i, pic_p]}


def test_tiny_quant_oddification_zero_to_one():
    """The truncated-to-zero dequant path must follow the reference
    (0 -> +1), and device == scalar on a stream that exercises it."""
    from espflix_tpu.utils import strict_int as si
    # pin the semantic directly: level 1, qscale 1, qmat 1
    assert si.dequant_array(1, True, 1, 1) == 1    # (2*1*1)/16=0 -> +1
    # the reference maps truncated-to-zero to +1 REGARDLESS of the
    # level's sign (`v -= v>0 ? 1 : -1` with v==0 adds 1)
    assert si.dequant_array(-1, True, 1, 1) == 1
    assert si.dequant_array(1, False, 1, 1) == 1   # (3*1*1)/16=0 -> +1
    check_lanes([E.encode_es(_tiny_quant_script())])

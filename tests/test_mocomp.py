"""Half-pel motion compensation: the three implementations agree.

predict_plane (per-pixel gathers), predict_plane_blocks (batched
window slices) and predict_plane_mxu (one-hot bf16 MXU contractions,
the production path inside dense_compose) must be bit-identical over
all four half-pel phases, including edge MVs within the encoder's
safe range, against a scalar numpy model of the exact MPEG-1 rounding
(player.cpp:767-819 semantics)."""

import os

import numpy as np

# compiled Mosaic on real hardware when ESPFLIX_TEST_TPU=1 (the
# recorded per-round TPU suite run); interpret mode on the CPU mesh
INTERP = not bool(os.environ.get("ESPFLIX_TEST_TPU"))
import jax.numpy as jnp
import pytest

from espflix_tpu.ops import mocomp as MC


def scalar_predict(ref, mv_h, mv_v, S):
    N, H, W = ref.shape
    out = np.zeros_like(ref)
    r = ref.astype(np.int32)
    for n in range(N):
        for my in range(H // S):
            for mx in range(W // S):
                xh = mx * S * 2 + mv_h[n, my, mx]
                yh = my * S * 2 + mv_v[n, my, mx]
                x0, y0 = xh >> 1, yh >> 1
                hx, hy = xh & 1, yh & 1
                for py in range(S):
                    for px in range(S):
                        y, x = y0 + py, x0 + px
                        a = r[n, y, x]
                        if hx and hy:
                            val = (a + r[n, y, x + 1] + r[n, y + 1, x]
                                   + r[n, y + 1, x + 1] + 2) >> 2
                        elif hx:
                            val = (a + r[n, y, x + 1] + 1) >> 1
                        elif hy:
                            val = (a + r[n, y + 1, x] + 1) >> 1
                        else:
                            val = a
                        out[n, my * S + py, mx * S + px] = val
    return out


def safe_mvs(rng, mbh, mbw, S, n):
    """Effective half-pel MVs keeping every tap (incl. the +1 for
    half-pel) inside the plane, mirroring the encoder's safe range."""
    mv_h = np.zeros((n, mbh, mbw), np.int32)
    mv_v = np.zeros((n, mbh, mbw), np.int32)
    for my in range(mbh):
        for mx in range(mbw):
            lo_x, hi_x = -2 * mx * S, 2 * (mbw - 1 - mx) * S - 2
            lo_y, hi_y = -2 * my * S, 2 * (mbh - 1 - my) * S - 2
            mv_h[:, my, mx] = rng.integers(max(lo_x, -2 * S),
                                           min(hi_x, 2 * S) + 1, n)
            mv_v[:, my, mx] = rng.integers(max(lo_y, -2 * S),
                                           min(hi_y, 2 * S) + 1, n)
    return mv_h, mv_v


@pytest.mark.parametrize("S", [16, 8])
def test_three_impls_match_scalar(S):
    rng = np.random.default_rng(42 + S)
    n, mbh, mbw = 3, 3, 4
    H, W = mbh * S, mbw * S
    ref = rng.integers(0, 249, (n, H, W)).astype(np.uint8)
    mv_h, mv_v = safe_mvs(rng, mbh, mbw, S, n)

    want = scalar_predict(ref, mv_h, mv_v, S)
    rj, hj, vj = jnp.asarray(ref), jnp.asarray(mv_h), jnp.asarray(mv_v)
    for name, fn in (("gather", MC.predict_plane),
                     ("blocks", MC.predict_plane_blocks),
                     ("mxu", MC.predict_plane_mxu)):
        got = np.asarray(fn(rj, hj, vj, S))
        assert np.array_equal(got, want), name


def test_all_four_phases_exercised():
    rng = np.random.default_rng(7)
    n, S = 1, 16
    ref = rng.integers(0, 249, (n, 48, 48)).astype(np.uint8)
    for ph, (dh, dv) in enumerate([(0, 0), (1, 0), (0, 1), (1, 1)]):
        mv_h = np.full((n, 3, 3), 0, np.int32)
        mv_v = np.full((n, 3, 3), 0, np.int32)
        mv_h[:, 1, 1] = 2 + dh          # interior MB only
        mv_v[:, 1, 1] = 2 + dv
        want = scalar_predict(ref, mv_h, mv_v, S)
        got = np.asarray(MC.predict_plane_mxu(
            jnp.asarray(ref), jnp.asarray(mv_h), jnp.asarray(mv_v), S))
        assert np.array_equal(got, want), f"phase {ph}"


def test_pallas_mocomp_matches_gather_reference():
    """predict_plane_pallas (roll-based VMEM kernel, interpret mode on
    CPU) must be bit-identical to predict_plane for in-bounds MVs,
    both plane sizes, all four half-pel phases."""
    import jax.numpy as jnp

    from espflix_tpu.ops import mocomp as MC
    from espflix_tpu.ops.mocomp_pallas import predict_plane_pallas

    rng = np.random.default_rng(5)
    for (N, H, W, S) in ((2, 64, 128, 16), (2, 32, 64, 8),
                         (1, 192, 352, 16)):  # WP=384: narrowed-roll path
        mbh, mbw = H // S, W // S
        ref = jnp.asarray(rng.integers(0, 249, (N, H, W),
                                       dtype=np.uint8))
        bx = np.arange(mbw)[None, None, :] * S
        by = np.arange(mbh)[None, :, None] * S
        mh = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                     -2 * bx, 2 * (W - S - bx) - 1).astype(np.int32)
        mv = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                     -2 * by, 2 * (H - S - by) - 1).astype(np.int32)
        want = np.asarray(MC.predict_plane(
            ref, jnp.asarray(mh), jnp.asarray(mv), S))
        got = np.asarray(predict_plane_pallas(
            ref, jnp.asarray(mh), jnp.asarray(mv), S, interpret=INTERP))
        assert np.array_equal(got, want), (N, H, W, S)


@pytest.mark.parametrize("variant", ["fused", "fused2"])
def test_fused_compose_matches_xla_dense_compose(variant):
    """compose_plane_pallas / compose_plane_pallas2 via
    dense_compose(use_pallas_mocomp="fused"/"fused2") must reproduce
    the XLA predict+compose+put path bit-exactly: random MB kinds
    (STALE/SKIP/INTER/INTRA), random in-range MVs, random residual
    coefficients, inactive lanes."""
    import jax.numpy as jnp

    from espflix_tpu.models import mpeg1 as M

    rng = np.random.default_rng(11)
    # the full 352x192 geometry (WP=384 narrowed-roll case) compiles
    # ~10 min in CPU interpret mode; run it only on real hardware
    geoms = ((4, 2, 3), (1, 12, 22)) if not INTERP else ((4, 2, 3),)
    for (N, mbh, mbw) in geoms:
        H, W = mbh * 16, mbw * 16
        mb = mbh * mbw
        BL = mb * 6
        frames = dict(
            y=jnp.asarray(rng.integers(0, 249, (N, 2, H, W),
                                       dtype=np.uint8)),
            u=jnp.asarray(rng.integers(0, 249, (N, 2, H // 2, W // 2),
                                       dtype=np.uint8)),
            v=jnp.asarray(rng.integers(0, 249, (N, 2, H // 2, W // 2),
                                       dtype=np.uint8)),
            parity=jnp.asarray(
                rng.integers(0, 2, N).astype(np.int32)))
        kind = rng.integers(0, 4, (N, mb))
        qs = rng.integers(1, 32, (N, mb))
        mvh = rng.integers(-8, 9, (N, mb)).astype(np.int64)
        mvv = rng.integers(-8, 9, (N, mb)).astype(np.int64)
        recs = jnp.asarray(
            (kind | (qs << 2) | ((mvh & 0xFFF) << 7)
             | ((mvv & 0xFFF) << 19)).astype(np.int64)).astype(
                 jnp.int32)
        coeffs_T = jnp.asarray(
            rng.integers(-60, 61, (N, 64, BL)).astype(np.int16))
        nfinal = jnp.asarray(
            rng.integers(0, 5, (N, BL)).astype(np.int32))
        iq = jnp.asarray(np.broadcast_to(
            np.asarray([8] + [16] * 63, np.int32), (N, 64)).copy())
        nq = jnp.asarray(np.full((N, 64), 16, np.int32))
        active = jnp.asarray(rng.integers(0, 2, N).astype(bool))
        if N == 1:
            active = jnp.ones((1,), bool)

        want_f, want_p = M.dense_compose(
            None, recs, nfinal, iq, nq, active, frames,
            mb_width=mbw, mb_height=mbh, coeffs_T=coeffs_T,
            use_pallas_mocomp=False)
        got_f, got_p = M.dense_compose(
            None, recs, nfinal, iq, nq, active, frames,
            mb_width=mbw, mb_height=mbh, coeffs_T=coeffs_T,
            use_pallas_mocomp=variant)
        for k in ("y", "u", "v"):
            assert np.array_equal(np.asarray(got_p[k]),
                                  np.asarray(want_p[k])), (N, k)
            assert np.array_equal(np.asarray(got_f[k]),
                                  np.asarray(want_f[k])), (N, k)
        assert np.array_equal(np.asarray(got_f["parity"]),
                              np.asarray(want_f["parity"]))


def test_phase_stacked_mocomp_matches_reference():
    """predict_plane_phase + predict_chroma_pair_phase (phase-stacked
    kernel, u|v dual-packed) must be bit-identical to predict_plane
    for in-bounds MVs, both plane sizes, all four half-pel phases."""
    import jax.numpy as jnp

    from espflix_tpu.ops import mocomp as MC
    from espflix_tpu.ops.mocomp_pallas import (predict_chroma_pair_phase,
                                               predict_plane_phase)

    rng = np.random.default_rng(6)
    for (N, H, W, S) in ((2, 64, 128, 16), (2, 32, 64, 8),
                         (1, 192, 352, 16)):  # WP=384: narrowed roll
        mbh, mbw = H // S, W // S
        ref = jnp.asarray(rng.integers(0, 249, (N, H, W),
                                       dtype=np.uint8))
        bx = np.arange(mbw)[None, None, :] * S
        by = np.arange(mbh)[None, :, None] * S
        mh = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                     -2 * bx, 2 * (W - S - bx) - 1).astype(np.int32)
        mv = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                     -2 * by, 2 * (H - S - by) - 1).astype(np.int32)
        want = np.asarray(MC.predict_plane(
            ref, jnp.asarray(mh), jnp.asarray(mv), S))
        got = np.asarray(predict_plane_phase(
            ref, jnp.asarray(mh), jnp.asarray(mv), S, interpret=INTERP))
        assert np.array_equal(got, want), ("single", N, H, W, S)

    # dual chroma pack at the production geometry (96x176, S=8)
    N, H, W, S = 2, 96, 176, 8
    mbh, mbw = 12, 22
    ru = jnp.asarray(rng.integers(0, 249, (N, H, W), dtype=np.uint8))
    rv = jnp.asarray(rng.integers(0, 249, (N, H, W), dtype=np.uint8))
    bx = np.arange(mbw)[None, None, :] * S
    by = np.arange(mbh)[None, :, None] * S
    mh = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                 -2 * bx, 2 * (W - S - bx) - 1).astype(np.int32)
    mv = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                 -2 * by, 2 * (H - S - by) - 1).astype(np.int32)
    gu, gv = predict_chroma_pair_phase(
        ru, rv, jnp.asarray(mh), jnp.asarray(mv), interpret=INTERP)
    assert np.array_equal(np.asarray(gu), np.asarray(
        MC.predict_plane(ru, jnp.asarray(mh), jnp.asarray(mv), S)))
    assert np.array_equal(np.asarray(gv), np.asarray(
        MC.predict_plane(rv, jnp.asarray(mh), jnp.asarray(mv), S)))


def test_rowpair_phase_mocomp_matches_reference():
    """predict_plane_phase2 (row-pair packed phase stack: rows r and
    r+8 as 16-bit halves of one int32 lane, halving the per-visit
    dynamic lane roll) must be bit-identical to predict_plane for
    in-bounds MVs, all four half-pel phases."""
    import jax.numpy as jnp

    from espflix_tpu.ops import mocomp as MC
    from espflix_tpu.ops.mocomp_pallas import predict_plane_phase2

    rng = np.random.default_rng(9)
    for (N, H, W, S) in ((2, 64, 128, 16),
                         (1, 192, 352, 16)):  # WP=384: narrowed roll
        mbh, mbw = H // S, W // S
        ref = jnp.asarray(rng.integers(0, 249, (N, H, W),
                                       dtype=np.uint8))
        bx = np.arange(mbw)[None, None, :] * S
        by = np.arange(mbh)[None, :, None] * S
        mh = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                     -2 * bx, 2 * (W - S - bx) - 1).astype(np.int32)
        mv = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                     -2 * by, 2 * (H - S - by) - 1).astype(np.int32)
        want = np.asarray(MC.predict_plane(
            ref, jnp.asarray(mh), jnp.asarray(mv), S))
        got = np.asarray(predict_plane_phase2(
            ref, jnp.asarray(mh), jnp.asarray(mv), S, interpret=INTERP))
        assert np.array_equal(got, want), ("phase2", N, H, W, S)


def test_precomputed_scalar_mocomp_matches_reference():
    """predict_plane_phase2p / predict_chroma_pair_packedp (visit
    scalars -- slice bases, roll amounts, funnel shifts -- precomputed
    on the XLA side and read from SMEM; the chroma funnel's second
    lane roll made static) must be bit-identical to predict_plane for
    in-bounds MVs, all four half-pel phases."""
    import jax.numpy as jnp

    from espflix_tpu.ops import mocomp as MC
    from espflix_tpu.ops.mocomp_pallas import (
        predict_chroma_pair_packedp, predict_plane_phase2p)

    rng = np.random.default_rng(14)
    for (N, H, W, S) in ((2, 64, 128, 16),
                         (1, 192, 352, 16)):  # WP=384: narrowed roll
        mbh, mbw = H // S, W // S
        ref = jnp.asarray(rng.integers(0, 249, (N, H, W),
                                       dtype=np.uint8))
        bx = np.arange(mbw)[None, None, :] * S
        by = np.arange(mbh)[None, :, None] * S
        mh = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                     -2 * bx, 2 * (W - S - bx) - 1).astype(np.int32)
        mv = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                     -2 * by, 2 * (H - S - by) - 1).astype(np.int32)
        want = np.asarray(MC.predict_plane(
            ref, jnp.asarray(mh), jnp.asarray(mv), S))
        got = np.asarray(predict_plane_phase2p(
            ref, jnp.asarray(mh), jnp.asarray(mv), S, interpret=INTERP))
        assert np.array_equal(got, want), ("phase2p", N, H, W, S)

    # dual chroma at the production geometry (96x176, S=8)
    N, H, W, S = 2, 96, 176, 8
    mbh, mbw = 12, 22
    ru = jnp.asarray(rng.integers(0, 249, (N, H, W), dtype=np.uint8))
    rv = jnp.asarray(rng.integers(0, 249, (N, H, W), dtype=np.uint8))
    bx = np.arange(mbw)[None, None, :] * S
    by = np.arange(mbh)[None, :, None] * S
    mh = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                 -2 * bx, 2 * (W - S - bx) - 1).astype(np.int32)
    mv = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                 -2 * by, 2 * (H - S - by) - 1).astype(np.int32)
    wu = np.asarray(MC.predict_plane(ru, jnp.asarray(mh),
                                     jnp.asarray(mv), S))
    wv = np.asarray(MC.predict_plane(rv, jnp.asarray(mh),
                                     jnp.asarray(mv), S))
    for accum in (False, True):   # accum: row-accumulated stores
        gu, gv = predict_chroma_pair_packedp(
            ru, rv, jnp.asarray(mh), jnp.asarray(mv),
            interpret=INTERP, accum=accum)
        assert np.array_equal(np.asarray(gu), wu), ("packedp", accum)
        assert np.array_equal(np.asarray(gv), wv), ("packedp", accum)


def test_rowquad_phase_mocomp_matches_reference():
    """predict_plane_phase4 (row-quad packed phase stack: rows r,
    r+4, r+8, r+12 as the four bytes of one int32 lane, quartering
    the per-visit dynamic lane roll; banded 8-row stores) must be
    bit-identical to predict_plane for in-bounds MVs."""
    import jax.numpy as jnp

    from espflix_tpu.ops import mocomp as MC
    from espflix_tpu.ops.mocomp_pallas import predict_plane_phase4

    rng = np.random.default_rng(10)
    for (N, H, W, S) in ((2, 64, 128, 16),
                         (1, 192, 352, 16)):  # WP=384: narrowed roll
        mbh, mbw = H // S, W // S
        ref = jnp.asarray(rng.integers(0, 249, (N, H, W),
                                       dtype=np.uint8))
        bx = np.arange(mbw)[None, None, :] * S
        by = np.arange(mbh)[None, :, None] * S
        mh = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                     -2 * bx, 2 * (W - S - bx) - 1).astype(np.int32)
        mv = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                     -2 * by, 2 * (H - S - by) - 1).astype(np.int32)
        want = np.asarray(MC.predict_plane(
            ref, jnp.asarray(mh), jnp.asarray(mv), S))
        got = np.asarray(predict_plane_phase4(
            ref, jnp.asarray(mh), jnp.asarray(mv), S, interpret=INTERP))
        assert np.array_equal(got, want), ("phase4", N, H, W, S)


@pytest.mark.parametrize("variant", ["phase", "hybrid", "hybrid2",
                                     "hybrid4", "packed"])
def test_dense_compose_phase_variant_bit_exact(variant):
    """dense_compose with the Pallas mocomp variants ('phase' stack,
    the measured-default 'hybrid' phase-luma+packed-chroma split, and
    the all-'packed' SWAR form) equals the XLA path on a real decoded
    batch."""
    import jax.numpy as jnp

    from espflix_tpu.models import mpeg1 as M
    from espflix_tpu.ops import vlc_scan
    from espflix_tpu.tools import mpeg1_encode as E

    rng = np.random.default_rng(11)
    sc = E.random_script(rng, n_pictures=2, width=96, height=64)
    seq, pics = M.parse_es(E.encode_es(sc))
    mbw, mbh = seq.mb_width, seq.mb_height
    wpl = max((len(p.payload) + 3) // 4 + 4 for p in pics)
    N = 2
    fr_a = M.init_frame_state(N, mbw * 16, mbh * 16)
    fr_b = M.init_frame_state(N, mbw * 16, mbh * 16)
    for pic in pics:
        b = M.make_picture_batch([pic] * N, words_per_lane=wpl,
                                 max_slices=mbh)
        st0 = vlc_scan.initial_state(
            N, jnp.asarray(b["slice_starts"]),
            jnp.asarray(b["slice_rows"]), jnp.asarray(b["n_slices"]),
            jnp.asarray(b["pic_type"]), jnp.asarray(b["full_pel"]),
            jnp.asarray(b["r_size"]))
        coeffs, recs, nfinal, st, _ = vlc_scan.run_scan(
            jnp.asarray(b["words"]), st0, mbw, mbw * mbh, wpl * 32)
        args = (coeffs, recs, nfinal, jnp.asarray(b["intra_q"]),
                jnp.asarray(b["non_intra_q"]), jnp.asarray(b["active"]))
        fr_a, pa = M.dense_compose(*args, fr_a, mb_width=mbw,
                                   mb_height=mbh,
                                   use_pallas_mocomp=False)
        fr_b, pb = M.dense_compose(*args, fr_b, mb_width=mbw,
                                   mb_height=mbh,
                                   use_pallas_mocomp=variant)
        for k in ("y", "u", "v"):
            assert np.array_equal(np.asarray(pa[k]),
                                  np.asarray(pb[k])), k


def test_packed_swar_mocomp_matches_reference():
    """predict_plane_packed + predict_chroma_pair_packed (packed SWAR
    phase stack: 4 px/uint32 word, 8 pre-shifted sublane copies, byte
    funnel per visit) must be bit-identical to predict_plane for
    in-bounds MVs, all four half-pel phases, both plane sizes."""
    import jax.numpy as jnp

    from espflix_tpu.ops import mocomp as MC
    from espflix_tpu.ops.mocomp_pallas import (
        predict_chroma_pair_packed, predict_plane_packed)

    rng = np.random.default_rng(8)
    geoms = ((2, 64, 128, 16), (2, 32, 64, 8))
    if not INTERP:
        geoms += ((2, 192, 352, 16),)
    for (N, H, W, S) in geoms:
        mbh, mbw = H // S, W // S
        ref = jnp.asarray(rng.integers(0, 256, (N, H, W),
                                       dtype=np.uint8))
        bx = np.arange(mbw)[None, None, :] * S
        by = np.arange(mbh)[None, :, None] * S
        mh = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                     -2 * bx, 2 * (W - S - bx) - 1).astype(np.int32)
        mv = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                     -2 * by, 2 * (H - S - by) - 1).astype(np.int32)
        want = np.asarray(MC.predict_plane(
            ref, jnp.asarray(mh), jnp.asarray(mv), S))
        got = np.asarray(predict_plane_packed(
            ref, jnp.asarray(mh), jnp.asarray(mv), S, interpret=INTERP))
        assert np.array_equal(got, want), ("packed", N, H, W, S)
        # packed4 form: 4-phase stack + per-visit sublane roll
        got4 = np.asarray(predict_plane_packed(
            ref, jnp.asarray(mh), jnp.asarray(mv), S, interpret=INTERP,
            preshift=False))
        assert np.array_equal(got4, want), ("packed4", N, H, W, S)

    # dual chroma pack at the production geometry (96x176, S=8)
    N, H, W, S = 1, 96, 176, 8
    mbh, mbw = 12, 22
    ru = jnp.asarray(rng.integers(0, 256, (N, H, W), dtype=np.uint8))
    rv = jnp.asarray(rng.integers(0, 256, (N, H, W), dtype=np.uint8))
    bx = np.arange(mbw)[None, None, :] * S
    by = np.arange(mbh)[None, :, None] * S
    mh = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                 -2 * bx, 2 * (W - S - bx) - 1).astype(np.int32)
    mv = np.clip(rng.integers(-2 * S, 2 * S + 1, (N, mbh, mbw)),
                 -2 * by, 2 * (H - S - by) - 1).astype(np.int32)
    wu = np.asarray(MC.predict_plane(ru, jnp.asarray(mh),
                                     jnp.asarray(mv), S))
    wv = np.asarray(MC.predict_plane(rv, jnp.asarray(mh),
                                     jnp.asarray(mv), S))
    for preshift in (True, False):
        gu, gv = predict_chroma_pair_packed(
            ru, rv, jnp.asarray(mh), jnp.asarray(mv), interpret=INTERP,
            preshift=preshift)
        assert np.array_equal(np.asarray(gu), wu), ("dual", preshift)
        assert np.array_equal(np.asarray(gv), wv), ("dual", preshift)

"""Pallas scan kernels vs the XLA scanner: structural bit-exactness.

Interpreter mode on CPU (the kernels also run verified bit-exact on a
real v5e -- docs/PERF.md); both forms share make_scan_step with the
XLA scanner, so these tests guard the kernel-specific plumbing: the
row layout, the windowed slice packing, grid grouping, the chunked
emission DMA and the grouped scatter.
"""

import os

import numpy as np

# compiled Mosaic on real hardware when ESPFLIX_TEST_TPU=1 (the
# recorded per-round TPU suite run); interpret mode on the CPU mesh
INTERP = not bool(os.environ.get("ESPFLIX_TEST_TPU"))
import jax.numpy as jnp
import pytest

from espflix_tpu.models import mpeg1 as M
from espflix_tpu.ops import vlc_scan
from espflix_tpu.ops import vlc_scan_pallas as VP
from espflix_tpu.tools import mpeg1_encode as E
from espflix_tpu.tools.content import realistic_gop_script


def batch_for(pic, n=128, wpl=None, mbh=None):
    seq = pic.seq
    wpl = wpl or (len(pic.payload) + 3) // 4 + 4
    return M.make_picture_batch([pic] * n, words_per_lane=wpl,
                                max_slices=mbh or seq.mb_height)


def xla_scan(b, mbw, mbh, max_steps):
    args = tuple(jnp.asarray(b[k]) for k in (
        "words", "slice_starts", "slice_rows", "n_slices", "pic_type",
        "full_pel", "r_size"))
    st0 = vlc_scan.initial_state(args[0].shape[0], *args[1:])
    return vlc_scan.run_scan(args[0], st0, mbw, mbw * mbh, max_steps)


def sliced_scan(b, mbw, mbh, max_steps, block_rows=512):
    sl = VP.pack_slice_rows(b)
    assert not sl["overflow"].any()
    return VP.run_scan_pallas_sliced(
        *[jnp.asarray(sl[k]) for k in (
            "words", "start_bits", "rows", "alive", "pic_type",
            "full_pel", "r_size")],
        mb_width=mbw, mb_count=mbw * mbh, max_steps=max_steps,
        out_groups=sl["out_groups"], block_rows=block_rows,
        interpret=INTERP)


def assert_matches(b, mbw, mbh, max_steps=768, block_rows=512):
    w = xla_scan(b, mbw, mbh, max_steps * mbh)
    o = sliced_scan(b, mbw, mbh, max_steps, block_rows)
    for name, x, y in zip(("coeffs", "recs", "nfinal"), o[:3], w[:3]):
        assert np.array_equal(np.asarray(x), np.asarray(y)), name
    err_x = np.asarray(w[3]["error"]) | (
        np.asarray(w[3]["state"]) != vlc_scan.ST_DONE)
    assert np.array_equal(np.asarray(o[3]), err_x)


@pytest.mark.parametrize("seed", [5, 17])
def test_sliced_matches_xla_small(seed):
    rng = np.random.default_rng(seed)
    sc = E.random_script(rng, n_pictures=2, max_coeffs=10,
                         width=96, height=64)
    seq, pics = M.parse_es(E.encode_es(sc))
    for pic in pics:
        assert_matches(batch_for(pic, n=128), seq.mb_width,
                       seq.mb_height)


def test_sliced_matches_xla_realistic_i_and_p():
    rng = np.random.default_rng(1000)
    seq, pics = (lambda es: M.parse_es(es))(
        E.encode_es(realistic_gop_script(rng, n_pictures=3)))
    for pic in pics[:2]:      # I then P, full 352x192
        assert_matches(batch_for(pic, n=128), seq.mb_width,
                       seq.mb_height, max_steps=1024, block_rows=256)


def test_whole_payload_kernel_matches():
    rng = np.random.default_rng(9)
    sc = E.random_script(rng, n_pictures=1, max_coeffs=10,
                         width=96, height=64)
    seq, pics = M.parse_es(E.encode_es(sc))
    b = batch_for(pics[0], n=128)
    mbw, mbh = seq.mb_width, seq.mb_height
    wpl = b["words"].shape[1]
    w = xla_scan(b, mbw, mbh, wpl * 32)
    args = tuple(jnp.asarray(b[k]) for k in (
        "words", "slice_starts", "slice_rows", "n_slices", "pic_type",
        "full_pel", "r_size"))
    st0 = vlc_scan.initial_state(128, *args[1:])
    o = VP.run_scan_pallas(args[0], st0, mbw, mbw * mbh, wpl * 32,
                           interpret=INTERP)
    for name, x, y in zip(("coeffs", "recs", "nfinal"), o[:3], w[:3]):
        assert np.array_equal(np.asarray(x), np.asarray(y)), name


def test_pack_slice_rows_overflow_flags_lane():
    """A single-slice picture spanning the whole payload overflows a
    small window: the lane is flagged, not silently truncated."""
    rng = np.random.default_rng(3)
    sc = E.random_script(rng, n_pictures=1, max_coeffs=20,
                         width=96, height=64)
    seq, pics = M.parse_es(E.encode_es(sc))
    b = batch_for(pics[0], n=4)
    sl = VP.pack_slice_rows(b, words_window=8)
    assert sl["overflow"].all()
    assert sl["alive"].sum() == 0


def test_sorted_rows_match_xla():
    """Span-sorted row order + flat lane_of_row scatter: identical
    outputs to the XLA scanner."""
    rng = np.random.default_rng(1000)
    seq, pics = M.parse_es(
        E.encode_es(realistic_gop_script(rng, n_pictures=2)))
    mbw, mbh = seq.mb_width, seq.mb_height
    for pic in pics[:2]:
        b = batch_for(pic, n=64)
        sl = VP.pack_slice_rows(b, sort_rows=True)
        assert not sl["overflow"].any()
        # rows really are span-sorted (alive rows first, then dead)
        alive = sl["alive"]
        assert alive[: alive.sum()].all()
        o = VP.run_scan_pallas_sorted(
            *[jnp.asarray(sl[k]) for k in (
                "words", "start_bits", "rows", "alive", "pic_type",
                "full_pel", "r_size", "lane_of_row")],
            mb_width=mbw, mb_count=mbw * mbh, max_steps=1024,
            n_lanes=64, block_rows=256, interpret=INTERP)
        w = xla_scan(b, mbw, mbh, 1024 * mbh)
        for name, x, y in zip(("coeffs", "recs", "nfinal"),
                              o[:3], w[:3]):
            assert np.array_equal(np.asarray(x), np.asarray(y)), name


def test_bucketed_dense_matmul_matches_xla():
    """Matmul scatter (ops/scan_dense.py): the two-budget scan with
    one-hot MXU contractions + permutation gather reproduces the XLA
    scanner's dense buffers bit-exactly on a mixed I/P batch."""
    from espflix_tpu.ops import scan_dense as SD
    rng = np.random.default_rng(1000)
    seq, pics = M.parse_es(
        E.encode_es(realistic_gop_script(rng, n_pictures=4)))
    mbw, mbh = seq.mb_width, seq.mb_height
    n = 32
    batch_pics = [pics[i % len(pics)] for i in range(n)]
    wpl = max((len(p.payload) + 3) // 4 + 4 for p in pics)
    b = M.make_picture_batch(batch_pics, words_per_lane=wpl,
                             max_slices=mbh)
    sl = VP.pack_slice_rows(b, sort_rows=True)
    assert not sl["overflow"].any()
    perm, dup = SD.row_perm(sl["lane_of_row"], sl["rows"],
                            sl["alive"], n, mbh)
    assert not dup.any()
    o = VP.run_scan_pallas_bucketed_dense(
        *[jnp.asarray(sl[k]) for k in (
            "words", "start_bits", "rows", "alive", "pic_type",
            "full_pel", "r_size", "lane_of_row")],
        jnp.asarray(perm), mb_width=mbw, mb_height=mbh, n_lanes=n,
        long_rows=128, steps_long=1024, steps_short=384,
        block_rows=256, interpret=INTERP)
    w = xla_scan(b, mbw, mbh, 1024 * mbh)
    for name, x, y in zip(("coeffs", "recs", "nfinal"), o[:3], w[:3]):
        assert np.array_equal(np.asarray(x), np.asarray(y)), name
    assert not np.asarray(o[3]).any()


def test_decode_sliced_matmul_scatter_planes_match():
    """decode_picture_batch_sliced(scatter='matmul') produces the same
    presented planes as the serial-scatter path over a short GOP."""
    rng = np.random.default_rng(41)
    seq, pics = M.parse_es(
        E.encode_es(realistic_gop_script(rng, n_pictures=3)))
    mbw, mbh = seq.mb_width, seq.mb_height
    n = 32
    wpl = max((len(p.payload) + 3) // 4 + 4 for p in pics)
    outs = {}
    for mode in ("serial", "matmul"):
        frames = M.init_frame_state(n, mbw * 16, mbh * 16)
        pres = []
        for p in pics:
            b = M.make_picture_batch([p] * n, words_per_lane=wpl,
                                     max_slices=mbh)
            frames, pr, info = M.decode_picture_batch_sliced(
                b, frames, mb_width=mbw, mb_height=mbh,
                max_steps=1024, steps_short=384, block_rows=256,
                scatter=mode, interpret=INTERP)
            assert not np.asarray(info["error"]).any()
            pres.append({k: np.asarray(v) for k, v in pr.items()})
        outs[mode] = pres
    for a, bq in zip(outs["serial"], outs["matmul"]):
        for k in ("y", "u", "v"):
            assert np.array_equal(a[k], bq[k]), k


def test_transposed_dense_pipeline_matches():
    """The transposed orientation (positions on sublanes: scatter dot
    emits [R, 64, TC], dequant+IDCT via block_residuals_T, transposed
    plane assembly) produces identical presented planes to the flat
    path over an I+P GOP."""
    from espflix_tpu.models.mpeg1 import dense_compose
    from espflix_tpu.ops import scan_dense as SD

    rng = np.random.default_rng(1000)
    seq, pics = M.parse_es(
        E.encode_es(realistic_gop_script(rng, n_pictures=3)))
    mbw, mbh = seq.mb_width, seq.mb_height
    n = 16
    wpl = max((len(p.payload) + 3) // 4 + 4 for p in pics)
    fr_a = M.init_frame_state(n, mbw * 16, mbh * 16)
    fr_b = M.init_frame_state(n, mbw * 16, mbh * 16)
    for p in pics:
        b = M.make_picture_batch([p] * n, words_per_lane=wpl,
                                 max_slices=mbh)
        sl = VP.pack_slice_rows(b, sort_rows=True)
        perm, dup = SD.row_perm(sl["lane_of_row"], sl["rows"],
                                sl["alive"], n, mbh)
        assert not dup.any()
        args = [jnp.asarray(sl[k]) for k in (
            "words", "start_bits", "rows", "alive", "pic_type",
            "full_pel", "r_size", "lane_of_row")] + [jnp.asarray(perm)]
        kw = dict(mb_width=mbw, mb_height=mbh, n_lanes=n,
                  long_rows=64, steps_long=1024, steps_short=1024,
                  block_rows=256, interpret=INTERP)
        c, r, nf, err, _ = VP.run_scan_pallas_bucketed_dense(
            *args, **kw)
        cT, rT, nfT, errT, _ = VP.run_scan_pallas_bucketed_dense(
            *args, transposed=True, **kw)
        assert np.array_equal(np.asarray(r), np.asarray(rT))
        assert np.array_equal(np.asarray(nf), np.asarray(nfT))
        iq = jnp.asarray(b["intra_q"])
        nq = jnp.asarray(b["non_intra_q"])
        act = jnp.asarray(b["active"])
        fr_a, pa = dense_compose(c, r, nf, iq, nq, act, fr_a,
                                 mb_width=mbw, mb_height=mbh)
        fr_b, pb = dense_compose(None, rT, nfT, iq, nq, act, fr_b,
                                 mb_width=mbw, mb_height=mbh,
                                 coeffs_T=cT)
        for k in ("y", "u", "v"):
            assert np.array_equal(np.asarray(pa[k]),
                                  np.asarray(pb[k])), k

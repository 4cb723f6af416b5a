"""Hybrid pipeline (native tokenizer + device dense) bit-exactness."""

import numpy as np
import pytest

from espflix_tpu.core.refdec import Mpeg1Decoder
from espflix_tpu.models import mpeg1 as M
from espflix_tpu.tools import mpeg1_encode as E
from espflix_tpu.tools import oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="oracle lib not buildable")


def test_hybrid_bit_exact_multilane():
    streams = [E.encode_es(E.random_script(
        np.random.default_rng(s), n_pictures=3, width=96, height=64))
        for s in (11, 12, 13)]
    parsed = [M.parse_es(s) for s in streams]
    seq = parsed[0][0]
    N = len(streams)
    frames = M.init_frame_state(N, seq.mb_width * 16, seq.mb_height * 16)
    outs = [[] for _ in range(N)]
    for k in range(3):
        pics = [p[k] for _, p in parsed]
        iq = np.stack([p.seq.intra_q for p in pics])
        nq = np.stack([p.seq.non_intra_q for p in pics])
        frames, pres, info = M.decode_picture_batch_hybrid(
            pics, iq, nq, frames, mb_width=seq.mb_width,
            mb_height=seq.mb_height)
        assert not np.asarray(info["error"]).any()
        for i in range(N):
            outs[i].append((np.asarray(pres["y"][i]),
                            np.asarray(pres["u"][i]),
                            np.asarray(pres["v"][i])))
    for i in range(N):
        ref = Mpeg1Decoder().decode_es(streams[i])
        for rf, (gy, gu, gv) in zip(ref, outs[i]):
            assert np.array_equal(rf.y, gy)
            assert np.array_equal(rf.u, gu)
            assert np.array_equal(rf.v, gv)


def test_tokenizer_matches_device_scan():
    import jax.numpy as jnp

    from espflix_tpu.ops import vlc_scan

    sc = E.random_script(np.random.default_rng(21), n_pictures=2,
                         width=96, height=64)
    seq, pics = M.parse_es(E.encode_es(sc))
    mbw, mbh = seq.mb_width, seq.mb_height
    b = M.make_picture_batch([pics[0]], max_slices=mbh)
    st0 = vlc_scan.initial_state(
        1, jnp.asarray(b["slice_starts"]), jnp.asarray(b["slice_rows"]),
        jnp.asarray(b["n_slices"]), jnp.asarray(b["pic_type"]),
        jnp.asarray(b["full_pel"]), jnp.asarray(b["r_size"]))
    c_d, r_d, nf_d, st, iters = vlc_scan.run_scan(
        jnp.asarray(b["words"]), st0, mbw, mbw * mbh,
        b["words"].shape[1] * 32)
    c_n, r_n, nf_n, act, err = M.tokenize_batch_native([pics[0]], mbw, mbh)
    assert not err.any() and not np.asarray(st["error"]).any()
    assert np.array_equal(np.asarray(c_d), c_n)
    assert np.array_equal(np.asarray(r_d), r_n)
    assert np.array_equal(np.asarray(nf_d), nf_n)

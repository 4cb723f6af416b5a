"""Multi-chip sharding: shard_map decode over the virtual 8-device mesh.

The conftest forces an 8-device CPU platform; the sharded decoder must
produce bit-identical frames to the single-shard path (lane-local
machinery only, SURVEY.md 2.3), and metric reduction must cross shards.
"""

import numpy as np
import jax
import jax.numpy as jnp

from espflix_tpu.models import mpeg1 as M
from espflix_tpu.parallel import mesh as PM
from espflix_tpu.tools import mpeg1_encode as E


def test_sharded_decode_matches_single_shard():
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(5)
    sc = E.random_script(rng, n_pictures=2, max_coeffs=8,
                         width=96, height=64)
    es = E.encode_es(sc)
    seq, pics = M.parse_es(es)
    mbw, mbh = seq.mb_width, seq.mb_height
    wpl = max((len(p.payload) + 3) // 4 + 4 for p in pics)
    N = 16                               # 2 lanes per device

    mesh = PM.make_mesh()
    dec = PM.make_sharded_decoder(mesh, mb_width=mbw, mb_height=mbh,
                                  max_steps=wpl * 32)

    frames_s = PM.shard_lane_tree(
        mesh, M.init_frame_state(N, mbw * 16, mbh * 16))
    frames_r = M.init_frame_state(N, mbw * 16, mbh * 16)

    for pic in pics:
        b = M.make_picture_batch([pic] * N, words_per_lane=wpl,
                                 max_slices=mbh)
        args = tuple(jnp.asarray(b[k]) for k in (
            "words", "slice_starts", "slice_rows", "n_slices",
            "pic_type", "full_pel", "r_size", "intra_q",
            "non_intra_q", "active"))
        sharded_args = PM.shard_lane_tree(mesh, args)
        frames_s, pres_s, info_s = dec(*sharded_args, frames_s)
        frames_r, pres_r, info_r = M.decode_picture_batch(
            *args, frames_r, mb_width=mbw, mb_height=mbh,
            max_steps=wpl * 32)

        assert np.array_equal(np.asarray(pres_s["y"]),
                              np.asarray(pres_r["y"]))
        assert np.array_equal(np.asarray(pres_s["u"]),
                              np.asarray(pres_r["u"]))
        assert np.array_equal(np.asarray(pres_s["v"]),
                              np.asarray(pres_r["v"]))
        assert not np.asarray(info_s["error"]).any()

        # presented planes really are sharded over the streams axis
        shard_devs = {s.device for s in pres_s["y"].addressable_shards}
        assert len(shard_devs) == 8

    errs, iters = PM.gather_metrics(mesh, info_s["error"],
                                    info_s["iters"])
    assert int(errs) == 0 and int(iters) > 0

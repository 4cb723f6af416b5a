"""Multi-chip sharding: shard_map decode over the virtual 8-device mesh.

The conftest forces an 8-device CPU platform; the sharded decoder must
produce bit-identical frames to the single-shard path (lane-local
machinery only, SURVEY.md 2.3), and metric reduction must cross shards.
"""

import os

import numpy as np
import pytest

# compiled Mosaic on real hardware when ESPFLIX_TEST_TPU=1 (the
# recorded per-round TPU suite run); interpret mode on the CPU mesh
INTERP = not bool(os.environ.get("ESPFLIX_TEST_TPU"))
import jax
import jax.numpy as jnp

from espflix_tpu.models import mpeg1 as M
from espflix_tpu.parallel import mesh as PM
from espflix_tpu.tools import mpeg1_encode as E


def test_sharded_decode_matches_single_shard():
    if len(jax.devices()) < 8:
        # ESPFLIX_TEST_TPU run on the single-chip rig
        pytest.skip("needs 8 devices")
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


def test_space_sharded_dense_bit_exact():
    """TP 'space' axis: the dense phase sharded over (streams=2,
    space=4) -- MB rows split across devices, reference planes
    all-gathered along space -- must produce bit-identical frames and
    presented planes to the unsharded dense_compose."""
    import jax
    import jax.numpy as jnp

    from espflix_tpu.models import mpeg1 as M
    from espflix_tpu.ops import vlc_scan
    from espflix_tpu.parallel import mesh as pmesh
    from espflix_tpu.tools import mpeg1_encode as E

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")

    rng = np.random.default_rng(21)
    W, H = 96, 64                      # mbh=4: one MB row per shard
    lanes = 2
    es = E.encode_es(E.random_script(rng, n_pictures=3, max_coeffs=6,
                                     width=W, height=H))
    seq, pics = M.parse_es(es)
    mbw, mbh = seq.mb_width, seq.mb_height
    wpl = max((len(p.payload) + 3) // 4 + 4 for p in pics)

    mesh = pmesh.make_space_mesh(2, 4)
    sharded = pmesh.make_space_sharded_dense(
        mesh, mb_width=mbw, mb_height=mbh)

    frames_a = M.init_frame_state(lanes, W, H)
    frames_b = M.init_frame_state(lanes, W, H)
    for p in pics:
        b = M.make_picture_batch([p] * lanes, words_per_lane=wpl,
                                 max_slices=mbh)
        st0 = vlc_scan.initial_state(
            lanes, jnp.asarray(b["slice_starts"]),
            jnp.asarray(b["slice_rows"]), jnp.asarray(b["n_slices"]),
            jnp.asarray(b["pic_type"]), jnp.asarray(b["full_pel"]),
            jnp.asarray(b["r_size"]))
        coeffs, recs, nfinal, st, _ = vlc_scan.run_scan(
            jnp.asarray(b["words"]), st0, mbw, mbw * mbh, 4096)
        assert not np.asarray(st["error"]).any()
        act = jnp.asarray(b["active"])
        iq = jnp.asarray(b["intra_q"])
        nq = jnp.asarray(b["non_intra_q"])

        frames_a, pres_a = M.dense_compose(
            coeffs, recs, nfinal, iq, nq, act, frames_a,
            mb_width=mbw, mb_height=mbh, use_pallas_mocomp=False)

        c3 = coeffs.reshape(lanes, mbh, mbw * 384)
        r3 = recs.reshape(lanes, mbh, mbw)
        n3 = nfinal.reshape(lanes, mbh, mbw * 6)
        frames_b, pres_b = sharded(c3, r3, n3, iq, nq, act, frames_b)

        for k in ("y", "u", "v"):
            assert np.array_equal(np.asarray(pres_a[k]),
                                  np.asarray(pres_b[k])), k
            assert np.array_equal(np.asarray(frames_a[k]),
                                  np.asarray(frames_b[k])), k
        assert np.array_equal(np.asarray(frames_a["parity"]),
                              np.asarray(frames_b["parity"]))


def test_sharded_pallas_decoder_matches_xla():
    """The production parser under the mesh: shard_map'ed Pallas
    bucketed scan + matmul scatter + dense phase over 8 virtual
    devices, bit-exact vs the unsharded XLA decode (zero data-path
    ICI; per-shard span sorting keeps every row shard-local)."""
    if len(jax.devices()) < 8:
        # ESPFLIX_TEST_TPU run on the single-chip rig
        pytest.skip("needs 8 devices")
    from espflix_tpu.ops import scan_dense as SD
    from espflix_tpu.tools.content import realistic_gop_script

    rng = np.random.default_rng(1000)
    seq, pics = M.parse_es(
        E.encode_es(realistic_gop_script(rng, n_pictures=3)))
    mbw, mbh = seq.mb_width, seq.mb_height
    wpl = max((len(p.payload) + 3) // 4 + 4 for p in pics)
    N = 16
    mesh = PM.make_mesh()
    n_sh = mesh.shape["streams"]
    ln = N // n_sh
    dec = PM.make_sharded_pallas_decoder(
        mesh, mb_width=mbw, mb_height=mbh,
        long_rows=max(8, min(2 * ln, ln * mbh // 2)),
        steps_long=1024, steps_short=1024, interpret=INTERP)

    frames_s = PM.shard_lane_tree(
        mesh, M.init_frame_state(N, mbw * 16, mbh * 16))
    frames_r = M.init_frame_state(N, mbw * 16, mbh * 16)
    for pic in pics[:2]:
        b = M.make_picture_batch([pic] * N, words_per_lane=wpl,
                                 max_slices=mbh)
        sl, dup = SD.pack_slice_rows_sharded(b, n_sh, mbh)
        assert not dup.any() and not sl["overflow"].any()
        row_args = tuple(jnp.asarray(sl[k]) for k in (
            "words", "start_bits", "rows", "alive", "pic_type",
            "full_pel", "r_size", "lane_of_row", "perm"))
        lane_args = tuple(jnp.asarray(b[k]) for k in (
            "intra_q", "non_intra_q", "active"))
        args = PM.shard_lane_tree(mesh, row_args + lane_args)
        frames_s, pres_s, info_s = dec(*args, frames_s)
        frames_r, pres_r, _ = M.decode_picture_batch(
            *[jnp.asarray(b[k]) for k in (
                "words", "slice_starts", "slice_rows", "n_slices",
                "pic_type", "full_pel", "r_size", "intra_q",
                "non_intra_q", "active")],
            frames_r, mb_width=mbw, mb_height=mbh,
            max_steps=wpl * 32)
        assert not np.asarray(info_s["error"]).any()
        for k in ("y", "u", "v"):
            assert np.array_equal(np.asarray(pres_s[k]),
                                  np.asarray(pres_r[k])), k
        shard_devs = {s.device for s in pres_s["y"].addressable_shards}
        assert len(shard_devs) == 8


def test_full_chain_under_mesh_matches_single():
    """Fleet.run_chunk_full under the 'streams' mesh: the COMPLETE
    fused chain (decode + composite field pair + SBC + PDM, one
    dispatch per chunk) shard_map'ed over 8 virtual devices, with
    per-lane checksums and the masked-psum tap gather identical to the
    single-device fleet on the same service (the reference's loop is
    one system regardless of scale, espflix.cpp:886-1010)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from espflix_tpu.runtime.player import PlayerSession
    from espflix_tpu.runtime.scheduler import Fleet
    from espflix_tpu.tools.indexer import make_service
    from espflix_tpu.tools.sbc_encode import random_frame
    import tempfile

    with tempfile.TemporaryDirectory() as svc:
        arng = np.random.default_rng(5)
        audio = [(random_frame(arng, mode=0, bitpool=28), k * 240)
                 for k in range(200)]
        # the composite synthesizer is geometry-pinned to 352x192, so
        # the fused chain can only run at the production geometry;
        # keep lanes/ticks minimal (interpret mode is CPU-cost-linear
        # in lane-ticks)
        make_service(svc, ["one"], seed=5, n_gops=2, gop=3,
                     audio_frames=audio)

        def build(mesh):
            n = 8
            fleet = Fleet(n, words_per_lane=8192, parser="pallas",
                          output=True, mesh=mesh)
            for i in range(n):
                s = PlayerSession("file://" + svc)
                assert s.init_service()
                s.nav(0)
                s.play_pause()
                fleet.attach(i, s)
            return fleet

        ref = build(None)
        r_ref = ref.run_chunk_full(2, tap_lanes=(1,))
        mesh = PM.make_mesh()
        f = build(mesh)
        r_mesh = f.run_chunk_full(2, tap_lanes=(1,))

        for a, b in zip(r_ref, r_mesh):
            assert np.array_equal(a.field_sum, b.field_sum)
            assert np.array_equal(a.pdm_sum, b.pdm_sum)
            assert np.array_equal(a.errors, b.errors)
            assert np.array_equal(np.asarray(a.tap_fields),
                                  np.asarray(b.tap_fields))
            assert np.array_equal(np.asarray(a.tap_pdm),
                                  np.asarray(b.tap_pdm))
            for k in ("y", "u", "v"):
                assert np.array_equal(np.asarray(getattr(a, k)),
                                      np.asarray(getattr(b, k)))
        # the carries really live on all 8 devices
        devs = {s.device for s in f.frames["y"].addressable_shards}
        assert len(devs) == 8

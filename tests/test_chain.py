"""Full-path device chain (runtime/chain.py + Fleet.run_chunk_full):
decode -> composite fields -> SBC -> delta-sigma PDM in one dispatch,
driven by real sessions -- the product form of the reference's always-
on loop (video.cpp:1122-1198, espflix.ino:123-145)."""

import numpy as np
import pytest

from espflix_tpu.ops import composite as CO
from espflix_tpu.ops import delta_sigma as DS
from espflix_tpu.runtime.player import PlayerSession
from espflix_tpu.runtime.scheduler import Fleet
from espflix_tpu.tools.indexer import make_service
from espflix_tpu.tools.sbc_encode import random_frame


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("svc"))
    rng = np.random.default_rng(5)
    audio = [(random_frame(rng, mode=0, bitpool=28), k * 240)
             for k in range(200)]
    make_service(d, ["one"], seed=5, n_gops=3, gop=4,
                 audio_frames=audio)
    return d


def _fleet(service, n=2):
    fleet = Fleet(n, words_per_lane=8192, parser="pallas",
                  output=True)
    for i in range(n):
        s = PlayerSession("file://" + service)
        assert s.init_service()
        s.nav(0)
        s.play_pause()
        fleet.attach(i, s)
    return fleet


def test_run_chunk_full_fields_and_pdm(service):
    fleet = _fleet(service, n=2)
    results = fleet.run_chunk_full(4, tap_lanes=(0,))
    assert len(results) == 4
    S = fleet.audio_F * 128
    saw_video = saw_audio = False
    for t, r in enumerate(results):
        assert r.field_sum is not None and r.pdm_sum is not None
        if r.video_lanes[0]:
            saw_video = True
            # tapped fields == direct synthesis of the presented
            # planes under this tick's (default) OSD state
            y = np.asarray(r.y)[0:1]
            u = np.asarray(r.u)[0:1]
            v = np.asarray(r.v)[0:1]
            z = np.zeros(1, np.int32)
            exp = np.asarray(CO.synthesize_field_pair(
                y, u, v, z, np.zeros((1, 16, 80), np.uint8), z, z,
                pal=False))
            assert np.array_equal(r.tap_fields[0], exp[0])
            assert r.field_sum[0] == exp.astype(np.int64).sum()
        if r.audio_lanes[0]:
            saw_audio = True
            # live audio modulates real PDM, not the silence pattern
            assert not (np.asarray(r.tap_pdm[0]) ==
                        DS.SILENCE_WORD).all()
            assert r.tap_pdm[0].shape == (2 * S,)
    assert saw_video and saw_audio


def test_run_chunk_full_silence_for_idle_lane(service):
    """A lane with no session emits the literal 0xAAAA PDM silence
    with its modulator state untouched (video.cpp:997-1001)."""
    fleet = Fleet(2, words_per_lane=8192, parser="pallas",
                  output=True)
    s = PlayerSession("file://" + service)
    assert s.init_service()
    s.nav(0)
    s.play_pause()
    fleet.attach(0, s)          # lane 1 stays empty
    st_before = np.asarray(fleet.output.pdm_state)[1].copy()
    results = fleet.run_chunk_full(2, tap_lanes=(1,))
    for r in results:
        assert (np.asarray(r.tap_pdm[0]) == DS.SILENCE_WORD).all()
    assert np.array_equal(np.asarray(fleet.output.pdm_state)[1],
                          st_before)


def test_run_chunk_full_beep_overrides_pcm(service):
    """A queued beep plays the key-feedback sine for its 5 frames
    (espflix.ino:109-145): the PDM differs from the no-beep run."""
    f1 = _fleet(service, n=1)
    f2 = _fleet(service, n=1)
    f2.output.beep(0)
    r1 = f1.run_chunk_full(1, tap_lanes=(0,))[0]
    r2 = f2.run_chunk_full(1, tap_lanes=(0,))[0]
    assert not np.array_equal(np.asarray(r1.tap_pdm[0]),
                              np.asarray(r2.tap_pdm[0]))
    # beep consumed within the tick (5 frames < audio_F)
    assert f2.output.beep_frames[0] == 0


def test_run_chunk_full_two_frame_sizes(tmp_path):
    """Two titles at DIFFERENT SBC bitrates (bitpool 28 vs 60 =>
    different frame sizes) both play audio through the fused chain in
    one chunk: frame-size diversity batches (SBC headers are
    self-describing, models/sbc.py), matching the reference's
    decode-whatever-arrives audio thread (video.cpp:964-987)."""
    rng = np.random.default_rng(7)
    svcs = []
    for k, bp in enumerate((28, 60)):
        d = str(tmp_path / f"svc{bp}")
        audio = [(random_frame(rng, mode=0, bitpool=bp), j * 240)
                 for j in range(200)]
        make_service(d, ["one"], seed=5, n_gops=3, gop=4,
                     audio_frames=audio)
        svcs.append(d)
    fleet = Fleet(2, words_per_lane=8192, parser="pallas",
                  output=True)
    for i, d in enumerate(svcs):
        s = PlayerSession("file://" + d)
        assert s.init_service()
        s.nav(0)
        s.play_pause()
        fleet.attach(i, s)
    results = fleet.run_chunk_full(3, tap_lanes=(0, 1))
    live = np.zeros(2, bool)
    for r in results:
        for i in range(2):
            if r.audio_lanes[i]:
                live[i] = True
                assert not (np.asarray(r.tap_pdm[i]) ==
                            DS.SILENCE_WORD).all()
    assert live.all(), "both frame-size groups must play"
    from espflix_tpu.runtime.events import Ev
    assert not [e for e in fleet.events.ring
                if e.ev == Ev.AUDIO_OP_POINT]


def test_run_chunk_full_op_point_event(tmp_path, service):
    """A lane whose SBC stream is STEREO in a mono-grouped fleet is
    observably silent: Ev.AUDIO_OP_POINT fires with channels<<8|blocks
    (the contract for channel/block diversity; frame-size diversity
    plays, see above)."""
    rng = np.random.default_rng(9)
    d = str(tmp_path / "stereo")
    audio = [(random_frame(rng, mode=1, bitpool=40), j * 240)
             for j in range(200)]
    make_service(d, ["one"], seed=5, n_gops=3, gop=4,
                 audio_frames=audio)
    fleet = Fleet(2, words_per_lane=8192, parser="pallas",
                  output=True)
    for i, root in enumerate((service, d)):
        s = PlayerSession("file://" + root)
        assert s.init_service()
        s.nav(0)
        s.play_pause()
        fleet.attach(i, s)
    results = fleet.run_chunk_full(3, tap_lanes=(1,))
    from espflix_tpu.runtime.events import Ev
    evs = [e for e in fleet.events.ring if e.ev == Ev.AUDIO_OP_POINT]
    assert evs and all(e.lane == 1 for e in evs)
    assert evs[0].value == (2 << 8) | 16
    for r in results:
        assert not r.audio_lanes[1]
        assert (np.asarray(r.tap_pdm[0]) == DS.SILENCE_WORD).all()

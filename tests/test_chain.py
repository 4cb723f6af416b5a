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

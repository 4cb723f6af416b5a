"""Fault injection: per-lane error containment + fleet auto-resync.

SURVEY.md 5.3: a corrupt bitstream must poison ONLY its own batch lane
(masked lane state), and the fleet recovers the lane by re-seeking to
the next random-access point.
"""

import numpy as np
import jax.numpy as jnp

from espflix_tpu.core.bitio import BitWriter
from espflix_tpu.core.refdec import Mpeg1Decoder
from espflix_tpu.models import mpeg1 as M
from espflix_tpu.runtime.events import Ev
from espflix_tpu.tools import mpeg1_encode as E


def corrupt_es(width=96, height=64):
    """An I-picture whose first MB hits an invalid MB-type code
    ('00...' matches neither '1' nor '01'): guaranteed decoder error."""
    w = BitWriter()
    w.start_code(0xB3)
    w.put(width, 12); w.put(height, 12); w.put(1, 4); w.put(5, 4)
    w.put(2928, 18); w.put(1, 1); w.put(20, 10)
    w.put(0, 1); w.put(0, 1); w.put(0, 1)
    w.start_code(0x00)
    w.put(0, 10); w.put(1, 3); w.put(0xFFFF, 16); w.put(0, 1)
    w.start_code(0x01)
    w.put(8, 5); w.put(0, 1)
    w.put_str("1")            # addr_inc = 1
    w.put(0, 23)              # invalid MB type, not a start code yet
    w.put(0xFFFF, 16)
    w.align()
    w.start_code(0xB7)
    return w.tobytes()


def test_corrupt_lane_does_not_poison_neighbors():
    rng = np.random.default_rng(11)
    good_es = E.encode_es(E.random_script(rng, n_pictures=1,
                                          max_coeffs=8,
                                          width=96, height=64))
    ref = Mpeg1Decoder().decode_es(good_es)[0]

    seq_g, pics_g = M.parse_es(good_es)
    seq_b, pics_b = M.parse_es(corrupt_es())
    mbw, mbh = seq_g.mb_width, seq_g.mb_height
    wpl = max((len(p.payload) + 3) // 4 + 4
              for p in (pics_g[0], pics_b[0]))

    frames = M.init_frame_state(3, mbw * 16, mbh * 16)
    b = M.make_picture_batch([pics_g[0], pics_b[0], pics_g[0]],
                             words_per_lane=wpl, max_slices=mbh)
    frames, pres, info = M.decode_picture_batch(
        *[jnp.asarray(b[k]) for k in (
            "words", "slice_starts", "slice_rows", "n_slices",
            "pic_type", "full_pel", "r_size", "intra_q",
            "non_intra_q", "active")],
        frames, mb_width=mbw, mb_height=mbh, max_steps=wpl * 32)

    err = np.asarray(info["error"])
    assert err.tolist() == [False, True, False]
    # neighbors bit-exact despite the poisoned middle lane
    for lane in (0, 2):
        assert np.array_equal(np.asarray(pres["y"][lane]), ref.y)
        assert np.array_equal(np.asarray(pres["u"][lane]), ref.u)
        assert np.array_equal(np.asarray(pres["v"][lane]), ref.v)


def test_fleet_logs_error_and_resyncs(tmp_path):
    from espflix_tpu.runtime.player import PlayerSession
    from espflix_tpu.runtime.scheduler import Fleet
    from espflix_tpu.tools.indexer import make_service

    service = str(tmp_path / "svc")
    make_service(service, ["one"], seed=3, n_gops=3, gop=4)
    s = PlayerSession("file://" + service)
    assert s.init_service()
    s.nav(0)
    s.play_pause()

    # after two pictures, inject one corrupted picture payload
    bad = M.parse_es(corrupt_es(width=352, height=192))[1][0]
    orig = s.next_picture
    count = {"n": 0}

    def tampered():
        p = orig()
        count["n"] += 1
        if p is not None and count["n"] == 3:
            bad.pts = p.pts
            return bad
        return p

    s.next_picture = tampered

    fleet = Fleet(1, words_per_lane=8192)
    fleet.attach(0, s)
    for _ in range(30):
        fleet.tick(decode_audio=False)

    names = [e.ev for e in fleet.events.dump(10 ** 6)]
    assert Ev.LANE_ERROR in names, "corrupt picture not flagged"
    assert Ev.LANE_RESYNC in names, "lane did not resync"
    # the lane kept decoding after recovery
    err_at = names.index(Ev.LANE_ERROR)
    assert Ev.DECODE_BATCH in names[err_at:]


def test_geometry_mismatch_flags_and_parks_lane(tmp_path):
    """A lane streaming the wrong geometry into a fleet must not freeze
    silently: LANE_GEOMETRY is logged, errors[i] set, and the lane is
    parked (VERDICT r1 weak #4; the reference prints on every anomaly,
    SURVEY 4.5)."""
    from espflix_tpu.runtime.player import PlayerSession, State
    from espflix_tpu.runtime.scheduler import Fleet
    from espflix_tpu.tools.indexer import make_service

    service = str(tmp_path / "svc")
    make_service(service, ["one"], seed=5, n_gops=2, gop=4)  # 352x192
    s = PlayerSession("file://" + service)
    assert s.init_service()
    s.nav(0)
    s.play_pause()

    fleet = Fleet(1, width=96, height=64, words_per_lane=8192)
    fleet.attach(0, s)
    r = fleet.tick(decode_audio=False)
    assert r.errors[0]
    assert not r.video_lanes[0]
    names = [e.ev for e in fleet.events.dump(10 ** 6)]
    assert Ev.LANE_GEOMETRY in names
    assert s.state == State.STOPPED
    assert "geometry" in s.park_reason


def test_oversize_payload_flags_and_resyncs(tmp_path):
    """An oversize picture is dropped with LANE_OVERSIZE + errors[i] and
    the lane re-seeks rather than freezing (VERDICT r1 weak #4)."""
    from espflix_tpu.runtime.player import PlayerSession
    from espflix_tpu.runtime.scheduler import Fleet
    from espflix_tpu.tools.indexer import make_service

    service = str(tmp_path / "svc")
    make_service(service, ["one"], seed=6, n_gops=3, gop=4)
    s = PlayerSession("file://" + service)
    assert s.init_service()
    s.nav(0)
    s.play_pause()

    # tiny word budget: every picture is oversize
    fleet = Fleet(1, words_per_lane=16)
    fleet.attach(0, s)
    r = fleet.tick(decode_audio=False)
    assert r.errors[0]
    names = [e.ev for e in fleet.events.dump(10 ** 6)]
    assert Ev.LANE_OVERSIZE in names
    assert Ev.LANE_RESYNC in names  # index exists -> re-seek succeeded


def test_starved_audio_lane_gets_pdm_silence(tmp_path):
    """A playing lane that underruns its SBC ring is reported in
    audio_starved and the output stage substitutes the reference's
    0xAAAA PDM silence with the modulator state untouched
    (video.cpp:997-1001)."""
    import jax.numpy as jnp
    from espflix_tpu.ops import delta_sigma as DS
    from espflix_tpu.runtime.output import OutputStage
    from espflix_tpu.runtime.player import PlayerSession
    from espflix_tpu.runtime.scheduler import Fleet
    from espflix_tpu.tools.indexer import make_service

    from espflix_tpu.tools.sbc_encode import random_frame
    rng = np.random.default_rng(7)
    audio = [(random_frame(rng, mode=0, bitpool=28), k * 240)
             for k in range(60)]
    service = str(tmp_path / "svc")
    make_service(service, ["one"], seed=7, n_gops=2, gop=4,
                 audio_frames=audio)
    s = PlayerSession("file://" + service)
    assert s.init_service()
    s.nav(0)
    s.play_pause()
    fleet = Fleet(1, words_per_lane=8192, audio_frames_per_tick=4)
    fleet.attach(0, s)

    starved_seen = False
    for _ in range(30):
        r = fleet.tick()
        if r.audio_lanes[0]:
            break
    assert r.audio_lanes[0], "audio never discovered"
    # simulate a stalled transport mid-play: no new pictures, ring dry
    s.next_picture = lambda *a, **k: None
    s.feed.audio.clear()
    r = fleet.tick()
    starved_seen = bool(r.audio_starved is not None
                        and r.audio_starved[0])
    assert starved_seen, "underrun never reported"
    names = [e.ev for e in fleet.events.dump(10 ** 6)]
    assert Ev.AUDIO_STARVED in names

    out = OutputStage(1)
    st_before = np.asarray(out.pdm_state).copy()
    pdm = out.modulate(np.zeros((1, 64), np.int16),
                       starved=np.array([True]))
    assert (pdm == DS.SILENCE_WORD).all()
    assert np.array_equal(np.asarray(out.pdm_state), st_before)


def test_corrupt_audio_frame_flags_audio_error(tmp_path):
    """A corrupt SBC frame in a lane's ring surfaces as
    TickResult.audio_errors + an AUDIO_ERROR event -- the reference
    reports every SBC anomaly (video.cpp:1013-1014)."""
    from espflix_tpu.runtime.player import PlayerSession
    from espflix_tpu.runtime.scheduler import Fleet
    from espflix_tpu.tools.indexer import make_service
    from espflix_tpu.tools.sbc_encode import random_frame

    rng = np.random.default_rng(11)
    audio = [(random_frame(rng, mode=0, bitpool=28), k * 240)
             for k in range(60)]
    service = str(tmp_path / "svc")
    make_service(service, ["one"], seed=11, n_gops=2, gop=4,
                 audio_frames=audio)
    s = PlayerSession("file://" + service)
    assert s.init_service()
    s.nav(0)
    s.play_pause()
    fleet = Fleet(1, words_per_lane=8192, audio_frames_per_tick=4)
    fleet.attach(0, s)
    for _ in range(30):
        r = fleet.tick()
        if r.audio_lanes[0]:
            break
    assert r.audio_lanes[0], "audio never discovered"
    # corrupt the next queued frame's HEADER (break the 0x9C syncword:
    # the device decoder flags header anomalies per frame, mirroring
    # the reference's sbc anomaly checks)
    ring = s.feed.audio
    fs = ring.frame_size
    assert fs and ring.size() >= fs, "ring unexpectedly empty"
    ring.poke(0, 0x00)
    r = fleet.tick()
    assert r.audio_errors is not None and r.audio_errors[0], \
        "corrupt SBC frame not reported"
    names = [e.ev for e in fleet.events.dump(10 ** 6)]
    assert Ev.AUDIO_ERROR in names


def test_fleet_audio_default_is_realtime():
    """audio_frames_per_tick defaults to >= 48kHz real time at the
    tick rate (13 frames at 30 ticks/s; the reference's audio thread
    is paced by the DMA clock, video.cpp:990-1004)."""
    from espflix_tpu.runtime.scheduler import Fleet
    assert Fleet(1, words_per_lane=64).audio_F == 13
    assert Fleet(1, words_per_lane=64, tick_rate=25.0).audio_F == 15
    assert Fleet(1, words_per_lane=64,
                 audio_frames_per_tick=4).audio_F == 4


def test_geometry_router_revives_parked_lane(tmp_path):
    """The multi-geometry contract (runtime/router.py): a 352x240
    stream PARKS in a 352x192 fleet with a LANE_GEOMETRY event, and
    the router re-homes it to a fleet of its geometry where it
    actually decodes."""
    from espflix_tpu.runtime.player import PlayerSession
    from espflix_tpu.runtime.router import FleetRouter
    from espflix_tpu.runtime.scheduler import Fleet
    from espflix_tpu.tools.indexer import make_service

    service = str(tmp_path / "svc240")
    make_service(service, ["tall"], seed=13, n_gops=2, gop=4,
                 width=352, height=240)
    s = PlayerSession("file://" + service)
    assert s.init_service()
    s.nav(0)
    s.play_pause()
    fleet = Fleet(1, words_per_lane=8192)      # 352x192 fleet
    fleet.attach(0, s)
    r = fleet.tick(decode_audio=False)
    assert r.errors[0]
    names = [e.ev for e in fleet.events.dump(10 ** 6)]
    assert Ev.LANE_GEOMETRY in names
    assert s.park_geometry == (352, 240)

    router = FleetRouter(fleet, lanes_per_fleet=1,
                         fleet_kwargs=dict(words_per_lane=8192))
    assert router.route() == 1
    assert fleet.sessions[0] is None
    tall = router.fleets[(352, 240)]
    assert tall.sessions[0] is s
    frames = 0
    for _ in range(6):
        rr = tall.tick(decode_audio=False)
        frames += int(rr.video_lanes[0])
        assert not rr.errors[0]
    assert frames >= 3, "re-homed lane never decoded"

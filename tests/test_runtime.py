"""Runtime: service generation, fleet playback, seek/trick, resume.

BASELINE config 5: batched concurrent streams with seek/trick-play over
streamer byte sources.  Verifies the fleet's decoded frames are
bit-exact vs the scalar golden decoder fed the same demuxed bytes, that
index seeks land on random-access points, and that positions persist.
"""

import os
import shutil

import numpy as np
import pytest

from espflix_tpu.core.refdec import Mpeg1Decoder
from espflix_tpu.audio.sbc import SbcDecoder
from espflix_tpu.runtime.checkpoint import PositionStore, limit_key
from espflix_tpu.runtime.player import PlayerSession, State
from espflix_tpu.runtime.scheduler import Fleet
from espflix_tpu.streaming import index as idx
from espflix_tpu.streaming.streamer import Streamer
from espflix_tpu.streaming.ts import demux_ts_numpy
from espflix_tpu.tools.indexer import make_service
from espflix_tpu.tools.sbc_encode import random_frame


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("svc"))
    rng = np.random.default_rng(0)
    audio = [(random_frame(rng, mode=0, bitpool=28), k * 240)
             for k in range(80)]
    make_service(root, ["alpha"], seed=1, n_gops=3, gop=6,
                 audio_frames=audio)
    return root


def scalar_frames(ts_bytes):
    es = demux_ts_numpy(ts_bytes).video
    return Mpeg1Decoder().decode_es(es)


def run_fleet_lane(session, max_ticks=60, words=8192):
    fleet = Fleet(2, words_per_lane=words)
    fleet.attach(0, session)
    got = []
    for _ in range(max_ticks):
        r = fleet.tick(decode_audio=False)
        if r.video_lanes[0]:
            got.append((r.y[0].copy(), r.u[0].copy(), r.v[0].copy(),
                        int(r.pts[0])))
        if session.state == State.DONE:
            break
    return got


def test_playback_bit_exact_vs_scalar(service):
    with open(os.path.join(service, "media/alpha/video.ts"), "rb") as f:
        ts = f.read()
    want = scalar_frames(ts)

    s = PlayerSession("file://" + service)
    assert s.init_service()
    s.nav(0)
    s.play(0, 0, 0)
    got = run_fleet_lane(s)
    assert len(got) == len(want)
    for k, ((gy, gu, gv, gp), w) in enumerate(zip(got, want)):
        assert np.array_equal(gy, w.y), f"frame {k}"
        assert np.array_equal(gu, w.u) and np.array_equal(gv, w.v)


def test_seek_matches_suffix_decode(service):
    s = PlayerSession("file://" + service)
    s.init_service()
    s.nav(0)
    hdr = s.info[0].idx_hdr
    mid = hdr.video.last_pts // 2
    packet = s.get_index(0, mid)
    assert packet > 0
    s.play(0, 0, packet * 188)
    got = run_fleet_lane(s)
    with open(os.path.join(service, "media/alpha/video.ts"), "rb") as f:
        suffix = f.read()[packet * 188:]
    want = scalar_frames(suffix)
    assert len(got) == len(want) and len(got) > 0
    for (gy, gu, gv, gp), w in zip(got, want):
        assert np.array_equal(gy, w.y)


def test_trick_play_streams_and_maps_pts(service):
    s = PlayerSession("file://" + service)
    s.init_service()
    s.nav(0)
    s.info[0].pos = 0
    s.fast_forward()
    assert s.state == State.FAST_FORWARD and s.speed == 1
    got = run_fleet_lane(s)
    assert got, "fast-forward produced no frames"
    # position was mapped back into main-stream time on completion
    hdr = s.info[0].idx_hdr
    assert 0 <= s.info[0].pos <= hdr.video.last_pts

    s.nav(0)
    s.info[0].pos = hdr.video.last_pts
    s.rewind()
    assert s.state == State.REWIND
    assert run_fleet_lane(s)


def test_resume_position_store(service, tmp_path):
    store_path = str(tmp_path / "pos.json")
    s = PlayerSession("file://" + service, PositionStore(store_path))
    s.init_service()
    s.nav(0)
    s.play_pause()
    fleet = Fleet(1, words_per_lane=8192)
    fleet.attach(0, s)
    for _ in range(6):
        fleet.tick(decode_audio=False)
    s.menu()  # leaves playback -> persists position
    saved = s.info[0].pos
    assert saved > 0

    s2 = PlayerSession("file://" + service, PositionStore(store_path))
    s2.init_service()
    s2.nav(0)
    assert s2.info[0].pos == saved


def test_audio_pipeline_bit_exact(service):
    s = PlayerSession("file://" + service)
    s.init_service()
    s.nav(0)
    s.play_pause()
    fleet = Fleet(1, words_per_lane=8192, audio_frames_per_tick=4)
    fleet.attach(0, s)
    pcm_parts = []
    for _ in range(60):
        r = fleet.tick()
        if r.pcm is not None and r.audio_lanes[0]:
            pcm_parts.append(r.pcm[0][:r.pcm_samples[0]])
        if s.state == State.DONE:
            break
    got = np.concatenate(pcm_parts)
    # golden: scalar-decode the same frames from the demuxed TS
    with open(os.path.join(service, "media/alpha/video.ts"), "rb") as f:
        res = demux_ts_numpy(f.read())
    blob = b"".join(a.data for a in res.audio)
    d = SbcDecoder()
    want = []
    pos = 0
    while pos + 64 <= len(blob) and len(want) * 128 < len(got):
        pcm, n = d.decode_frame(blob[pos:pos + 64])
        want.append(pcm)
        pos += n
    want = np.concatenate(want)[:len(got)]
    assert np.array_equal(got, want)


def test_index_binary_roundtrip(service):
    p = os.path.join(service, "media/alpha/video.idx")
    st = Streamer()
    hdr = idx.fetch_header(st, "file://" + p)
    assert hdr.video.last_pts > hdr.video.first_pts
    assert hdr.fwd.trick_speed == 15
    # pts2pts maps trick endpoints onto main endpoints
    assert hdr.pts2pts(hdr.fwd.first_pts, 1) == hdr.video.first_pts
    assert abs(hdr.pts2pts(hdr.fwd.last_pts, 1)
               - hdr.video.last_pts) <= hdr.video.bin_size
    # every stored sample is within the stream
    size = os.path.getsize(p)
    n = (size - idx.HDR_SIZE) // 4
    assert n == (hdr.video.sample_count + hdr.fwd.sample_count
                 + hdr.rwd.sample_count)


def test_limit_key_quirk():
    assert limit_key("short") == "short"
    assert limit_key("a" * 20) == "a" * 15  # last 15 chars (ino:159-164)


def test_bucket_policy():
    """Single source of truth for the two-bucket scan sizing
    (runtime/scheduler.bucket_policy): long bucket absorbs `need`
    rows pow2-quantized, short budget escalates past half the rows."""
    from espflix_tpu.runtime.scheduler import bucket_policy

    NS = 1024 * 12
    # small need: pow2 round-up, budgets untouched
    lr, sl, ss = bucket_policy(100, NS, steps_long=1024,
                               steps_short=384)
    assert lr == 128 and (sl, ss) == (1024, 384)
    # exactly half: no escalation; long_rows capped at NS//2 pow2
    lr, sl, ss = bucket_policy(NS // 2, NS, steps_long=2048,
                               steps_short=512)
    assert ss == 512 and lr <= NS - 8
    # past half: short escalates to long's budget
    lr, sl, ss = bucket_policy(NS // 2 + 1, NS, steps_long=2048,
                               steps_short=512)
    assert ss == 2048
    # floor honored at degenerate sizes
    lr, sl, ss = bucket_policy(0, 24, steps_long=1024, steps_short=384,
                               floor=1)
    assert 1 <= lr <= 23
    lr, _, _ = bucket_policy(5, 24, steps_long=1024, steps_short=384)
    assert lr == 8

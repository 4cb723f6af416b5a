"""Runtime extras: input dispatch, snapshot/restore, boot indirection,
poster/splash pathways, HTTP streamer, event log."""

import http.server
import os
import threading

import numpy as np
import pytest

from espflix_tpu.runtime import input as keys
from espflix_tpu.runtime.events import Ev, EventLog, Timers
from espflix_tpu.runtime.player import PlayerSession, State
from espflix_tpu.runtime.scheduler import Fleet
from espflix_tpu.streaming.streamer import Streamer
from espflix_tpu.tools.indexer import make_service


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("svc2"))
    make_service(root, ["one", "two"], seed=3, n_gops=2, gop=6)
    return root


def test_key_dispatch_drives_state_machine(service):
    s = PlayerSession("file://" + service)
    s.init_service()
    s.nav(0)
    keys.dispatch_key(s, keys.KEY_RIGHT)      # NAV -> next title
    assert s.nav_index == 1
    keys.dispatch_key(s, keys.KEY_LEFT)
    assert s.nav_index == 0
    keys.dispatch_key(s, keys.KEY_PLAY)       # NAV -> PLAYING
    assert s.state == State.PLAYING
    keys.dispatch_key(s, keys.KEY_PLAY)       # pause
    assert s.state == State.PAUSED
    keys.dispatch_key(s, keys.KEY_RIGHT)      # paused -> fast forward
    assert s.state == State.FAST_FORWARD
    keys.dispatch_key(s, keys.KEY_MENU)
    assert s.state == State.NAV


def test_apple_remote_mapping():
    assert keys.apple_to_key(0x40 << 8) == keys.KEY_MENU
    assert keys.apple_to_key(0x7A00) == keys.KEY_PLAY
    assert keys.apple_to_key(0x1234 & 0) == 0


def test_snapshot_restore_roundtrip(service):
    fleet = Fleet(1, words_per_lane=8192)
    s = PlayerSession("file://" + service)
    s.init_service()
    s.nav(1)
    s.play_pause()
    fleet.attach(0, s)
    for _ in range(4):
        fleet.tick(decode_audio=False)
    snaps = fleet.snapshot()
    assert snaps[0]["title"] == "two" and snaps[0]["pos"] >= 0

    fleet2 = Fleet(1, words_per_lane=8192)
    s2 = PlayerSession("file://" + service)
    s2.init_service()
    fleet2.attach(0, s2)
    assert fleet2.restore(snaps) == 1
    assert s2.nav_index == 1
    assert s2.state == State.PLAYING
    r = fleet2.tick(decode_audio=False)
    assert r.video_lanes[0]


def test_boot_url_indirection(service, tmp_path):
    boot = tmp_path / "service.txt"
    boot.write_text("file://" + service + "\n")
    s = PlayerSession.from_boot_url("file://" + str(boot))
    assert s is not None and s.manifest == ["one", "two"]


def test_play_rom_splash(service):
    with open(os.path.join(service, "media/one/video.ts"), "rb") as f:
        rom = f.read()
    s = PlayerSession("file://" + service)
    s.play_rom(rom)
    fleet = Fleet(1, words_per_lane=8192)
    fleet.attach(0, s)
    got = 0
    for _ in range(40):
        r = fleet.tick(decode_audio=False)
        got += int(r.video_lanes[0])
        if s.state == State.DONE:
            break
    assert got > 0 and s.state == State.DONE


def test_poster_single_frame(service):
    s = PlayerSession("file://" + service)
    s.init_service()
    s.nav(0)
    assert s.load_poster(0)
    fleet = Fleet(1, words_per_lane=8192)
    fleet.attach(0, s)
    got = 0
    for _ in range(10):
        r = fleet.tick(decode_audio=False)
        got += int(r.video_lanes[0])
        if s.state == State.DONE:
            break
    assert got == 1  # posters are single-picture streams


class _RangeHandler(http.server.SimpleHTTPRequestHandler):
    """Range-capable static handler (S3/CloudFront stand-in)."""

    def do_GET(self):
        path = self.translate_path(self.path)
        try:
            with open(path, "rb") as f:
                data = f.read()
        except OSError:
            self.send_error(404)
            return
        h = self.headers.get("Range")
        if h and h.startswith("bytes="):
            lo, _, hi = h[6:].partition("-")
            lo = int(lo)
            hi = int(hi) + 1 if hi else len(data)
            body = data[lo:hi]
            self.send_response(206)
            self.send_header("Content-Range",
                             f"bytes {lo}-{hi - 1}/{len(data)}")
        else:
            body = data
            self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def test_http_streamer_range_requests(service):
    os.chdir(service)
    handler = _RangeHandler
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        st = Streamer()
        body = st.get_url(f"http://127.0.0.1:{port}/manifest.txt")
        assert body is not None and b"one" in body
        # ranged read of the index header
        p = os.path.join(service, "media/one/video.idx")
        whole = open(p, "rb").read()
        part = st.get_url(
            f"http://127.0.0.1:{port}/media/one/video.idx", 8, 32)
        assert part == whole[8:40]
        # sequential reads
        assert st.get(f"http://127.0.0.1:{port}/media/one/video.ts",
                      188) == 0
        a = st.read(188)
        b = st.read(188)
        disk = open(os.path.join(service, "media/one/video.ts"),
                    "rb").read()
        assert a == disk[188:376] and b == disk[376:564]
        st.close()
        # full playback over HTTP == over file://
        s = PlayerSession(f"http://127.0.0.1:{port}")
        assert s.init_service()
        s.nav(0)
        s.play_pause()
        fleet = Fleet(1, words_per_lane=8192)
        fleet.attach(0, s)
        frames = 0
        for _ in range(60):
            r = fleet.tick(decode_audio=False)
            frames += int(r.video_lanes[0])
            if s.state == State.DONE:
                break
        assert frames == 12  # 2 gops x 6
    finally:
        httpd.shutdown()


def test_event_log_and_timers(service):
    fleet = Fleet(1, words_per_lane=8192)
    s = PlayerSession("file://" + service)
    s.init_service()
    s.nav(0)
    s.play_pause()
    fleet.attach(0, s)
    for _ in range(3):
        fleet.tick(decode_audio=False)
    counts = fleet.events.counts()
    assert counts.get("DECODE_BATCH", 0) >= 3
    rep = fleet.timers.report()
    assert "device_decode" in rep and rep["device_decode"]["calls"] >= 3


def test_timers_percentages():
    t = Timers()
    with t.measure("a"):
        pass
    r = t.report()
    assert r["a"]["calls"] == 1


def test_menu_render():
    from espflix_tpu.video.menu import menu_frame

    y, u, v = menu_frame(["one", "two", "three"], 1)
    assert y.shape == (192, 352) and (u == 128).all()
    # selection highlight fill present on the second row band
    band = y[35:50, 40:300]
    assert (band >= 0x40).mean() > 0.3
    # unselected rows use the dim fill
    band0 = y[18:33, 40:300]
    assert ((band0 == 0x10) | (band0 > 0x10)).mean() > 0.3


def test_generated_splash_asset_plays():
    """The procedural boot splash (espflix_tpu/assets.py) demuxes,
    decodes bit-exact in the golden decoder, and plays through the
    play_rom boot pathway (reference: splash.h + espflix.cpp:699)."""
    import numpy as np
    from espflix_tpu import assets
    from espflix_tpu.streaming.ts import demux_ts
    from espflix_tpu.core.refdec import Mpeg1Decoder

    ts = assets.splash_ts()
    assert ts == assets.splash_ts(refresh=True)   # deterministic
    d = demux_ts(ts)
    frames = Mpeg1Decoder().decode_es(d.video)
    assert len(frames) == 24
    # the fade: later frames are strictly brighter where the text is
    assert int(frames[-1].y.mean()) > int(frames[2].y.mean())
    assert d.audio                                 # sting is present

    s = PlayerSession("file:///nonexistent")
    s.play_rom(ts)
    fleet = Fleet(1, words_per_lane=8192)
    fleet.attach(0, s)
    got = 0
    for _ in range(60):
        r = fleet.tick(decode_audio=False)
        got += int(r.video_lanes[0])
        if s.state == State.DONE:
            break
    assert got > 0 and s.state == State.DONE


def test_fleet_pallas_parser_matches_device(service):
    """Fleet(parser='pallas') (slice-parallel Pallas scan, interpreter
    mode on CPU) presents bit-identical frames to the device parser."""
    import numpy as np

    outs = {}
    for parser in ("device", "pallas"):
        s = PlayerSession("file://" + service)
        assert s.init_service()
        s.nav(0)
        s.play_pause()
        fleet = Fleet(1, words_per_lane=8192, parser=parser)
        fleet.attach(0, s)
        frames = []
        for _ in range(6):
            r = fleet.tick(decode_audio=False)
            if r.video_lanes[0]:
                frames.append((r.y[0].copy(), r.u[0].copy(),
                               r.v[0].copy()))
        assert not r.errors.any()
        outs[parser] = frames
    assert len(outs["device"]) == len(outs["pallas"]) > 0
    for (ya, ua, va), (yb, ub, vb) in zip(outs["device"],
                                          outs["pallas"]):
        assert np.array_equal(ya, yb)
        assert np.array_equal(ua, ub)
        assert np.array_equal(va, vb)


def test_fleet_pipelined_matches_sync(service):
    """run_pipelined (submit/collect overlap) must present the same
    frames/PTS as back-to-back synchronous ticks on identical
    sessions."""

    def build():
        fleet = Fleet(2, words_per_lane=8192)
        for lane, title in enumerate((0, 1)):
            s = PlayerSession("file://" + service)
            s.init_service()
            s.nav(title)
            s.play_pause()
            fleet.attach(lane, s)
        return fleet

    f1, f2 = build(), build()
    sync = [f1.tick(decode_audio=True) for _ in range(6)]
    pipe = f2.run_pipelined(6, decode_audio=True)
    assert len(pipe) == len(sync)
    for a, b in zip(sync, pipe):
        assert np.array_equal(a.video_lanes, b.video_lanes)
        assert np.array_equal(a.pts, b.pts)
        assert np.array_equal(a.y, b.y)
        assert np.array_equal(a.u, b.u)
        assert np.array_equal(a.v, b.v)
        assert np.array_equal(a.errors, b.errors)
        assert np.array_equal(a.audio_lanes, b.audio_lanes)
        assert np.array_equal(a.pcm_samples, b.pcm_samples)
        if a.pcm is not None:
            assert np.array_equal(a.pcm, b.pcm)


@pytest.mark.parametrize("parser", ["device", "pallas"])
def test_fleet_run_chunk_matches_sync(service, parser):
    """run_chunk (K ticks in one chained device dispatch) must present
    the same frames/PTS as back-to-back synchronous ticks on clean
    streams, for both production parsers."""

    def build():
        fleet = Fleet(2, words_per_lane=8192, parser=parser)
        for lane, title in enumerate((0, 1)):
            s = PlayerSession("file://" + service)
            s.init_service()
            s.nav(title)
            s.play_pause()
            fleet.attach(lane, s)
        return fleet

    f1, f2 = build(), build()
    sync = [f1.tick() for _ in range(6)]
    chunk = f2.run_chunk(6)
    assert len(chunk) == 6
    for a, b in zip(sync, chunk):
        assert np.array_equal(a.video_lanes, b.video_lanes)
        assert np.array_equal(a.pts, b.pts)
        assert np.array_equal(a.y, b.y)
        assert np.array_equal(a.u, b.u)
        assert np.array_equal(a.v, b.v)
        assert np.array_equal(a.errors, b.errors)
        assert np.array_equal(a.pcm_samples, b.pcm_samples)


def test_fleet_mesh_pallas_matches_single(service):
    """The production Pallas parser under an 8-device 'streams' mesh
    (tick + run_chunk chained dispatch) presents the same frames/PTS
    as the unsharded pallas fleet."""
    import jax

    from espflix_tpu.parallel import mesh as PM

    def build(mesh):
        fleet = Fleet(8, words_per_lane=8192, parser="pallas",
                      mesh=mesh)
        for lane in range(8):
            s = PlayerSession("file://" + service)
            s.init_service()
            s.nav(lane % 2)
            s.play_pause()
            fleet.attach(lane, s)
        return fleet

    mesh = PM.make_mesh()
    f1, f2, f3 = build(None), build(mesh), build(mesh)
    sync = [f1.tick(decode_audio=False) for _ in range(4)]
    mtick = [f2.tick(decode_audio=False) for _ in range(4)]
    chunk = f3.run_chunk(4, decode_audio=False)
    for a, b, c in zip(sync, mtick, chunk):
        for r in (b, c):
            assert np.array_equal(a.video_lanes, r.video_lanes)
            assert np.array_equal(a.pts, r.pts)
            assert np.array_equal(np.asarray(a.y), np.asarray(r.y))
            assert np.array_equal(np.asarray(a.u), np.asarray(r.u))
            assert np.array_equal(np.asarray(a.v), np.asarray(r.v))
            assert np.array_equal(a.errors, r.errors)
    # the mesh fleet's frame state really is sharded over 8 devices
    devs = {s.device for s in f2.frames["y"].addressable_shards}
    assert len(devs) == 8

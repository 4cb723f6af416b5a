"""Presentation clock: PTS -> frame-counter mapping, origin latch,
late re-latch, pause (video.cpp:1024-1057 semantics) + session wiring."""

import os

from espflix_tpu.video.clock import PresentationClock, NTSC_DIV, PAL_DIV


def test_origin_latch_and_linear_mapping():
    c = PresentationClock()
    c.tick(10)
    assert c.due_time(90000) == 10            # first frame: due now
    assert c.due_time(90000 + NTSC_DIV) == 11
    assert c.due_time(90000 + 10 * NTSC_DIV) == 20


def test_pal_divisor():
    c = PresentationClock(pal=True)
    c.tick(5)
    c.due_time(0)
    assert c.due_time(10 * PAL_DIV) == 15


def test_late_frames_relatch_origin():
    c = PresentationClock()
    c.due_time(0)
    c.tick(10)                                 # display ran ahead
    d = c.due_time(NTSC_DIV)                   # due at 1, now at 10
    assert d == 1 and c.late_resets == 1
    # next frame latches a fresh origin: due immediately
    assert c.due_time(20 * NTSC_DIV) == 10
    # small (<=2) lateness does NOT re-latch
    c.tick(2)
    c.due_time(21 * NTSC_DIV)
    assert c.late_resets == 1


def test_pause_relatches_on_resume():
    c = PresentationClock()
    c.due_time(0)
    c.tick(3)
    c.pause(True)
    c.tick(100)                                # frozen playback
    c.pause(False)
    assert c.due_time(4 * NTSC_DIV) == 103     # fresh origin, no spiral
    assert c.late_resets == 0


def test_session_clock_paces_playback(tmp_path):
    from espflix_tpu.runtime.player import PlayerSession
    from espflix_tpu.runtime.scheduler import Fleet
    from espflix_tpu.tools.indexer import make_service

    service = str(tmp_path / "svc")
    make_service(service, ["one"], seed=4, n_gops=2, gop=4)
    s = PlayerSession("file://" + service)
    assert s.init_service()
    s.nav(0)
    s.play_pause()
    fleet = Fleet(1, words_per_lane=8192)
    fleet.attach(0, s)
    dues = []
    for _ in range(16):
        fleet.tick(decode_audio=False)
        dues.append(s.last_due)
    assert s.clock.frame_counter == 16
    assert dues[-1] > 0                        # frames got scheduled
    assert dues == sorted(dues)                # monotone due times

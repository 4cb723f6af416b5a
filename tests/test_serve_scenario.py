"""CI-sized serving integration scenario (BASELINE config 5).

Full control plane over HTTP-range streaming: mixed
play/pause/FF/RWD/seek actions, injected lane faults with
containment + resync, fleet snapshot/restore mid-run, pipelined ticks.
Reference behavior: espflix.cpp:886-1010 (loop), 823-848 (trick
seeks), 851-859 (save position).  The 1k-lane variant is
`python -m espflix_tpu.tools.serve_scenario --lanes 1024`.
"""

import numpy as np
import pytest

from espflix_tpu.runtime.player import State
from espflix_tpu.tools import serve_scenario as SS


@pytest.fixture(scope="module")
def http_service(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("svc_live"))
    SS.generate_service(root, ["one", "two"], seed=7, n_gops=2, gop=6)
    url, shutdown = SS.start_http_service(root)
    yield url
    shutdown()


def test_scenario_end_to_end(http_service):
    fleet = SS.build_fleet(http_service, 6, 2, words_per_lane=8192)
    stats, snap = SS.run_scenario(fleet, 24, seed=3, faults=2,
                                  snapshot_at=12)
    # every lane made progress despite the control churn
    assert stats.frames >= 24
    assert stats.audio_lanes > 0, "audio never decoded over HTTP"
    # the injected corrupt pictures were flagged AND recovered
    assert stats.errors >= 1
    assert stats.resyncs >= 1
    # scripted actions actually exercised the trick/seek machinery
    assert sum(stats.actions.values()) > 0
    assert snap is not None and sum(s is not None for s in snap) == 6

    # restore into a fresh fleet: saved positions must resume
    fleet2 = SS.build_fleet(http_service, 6, 2, words_per_lane=8192)
    assert fleet2.restore(snap) == 6
    rstats, _ = SS.run_scenario(fleet2, 6, seed=4, faults=0,
                                action_every=0)
    assert rstats.frames > 0, "restored fleet decodes nothing"


def test_scenario_pipelined_equals_reported_frames(http_service):
    """run_scenario's pipelined accounting matches a sync rerun."""
    f1 = SS.build_fleet(http_service, 2, 2, words_per_lane=8192)
    s1, _ = SS.run_scenario(f1, 10, seed=9, faults=0, action_every=0,
                            churn=False)
    f2 = SS.build_fleet(http_service, 2, 2, words_per_lane=8192)
    frames = 0
    for _ in range(10):
        r = f2.tick()
        frames += int(r.video_lanes.sum())
    assert s1.frames == frames


def test_done_lanes_are_churned_back_in(http_service):
    """Continuous batching: a lane whose title ends must be re-navved
    and keep decoding (occupancy never decays)."""
    fleet = SS.build_fleet(http_service, 2, 2, words_per_lane=8192)
    stats, _ = SS.run_scenario(fleet, 60, seed=11, faults=0,
                               action_every=0, churn=True)
    # titles are 2 GOPs x 6 pics: every lane finishes multiple times
    assert stats.actions.get("lane_restart", 0) >= 2
    # and decode kept happening well past the first title's length
    assert stats.frames > 2 * 24  # more than two title-lengths decoded


def test_steady_state_per_lane_floor(http_service):
    """Regression floor: with no control churn, every PLAYING lane
    sustains near 1 frame/tick (a fleet-wide throughput regression
    cannot hide behind a fleet-total assertion)."""
    fleet = SS.build_fleet(http_service, 4, 2, words_per_lane=8192)
    stats, _ = SS.run_scenario(fleet, 16, seed=21, faults=0,
                               action_every=0, churn=True)
    assert stats.frames_per_lane is not None
    # first tick may warm up; floor at ticks-2 per lane
    assert int(stats.frames_per_lane.min()) >= 14, \
        stats.frames_per_lane.tolist()


def test_chunk_dispatch_scenario_and_action_latency(http_service):
    """The production chunked dispatch (run_chunk) under the same
    control plane: per-lane progress holds, and control actions take
    effect by the NEXT chunk boundary -- the pinned worst-case
    latency is one chunk (K ticks)."""
    fleet = SS.build_fleet(http_service, 4, 2, words_per_lane=8192)
    fleet.parser = "pallas"
    import jax
    fleet._pallas_interpret = jax.default_backend() != "tpu"
    stats, _ = SS.run_scenario(fleet, 12, seed=23, faults=0,
                               action_every=4, churn=True,
                               dispatch="chunk")
    assert stats.frames_per_lane is not None
    assert int(stats.frames_per_lane.min()) >= 6

    # action latency pin: pause a lane, run one chunk of K ticks --
    # the lane decodes ZERO frames in that chunk (the pause applied
    # at the boundary, not K ticks later)
    s = fleet.sessions[0]
    if s.state != State.PLAYING:
        s.play_pause()
    if s.state != State.PLAYING:   # was paused: toggle back on
        s.play_pause()
    assert s.state == State.PLAYING
    s.play_pause()                  # -> PAUSED at the boundary
    rs = fleet.run_chunk(4, fetch_frames=False)
    assert sum(int(r.video_lanes[0]) for r in rs) == 0

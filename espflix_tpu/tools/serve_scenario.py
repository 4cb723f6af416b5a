"""Serving integration scenario (BASELINE config 5).

Drives a full fleet of PlayerSessions over HTTP-range streaming --
the reference's real deployment shape (one HTTP/1.1 Range client per
stream against a CDN, streamer.cpp:408-496; trick-play/seek via
video.idx range reads, espflix.cpp:823-848) -- scaled out to N lanes
on one chip:

  * a local Range-capable HTTP server fronts a generated service dir
    (manifest.txt + per-title video/fwd/rwd/idx/poster, the exact
    layout indexer.cpp:332-338 produces);
  * every lane runs the full control plane: play, pause/resume, 15x
    fast-forward & rewind with index seeks, +/-30 s skips, menu ->
    re-nav (espflix.cpp:886-1010 loop semantics);
  * lane faults are injected (corrupt picture payloads) and must be
    contained + auto-resynced (SURVEY.md 5.3);
  * a fleet snapshot is taken mid-run and restored into a SECOND fleet
    which must resume every title at its saved position (SURVEY.md 5.4);
  * ticks run through Fleet.run_pipelined (host/device overlap).

Reports sustained decoded frames/s and realtime streams/chip with the
entire control plane attached.

CLI:  python -m espflix_tpu.tools.serve_scenario --lanes 64 --ticks 90
The pytest-sized variant lives in tests/test_serve_scenario.py.
"""

from __future__ import annotations

import argparse
import http.server
import json
import os
import sys
import tempfile
import threading
import time
from dataclasses import dataclass, field

import numpy as np

from espflix_tpu.core.bitio import BitWriter
from espflix_tpu.models import mpeg1 as M
from espflix_tpu.runtime.events import Ev
from espflix_tpu.runtime.player import PlayerSession, State
from espflix_tpu.runtime.scheduler import Fleet
from espflix_tpu.tools.indexer import make_service


class RangeHandler(http.server.SimpleHTTPRequestHandler):
    """Range-capable static file handler (S3/CloudFront stand-in)."""

    root = "."

    def translate_path(self, path):
        path = path.split("?", 1)[0].split("#", 1)[0].lstrip("/")
        return os.path.join(self.root, path)

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


def start_http_service(root: str):
    """Serve `root` on an ephemeral port; returns (url, shutdown_fn)."""
    handler = type("H", (RangeHandler,), {"root": root})
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    return url, httpd.shutdown


def corrupt_picture():
    """A 352x192 I-picture whose first MB hits an invalid MB-type code
    (same construction as tests/test_fault_injection.py)."""
    w = BitWriter()
    w.start_code(0xB3)
    w.put(352, 12); w.put(192, 12); w.put(1, 4); w.put(5, 4)
    w.put(2928, 18); w.put(1, 1); w.put(20, 10)
    w.put(0, 1); w.put(0, 1); w.put(0, 1)
    w.start_code(0x00)
    w.put(0, 10); w.put(1, 3); w.put(0xFFFF, 16); w.put(0, 1)
    w.start_code(0x01)
    w.put(8, 5); w.put(0, 1)
    w.put_str("1")
    w.put(0, 23)
    w.put(0xFFFF, 16)
    w.align()
    w.start_code(0xB7)
    return M.parse_es(w.tobytes())[1][0]


@dataclass
class ScenarioStats:
    frames: int = 0
    audio_lanes: int = 0
    errors: int = 0
    resyncs: int = 0
    actions: dict = field(default_factory=dict)
    restored: int = 0
    wall_s: float = 0.0
    ticks: int = 0
    lanes: int = 0
    frames_per_lane: np.ndarray | None = None  # int64[N]
    full_ticks: int = 0        # ticks that ran the on-device output
    # stage (composite fields + PDM); --stage full only
    tap_field_bytes: int = 0   # DAC bytes delivered for tapped lanes

    def streams_per_chip(self) -> float:
        if self.wall_s <= 0:
            return 0.0
        return self.frames / self.wall_s / 30.0


def generate_service(root: str, titles: list[str], *, seed: int = 0,
                     n_gops: int = 4, gop: int = 6):
    """Full A/V service: video GOPs + a 48 kHz mono SBC track (the
    reference's encode point, indexer.cpp:307: SBC 128-sample frames,
    one per 240 PTS ticks at 90 kHz)."""
    from espflix_tpu.tools.sbc_encode import random_frame
    rng = np.random.default_rng(seed)
    n_frames = n_gops * gop * 90000 // 30 // 240 + 8
    audio = [(random_frame(rng, mode=0, bitpool=28), k * 240)
             for k in range(n_frames)]
    make_service(root, titles, seed=seed, n_gops=n_gops, gop=gop,
                 audio_frames=audio)


def build_fleet(url: str, lanes: int, titles: int,
                words_per_lane: int = 8192,
                audio: bool = True, stage: str = "decode") -> Fleet:
    if stage == "full":
        # the complete on-device loop (decode + composite + PDM,
        # runtime/chain.py) runs on the Pallas parser
        fleet = Fleet(lanes, words_per_lane=words_per_lane,
                      parser="pallas", output=True)
    else:
        fleet = Fleet(lanes, words_per_lane=words_per_lane)
    for i in range(lanes):
        s = PlayerSession(url)
        if not s.init_service():
            raise RuntimeError("service bootstrap failed")
        s.nav(i % titles)
        s.play_pause()
        fleet.attach(i, s)
    return fleet


def run_scenario(fleet: Fleet, ticks: int, *, seed: int = 0,
                 action_every: int = 4, faults: int = 2,
                 decode_audio: bool = True,
                 snapshot_at: int | None = None,
                 churn: bool = True, dispatch: str = "pipelined",
                 tap_lanes=(0,), egress=None):
    """Drive the fleet through `ticks` pipelined ticks with scripted
    per-lane control actions and injected faults.

    churn=True is continuous batching at the session layer: any lane
    whose title finishes (State.DONE) is immediately re-navigated to a
    fresh title and resumes playing, so batch occupancy never decays
    (the serving analogue of slot reuse in LLM batch schedulers; the
    reference just loops its one stream, espflix.cpp:941-955).

    Returns (stats, snapshot) where snapshot is the fleet snapshot
    taken at `snapshot_at` (or None).
    """
    rng = np.random.default_rng(seed)
    n = fleet.n
    stats = ScenarioStats(lanes=n)
    snap = None

    # schedule fault injections: (tick, lane)
    fault_plan = {}
    for k in range(faults):
        fault_plan[int(rng.integers(2, max(3, ticks // 2)))] = \
            int(rng.integers(0, n))
    bad_pic = corrupt_picture()

    def inject(lane):
        s = fleet.sessions[lane]
        if s is None or getattr(s, "_tampered", False):
            return
        orig = s.next_picture

        def tampered():
            p = orig()
            if p is not None and not getattr(s, "_fired", False):
                s._fired = True
                bad_pic.pts = p.pts
                return bad_pic
            return p
        s.next_picture = tampered
        s._tampered = True

    def act(tick):
        # a slice of lanes takes a random control action
        k = max(1, n // 8)
        for lane in rng.choice(n, size=k, replace=False):
            s = fleet.sessions[int(lane)]
            if s is None:
                continue
            a = rng.integers(0, 6)
            name = ("play_pause", "ff", "rwd", "skip_fwd", "skip_back",
                    "menu_nav")[a]
            stats.actions[name] = stats.actions.get(name, 0) + 1
            if a == 0:
                s.play_pause()
            elif a == 1 and s.state == State.PLAYING:
                s.fast_forward()
            elif a == 2 and s.state == State.PLAYING:
                s.rewind()
            elif a == 3 and s.state == State.PLAYING:
                s.skip(30)
            elif a == 4 and s.state == State.PLAYING:
                s.skip(-30)
            elif a == 5:
                if s.state == State.NAV:
                    s.nav(int(rng.integers(0, max(1, len(s.manifest)))))
                    s.play_pause()
                else:
                    s.menu()

    def reap_done():
        for lane, s in enumerate(fleet.sessions):
            if s is None or s.state != State.DONE:
                continue
            s.menu()
            s.nav(int(rng.integers(0, max(1, len(s.manifest)))))
            s.play_pause()
            stats.actions["lane_restart"] = \
                stats.actions.get("lane_restart", 0) + 1

    stats.frames_per_lane = np.zeros(n, np.int64)

    def account(r):
        stats.frames += int(r.video_lanes.sum())
        stats.frames_per_lane += r.video_lanes.astype(np.int64)
        stats.audio_lanes += int(r.audio_lanes.sum())
        stats.errors += int(r.errors.sum())
        if r.field_sum is not None:
            stats.full_ticks += 1
        if r.tap_fields is not None:
            stats.tap_field_bytes += int(np.asarray(r.tap_fields).size)
            if egress is not None:
                # hand the tapped lanes' DAC fields + PDM words to the
                # paced line-rate consumer (runtime/egress.py)
                egress.push(r.tap_fields, r.tap_pdm)

    t0 = time.time()
    if dispatch == "pipelined":
        pend = None
        for t in range(ticks):
            if churn:
                reap_done()
            if t in fault_plan:
                inject(fault_plan[t])
            if action_every and t and t % action_every == 0:
                act(t)
            if snapshot_at is not None and t == snapshot_at:
                snap = fleet.snapshot()
            nxt = fleet.tick_submit(decode_audio)
            if pend is not None:
                # serving shape: planes stay on device (they feed the
                # output stage there); only control words reach host
                r = fleet.tick_collect(pend, fetch_frames=False)
                account(r)
            pend = nxt
        if pend is not None:
            account(fleet.tick_collect(pend, fetch_frames=False))
    else:
        # chunked dispatch: K ticks per device call (run_chunk /
        # run_chunk_full); control actions, faults and snapshots apply
        # at chunk boundaries -- worst-case action latency = K ticks
        # (pinned by tests/test_serve_scenario.py)
        K = max(1, action_every)
        t = 0
        while t < ticks:
            if churn:
                reap_done()
            for ft in list(fault_plan):
                if t <= ft < t + K:
                    inject(fault_plan.pop(ft))
            if t:
                act(t)
            if snapshot_at is not None and t <= snapshot_at < t + K:
                snap = fleet.snapshot()
            k = min(K, ticks - t)
            if dispatch == "full":
                rs = fleet.run_chunk_full(k, tap_lanes=tap_lanes)
            else:
                rs = fleet.run_chunk(k, decode_audio,
                                     fetch_frames=False)
            for r in rs:
                account(r)
            t += k
    stats.wall_s = time.time() - t0
    stats.ticks = ticks
    names = [e.ev for e in fleet.events.dump(10 ** 6)]
    stats.resyncs = names.count(Ev.LANE_RESYNC)
    return stats, snap


def run_pooled(args, url: str, shutdown):
    """--workers mode: sessions sharded across host processes feeding
    the full on-device chain (Fleet.run_chunk_full_pooled)."""
    from espflix_tpu.runtime.hostpool import HostPool
    from espflix_tpu.runtime.scheduler import Fleet

    assert args.stage == "full", "--workers requires --stage full"
    rng = np.random.default_rng(args.seed)
    fleet = Fleet(args.lanes, words_per_lane=8192, parser="pallas",
                  output=True)
    pool = HostPool(args.lanes, args.workers, 8192, fleet.mb_w,
                    fleet.mb_h)
    try:
        for i in range(args.lanes):
            if not pool.attach(i, url):
                raise RuntimeError("service bootstrap failed")
            pool.call(i, "nav", i % args.titles)
            pool.call(i, "play_pause")
        K = 4
        stats = ScenarioStats(lanes=args.lanes)
        stats.frames_per_lane = np.zeros(args.lanes, np.int64)
        t0 = time.time()
        t = 0
        while t < args.ticks:
            # control churn between chunks: re-nav DONE lanes + a few
            # scripted actions through the pool
            for lane in range(args.lanes):
                if pool.state(lane) == "DONE":
                    pool.call(lane, "menu")
                    pool.call(lane, "nav",
                              int(rng.integers(0, args.titles)))
                    pool.call(lane, "play_pause")
                    stats.actions["lane_restart"] = \
                        stats.actions.get("lane_restart", 0) + 1
            if t:
                lane = int(rng.integers(0, args.lanes))
                pool.call(lane, "skip", 30)
                stats.actions["skip_fwd"] = \
                    stats.actions.get("skip_fwd", 0) + 1
            k = min(K, args.ticks - t)
            for r in fleet.run_chunk_full_pooled(pool, k,
                                                 tap_lanes=(0,)):
                stats.frames += int(r.video_lanes.sum())
                stats.frames_per_lane += r.video_lanes.astype(np.int64)
                stats.audio_lanes += int(r.audio_lanes.sum())
                stats.errors += int(r.errors.sum())
                stats.full_ticks += 1
                if r.tap_fields is not None:
                    stats.tap_field_bytes += int(
                        np.asarray(r.tap_fields).size)
            t += k
        stats.wall_s = time.time() - t0
        stats.ticks = args.ticks
        out = {
            "lanes": args.lanes, "ticks": stats.ticks,
            "stage": "full", "dispatch": "full-pooled",
            "workers": args.workers,
            "full_ticks": stats.full_ticks,
            "tap_field_bytes": stats.tap_field_bytes,
            "min_lane_frames": int(stats.frames_per_lane.min()),
            "frames": stats.frames,
            "audio_lane_ticks": stats.audio_lanes,
            "errors": stats.errors,
            "actions": stats.actions,
            "wall_s": round(stats.wall_s, 2),
            "wall_per_tick_ms": round(
                stats.wall_s / max(stats.ticks, 1) * 1000, 1),
            "frames_per_s": round(
                stats.frames / max(stats.wall_s, 1e-9), 1),
        }
        print(json.dumps(out))
        return out
    finally:
        pool.close()
        shutdown()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=64)
    ap.add_argument("--ticks", type=int, default=90)
    ap.add_argument("--titles", type=int, default=4)
    ap.add_argument("--gops", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-audio", action="store_true")
    ap.add_argument("--service", default=None,
                    help="existing service dir (default: generate)")
    ap.add_argument("--transport", choices=["http", "file"],
                    default="http",
                    help="file skips the local HTTP server (isolates "
                         "fleet cost from serving HTTP on this host)")
    ap.add_argument("--stage", choices=["decode", "full"],
                    default="decode",
                    help="full = the complete on-device loop: decode +"
                         " composite fields + SBC + delta-sigma PDM "
                         "(runtime/chain.py), chunk-dispatched")
    ap.add_argument("--dispatch",
                    choices=["pipelined", "chunk", "full"],
                    default=None,
                    help="device dispatch (default: pipelined for "
                         "--stage decode, full-chain chunks for "
                         "--stage full)")
    ap.add_argument("--workers", type=int, default=0,
                    help="shard the session control plane across N "
                         "host worker processes (runtime/hostpool.py;"
                         " requires --stage full).  The host-side "
                         "scaling knob: lanes/N per core.")
    ap.add_argument("--egress", type=int, default=0,
                    help="tap N lanes and drain their full DAC "
                         "fields + PDM through a paced line-rate "
                         "consumer (runtime/egress.py; requires "
                         "--stage full).  Reports delivered bytes, "
                         "underruns and drops.")
    ap.add_argument("--egress-depth", type=int, default=8,
                    help="egress ring depth in ticks")
    args = ap.parse_args(argv)
    dispatch = args.dispatch or (
        "full" if args.stage == "full" else "pipelined")

    root = args.service
    if root is None:
        root = tempfile.mkdtemp(prefix="espflix_svc_")
        titles = [f"title{i:02d}" for i in range(args.titles)]
        print(f"generating service ({args.titles} titles) -> {root}",
              file=sys.stderr)
        generate_service(root, titles, seed=args.seed,
                         n_gops=args.gops)
    if args.transport == "http":
        url, shutdown = start_http_service(root)
    else:
        url, shutdown = "file://" + root, (lambda: None)
    print(f"service at {url}", file=sys.stderr)

    if args.workers:
        return run_pooled(args, url, shutdown)

    fleet = build_fleet(url, args.lanes, args.titles,
                        stage=args.stage)
    pump = None
    tap_lanes = (0,)
    if args.egress:
        assert args.stage == "full", "--egress requires --stage full"
        from espflix_tpu.runtime.egress import EgressPump
        tap_lanes = tuple(range(min(args.egress, args.lanes)))
        pump = EgressPump(tick_interval=1.0 / 29.97,
                          depth=args.egress_depth)
        pump.start()
    half = args.ticks // 2
    stats, snap = run_scenario(
        fleet, args.ticks, seed=args.seed,
        decode_audio=not args.no_audio, snapshot_at=half,
        dispatch=dispatch, tap_lanes=tap_lanes, egress=pump)
    est = pump.finish() if pump is not None else None

    # snapshot/restore into a second fleet: every playing lane resumes
    restored = 0
    if snap is not None:
        fleet2 = build_fleet(url, args.lanes, args.titles,
                             stage=args.stage)
        restored = fleet2.restore(snap)
        rstats, _ = run_scenario(fleet2, max(4, args.ticks // 8),
                                 seed=args.seed + 1, faults=0,
                                 decode_audio=not args.no_audio,
                                 dispatch=dispatch)
        restored_ok = rstats.frames > 0
    else:
        restored_ok = False
    shutdown()

    out = {
        "lanes": args.lanes,
        "ticks": stats.ticks,
        "stage": args.stage,
        "dispatch": dispatch,
        "full_ticks": stats.full_ticks,
        "tap_field_bytes": stats.tap_field_bytes,
        "min_lane_frames": int(stats.frames_per_lane.min())
        if stats.frames_per_lane is not None else 0,
        "frames": stats.frames,
        "audio_lane_ticks": stats.audio_lanes,
        "errors": stats.errors,
        "resyncs": stats.resyncs,
        "actions": stats.actions,
        "snapshot_restored": restored,
        "restored_decodes": restored_ok,
        "wall_s": round(stats.wall_s, 2),
        "frames_per_s": round(stats.frames / max(stats.wall_s, 1e-9), 1),
        "rt_streams_per_chip": round(stats.streams_per_chip(), 1),
    }
    if est is not None:
        out["egress"] = {
            "tapped_lanes": len(tap_lanes),
            "pushed_ticks": est.pushed_ticks,
            "consumed_ticks": est.consumed_ticks,
            "underrun_ticks": est.underrun_ticks,
            "dropped_ticks": est.dropped_ticks,
            "delivered_field_bytes": est.delivered_field_bytes,
            "delivered_pdm_words": est.delivered_pdm_words,
            "line_rate_MBps": round(
                est.line_rate_bytes_per_s() / 1e6, 2),
            "checksum": est.checksum,
        }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

"""Host worker pool: the session control plane sharded across cores.

The reference dedicates one CPU core per stream to the network pump +
demux (espflix.cpp:723-737); a TPU fleet serves thousands of lanes, so
the host side must be O(cores), not O(lanes) on one core.  This module
shards the PlayerSessions across worker PROCESSES by contiguous lane
range.  Each worker owns its lanes end to end -- streamer I/O, TS
demux (native bulk path), ES segmentation, SBC rings, control actions
-- and per tick returns its shard's DEVICE-READY arrays: the
span-sorted slice-row pack + row permutation (exactly the per-shard
format scan_dense.pack_slice_rows_sharded produces) plus the audio
word block.  The parent process only concatenates shard blobs and
dispatches to the device, so its per-tick cost is O(lanes) memcpy, not
O(lanes) Python.

Workers are plain CPU processes (they force JAX_PLATFORMS=cpu before
any import so they can never grab the accelerator); all device work
stays in the parent.  Control actions (seek/pause/trick) and
snapshot/restore route to workers as messages and apply between ticks
-- the same boundary semantics as the chunked dispatch.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import pickle

import numpy as np

__all__ = ["HostPool"]


def _worker_main(conn, lane_lo, lane_hi, words_per_lane, mb_w, mb_h):
    # never let a worker grab the accelerator (or the axon tunnel)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import numpy as np

    from espflix_tpu.audio.sbc import SbcDecoder
    from espflix_tpu.models import mpeg1 as M
    from espflix_tpu.ops import scan_dense as SD
    from espflix_tpu.ops import vlc_scan_pallas as VP
    from espflix_tpu.runtime.player import PlayerSession, State

    n = lane_hi - lane_lo
    sessions = [None] * n
    aud_op = [None]
    dev_win = os.environ.get("ESPFLIX_DEVICE_WINDOWS", "1") != "0"

    def probe(data):
        d = SbcDecoder()
        r = d.parse_frame(data)
        if not r:
            return 0
        return r[1], d.channels, d.blocks

    def gather(F):
        pics = [None] * n
        pts = np.full(n, -1, np.int64)
        pre_errors = np.zeros(n, bool)
        n_i = 0
        for i, s in enumerate(sessions):
            if s is None:
                continue
            s.clock.tick()
            p = s.next_picture()
            if p is None:
                continue
            if p.seq.width != mb_w * 16 or p.seq.height != mb_h * 16:
                pre_errors[i] = True
                s.park(f"geometry {p.seq.width}x{p.seq.height}")
                continue
            if len(p.payload) // 4 + 4 > words_per_lane:
                pre_errors[i] = True
                s.resync()
                continue
            pics[i] = p
            pts[i] = p.pts
            if p.pic_type == 1:
                n_i += 1
        b = M.make_picture_batch(pics, words_per_lane=words_per_lane,
                                 max_slices=mb_h,
                                 geometry=(mb_w, mb_h))
        sl = VP.pack_slice_rows(b, sort_rows=True,
                                device_windows=dev_win)
        perm, dup = SD.row_perm(sl["lane_of_row"], sl["rows"],
                                sl["alive"], n, mb_h)
        pre_errors |= dup | sl["overflow"]

        # audio: group by CHANNELS only (frame sizes are per-lane
        # free; SBC headers are self-describing -- see
        # Fleet._gather_audio_arrays)
        starved = np.zeros(n, bool)
        act = np.zeros(n, bool)
        nval = np.zeros(n, np.int32)
        frames = []
        fs_max = 16
        for i, s in enumerate(sessions):
            if s is None:
                continue
            ring = s.feed.audio
            if not (ring.discover(probe) and ring.frame_size):
                continue
            if aud_op[0] is None and ring.blocks == 16:
                aud_op[0] = ring.channels
            if aud_op[0] is None or ring.blocks != 16 or \
                    ring.channels != aud_op[0]:
                continue
            fa = ring.pop_frames_array(F)
            if fa is None:
                if s.state in (State.PLAYING, State.FAST_FORWARD,
                               State.REWIND) and not s.eos:
                    starved[i] = True
                continue
            act[i] = True
            nval[i] = len(fa)
            fs_max = max(fs_max, fa.shape[1])
            frames.append((i, fa))
        ch = aud_op[0] if aud_op[0] else 1
        fs_q = -(-fs_max // 32) * 32
        arr = np.zeros((n, F, fs_q), np.uint8)
        for i, fa in frames:
            arr[i, :len(fa), :fa.shape[1]] = fa
        rk = (("row_base",) if dev_win else ("words",)) + (
            "start_bits", "rows", "alive", "pic_type", "full_pel",
            "r_size", "lane_of_row")
        out = dict(
            rows={k: sl[k] for k in rk},
            perm=perm, intra_q=b["intra_q"],
            non_intra_q=b["non_intra_q"], active=b["active"],
            pts=pts, pre_errors=pre_errors, n_i=n_i,
            video=np.array([p is not None for p in pics]),
            aud=arr, aud_act=act, aud_nval=nval, starved=starved,
            aud_op=aud_op[0])
        if dev_win:
            # per-LANE payload words; the [rows, win] windows gather
            # on device (~12x fewer IPC + host->device bytes)
            out["lane_words"] = sl["lane_words"]
            out["win"] = sl["win"]
        return out

    while True:
        try:
            msg = conn.recv()
        except (EOFError, KeyboardInterrupt):
            break
        op = msg[0]
        try:
            if op == "stop":
                conn.send(("ok", None))
                break
            elif op == "attach":
                _, lane, url, kwargs = msg
                s = PlayerSession(url, **kwargs)
                ok = s.init_service()
                sessions[lane - lane_lo] = s if ok else None
                conn.send(("ok", ok))
            elif op == "call":
                _, lane, method, args = msg
                s = sessions[lane - lane_lo]
                r = getattr(s, method)(*args) if s is not None else None
                conn.send(("ok", r))
            elif op == "state":
                _, lane = msg
                s = sessions[lane - lane_lo]
                conn.send(("ok", s.state.name if s else None))
            elif op == "gather":
                conn.send(("ok", gather(msg[1])))
            elif op == "present":
                _, pts_arr, err_arr = msg
                resyncs = 0
                for i, s in enumerate(sessions):
                    if s is None or pts_arr[i] < 0:
                        continue
                    s.on_presented(int(pts_arr[i]))
                    if err_arr[i] and s.resync():
                        resyncs += 1
                conn.send(("ok", resyncs))
            elif op == "snapshot":
                conn.send(("ok", [s.snapshot() if s else None
                                  for s in sessions]))
            elif op == "restore":
                _, snaps = msg
                k = sum(bool(sessions[i].restore(sn))
                        for i, sn in enumerate(snaps)
                        if sn is not None and sessions[i] is not None)
                conn.send(("ok", k))
            else:
                conn.send(("err", f"unknown op {op}"))
        except Exception as e:  # noqa: BLE001 - report, keep serving
            conn.send(("err", f"{type(e).__name__}: {e}"))
    conn.close()


class HostPool:
    """W session workers over contiguous lane ranges.

    The worker count is the host-core knob (reference: one core per
    stream by construction; here lanes/W per core).  gather_tick()
    fans out and returns concatenated shard blobs ready for the
    sharded device dispatch."""

    def __init__(self, n_lanes: int, n_workers: int,
                 words_per_lane: int, mb_w: int, mb_h: int):
        assert n_lanes % n_workers == 0
        self.n = n_lanes
        self.w = n_workers
        self.ln = n_lanes // n_workers
        ctx = mp.get_context("spawn")
        self.conns = []
        self.procs = []
        for k in range(n_workers):
            pc, cc = ctx.Pipe()
            p = ctx.Process(
                target=_worker_main,
                args=(cc, k * self.ln, (k + 1) * self.ln,
                      words_per_lane, mb_w, mb_h), daemon=True)
            p.start()
            self.conns.append(pc)
            self.procs.append(p)

    def _rpc(self, k, *msg):
        self.conns[k].send(msg)
        st, r = self.conns[k].recv()
        if st != "ok":
            raise RuntimeError(f"worker {k}: {r}")
        return r

    def _worker_of(self, lane):
        return lane // self.ln

    def attach(self, lane: int, url: str, **kwargs) -> bool:
        return self._rpc(self._worker_of(lane), "attach", lane, url,
                         kwargs)

    def call(self, lane: int, method: str, *args):
        return self._rpc(self._worker_of(lane), "call", lane, method,
                         args)

    def state(self, lane: int):
        return self._rpc(self._worker_of(lane), "state", lane)

    def gather_tick(self, F: int) -> dict:
        """Fan out one tick's gather; returns concatenated blobs in
        the pack_slice_rows_sharded layout (n_shards == n_workers)."""
        for c in self.conns:
            c.send(("gather", F))
        parts = []
        for k, c in enumerate(self.conns):
            st, r = c.recv()
            if st != "ok":
                raise RuntimeError(f"worker {k}: {r}")
            parts.append(r)
        if "lane_words" in parts[0]:
            Wm = max(p["lane_words"].shape[1] for p in parts)
            for p in parts:
                w = p["lane_words"]
                if w.shape[1] < Wm:
                    p["lane_words"] = np.pad(
                        w, ((0, 0), (0, Wm - w.shape[1])))
        else:
            Wp = max(p["rows"]["words"].shape[1] for p in parts)
            for p in parts:
                w = p["rows"]["words"]
                if w.shape[1] < Wp:
                    p["rows"]["words"] = np.pad(
                        w, ((0, 0), (0, Wp - w.shape[1])))
        out = {k: np.concatenate([p["rows"][k] for p in parts])
               for k in parts[0]["rows"]}
        if "lane_words" in parts[0]:
            out["lane_words"] = np.concatenate(
                [p["lane_words"] for p in parts])
            out["win"] = max(p["win"] for p in parts)
        # audio frame widths vary per worker (per-lane frame sizes);
        # zero-pad to the fleet max before concatenating
        Wa = max(p["aud"].shape[2] for p in parts)
        for p in parts:
            a = p["aud"]
            if a.shape[2] < Wa:
                p["aud"] = np.pad(
                    a, ((0, 0), (0, 0), (0, Wa - a.shape[2])))
        for k in ("perm", "intra_q", "non_intra_q", "active", "pts",
                  "pre_errors", "video", "aud", "aud_act", "aud_nval",
                  "starved"):
            out[k] = np.concatenate([p[k] for p in parts])
        out["n_i"] = sum(p["n_i"] for p in parts)
        ops = [p["aud_op"] for p in parts if p["aud_op"]]
        out["aud_op"] = ops[0] if ops else None
        return out

    def present(self, pts, errors) -> int:
        for k, c in enumerate(self.conns):
            c.send(("present", pts[k * self.ln:(k + 1) * self.ln],
                    errors[k * self.ln:(k + 1) * self.ln]))
        return sum(self._recv_ok(k) for k in range(self.w))

    def _recv_ok(self, k):
        st, r = self.conns[k].recv()
        if st != "ok":
            raise RuntimeError(f"worker {k}: {r}")
        return r

    def snapshot(self) -> list:
        for c in self.conns:
            c.send(("snapshot",))
        out = []
        for k in range(self.w):
            out.extend(self._recv_ok(k))
        return out

    def restore(self, snaps: list) -> int:
        for k, c in enumerate(self.conns):
            c.send(("restore", snaps[k * self.ln:(k + 1) * self.ln]))
        return sum(self._recv_ok(k) for k in range(self.w))

    def close(self):
        for c in self.conns:
            try:
                c.send(("stop",))
            except (BrokenPipeError, OSError):
                pass
        for k, c in enumerate(self.conns):
            try:
                c.recv()
            except (EOFError, OSError):
                pass
        for p in self.procs:
            p.join(timeout=5)
            if p.is_alive():
                p.terminate()

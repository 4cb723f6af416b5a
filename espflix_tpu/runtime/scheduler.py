"""Fleet scheduler: N playback sessions through batched device decode.

The scale-out runtime (SURVEY.md 2.3, 7.6): each lane is one
PlayerSession (control plane + bounded network pump); every tick the
fleet gathers at most one complete picture per playing lane, decodes the
whole batch in one jitted device call (optionally shard_map'ed over a
'streams' mesh), distributes presented frames/PTS back to sessions, and
drains SBC audio through the batched audio decoder.  Starved or idle
lanes are masked; a corrupt stream only parks its own lane
(vlc_scan error containment).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from espflix_tpu.audio.sbc import SbcDecoder
from espflix_tpu.models import mpeg1 as M
from espflix_tpu.models import sbc as dsbc
from espflix_tpu.runtime.events import Ev, EventLog, Timers
from espflix_tpu.runtime.player import PlayerSession


@dataclass
class PendingTick:
    """In-flight tick: device work dispatched, host sync deferred.

    Produced by Fleet.tick_submit(); finished by Fleet.tick_collect().
    Between the two calls the device decodes asynchronously (JAX async
    dispatch) while the host is free to pump sessions/network for the
    NEXT tick -- the fleet-level analogue of the reference's 3-stage
    core pipeline (net pump / decode / ISR, espflix.cpp:655-658).
    """
    pics: list
    pts: np.ndarray
    pre_errors: np.ndarray
    presented: object | None         # device arrays (y/u/v) or None
    info: object | None              # device error flags
    audio_device: list               # [(members, out_dev, err_dev, ch)]
    host_pcm: dict
    audio_lanes: np.ndarray
    audio_starved: np.ndarray
    pcm_width: int


@dataclass
class TickResult:
    video_lanes: np.ndarray          # bool[N] lanes with a new frame
    y: np.ndarray
    u: np.ndarray
    v: np.ndarray
    pts: np.ndarray                  # int64[N] (-1 if none)
    errors: np.ndarray               # bool[N]
    audio_lanes: np.ndarray          # bool[N] lanes with new PCM
    pcm: np.ndarray | None           # int16[N, <=F*2*128] (see pcm_samples)
    pcm_samples: np.ndarray | None = None  # int32[N] valid samples per lane
    audio_starved: np.ndarray | None = None  # bool[N] playing lanes that
    # underran their SBC ring this tick; the output stage substitutes
    # PDM silence for them (video.cpp:997-1001)
    audio_errors: np.ndarray | None = None  # bool[N] lanes whose SBC
    # decode flagged an anomaly this tick (the reference reports every
    # one, video.cpp:1013-1014)
    field_sum: np.ndarray | None = None   # int32[N] checksum of both
    # composite fields (full-chain ticks only, runtime/chain.py)
    pdm_sum: np.ndarray | None = None     # int32[N] checksum of the
    # tick's PDM words (full-chain ticks only)
    tap_fields: np.ndarray | None = None  # uint8[tap, 2, L, W] full
    # DAC fields for the tapped lanes
    tap_pdm: np.ndarray | None = None     # int32[tap, S] PDM words


def bucket_policy(need: int, ns_rows: int, *, steps_long: int,
                  steps_short: int, floor: int = 8):
    """Single source of truth for sizing the two-bucket Pallas scan.

    The slice rows are span-sorted, so the long bucket must absorb
    `need` rows (every I picture's rows -- the host knows the picture
    types).  `ns_rows` is the total row count of the batch (lanes x
    mb_height, per shard when sharded).  Policy:

      * long_rows = need rounded up to a power of two (so the number
        of distinct jit variants stays logarithmic), clamped to
        [floor, ns_rows - floor] and at most half the rows;
      * a tick whose long rows exceed half the batch escalates the
        SHORT bucket's budget to the long one instead (uniform
        budget -- correct, just not cheaper).

    Returns (long_rows, steps_long, steps_short).
    """
    if need > ns_rows // 2:
        steps_short = steps_long
    long_rows = M._quantize_pow2(min(need, max(ns_rows // 2, floor)),
                                 floor, max(ns_rows - floor, floor))
    return long_rows, steps_long, steps_short


class Fleet:
    def __init__(self, n_lanes: int, width: int = 352, height: int = 192,
                 words_per_lane: int = 16384, mesh=None,
                 audio_frames_per_tick: int | None = None,
                 tick_rate: float = 30.0,
                 parser: str = "device", output: bool = False,
                 pal: bool = False):
        """parser: 'device' (all-device FSM scan, the north-star
        config), 'pallas' (the slice-parallel VMEM-resident Pallas scan
        kernel; interpreter mode off-TPU) or 'hybrid' (native C++
        entropy decode + device dense phase; faster on hosts with CPU
        headroom).  All bit-exact."""
        self.n = n_lanes
        self.width, self.height = width, height
        self.mb_w, self.mb_h = (width + 15) >> 4, (height + 15) >> 4
        self.words_per_lane = words_per_lane
        # real-time audio provisioning: the reference's audio thread is
        # paced by the 48 kHz DMA clock (video.cpp:990-1004); at
        # tick_rate display ticks/s each lane must drain
        # 48000 / 128 / tick_rate SBC frames per tick (13 at 30 fps)
        # or the ring backs up and starves
        if audio_frames_per_tick is None:
            audio_frames_per_tick = -(-48000 // (128 * int(tick_rate)))
        self.audio_F = audio_frames_per_tick
        self.sessions: list[PlayerSession | None] = [None] * n_lanes
        self.events = EventLog()
        self.timers = Timers()
        # full-path output stage (decode -> composite -> PDM on device,
        # runtime/chain.py); the OutputStage holds the per-lane OSD/
        # animation/beep host state and the modulator device state
        self.pal = pal
        self.output = None
        self._aud_op = None       # discovered channel-count group
        if output:
            from espflix_tpu.runtime.output import OutputStage
            self.output = OutputStage(n_lanes, pal=pal)
        self.frames = M.init_frame_state(n_lanes, self.mb_w * 16,
                                         self.mb_h * 16)
        self.sbc_state = dsbc.init_state(n_lanes)
        self.parser = parser
        # device-side scan-row windowing in run_chunk_full: ship
        # [N, Wm] per-lane words, gather the [NS, win] row windows on
        # device (~12x fewer host->device bytes; ESPFLIX_DEVICE_WINDOWS=0
        # restores host-built windows)
        self._dev_win = os.environ.get(
            "ESPFLIX_DEVICE_WINDOWS", "1") != "0"
        # batched native pops in _gather_pictures (one ctypes call per
        # round fleet-wide); ESPFLIX_BATCHED_POP=0 restores per-lane
        self._batched_pop = os.environ.get(
            "ESPFLIX_BATCHED_POP", "1") != "0"
        # packed pops: native pictures land directly in the device
        # batch layout (no PictureData marshalling on the hot path);
        # ESPFLIX_PACKED_POP=0 restores the classic gather
        self._packed_pop = os.environ.get(
            "ESPFLIX_PACKED_POP", "1") != "0"
        self._packed = None
        if parser == "pallas":
            import jax
            self._pallas_interpret = jax.default_backend() != "tpu"
        if parser == "hybrid":
            from espflix_tpu.tools import oracle as _orc
            if not _orc.available():
                self.parser = "device"
        self.mesh = mesh
        if mesh is not None:
            from espflix_tpu.parallel import mesh as pmesh
            self._decode = pmesh.make_sharded_decoder(
                mesh, mb_width=self.mb_w, mb_height=self.mb_h,
                max_steps=min(words_per_lane * 32, 12000))
            self.frames = pmesh.shard_lane_tree(mesh, self.frames)
        else:
            import functools
            # symbol budget: content peaks at ~9k symbols per I picture
            # at the reference bitrate; the emission log + bulk scatter
            # scale linearly with this budget (the bench uses the same
            # cap), and a pathological picture that exceeds it errors +
            # resyncs like any corrupt lane
            self._decode = functools.partial(
                M.decode_picture_batch, mb_width=self.mb_w,
                mb_height=self.mb_h,
                max_steps=min(words_per_lane * 32, 12000))
        self._probe = self._sbc_probe

    @staticmethod
    def _sbc_probe(data: bytes):
        d = SbcDecoder()
        r = d.parse_frame(data)
        if not r:
            return 0
        return r[1], d.channels, d.blocks

    def attach(self, lane: int, session: PlayerSession):
        self.sessions[lane] = session

    # -- sharded Pallas parser (the production path under a mesh) -------
    def _bucket_params(self, pics, lanes_per_shard: int | None = None):
        """(long_rows, steps_long, steps_short) for this tick's
        picture mix: the long bucket absorbs every I picture's rows
        (per shard when sharded); quantized pow2 so jit variants stay
        logarithmic."""
        n_sh = 1 if lanes_per_shard is None else \
            self.n // lanes_per_shard
        ln = lanes_per_shard or self.n
        need = 8
        for s in range(n_sh):
            n_i = sum(1 for p in pics[s * ln:(s + 1) * ln]
                      if p is not None and p.pic_type == 1)
            need = max(need, n_i * self.mb_h)
        return bucket_policy(need, ln * self.mb_h, steps_long=1024,
                             steps_short=384, floor=1)

    def _get_sharded_pallas(self, long_rows, steps_long, steps_short,
                            chunked: bool):
        key = (long_rows, steps_long, steps_short, chunked)
        cache = getattr(self, "_spd_cache", None)
        if cache is None:
            cache = self._spd_cache = {}
        if key in cache:
            return cache[key]
        from espflix_tpu.parallel import mesh as pmesh
        dec = pmesh.make_sharded_pallas_decoder(
            self.mesh, mb_width=self.mb_w, mb_height=self.mb_h,
            long_rows=long_rows, steps_long=steps_long,
            steps_short=steps_short,
            interpret=self._pallas_interpret)
        if not chunked:
            cache[key] = dec
            return dec

        import jax as _j

        rowk = ("words", "start_bits", "rows", "alive", "pic_type",
                "full_pel", "r_size", "lane_of_row", "perm")

        @_j.jit
        def chunk_fn(stacked, frames):
            def body(fr, xs):
                fr, pres, info = dec(
                    *(xs[k] for k in rowk), xs["intra_q"],
                    xs["non_intra_q"], xs["active"], fr)
                return fr, (pres, info["error"])
            frames, (pres, errs) = _j.lax.scan(body, frames, stacked)
            return frames, pres, errs

        cache[key] = chunk_fn
        return chunk_fn

    def _pack_sharded(self, pics, b):
        """(row_args numpy dict incl. perm, dup) for the mesh parser."""
        from espflix_tpu.ops import scan_dense as SD
        n_sh = self.mesh.shape["streams"]
        sl, dup = SD.pack_slice_rows_sharded(b, n_sh, self.mb_h)
        # overflow is per lane (concatenated across shards): contain
        # those lanes exactly like duplicates (error -> resync)
        return sl, dup | sl["overflow"]

    # -- fleet checkpoint/restore (SURVEY.md 5.4) -----------------------
    def snapshot(self) -> list:
        return [s.snapshot() if s is not None else None
                for s in self.sessions]

    def restore(self, snaps: list) -> int:
        ok = 0
        for i, snap in enumerate(snaps):
            if snap is not None and self.sessions[i] is not None:
                ok += bool(self.sessions[i].restore(snap))
        return ok

    # -- one decode tick ------------------------------------------------
    def tick(self, decode_audio: bool = True,
             fetch_frames: bool = True) -> TickResult:
        """Synchronous tick: submit + collect back-to-back."""
        return self.tick_collect(self.tick_submit(decode_audio),
                                 fetch_frames=fetch_frames)

    def run_pipelined(self, n_ticks: int,
                      decode_audio: bool = True,
                      fetch_frames: bool = True) -> list[TickResult]:
        """Run n_ticks with host/device overlap: tick t+1's host work
        (session pump, network reads, batch assembly, dispatch) runs
        while the device still computes tick t.  Mirrors the
        reference's pipelined cores (decode on core 0 while core 1
        pumps the network, espflix.cpp:655-658, 886-1010)."""
        results = []
        pend = self.tick_submit(decode_audio)
        for _ in range(n_ticks - 1):
            nxt = self.tick_submit(decode_audio)
            results.append(self.tick_collect(pend,
                                             fetch_frames=fetch_frames))
            pend = nxt
        results.append(self.tick_collect(pend, fetch_frames=fetch_frames))
        return results

    def _batched_next_pictures(self):
        """Fast path for native-feed lanes: one sf_pop_pictures call
        per round for the whole fleet instead of 2 ctypes calls per
        lane (runtime/session.py next_picture semantics, identical
        per-lane op order: pop, pump on miss, pop again, DONE at EOS).
        Returns {lane: PictureData|None} covering every lane it
        handled, or None when the fast path is unavailable."""
        if not self._batched_pop:
            return None
        from espflix_tpu.runtime.player import PlayerSession
        from espflix_tpu.runtime.player import State as St
        from espflix_tpu.streaming.native_feed import (NativeStreamFeed,
                                                       pop_many)
        pump_states = (St.PLAYING, St.FAST_FORWARD, St.REWIND)
        # next_picture stays the per-session extension point: any
        # override (subclass or instance patch) opts that lane out of
        # the batched path
        pending = [
            (i, s) for i, s in enumerate(self.sessions)
            if s is not None and s.state in pump_states
            and isinstance(s.feed, NativeStreamFeed)
            and "next_picture" not in s.__dict__
            and type(s).next_picture is PlayerSession.next_picture]
        if not pending:
            return None
        got = {i: None for i, _ in pending}
        for _ in range(64):                  # next_picture max_pumps
            if not pending:
                break
            res = pop_many([s.feed for _, s in pending])
            nxt = []
            for (i, s), p in zip(pending, res):
                if p is not None:
                    got[i] = p
                elif s.pump():
                    nxt.append((i, s))
                else:
                    p = s.feed.pop_picture()
                    if p is None:
                        s.state = St.DONE
                        s.save_pos(False)
                    got[i] = p
            pending = nxt
        return got

    def _gather_pictures(self):
        """One display-tick of host work: advance every session's
        presentation clock, pull at most one complete picture per lane,
        and apply the geometry/oversize containment policies."""
        n = self.n
        pics = [None] * n
        pts = np.full(n, -1, np.int64)
        # one tick = one display frame interval: advance every session's
        # presentation clock (the ISR frame counter, video.cpp:1165)
        for s in self.sessions:
            if s is not None:
                s.clock.tick()
        pre_errors = np.zeros(n, bool)
        got = self._batched_next_pictures()
        for i, s in enumerate(self.sessions):
            if s is None:
                continue
            p = got[i] if got is not None and i in got \
                else s.next_picture()
            if p is None:
                continue
            if p.seq.width != self.width or p.seq.height != self.height:
                # a stream of the wrong geometry can never decode into
                # this fleet's frame planes: flag and park the lane
                # (attach it to a fleet of its geometry to revive it)
                self.events.log(Ev.LANE_GEOMETRY, i,
                                value=(p.seq.width << 16) | p.seq.height)
                pre_errors[i] = True
                s.park(f"geometry {p.seq.width}x{p.seq.height} != "
                       f"fleet {self.width}x{self.height}")
                # structured geometry for the router (runtime/router.py)
                s.park_geometry = (p.seq.width, p.seq.height)
                continue
            if (len(p.payload) + 3) // 4 + 4 > self.words_per_lane:
                # transient oversize picture: drop it, flag the lane and
                # re-seek to the next random-access point so decode state
                # stays consistent (SURVEY.md 5.3)
                self.events.log(Ev.LANE_OVERSIZE, i,
                                value=len(p.payload))
                pre_errors[i] = True
                if s.resync():
                    self.events.log(Ev.LANE_RESYNC, i)
                continue
            pics[i] = p
            pts[i] = p.pts
        return pics, pts, pre_errors

    # -- packed gather (native pops straight into the batch layout) ----
    def _ensure_packed(self):
        if getattr(self, "_packed", None) is None:
            from espflix_tpu.streaming.native_feed import PackedBatch
            self._packed = PackedBatch(self.n, self.words_per_lane,
                                       self.mb_h, self.mb_w, self.mb_h)
        return self._packed

    def _packed_policies(self, i, s, width, height, payload_words,
                         n_slices, pre_errors) -> bool:
        """Geometry / oversize / slice-capacity containment shared by
        the packed fast path and its per-lane merge fallback.  Returns
        True when the picture may enter the batch."""
        if width != self.width or height != self.height:
            self.events.log(Ev.LANE_GEOMETRY, i,
                            value=(width << 16) | height)
            pre_errors[i] = True
            s.park(f"geometry {width}x{height} != "
                   f"fleet {self.width}x{self.height}")
            s.park_geometry = (width, height)
            return False
        if payload_words + 4 > self.words_per_lane \
                or n_slices > self.mb_h:
            self.events.log(Ev.LANE_OVERSIZE, i,
                            value=payload_words * 4)
            pre_errors[i] = True
            if s.resync():
                self.events.log(Ev.LANE_RESYNC, i)
            return False
        return True

    def _gather_batch_packed(self):
        """Packed twin of _gather_pictures + make_picture_batch: one
        sf_pop_pictures_packed call per pump round writes every popped
        payload straight into the fleet's persistent batch buffers
        (EOS pad + byteswap + stale-row zeroing in C++), so the tick's
        host cost has no PictureData marshalling and no per-lane word
        packing.  Returns (batch_dict, pts, pre_errors) or None when
        the fast path is unavailable (no native lanes / disabled) --
        the caller falls back to the classic gather."""
        if not (self._batched_pop and getattr(self, "_packed_pop", True)):
            return None
        from espflix_tpu.runtime.player import PlayerSession
        from espflix_tpu.runtime.player import State as St
        from espflix_tpu.streaming import native_feed as NF
        if not NF.available():
            return None
        pump_states = (St.PLAYING, St.FAST_FORWARD, St.REWIND)
        fast, slow = [], []
        for i, s in enumerate(self.sessions):
            if s is None:
                continue
            if (s.state in pump_states
                    and isinstance(s.feed, NF.NativeStreamFeed)
                    and "next_picture" not in s.__dict__
                    and type(s).next_picture
                    is PlayerSession.next_picture):
                fast.append((i, s))
            else:
                slow.append((i, s))
        if not fast:
            return None
        pb = self._ensure_packed()
        for s in self.sessions:
            if s is not None:
                s.clock.tick()
        pb.begin_tick()
        pre_errors = np.zeros(self.n, bool)
        NFM = NF  # meta field indices
        from espflix_tpu.runtime.player import READ_CHUNK
        pending = fast
        for _ in range(64):                  # next_picture max_pumps
            if not pending:
                break
            feeds = [s.feed for _, s in pending]
            slots = [i for i, _ in pending]
            rc, meta, iq8, nq8 = NF.pop_many_packed(pb, feeds, slots)
            # -- vectorized happy path: rc==1, geometry and capacity
            # ok -> the batch-row writes are numpy fancy-assigns; only
            # exceptional lanes (policy hits, capacity retries, q-table
            # refreshes) run per-lane Python
            slots_a = np.asarray(slots, np.int32)
            got = rc == 1
            if got.any():
                assert (meta[got, NFM.M_WIDTH] > 0).all(), \
                    "picture before sequence header"
                okg = ((meta[:, NFM.M_WIDTH] == self.width)
                       & (meta[:, NFM.M_HEIGHT] == self.height))
                okc = (((meta[:, NFM.M_PAYLOAD_LEN] + 3) // 4 + 4
                        <= self.words_per_lane)
                       & (meta[:, NFM.M_NSLICES] <= self.mb_h))
                good = got & okg & okc
                nlanes = np.fromiter((f._lane for f in feeds),
                                     np.int64, len(feeds))
                keys = (nlanes << 44) | meta[:, NFM.M_SEQ_COUNTER]
                for k in np.flatnonzero(good
                                        & (pb.qkey[slots_a] != keys)):
                    m = meta[k]
                    pb.set_queues(slots[k], feeds[k],
                                  bool(m[NFM.M_HAS_IQ]),
                                  bool(m[NFM.M_HAS_NQ]), iq8[k],
                                  nq8[k], int(m[NFM.M_SEQ_COUNTER]),
                                  qkey=int(keys[k]))
                si = slots_a[good]
                pb.pic_type[si] = meta[good, NFM.M_PTYPE]
                pb.full_pel[si] = meta[good, NFM.M_FULL_PEL]
                pb.r_size[si] = np.maximum(meta[good, NFM.M_R_SIZE], 0)
                pb.n_slices[si] = meta[good, NFM.M_NSLICES]
                pb.active[si] = True
                pb.pts[si] = meta[good, NFM.M_PTS]
                for k in np.flatnonzero(got & ~(okg & okc)):
                    # consumed but rejected: policy events + park/resync
                    m = meta[k]
                    self._packed_policies(
                        slots[k], pending[k][1], int(m[NFM.M_WIDTH]),
                        int(m[NFM.M_HEIGHT]),
                        (int(m[NFM.M_PAYLOAD_LEN]) + 3) // 4,
                        int(m[NFM.M_NSLICES]), pre_errors)
            nxt = []
            pump_io: list[tuple[int, object]] = []
            for k in np.flatnonzero(~got):
                i, s = pending[k]
                r = int(rc[k])
                if r < 0:
                    # capacity: the picture was NOT consumed; pop it
                    # through the growable scratch path and apply the
                    # same containment policies
                    p = s.feed.pop_picture()
                    if p is not None and self._packed_policies(
                            i, s, p.seq.width, p.seq.height,
                            (len(p.payload) + 3) // 4,
                            len(p.slice_offsets), pre_errors):
                        pb.merge_picture(i, p)
                else:
                    pump_io.append((i, s))
            # one streamer read per starved lane, ONE native feed call
            # for the round (sf_feed_many); pump() stays the per-lane
            # override point -- patched sessions pump classically
            bat_f, bat_d = [], []
            for i, s in pump_io:
                if ("pump" in s.__dict__
                        or type(s).pump is not PlayerSession.pump):
                    if s.pump():
                        nxt.append((i, s))
                        continue
                    pumped = False
                elif s.eos:
                    pumped = False
                else:
                    data = s.streamer.read(READ_CHUNK)
                    if data:
                        bat_f.append(s.feed)
                        bat_d.append(data)
                        nxt.append((i, s))
                        continue
                    s.feed.eos()
                    s.eos = True
                    pumped = False
                if not pumped:
                    p = s.feed.pop_picture()
                    if p is None:
                        s.state = St.DONE
                        s.save_pos(False)
                    elif self._packed_policies(
                            i, s, p.seq.width, p.seq.height,
                            (len(p.payload) + 3) // 4,
                            len(p.slice_offsets), pre_errors):
                        pb.merge_picture(i, p)
            NF.feed_many(bat_f, bat_d)
            pending = nxt
        for i, s in slow:
            p = s.next_picture()
            if p is not None and self._packed_policies(
                    i, s, p.seq.width, p.seq.height,
                    (len(p.payload) + 3) // 4, len(p.slice_offsets),
                    pre_errors):
                pb.merge_picture(i, p)
        return pb.batch_dict(), pb.pts.copy(), pre_errors

    def tick_submit(self, decode_audio: bool = True) -> PendingTick:
        n = self.n
        pics, pts, pre_errors = self._gather_pictures()

        active_any = any(p is not None for p in pics)
        presented = info = None
        if active_any and self.parser == "hybrid" and self.mesh is None:
            self.events.log(Ev.DECODE_BATCH,
                            value=int(sum(p is not None for p in pics)))
            iq = np.stack([p.seq.intra_q if p is not None
                           else np.zeros(64, np.int32) for p in pics])
            nq = np.stack([p.seq.non_intra_q if p is not None
                           else np.zeros(64, np.int32) for p in pics])
            with self.timers.measure("device_decode"):
                self.frames, presented, info = \
                    M.decode_picture_batch_hybrid(
                        pics, iq, nq, self.frames,
                        mb_width=self.mb_w, mb_height=self.mb_h)
        elif active_any and self.parser == "pallas" and self.mesh is None:
            self.events.log(Ev.DECODE_BATCH,
                            value=int(sum(p is not None for p in pics)))
            with self.timers.measure("batch_assemble"):
                b = M.make_picture_batch(
                    pics, words_per_lane=self.words_per_lane,
                    max_slices=self.mb_h,
                    geometry=(self.mb_w, self.mb_h))
            with self.timers.measure("device_decode"):
                self.frames, presented, info = \
                    M.decode_picture_batch_sliced(
                        b, self.frames, mb_width=self.mb_w,
                        mb_height=self.mb_h,
                        interpret=self._pallas_interpret)
        elif active_any and self.parser == "pallas":
            # production Pallas parser under the mesh: per-shard
            # span-sorted rows, shard-local scan + matmul scatter
            from espflix_tpu.parallel import mesh as pmesh
            self.events.log(Ev.DECODE_BATCH,
                            value=int(sum(p is not None for p in pics)))
            n_sh = self.mesh.shape["streams"]
            with self.timers.measure("batch_assemble"):
                b = M.make_picture_batch(
                    pics, words_per_lane=self.words_per_lane,
                    max_slices=self.mb_h,
                    geometry=(self.mb_w, self.mb_h))
                sl, dup = self._pack_sharded(pics, b)
                params = self._bucket_params(pics, self.n // n_sh)
                row_args = tuple(
                    pmesh.shard_lane_tree(self.mesh, jnp.asarray(sl[k]))
                    for k in ("words", "start_bits", "rows", "alive",
                              "pic_type", "full_pel", "r_size",
                              "lane_of_row", "perm"))
                lane_args = tuple(
                    pmesh.shard_lane_tree(self.mesh, jnp.asarray(b[k]))
                    for k in ("intra_q", "non_intra_q", "active"))
            dec = self._get_sharded_pallas(*params, chunked=False)
            with self.timers.measure("device_decode"):
                self.frames, presented, info = dec(
                    *row_args, *lane_args, self.frames)
            pre_errors = pre_errors | dup
        elif active_any:
            self.events.log(Ev.DECODE_BATCH,
                            value=int(sum(p is not None for p in pics)))
            with self.timers.measure("batch_assemble"):
                b = M.make_picture_batch(
                    pics, words_per_lane=self.words_per_lane,
                    max_slices=self.mb_h,
                    )
                args = tuple(jnp.asarray(b[k]) for k in (
                    "words", "slice_starts", "slice_rows", "n_slices",
                    "pic_type", "full_pel", "r_size", "intra_q",
                    "non_intra_q", "active"))
                if self.mesh is not None:
                    from espflix_tpu.parallel import mesh as pmesh
                    args = tuple(pmesh.shard_lane_tree(self.mesh, a)
                                 for a in args)
            with self.timers.measure("device_decode"):
                self.frames, presented, info = self._decode(
                    *args, self.frames)

        # -- audio ---------------------------------------------------------
        # Lanes group by operating point (frame_size, channels); each
        # group decodes in ONE fleet-width jitted call (inactive lanes
        # masked) so shapes stay stable across ticks.  Partial tails
        # batch via per-lane n_valid masking; only frames the device
        # model rejects (blocks != 16) detour to the host decoder, and
        # that PCM is merged into the tick output too.  Playing lanes
        # that underran are reported in audio_starved so the output
        # stage can substitute PDM silence (video.cpp:997-1001).
        (audio_device, host_pcm, audio_lanes, audio_starved,
         pcm_width) = self._submit_audio(decode_audio)

        return PendingTick(pics, pts, pre_errors, presented, info,
                           audio_device, host_pcm, audio_lanes,
                           audio_starved, pcm_width)

    def _submit_audio(self, decode_audio: bool):
        """Gather one tick's SBC frames from every lane's ring and
        dispatch the batched device decode (async); host-only frames
        and starvation flags are returned alongside."""
        n = self.n
        from espflix_tpu.runtime.player import State
        audio_lanes = np.zeros(n, bool)
        audio_starved = np.zeros(n, bool)
        audio_device = []
        host_pcm: dict[int, np.ndarray] = {}
        pcm_width = 0
        if decode_audio:
            F = self.audio_F
            groups: dict[tuple[int, int], list[tuple[int, list]]] = {}
            for i, s in enumerate(self.sessions):
                if s is None:
                    continue
                ring = s.feed.audio
                if not (ring.discover(self._probe) and ring.frame_size):
                    continue
                if ring.blocks == 16:
                    fa = ring.pop_frames_array(F)
                    if fa is None:
                        if s.state in (State.PLAYING,
                                       State.FAST_FORWARD,
                                       State.REWIND) and not s.eos:
                            audio_starved[i] = True
                            self.events.log(Ev.AUDIO_STARVED, i)
                        continue
                    groups.setdefault(
                        (ring.frame_size, ring.channels), []) \
                        .append((i, fa))
                else:
                    # nonstandard block count: host scalar decode
                    fr = ring.pop_frames(F)
                    if not fr:
                        if s.state in (State.PLAYING,
                                       State.FAST_FORWARD,
                                       State.REWIND) and not s.eos:
                            audio_starved[i] = True
                            self.events.log(Ev.AUDIO_STARVED, i)
                        continue
                    s._host_audio = getattr(s, "_host_audio",
                                            SbcDecoder())
                    out = []
                    for f in fr:
                        r = s._host_audio.decode_frame(f)
                        if r:
                            out.append(r[0])
                    if out:
                        host_pcm[i] = np.concatenate(out)
            if groups or host_pcm:
                pcm_width = max(
                    [F * ch * 128 for (_, ch) in groups] +
                    [len(p) for p in host_pcm.values()])
            for (fs, ch), members in groups.items():
                arr = np.zeros((n, F, fs), np.uint8)
                nval = np.zeros(n, np.int32)
                act = np.zeros(n, bool)
                for i, fa in members:
                    nval[i] = len(fa)
                    act[i] = True
                    arr[i, :len(fa)] = fa
                words = jnp.asarray(dsbc.frames_to_words(arr))
                with self.timers.measure("audio_decode"):
                    out, self.sbc_state, err, _ = \
                        dsbc.decode_frames_batched(
                            words, self.sbc_state,
                            active=jnp.asarray(act),
                            n_valid=jnp.asarray(nval),
                            n_frames=F, channels=ch)
                audio_device.append((members, out, err, ch))

        return (audio_device, host_pcm, audio_lanes, audio_starved,
                pcm_width)

    def tick_collect(self, pend: PendingTick,
                     fetch_frames: bool = True) -> TickResult:
        """Host-sync an in-flight tick and run the control-plane
        follow-ups (presentation bookkeeping, error resync, PCM merge).

        fetch_frames=False leaves y/u/v as DEVICE arrays in the
        TickResult (np.asarray them on demand): in the serving shape
        the decoded planes feed the on-device output stage, and only
        the per-lane control words (pts/errors, a few bytes) need the
        host -- transferring ~100 KB/lane of planes every tick is pure
        overhead there (and catastrophically slow over a tunneled
        device transport).
        """
        n = self.n
        pics = pend.pics
        if pend.presented is not None:
            with self.timers.measure("host_sync"):
                if fetch_frames:
                    y = np.asarray(pend.presented["y"])
                    u = np.asarray(pend.presented["u"])
                    v = np.asarray(pend.presented["v"])
                else:
                    y = pend.presented["y"]
                    u = pend.presented["u"]
                    v = pend.presented["v"]
                errors = np.asarray(pend.info["error"])
        else:
            h, w = self.mb_h * 16, self.mb_w * 16
            y = np.zeros((n, h, w), np.uint8)
            u = np.zeros((n, h // 2, w // 2), np.uint8)
            v = np.zeros((n, h // 2, w // 2), np.uint8)
            errors = np.zeros(n, bool)

        video_lanes = np.array([p is not None for p in pics])
        for i, p in enumerate(pics):
            if p is not None and self.sessions[i] is not None:
                self.sessions[i].on_presented(p.pts)
                if errors[i]:
                    # contain + recover: re-seek the lane to the next
                    # random-access point (SURVEY.md 5.3)
                    self.events.log(Ev.LANE_ERROR, i)
                    if self.sessions[i].resync():
                        self.events.log(Ev.LANE_RESYNC, i)

        audio_lanes = pend.audio_lanes
        audio_errors = np.zeros(n, bool)
        pcm = None
        pcm_samples = np.zeros(n, np.int32)
        if pend.pcm_width:
            pcm = np.zeros((n, pend.pcm_width), np.int16)
        for members, out, err_dev, ch in pend.audio_device:
            outn = np.asarray(out)
            errn = np.asarray(err_dev)
            if errn.ndim > 1:     # per-frame flags -> per-lane any
                errn = errn.any(axis=tuple(range(1, errn.ndim)))
            per = ch * 128
            for i, fr in members:
                k = len(fr) * per
                pcm[i, :k] = outn[i, :k]
                pcm_samples[i] = k
                audio_lanes[i] = True
                if errn[i]:
                    audio_errors[i] = True
                    self.events.log(Ev.AUDIO_ERROR, i)
        for i, p in pend.host_pcm.items():
            pcm[i, :len(p)] = p
            pcm_samples[i] = len(p)
            audio_lanes[i] = True

        errors = errors | pend.pre_errors
        return TickResult(video_lanes, y, u, v, pend.pts, errors,
                          audio_lanes, pcm, pcm_samples,
                          pend.audio_starved, audio_errors)

    # -- chunked decode: K ticks in ONE device dispatch ------------------
    def run_chunk(self, n_ticks: int,
                  decode_audio: bool = True,
                  fetch_frames: bool = True) -> list["TickResult"]:
        """Decode up to one picture per lane for `n_ticks` consecutive
        ticks inside a single jitted lax.scan (frame state carried on
        device, one dispatch + one host sync per chunk).

        This amortizes per-picture dispatch overhead the way the bench
        pipeline does -- the serving-side analogue of the reference
        decoder's free-running GOP loop (player.cpp:1355-1367).
        Control-plane effects (presentation bookkeeping, error resync)
        apply after the chunk, so seek/trick actions gain up to
        n_ticks of latency; audio still decodes per tick (its batched
        call is cheap and its ring drains at tick rate).

        Falls back to per-tick dispatch for hybrid and for
        mesh+device configurations; mesh+pallas chains the sharded
        parser inside the scan (zero data-path ICI per shard).
        """
        if self.parser == "hybrid" or (
                self.mesh is not None and self.parser != "pallas"):
            return [self.tick(decode_audio, fetch_frames=fetch_frames)
                    for _ in range(n_ticks)]
        if self.mesh is not None:
            return self._run_chunk_mesh_pallas(
                n_ticks, decode_audio, fetch_frames)

        import jax
        import jax.numpy as jnp

        gathered = []
        batches = []
        audio = []
        for _ in range(n_ticks):
            pics, pts, pre_errors = self._gather_pictures()
            gathered.append((pics, pts, pre_errors))
            with self.timers.measure("batch_assemble"):
                batches.append(M.make_picture_batch(
                    pics, words_per_lane=self.words_per_lane,
                    max_slices=self.mb_h,
                    geometry=(self.mb_w, self.mb_h)))
            audio.append(self._submit_audio(decode_audio))

        keys = ("words", "slice_starts", "slice_rows", "n_slices",
                "pic_type", "full_pel", "r_size", "intra_q",
                "non_intra_q", "active")
        stacked = {k: jnp.asarray(np.stack([b[k] for b in batches]))
                   for k in keys}
        self.events.log(Ev.DECODE_BATCH, value=sum(
            int(b["active"].sum()) for b in batches))

        if self.parser == "pallas":
            from espflix_tpu.ops import vlc_scan_pallas as VP
            sls = [VP.pack_slice_rows(b, sort_rows=True)
                   for b in batches]
            Wp = max(sl["words"].shape[1] for sl in sls)
            for sl in sls:
                w = sl["words"]
                if w.shape[1] < Wp:
                    sl["words"] = np.pad(
                        w, ((0, 0), (0, Wp - w.shape[1])))
            skeys = ("words", "start_bits", "rows", "alive",
                     "pic_type", "full_pel", "r_size", "lane_of_row")
            sstk = {k: jnp.asarray(np.stack([sl[k] for sl in sls]))
                    for k in skeys}
            sstk.update({k: stacked[k]
                         for k in ("intra_q", "non_intra_q", "active")})
            NS = sls[0]["span"].shape[0]
            # the long bucket must absorb every I picture's rows (the
            # host knows picture types; span sorting puts them first);
            # the old bits-based heuristic (span*32 > budget) was so
            # conservative it pushed every P slice long too
            need = max((sum(1 for p in pics
                            if p is not None and p.pic_type == 1)
                        * self.mb_h
                        for (pics, _, _) in gathered), default=8)
            need = max(need, 8)
            long_rows, steps_long, steps_short = bucket_policy(
                need, NS, steps_long=2048, steps_short=512)
            with self.timers.measure("device_decode"):
                self.frames, pres, errs = _chunk_decode_pallas(
                    sstk, self.frames, mb_width=self.mb_w,
                    mb_height=self.mb_h, n_lanes=self.n,
                    long_rows=long_rows,
                    steps_long=steps_long, steps_short=steps_short,
                    interpret=self._pallas_interpret)
            ov = np.stack([sl_ov for sl_ov in
                           (sl["overflow"] for sl in sls)])
        else:
            with self.timers.measure("device_decode"):
                self.frames, pres, errs = _chunk_decode_device(
                    stacked, self.frames, mb_width=self.mb_w,
                    mb_height=self.mb_h,
                    max_steps=min(self.words_per_lane * 32, 12000))
            ov = None

        with self.timers.measure("host_sync"):
            if fetch_frames:
                ys = np.asarray(pres["y"])
                us = np.asarray(pres["u"])
                vs = np.asarray(pres["v"])
            else:
                ys, us, vs = pres["y"], pres["u"], pres["v"]
            errs = np.asarray(errs)
        if ov is not None:
            errs = errs | ov

        results = []
        for t, (pics, pts, pre_errors) in enumerate(gathered):
            video_lanes = np.array([p is not None for p in pics])
            errors = errs[t].copy()
            for i, p in enumerate(pics):
                if p is not None and self.sessions[i] is not None:
                    self.sessions[i].on_presented(p.pts)
                    if errors[i]:
                        self.events.log(Ev.LANE_ERROR, i)
                        if self.sessions[i].resync():
                            self.events.log(Ev.LANE_RESYNC, i)
            (audio_device, host_pcm, audio_lanes, audio_starved,
             pcm_width) = audio[t]
            audio_errors = np.zeros(self.n, bool)
            pcm = None
            pcm_samples = np.zeros(self.n, np.int32)
            if pcm_width:
                pcm = np.zeros((self.n, pcm_width), np.int16)
            for members, out, err_dev, ch in audio_device:
                outn = np.asarray(out)
                errn = np.asarray(err_dev)
                if errn.ndim > 1:
                    errn = errn.any(axis=tuple(range(1, errn.ndim)))
                per = ch * 128
                for i, fr in members:
                    k = len(fr) * per
                    pcm[i, :k] = outn[i, :k]
                    pcm_samples[i] = k
                    audio_lanes[i] = True
                    if errn[i]:
                        audio_errors[i] = True
                        self.events.log(Ev.AUDIO_ERROR, i)
            for i, p in host_pcm.items():
                pcm[i, :len(p)] = p
                pcm_samples[i] = len(p)
                audio_lanes[i] = True
            results.append(TickResult(
                video_lanes, ys[t], us[t], vs[t], pts,
                errors | pre_errors, audio_lanes, pcm, pcm_samples,
                audio_starved, audio_errors))
        return results


    def _run_chunk_mesh_pallas(self, n_ticks: int, decode_audio: bool,
                               fetch_frames: bool) -> list["TickResult"]:
        """run_chunk for mesh + pallas: K ticks of the sharded
        production parser chained in one lax.scan dispatch."""
        from espflix_tpu.parallel import mesh as pmesh
        n_sh = self.mesh.shape["streams"]
        rowk = ("words", "start_bits", "rows", "alive", "pic_type",
                "full_pel", "r_size", "lane_of_row", "perm")
        gathered = []
        packs = []
        audio = []
        dup_any = np.zeros(self.n, bool)
        all_pics = []
        for _ in range(n_ticks):
            pics, pts, pre_errors = self._gather_pictures()
            gathered.append((pics, pts, pre_errors))
            all_pics.append(pics)
            with self.timers.measure("batch_assemble"):
                b = M.make_picture_batch(
                    pics, words_per_lane=self.words_per_lane,
                    max_slices=self.mb_h,
                    geometry=(self.mb_w, self.mb_h))
                sl, dup = self._pack_sharded(pics, b)
            sl["intra_q"] = b["intra_q"]
            sl["non_intra_q"] = b["non_intra_q"]
            sl["active"] = b["active"]
            packs.append(sl)
            dup_any |= dup
            audio.append(self._submit_audio(decode_audio))
        Wp = max(p["words"].shape[1] for p in packs)
        for p in packs:
            w = p["words"]
            if w.shape[1] < Wp:
                p["words"] = np.pad(w, ((0, 0), (0, Wp - w.shape[1])))
        keys = rowk + ("intra_q", "non_intra_q", "active")
        stacked = pmesh.shard_axis1_tree(self.mesh, {
            k: jnp.asarray(np.stack([p[k] for p in packs]))
            for k in keys})
        self.events.log(Ev.DECODE_BATCH, value=sum(
            int(p["active"].sum()) for p in packs))
        per_tick = [self._bucket_params(pics, self.n // n_sh)
                    for pics in all_pics]
        params = (max(p[0] for p in per_tick),
                  max(p[1] for p in per_tick),
                  max(p[2] for p in per_tick))
        chunk_fn = self._get_sharded_pallas(*params, chunked=True)
        with self.timers.measure("device_decode"):
            self.frames, pres, errs = chunk_fn(stacked, self.frames)
        with self.timers.measure("host_sync"):
            if fetch_frames:
                ys = np.asarray(pres["y"])
                us = np.asarray(pres["u"])
                vs = np.asarray(pres["v"])
            else:
                ys, us, vs = pres["y"], pres["u"], pres["v"]
            errs = np.asarray(errs) | dup_any[None, :]
        results = []
        for t, (pics, pts, pre_errors) in enumerate(gathered):
            video_lanes = np.array([p is not None for p in pics])
            errors = errs[t].copy()
            for i, p in enumerate(pics):
                if p is not None and self.sessions[i] is not None:
                    self.sessions[i].on_presented(p.pts)
                    if errors[i]:
                        self.events.log(Ev.LANE_ERROR, i)
                        if self.sessions[i].resync():
                            self.events.log(Ev.LANE_RESYNC, i)
            (audio_device, host_pcm, audio_lanes, audio_starved,
             pcm_width) = audio[t]
            audio_errors = np.zeros(self.n, bool)
            pcm = None
            pcm_samples = np.zeros(self.n, np.int32)
            if pcm_width:
                pcm = np.zeros((self.n, pcm_width), np.int16)
            for members, out, err_dev, ch in audio_device:
                outn = np.asarray(out)
                errn = np.asarray(err_dev)
                if errn.ndim > 1:
                    errn = errn.any(axis=tuple(range(1, errn.ndim)))
                per = ch * 128
                for i, fr in members:
                    k = len(fr) * per
                    pcm[i, :k] = outn[i, :k]
                    pcm_samples[i] = k
                    audio_lanes[i] = True
                    if errn[i]:
                        audio_errors[i] = True
                        self.events.log(Ev.AUDIO_ERROR, i)
            for i, p in host_pcm.items():
                pcm[i, :len(p)] = p
                pcm_samples[i] = len(p)
                audio_lanes[i] = True
            results.append(TickResult(
                video_lanes, ys[t], us[t], vs[t], pts,
                errors | pre_errors, audio_lanes, pcm, pcm_samples,
                audio_starved, audio_errors))
        return results

    # -- full-path chunk: decode + composite + PDM on device -------------
    def _update_osd(self):
        """Per-tick OSD glue (espflix.cpp:862-884): refresh the time
        readout + progress bar for lanes showing the overlay."""
        from espflix_tpu.runtime.player import State
        out = self.output
        for i, s in enumerate(self.sessions):
            if s is None or out.blend[i] == 0:
                continue
            if s.state not in (State.PLAYING, State.PAUSED,
                               State.FAST_FORWARD, State.REWIND):
                continue
            ti = s.info.get(s.nav_index)
            if not ti or not ti.idx_hdr:
                continue
            icon = out.icon_for(s.speed, s.state == State.PAUSED)
            out.update_progress(i, ti.pos, ti.idx_hdr.video.last_pts,
                                icon)

    def _gather_audio_arrays(self, F: int):
        """One tick of SBC frames as fixed-shape device inputs for the
        chain.  Lanes group by CHANNEL COUNT only (first discovered
        16-block lane sets the group): frame SIZE varies freely per
        lane -- SBC frames are self-describing (bitpool / allocation
        parse from each frame's header, models/sbc.py
        decode_frames_batched), so lanes at different bitrates batch
        together, padded to the tick's max frame size (quantized to 32
        bytes so jit variants stay bounded).  A lane whose channel or
        block count differs from the group is OBSERVABLY silent in the
        chain: Ev.AUDIO_OP_POINT fires (the reference decodes whatever
        arrives because it runs one stream, video.cpp:964-987; a
        mixed-channel fleet routes such lanes to a matching fleet like
        geometry mismatches, runtime/router.py)."""
        from espflix_tpu.runtime.player import State
        from espflix_tpu.streaming.native_feed import (NativeAudioRing,
                                                       pop_audio_many)
        n = self.n
        starved = np.zeros(n, bool)
        act = np.zeros(n, bool)
        nval = np.zeros(n, np.int32)
        frames_list: list[tuple[int, list]] = []
        fast_rings: list = []
        fast_slots: list[int] = []
        fast_pool = None
        fs_max = 16
        for i, s in enumerate(self.sessions):
            if s is None:
                continue
            ring = s.feed.audio
            if not (ring.discover(self._probe) and ring.frame_size):
                continue
            if self._aud_op is None and ring.blocks == 16:
                self._aud_op = ring.channels
            if self._aud_op is None or ring.blocks != 16 \
                    or ring.channels != self._aud_op:
                self.events.log(Ev.AUDIO_OP_POINT, i,
                                value=(ring.channels << 8)
                                | ring.blocks)
                continue
            if isinstance(ring, NativeAudioRing) and \
                    (fast_pool is None or ring._p is fast_pool):
                # fused path: this ring drains in the one
                # sf_audio_pop_batch call below
                fast_pool = ring._p
                fast_rings.append(ring)
                fast_slots.append(i)
                fs_max = max(fs_max, ring.frame_size)
                continue
            fa = ring.pop_frames_array(F)
            if fa is None:
                if s.state in (State.PLAYING, State.FAST_FORWARD,
                               State.REWIND) and not s.eos:
                    starved[i] = True
                    self.events.log(Ev.AUDIO_STARVED, i)
                continue
            act[i] = True
            nval[i] = len(fa)
            fs_max = max(fs_max, fa.shape[1])
            frames_list.append((i, fa))
        ch = self._aud_op if self._aud_op else 1
        # native lanes contribute their DISCOVERED frame size to the
        # width (vs the popped sizes): a lane that pops nothing this
        # tick can widen fs_q by one 32B step -- semantics-neutral,
        # zero padding past each self-describing frame is never read
        fs_q = -(-fs_max // 32) * 32
        # word-padded rows (fs_q % 4 == 0, +4 trailing zero bytes) so
        # the frames_to_words conversion is a dtype view + in-place
        # byteswap -- no second pass over the arena
        arr = np.zeros((n, F, fs_q + 4), np.uint8)
        if fast_rings:
            counts = pop_audio_many(fast_rings, fast_slots, F, arr)
            slots = np.asarray(fast_slots)
            got = counts > 0
            act[slots[got]] = True
            nval[slots[got]] = counts[got]
            for k in np.flatnonzero(~got):
                i = fast_slots[k]
                s = self.sessions[i]
                if s.state in (State.PLAYING, State.FAST_FORWARD,
                               State.REWIND) and not s.eos:
                    starved[i] = True
                    self.events.log(Ev.AUDIO_STARVED, i)
        for i, fa in frames_list:
            arr[i, :len(fa), :fa.shape[1]] = fa
        words = arr.view(np.uint32)
        words.byteswap(inplace=True)
        return words, act, nval, starved, ch

    def run_chunk_full(self, n_ticks: int, tap_lanes=(),
                       steps_long: int = 1024, steps_short: int = 384,
                       chunk: int = 128) -> list["TickResult"]:
        """K ticks of the COMPLETE reference loop in one device
        dispatch: decode + both composite fields (real per-lane OSD/
        progress/slide/beep/starved state) + SBC + delta-sigma PDM
        (runtime/chain.py -- the same jitted path bench.py measures).

        Requires parser='pallas' and output=True.  Under a 'streams'
        mesh the same fused chain runs shard_map'ed (per-shard packed
        rows, zero data-path ICI except the tap gather,
        runtime/chain.make_sharded_full_chunk).  Presented
        planes/fields/PDM stay on device (checksums in the TickResult;
        tap_lanes get their full DAC fields + PDM words back).
        Control-plane effects apply at chunk boundaries like
        run_chunk."""
        assert self.output is not None, "Fleet(output=True) required"
        assert self.parser == "pallas", \
            "full chain runs on the Pallas parser"
        from espflix_tpu.ops import scan_dense as SD
        from espflix_tpu.ops import vlc_scan_pallas as VP
        from espflix_tpu.runtime import chain as CH

        n_sh = self.mesh.shape["streams"] if self.mesh is not None \
            else 0
        F = self.audio_F
        gathered = []
        xs_t = []
        dup_any = np.zeros(self.n, bool)
        need_long = 8
        for _ in range(n_ticks):
            with self.timers.measure("gather_packed"):
                g = self._gather_batch_packed()
            if g is not None:
                b, pts, pre_errors = g
            else:
                pics, pts, pre_errors = self._gather_pictures()
                with self.timers.measure("batch_assemble"):
                    b = M.make_picture_batch(
                        pics, words_per_lane=self.words_per_lane,
                        max_slices=self.mb_h,
                        geometry=(self.mb_w, self.mb_h))
            # the long symbol bucket must absorb every I picture's rows
            # (the host knows the picture types; span sorting puts them
            # first) -- an aligned-phase tick can be ALL I lanes
            is_i = ((np.asarray(b["pic_type"]) == 1)
                    & np.asarray(b["active"]))
            if n_sh:
                # per-shard packing + per-shard bucket sizing (the
                # budgets are static and uniform: worst shard wins)
                need_long = max(need_long, int(
                    is_i.reshape(n_sh, -1).sum(axis=1).max())
                    * self.mb_h)
                with self.timers.measure("batch_assemble"):
                    sl, dup = SD.pack_slice_rows_sharded(
                        b, n_sh, self.mb_h,
                        device_windows=self._dev_win)
                    perm = sl["perm"]
                    dup = dup | sl["overflow"]
            else:
                need_long = max(need_long, int(is_i.sum()) * self.mb_h)
                with self.timers.measure("batch_assemble"):
                    sl = VP.pack_slice_rows(
                        b, sort_rows=True,
                        device_windows=self._dev_win)
                    perm, dup = SD.row_perm(
                        sl["lane_of_row"], sl["rows"], sl["alive"],
                        self.n, self.mb_h)
            dup_any |= dup
            aud_words, aact, anval, starved, ch = \
                self._gather_audio_arrays(F)
            self._update_osd()
            snap = self.output.tick_state(F)
            dkeys = CH.DECODE_KEYS_DW[:9] if self._dev_win \
                else CH.DECODE_KEYS[:8]
            x = {k: sl[k] for k in dkeys if k != "perm"}
            if self._dev_win:
                x["win"] = sl["win"]
            x["perm"] = perm
            x["intra_q"] = b["intra_q"]
            x["non_intra_q"] = b["non_intra_q"]
            x["active"] = b["active"]
            x["osd"] = snap["osd"]
            x["blend"] = snap["blend"]
            x["progress"] = snap["progress"]
            x["parity"] = snap["parity"]
            x["hscroll"] = snap["hscroll"]
            x["beep_left"] = snap["beep_left"]
            x["aud_words"] = aud_words
            x["aud_act"] = aact
            x["aud_nval"] = anval
            x["starved"] = starved
            xs_t.append(x)
            gathered.append((np.asarray(b["active"]).copy(), pts,
                             pre_errors, starved))

        # common word-window width across the chunk
        if self._dev_win:
            win = max(x.pop("win") for x in xs_t)
            Wm = max(x["lane_words"].shape[1] for x in xs_t)
            for x in xs_t:
                w = x["lane_words"]
                if w.shape[1] < Wm:
                    x["lane_words"] = np.pad(
                        w, ((0, 0), (0, Wm - w.shape[1])))
        else:
            win = 0
            Wp = max(x["words"].shape[1] for x in xs_t)
            for x in xs_t:
                w = x["words"]
                if w.shape[1] < Wp:
                    x["words"] = np.pad(
                        w, ((0, 0), (0, Wp - w.shape[1])))
        # audio word width varies with the tick's largest SBC frame
        # (frame sizes are per-lane free); zero-pad to the chunk max
        Wa = max(x["aud_words"].shape[2] for x in xs_t)
        for x in xs_t:
            w = x["aud_words"]
            if w.shape[2] < Wa:
                x["aud_words"] = np.pad(
                    w, ((0, 0), (0, 0), (0, Wa - w.shape[2])))
        xs = {k: jnp.asarray(np.stack([x[k] for x in xs_t]))
              for k in xs_t[0]}
        self.events.log(Ev.DECODE_BATCH, value=sum(
            int(x["active"].sum()) for x in xs_t))

        scrolled = any((x["hscroll"] != 0).any() for x in xs_t)
        sld = self.output.slide_planes()
        if scrolled and sld is not None:
            slide = tuple(jnp.asarray(s) for s in sld)
        else:
            scrolled = False
            z = jnp.zeros((1, 1, 1), jnp.uint8)
            slide = (z, z, z)
        tap = len(tap_lanes)
        tap_idx = jnp.asarray(
            np.asarray(list(tap_lanes) or [0], np.int32))

        long_rows, steps_long, steps_short = bucket_policy(
            need_long, (self.n // max(n_sh, 1)) * self.mb_h,
            steps_long=steps_long, steps_short=steps_short)
        with self.timers.measure("device_decode"):
            if n_sh:
                from espflix_tpu.parallel import mesh as pmesh
                if not getattr(self, "_chain_sharded_state", False):
                    # one-time: lane-major carries onto the mesh
                    self.frames = pmesh.shard_lane_tree(
                        self.mesh, self.frames)
                    self.sbc_state = pmesh.shard_lane_tree(
                        self.mesh, self.sbc_state)
                    self.output.pdm_state = pmesh.shard_lane_tree(
                        self.mesh, self.output.pdm_state)
                    self._chain_sharded_state = True
                xs = pmesh.shard_axis1_tree(self.mesh, xs)
                if scrolled:
                    slide = pmesh.shard_lane_tree(self.mesh, slide)
                fn = CH.make_sharded_full_chunk(
                    self.mesh, mb_width=self.mb_w,
                    mb_height=self.mb_h, n_lanes=self.n,
                    long_rows=long_rows, steps_long=steps_long,
                    steps_short=steps_short, n_aud_frames=F,
                    channels=ch, pal=self.pal, scrolled=scrolled,
                    tap=tap, interpret=self._pallas_interpret,
                    return_planes=True, win=win,
                    chunk=min(chunk, steps_short),
                    xs_keys=tuple(xs.keys()))
                (self.frames, self.sbc_state, self.output.pdm_state,
                 outs) = fn(xs, self.frames, self.sbc_state,
                            self.output.pdm_state, tap_idx, slide)
            else:
                (self.frames, self.sbc_state, self.output.pdm_state,
                 outs) = CH.run_full_chunk(
                    xs, self.frames, self.sbc_state,
                    self.output.pdm_state, tap_idx, slide,
                    mb_width=self.mb_w, mb_height=self.mb_h,
                    n_lanes=self.n, long_rows=long_rows,
                    steps_long=steps_long, steps_short=steps_short,
                    n_aud_frames=F, channels=ch, pal=self.pal,
                    scrolled=scrolled, tap=tap,
                    interpret=self._pallas_interpret, win=win,
                    chunk=min(chunk, steps_short))

        with self.timers.measure("host_sync"):
            errs = np.asarray(outs["err"]) | dup_any[None, :]
            fsum = np.asarray(outs["field_sum"])
            psum = np.asarray(outs["pdm_sum"])
            audio_errs = np.asarray(outs["audio_err"])
            tap_f = np.asarray(outs["tap_fields"]) if tap else None
            tap_p = np.asarray(outs["tap_pdm"]) if tap else None

        results = []
        for t, (video_lanes, pts, pre_errors, starved) in \
                enumerate(gathered):
            errors = errs[t].copy()
            for i in np.nonzero(video_lanes)[0]:
                if self.sessions[i] is not None:
                    self.sessions[i].on_presented(int(pts[i]))
                    if errors[i]:
                        self.events.log(Ev.LANE_ERROR, i)
                        if self.sessions[i].resync():
                            self.events.log(Ev.LANE_RESYNC, i)
            for i in np.nonzero(audio_errs[t])[0]:
                self.events.log(Ev.AUDIO_ERROR, int(i))
            results.append(TickResult(
                video_lanes, outs["y"][t], outs["u"][t], outs["v"][t],
                pts, errors | pre_errors,
                audio_lanes=np.asarray(xs_t[t]["aud_act"]),
                pcm=None, pcm_samples=None, audio_starved=starved,
                audio_errors=audio_errs[t],
                field_sum=fsum[t], pdm_sum=psum[t],
                tap_fields=tap_f[t] if tap else None,
                tap_pdm=tap_p[t] if tap else None))
        return results


    def run_chunk_full_pooled(self, pool, n_ticks: int, tap_lanes=(),
                              steps_long: int = 1024,
                              steps_short: int = 384
                              ) -> list["TickResult"]:
        """run_chunk_full with the session layer on a HostPool: the
        per-tick Python control plane (pump, demux, segmentation,
        slice packing) runs across worker processes; this process only
        concatenates shard blobs, regroups the two symbol buckets and
        dispatches the device chain.  OSD/beep/slide state still lives
        in this fleet's OutputStage (drive it via pool.call +
        fleet.output); session bookkeeping (presentation, resync)
        routes back to the workers after the chunk."""
        assert self.output is not None and self.parser == "pallas" \
            and self.mesh is None
        from espflix_tpu.runtime import chain as CH

        F = self.audio_F
        mbh = self.mb_h
        NS = self.n * mbh
        xs_t = []
        meta = []
        need_long = 8
        for _ in range(n_ticks):
            with self.timers.measure("batch_assemble"):
                g = pool.gather_tick(F)
            need_long = max(need_long, g["n_i"] * mbh)
            meta.append(g)
            snap = self.output.tick_state(F)
            x = dict(g)
            x["osd"] = snap["osd"]
            x["blend"] = snap["blend"]
            x["progress"] = snap["progress"]
            x["parity"] = snap["parity"]
            x["hscroll"] = snap["hscroll"]
            x["beep_left"] = snap["beep_left"]
            x["aud_words"] = dsbc.frames_to_words(g["aud"])
            x["starved"] = g["starved"]
            xs_t.append(x)

        long_rows, steps_long, steps_short = bucket_policy(
            need_long, NS, steps_long=steps_long,
            steps_short=steps_short)

        # regroup each tick's per-worker sorted rows into global
        # (long | short) segments: workers put their longest rows
        # first (span sort), so segment boundaries are the per-worker
        # I-row counts -- a few big memcpys, no per-row permute
        W = pool.w
        ln = pool.ln
        dev_win = "lane_words" in xs_t[0]
        rowk = (("row_base",) if dev_win else ("words",)) + (
            "start_bits", "rows", "alive", "pic_type", "full_pel",
            "r_size", "lane_of_row")
        if dev_win:
            win = max(x.pop("win") for x in xs_t)
            Wm = max(x["lane_words"].shape[1] for x in xs_t)
        else:
            win = 0
            Wp = max(x["words"].shape[1] for x in xs_t)
        NSl = ln * mbh
        for x in xs_t:
            if dev_win:
                w = x["lane_words"]
                if w.shape[1] < Wm:
                    x["lane_words"] = np.pad(
                        w, ((0, 0), (0, Wm - w.shape[1])))
            else:
                w = x["words"]
                if w.shape[1] < Wp:
                    x["words"] = np.pad(
                        w, ((0, 0), (0, Wp - w.shape[1])))
            # globalize per-worker row/lane indices
            x["lane_of_row"] = (
                x["lane_of_row"].reshape(W, NSl)
                + (np.arange(W, dtype=np.int32) * ln)[:, None]
            ).reshape(-1)
            p = x["perm"].astype(np.int64).reshape(W, -1)
            dead = p >= NSl
            p = p + (np.arange(W, dtype=np.int64) * NSl)[:, None]
            p[dead] = NS
            p = p.reshape(-1)
            # span-sorted workers put their longest rows (I slices)
            # first: bucket boundary per worker = its alive I rows
            pt = x["pic_type"].reshape(W, NSl)
            al = x["alive"].reshape(W, NSl)
            n_long = ((pt == 1) & (al != 0)).sum(axis=1)
            sel_long = np.zeros(NS, bool)
            for k in range(W):
                sel_long[k * NSl:k * NSl + n_long[k]] = True
            order = np.concatenate([np.nonzero(sel_long)[0],
                                    np.nonzero(~sel_long)[0]])
            inv = np.empty(NS + 1, np.int64)
            inv[order] = np.arange(NS)
            inv[NS] = NS
            for kk in rowk:
                x[kk] = np.ascontiguousarray(x[kk][order])
            x["perm"] = inv[p].astype(np.int32)

        xs = {}
        okeys = rowk + ("perm", "intra_q", "non_intra_q", "active",
                        "osd", "blend", "progress", "parity",
                        "hscroll", "beep_left", "aud_words", "aud_act",
                        "aud_nval", "starved")
        if dev_win:
            okeys = okeys + ("lane_words",)
        Wa = max(x["aud_words"].shape[2] for x in xs_t)
        for x in xs_t:
            w = x["aud_words"]
            if w.shape[2] < Wa:
                x["aud_words"] = np.pad(
                    w, ((0, 0), (0, 0), (0, Wa - w.shape[2])))
        xs = {k: jnp.asarray(np.stack([x[k] for x in xs_t]))
              for k in okeys}

        scrolled = any((x["hscroll"] != 0).any() for x in xs_t)
        sld = self.output.slide_planes()
        if scrolled and sld is not None:
            slide = tuple(jnp.asarray(s) for s in sld)
        else:
            scrolled = False
            z = jnp.zeros((1, 1, 1), jnp.uint8)
            slide = (z, z, z)
        tap = len(tap_lanes)
        tap_idx = jnp.asarray(
            np.asarray(list(tap_lanes) or [0], np.int32))
        ops = [g["aud_op"] for g in meta if g["aud_op"]]
        ch = ops[0] if ops else 1

        with self.timers.measure("device_decode"):
            (self.frames, self.sbc_state, self.output.pdm_state,
             outs) = CH.run_full_chunk(
                xs, self.frames, self.sbc_state,
                self.output.pdm_state, tap_idx, slide,
                mb_width=self.mb_w, mb_height=self.mb_h,
                n_lanes=self.n, long_rows=long_rows,
                steps_long=steps_long, steps_short=steps_short,
                n_aud_frames=F, channels=ch, pal=self.pal,
                scrolled=scrolled, tap=tap,
                interpret=self._pallas_interpret, win=win)

        with self.timers.measure("host_sync"):
            errs = np.asarray(outs["err"])
            fsum = np.asarray(outs["field_sum"])
            psum = np.asarray(outs["pdm_sum"])
            audio_errs = np.asarray(outs["audio_err"])
            tap_f = np.asarray(outs["tap_fields"]) if tap else None
            tap_p = np.asarray(outs["tap_pdm"]) if tap else None

        results = []
        for t, g in enumerate(meta):
            errors = errs[t] | g["pre_errors"]
            pool.present(g["pts"], errors)
            results.append(TickResult(
                g["video"], None, None, None, g["pts"], errors,
                audio_lanes=g["aud_act"], pcm=None, pcm_samples=None,
                audio_starved=g["starved"],
                audio_errors=audio_errs[t],
                field_sum=fsum[t], pdm_sum=psum[t],
                tap_fields=tap_f[t] if tap else None,
                tap_pdm=tap_p[t] if tap else None))
        return results


import functools as _functools

import jax as _jax
import jax.numpy as _jnp


@_functools.partial(_jax.jit, static_argnames=(
    "mb_width", "mb_height", "max_steps"))
def _chunk_decode_device(stacked, frames, *, mb_width, mb_height,
                         max_steps):
    keys = ("words", "slice_starts", "slice_rows", "n_slices",
            "pic_type", "full_pel", "r_size", "intra_q",
            "non_intra_q", "active")

    def body(frames, xs):
        frames, p, info = M.decode_picture_impl(
            *[xs[k] for k in keys], frames,
            mb_width=mb_width, mb_height=mb_height,
            max_steps=max_steps)
        return frames, (p, info["error"])

    frames, (pres, errs) = _jax.lax.scan(body, frames, stacked)
    return frames, pres, errs


@_functools.partial(_jax.jit, static_argnames=(
    "mb_width", "mb_height", "n_lanes", "long_rows", "steps_long",
    "steps_short", "interpret"))
def _chunk_decode_pallas(sstk, frames, *, mb_width, mb_height,
                         n_lanes, long_rows, steps_long, steps_short,
                         interpret):
    from espflix_tpu.ops import vlc_scan_pallas as VP
    skeys = ("words", "start_bits", "rows", "alive", "pic_type",
             "full_pel", "r_size", "lane_of_row")

    def body(frames, xs):
        coeffs, recs, nfinal, err, _it = VP.run_scan_pallas_bucketed(
            *[xs[k] for k in skeys],
            mb_width=mb_width, mb_count=mb_width * mb_height,
            n_lanes=n_lanes, long_rows=long_rows,
            steps_long=steps_long, steps_short=steps_short,
            chunk=128, interpret=interpret)
        frames, p = M.dense_compose(
            coeffs, recs, nfinal, xs["intra_q"], xs["non_intra_q"],
            xs["active"], frames, mb_width=mb_width,
            mb_height=mb_height)
        return frames, (p, err)

    frames, (pres, errs) = _jax.lax.scan(body, frames, sstk)
    return frames, pres, errs

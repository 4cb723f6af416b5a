"""Per-stream feed: incremental TS -> picture payloads + SBC audio.

The host-side analogue of the reference's buffer pump + pull-model
demux (/root/reference/src/espflix.cpp:723-737, player.cpp:459-493):
bytes arrive in bounded reads from a Streamer, the transport stream is
demuxed incrementally, and complete picture payloads (with their
sequence context and PTS) are handed to the batched device decoder.
Backpressure is the bounded `max_buffered_pictures` (the analogue of
the reference's 4-buffer pool).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

import numpy as np

from espflix_tpu.core.bitio import BitReader
from espflix_tpu.core import vlc_tables as V
from espflix_tpu.models.mpeg1 import PictureData, SequenceInfo
from espflix_tpu.streaming.ts import TS_PACKET, AUDIO_PIDS, VIDEO_PID, \
    parse_pts


@dataclass
class EsSegmenter:
    """Incremental ES -> complete picture chunks with sequence context."""
    seq: SequenceInfo | None = None
    _buf: bytearray = field(default_factory=bytearray)
    _pts_marks: deque = field(default_factory=deque)  # (offset, pts)
    _base: int = 0      # absolute offset of _buf[0]
    _eos: bool = False
    _last_pts: int = -1

    def push(self, data: bytes):
        self._buf += data

    def mark_pts(self, pts: int):
        self._pts_marks.append((self._base + len(self._buf), pts))

    def eos(self):
        self._eos = True

    def _codes(self):
        a = np.frombuffer(bytes(self._buf), np.uint8)
        if len(a) < 4:
            return []
        hits = np.where((a[:-3] == 0) & (a[1:-2] == 0) & (a[2:-1] == 1))[0]
        return [(int(p), int(a[p + 3])) for p in hits]

    def _parse_seq(self, pos: int):
        r = BitReader(bytes(self._buf[pos + 4:pos + 4 + 140]))
        w, h = r.get(12), r.get(12)
        r.get(4 + 4 + 18 + 12)
        iq = np.array([r.get(8) for _ in range(64)], np.int32) \
            if r.get(1) else V.DEFAULT_INTRA_Q.copy()
        nq = np.array([r.get(8) for _ in range(64)], np.int32) \
            if r.get(1) else V.DEFAULT_NON_INTRA_Q.copy()
        self.seq = SequenceInfo(w, h, iq, nq)

    def pop_picture(self) -> PictureData | None:
        """Extract the next complete picture chunk, or None."""
        codes = self._codes()
        pend = None
        pic_start = None
        pic_pos = None
        for pos, code in codes:
            if code in (0xB3, 0xB8, 0xB2, 0xB5):
                if pic_pos is not None:   # next chunk begins
                    return self._emit(pic_start, pend if pend is not None
                                      else pos, pic_pos)
                if pend is None:
                    pend = pos
                if code == 0xB3:
                    self._parse_seq(pos)
            elif code == 0x00:
                if pic_pos is not None:
                    return self._emit(pic_start,
                                      pend if pend is not None else pos,
                                      pic_pos)
                pic_start = pend if pend is not None else pos
                pic_pos = pos
                pend = None
            elif code == 0xB7:
                if pic_pos is not None:
                    return self._emit(pic_start, pos, pic_pos)
                return None
            else:
                pend = None
        if pic_pos is not None and self._eos:
            return self._emit(pic_start, len(self._buf), pic_pos)
        return None

    def _emit(self, start: int, end: int, pic_pos: int) -> PictureData:
        assert self.seq is not None, "picture before sequence header"
        chunk = bytes(self._buf[start:end])
        # picture header fields
        r = BitReader(bytes(self._buf[pic_pos + 4:pic_pos + 4 + 8]))
        r.get(10)
        ptype = r.get(3)
        full_pel = r_size = 0
        if ptype == 2:
            r.get(16)
            full_pel = r.get(1)
            r_size = r.get(3) - 1
        # PTS: newest mark at or before the picture position
        abs_pic = self._base + pic_pos
        while self._pts_marks and self._pts_marks[0][0] <= abs_pic:
            self._last_pts = self._pts_marks.popleft()[1]
        pts = self._last_pts

        pic = PictureData(ptype, full_pel, r_size, self.seq, pts=pts)
        if ptype in (1, 2):
            a = np.frombuffer(chunk, np.uint8)
            hits = np.where((a[:-3] == 0) & (a[1:-2] == 0)
                            & (a[2:-1] == 1))[0]
            sl = [(int(p), int(a[p + 3])) for p in hits
                  if 0x01 <= a[p + 3] <= 0xAF]
            if sl:
                base = sl[0][0]
                pic.payload = chunk[base:]
                pic.slice_offsets = [(p - base) * 8 + 32 for p, _ in sl]
                pic.slice_rows = [c - 1 for _, c in sl]
        del self._buf[:end]
        self._base += end
        return pic


@dataclass
class SbcRing:
    """Audio byte ring with frame-size self-discovery
    (video.cpp:957-987 semantics, unbounded host-side)."""
    buf: bytearray = field(default_factory=bytearray)
    frame_size: int = 0
    channels: int = 1       # discovered with frame_size (header mode)
    blocks: int = 16        # discovered blocks/frame
    pts: int = -1           # latest PES pts (90 kHz)

    def push(self, data: bytes, pts: int):
        if pts != -1:
            self.pts = pts
        self.buf += data

    def discover(self, probe) -> int:
        """probe(bytes) -> frame_len or (frame_len, channels, blocks);
        returns frame size (0 if unknown)."""
        if not self.frame_size and len(self.buf) >= 64:
            n = probe(bytes(self.buf[:min(len(self.buf), 512)]))
            ch, bl = 1, 16
            if isinstance(n, tuple):
                n, ch, bl = n
            if n and n > 0:
                self.frame_size = n
                self.channels = ch
                self.blocks = bl
        return self.frame_size

    def pop_frames(self, max_frames: int) -> list[bytes]:
        if not self.frame_size:
            return []
        out = []
        while len(out) < max_frames and len(self.buf) >= self.frame_size:
            out.append(bytes(self.buf[:self.frame_size]))
            del self.buf[:self.frame_size]
        return out


class StreamFeed:
    """TS bytes in -> pictures + audio out (incremental)."""

    def __init__(self):
        self.es = EsSegmenter()
        self.audio = SbcRing()
        self._tail = b""
        self.sync_lost = False
        self._audio_started = False

    def feed(self, data: bytes):
        data = self._tail + data
        n = len(data) // TS_PACKET
        self._tail = data[n * TS_PACKET:]
        for k in range(n):
            d = data[k * TS_PACKET:(k + 1) * TS_PACKET]
            if d[0] != 0x47:
                self.sync_lost = True
                return
            pid = ((d[1] << 8) | d[2]) & 0x1FFF
            pusi = (d[1] & 0x40) != 0
            ofs = 5 + d[4] if d[3] & 0x20 else 4
            if not (d[3] & 0x10):
                continue
            payload = d[ofs:]
            if pid == VIDEO_PID:
                if pusi:
                    flags = (payload[6] << 8) | payload[7]
                    hdr = 9 + payload[8]
                    if flags & 0x0080:
                        pts = parse_pts(payload[9:14], flags)
                        if pts != -1:
                            self.es.mark_pts(pts)
                    payload = payload[hdr:]
                self.es.push(payload)
            elif pid in AUDIO_PIDS:
                pts = -1
                if pusi:
                    flags = (payload[6] << 8) | payload[7]
                    hdr = 9 + payload[8]
                    if flags & 0x0080:
                        pts = parse_pts(payload[9:14], flags)
                    payload = payload[hdr:]
                    self._audio_started = True
                if self._audio_started:
                    self.audio.push(payload, pts)

    def eos(self):
        self.es.eos()

    def pop_picture(self):
        return self.es.pop_picture()

"""Output stage: decoded frames -> composite fields + PDM audio.

Completes the on-device bitstream-to-display-signal path (BASELINE
"north_star"): takes the fleet's decoded YUV planes and PCM, runs the
batched composite synthesizer and the delta-sigma modulator, and
maintains the per-lane OSD state (time readout, progress bar, fade
countdown) exactly as the reference ISR does
(/root/reference/src/video.cpp:1122-1198, espflix.cpp:862-884).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from espflix_tpu.ops import composite as C
from espflix_tpu.ops import delta_sigma as DS
from espflix_tpu.video.render import PAUSE, PLAY, FFWD, RWND, show_time


# key-feedback beep: the reference's 32-sample sine (negated-sin
# phase, espflix.ino:109-120), played at >>2 amplitude for 5 audio
# frames (128 samples each).  Transcribed verbatim for bit parity (its
# rounding differs from round() by 1 LSB on some taps).
_S = [0, 6392, 12539, 18204, 23169, 27244, 30272, 32137, 32767]
_SIN32 = np.array(
    [-_S[i] for i in range(9)] + [-_S[16 - i] for i in range(9, 16)]
    + [_S[i - 16] for i in range(16, 25)]
    + [_S[32 - i] for i in range(25, 32)], np.int32)


class OutputStage:
    def __init__(self, n_lanes: int, pal: bool = False):
        self.n = n_lanes
        self.pal = pal
        self.osd = np.zeros((n_lanes, 16, 80), np.uint8)
        self.blend = np.zeros(n_lanes, np.int32)
        self.progress = np.zeros(n_lanes, np.int32)
        self.frame_counter = np.zeros(n_lanes, np.int64)
        self.last_seconds = np.full(n_lanes, -1, np.int64)
        self.pdm_state = DS.init_state(n_lanes)
        self.beep_frames = np.zeros(n_lanes, np.int32)
        # buffer-flip slide animation (video.cpp:936-943, 1077-1088):
        # per-lane ease counter, current hscroll, and the "other
        # buffer" snapshot the new frame slides against
        self.animate_index = np.zeros(n_lanes, np.int32)
        self.hscroll = np.zeros(n_lanes, np.int32)
        self._slide = None               # (y, u, v) snapshots
        self._last = None                # last planes synthesized

    # -- flip animation (video.cpp:1077-1088, 1163-1178) ----------------
    def start_slide(self, lane: int, direction: int,
                    prev=None):
        """Begin the ease-in/out horizontal slide on a buffer flip.

        direction: the reference's flush_picture mode -- 2 slides the
        new frame in from the left (load_poster dir < 0), 3 from the
        right (espflix.cpp:1060-1069).  prev: optional (y, u, v) for
        the outgoing frame; defaults to the last synthesized planes.
        """
        if prev is None:
            prev = self._last
        if prev is None:
            return
        if self._slide is None:
            self._slide = tuple(np.zeros_like(np.asarray(p))
                                for p in prev)
        for buf, p in zip(self._slide, prev):
            buf[lane] = np.asarray(p)[lane]
        self.animate_index[lane] = -16 if direction == 2 else 16
        self._animate_step(lane)         # flip calls animate() once

    def _animate_step(self, lane=None):
        """One per-field animator update (video.cpp:1078-1088)."""
        sel = np.zeros(self.n, bool)
        if lane is None:
            sel[:] = True
        else:
            sel[lane] = True
        idx = self.animate_index
        new = np.where(idx < 0, idx + 1, np.where(idx > 0, idx - 1, 0))
        hs = np.where(new < 0, -C.EASE[-new],
                      np.where(new > 0, C.EASE[new], 0)).astype(np.int32)
        hs = np.where(idx == 0, 0, hs)
        self.animate_index = np.where(sel, new, idx)
        self.hscroll = np.where(sel, hs, self.hscroll)

    def beep(self, lane: int):
        """Queue the 5-frame key-feedback beep (espflix.ino:116-120)."""
        self.beep_frames[lane] = 5

    # -- OSD state (espflix.cpp:862-884) --------------------------------
    def show_progress(self, lane: int, t: int = 180):
        self.blend[lane] = t

    def hide_progress(self, lane: int):
        self.blend[lane] = 0

    def update_progress(self, lane: int, main_pts: int, total_pts: int,
                        state_icon: int = PLAY):
        seconds = main_pts // 90000
        if seconds != self.last_seconds[lane]:
            show_time(self.osd[lane], int(seconds), state_icon)
            self.last_seconds[lane] = seconds
        if total_pts > 0:
            self.progress[lane] = int(
                main_pts * C.OSD_PROGRESS_W // total_pts)

    @staticmethod
    def icon_for(speed: int, paused: bool) -> int:
        if speed == 0:
            return PAUSE if paused else PLAY
        return FFWD if speed > 0 else RWND

    # -- fleet-chain state capture (runtime/chain.py) -------------------
    def tick_state(self, n_aud_frames: int) -> dict:
        """Capture this tick's per-lane OSD/animation/beep state for
        the device chain, then advance the host counters by one frame
        pair (two fields: blend fades and the slide animator step once
        per field, video.cpp:1190-1196) and by n_aud_frames of beep."""
        snap = dict(
            osd=self.osd.copy(),
            blend=self.blend.astype(np.int32).copy(),
            progress=self.progress.astype(np.int32).copy(),
            parity=(self.frame_counter & 1).astype(np.int32),
            hscroll=self.hscroll.astype(np.int32).copy(),
            beep_left=self.beep_frames.astype(np.int32).copy(),
        )
        self.frame_counter += 2
        for _ in range(2):
            self.blend = np.where(self.blend > 0, self.blend - 1,
                                  self.blend)
            if (self.animate_index != 0).any() or \
                    (self.hscroll != 0).any():
                self._animate_step()
        self.beep_frames = np.maximum(
            self.beep_frames - n_aud_frames, 0)
        return snap

    def slide_planes(self):
        """(y, u, v) outgoing-frame snapshots for the scroll blit, or
        None when no slide has ever started."""
        return self._slide

    # -- synthesis ------------------------------------------------------
    def synthesize(self, y: np.ndarray, u: np.ndarray, v: np.ndarray):
        """One field per lane: uint8[N, line_count, line_width]."""
        parity = (self.frame_counter & 1).astype(np.int32)
        if (self.hscroll != 0).any():
            # some lane is mid-slide: the scrolled variant composes a
            # per-lane wraparound of (current, outgoing) buffers
            sy, su, sv = self._slide
            fields = C.synthesize_field_scrolled(
                jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                jnp.asarray(sy), jnp.asarray(su), jnp.asarray(sv),
                jnp.asarray(self.hscroll), jnp.asarray(parity),
                jnp.asarray(self.osd), jnp.asarray(self.blend),
                jnp.asarray(self.progress), pal=self.pal)
        else:
            fields = C.synthesize_field(
                jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                jnp.asarray(parity), jnp.asarray(self.osd),
                jnp.asarray(self.blend), jnp.asarray(self.progress),
                pal=self.pal)
        self._last = (y, u, v)
        self.frame_counter += 1
        # end-of-field updates: fade countdown + slide animator
        # (video.cpp:1190-1196)
        self.blend = np.where(self.blend > 0, self.blend - 1, self.blend)
        if (self.animate_index != 0).any() or (self.hscroll != 0).any():
            self._animate_step()
        return np.asarray(fields)

    def modulate(self, pcm: np.ndarray, starved=None):
        """PCM int16[N, T] -> PDM words uint16-in-int32[N, 2T].
        Lanes with a pending beep play the sine instead (espflix.ino
        write_pcm_16 beep branch).  starved: optional bool[N]; those
        lanes get the literal 0xAAAA PDM silence pattern with their
        modulator state untouched, exactly the reference's underrun
        behavior (video.cpp:997-1001 writes the silence buffer without
        running the modulator)."""
        pcm = np.asarray(pcm, np.int16).copy()
        beeping = self.beep_frames > 0
        if beeping.any():
            T = pcm.shape[1]
            wave = (_SIN32[np.arange(T) & 31] >> 2).astype(np.int16)
            pcm[beeping] = wave
            self.beep_frames = np.maximum(
                self.beep_frames - (T + 127) // 128, 0)
        state_in = self.pdm_state
        out, self.pdm_state = DS.modulate(
            jnp.asarray(pcm), self.pdm_state, n_samples=pcm.shape[1])
        if starved is not None and np.asarray(starved).any():
            sv = jnp.asarray(np.asarray(starved, bool))
            out = jnp.where(sv[:, None], DS.SILENCE_WORD, out)
            self.pdm_state = jnp.where(sv[:, None], state_in,
                                       self.pdm_state)
        return np.asarray(out)

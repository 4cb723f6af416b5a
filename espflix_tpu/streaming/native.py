"""ctypes bindings to the native bulk TS demuxer (native/ts_demux.cpp),
with transparent fallback to the Python walker."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from espflix_tpu.streaming import ts as pyts

_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = os.path.join(_DIR, "libespflix_native.so")
_lib = None
_tried = False


def lib():
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        try:
            if not os.path.exists(_LIB):
                subprocess.run(["make", "-s"], cwd=_DIR, check=True)
            L = ctypes.CDLL(_LIB)
            L.ts_demux_bulk.restype = ctypes.c_int
            L.ts_demux_bulk.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_long),
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int)]
            _lib = L
        except Exception:
            _lib = None
    return _lib


def available() -> bool:
    return lib() is not None


def demux_ts(data: bytes) -> pyts.DemuxResult:
    """Native bulk demux; same output as streaming.ts.demux_ts."""
    L = lib()
    if L is None:
        return pyts.demux_ts_numpy(data)
    n = len(data)
    max_marks = max(n // 188, 16)
    video = np.zeros(n, np.uint8)
    audio = np.zeros(n, np.uint8)
    voff = np.zeros(max_marks, np.int64)
    vpts = np.zeros(max_marks, np.int64)
    aoff = np.zeros(max_marks, np.int64)
    apts = np.zeros(max_marks, np.int64)
    vlen = ctypes.c_long(0)
    alen = ctypes.c_long(0)
    nv = ctypes.c_int(0)
    na = ctypes.c_int(0)
    rc = L.ts_demux_bulk(
        data, n, video.ctypes.data, ctypes.byref(vlen),
        voff.ctypes.data, vpts.ctypes.data, ctypes.byref(nv), max_marks,
        audio.ctypes.data, ctypes.byref(alen),
        aoff.ctypes.data, apts.ctypes.data, ctypes.byref(na))
    out = pyts.DemuxResult()
    out.sync_lost = rc != 0
    out.video = video[:vlen.value].tobytes()
    out.video_pts_marks = [(int(voff[i]), int(vpts[i]))
                           for i in range(nv.value)]
    # audio marks -> AudioChunk list (one chunk per PES for parity with
    # the Python walker is not needed by consumers; deliver one chunk
    # per PES span)
    spans = [int(aoff[i]) for i in range(na.value)] + [int(alen.value)]
    ab = audio[:alen.value].tobytes()
    for i in range(na.value):
        out.audio.append(pyts.AudioChunk(
            ab[spans[i]:spans[i + 1]], int(apts[i]), True))
    return out

"""ctypes bindings to the native C++ oracle (oracle/liboracle.so).

The oracle is the golden decoder: YUV (and later PCM / composite samples)
produced here define bit-exact correctness for the batched device
decoders.  Builds on demand via the oracle Makefile.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ORACLE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "oracle")
_LIB_PATH = os.path.join(_ORACLE_DIR, "liboracle.so")
_lib = None


def build(force: bool = False) -> str:
    """Build liboracle.so if missing (or force); returns its path."""
    if force or not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-s"] + (["-B"] if force else []),
                       cwd=_ORACLE_DIR, check=True)
    return _LIB_PATH


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        _lib = ctypes.CDLL(build())
        _lib.mpeg1_oracle_decode.restype = ctypes.c_int
        _lib.mpeg1_oracle_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
    return _lib


def available() -> bool:
    try:
        lib()
        return True
    except Exception:
        return False


def composite_field(y, u, v, frame_parity=0, pal=False, osd=None,
                    blend=0, progress=0):
    """Golden composite field: uint8[line_count, line_width]."""
    L = lib()
    L.composite_field.argtypes = [ctypes.c_void_p] * 3 \
        + [ctypes.c_int] * 2 + [ctypes.c_void_p] + [ctypes.c_int] * 2 \
        + [ctypes.c_void_p]
    lc, lw = ctypes.c_int(0), ctypes.c_int(0)
    L.composite_geometry(1 if pal else 0, ctypes.byref(lc),
                         ctypes.byref(lw))
    out = np.zeros((lc.value, lw.value), np.uint8)
    y = np.ascontiguousarray(y, np.uint8)
    u = np.ascontiguousarray(u, np.uint8)
    v = np.ascontiguousarray(v, np.uint8)
    osd_p = None
    if osd is not None:
        osd = np.ascontiguousarray(osd, np.uint8)
        osd_p = osd.ctypes.data
    L.composite_field(y.ctypes.data, u.ctypes.data, v.ctypes.data,
                      int(frame_parity), 1 if pal else 0, osd_p,
                      int(blend), int(progress), out.ctypes.data)
    return out


def pdm_modulate(pcm, state=None):
    """Golden PDM: (uint16[2*n], state int32[3])."""
    L = lib()
    L.pdm_modulate.argtypes = [ctypes.c_void_p, ctypes.c_long,
                               ctypes.c_void_p, ctypes.c_void_p]
    pcm = np.ascontiguousarray(pcm, np.int16)
    st = np.zeros(3, np.int32) if state is None \
        else np.ascontiguousarray(state, np.int32).copy()
    out = np.zeros(2 * len(pcm), np.uint16)
    L.pdm_modulate(pcm.ctypes.data, len(pcm), st.ctypes.data,
                   out.ctypes.data)
    return out, st


class SbcOracle:
    """Stateful native SBC decoder (oracle/sbc_oracle.cpp)."""

    def __init__(self):
        L = lib()
        L.sbc_oracle_new.restype = ctypes.c_void_p
        L.sbc_oracle_decode.restype = ctypes.c_int
        L.sbc_oracle_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int)]
        self._L = L
        self._ctx = L.sbc_oracle_new()

    def __del__(self):
        try:
            if self._ctx:
                self._L.sbc_oracle_free(ctypes.c_void_p(self._ctx))
                self._ctx = None
        except Exception:
            pass  # interpreter teardown

    def decode_frame(self, frame: bytes):
        """Returns (pcm int16 array, frame_len) or None on bad header."""
        pcm = np.zeros(2 * 16 * 8, np.int16)
        n = ctypes.c_int(0)
        r = self._L.sbc_oracle_decode(
            ctypes.c_void_p(self._ctx), frame, len(frame),
            pcm.ctypes.data_as(ctypes.c_void_p), ctypes.byref(n))
        if r < 0:
            return None
        return pcm[:n.value].copy(), r


def decode_mpeg1(es: bytes, max_frames: int = 64,
                 width: int = 352, height: int = 192):
    """Decode an MPEG-1 video ES; returns (frames, pts) where frames is a
    list of (y, u, v) uint8 arrays.  Raises on parse errors."""
    L = lib()
    y = np.zeros((max_frames, height, width), np.uint8)
    u = np.zeros((max_frames, height // 2, width // 2), np.uint8)
    v = np.zeros((max_frames, height // 2, width // 2), np.uint8)
    pts = np.zeros(max_frames, np.int64)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    n = L.mpeg1_oracle_decode(
        es, len(es),
        y.ctypes.data_as(ctypes.c_void_p),
        u.ctypes.data_as(ctypes.c_void_p),
        v.ctypes.data_as(ctypes.c_void_p),
        pts.ctypes.data_as(ctypes.c_void_p),
        max_frames, ctypes.byref(w), ctypes.byref(h))
    if n < 0:
        raise ValueError(f"oracle parse error {-n}")
    assert (w.value, h.value) == (width, height), (w.value, h.value)
    return [(y[i], u[i], v[i]) for i in range(n)], pts[:n]

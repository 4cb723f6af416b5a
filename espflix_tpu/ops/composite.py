"""Batched NTSC/PAL composite signal synthesis.

The reference generates the analog TV waveform scanline-by-scanline in
an ISR with packed 32-bit tricks (/root/reference/src/video.cpp:
690-804 blit, 806-837 burst, 889-934 blanking/sync, 845-887 OSD).
Here a whole batch of frames becomes DAC sample streams in one dense
device computation: per-pixel integer math + 256-entry table gathers on
the VPU, producing uint8[N, lines, line_width] fields in temporal
sample order.

The per-sample model is the exact DAC-byte semantics of the reference's
packed-word code (validated against a word-level simulation in
tests/test_composite.py):

    P[x]  = (y[x] + dither[line&3, x&3]) & 0xFC ; p0 = P >> 2
    sa[x] = x%4==0 ? (p0[x]+p0[x-1])>>1 : (P[x-1]>>1 + P[x]>>1)>>2
    cw    = ((ctu[u][k] + ctv[v][k]) & 0xFC) >> 2         (k = 0..3)
    t[2x]   = sa[x] + cw[3 - (x&1)]
    t[2x+1] = p0[x] + cw[1 - (x&1)]

with chroma rows vertically interpolated on odd lines and the PAL
V-switch selecting the negated cos table on odd lines.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from espflix_tpu.video import tables as T

OSD_W, OSD_H = 80, 16
OSD_PROGRESS_W = 352 - OSD_W - 32  # 240


def _interleave_pairs(a, b):
    """[N, H, W] x2 int16 -> [N, H, 2W] uint8 as (a0, b0, a1, b1, ...).

    Packs each (a, b) pair into one uint16 and bitcasts to bytes
    (little-endian: byte 0 = low byte = a): ONE elementwise op + a
    free reshape, replacing the stack+reshape relayout XLA lowers to
    expensive shuffles at these shapes (measured on the composite
    chain).  Values must fit uint8 (callers' DAC samples do).
    """
    packed = ((a.astype(jnp.int32) & 0xFF)
              | ((b.astype(jnp.int32) & 0xFF) << 8)).astype(jnp.uint16)
    by = jax.lax.bitcast_convert_type(packed, jnp.uint8)
    N, H, W, _ = by.shape
    return by.reshape(N, H, 2 * W)


@functools.cache
def _consts(pal: bool):
    g = T.Geometry(pal)
    ctu = T.table_bytes(T.UV_TAB_U)
    ctv_even = T.table_bytes(T.UV_TAB_V)
    ctv_odd = T.table_bytes(T.UV_TAB_V_NEG if pal else T.UV_TAB_V)
    return g, ctu, ctv_even, ctv_odd


@functools.cache
def _dither_planes(h: int, w: int):
    """Static [2, h, w] dither fields (one per frame parity): the 4x4
    ordered pattern tiled over the active region, so the per-pixel
    dither needs no runtime gather (only a 2-way parity select)."""
    rows = np.arange(h) & 3
    cols = np.arange(w) & 3
    out = np.stack([T.DITHER4x4[p * 4 + rows][:, cols]
                    for p in (0, 1)])
    return out.astype(np.int32)


def _chroma_amp(c):
    """Closed form of the chroma tables' amplitude term.

    gen_palettes (espflix.cpp:1119-1187) builds each table entry from
    fn(i) * (128 - c) * (BLACK_LEVEL / 33) rounded half-away-from-zero,
    where fn is sin/cos sampled at 4 samples per color clock -- i.e.
    fn(i) in {0, +1, -1}.  So every byte of UV_TAB_U/V/V_NEG is either
    the carrier bias (2*BLACK_LEVEL) or bias +- this amplitude, pinned
    to [0, 127].  tests/test_composite.py pins byte equality with the
    table form for all 256 inputs."""
    m = (128 - c.astype(jnp.int32)) * T.BLACK_LEVEL
    am = jnp.abs(m)
    # the division runs in int32 (16-bit integer divide lowers poorly);
    # callers cast the +-6096-bounded result back down
    return jnp.sign(m) * ((2 * am + 33) // 66)


def _line_templates(pal: bool) -> np.ndarray:
    """[4, line_width] uint8: 0=blank(even), 1=blank(odd), 2..: vsync."""
    g = T.Geometry(pal)
    W = g.line_width
    if not pal:
        blank = np.full(W, T.BLACK_LEVEL, np.uint8)
        blank[:g.hsync] = T.SYNC_LEVEL
        blank[g.hsync:g.hsync + 40] = T.Geometry(False).burst_ntsc()
        vsync = np.full(W, T.BLANKING_LEVEL, np.uint8)
        vsync[:g.hsync_long] = T.SYNC_LEVEL
        return np.stack([blank, blank, vsync, vsync])
    b0, b1 = g.bursts_pal()
    blanks = []
    for b in (b1, b0):     # line_counter&1 ? b0 : b1 (video.cpp:639)
        ln = np.full(W, T.BLACK_LEVEL, np.uint8)
        ln[:g.hsync] = T.SYNC_LEVEL
        ln[g.burst_start:g.burst_start + g.burst_width] = \
            np.clip(b, 0, 255).astype(np.uint8)
        blanks.append(ln)
    # vsync half-line patterns (video.cpp:918-934)
    def half(flag_long):
        w = W // 2
        ln = np.full(w, T.BLANKING_LEVEL, np.uint8)
        sw = g.hsync_long if flag_long else g.hsync_short
        ln[:sw] = T.SYNC_LEVEL
        return ln
    sync_types = [0, 0, 0, 3, 3, 2, 0, 0]
    vs = [np.concatenate([half(t & 2), half(t & 1)]) for t in sync_types]
    return np.stack(blanks + vs)


@functools.cache
def _templates_cached(pal: bool):
    return _line_templates(pal)


def _luma_samples(y, frame_parity):
    """Dither + luma interpolation: (sa, p0) int16[N, H, W] -- the
    only parity-DEPENDENT part of active synthesis."""
    N, H, W = y.shape
    I16 = jnp.int16
    d01 = _dither_planes(H, W)
    d = jnp.where((frame_parity == 1)[:, None, None],
                  jnp.asarray(d01[1], I16), jnp.asarray(d01[0], I16))
    P = (y.astype(I16) + d) & 0xFC
    p0 = P >> 2
    Pm1 = jnp.concatenate([jnp.zeros((N, H, 1), I16),
                           P[:, :, :-1]], axis=2)
    p0m1 = jnp.concatenate([jnp.zeros((N, H, 1), I16),
                            p0[:, :, :-1]], axis=2)
    xs = jnp.arange(W, dtype=jnp.int32)
    sa = jnp.where((xs % 4 == 0)[None, None, :],
                   (p0 + p0m1) >> 1,
                   ((Pm1 >> 1) + (P >> 1)) >> 2)
    return sa, p0


def synthesize_active(y, u, v, frame_parity, *, pal: bool):
    """Active-region samples: uint8[N, 192, 704].

    y: uint8[N, 192, 352]; u, v: uint8[N, 96, 176];
    frame_parity: int32[N] (temporal dither phase).

    Fully gather-free: the chroma tables collapse to closed-form QAM
    arithmetic (_chroma_amp), the dither is a static tiled plane with a
    2-way parity select, chroma row duplication/interpolation is
    repeat/shift, and the phase-slot picks are interleaves -- pure VPU
    elementwise math that XLA fuses into a couple of kernels (the table
    form cost one 256-entry gather per chroma sample).
    """
    cxa, cxb = _chroma_samples(u, v, pal=pal)
    sa, p0 = _luma_samples(y, frame_parity)
    return _interleave_pairs(sa + cxa, p0 + cxb)


def _chroma_samples(u, v, *, pal: bool):
    """QAM chroma contributions (cxa, cxb) int16[N, H, W] -- parity-
    INDEPENDENT, so the two fields of one frame share one evaluation
    (synthesize_field_pair)."""
    N, Hc, Wc = u.shape
    H = Hc * 2
    W = Wc * 2
    rows = jnp.arange(H, dtype=jnp.int32)
    I16 = jnp.int16

    # chroma rows: raw on even lines, vertically interpolated on odd
    # (u[:, rows>>1] == repeat x2; the next-row operand shifts up one
    # chroma row with a clamped tail, matching the min(half+1, 95) clamp)
    u = u.astype(I16)
    v = v.astype(I16)
    u0 = jnp.repeat(u, 2, axis=1)                      # [N, H, 176]
    v0 = jnp.repeat(v, 2, axis=1)
    u1 = jnp.repeat(jnp.concatenate([u[:, 1:], u[:, -1:]], axis=1),
                    2, axis=1)
    v1 = jnp.repeat(jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1),
                    2, axis=1)
    odd = (rows & 1)[None, :, None] == 1
    ui = jnp.where(odd, (u0 >> 1) + (u1 >> 1), u0)
    vi = jnp.where(odd, (v0 >> 1) + (v1 >> 1), v0)

    # closed-form chroma: byte slots of UV_TAB_U are
    # [bias-ru, bias+ru, bias, bias] and of UV_TAB_V(neg)
    # [bias, bias, bias-+rv, bias+-rv], each pinned to [0,127]
    # (bias = 2*BLACK_LEVEL = 48; see _chroma_amp)
    bias = jnp.int16(2 * T.BLACK_LEVEL)
    ru = _chroma_amp(ui).astype(I16)
    rv = _chroma_amp(vi).astype(I16)
    pu_m = jnp.clip(bias - ru, 0, 127)
    pu_p = jnp.clip(bias + ru, 0, 127)
    pv_m = jnp.clip(bias - rv, 0, 127)
    pv_p = jnp.clip(bias + rv, 0, 127)
    vswitch = odd if pal else jnp.zeros_like(odd)      # PAL V-switch
    k2v = jnp.where(vswitch, pv_p, pv_m)
    k3v = jnp.where(vswitch, pv_m, pv_p)
    cw0 = ((pu_m + bias) & 0xFC) >> 2
    cw1 = ((pu_p + bias) & 0xFC) >> 2
    cw2 = ((bias + k2v) & 0xFC) >> 2
    cw3 = ((bias + k3v) & 0xFC) >> 2

    # phase-slot picks: sample 2x uses slot 3-(x&1), 2x+1 uses 1-(x&1).
    # Pack-as-uint32 interleave: (cw3, cw2) pairs -> one int32 with
    # the two int16 values in byte order, bitcast back to int16 --
    # replaces the stack+reshape relayout (cw* fit in 0..63)
    def ilv16(hi_first, second):
        w = ((hi_first.astype(jnp.int32) & 0xFFFF)
             | (second.astype(jnp.int32) << 16))
        h = jax.lax.bitcast_convert_type(w, jnp.int16)
        return h.reshape(N, H, W)
    cxa = ilv16(cw3, cw2)
    cxb = ilv16(cw1, cw0)
    return cxa, cxb


# ease-in/out scroll animator table (video.cpp:1077), indexed by the
# per-field countdown |animate_index| - 1; sign selects direction
EASE = np.array([0, 8, 16, 24, 48, 72, 104, 136,
                 176, 216, 248, 280, 304, 328, 336, 344], np.int32)


def apply_hscroll(y, u, v, y2, u2, v2, hscroll):
    """Per-lane wraparound blit between two frame buffers.

    The reference's flip animation draws each active line as
    `blit(f, x=h, w=352-h)` then `blit(f^1, x=0, w=h)` with
    h = _hscroll (negated h selects the other buffer first,
    video.cpp:1146-1155).  Batch form: displayed plane = columns
    [h, 352) of the primary frame followed by columns [0, h) of the
    secondary.  hscroll: int32[N] in [-352, 352]; 0 = no animation.
    Chroma scrolls by h>>1 (the reference blit reads chroma at x>>1).
    """
    N, H, W = y.shape
    neg = hscroll < 0
    h = jnp.where(neg, hscroll + W, hscroll)
    # negated scroll swaps which buffer leads (video.cpp:1148-1151)
    ya, yb = jnp.where(neg[:, None, None], y2, y), \
        jnp.where(neg[:, None, None], y, y2)
    ua, ub = jnp.where(neg[:, None, None], u2, u), \
        jnp.where(neg[:, None, None], u, u2)
    va, vb = jnp.where(neg[:, None, None], v2, v), \
        jnp.where(neg[:, None, None], v, v2)

    def wrap(a, b, off, w):
        cols = (jnp.arange(w, dtype=jnp.int32)[None, :]
                + off[:, None]) % (2 * w)
        both = jnp.concatenate([a, b], axis=2)         # [N, H, 2w]
        idx = jnp.broadcast_to(cols[:, None, :], both.shape[:2] + (w,))
        return jnp.take_along_axis(both, idx, axis=2)

    return (wrap(ya, yb, h, W),
            wrap(ua, ub, h >> 1, W // 2),
            wrap(va, vb, h >> 1, W // 2))


@functools.partial(jax.jit, static_argnames=("pal",))
def synthesize_field_scrolled(y, u, v, y2, u2, v2, hscroll,
                              frame_parity, osd, osd_blend,
                              osd_progress, *, pal: bool):
    """synthesize_field over an animated two-buffer wraparound blit.

    Compiled separately from the plain path so steady-state lanes
    never pay the per-lane scroll gather; the output stage dispatches
    here only on ticks where some lane is mid-animation."""
    ye, ue, ve = apply_hscroll(y, u, v, y2, u2, v2, hscroll)
    return synthesize_field(ye, ue, ve, frame_parity, osd, osd_blend,
                            osd_progress, pal=pal)


@functools.partial(jax.jit, static_argnames=("pal",))
def synthesize_field_pair(y, u, v, frame_parity, osd, osd_blend,
                          osd_progress, *, pal: bool):
    """BOTH fields of one 30 fps frame: uint8[N, 2, lines, width].

    The reference ISR emits 60 fields/s per frame pair
    (video.cpp:1122-1198); the fields differ only in the temporal
    dither phase, so the (parity-independent) chroma QAM chain is
    evaluated ONCE and only the luma/dither half runs twice -- ~25%
    cheaper than two synthesize_field calls.  Field 0 uses
    frame_parity, field 1 the opposite parity.
    """
    cxa, cxb = _chroma_samples(u, v, pal=pal)
    N, H, W = y.shape
    fields = []
    for k in range(2):
        sa, p0 = _luma_samples(y, (frame_parity + k) & 1)
        active = _interleave_pairs(sa + cxa, p0 + cxb)
        fields.append(synthesize_field(
            y, u, v, frame_parity, osd, osd_blend, osd_progress,
            pal=pal, active=active))
    return jnp.stack(fields, axis=1)


@functools.partial(jax.jit, static_argnames=("pal",))
def synthesize_field(y, u, v, frame_parity, osd, osd_blend, osd_progress,
                     *, pal: bool, active=None):
    """Full field: uint8[N, line_count, line_width] DAC samples.

    osd: uint8[N, 16, 80] compositing buffer; osd_blend: int32[N]
    (-1 always show, 0 hidden, 1..31 fade, >=32 full); osd_progress:
    int32[N] progress in [0, 240] units (video.cpp:845-887).
    active: optional precomputed active-region samples
    (synthesize_field_pair shares chroma between the two fields).
    """
    g, *_ = _consts(pal)
    N = y.shape[0]
    W = g.line_width
    tmpl = jnp.asarray(_templates_cached(pal))

    # per-line template index
    lines = np.arange(g.line_count)
    if not pal:
        tidx = np.where(lines >= g.vsync_start, 2, lines & 1)
    else:
        tidx = np.where(lines >= g.vsync_start,
                        2 + (lines - g.vsync_start), lines & 1)
    canvas = jnp.broadcast_to(tmpl[jnp.asarray(tidx)][None],
                              (N, g.line_count, W))

    if active is None:
        active = synthesize_active(y, u, v, frame_parity, pal=pal)
    x0 = g.active_x0()
    canvas = jax.lax.dynamic_update_slice(
        canvas, active, (0, g.active_top, x0))

    # ---- OSD overlay (time text + progress bar) ----------------------
    scale = jnp.where(
        (osd_blend != -1) & (osd_blend < 32),
        (63 * jnp.maximum(osd_blend, 0)) >> 5, 63).astype(jnp.int32)
    show = osd_blend != 0
    src = osd.astype(jnp.int32)                        # [N, 16, 80]
    text = ((T.BLACK_LEVEL << 8) + src * scale[:, None, None]) >> 8
    text = jnp.repeat(text, 2, axis=-1)                # [N, 16, 160]
    osd_x = x0 + 16
    region = jax.lax.dynamic_slice(
        canvas, (0, g.osd_top, osd_x), (N, OSD_H, 160))
    region = jnp.where(show[:, None, None], text.astype(jnp.uint8),
                       region)
    canvas = jax.lax.dynamic_update_slice(
        canvas, region, (0, g.osd_top, osd_x))

    # progress bar on OSD lines 3..8, after a 16-sample gap
    c0 = ((T.BLACK_LEVEL << 8) + (scale << 8)) >> 8    # filled
    c1 = ((T.BLACK_LEVEL << 8) + (scale << 7)) >> 8    # empty
    units = jnp.arange(OSD_PROGRESS_W, dtype=jnp.int32)
    # fill decided per PAIR of units (the reference's i += 2 loop)
    filled = (units & ~1)[None, :] < osd_progress[:, None]   # [N, 240]
    barpix = jnp.where(filled, c0[:, None], c1[:, None])
    bar = jnp.repeat(barpix, 2, axis=-1)               # [N, 480]
    bar_x = osd_x + 160 + 16
    reg = jax.lax.dynamic_slice(
        canvas, (0, g.osd_top + 3, bar_x), (N, 6, OSD_PROGRESS_W * 2))
    reg = jnp.where(show[:, None, None],
                    jnp.broadcast_to(bar[:, None, :], reg.shape
                                     ).astype(jnp.uint8), reg)
    canvas = jax.lax.dynamic_update_slice(
        canvas, reg, (0, g.osd_top + 3, bar_x))
    return canvas

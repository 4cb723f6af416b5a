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


@functools.cache
def _consts(pal: bool):
    g = T.Geometry(pal)
    ctu = T.table_bytes(T.UV_TAB_U)
    ctv_even = T.table_bytes(T.UV_TAB_V)
    ctv_odd = T.table_bytes(T.UV_TAB_V_NEG if pal else T.UV_TAB_V)
    return g, ctu, ctv_even, ctv_odd


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


def synthesize_active(y, u, v, frame_parity, *, pal: bool):
    """Active-region samples: uint8[N, 192, 704].

    y: uint8[N, 192, 352]; u, v: uint8[N, 96, 176];
    frame_parity: int32[N] (temporal dither phase).
    """
    g, ctu_b, ctv_even_b, ctv_odd_b = _consts(pal)
    N, H, W = y.shape
    rows = jnp.arange(H, dtype=jnp.int32)
    xs = jnp.arange(W, dtype=jnp.int32)

    dither_tab = jnp.asarray(T.DITHER4x4)             # [8, 4]
    didx = (frame_parity[:, None] << 2) + (rows[None, :] & 3)
    drow = dither_tab[didx]                            # [N, H, 4]
    d = drow[:, :, xs & 3]                             # [N, H, W]

    P = (y.astype(jnp.int32) + d) & 0xFC
    p0 = P >> 2
    Pm1 = jnp.concatenate([jnp.zeros((N, H, 1), jnp.int32),
                           P[:, :, :-1]], axis=2)
    p0m1 = jnp.concatenate([jnp.zeros((N, H, 1), jnp.int32),
                            p0[:, :, :-1]], axis=2)
    sa = jnp.where((xs % 4 == 0)[None, None, :],
                   (p0 + p0m1) >> 1,
                   ((Pm1 >> 1) + (P >> 1)) >> 2)

    # chroma rows: raw on even lines, vertically interpolated on odd
    half = rows >> 1
    nxt = half + jnp.where(rows == H - 1, 0, 1)
    nxt = jnp.minimum(nxt, u.shape[1] - 1)
    u0 = u[:, half].astype(jnp.int32)                  # [N, H, 176]
    v0 = v[:, half].astype(jnp.int32)
    u1 = u[:, nxt].astype(jnp.int32)
    v1 = v[:, nxt].astype(jnp.int32)
    odd = (rows & 1)[None, :, None] == 1
    ui = jnp.where(odd, (u0 >> 1) + (u1 >> 1), u0)
    vi = jnp.where(odd, (v0 >> 1) + (v1 >> 1), v0)

    cu = jnp.asarray(ctu_b)[ui]                        # [N, H, 176, 4]
    cv = jnp.where(odd[..., None],
                   jnp.asarray(ctv_odd_b)[vi],
                   jnp.asarray(ctv_even_b)[vi])
    cw = ((cu + cv) & 0xFC) >> 2

    cxa = cw[:, :, xs >> 1, 3 - (xs & 1)]              # [N, H, W]
    cxb = cw[:, :, xs >> 1, 1 - (xs & 1)]
    ta = sa + cxa
    tb = p0 + cxb
    out = jnp.stack([ta, tb], axis=-1).reshape(N, H, 2 * W)
    return out.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("pal",))
def synthesize_field(y, u, v, frame_parity, osd, osd_blend, osd_progress,
                     *, pal: bool):
    """Full field: uint8[N, line_count, line_width] DAC samples.

    osd: uint8[N, 16, 80] compositing buffer; osd_blend: int32[N]
    (-1 always show, 0 hidden, 1..31 fade, >=32 full); osd_progress:
    int32[N] progress in [0, 240] units (video.cpp:845-887).
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

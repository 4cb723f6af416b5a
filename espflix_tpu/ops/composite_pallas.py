"""Pallas TPU kernel: both composite fields of a frame in one pass.

The XLA composite chain (ops/composite.py) pays several full-canvas
copies per field (template broadcast, active-region update at a
non-tile-aligned offset, OSD/progress slice read-modify-writes) plus
fusion-boundary intermediates -- ~14 ms of the 1024-lane tick while
its arithmetic is <1 ms of VPU work.  This kernel keeps one lane's
planes resident in VMEM and writes each field's canvas exactly once:

  * the per-line templates (sync/burst/blanking/vsync, video.cpp:
    806-934) arrive pre-packed as uint16 SAMPLE PAIRS (one int16 lane
    = two DAC bytes, little-endian), so the canvas minor axis is
    line_width/2 and the (even, odd) interleave is free bit packing;
  * chroma QAM (parity-independent) is evaluated once and shared by
    both fields (the ISR emits 60 fields/s per frame pair,
    video.cpp:1122-1198);
  * luma + dither, OSD text, fade and the progress bar composite as
    full-canvas masked selects (no partial stores -- Mosaic lane
    slices want 128-alignment), with the exact byte semantics of
    composite.synthesize_field (pinned by tests/test_composite.py
    equality on the unpacked bytes).

The chain (runtime/chain.py) consumes the PACKED [N, 2, lines, W/2]
int16 form directly (checksums/taps unpack on demand);
synthesize_field_pair_pallas returns unpacked uint8 fields for the
compat surfaces.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from espflix_tpu.ops import composite as CO
from espflix_tpu.video import tables as T


@functools.cache
def _packed_consts(pal: bool):
    """(templates int16[line_count, W/2], dither int16[2, 192, 352],
    geometry)."""
    g = T.Geometry(pal)
    tm = CO._templates_cached(pal)
    lines = np.arange(g.line_count)
    if not pal:
        tidx = np.where(lines >= g.vsync_start, 2, lines & 1)
    else:
        tidx = np.where(lines >= g.vsync_start,
                        2 + (lines - g.vsync_start), lines & 1)
    full = tm[tidx].astype(np.int32)                  # [L, W] bytes
    packed = (full[:, 0::2] | (full[:, 1::2] << 8)).astype(np.int16)
    dither = CO._dither_planes(192, 352).astype(np.int16)
    return packed, dither, g


def _pad2(x, top, left, L, W2):
    """Static zero-pad a [h, w] block to canvas shape [L, W2]."""
    h, w = x.shape
    return jnp.pad(x, ((top, L - top - h), (left, W2 - left - w)))


def _kernel_parts(par_ref, blend_ref, prog_ref, y_ref, ui_ref, vi_ref,
                  osd_ref, tmpl_ref, dith_ref, act_ref, strip_ref,
                  chk_ref, *, pal, g):
    """Active/OSD-parts form of _kernel: emits only the per-lane
    VARIABLE canvas regions -- the active sample pairs of both fields
    [2, 192, 352] and ONE parity-independent OSD strip [16, W2] (rows
    g.osd_top..+16; identical in both fields) -- instead of the full
    [2, L, W2] canvas, ~71% of whose bytes are constant template.
    assemble_canvas_packed() reconstructs the exact full canvas;
    field_parts_byte_sum() reproduces packed_byte_sum with host-side
    template constants."""
    I32 = jnp.int32
    bias = 2 * T.BLACK_LEVEL
    L, W2 = tmpl_ref.shape

    ui = ui_ref[0].astype(I32)
    vi = vi_ref[0].astype(I32)

    def amp(c):
        m = (128 - c) * T.BLACK_LEVEL
        am = jnp.abs(m)
        # exact magic-multiply for (2*am+33)//66: am <= 128*BLACK_LEVEL
        # = 3072, and (x*3972)>>18 == x//66 for all x <= 6177
        # (exhaustively checked; VPU integer divides are ~10x a mul)
        return jnp.sign(m) * (((2 * am + 33) * 3972) >> 18)

    ru = amp(ui)
    rv = amp(vi)
    pu_m = jnp.clip(bias - ru, 0, 127)
    pu_p = jnp.clip(bias + ru, 0, 127)
    pv_m = jnp.clip(bias - rv, 0, 127)
    pv_p = jnp.clip(bias + rv, 0, 127)
    if pal:
        # PAL V-switch alternates the v phase per line
        vsw = (jax.lax.broadcasted_iota(I32, (192, 352), 0) & 1) == 1
        k2v = jnp.where(vsw, pv_p, pv_m)
        k3v = jnp.where(vsw, pv_m, pv_p)
    else:
        k2v, k3v = pv_m, pv_p
    cw0 = ((pu_m + bias) & 0xFC) >> 2
    cw1 = ((pu_p + bias) & 0xFC) >> 2
    cw2 = ((bias + k2v) & 0xFC) >> 2
    cw3 = ((bias + k3v) & 0xFC) >> 2
    col_odd = (jax.lax.broadcasted_iota(I32, (192, 352), 1) & 1) == 1
    cxa = jnp.where(col_odd, cw2, cw3)
    cxb = jnp.where(col_odd, cw0, cw1)

    # ---- OSD strip (shared by both fields; template shows through
    # where the overlay is off) --------------------------------------
    blend = blend_ref[0, 0, 0]
    scale = jnp.where((blend != -1) & (blend < 32),
                      (63 * jnp.maximum(blend, 0)) >> 5,
                      jnp.int32(63))
    show = blend != 0
    src = osd_ref[0].astype(I32)                       # [16, 80]
    text = ((T.BLACK_LEVEL << 8) + src * scale) >> 8   # [16, 80]
    text_pair = text | (text << 8)
    c0 = ((T.BLACK_LEVEL << 8) + (scale << 8)) >> 8
    c1 = ((T.BLACK_LEVEL << 8) + (scale << 7)) >> 8
    units = jax.lax.broadcasted_iota(I32, (6, CO.OSD_PROGRESS_W), 1)
    filled = (units & ~1) < prog_ref[0, 0, 0]
    bar_pair = jnp.where(filled, c0, c1)
    bar_pair = bar_pair | (bar_pair << 8)              # [6, 240]

    x0 = g.active_x0()
    xp = x0 // 2
    osd_xp = (x0 + 16) // 2
    bar_xp = (x0 + 16 + 160 + 16) // 2

    rows_s = jax.lax.broadcasted_iota(I32, (16, W2), 0)
    cols_s = jax.lax.broadcasted_iota(I32, (16, W2), 1)
    osd_m = ((cols_s >= osd_xp) & (cols_s < osd_xp + 80)) & show
    bar_m = ((rows_s >= 3) & (rows_s < 9) & (cols_s >= bar_xp)
             & (cols_s < bar_xp + CO.OSD_PROGRESS_W)) & show
    osd_c = _pad2(text_pair, 0, osd_xp, 16, W2)
    bar_c = _pad2(bar_pair, 3, bar_xp, 16, W2)
    tmpl_s = tmpl_ref[g.osd_top:g.osd_top + 16, :].astype(I32) & 0xFFFF
    strip = jnp.where(osd_m, osd_c, tmpl_s)
    strip = jnp.where(bar_m, bar_c, strip)
    strip_ref[0] = strip.astype(jnp.int16)

    # ---- both fields' luma in ONE pass: the two fields of a frame
    # pair differ only by the temporal dither plane (video.cpp:
    # 673-683, 1136-1156), so field 0 rides the low 16 bits and field
    # 1 the high 16 bits of each int32 lane.  Every value is <= 255,
    # so 16-bit sub-lanes never carry across and the math is
    # byte-exact for ANY uint8 input (masks clear the >> bleed bit).
    M16 = jnp.int32(0x00FF00FF)
    par = par_ref[0, 0, 0] & 1
    d0 = dith_ref[0].astype(I32)
    d1 = dith_ref[1].astype(I32)
    d01 = jnp.where(par == 1, d1 + (d0 << 16), d0 + (d1 << 16))
    y32 = y_ref[0].astype(I32)
    P = (y32 + (y32 << 16) + d01) & jnp.int32(0x00FC00FC)
    p0 = P >> 2
    z = jnp.zeros((192, 1), I32)
    Pm1 = jnp.concatenate([z, P[:, :-1]], axis=1)
    p0m1 = jnp.concatenate([z, p0[:, :-1]], axis=1)
    xs4 = (jax.lax.broadcasted_iota(I32, (192, 352), 1) & 3) == 0
    sa = jnp.where(xs4, ((p0 + p0m1) >> 1) & M16,
                   ((((Pm1 >> 1) & M16) + ((P >> 1) & M16)) >> 2)
                   & M16)
    sac = sa + cxa + (cxa << 16)
    pbc = p0 + cxb + (cxb << 16)
    act_ref[0, 0] = ((sac & 0xFF)
                     | ((pbc & 0xFF) << 8)).astype(jnp.int16)
    act_ref[0, 1] = (((sac >> 16) & 0xFF)
                     | (((pbc >> 16) & 0xFF) << 8)).astype(jnp.int16)

    # per-lane byte sum of the variable regions, computed while the
    # values are still in VMEM (the chain's field_sum previously
    # re-read the whole [N, 2, 192, 352] act output from HBM):
    # both fields' active bytes + the strip's bytes twice (it appears
    # in both fields); the constant template base adds on the host
    M8b = jnp.int32(0x00FF00FF)
    by = (sac & M8b) + (pbc & M8b)
    act_sum = jnp.sum((by & 0xFFFF) + (by >> 16), dtype=jnp.int32)
    sv = strip & jnp.int32(0xFFFF)
    strip_sum = jnp.sum((sv & 0xFF) + (sv >> 8), dtype=jnp.int32)
    chk_ref[pl.program_id(0), 0] = act_sum + 2 * strip_sum


@functools.cache
def _parts_consts(pal: bool):
    """(base_sum, geometry): base_sum = byte sum of the full two-field
    template canvas MINUS the template bytes under the active regions
    (both fields) and the OSD strip rows (both fields) -- the constant
    part of packed_byte_sum when the variable regions are added."""
    tmpl, _dith, g = _packed_consts(pal)
    t32 = tmpl.astype(np.int64) & 0xFFFF
    by = (t32 & 0xFF) + (t32 >> 8)
    total = int(by.sum())
    xp = g.active_x0() // 2
    act = int(by[g.active_top:g.active_top + 192, xp:xp + 352].sum())
    osd = int(by[g.osd_top:g.osd_top + 16, :].sum())
    return 2 * (total - act - osd), g


@functools.partial(jax.jit, static_argnames=("pal", "interpret"))
def synthesize_field_pair_parts(y, u, v, frame_parity, osd, osd_blend,
                                osd_progress, *, pal: bool,
                                interpret: bool = False):
    """The production form: (act int16[N, 2, 192, 352] packed active
    sample pairs per field, strip int16[N, 16, W2] the shared OSD
    rows, chk int32[N] the complete per-lane canvas byte sum).
    Together with the constant template, act+strip are the complete
    composite signal (assemble_canvas_packed); skipping the constant
    ~71% of canvas bytes saves both kernel stores and downstream
    checksum traffic, and chk is computed in-kernel while the values
    are in VMEM (equals field_parts_byte_sum(act, strip), which no
    longer needs to re-read act from HBM)."""
    tmpl, dith, g = _packed_consts(pal)
    N = y.shape[0]
    L, W2 = tmpl.shape
    base, _g = _parts_consts(pal)

    def prep(c):
        c = c.astype(jnp.int16)
        c0 = jnp.repeat(c, 2, axis=1)
        c1 = jnp.repeat(jnp.concatenate([c[:, 1:], c[:, -1:]], axis=1),
                        2, axis=1)
        odd = (jnp.arange(192) & 1)[None, :, None] == 1
        ci = jnp.where(odd, (c0 >> 1) + (c1 >> 1), c0)
        return jnp.repeat(ci, 2, axis=2).astype(jnp.uint8)

    ui = prep(u)
    vi = prep(v)
    smem = functools.partial(pl.BlockSpec, (1, 1, 1),
                             lambda n: (n, 0, 0),
                             memory_space=pltpu.SMEM)
    act, strip, chk = pl.pallas_call(
        functools.partial(_kernel_parts, pal=pal, g=g),
        grid=(N,),
        in_specs=[
            smem(), smem(), smem(),
            pl.BlockSpec((1, 192, 352), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 192, 352), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 192, 352), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 16, 80), lambda n: (n, 0, 0)),
            pl.BlockSpec((L, W2), lambda n: (0, 0)),
            pl.BlockSpec((2, 192, 352), lambda n: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, 192, 352), lambda n: (n, 0, 0, 0)),
            pl.BlockSpec((1, 16, W2), lambda n: (n, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 2, 192, 352), jnp.int16),
            jax.ShapeDtypeStruct((N, 16, W2), jnp.int16),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ],
        interpret=interpret,
    )(frame_parity.astype(jnp.int32)[:, None, None],
      osd_blend.astype(jnp.int32)[:, None, None],
      osd_progress.astype(jnp.int32)[:, None, None], y, ui, vi, osd,
      jnp.asarray(tmpl), jnp.asarray(dith))
    return act, strip, chk[:, 0] + jnp.int32(base)


def field_parts_byte_sum(act, strip, *, pal: bool):
    """packed_byte_sum equivalent from the parts form: per-lane canvas
    byte sum of both fields (int32[N])."""
    base, _g = _parts_consts(pal)

    def bsum(x, axes):
        v = x.astype(jnp.int32) & 0xFFFF
        return ((v & 0xFF) + (v >> 8)).sum(axis=axes, dtype=jnp.int32)

    return (bsum(act, (1, 2, 3)) + 2 * bsum(strip, (1, 2))
            + jnp.int32(base))


def assemble_canvas_packed(act, strip, *, pal: bool):
    """(act, strip) -> the full packed canvas int16[N, 2, L, W2],
    byte-identical to synthesize_field_pair_packed's output."""
    tmpl, _dith, g = _packed_consts(pal)
    N = act.shape[0]
    L, W2 = tmpl.shape
    xp = g.active_x0() // 2
    canvas = jnp.broadcast_to(jnp.asarray(tmpl)[None, None],
                              (N, 2, L, W2))
    canvas = jax.lax.dynamic_update_slice(
        canvas, act, (0, 0, g.active_top, xp))
    strip2 = jnp.broadcast_to(strip[:, None], (N, 2, 16, W2))
    canvas = jax.lax.dynamic_update_slice(
        canvas, strip2, (0, 0, g.osd_top, 0))
    return canvas


@functools.partial(jax.jit, static_argnames=("pal", "interpret"))
def synthesize_field_pair_packed(y, u, v, frame_parity, osd, osd_blend,
                                 osd_progress, *, pal: bool,
                                 interpret: bool = False):
    """Both fields, PACKED sample pairs: int16[N, 2, lines, width/2]
    (lane k = DAC bytes 2k, 2k+1 little-endian).  unpack_fields()
    recovers the uint8 canvas; byte-exact vs
    composite.synthesize_field_pair.  Compat surface: the production
    chain consumes the parts form (synthesize_field_pair_parts)
    directly and only assembles full canvases for tapped lanes."""
    act, strip, _chk = synthesize_field_pair_parts(
        y, u, v, frame_parity, osd, osd_blend, osd_progress, pal=pal,
        interpret=interpret)
    return assemble_canvas_packed(act, strip, pal=pal)


def unpack_fields(packed):
    """int16[N, 2, L, W/2] -> uint8[N, 2, L, W]."""
    by = jax.lax.bitcast_convert_type(packed, jnp.uint8)
    N, F2, L, W2, _ = by.shape
    return by.reshape(N, F2, L, W2 * 2)


def packed_byte_sum(packed):
    """Per-lane sum of the canvas BYTES from the packed form (equals
    fields.astype(int32).sum() on the unpacked canvas)."""
    v = packed.astype(jnp.int32) & 0xFFFF
    return ((v & 0xFF) + (v >> 8)).sum(axis=(1, 2, 3),
                                       dtype=jnp.int32)


def synthesize_field_pair_pallas(y, u, v, frame_parity, osd, osd_blend,
                                 osd_progress, *, pal: bool,
                                 interpret: bool = False):
    """Drop-in for composite.synthesize_field_pair (unpacked uint8)."""
    return unpack_fields(synthesize_field_pair_packed(
        y, u, v, frame_parity, osd, osd_blend, osd_progress, pal=pal,
        interpret=interpret))

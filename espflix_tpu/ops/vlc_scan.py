"""Vectorized MPEG-1 slice scanner: N independent bitstreams per step.

This is the TPU-native replacement for the reference's bit-serial decoder
hot loop (/root/reference/src/player.cpp:1251-1316,999-1148).  Each batch
lane is one stream's picture payload.  A lane-parallel FSM consumes ONE
syntax element per lane per step:

  * a single 32-bit window per lane covers every element (max code 17
    bits + max immediate field 16 bits <= 32), fetched by a pair
    gather or a one-hot masked reduction (peek=);
  * every VLC table decodes as a where-cascade (gather-free: prefix-
    free codes mean at most one compare matches; elementwise selects
    are ~free on the VPU whereas table gathers serialize per element
    on some runtimes);
  * masked per-state transition math runs on the VPU;
  * at most one (index, value) emission per lane per step is appended
    to a [T, N] log by a contiguous row write; the dense coefficient/
    record buffers are built with ONE bulk scatter after the loop
    (per-step scatters and a carried dense buffer both degrade badly
    on TPU at large N).

The same step function also runs inside the Pallas kernels
(ops/vlc_scan_pallas.py, layout="rows") with words and state
VMEM-resident, and slice-parallel (one scan row per slice,
out_groups= merging the bulk scatter).

The scan produces RAW levels plus per-MB metadata; dequantization, IDCT
and motion compensation run afterwards as dense batched kernels
(espflix_tpu/ops/idct.py, espflix_tpu/ops/mocomp.py) where the MXU/VPU
can stream.

States: see ST_* below.  Error containment: a malformed lane parks in
ST_DONE with its error flag set and cannot poison other lanes
(SURVEY.md 5.3).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from espflix_tpu.core import vlc_tables as V

# FSM states
ST_DONE = 0
ST_SLICE_HDR = 1
ST_EXTRA = 2
ST_MBADDR = 3
ST_SKIP = 4
ST_MBTYPE = 5
ST_MVH = 6
ST_MVV = 7
ST_CBP = 8
ST_DC = 9
ST_COEF = 10
NUM_STATES = 11

# unified LUT entry: kind(2b @24) | bits(5b @18) | run(6b @12) | val12(@0)
K_INVALID, K_COEFF, K_EOB, K_ESCAPE = 0, 1, 2, 3

# MB kinds in the output record
MB_STALE, MB_SKIP, MB_INTER, MB_INTRA = 0, 1, 2, 3


def _hdr_to_unified(lut: np.ndarray) -> np.ndarray:
    """Convert a (len<<16|val16) header LUT to the unified DCT packing,
    kind=K_COEFF, value in the 12-bit signed field."""
    out = np.zeros_like(lut)
    valid = lut != 0
    length = (lut >> 16) & 0xFF
    val = lut & 0xFFFF
    val = np.where(val >= 0x8000, val - 0x10000, val)
    assert ((val >= -2048) & (val < 2048) | ~valid).all()
    out = np.where(valid,
                   (K_COEFF << 24) | (length << 18) | (val & 0xFFF),
                   0).astype(np.int32)
    return out


@functools.cache
def _mega_lut_np():
    parts = [
        ("MBADDR", _hdr_to_unified(V.LUT_MB_ADDR), 11),
        ("MBTYPE_I", _hdr_to_unified(V.LUT_MB_TYPE_I), 6),
        ("MBTYPE_P", _hdr_to_unified(V.LUT_MB_TYPE_P), 6),
        ("CBP", _hdr_to_unified(V.LUT_CBP), 9),
        ("MOTION", _hdr_to_unified(V.LUT_MOTION), 11),
        ("DC_LUM", _hdr_to_unified(V.LUT_DC_LUM), 8),
        ("DC_CHROM", _hdr_to_unified(V.LUT_DC_CHROM), 8),
        ("DCT_FIRST", V.LUT_DCT_FIRST, 17),
        ("DCT_NEXT", V.LUT_DCT_NEXT, 17),
    ]
    bases = {}
    bits = {}
    offset = 0
    arrs = []
    for name, arr, b in parts:
        bases[name] = offset
        bits[name] = b
        arrs.append(arr.astype(np.int32))
        offset += len(arr)
    return np.concatenate(arrs), bases, bits


@functools.cache
def _next_block_lut_np():
    """rem(6-bit cbp mask of remaining blocks) -> index of next coded
    block (highest set bit; block i has bit 0x20>>i); 6 if none."""
    out = np.full(64, 6, np.int32)
    for rem in range(1, 64):
        out[rem] = 5 - rem.bit_length() + 1
    return out


ZZ_NP = V.ZIG_ZAG.astype(np.int32)


def scanner_constants():
    """Device-resident constant buffers for the scanner."""
    lut, bases, bits = _mega_lut_np()
    return dict(
        mega_lut=jnp.asarray(lut),
        next_blk=jnp.asarray(_next_block_lut_np()),
        zigzag=jnp.asarray(ZZ_NP),
        bases=bases,
        bits=bits,
    )


def _peek_window(words, bitpos, mode: str = "gather"):
    """32 bits starting at bitpos (MSB-aligned), as uint32.

    words: uint32[N, W]; bitpos int32[N].

    mode="gather": take_along_axis pair gather (the gather carries an
    explicit batch dimension so XLA vectorizes divergent positions).
    mode="reduce": one-hot masked reductions over the words axis --
    dense vector work with zero gathers, for runtimes where divergent
    gathers serialize per element (measured ~60ns/elem here: the pair
    gather is the dominant per-step cost at N=1024)."""
    w_idx = bitpos >> 5
    off = (bitpos & 31).astype(jnp.uint32)
    if mode == "reduce":
        W = words.shape[1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        z = jnp.uint32(0)
        w0 = jnp.where(iota == w_idx[:, None], words, z).sum(
            axis=1, dtype=jnp.uint32)
        w1 = jnp.where(iota == w_idx[:, None] + 1, words, z).sum(
            axis=1, dtype=jnp.uint32)
    else:
        pair = jnp.stack([w_idx, w_idx + 1], axis=1)
        got = jnp.take_along_axis(words, pair, axis=1)
        w0, w1 = got[:, 0], got[:, 1]
    hi = (w0 << off)
    lo = jnp.where(off == 0, jnp.uint32(0), w1 >> (jnp.uint32(32) - off))
    return hi | lo


def _peek_window_rows(words, bitpos):
    """Row-layout peek: words (W, N) uint32, bitpos (1, N) int32.

    One-hot masked reductions over the sublane (word) axis -- zero
    gathers, 2-D tiles throughout; the form the Pallas scan kernel
    lowers (cross-sublane reduces are native on TPU)."""
    w_idx = bitpos >> 5
    off = (bitpos & 31).astype(jnp.uint32)
    W = words.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)
    # Mosaic has no unsigned reductions: reduce as int32 bits (exact --
    # exactly one nonzero term per column) and bitcast back
    wi = jax.lax.bitcast_convert_type(words, jnp.int32)
    z = jnp.int32(0)
    w0 = jax.lax.bitcast_convert_type(
        jnp.where(iota == w_idx, wi, z).sum(
            axis=0, keepdims=True, dtype=jnp.int32), jnp.uint32)
    w1 = jax.lax.bitcast_convert_type(
        jnp.where(iota == w_idx + 1, wi, z).sum(
            axis=0, keepdims=True, dtype=jnp.int32), jnp.uint32)
    hi = (w0 << off)
    lo = jnp.where(off == 0, jnp.uint32(0), w1 >> (jnp.uint32(32) - off))
    return hi | lo


def _bits_of(window, start, n):
    """n bits of the 32-bit window starting at bit `start` (from MSB).
    start/n may be traced int32; result int32.  n==0 yields junk (callers
    guard); the shift amount is clamped to stay defined."""
    start = jnp.asarray(start, jnp.int32).astype(jnp.uint32)
    nn = jnp.asarray(n, jnp.int32)
    sh = jnp.clip(32 - nn, 0, 31).astype(jnp.uint32)
    return ((window << start) >> sh).astype(jnp.int32)


def _cascade(codes: dict, peek, max_bits: int):
    """Prefix-free code dict -> (value, length) via a where-cascade.

    Elementwise selects are effectively free on TPU (unlike table
    gathers, which serialize per element on some runtimes); with a
    prefix-free code set at most one compare matches.  length 0 =
    invalid."""
    val = jnp.zeros_like(peek)
    ln = jnp.zeros_like(peek)
    for code, v in codes.items():
        L = len(code)
        match = (peek >> (max_bits - L)) == int(code, 2)
        val = jnp.where(match, v, val)
        ln = jnp.where(match, L, ln)
    return val, ln


def _select(conds, vals, default):
    """jnp.select equivalent as a where-chain (jnp.select lowers via
    argmax, which Mosaic only supports for f32; a chain of selects
    lowers everywhere and is what the VPU executes anyway)."""
    out = default
    for c, v in zip(reversed(conds), reversed(vals)):
        out = jnp.where(c, v, out)
    return out


def _cascade_table(values, idx):
    """values[idx] for a small constant table via where-cascade."""
    out = jnp.full_like(idx, int(values[0]))
    for k in range(1, len(values)):
        out = jnp.where(idx == k, int(values[k]), out)
    return out


def _dct_decode(win, peek17, is_first):
    """Table B-14 decode from the 32-bit window, gather-free.

    Returns (kind, bits, run, level) with the same semantics as the
    LUT entries (sign consumed for coefficient codes; escape = 12 bits
    consumed with run extracted; EOB only in the not-first form)."""
    # codes excluding the '1'-prefix short forms (handled below)
    run = jnp.zeros_like(peek17)
    lev = jnp.zeros_like(peek17)
    ln = jnp.zeros_like(peek17)
    for code, (r, l) in V.DCT_COEFF.items():
        if code == "11":
            continue
        L = len(code)
        match = (peek17 >> (17 - L)) == int(code, 2)
        run = jnp.where(match, r, run)
        lev = jnp.where(match, l, lev)
        ln = jnp.where(match, L, ln)
    sign = _bits_of(win, ln, 1)
    level = jnp.where(sign == 1, -lev, lev)
    bits = ln + 1
    kind = jnp.where(ln > 0, K_COEFF, K_INVALID)

    # escape '000001' + 6-bit run
    esc = (peek17 >> 11) == 0b000001
    kind = jnp.where(esc, K_ESCAPE, kind)
    bits = jnp.where(esc, 12, bits)
    run = jnp.where(esc, _bits_of(win, jnp.full_like(ln, 6), 6), run)
    level = jnp.where(esc, 0, level)

    # leading-'1' short forms (player.cpp:552-556,1080-1087)
    msb = (peek17 >> 16) == 1
    b2 = (peek17 >> 15) & 1
    sgn1 = jnp.where(is_first, b2, (peek17 >> 14) & 1)
    one = jnp.where(sgn1 == 1, -1, 1)
    kind = jnp.where(msb & is_first, K_COEFF, kind)
    kind = jnp.where(msb & ~is_first & (b2 == 0), K_EOB, kind)
    kind = jnp.where(msb & ~is_first & (b2 == 1), K_COEFF, kind)
    bits = jnp.where(msb, jnp.where(is_first, 2, jnp.where(
        b2 == 1, 3, 2)), bits)
    run = jnp.where(msb, 0, run)
    level = jnp.where(msb, jnp.where(
        ~is_first & (b2 == 0), 0, one), level)
    return kind, bits, run, level


def make_scan_step(consts, mb_width: int, mb_count: int, words_per_lane: int,
                   peek: str = "gather", layout: str = "lanes",
                   peek_fn=None):
    """Returns step(carry) -> carry for one symbol per lane.

    Carry pytree:
      words_flat uint32[N*W]
      st: dict of int32[N] state vars
      out: dict of output buffers (flat, with a trash slot at the end)

    layout="lanes" (default): state vars are [N], words [N, W],
    slice_starts/rows [N, S].  layout="rows": state vars are (1, N),
    words (W, N), slice_starts/rows (S, N) -- Mosaic-friendly 2-D
    tiles (forces the gather-free reduce peek).  layout="rows8": state
    vars are (8, N/8) -- ONE vreg per variable at N=1024 instead of 8,
    cutting the kernel's register pressure 8x; slice_starts/rows are
    (S, 8, N/8) and the window peek must come via peek_fn.
    """
    MB6 = mb_count * 6
    COEF_STRIDE = mb_count * 384
    rows = layout in ("rows", "rows8")
    rows8 = layout == "rows8"
    if rows8:
        assert peek_fn is not None, "rows8 layout requires a peek_fn"

    def slice_col(arr, k):
        # slice_starts/rows column k in any layout
        if rows8:
            return arr[k]
        return arr[k:k + 1] if rows else arr[:, k]

    def step(carry):
        words, st = carry
        N = st["state"].shape[0]

        state = st["state"]
        bitpos = st["bitpos"]
        if peek_fn is not None:
            win = peek_fn(words, bitpos)
        elif rows:
            win = _peek_window_rows(words, bitpos)
        else:
            win = _peek_window(words, bitpos, mode=peek)
        peek17 = (win >> jnp.uint32(15)).astype(jnp.int32)
        peek23_zero = (win >> jnp.uint32(9)) == 0

        # ------- gather-free VLC decode: all tables as where-cascades ----
        # (every decoder runs every step; elementwise selects are ~free,
        # whereas the former shared mega-LUT gather serialized per lane)
        is_p = st["pic_type"] == 2
        a_val, a_ln = _cascade(V.MB_ADDR_INC, peek17 >> 6, 11)
        ti_val, ti_ln = _cascade(V.MB_TYPE_I, peek17 >> 11, 6)
        tp_val, tp_ln = _cascade(V.MB_TYPE_P, peek17 >> 11, 6)
        t_val = jnp.where(is_p, tp_val, ti_val)
        t_ln = jnp.where(is_p, tp_ln, ti_ln)
        c_val, c_ln = _cascade(V.CBP, peek17 >> 8, 9)
        m_val, m_ln = _cascade(V.MOTION_CODE, peek17 >> 6, 11)
        dl_val, dl_ln = _cascade(V.DC_SIZE_LUM, peek17 >> 9, 8)
        dc_val, dc_ln = _cascade(V.DC_SIZE_CHROM, peek17 >> 9, 8)
        d_val = jnp.where(st["blk"] < 4, dl_val, dc_val)
        d_ln = jnp.where(st["blk"] < 4, dl_ln, dc_ln)
        k_dct, b_dct, r_dct, l_dct = _dct_decode(
            win, peek17, st["n"] == 0)

        in_coef = state == ST_COEF
        hdr_val = _select(
            [state == ST_MBADDR, state == ST_MBTYPE, state == ST_CBP,
             (state == ST_MVH) | (state == ST_MVV), state == ST_DC],
            [a_val, t_val, c_val, m_val, d_val],
            default=jnp.zeros_like(state))
        hdr_ln = _select(
            [state == ST_MBADDR, state == ST_MBTYPE, state == ST_CBP,
             (state == ST_MVH) | (state == ST_MVV), state == ST_DC],
            [a_ln, t_ln, c_ln, m_ln, d_ln],
            default=jnp.zeros_like(state))
        e_kind = jnp.where(in_coef, k_dct,
                           jnp.where(hdr_ln > 0, K_COEFF, K_INVALID))
        e_bits = jnp.where(in_coef, b_dct, hdr_ln)
        e_run = jnp.where(in_coef, r_dct, 0)
        e_val = jnp.where(in_coef, l_dct, hdr_val)

        # defaults: stay put
        new = {k: v for k, v in st.items()}
        consumed = jnp.zeros_like(bitpos)
        error = st["error"]

        # emission slots; TRASH marks "no emission this step"
        TRASH = mb_count + MB6 + COEF_STRIDE
        coef_idx = jnp.full_like(state, TRASH)
        coef_val = jnp.zeros_like(state)
        rec_idx = jnp.full_like(state, TRASH)
        rec_val = jnp.zeros_like(state)
        nfin_idx = jnp.full_like(state, TRASH)
        nfin_val = jnp.zeros_like(state)

        def sel(mask, a, b):
            return jnp.where(mask, a, b)

        # ---------- helpers ------------------------------------------------
        def advance_mb(mb_x, mb_y):
            nx = mb_x + 1
            wrap = nx >= mb_width
            return sel(wrap, nx - mb_width, nx), sel(wrap, mb_y + 1, mb_y)

        def mb_index(mb_x, mb_y):
            return jnp.clip(mb_y * mb_width + mb_x, 0, mb_count - 1)

        # ================== ST_SLICE_HDR ===================================
        m = state == ST_SLICE_HDR
        qs5 = _bits_of(win, jnp.zeros_like(bitpos), 5)
        extra = _bits_of(win, jnp.full_like(bitpos, 5), 1)
        new["qscale"] = sel(m, qs5, new["qscale"])
        new["y_dc"] = sel(m, 128, new["y_dc"])
        new["u_dc"] = sel(m, 128, new["u_dc"])
        new["v_dc"] = sel(m, 128, new["v_dc"])
        new["mv_h"] = sel(m, 0, new["mv_h"])
        new["mv_v"] = sel(m, 0, new["mv_v"])
        new["first_mb"] = sel(m, 1, new["first_mb"])
        new["inc_acc"] = sel(m, 0, new["inc_acc"])
        consumed = sel(m, 6, consumed)
        new["state"] = sel(m, sel(extra == 1, ST_EXTRA, ST_MBADDR),
                           new["state"])

        # ================== ST_EXTRA =======================================
        m = state == ST_EXTRA
        nxt = _bits_of(win, jnp.full_like(bitpos, 8), 1)
        consumed = sel(m, 9, consumed)
        new["state"] = sel(m, sel(nxt == 1, ST_EXTRA, ST_MBADDR),
                           new["state"])

        # ================== ST_MBADDR ======================================
        # slice-done / next-slice handling happens here (reference checks
        # slice_done() at the top of each MB iteration, player.cpp:1266)
        m = state == ST_MBADDR
        done_slice = m & peek23_zero
        more_slices = st["slice_idx"] + 1 < st["n_slices"]
        nsl = st["slice_idx"] + 1
        n_slice_cols = (st["slice_starts"].shape[0] if rows
                        else st["slice_starts"].shape[1])
        safe_nsl = jnp.clip(nsl, 0, n_slice_cols - 1)
        nsl_start = slice_col(st["slice_starts"], 0)
        nsl_row = slice_col(st["slice_rows"], 0)
        for k in range(1, n_slice_cols):
            nsl_start = jnp.where(safe_nsl == k,
                                  slice_col(st["slice_starts"], k),
                                  nsl_start)
            nsl_row = jnp.where(safe_nsl == k,
                                slice_col(st["slice_rows"], k), nsl_row)
        new["slice_idx"] = sel(done_slice, nsl, new["slice_idx"])
        new["bitpos"] = st["bitpos"]  # consumed applied at the end
        new["state"] = sel(done_slice,
                           sel(more_slices, ST_SLICE_HDR, ST_DONE),
                           new["state"])
        # entering a new slice: position + mb coords
        new["mb_x"] = sel(done_slice, -1, new["mb_x"])
        new["mb_y"] = sel(done_slice, nsl_row, new["mb_y"])
        slice_jump = done_slice & more_slices

        m_addr = m & ~done_slice
        bad = m_addr & (e_kind == K_INVALID)
        is_stuff = e_val == V.MB_STUFFING
        is_esc = e_val == V.MB_ESCAPE
        consumed = sel(m_addr, e_bits, consumed)
        new["inc_acc"] = sel(m_addr & is_esc, st["inc_acc"] + 33,
                             new["inc_acc"])
        got = m_addr & ~is_stuff & ~is_esc & ~bad
        increment = st["inc_acc"] + e_val
        # first MB of a slice advances exactly one (reference quirk)
        eff_inc = sel(st["first_mb"] == 1, 1, increment)
        ax, ay = advance_mb(st["mb_x"], st["mb_y"])
        one = got & (eff_inc == 1)
        multi = got & (eff_inc > 1)
        new["mb_x"] = sel(one, ax, new["mb_x"])
        new["mb_y"] = sel(one, ay, new["mb_y"])
        new["state"] = sel(one, ST_MBTYPE, new["state"])
        # multi: reset predictors, enter SKIP with pending count
        for k, vdef in (("y_dc", 128), ("u_dc", 128), ("v_dc", 128),
                        ("mv_h", 0), ("mv_v", 0)):
            new[k] = sel(multi, vdef, new[k])
        new["pending_skip"] = sel(multi, eff_inc - 1, new["pending_skip"])
        new["state"] = sel(multi, ST_SKIP, new["state"])
        new["inc_acc"] = sel(got, 0, new["inc_acc"])
        new["first_mb"] = sel(got, 0, new["first_mb"])
        error = error | bad
        new["state"] = sel(bad, ST_DONE, new["state"])

        # ================== ST_SKIP ========================================
        m = state == ST_SKIP
        ax, ay = advance_mb(st["mb_x"], st["mb_y"])
        new["mb_x"] = sel(m, ax, new["mb_x"])
        new["mb_y"] = sel(m, ay, new["mb_y"])
        mi = mb_index(ax, ay)
        rec_idx = sel(m, mi, rec_idx)
        rec_val = sel(m, MB_SKIP, rec_val)  # kind in low 2 bits, rest 0
        left = st["pending_skip"] - 1
        new["pending_skip"] = sel(m, left, new["pending_skip"])
        new["state"] = sel(m & (left == 0), ST_MBTYPE, new["state"])
        # (skips consume no bits; when count hits 0 the NEXT step decodes
        # mb_type after one more advance)
        adv2x, adv2y = advance_mb(ax, ay)
        new["mb_x"] = sel(m & (left == 0), adv2x, new["mb_x"])
        new["mb_y"] = sel(m & (left == 0), adv2y, new["mb_y"])

        # ================== ST_MBTYPE ======================================
        m = state == ST_MBTYPE
        bad = m & (e_kind == K_INVALID)
        mb_type = e_val
        q_flag = (mb_type & V.MBT_QUANT) != 0
        qs_new = _bits_of(win, e_bits, 5)
        consumed = sel(m, e_bits + sel(q_flag, 5, 0), consumed)
        new["qscale"] = sel(m & q_flag & ~bad, qs_new, new["qscale"])
        intra = (mb_type & V.MBT_INTRA) != 0
        motion = (mb_type & V.MBT_MOTION_F) != 0
        pattern = (mb_type & V.MBT_PATTERN) != 0
        new["mb_type"] = sel(m, mb_type, new["mb_type"])
        # intra: reset MVs, all 6 blocks, begin with DC of block 0
        mm = m & ~bad & intra
        new["mv_h"] = sel(mm, 0, new["mv_h"])
        new["mv_v"] = sel(mm, 0, new["mv_v"])
        new["cbp"] = sel(mm, 63, new["cbp"])
        new["blk"] = sel(mm, 0, new["blk"])
        new["n"] = sel(mm, 0, new["n"])
        new["state"] = sel(mm, ST_DC, new["state"])
        # non-intra: reset DC preds
        mni = m & ~bad & ~intra
        for k in ("y_dc", "u_dc", "v_dc"):
            new[k] = sel(mni, 128, new[k])
        new["state"] = sel(mni & motion, ST_MVH, new["state"])
        no_mv = mni & ~motion
        new["mv_h"] = sel(no_mv, 0, new["mv_h"])
        new["mv_v"] = sel(no_mv, 0, new["mv_v"])
        new["state"] = sel(no_mv & pattern, ST_CBP, new["state"])
        new["state"] = sel(no_mv & ~pattern, ST_MBADDR, new["state"])
        # record emission for MBs whose header is complete here
        mi = mb_index(st["mb_x"], st["mb_y"])
        emit_here = (mm | no_mv)
        kind_val = sel(intra, MB_INTRA, MB_INTER)
        packed = kind_val | (new["qscale"] << 2)  # mv 0 in both cases here
        rec_idx = sel(emit_here, mi, rec_idx)
        rec_val = sel(emit_here, packed, rec_val)
        error = error | bad
        new["state"] = sel(bad, ST_DONE, new["state"])

        # ================== ST_MVH / ST_MVV ================================
        for stv, key in ((ST_MVH, "mv_h"), (ST_MVV, "mv_v")):
            m = state == stv
            bad = m & (e_kind == K_INVALID)
            code = e_val
            r_size = st["r_size"]
            scale = jnp.int32(1) << r_size
            has_resid = (code != 0) & (scale != 1)
            resid = _bits_of(win, e_bits, r_size.astype(jnp.int32))
            # _bits_of with traced width: (win << start) >> (32 - n)
            mag = ((jnp.abs(code) - 1) << r_size) + resid + 1
            d = sel(has_resid, sel(code < 0, -mag, mag), code)
            mval = st[key] + d
            mval = sel(mval > (scale << 4) - 1, mval - (scale << 5), mval)
            mval = sel(mval < -(scale << 4), mval + (scale << 5), mval)
            consumed = sel(m, e_bits + sel(has_resid, r_size, 0), consumed)
            new[key] = sel(m & ~bad, mval, new[key])
            error = error | bad
            new["state"] = sel(bad, ST_DONE, new["state"])
        m = state == ST_MVH
        new["state"] = sel(m & (new["state"] == ST_MVH), ST_MVV,
                           new["state"])
        m = state == ST_MVV
        mvv_done = m & (new["state"] == ST_MVV)
        pattern = (st["mb_type"] & V.MBT_PATTERN) != 0
        new["state"] = sel(mvv_done & pattern, ST_CBP, new["state"])
        new["state"] = sel(mvv_done & ~pattern, ST_MBADDR, new["state"])
        # emit record with final MVs (effective half-pel incl. full_pel)
        mi = mb_index(st["mb_x"], st["mb_y"])
        mvh_eff = new["mv_h"] << st["full_pel"]
        mvv_eff = new["mv_v"] << st["full_pel"]
        packed = (MB_INTER | (st["qscale"] << 2)
                  | ((mvh_eff & 0xFFF) << 7) | ((mvv_eff & 0xFFF) << 19))
        rec_idx = sel(mvv_done, mi, rec_idx)
        rec_val = sel(mvv_done, packed, rec_val)

        # ================== ST_CBP =========================================
        m = state == ST_CBP
        bad = m & (e_kind == K_INVALID)
        consumed = sel(m, e_bits, consumed)
        cbp = e_val
        new["cbp"] = sel(m & ~bad, cbp, new["cbp"])
        first_blk = 5 - (31 - jax.lax.clz(jnp.maximum(cbp, 1)))
        # cbp from the table is 1..63 so first_blk < 6 always
        new["blk"] = sel(m & ~bad, first_blk, new["blk"])
        new["n"] = sel(m & ~bad, 0, new["n"])
        new["state"] = sel(m & ~bad, ST_COEF, new["state"])
        error = error | bad
        new["state"] = sel(bad, ST_DONE, new["state"])

        # ================== ST_DC ==========================================
        m = state == ST_DC
        bad = m & (e_kind == K_INVALID)
        dc_size = e_val
        delta = _bits_of(win, e_bits, dc_size)  # dc_size may be 0 -> junk
        # dc_delta semantics (player.cpp:1053-1057)
        top = (delta & (jnp.int32(1) << jnp.maximum(dc_size - 1, 0))) != 0
        neg = ((jnp.int32(-1) << dc_size) | (delta + 1))
        pred = _select(
            [st["blk"] < 4, st["blk"] == 4],
            [st["y_dc"], st["u_dc"]], default=st["v_dc"])
        dc = sel(dc_size == 0, pred, pred + sel(top, delta, neg))
        consumed = sel(m, e_bits + dc_size, consumed)
        upd = m & ~bad
        new["y_dc"] = sel(upd & (st["blk"] < 4), dc, new["y_dc"])
        new["u_dc"] = sel(upd & (st["blk"] == 4), dc, new["u_dc"])
        new["v_dc"] = sel(upd & (st["blk"] == 5), dc, new["v_dc"])
        # emit DC as raw value at block position 0
        mi = mb_index(st["mb_x"], st["mb_y"])
        cidx = mb_count + MB6 + mi * 384 + st["blk"] * 64
        coef_idx = sel(upd, cidx, coef_idx)
        coef_val = sel(upd, dc, coef_val)
        new["n"] = sel(upd, 1, new["n"])
        new["state"] = sel(upd, ST_COEF, new["state"])
        error = error | bad
        new["state"] = sel(bad, ST_DONE, new["state"])

        # ================== ST_COEF ========================================
        m = state == ST_COEF
        bad = m & (e_kind == K_INVALID)
        is_eob = e_kind == K_EOB
        is_esc = e_kind == K_ESCAPE
        # escape immediate level (8 or 16 bits after the 12-bit prefix)
        v8 = _bits_of(win, e_bits, 8)
        v16lo = _bits_of(win, e_bits + 8, 8)
        esc_level = _select(
            [v8 == 0, v8 == 128, v8 > 128],
            [v16lo, v16lo - 256, v8 - 256], default=v8)
        esc_extra = sel((v8 == 0) | (v8 == 128), 16, 8)
        level = sel(is_esc, esc_level, e_val)
        nn = st["n"] + e_run
        oob = m & ~bad & ~is_eob & (nn >= 64)
        zz_pos = _cascade_table(ZZ_NP, jnp.clip(nn, 0, 63))
        consumed = sel(m, e_bits + sel(is_esc, esc_extra, 0), consumed)
        emit = m & ~bad & ~is_eob & ~oob
        mi = mb_index(st["mb_x"], st["mb_y"])
        cidx = mb_count + MB6 + mi * 384 + st["blk"] * 64 + zz_pos
        coef_idx = sel(emit, cidx, coef_idx)
        coef_val = sel(emit, level, coef_val)
        new["n"] = sel(emit, nn + 1, new["n"])
        # EOB: store final n, advance to next coded block or end MB
        meob = m & ~bad & is_eob
        nfin_idx = sel(meob, mb_count + mi * 6 + st["blk"], nfin_idx)
        nfin_val = sel(meob, st["n"], nfin_val)
        rem = st["cbp"] & ((jnp.int32(0x20) >> st["blk"]) - 1)
        nb = jnp.where(rem > 0,
                       5 - (31 - jax.lax.clz(jnp.maximum(rem, 1))), 6)
        have_more = nb < 6
        intra = (st["mb_type"] & V.MBT_INTRA) != 0
        new["blk"] = sel(meob & have_more, nb, new["blk"])
        new["n"] = sel(meob & have_more, 0, new["n"])
        new["state"] = sel(meob & have_more,
                           sel(intra, ST_DC, ST_COEF), new["state"])
        new["state"] = sel(meob & ~have_more, ST_MBADDR, new["state"])
        error = error | bad | oob
        new["state"] = sel(bad | oob, ST_DONE, new["state"])

        # ---------- apply bit consumption / slice jumps --------------------
        live = state != ST_DONE
        bp = bitpos + sel(live, consumed, 0)
        bp = sel(slice_jump, nsl_start, bp)
        new["bitpos"] = bp
        new["error"] = error

        # ---------- emission: ONE packed word per lane per step -------
        # The emitting states are mutually exclusive per lane, so each
        # step produces at most one (index, value) pair; it is appended
        # to a [T_max, N] log with a contiguous row write (carrying the
        # dense output buffer through the loop and scattering per step
        # blows past VMEM at large N and degrades ~70x).  The dense
        # buffers are built afterwards with one bulk scatter.
        idx1 = jnp.where(rec_idx != TRASH, rec_idx,
                         jnp.where(nfin_idx != TRASH, nfin_idx, coef_idx))
        val1 = jnp.where(rec_idx != TRASH, rec_val,
                         jnp.where(nfin_idx != TRASH, nfin_val, coef_val))
        return (words, new), (idx1, val1)

    return step


def run_scan(words: jnp.ndarray, init_state: dict, mb_width: int,
             mb_count: int, max_steps: int, unroll: int = 1,
             max_symbols: int = 20000, out_groups: int = 1,
             peek: str = "gather"):
    """Run the FSM to completion (or max_steps).  words: uint32[N, W].

    max_steps bounds the emission log rows (one row per step); lanes
    still scanning when it is hit finish with their error flag set by
    construction (state stays != DONE; callers see partial output).

    unroll: symbols decoded per while-loop iteration (amortizes loop
    overhead; DONE lanes self-mask so over-running is harmless).

    out_groups: scan rows per output row.  Slice-parallel decoding runs
    each slice as its own scan row (the per-step cost of this runtime is
    nearly row-count-independent, so S-fold rows at 1/S the steps is a
    near-S-fold win); consecutive groups of `out_groups` rows scatter
    into ONE dense output row.  Distinct slices own disjoint MB ranges,
    so the combined scatter is collision-free on well-formed streams
    (malformed ones flag lane errors and their output is discarded).

    Returns (coeffs int16[G, mb_count*384], recs int32[G, mb_count],
    nfinal int32[G, mb_count*6], final_state, iters) where
    G = N // out_groups."""
    N, W = words.shape
    # the emission log has one row per step, so the step budget is a
    # SYMBOL budget (callers pass a bit budget; symbols <= bits).  Lanes
    # still scanning at the cap finish with state != ST_DONE, which
    # callers surface as a lane error.
    max_steps = min(max_steps, max_symbols)
    consts = scanner_constants()
    step = make_scan_step(consts, mb_width, mb_count, W, peek=peek)
    MB6 = mb_count * 6
    C_TOTAL = mb_count + MB6 + mb_count * 384
    TRASH = C_TOTAL

    log_idx = jnp.full((max_steps, N), TRASH, jnp.int32)
    log_val = jnp.zeros((max_steps, N), jnp.int32)

    def cond(c_i):
        (w, st), li, lv, i = c_i
        return (i < max_steps) & jnp.any(st["state"] != ST_DONE)

    def body(c_i):
        c, li, lv, i = c_i
        for k in range(unroll):
            c, (idx1, val1) = step(c)
            li = jax.lax.dynamic_update_slice_in_dim(
                li, idx1[None], i + k, axis=0)
            lv = jax.lax.dynamic_update_slice_in_dim(
                lv, val1[None], i + k, axis=0)
        return (c, li, lv, i + unroll)

    (words_out, st), log_idx, log_val, iters = jax.lax.while_loop(
        cond, body, ((words, init_state), log_idx, log_val,
                     jnp.int32(0)))

    # bulk scatter: [T, N] logs -> dense [G, C_TOTAL (+trash)]
    G = N // out_groups
    idx = log_idx.T.reshape(G, out_groups * log_idx.shape[0])
    val = log_val.T.reshape(G, out_groups * log_val.shape[0])
    buf = jnp.zeros((G, C_TOTAL + 1), jnp.int32)
    buf = jnp.put_along_axis(buf, idx, val, axis=1, inplace=False)

    recs = buf[:, :mb_count]
    nfinal = buf[:, mb_count:mb_count + MB6]
    coeffs = buf[:, mb_count + MB6:C_TOTAL].astype(jnp.int16)
    return coeffs, recs, nfinal, st, iters


def initial_state(n_lanes: int, slice_starts, slice_rows, n_slices,
                  pic_type, full_pel, r_size):
    """Build the SoA init state. Lanes with n_slices==0 start DONE."""
    z = jnp.zeros((n_lanes,), jnp.int32)
    first_start = slice_starts[:, 0]
    first_row = slice_rows[:, 0]
    alive = n_slices > 0
    return dict(
        state=jnp.where(alive, ST_SLICE_HDR, ST_DONE).astype(jnp.int32),
        bitpos=jnp.where(alive, first_start, 0).astype(jnp.int32),
        slice_idx=z,
        slice_starts=slice_starts.astype(jnp.int32),
        slice_rows=slice_rows.astype(jnp.int32),
        n_slices=n_slices.astype(jnp.int32),
        pic_type=pic_type.astype(jnp.int32),
        full_pel=full_pel.astype(jnp.int32),
        r_size=r_size.astype(jnp.int32),
        mb_x=z - 1,
        mb_y=jnp.where(alive, first_row, 0).astype(jnp.int32),
        qscale=z + 1,
        y_dc=z + 128, u_dc=z + 128, v_dc=z + 128,
        mv_h=z, mv_v=z,
        mb_type=z, cbp=z, blk=z, n=z,
        pending_skip=z, inc_acc=z, first_mb=z + 1,
        error=jnp.zeros((n_lanes,), jnp.bool_),
    )

"""Batched bit-exact dequant + fixed-point 8x8 IDCT.

The reference interleaves VLC decode, dequant and a scalar IDCT per block
(/root/reference/src/player.cpp:999-1148,922-996).  Here the scanner
(ops/vlc_scan.py) has already emitted RAW levels into dense raster-order
block buffers, so dequant and the IDCT run as pure batched integer VPU
math over [..., 8, 8] — no data-dependent control flow, fully fusable by
XLA.

All arithmetic is int32 with the reference's exact rounding:
  * dequant: double+oddify+truncating-/16 (player.cpp:1110-1121),
  * IDCT: 473/196/362 fixed-point butterflies, column pass unshifted,
    row pass (+128)>>8 (player.cpp:922-996),
  * the non-intra single-coefficient "DC shortcut" (player.cpp:1133-1140)
    which rounds differently from the full IDCT and is selected via the
    scanner's per-block final-n.
"""

from __future__ import annotations

import jax.numpy as jnp

from espflix_tpu.core import vlc_tables as V


def dequant_levels(levels, intra, qscale, qmat):
    """Exact reference dequant, vectorized.

    levels: int32[..., 64] raw levels (raster positions; intra DC at
    position 0 holds the absolute DC value).
    intra: bool[...] per block; qscale: int32[...]; qmat: int32[..., 64]
    per-position quant matrix entries (already intra/non-intra selected).

    Returns IDCT-ready int32[..., 64]: dequant * SCALE_DCT_Q, with intra
    DC as dc<<8.
    """
    intra_b = intra[..., None]
    v = levels * 2
    sign = jnp.sign(v)
    v = jnp.where(intra_b, v, v + sign)
    num = v * qscale[..., None] * qmat
    q = jnp.where(num < 0, -((-num) // 16), num // 16)  # trunc toward 0
    # oddification (player.cpp:1114-1115): `v -= v>0 ? 1 : -1` maps an
    # even v to the next-lower odd magnitude AND a truncated-to-zero v
    # to +1.  The 0->+1 branch must apply only to CODED positions
    # (level != 0): absent coefficients in the dense buffer are 0 and
    # must stay 0 (the reference never dequants uncoded positions).
    odd = jnp.where(q > 0, q - 1,
                    jnp.where(q < 0, q + 1,
                              jnp.where(levels != 0, 1, 0)))
    q = jnp.where((q & 1) == 0, odd, q)
    q = jnp.clip(q, -2048, 2047)
    scale = jnp.asarray(V.SCALE_DCT_Q, jnp.int32)
    b = q * scale
    # intra DC: absolute value << 8, bypassing dequant (player.cpp:1065)
    dc_col = jnp.concatenate(
        [jnp.ones((1,), jnp.int32), jnp.zeros((63,), jnp.int32)])
    b = jnp.where(intra_b & (dc_col == 1), levels << 8, b)
    return b


def idct_8x8(b):
    """Exact fixed-point IDCT over int32[..., 8, 8] (batched)."""

    def butterfly(m, final):
        # m: [..., 8, 8]; transform over axis -2
        c = [m[..., i, :] for i in range(8)]
        b1 = c[4]
        b3 = c[2] + c[6]
        b4 = c[5] - c[3]
        tmp1 = c[1] + c[7]
        tmp2 = c[3] + c[5]
        b6 = c[1] - c[7]
        b7 = tmp1 + tmp2
        m0 = c[0]
        x4 = ((b6 * 473 - b4 * 196 + 128) >> 8) - b7
        x0 = x4 - (((tmp1 - tmp2) * 362 + 128) >> 8)
        x1 = m0 - b1
        x2 = (((c[2] - c[6]) * 362 + 128) >> 8) - b3
        x3 = m0 + b1
        y3 = x1 + x2
        y4 = x3 + b3
        y5 = x1 - x2
        y6 = x3 - b3
        y7 = -x0 - ((b4 * 473 + b6 * 196 + 128) >> 8)
        rows = [b7 + y4, x4 + y3, y5 - x0, y6 - y7,
                y6 + y7, x0 + y5, y3 - x4, y4 - b7]
        if final:
            rows = [(r + 128) >> 8 for r in rows]
        return jnp.stack(rows, axis=-2)

    b = butterfly(b, final=False)                     # columns
    b = butterfly(jnp.swapaxes(b, -1, -2), final=True)  # rows
    return jnp.swapaxes(b, -1, -2)


def _butterfly_parts(c, final):
    """One 8-point IDCT pass over a list of 8 arrays (exact fixed
    point, player.cpp:922-996); returns the 8 output arrays unstacked
    so callers control the output layout."""
    b1 = c[4]
    b3 = c[2] + c[6]
    b4 = c[5] - c[3]
    tmp1 = c[1] + c[7]
    tmp2 = c[3] + c[5]
    b6 = c[1] - c[7]
    b7 = tmp1 + tmp2
    m0 = c[0]
    x4 = ((b6 * 473 - b4 * 196 + 128) >> 8) - b7
    x0 = x4 - (((tmp1 - tmp2) * 362 + 128) >> 8)
    x1 = m0 - b1
    x2 = (((c[2] - c[6]) * 362 + 128) >> 8) - b3
    x3 = m0 + b1
    y3 = x1 + x2
    y4 = x3 + b3
    y5 = x1 - x2
    y6 = x3 - b3
    y7 = -x0 - ((b4 * 473 + b6 * 196 + 128) >> 8)
    rows = [b7 + y4, x4 + y3, y5 - x0, y6 - y7,
            y6 + y7, x0 + y5, y3 - x4, y4 - b7]
    if final:
        rows = [(r + 128) >> 8 for r in rows]
    return rows


def idct_8x8_flat(b64):
    """idct_8x8 over int32[..., 64] WITHOUT materializing [..., 8, 8].

    Tiny trailing dims force XLA into heavily padded vreg layouts (an
    8-wide minor dim fills 8 of 128 lanes); keeping the block flat on a
    64-wide minor axis and addressing rows/columns as contiguous /
    strided lane slices measures ~2x the [..., 8, 8] form end-to-end at
    fleet width.  Bit-identical to idct_8x8; position order is raster
    (p = 8*row + col) in and out."""
    c = [b64[..., 8 * i:8 * i + 8] for i in range(8)]
    rows = _butterfly_parts(c, final=False)         # column pass
    t = jnp.concatenate(rows, axis=-1)              # [.., 64], p=8r+j
    c2 = [t[..., j::8] for j in range(8)]
    o = _butterfly_parts(c2, final=True)            # row pass
    return jnp.stack(o, axis=-1).reshape(*b64.shape[:-1], 64)


def dequant_levels_T(levels_T, intra, qscale, qmat_T):
    """dequant_levels in the transposed orientation: levels_T
    int32[N, 64, B] (position axis on SUBLANES, blocks on lanes --
    the vreg-friendly layout; an 8-wide minor axis pads 16x).
    intra bool[N, B]; qscale int32[N, B]; qmat_T int32[N, 64, B]
    (or broadcastable).  Returns int32[N, 64, B]."""
    intra_b = intra[:, None, :]
    v = levels_T * 2
    sign = jnp.sign(v)
    v = jnp.where(intra_b, v, v + sign)
    num = v * qscale[:, None, :] * qmat_T
    q = jnp.where(num < 0, -((-num) >> 4), num >> 4)
    odd = jnp.where(q > 0, q - 1,
                    jnp.where(q < 0, q + 1,
                              jnp.where(levels_T != 0, 1, 0)))
    q = jnp.where((q & 1) == 0, odd, q)
    q = jnp.clip(q, -2048, 2047)
    scale = jnp.asarray(V.SCALE_DCT_Q, jnp.int32)[None, :, None]
    b = q * scale
    pos0 = (jnp.arange(64) == 0)[None, :, None]
    return jnp.where(intra_b & pos0, levels_T << 8, b)


def idct_8x8_T(bT):
    """Exact IDCT over int32[N, 64, B] with the position axis on the
    sublane dimension: each butterfly input c[i] is a full [N, 8, B]
    slab (contiguous sublane slice), so every op runs on densely
    packed vregs; the row pass needs one (8, 8) position transpose --
    an O(size) relayout instead of the 16x-padded skinny-slice
    layouts the lane-minor form forces."""
    N, _, B = bT.shape
    c = [bT[:, 8 * i:8 * i + 8, :] for i in range(8)]
    rows = _butterfly_parts(c, final=False)          # column pass
    t = jnp.concatenate(rows, axis=1)                # [N, 64, B] p=8r+j
    # (r, j) -> (j, r): row pass inputs become contiguous slabs
    t = t.reshape(N, 8, 8, B).transpose(0, 2, 1, 3).reshape(N, 64, B)
    c2 = [t[:, 8 * j:8 * j + 8, :] for j in range(8)]
    o = _butterfly_parts(c2, final=True)             # row pass
    o = jnp.concatenate(o, axis=1)                   # [N, 64, B] p=8j+r'
    # back to raster order p = 8r'+j
    return o.reshape(N, 8, 8, B).transpose(0, 2, 1, 3).reshape(N, 64, B)


def block_residuals_T(levels_T, intra, qscale, qmat_T, nfinal):
    """block_residuals in the transposed [N, 64, B] orientation
    (bit-identical to block_residuals_flat on the transposed data)."""
    b = dequant_levels_T(levels_T, intra, qscale, qmat_T)
    full = idct_8x8_T(b)
    dc = (b[:, 0, :] >> 8)[:, None, :]
    shortcut = ((nfinal == 1) & ~intra)[:, None, :]
    out = jnp.where(shortcut, jnp.broadcast_to(dc, full.shape), full)
    return jnp.where((nfinal == 0)[:, None, :], 0, out)


def block_residuals_flat(levels64, intra, qscale, qmat, nfinal):
    """block_residuals with flat [..., 64] output (see idct_8x8_flat)."""
    b = dequant_levels(levels64, intra, qscale, qmat)
    full = idct_8x8_flat(b)
    dc = (b[..., 0] >> 8)[..., None]
    shortcut = (nfinal == 1)[..., None] & ~intra[..., None]
    out = jnp.where(shortcut, jnp.broadcast_to(dc, full.shape), full)
    return jnp.where((nfinal == 0)[..., None], 0, out)


def block_residuals(levels64, intra, qscale, qmat, nfinal):
    """levels -> spatial residual int32[..., 8, 8] with exact semantics.

    nfinal: int32[...] final coefficient index count from the scanner;
    0 = uncoded block (residual 0 for inter; never happens for intra).
    The nfinal==1 non-intra path is the reference's add_block_dc shortcut:
    residual = broadcast(b0 >> 8) (truncating, NOT the IDCT's +128
    rounding).
    """
    b = dequant_levels(levels64, intra, qscale, qmat)
    full = idct_8x8(b.reshape(*b.shape[:-1], 8, 8))
    dc = (b[..., 0] >> 8)[..., None, None]
    shortcut = (nfinal == 1)[..., None, None] & ~intra[..., None, None]
    out = jnp.where(shortcut, jnp.broadcast_to(dc, full.shape), full)
    uncoded = (nfinal == 0)[..., None, None]
    return jnp.where(uncoded, 0, out)

"""Pallas TPU kernel: fused dequant + 8x8 IDCT over coefficient blocks.

The jnp implementation (ops/idct.py) materializes several [N, MB, 6, 64]
int32 temporaries between dequant, the two butterfly passes and the
shortcut selects; this kernel keeps one tile of blocks resident in VMEM
through the whole computation (HBM traffic = read levels once, write
residuals once).  Same exact integer semantics; bit-identical outputs
(tests/test_idct_pallas.py runs it in interpreter mode on CPU and
against the jnp path).

Layout: blocks are processed as [TILE, 128] int32 tiles (Mosaic wants
128-lane minor dims): columns 0..63 carry one 8x8 block per row in
raster order; 64..127 are auxiliary (quant matrix tile pairs with the
IDCT prescale constants there; the meta tile carries intra/qscale/
nfinal in its first columns).

Known inefficiency: the butterfly works on unit-width column slices,
which Mosaic widens to full 128-lane temporaries (the 16MB scoped-VMEM
budget bounds TILE at 128).  A sublane-major layout (coefficient index
on the sublane axis) is the round-2 improvement; even so this measures
1.3x the jnp path on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


from espflix_tpu.core import vlc_tables as V

TILE = 128  # blocks per grid step (VMEM-bounded incl. pipeline buffers)


def _idct_cols(b64):
    """Exact fixed-point IDCT on a [T, 64] tile (raster blocks),
    player.cpp:922-996 semantics, built from unit-width static column
    slices (Mosaic does not lower strided slicing)."""
    def pass_(cols, final):
        c = cols
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

    # 64 unit-width column views (static slices only; Mosaic does not
    # lower strided slicing)
    cols = [b64[:, k:k + 1] for k in range(64)]
    # column pass: transform over r for each block-column c
    mid = [None] * 64
    for c in range(8):
        group = pass_([cols[r * 8 + c] for r in range(8)], final=False)
        for r in range(8):
            mid[r * 8 + c] = group[r]
    # row pass: transform over c for each block-row r
    out = [None] * 64
    for r in range(8):
        group = pass_([mid[r * 8 + c] for c in range(8)], final=True)
        for c in range(8):
            out[r * 8 + c] = group[c]
    return jnp.concatenate(out, axis=1)


def _kernel(levels_ref, qs_ref, meta_ref, out_ref):
    lv = levels_ref[:, :64]
    qmat = qs_ref[:, :64]
    scale = qs_ref[:, 64:]
    intra = meta_ref[:, 0:1]
    qscale = meta_ref[:, 1:2]
    nfinal = meta_ref[:, 2:3]

    # exact dequant (player.cpp:1110-1121)
    v = lv * 2
    v = jnp.where(intra == 1, v, v + jnp.sign(v))
    num = v * qscale * qmat
    q = jnp.where(num < 0, -((-num) // 16), num // 16)
    # oddification incl. the reference's 0 -> +1 on coded positions
    # (player.cpp:1114-1115); uncoded (lv == 0) stays 0
    odd = jnp.where(q > 0, q - 1,
                    jnp.where(q < 0, q + 1,
                              jnp.where(lv != 0, 1, 0)))
    q = jnp.where((q & 1) == 0, odd, q)
    q = jnp.clip(q, -2048, 2047)
    b = q * scale
    dc_col = (jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1) == 0)
    b = jnp.where((intra == 1) & dc_col, lv << 8, b)

    full = _idct_cols(b)
    dc = b[:, 0:1] >> 8
    shortcut = (nfinal == 1) & (intra == 0)
    out = jnp.where(shortcut, jnp.broadcast_to(dc, full.shape), full)
    out = jnp.where(nfinal == 0, 0, out)
    out_ref[:] = jnp.pad(out, ((0, 0), (0, 64)))


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_residuals_pallas(levels, intra, qscale, qmat, nfinal,
                           interpret: bool = False):
    """Drop-in for ops.idct.block_residuals via a Pallas kernel.

    levels int32[N, MB, 6, 64]; intra bool[N, MB, 6];
    qscale int32[N, MB, 6]; qmat int32[N, MB, 6, 64];
    nfinal int32[N, MB, 6].  Returns int32[N, MB, 6, 8, 8]."""
    N, MB, _, _ = levels.shape
    B = N * MB * 6
    pad = (-B) % TILE
    Bp = B + pad

    lv = jnp.pad(levels.reshape(B, 64), ((0, pad), (0, 64)))
    scale = jnp.broadcast_to(
        jnp.asarray(V.SCALE_DCT_Q, jnp.int32)[None, :], (Bp, 64))
    qs = jnp.concatenate(
        [jnp.pad(qmat.reshape(B, 64), ((0, pad), (0, 0))), scale],
        axis=1)
    meta = jnp.stack([
        intra.reshape(B).astype(jnp.int32),
        qscale.reshape(B),
        nfinal.reshape(B)], axis=1)
    meta = jnp.pad(meta, ((0, pad), (0, 125)))

    out = pl.pallas_call(
        _kernel,
        grid=(Bp // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 128), lambda i: (i, 0)),
            pl.BlockSpec((TILE, 128), lambda i: (i, 0)),
            pl.BlockSpec((TILE, 128), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, 128), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, 128), jnp.int32),
        interpret=interpret,
    )(lv, qs, meta)
    return out[:B, :64].reshape(N, MB, 6, 8, 8)


# ---------------------------------------------------------------------------
# transposed (sublane-major) form -- the production orientation


def _regroup8(slabs):
    """Regroup eight (8, L) slabs: out[a][b] = slabs[b][a] -- an
    (8, 8) position transpose expressed as 64 static single-sublane
    slices (Mosaic does not lower strided sublane slicing).  The
    pattern is self-inverse."""
    return [jnp.concatenate([slabs[b][a:a + 1, :] for b in range(8)],
                            axis=0) for a in range(8)]


def _kernel_T(coef_ref, intra_ref, qs_ref, nf_ref, iq_ref, nq_ref,
              scale_ref, out_ref):
    from espflix_tpu.ops.idct import _butterfly_parts
    lev = coef_ref[0].astype(jnp.int32)          # (64, BLp)
    intra = intra_ref[0] != 0                    # (1, BLp)
    qs = qs_ref[0]                               # (1, BLp)
    nf = nf_ref[0]                               # (1, BLp)
    qmat = jnp.where(intra, iq_ref[0], nq_ref[0])  # (64,1)x(1,BLp) bc

    # exact dequant (player.cpp:1110-1121; mirrors idct.dequant_levels_T)
    v = lev * 2
    sign = jnp.sign(v)
    v = jnp.where(intra, v, v + sign)
    num = v * qs * qmat
    q = jnp.where(num < 0, -((-num) >> 4), num >> 4)
    odd = jnp.where(q > 0, q - 1,
                    jnp.where(q < 0, q + 1,
                              jnp.where(lev != 0, 1, 0)))
    q = jnp.where((q & 1) == 0, odd, q)
    q = jnp.clip(q, -2048, 2047)
    b = q * scale_ref[0]                         # (64, 1) broadcast
    pos0 = jax.lax.broadcasted_iota(
        jnp.int32, b.shape, 0) == 0
    b = jnp.where(intra & pos0, lev << 8, b)

    # column pass: slab i = positions (r=i, j=0..7) on sublanes
    c = [b[8 * i:8 * i + 8, :] for i in range(8)]
    rows = _butterfly_parts(c, final=False)      # rows[k]: (r'=k, j)
    c2 = _regroup8(rows)                         # c2[j][r'] = rows[r'][j]
    o = _butterfly_parts(c2, final=True)         # o[m]: (j'=m, r')
    outs = _regroup8(o)                          # outs[r'][j'] = o[j'][r']
    full = jnp.concatenate(outs, axis=0)         # (64, BLp) raster 8r'+j'

    dc = b[0:1, :] >> 8                          # (1, BLp)
    shortcut = (nf == 1) & ~intra
    out = jnp.where(shortcut, jnp.broadcast_to(dc, full.shape), full)
    out = jnp.where(nf == 0, 0, out)
    out_ref[0] = out.astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_residuals_T_pallas(coeffs_T, intra_bl, qs_bl, intra_q,
                             non_intra_q, nfinal,
                             interpret: bool = False):
    """block_residuals in the transposed [N, 64, BL] orientation as ONE
    VMEM-resident Pallas pass (bit-identical to
    idct.block_residuals_T + .astype(int16)).

    The jnp chain materializes several [N, 64, BL] int32 temporaries
    in HBM (the two butterfly concats and the two position transposes
    are real relayouts); here one lane's coefficient block stays in
    VMEM through dequant, both butterfly passes and the shortcut
    selects -- HBM traffic is one int16 read + one int16 write.

    coeffs_T int16/int32[N, 64, BL]; intra_bl bool[N, BL]; qs_bl
    int32[N, BL]; intra_q/non_intra_q int32[N, 64]; nfinal
    int32[N, BL].  Returns res_T int16[N, 64, BL]."""
    N, _, BL = coeffs_T.shape
    BLp = -(-BL // 128) * 128
    padl = ((0, 0), (0, 0), (0, BLp - BL))
    coef = jnp.pad(coeffs_T.astype(jnp.int16), padl)
    pads = ((0, 0), (0, BLp - BL))
    intra = jnp.pad(intra_bl.astype(jnp.int32), pads)[:, None, :]
    qs = jnp.pad(qs_bl.astype(jnp.int32), pads)[:, None, :]
    nf = jnp.pad(nfinal.astype(jnp.int32), pads)[:, None, :]
    iq = intra_q.astype(jnp.int32)[:, :, None]       # [N, 64, 1]
    nq = non_intra_q.astype(jnp.int32)[:, :, None]
    scale = jnp.asarray(V.SCALE_DCT_Q, jnp.int32)[None, :, None]

    out = pl.pallas_call(
        _kernel_T,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 64, BLp), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 1, BLp), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 1, BLp), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 1, BLp), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 64, 1), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 64, 1), lambda n: (n, 0, 0)),
            pl.BlockSpec((1, 64, 1), lambda n: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 64, BLp), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 64, BLp), jnp.int16),
        interpret=interpret,
    )(coef, intra, qs, nf, iq, nq, scale)
    return out[:, :, :BL]

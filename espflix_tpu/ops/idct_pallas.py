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

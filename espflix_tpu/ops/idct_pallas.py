"""Pallas TPU kernel: fused dequant + 8x8 IDCT over coefficient blocks.

The jnp implementation (ops/idct.py) materializes several [N, MB, 6, 64]
int32 temporaries between dequant, the two butterfly passes and the
shortcut selects; this kernel keeps one tile of blocks resident in VMEM
through the whole computation (HBM traffic = read levels once, write
residuals once).  Same exact integer semantics; bit-identical outputs
(tests/test_idct_pallas.py runs it in interpreter mode on CPU and
against the jnp path).

Layout: blocks are processed as [TILE, 64] int32 tiles (64 = one 8x8
block per row, raster order).  The butterflies become column-slice
arithmetic on the [TILE, 64] tile -- fully vectorized on the VPU with
the 64-wide axis padded to lanes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from espflix_tpu.core import vlc_tables as V

TILE = 256  # blocks per grid step


def _idct_tile(b):
    """Exact fixed-point IDCT on [T, 8, 8] int32 (player.cpp:922-996
    semantics), written with lax ops that lower cleanly in Mosaic."""
    def pass_(m, final):
        c = [m[:, i, :] for i in range(8)]
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
        return jnp.stack(rows, axis=1)

    b = pass_(b, final=False)
    b = pass_(jnp.swapaxes(b, 1, 2), final=True)
    return jnp.swapaxes(b, 1, 2)


def _kernel(levels_ref, qmat_ref, meta_ref, scale_ref, out_ref):
    """levels: [T, 64] int32 raw levels; qmat: [T, 64] quant entries;
    meta: [T, 4] int32 (intra, qscale, nfinal, pad); scale: [1, 64]
    IDCT prescale constants; out: [T, 64]."""
    levels = levels_ref[:]
    qmat = qmat_ref[:]
    intra = meta_ref[:, 0:1]                     # [T, 1]
    qscale = meta_ref[:, 1:2]
    nfinal = meta_ref[:, 2:3]

    # exact dequant (player.cpp:1110-1121)
    v = levels * 2
    sign = jnp.sign(v)
    v = jnp.where(intra == 1, v, v + sign)
    num = v * qscale * qmat
    q = jnp.where(num < 0, -((-num) // 16), num // 16)
    q = jnp.where((q & 1) == 0, q - jnp.sign(q), q)
    q = jnp.clip(q, -2048, 2047)
    b = q * scale_ref[:]
    dc_col = (jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1) == 0)
    b = jnp.where((intra == 1) & dc_col, levels << 8, b)

    full = _idct_tile(b.reshape(-1, 8, 8)).reshape(-1, 64)
    dc = (b[:, 0:1] >> 8)
    shortcut = (nfinal == 1) & (intra == 0)
    out = jnp.where(shortcut, jnp.broadcast_to(dc, full.shape), full)
    out_ref[:] = jnp.where(nfinal == 0, 0, out)


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

    lv = jnp.pad(levels.reshape(B, 64), ((0, pad), (0, 0)))
    qm = jnp.pad(qmat.reshape(B, 64), ((0, pad), (0, 0)))
    meta = jnp.stack([
        intra.reshape(B).astype(jnp.int32),
        qscale.reshape(B),
        nfinal.reshape(B),
        jnp.zeros(B, jnp.int32)], axis=1)
    meta = jnp.pad(meta, ((0, pad), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        grid=(Bp // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 64), lambda i: (i, 0)),
            pl.BlockSpec((TILE, 64), lambda i: (i, 0)),
            pl.BlockSpec((TILE, 4), lambda i: (i, 0)),
            pl.BlockSpec((1, 64), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, 64), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, 64), jnp.int32),
        interpret=interpret,
    )(lv, qm, meta, jnp.asarray(V.SCALE_DCT_Q, jnp.int32)[None, :])
    return out[:B].reshape(N, MB, 6, 8, 8)
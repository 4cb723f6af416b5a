"""Half-pel motion compensation as a VMEM-resident Pallas kernel.

The reference interpolates per-MB through a staging buffer with four
hand-unrolled phase loops (/root/reference/src/player.cpp:732-821).
The batched JAX forms in ops/mocomp.py express the same math as plane
gathers or one-hot MXU contractions; both pay for operand
materialization in HBM (the one-hot path moves ~GBs of selector
operands per 1024-lane picture and runs 17-row matmul tiles at ~13%
MXU utilization).

This kernel keeps each lane's reference plane resident in VMEM and
extracts every macroblock's (S+1)x(S+1) source window with register
shifts instead of gathers or matmuls:

  * rows:   one sublane-aligned dynamic slice (start rounded down to a
            multiple of 8) + a positive dynamic sublane roll;
  * y-tap:  combined immediately (vy = a + hy*c), halving the data the
            lane roll touches;
  * cols:   one positive dynamic lane roll (pltpu.roll) that puts
            column x0 at lane 0 -- the TPU's lane-rotate hardware is
            the natural "dynamic gather" for contiguous windows;
  * x-tap:  arithmetic combine with exact MPEG-1 rounding
            (a+b+1)>>1 / (a+c+1)>>1 / (a+b+c+d+2)>>2 expressed as
            (vy0 + hx*vy1 + hx + hy) >> (hx + hy).

All arithmetic is int32; results are bit-identical to
mocomp.predict_plane.  Dynamic shifts are always normalized to
non-negative values (negative dynamic lane rolls mis-lower on
multi-vreg widths on current Mosaic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(mvh_ref, mvv_ref, ref_ref, out_ref, *, S, H, W, WP, mbh,
            mbw, T):
    def mb_row(r, _):
        def one_col(c):
            mh = mvh_ref[0, r, c]
            mv = mvv_ref[0, r, c]
            xh = c * 2 * S + mh
            yh = r * 2 * S + mv
            x0 = jnp.clip(xh >> 1, 0, W - S)
            y0 = jnp.clip(yh >> 1, 0, H - S)
            hx = xh & 1
            hy = yh & 1
            y0a = (y0 >> 3) << 3
            d = y0 - y0a
            win = ref_ref[0, pl.ds(pl.multiple_of(y0a, 8), T), :]
            win = pltpu.roll(win, jnp.where(d == 0, 0, T - d), 0)
            # y-tap combine first: the lane roll then touches S rows,
            # not S+1 (and never the unused tail of the T-row window)
            vy = win[0:S, :] + hy * win[1:S + 1, :]
            if WP == 384:
                # narrow the (expensive, vreg-count-linear) dynamic
                # lane roll to the 256-lane span containing the
                # window: x0 < 128 -> lanes [0,256), else [128,384)
                # (x0 <= W-S = 336, so x0+S+1 <= 353 < 384; the two
                # spans cover every case only at this width)
                lo = x0 < 128
                w2 = jnp.where(lo, vy[:, 0:256], vy[:, WP - 256:WP])
                f = x0 - jnp.where(lo, 0, WP - 256)
                w2 = pltpu.roll(w2, jnp.where(f == 0, 0, 256 - f), 1)
            else:
                w2 = pltpu.roll(vy, jnp.where(x0 == 0, 0, WP - x0), 1)
            sh = hx + hy
            out = (w2[:, 0:S] + hx * w2[:, 1:S + 1] + sh) >> sh
            out_ref[0, pl.ds(pl.multiple_of(r * S, 8), S),
                    c * S:(c + 1) * S] = out
        for c in range(mbw):
            one_col(c)
        return 0

    jax.lax.fori_loop(0, mbh, mb_row, 0)


@functools.partial(jax.jit,
                   static_argnames=("mb_size", "interpret"))
def predict_plane_pallas(ref, mv_h, mv_v, mb_size: int,
                         interpret: bool = False):
    """predict_plane as a Pallas kernel (bit-identical; see module doc).

    ref: uint8[N, H, W]; mv_h/mv_v: int32[N, mbh, mbw] effective
    half-pel MVs per MB.  Returns uint8[N, H, W].
    """
    N, H, W = ref.shape
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    S = mb_size
    assert mbh * S == H and mbw * S == W
    T = _round_up(S + 1 + 7, 8)            # aligned window rows
    HP = _round_up(H - S + T, 8)           # max y0a + T reachable
    WP = _round_up(W + 1, 128)
    refp = jnp.pad(ref.astype(jnp.int32),
                   ((0, 0), (0, HP - H), (0, WP - W)))

    out = pl.pallas_call(
        functools.partial(_kernel, S=S, H=H, W=W, WP=WP, mbh=mbh,
                          mbw=mbw, T=T),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, HP, WP), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, WP), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, WP), jnp.int32),
        interpret=interpret,
    )(mv_h, mv_v, refp)
    return out[:, :, :W].astype(jnp.uint8)

"""Batched half-pel motion compensation as per-lane gathers.

The reference does scalar half-pel interpolation through a 32-bit-aligned
staging buffer with four hand-unrolled phase loops
(/root/reference/src/player.cpp:732-821).  Here the whole batch is four
plane-wide gathers + one select: for every output pixel we fetch the four
neighboring taps from the reference frame and combine them with the exact
MPEG-1 integer rounding:

    half-pel x:   (a + b + 1) >> 1
    half-pel y:   (a + c + 1) >> 1
    both:         (a + b + c + d + 2) >> 2

MVs arrive per-macroblock from the scanner (effective half-pel units,
full_pel already applied); chroma uses the arithmetic-shift halving of
the luma coordinates (player.cpp:884-887).
"""

from __future__ import annotations

import jax.numpy as jnp


def predict_plane(ref, mv_h, mv_v, mb_size: int):
    """Motion-compensate a full plane.

    ref: uint8[N, H, W] reference plane.
    mv_h/mv_v: int32[N, mbh, mbw] effective half-pel MVs per MB
      (0 for skip/copy MBs; callers mask out stale/intra later).
    mb_size: 16 for luma, 8 for chroma.

    Returns uint8[N, H, W] prediction (every MB position computed).
    """
    N, H, W = ref.shape
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    assert mbh * mb_size == H and mbw * mb_size == W

    # per-pixel source coordinates (half-pel domain)
    iy = jnp.arange(H, dtype=jnp.int32)
    ix = jnp.arange(W, dtype=jnp.int32)
    mv_h_px = jnp.repeat(jnp.repeat(mv_h, mb_size, axis=1), mb_size, axis=2)
    mv_v_px = jnp.repeat(jnp.repeat(mv_v, mb_size, axis=1), mb_size, axis=2)
    # top-left of each MB in half-pel + in-MB offset (full-pel)
    base_x = (ix // mb_size) * mb_size * 2
    base_y = (iy // mb_size) * mb_size * 2
    xh = base_x[None, None, :] + mv_h_px     # [N, H, W] half-pel x of MB
    yh = base_y[None, :, None] + mv_v_px
    x0 = (xh >> 1) + (ix[None, None, :] % mb_size)
    y0 = (yh >> 1) + (iy[None, :, None] % mb_size)
    hx = (xh & 1) == 1
    hy = (yh & 1) == 1

    x0c = jnp.clip(x0, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    x1c = jnp.clip(x0 + 1, 0, W - 1)
    y1c = jnp.clip(y0 + 1, 0, H - 1)

    flat = ref.reshape(N, H * W).astype(jnp.int32)

    def gather(yy, xx):
        idx = (yy * W + xx).reshape(N, H * W)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(N, H, W)

    a = gather(y0c, x0c)
    b = gather(y0c, x1c)
    c = gather(y1c, x0c)
    d = gather(y1c, x1c)

    out = jnp.where(
        ~hx & ~hy, a,
        jnp.where(hx & ~hy, (a + b + 1) >> 1,
                  jnp.where(~hx & hy, (a + c + 1) >> 1,
                            (a + b + c + d + 2) >> 2)))
    return out.astype(jnp.uint8)

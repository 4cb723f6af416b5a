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

import jax
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


def predict_plane_blocks(ref, mv_h, mv_v, mb_size: int):
    """predict_plane via per-MB block slices instead of per-pixel
    gathers: each MB's source is one contiguous (mb_size+1)^2 window
    fetched with a batched dynamic_slice (far friendlier to the TPU's
    gather unit than 4 taps x H x W scalar indices), then the half-pel
    combine runs on the windows.  Bit-identical to predict_plane."""
    N, H, W = ref.shape
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    S = mb_size
    # pad so the (S+1)-window never triggers dynamic_slice clamping for
    # the unused extra tap at full-pel positions
    refp = jnp.pad(ref, ((0, 0), (0, 1), (0, 1)))

    base_x = (jnp.arange(mbw, dtype=jnp.int32) * S * 2)[None, None, :]
    base_y = (jnp.arange(mbh, dtype=jnp.int32) * S * 2)[None, :, None]
    xh = base_x + mv_h
    yh = base_y + mv_v
    x0 = jnp.clip(xh >> 1, 0, W - S)
    y0 = jnp.clip(yh >> 1, 0, H - S)
    hx = ((xh & 1) == 1)[..., None, None]
    hy = ((yh & 1) == 1)[..., None, None]

    def slice_one(plane, y, x):
        return jax.lax.dynamic_slice(plane, (y, x), (S + 1, S + 1))

    win = jax.vmap(          # lanes
        jax.vmap(            # mb rows
            jax.vmap(slice_one, in_axes=(None, 0, 0)),
            in_axes=(None, 0, 0)),
        in_axes=(0, 0, 0))(refp, y0, x0)        # [N, mbh, mbw, S+1, S+1]
    win = win.astype(jnp.int32)

    a = win[..., :S, :S]
    b = win[..., :S, 1:]
    c = win[..., 1:, :S]
    d = win[..., 1:, 1:]
    out = jnp.where(
        ~hx & ~hy, a,
        jnp.where(hx & ~hy, (a + b + 1) >> 1,
                  jnp.where(~hx & hy, (a + c + 1) >> 1,
                            (a + b + c + d + 2) >> 2)))
    # [N, mbh, mbw, S, S] -> [N, H, W]
    out = out.transpose(0, 1, 3, 2, 4).reshape(N, H, W)
    return out.astype(jnp.uint8)


def predict_plane_mxu(ref, mv_h, mv_v, mb_size: int):
    """predict_plane as one-hot MXU matmuls (the fast path on TPU).

    Each MB's (S+1)x(S+1) source window is selected by two one-hot
    contractions: rows via Sy[r, h] = (h == y0+r), columns via
    Sx[c, w] = (w == x0+c).  With plane samples <= 248 and one-hot
    weights in bf16, every product/sum is exact in f32 (integers < 2^8
    are exact in bf16; each output sums exactly one nonzero term), so
    the result is bit-identical to the gather forms -- but it runs on
    the systolic array instead of the (slow) gather unit.  Processes one
    MB row per iteration to bound the one-hot temporaries.
    """
    N, H, W = ref.shape
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    S = mb_size
    refp = jnp.pad(ref, ((0, 0), (0, 1), (0, 1))).astype(jnp.bfloat16)
    Hp, Wp = H + 1, W + 1

    rows_out = []
    hs = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Hp), 3)
    ws = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, Wp), 3)
    rr = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S + 1, 1), 2)
    cc = jax.lax.broadcasted_iota(jnp.int32, (1, 1, S + 1, 1), 2)

    for r in range(mbh):
        xh = jnp.arange(mbw, dtype=jnp.int32)[None, :] * S * 2 + mv_h[:, r]
        yh = (r * S * 2) + mv_v[:, r]                      # [N, mbw]
        x0 = jnp.clip(xh >> 1, 0, W - S)
        y0 = jnp.clip(yh >> 1, 0, H - S)
        hx = ((xh & 1) == 1)[..., None, None]
        hy = ((yh & 1) == 1)[..., None, None]

        sy = (hs == (y0[:, :, None, None] + rr)).astype(jnp.bfloat16)
        # [N, mbw, S+1, Hp] x [N, Hp, Wp] -> [N, mbw, S+1, Wp]
        tmp = jnp.einsum("nmrh,nhw->nmrw", sy, refp,
                         preferred_element_type=jnp.float32)
        sx = (ws == (x0[:, :, None, None] + cc)).astype(jnp.bfloat16)
        win = jnp.einsum("nmrw,nmcw->nmrc", tmp.astype(jnp.bfloat16), sx,
                         preferred_element_type=jnp.float32)
        win = win.astype(jnp.int32)                        # exact
        a = win[..., :S, :S]
        b = win[..., :S, 1:]
        c = win[..., 1:, :S]
        d = win[..., 1:, 1:]
        out = jnp.where(
            ~hx & ~hy, a,
            jnp.where(hx & ~hy, (a + b + 1) >> 1,
                      jnp.where(~hx & hy, (a + c + 1) >> 1,
                                (a + b + c + d + 2) >> 2)))
        # [N, mbw, S, S] -> [N, S, mbw*S]
        rows_out.append(out.transpose(0, 2, 1, 3).reshape(N, S, mbw * S))
    return jnp.concatenate(rows_out, axis=1).astype(jnp.uint8)


def predict_plane_rows(ref_full, mv_h, mv_v, mb_size: int,
                       row0_mb: int = 0):
    """predict_plane for a horizontal band of MB rows.

    ref_full: uint8[N, H, W] -- the FULL reference plane (callers on a
    'space'-sharded mesh all-gather it; MVs may reach anywhere within
    the MV range, so prediction reads globally while computing
    locally).  mv_h/mv_v: int32[N, mbh_loc, mbw] for MB rows
    [row0_mb, row0_mb + mbh_loc).  Returns uint8[N, mbh_loc*S, W]:
    the predicted band.  Bit-identical to the corresponding rows of
    predict_plane(ref_full, mv_full, ...).
    """
    N, H, W = ref_full.shape
    mbh_loc, mbw = mv_h.shape[1], mv_h.shape[2]
    S = mb_size
    Hl = mbh_loc * S

    iy = jnp.arange(Hl, dtype=jnp.int32)
    ix = jnp.arange(W, dtype=jnp.int32)
    mv_h_px = jnp.repeat(jnp.repeat(mv_h, S, axis=1), S, axis=2)
    mv_v_px = jnp.repeat(jnp.repeat(mv_v, S, axis=1), S, axis=2)
    base_x = (ix // S) * S * 2
    base_y = (row0_mb * S + (iy // S) * S) * 2
    xh = base_x[None, None, :] + mv_h_px
    yh = base_y[None, :, None] + mv_v_px
    x0 = (xh >> 1) + (ix[None, None, :] % S)
    y0 = (yh >> 1) + (iy[None, :, None] % S)
    hx = (xh & 1) == 1
    hy = (yh & 1) == 1

    x0c = jnp.clip(x0, 0, W - 1)
    y0c = jnp.clip(y0, 0, H - 1)
    x1c = jnp.clip(x0 + 1, 0, W - 1)
    y1c = jnp.clip(y0 + 1, 0, H - 1)

    flat = ref_full.reshape(N, H * W).astype(jnp.int32)

    def gather(yy, xx):
        idx = (yy * W + xx).reshape(N, Hl * W)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(N, Hl, W)

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

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
            # store uint8 directly: an int32 out plane costs ~450 MB
            # of extra HBM traffic per plane set (write + XLA re-read
            # for the cast); rolls stay int32 internally (32-bit only)
            out_ref[0, pl.ds(pl.multiple_of(r * S, 8), S),
                    c * S:(c + 1) * S] = out.astype(jnp.uint8)
        for c in range(mbw):
            one_col(c)
        return 0

    jax.lax.fori_loop(0, mbh, mb_row, 0)


def _compose_kernel(mvh_ref, mvv_ref, kind_ref, act_ref, ref_ref,
                    cur_ref, res_ref, out_ref, band, *, S, H, W, WP,
                    mbh, mbw, T):
    """Fused mocomp + residual-add + kind-select + pin (see
    compose_plane_pallas)."""
    # active is the only per-lane scalar; Mosaic rejects (1, 1) SMEM
    # blocks (tiling rule), so it arrives as the FULL [N, 1] array and
    # is indexed by the grid position
    act = act_ref[pl.program_id(0), 0]

    @pl.when(act == 0)
    def _():
        # inactive lane: presented/new plane is the current one
        out_ref[0] = cur_ref[0]

    @pl.when(act != 0)
    def _():
        for r in range(mbh):            # static rows: all slices static
            band[...] = cur_ref[0, r * S:(r + 1) * S, :] \
                .astype(jnp.int32)

            for c in range(mbw):
                k = kind_ref[0, r, c]
                res = res_ref[0, r * S:(r + 1) * S,
                              c * S:(c + 1) * S].astype(jnp.int32)

                @pl.when(k == 3)        # MB_INTRA
                def _():
                    band[:, c * S:(c + 1) * S] = \
                        jnp.clip(res, 0, 248)

                @pl.when((k == 1) | (k == 2))   # MB_SKIP / MB_INTER
                def _():
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
                    win = ref_ref[0, pl.ds(pl.multiple_of(y0a, 8), T),
                                  :]
                    win = pltpu.roll(win,
                                     jnp.where(d == 0, 0, T - d), 0)
                    vy = win[0:S, :] + hy * win[1:S + 1, :]
                    if WP == 384:
                        lo = x0 < 128
                        w2 = jnp.where(lo, vy[:, 0:256],
                                       vy[:, WP - 256:WP])
                        f = x0 - jnp.where(lo, 0, WP - 256)
                        w2 = pltpu.roll(
                            w2, jnp.where(f == 0, 0, 256 - f), 1)
                    else:
                        w2 = pltpu.roll(
                            vy, jnp.where(x0 == 0, 0, WP - x0), 1)
                    sh = hx + hy
                    pred = (w2[:, 0:S] + hx * w2[:, 1:S + 1] + sh) \
                        >> sh
                    band[:, c * S:(c + 1) * S] = \
                        jnp.clip(pred + res, 0, 248)
                # k == 0 (MB_STALE): band keeps the current plane

            out_ref[0, r * S:(r + 1) * S, :] = \
                band[...].astype(jnp.uint8)


def _compose2_kernel(mvh_ref, mvv_ref, pr_ref, ref_ref, cur_ref,
                     res_ref, stale_ref, out_ref, band, *, S, H, W,
                     WP, mbh, mbw, T):
    """Branch-free fused mocomp + compose (see compose_plane_pallas2).

    v1 (_compose_kernel) lost 3x to the unfused path: its per-MB
    pl.when branches serialize (~0.4-0.9 us per MB visit).  Here the
    MB loop is UNCONDITIONAL -- prediction is computed for every MB
    exactly like _kernel, residuals join via a scalar multiply
    (use_pred in {0,1} from SMEM), and the kind/active select happens
    once per MB row as a full-width vectorized mask select against a
    stale-mask plane built on the XLA side."""
    def mb_row(r, _):
        def one_col(c):
            mh = mvh_ref[0, r, c]
            mv = mvv_ref[0, r, c]
            up = pr_ref[0, r, c]
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
            vy = win[0:S, :] + hy * win[1:S + 1, :]
            if WP == 384:
                lo = x0 < 128
                w2 = jnp.where(lo, vy[:, 0:256], vy[:, WP - 256:WP])
                f = x0 - jnp.where(lo, 0, WP - 256)
                w2 = pltpu.roll(w2, jnp.where(f == 0, 0, 256 - f), 1)
            else:
                w2 = pltpu.roll(vy, jnp.where(x0 == 0, 0, WP - x0), 1)
            sh = hx + hy
            pred = (w2[:, 0:S] + hx * w2[:, 1:S + 1] + sh) >> sh
            res = res_ref[0, pl.ds(pl.multiple_of(r * S, 8), S),
                          c * S:(c + 1) * S].astype(jnp.int32)
            band[:, c * S:(c + 1) * S] = res + up * pred
        for c in range(mbw):
            one_col(c)
        st = stale_ref[0, pl.ds(pl.multiple_of(r * S, 8), S), :] != 0
        comp = jnp.clip(band[...], 0, 248).astype(jnp.uint8)
        curb = cur_ref[0, pl.ds(pl.multiple_of(r * S, 8), S), :]
        out_ref[0, pl.ds(pl.multiple_of(r * S, 8), S), :] = \
            jnp.where(st, curb, comp)
        return 0

    jax.lax.fori_loop(0, mbh, mb_row, 0)


@functools.partial(jax.jit, static_argnames=("mb_size", "interpret"))
def compose_plane_pallas2(ref, cur, res, kind, mv_h, mv_v, active,
                          mb_size: int, interpret: bool = False):
    """Branch-free fused mocomp+compose: one plane of the dense phase.

    Same contract as compose_plane_pallas (bit-identical to the
    XLA predict+compose path; reference semantics player.cpp:732-821
    mocomp, :183-236 pin clamp, :1151-1236 copy/add; inactive lanes
    pass the current plane through) but with no data-dependent
    control flow inside the kernel: per-MB prediction is computed
    unconditionally, residual joins via the use_pred scalar, the MB
    kind select runs as one full-width masked select per MB row
    against an XLA-built stale-mask plane (which also folds in
    inactive lanes).

    ref/cur: uint8[N, H, W]; res: int16[N, H, W]; kind: int32
    [N, mbh, mbw]; mv_h/mv_v: int32[N, mbh, mbw] at THIS plane's
    scale; active: bool[N].  Returns uint8[N, H, W]."""
    N, H, W = ref.shape
    mbh, mbw = kind.shape[1], kind.shape[2]
    S = mb_size
    assert mbh * S == H and mbw * S == W
    T = _round_up(S + 1 + 7, 8)
    HP = _round_up(H - S + T, 8)
    WP = _round_up(W + 1, 128)
    refp = jnp.pad(ref.astype(jnp.int32),
                   ((0, 0), (0, HP - H), (0, WP - W)))
    curp = jnp.pad(cur, ((0, 0), (0, 0), (0, WP - W)))
    resp = jnp.pad(res, ((0, 0), (0, 0), (0, WP - W)))
    # SKIP=1 / INTER=2 read the reference window; INTRA=3 is pure
    # residual; STALE=0 keeps the current plane.  Inactive lanes are
    # all-stale (kernel then copies cur through, values elsewhere
    # don't matter).
    use_pred = (((kind == 1) | (kind == 2))
                & active[:, None, None]).astype(jnp.int32)
    stale_mb = ((kind == 0) | ~active[:, None, None])
    # per-PIXEL stale plane: dynamic sublane slices inside the kernel
    # are only dependable at multiples of 8, so the mask arrives at
    # the same [N, H, WP] geometry/alignment as cur (its HBM cost is
    # one uint8 plane read; a [N, mbh, WP] row mask would need an
    # unaligned (r, 1) sublane slice per band)
    stale = jnp.broadcast_to(
        stale_mb[:, :, None, :, None].astype(jnp.uint8),
        (N, mbh, S, mbw, S)).reshape(N, H, W)
    stale = jnp.pad(stale, ((0, 0), (0, 0), (0, WP - W)),
                    constant_values=1)               # [N, H, WP]

    out = pl.pallas_call(
        functools.partial(_compose2_kernel, S=S, H=H, W=W, WP=WP,
                          mbh=mbh, mbw=mbw, T=T),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, HP, WP), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, WP), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, WP), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, WP), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, WP), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, WP), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((S, WP), jnp.int32)],
        interpret=interpret,
    )(mv_h, mv_v, use_pred, refp, curp, resp, stale)
    return out[:, :, :W]


@functools.partial(jax.jit, static_argnames=("mb_size", "interpret"))
def compose_plane_pallas(ref, cur, res, kind, mv_h, mv_v, active,
                         mb_size: int, interpret: bool = False):
    """One plane of the dense phase's compose, fused with mocomp.

    Replaces predict_plane + the XLA per-pixel compose
    (models/mpeg1.py dense_compose): per MB, STALE keeps the current
    plane, INTRA takes pin(residual), SKIP/INTER take
    pin(halfpel_predict(ref, mv) + residual) with the reference's
    exact rounding (player.cpp:732-821 mocomp, :183-236 pin clamp,
    :1151-1236 copy/add); inactive lanes pass the current plane
    through.  Bit-identical to the XLA path (tests/test_mocomp.py).

    ref: uint8[N, H, W]; cur: uint8[N, H, W]; res: int16[N, H, W]
    (residuals; zero where uncoded); kind: int32[N, mbh, mbw] (the
    MB_* codes); mv_h/mv_v: int32[N, mbh, mbw] effective half-pel MVs
    for THIS plane's scale; active: bool[N].  Returns uint8[N, H, W]
    (the new current plane -- also the presented plane).
    """
    N, H, W = ref.shape
    mbh, mbw = kind.shape[1], kind.shape[2]
    S = mb_size
    assert mbh * S == H and mbw * S == W
    T = _round_up(S + 1 + 7, 8)
    HP = _round_up(H - S + T, 8)
    WP = _round_up(W + 1, 128)
    refp = jnp.pad(ref.astype(jnp.int32),
                   ((0, 0), (0, HP - H), (0, WP - W)))
    curp = jnp.pad(cur, ((0, 0), (0, 0), (0, WP - W)))
    resp = jnp.pad(res, ((0, 0), (0, 0), (0, WP - W)))

    out = pl.pallas_call(
        functools.partial(_compose_kernel, S=S, H=H, W=W, WP=WP,
                          mbh=mbh, mbw=mbw, T=T),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((N, 1), lambda n: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, HP, WP), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, WP), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, WP), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, WP), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, WP), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((S, WP), jnp.int32)],
        interpret=interpret,
    )(mv_h, mv_v, kind, active.astype(jnp.int32)[:, None], refp, curp,
      resp)
    return out[:, :, :W]


def _phase_kernel(mvh_ref, mvv_ref, ref_ref, out_ref, ph, *, S, H, W,
                  WP, mbh, mbw, T, HP, dual):
    """Phase-stacked mocomp: all four half-pel interpolations are
    precomputed ONCE per lane as full planes stacked on sublanes
    (P00|P01|P10|P11, rounding exactly player.cpp:767-819), so each MB
    visit is pure data movement -- one aligned sublane slice from the
    stacked buffer at (phase*HP + y0a), one sublane roll, one lane
    roll, one store; no per-visit interpolation arithmetic.  The MB
    loop is op-count bound (~20 vector ops/visit in _kernel); this
    drops it to ~12 and amortizes the interpolation over all
    mb_count visits.

    dual=True packs TWO chroma planes side by side on lanes (u at
    cols [0, W), v at [192, 192+W)); u and v share MVs, so one lane
    roll aligns both windows and one visit serves both planes."""
    A = ref_ref[0]
    Ax = pltpu.roll(A, WP - 1, 1)          # A[:, x+1] (wrap col WP-1
    Ay = pltpu.roll(A, HP - 1, 0)          # unused: beyond W(+192) pad)
    Axy = pltpu.roll(Ax, HP - 1, 0)        # A[y+1, x+1]
    ph[0:HP, :] = A
    ph[HP:2 * HP, :] = (A + Ax + 1) >> 1
    ph[2 * HP:3 * HP, :] = (A + Ay + 1) >> 1
    ph[3 * HP:4 * HP, :] = (A + Ax + Ay + Axy + 2) >> 2

    def mb_row(r, _):
        def one_col(c):
            mh = mvh_ref[0, r, c]
            mv = mvv_ref[0, r, c]
            xh = c * 2 * S + mh
            yh = r * 2 * S + mv
            x0 = jnp.clip(xh >> 1, 0, W - S)
            y0 = jnp.clip(yh >> 1, 0, H - S)
            k = (yh & 1) * 2 + (xh & 1)
            y0a = (y0 >> 3) << 3
            d = y0 - y0a
            if not dual and WP == 384:
                # luma: narrow the whole slice+roll chain to the
                # 256-lane span containing the window (dynamic lane
                # slices are dependable at 128-lane granularity;
                # x0 <= W-S = 336 so the two spans cover every case).
                # Sublane roll FIRST: a lane-roll-first variant that
                # narrowed the sublane roll to (24, 128) measured 19.1
                # vs 15.3 ms at 1024 lanes -- dynamic LANE rolls are
                # the expensive op (~1.1 cyc/vreg vs ~0.2 for sublane
                # rolls), so the lane roll must touch S rows, not T
                ls = jnp.where(x0 < 128, 0, 128)
                win = ph[pl.ds(pl.multiple_of(k * HP + y0a, 8), T),
                         pl.ds(pl.multiple_of(ls, 128), 256)]
                win = pltpu.roll(win, jnp.where(d == 0, 0, T - d), 0)
                w = win[0:S, :]
                f = x0 - ls
                w2 = pltpu.roll(w, jnp.where(f == 0, 0, 256 - f), 1)
            else:
                win = ph[pl.ds(pl.multiple_of(k * HP + y0a, 8), T), :]
                win = pltpu.roll(win, jnp.where(d == 0, 0, T - d), 0)
                w = win[0:S, :]
                w2 = pltpu.roll(w, jnp.where(x0 == 0, 0, WP - x0), 1)
            out_ref[0, pl.ds(pl.multiple_of(r * S, 8), S),
                    c * S:(c + 1) * S] = w2[:, 0:S].astype(jnp.uint8)
            if dual:
                # v's window sits 192 lanes right of u's at the same
                # offset; the shared roll already aligned it
                out_ref[0, pl.ds(pl.multiple_of(r * S, 8), S),
                        192 + c * S:192 + (c + 1) * S] = \
                    w2[:, 192:192 + S].astype(jnp.uint8)
        for c in range(mbw):
            one_col(c)
        return 0

    jax.lax.fori_loop(0, mbh, mb_row, 0)


@functools.partial(jax.jit,
                   static_argnames=("mb_size", "interpret"))
def predict_plane_phase(ref, mv_h, mv_v, mb_size: int,
                        interpret: bool = False):
    """predict_plane via the phase-stacked kernel (bit-identical to
    predict_plane_pallas; see _phase_kernel)."""
    N, H, W = ref.shape
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    S = mb_size
    assert mbh * S == H and mbw * S == W
    T = _round_up(S + 1 + 7, 8)
    HP = _round_up(H - S + T, 8)
    WP = _round_up(W + 1, 128)
    refp = jnp.pad(ref.astype(jnp.int32),
                   ((0, 0), (0, HP - H), (0, WP - W)))
    out = pl.pallas_call(
        functools.partial(_phase_kernel, S=S, H=H, W=W, WP=WP,
                          mbh=mbh, mbw=mbw, T=T, HP=HP, dual=False),
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
        out_shape=jax.ShapeDtypeStruct((N, H, WP), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((4 * HP, WP), jnp.int32)],
        interpret=interpret,
    )(mv_h, mv_v, refp)
    return out[:, :, :W]


@functools.partial(jax.jit, static_argnames=("interpret",))
def predict_chroma_pair_phase(ref_u, ref_v, mv_h, mv_v,
                              interpret: bool = False):
    """Both chroma planes in ONE phase-stacked kernel call: u and v
    share MVs and kinds, so they pack side by side on the lane axis
    (u at cols [0, W), v at [192, 192+W)) and every MB visit serves
    both with a single slice/roll chain -- half the chroma visits of
    two predict_plane calls at the same per-visit cost.

    ref_u/ref_v: uint8[N, H, W] with W <= 168+8 (the 352-wide
    geometry's chroma); mv_h/mv_v at chroma scale.  Returns
    (pred_u, pred_v) uint8[N, H, W]."""
    N, H, W = ref_u.shape
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    S = 8
    assert mbh * S == H and mbw * S == W and W + S + 1 <= 192
    T = _round_up(S + 1 + 7, 8)
    HP = _round_up(H - S + T, 8)
    WP = 384
    refp = jnp.zeros((N, HP, WP), jnp.int32)
    refp = refp.at[:, :H, :W].set(ref_u.astype(jnp.int32))
    refp = refp.at[:, :H, 192:192 + W].set(ref_v.astype(jnp.int32))
    out = pl.pallas_call(
        functools.partial(_phase_kernel, S=S, H=H, W=W, WP=WP,
                          mbh=mbh, mbw=mbw, T=T, HP=HP, dual=True),
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
        out_shape=jax.ShapeDtypeStruct((N, H, WP), jnp.uint8),
        scratch_shapes=[pltpu.VMEM((4 * HP, WP), jnp.int32)],
        interpret=interpret,
    )(mv_h, mv_v, refp)
    return out[:, :, :W], out[:, :, 192:192 + W]


def _phase2_kernel(mvh_ref, mvv_ref, ref_ref, out_ref, ph, *, S, H, W,
                   WP, mbh, mbw, HP):
    """Row-pair phase-stacked luma mocomp: rows r and r+8 of every
    half-pel phase plane pack as the lo/hi 16-bit halves of one int32
    lane (a 16x16 window is 8 pair rows), so the dynamic LANE roll --
    measured ~1.1 cyc/vreg vs ~0.2 for sublane rolls, the dominant
    per-visit op of _phase_kernel -- touches HALF the rows per visit.
    Phase interpolation runs directly in the packed domain (halves
    never carry: 2-tap sums <= 511, 4-tap <= 1022, masked after the
    shift), exactly player.cpp:767-819 per half.  Output stays
    row-pair packed int32 [H/2, W] (lo = rows 0-7 of each 16-row block
    row, hi = rows 8-15); unpack_rowpairs() restores the uint8 plane.
    """
    I32 = jnp.int32
    M8 = jnp.int32(0x00FF00FF)
    R1 = jnp.int32(0x00010001)
    R2 = jnp.int32(0x00020002)
    A = ref_ref[0]
    A2 = A + (pltpu.roll(A, HP - 8, 0) << 16)     # rows r | r+8
    Ax2 = pltpu.roll(A2, WP - 1, 1)               # cols x+1
    Ay2 = pltpu.roll(A2, HP - 1, 0)               # rows +1 (both halves)
    Axy2 = pltpu.roll(Ax2, HP - 1, 0)
    ph[0:HP, :] = A2
    ph[HP:2 * HP, :] = ((A2 + Ax2 + R1) >> 1) & M8
    ph[2 * HP:3 * HP, :] = ((A2 + Ay2 + R1) >> 1) & M8
    ph[3 * HP:4 * HP, :] = ((A2 + Ax2 + Ay2 + Axy2 + R2) >> 2) & M8
    S2 = S // 2
    T2 = 16                                       # pair rows y0..y0+8
                                                  # within [y0a, y0a+16)

    def mb_row(r, _):
        def one_col(c):
            mh = mvh_ref[0, r, c]
            mv = mvv_ref[0, r, c]
            xh = c * 2 * S + mh
            yh = r * 2 * S + mv
            x0 = jnp.clip(xh >> 1, 0, W - S)
            y0 = jnp.clip(yh >> 1, 0, H - S)
            k = (yh & 1) * 2 + (xh & 1)
            y0a = (y0 >> 3) << 3
            d = y0 - y0a
            if WP == 384:
                # narrow to the 256-lane span containing the window
                # (same policy as _phase_kernel)
                ls = jnp.where(x0 < 128, 0, 128)
                win = ph[pl.ds(pl.multiple_of(k * HP + y0a, 8), T2),
                         pl.ds(pl.multiple_of(ls, 128), 256)]
                win = pltpu.roll(win, jnp.where(d == 0, 0, T2 - d), 0)
                w = win[0:S2, :]
                f = x0 - ls
                w2 = pltpu.roll(w, jnp.where(f == 0, 0, 256 - f), 1)
            else:
                win = ph[pl.ds(pl.multiple_of(k * HP + y0a, 8), T2), :]
                win = pltpu.roll(win, jnp.where(d == 0, 0, T2 - d), 0)
                w = win[0:S2, :]
                w2 = pltpu.roll(w, jnp.where(x0 == 0, 0, WP - x0), 1)
            out_ref[0, pl.ds(pl.multiple_of(r * S2, 8), S2),
                    c * S:(c + 1) * S] = w2[:, 0:S]
        for c in range(mbw):
            one_col(c)
        return 0

    jax.lax.fori_loop(0, mbh, mb_row, 0)


def unpack_rowpairs(out32, H: int, W: int):
    """int32[N, H/2, >=W] row-pair packed -> uint8[N, H, W]: pair row
    (16b + i) holds block-row b's pixel rows 16b+i (lo 16 bits) and
    16b+8+i (hi)."""
    N = out32.shape[0]
    o = out32[:, :, :W]
    lo = (o & 0xFF).astype(jnp.uint8).reshape(N, H // 16, 8, W)
    hi = ((o >> 16) & 0xFF).astype(jnp.uint8).reshape(N, H // 16, 8, W)
    return jnp.concatenate([lo, hi], axis=2).reshape(N, H, W)


@functools.partial(jax.jit,
                   static_argnames=("mb_size", "interpret"))
def predict_plane_phase2(ref, mv_h, mv_v, mb_size: int,
                         interpret: bool = False):
    """predict_plane via the row-pair phase-stacked kernel
    (bit-identical; see _phase2_kernel)."""
    N, H, W = ref.shape
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    S = mb_size
    assert mbh * S == H and mbw * S == W and S == 16 and W + 1 <= 384
    T = _round_up(S + 1 + 7, 8)
    HP = _round_up(H - S + T, 8)
    WP = _round_up(W + 1, 128)
    refp = jnp.pad(ref.astype(jnp.int32),
                   ((0, 0), (0, HP - H), (0, WP - W)))
    out = pl.pallas_call(
        functools.partial(_phase2_kernel, S=S, H=H, W=W, WP=WP,
                          mbh=mbh, mbw=mbw, HP=HP),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, HP, WP), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H // 2, WP), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H // 2, WP), jnp.int32),
        scratch_shapes=[pltpu.VMEM((4 * HP, WP), jnp.int32)],
        interpret=interpret,
    )(mv_h, mv_v, refp)
    return unpack_rowpairs(out, H, W)


def _phase4_kernel(mvh_ref, mvv_ref, ref_ref, out_ref, ph, band, *,
                   S, H, W, WP, mbh, mbw, HP):
    """Row-quad phase-stacked luma mocomp: rows r, r+4, r+8, r+12 of
    every half-pel phase plane pack as the four BYTES of one int32
    lane (a 16x16 window is exactly 4 quad rows), so the per-visit
    dynamic lane roll -- the dominant op -- touches a QUARTER of the
    rows.  Phases build in SWAR byte form like _packed_kernel
    (ceil-avg for 2-tap, even/odd 16-bit expansion for 4-tap; exactly
    player.cpp:767-819 per byte).  Output is row-quad packed int32
    [H/4, W] (byte b of quad row 4r+i = pixel row 16r+4b+i);
    visits write a (8, WP) band flushed every TWO block rows so all
    sublane stores stay 8-aligned.  unpack_rowquads() restores the
    uint8 plane."""
    _M7 = np.uint32(0x7F7F7F7F)
    _ME = np.uint32(0x00FF00FF)
    _R2 = np.uint32(0x00020002)
    _U1 = np.uint32(1)
    _U2 = np.uint32(2)
    _U8 = np.uint32(8)
    A = jax.lax.bitcast_convert_type(ref_ref[0], jnp.uint32)
    A4 = (A | (pltpu.roll(A, HP - 4, 0) << _U8)
          | (pltpu.roll(A, HP - 8, 0) << np.uint32(16))
          | (pltpu.roll(A, HP - 12, 0) << np.uint32(24)))
    Ax4 = pltpu.roll(A4, WP - 1, 1)
    Ay4 = pltpu.roll(A4, HP - 1, 0)
    Axy4 = pltpu.roll(Ax4, HP - 1, 0)

    def ceil_avg(a, b):                    # per byte: (a + b + 1) >> 1
        return (a | b) - (((a ^ b) >> _U1) & _M7)

    ph[0:HP, :] = A4
    ph[HP:2 * HP, :] = ceil_avg(A4, Ax4)
    ph[2 * HP:3 * HP, :] = ceil_avg(A4, Ay4)
    se = (A4 & _ME) + (Ax4 & _ME) + (Ay4 & _ME) + (Axy4 & _ME) + _R2
    so = ((A4 >> _U8) & _ME) + ((Ax4 >> _U8) & _ME) \
        + ((Ay4 >> _U8) & _ME) + ((Axy4 >> _U8) & _ME) + _R2
    ph[3 * HP:4 * HP, :] = ((se >> _U2) & _ME) \
        | (((so >> _U2) & _ME) << _U8)
    T4 = 16                                # quad rows y0..y0+4 within
                                           # [y0a, y0a+16)

    def dbl_row(q, _):
        def one(rr, r):
            def one_col(c):
                mh = mvh_ref[0, r, c]
                mv = mvv_ref[0, r, c]
                xh = c * 2 * S + mh
                yh = r * 2 * S + mv
                x0 = jnp.clip(xh >> 1, 0, W - S)
                y0 = jnp.clip(yh >> 1, 0, H - S)
                k = (yh & 1) * 2 + (xh & 1)
                y0a = (y0 >> 3) << 3
                d = y0 - y0a
                if WP == 384:
                    ls = jnp.where(x0 < 128, 0, 128)
                    win = ph[pl.ds(pl.multiple_of(k * HP + y0a, 8),
                                   T4),
                             pl.ds(pl.multiple_of(ls, 128), 256)]
                    win = pltpu.roll(win,
                                     jnp.where(d == 0, 0, T4 - d), 0)
                    w = win[0:4, :]
                    f = x0 - ls
                    w2 = pltpu.roll(w, jnp.where(f == 0, 0, 256 - f),
                                    1)
                else:
                    win = ph[pl.ds(pl.multiple_of(k * HP + y0a, 8),
                                   T4), :]
                    win = pltpu.roll(win,
                                     jnp.where(d == 0, 0, T4 - d), 0)
                    w = win[0:4, :]
                    w2 = pltpu.roll(w, jnp.where(x0 == 0, 0, WP - x0),
                                    1)
                band[rr * 4:(rr + 1) * 4, c * S:(c + 1) * S] = \
                    jax.lax.bitcast_convert_type(w2[:, 0:S], jnp.int32)
            for c in range(mbw):
                one_col(c)

        one(0, 2 * q)
        one(1, 2 * q + 1)
        out_ref[0, pl.ds(pl.multiple_of(q * 8, 8), 8), :] = band[...]
        return 0

    jax.lax.fori_loop(0, mbh // 2, dbl_row, 0)


def unpack_rowquads(out32, H: int, W: int):
    """int32[N, H/4, >=W] row-quad packed -> uint8[N, H, W]: byte b of
    quad row (4r + i) holds block-row r's pixel row 16r + 4b + i."""
    N = out32.shape[0]
    o = out32[:, :, :W]
    u8 = jax.lax.bitcast_convert_type(o, jnp.uint8)   # [N, H/4, W, 4]
    return u8.reshape(N, H // 16, 4, W, 4) \
        .transpose(0, 1, 4, 2, 3).reshape(N, H, W)


@functools.partial(jax.jit,
                   static_argnames=("mb_size", "interpret"))
def predict_plane_phase4(ref, mv_h, mv_v, mb_size: int,
                         interpret: bool = False):
    """predict_plane via the row-quad phase-stacked kernel
    (bit-identical; see _phase4_kernel).  Requires an even MB-row
    count (the banded stores flush two block rows at a time)."""
    N, H, W = ref.shape
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    S = mb_size
    assert mbh * S == H and mbw * S == W and S == 16 and W + 1 <= 384
    assert mbh % 2 == 0, "phase4 needs an even MB-row count"
    T = _round_up(S + 1 + 7, 8)
    HP = _round_up(H - S + T, 8)
    WP = _round_up(W + 1, 128)
    refp = jnp.pad(ref.astype(jnp.int32),
                   ((0, 0), (0, HP - H), (0, WP - W)))
    out = pl.pallas_call(
        functools.partial(_phase4_kernel, S=S, H=H, W=W, WP=WP,
                          mbh=mbh, mbw=mbw, HP=HP),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, HP, WP), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H // 4, WP), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H // 4, WP), jnp.int32),
        scratch_shapes=[pltpu.VMEM((4 * HP, WP), jnp.uint32),
                        pltpu.VMEM((8, WP), jnp.int32)],
        interpret=interpret,
    )(mv_h, mv_v, refp)
    return unpack_rowquads(out, H, W)


def _packed_kernel(mvh_ref, mvv_ref, ref_ref, out_ref, stk, *, S, H, W,
                   mbh, mbw, HP, dual, preshift=True):
    """Packed phase-stacked mocomp: pixels ride FOUR per uint32 word
    (byte p&3 of word p>>2), so every slab the MB loop touches is 4x
    narrower than _phase_kernel's and the plane width (352 px = 88
    words) fits ONE 128-lane vreg span.  Two precomputes amortize over
    all visits:

      * the four half-pel interpolations in SWAR form -- ceil-average
        (a|b) - (((a^b)>>1) & 0x7f..7f) for the 2-tap phases and
        even/odd 16-bit-lane halves for the 4-tap (a+b+c+d+2)>>2 --
        exactly player.cpp:767-819 per byte, no cross-byte carries;
      * EIGHT sublane-pre-shifted copies of the 4-phase stack
        (stk[(d*4+k)*HP + r] = phase_k[r + d]), so a visit's row
        alignment d = y0 - y0a is a stack INDEX, not a roll.

    A visit is then: one aligned (S, 128) sublane slice, two lane
    rolls (word q = x0>>2 and its +1 neighbor), one byte-funnel
    ((wa >> 8s) | (wb << 32-8s), s = x0&3), one packed store --
    ~4x less vreg traffic per visit than _phase_kernel.

    dual packs u at words [0, 48) and v at [48, 96) (byte cols 192+);
    one shared roll aligns both chroma windows per visit."""
    _M7 = np.uint32(0x7F7F7F7F)
    _ME = np.uint32(0x00FF00FF)
    _R2 = np.uint32(0x00020002)
    _U1 = np.uint32(1)
    _U2 = np.uint32(2)
    _U8 = np.uint32(8)
    _U24 = np.uint32(24)
    A = ref_ref[0]
    An = pltpu.roll(A, 127, 1)             # word w+1 (wraps into pad)
    Ax = (A >> _U8) | (An << _U24)         # pixels x+1
    Ay = pltpu.roll(A, HP - 1, 0)          # pixels y+1
    Ayn = pltpu.roll(Ay, 127, 1)
    Axy = (Ay >> _U8) | (Ayn << _U24)

    def ceil_avg(a, b):                    # per byte: (a + b + 1) >> 1
        return (a | b) - (((a ^ b) >> _U1) & _M7)

    stk[0:HP, :] = A
    stk[HP:2 * HP, :] = ceil_avg(A, Ax)
    stk[2 * HP:3 * HP, :] = ceil_avg(A, Ay)
    # (a+b+c+d+2)>>2 per byte: even/odd bytes widen to the 16-bit
    # halves of the word (sums <= 4*255+2 fit), round, re-pack
    se = (A & _ME) + (Ax & _ME) + (Ay & _ME) + (Axy & _ME) + _R2
    so = ((A >> _U8) & _ME) + ((Ax >> _U8) & _ME) \
        + ((Ay >> _U8) & _ME) + ((Axy >> _U8) & _ME) + _R2
    stk[3 * HP:4 * HP, :] = ((se >> _U2) & _ME) \
        | (((so >> _U2) & _ME) << _U8)
    if preshift:
        for d in range(1, 8):
            # shift-d copy; rows that wrap across a phase boundary are
            # never read (visits stop at y0 + S - 1 <= H - 1 < HP - d)
            stk[d * 4 * HP:(d + 1) * 4 * HP, :] = pltpu.roll(
                stk[0:4 * HP, :], 4 * HP - d, 0)

    WB = S // 4                            # output words per block
    VOW = 48                               # v's word offset when dual
    T = _round_up(S + 8, 8)                # slice rows when not preshift

    def mb_row(r, _):
        def one_col(c):
            mh = mvh_ref[0, r, c]
            mv = mvv_ref[0, r, c]
            xh = c * 2 * S + mh
            yh = r * 2 * S + mv
            x0 = jnp.clip(xh >> 1, 0, W - S)
            y0 = jnp.clip(yh >> 1, 0, H - S)
            k = (yh & 1) * 2 + (xh & 1)
            y0a = (y0 >> 3) << 3
            d = y0 - y0a
            q = x0 >> 2
            s = x0 & 3
            if preshift:
                base = (d * 4 + k) * HP + y0a
                slab = stk[pl.ds(pl.multiple_of(base, 8), S), :]
            else:
                # 4-phase stack only: one cheap sublane roll per visit
                # (~0.2 cyc/vreg) replaces the 8 pre-shifted copies
                # whose build dominated the packed kernels' cost
                win = stk[pl.ds(pl.multiple_of(k * HP + y0a, 8), T), :]
                win = pltpu.roll(win, jnp.where(d == 0, 0, T - d), 0)
                slab = win[0:S, :]
            wa = pltpu.roll(slab, jnp.where(q == 0, 0, 128 - q), 1)
            wb = pltpu.roll(slab, 127 - q, 1)
            sl = (s << 3).astype(jnp.uint32)
            sh2 = (jnp.uint32(32) - sl) & jnp.uint32(31)
            outw = jnp.where(s == 0, wa, (wa >> sl) | (wb << sh2))
            out_ref[0, pl.ds(pl.multiple_of(r * S, 8), S),
                    c * WB:(c + 1) * WB] = outw[:, 0:WB]
            if dual:
                out_ref[0, pl.ds(pl.multiple_of(r * S, 8), S),
                        VOW + c * WB:VOW + (c + 1) * WB] = \
                    outw[:, VOW:VOW + WB]
        for c in range(mbw):
            one_col(c)
        return 0

    jax.lax.fori_loop(0, mbh, mb_row, 0)


def _pack_words(planes, HP: int):
    """uint8[N, H, W] planes -> one packed uint32[N, HP, 128] (pixel
    p at byte p & 3 of word p >> 2; little-endian bitcast).  planes is
    a list of (plane, byte_col) laid side by side."""
    N = planes[0][0].shape[0]
    b = jnp.zeros((N, HP, 512), jnp.uint8)
    for p, col in planes:
        b = b.at[:, :p.shape[1], col:col + p.shape[2]].set(p)
    return jax.lax.bitcast_convert_type(
        b.reshape(N, HP, 128, 4), jnp.uint32)


def _unpack_words(out, W: int, col: int = 0):
    """uint32[N, H, 128] -> uint8[N, H, W] from byte column col."""
    N, H, _ = out.shape
    u8 = jax.lax.bitcast_convert_type(out, jnp.uint8)
    return u8.reshape(N, H, 512)[:, :, col:col + W]


@functools.partial(jax.jit,
                   static_argnames=("mb_size", "interpret", "preshift"))
def predict_plane_packed(ref, mv_h, mv_v, mb_size: int,
                         interpret: bool = False,
                         preshift: bool = True):
    """predict_plane via the packed SWAR phase-stacked kernel
    (bit-identical; see _packed_kernel).  preshift=False builds only
    the 4-phase stack and pays one sublane roll per visit instead."""
    N, H, W = ref.shape
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    S = mb_size
    assert mbh * S == H and mbw * S == W and W + S + 1 <= 512
    HP = _round_up(H + 1, 8)
    refp = _pack_words([(ref, 0)], HP)
    copies = 32 if preshift else 4
    out = pl.pallas_call(
        functools.partial(_packed_kernel, S=S, H=H, W=W, mbh=mbh,
                          mbw=mbw, HP=HP, dual=False,
                          preshift=preshift),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, HP, 128), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, 128), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((copies * HP, 128), jnp.uint32)],
        interpret=interpret,
    )(mv_h, mv_v, refp)
    return _unpack_words(out, W)


@functools.partial(jax.jit, static_argnames=("interpret", "preshift"))
def predict_chroma_pair_packed(ref_u, ref_v, mv_h, mv_v,
                               interpret: bool = False,
                               preshift: bool = True):
    """Both chroma planes through ONE packed kernel call (u at byte
    cols [0, 192), v at [192, 384)); shared MVs mean one slice/roll
    chain serves both windows per visit.  Bit-identical to
    predict_plane on each plane.  preshift=False (the "packed4" form)
    drops the 8 pre-shifted stack copies -- whose build dominated this
    kernel's cost -- for one cheap sublane roll per visit."""
    N, H, W = ref_u.shape
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    S = 8
    assert mbh * S == H and mbw * S == W and W + S + 1 <= 192
    HP = _round_up(H + 1, 8)
    refp = _pack_words([(ref_u, 0), (ref_v, 192)], HP)
    copies = 32 if preshift else 4
    out = pl.pallas_call(
        functools.partial(_packed_kernel, S=S, H=H, W=W, mbh=mbh,
                          mbw=mbw, HP=HP, dual=True,
                          preshift=preshift),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, mbh, mbw), lambda n: (n, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, HP, 128), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, 128), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((copies * HP, 128), jnp.uint32)],
        interpret=interpret,
    )(mv_h, mv_v, refp)
    return _unpack_words(out, W), _unpack_words(out, W, 192)


def _visit_scalars_luma(mv_h, mv_v, S, H, W, HP, WP):
    """XLA-side precompute of every per-visit scalar of the row-pair
    phase kernel: the MB loop's address arithmetic (clip, phase index,
    alignment, roll normalization -- ~25 scalar-core ops per visit in
    _phase2_kernel) vectorizes to a handful of [N, mbh, mbw] int ops
    here, so each kernel visit is reduced to four SMEM reads plus the
    slice/roll/store chain.  Returns (base, sro, ls, lro):
    base = phase*HP + y0a (8-aligned slice row), sro = sublane roll,
    ls = 128-lane span start (WP==384 narrowing), lro = lane roll."""
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    cs = (jnp.arange(mbw, dtype=jnp.int32) * (2 * S))[None, None, :]
    rs = (jnp.arange(mbh, dtype=jnp.int32) * (2 * S))[None, :, None]
    xh = mv_h + cs
    yh = mv_v + rs
    x0 = jnp.clip(xh >> 1, 0, W - S)
    y0 = jnp.clip(yh >> 1, 0, H - S)
    k = (yh & 1) * 2 + (xh & 1)
    y0a = (y0 >> 3) << 3
    d = y0 - y0a
    base = k * HP + y0a
    sro = jnp.where(d == 0, 0, 16 - d)
    if WP == 384:
        ls = jnp.where(x0 < 128, 0, 128)
        f = x0 - ls
        lro = jnp.where(f == 0, 0, 256 - f)
    else:
        ls = jnp.zeros_like(x0)
        lro = jnp.where(x0 == 0, 0, WP - x0)
    return base, sro, ls, lro


def _phase2p_kernel(base_ref, sro_ref, ls_ref, lro_ref, ref_ref,
                    out_ref, ph, *, S, H, W, WP, mbh, mbw, HP):
    """_phase2_kernel with every per-visit scalar precomputed on the
    XLA side (_visit_scalars_luma): a visit is four SMEM reads, one
    aligned slice, one sublane roll, one lane roll, one store -- the
    measured bottleneck of the phase kernels was the scalar core's
    ~25-op address chain per visit, not vreg traffic (the row-quad
    variant with 1/4 the vregs measured neutral)."""
    I32 = jnp.int32
    M8 = jnp.int32(0x00FF00FF)
    R1 = jnp.int32(0x00010001)
    R2 = jnp.int32(0x00020002)
    A = ref_ref[0]
    A2 = A + (pltpu.roll(A, HP - 8, 0) << 16)
    Ax2 = pltpu.roll(A2, WP - 1, 1)
    Ay2 = pltpu.roll(A2, HP - 1, 0)
    Axy2 = pltpu.roll(Ax2, HP - 1, 0)
    ph[0:HP, :] = A2
    ph[HP:2 * HP, :] = ((A2 + Ax2 + R1) >> 1) & M8
    ph[2 * HP:3 * HP, :] = ((A2 + Ay2 + R1) >> 1) & M8
    ph[3 * HP:4 * HP, :] = ((A2 + Ax2 + Ay2 + Axy2 + R2) >> 2) & M8
    S2 = S // 2

    def mb_row(r, _):
        def one_col(c):
            b = base_ref[0, r, c]
            sr = sro_ref[0, r, c]
            lr = lro_ref[0, r, c]
            if WP == 384:
                ls = ls_ref[0, r, c]
                win = ph[pl.ds(pl.multiple_of(b, 8), 16),
                         pl.ds(pl.multiple_of(ls, 128), 256)]
            else:
                win = ph[pl.ds(pl.multiple_of(b, 8), 16), :]
            win = pltpu.roll(win, sr, 0)
            w2 = pltpu.roll(win[0:S2, :], lr, 1)
            out_ref[0, pl.ds(pl.multiple_of(r * S2, 8), S2),
                    c * S:(c + 1) * S] = w2[:, 0:S]
        for c in range(mbw):
            one_col(c)
        return 0

    jax.lax.fori_loop(0, mbh, mb_row, 0)


@functools.partial(jax.jit,
                   static_argnames=("mb_size", "interpret"))
def predict_plane_phase2p(ref, mv_h, mv_v, mb_size: int,
                          interpret: bool = False):
    """predict_plane via the row-pair phase kernel with XLA-precomputed
    visit scalars (bit-identical; see _phase2p_kernel)."""
    N, H, W = ref.shape
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    S = mb_size
    assert mbh * S == H and mbw * S == W and S == 16 and W + 1 <= 384
    T = _round_up(S + 1 + 7, 8)
    HP = _round_up(H - S + T, 8)
    WP = _round_up(W + 1, 128)
    refp = jnp.pad(ref.astype(jnp.int32),
                   ((0, 0), (0, HP - H), (0, WP - W)))
    base, sro, ls, lro = _visit_scalars_luma(mv_h, mv_v, S, H, W, HP,
                                             WP)
    smem = functools.partial(pl.BlockSpec, (1, mbh, mbw),
                             lambda n: (n, 0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_phase2p_kernel, S=S, H=H, W=W, WP=WP,
                          mbh=mbh, mbw=mbw, HP=HP),
        grid=(N,),
        in_specs=[
            smem(), smem(), smem(), smem(),
            pl.BlockSpec((1, HP, WP), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H // 2, WP), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H // 2, WP), jnp.int32),
        scratch_shapes=[pltpu.VMEM((4 * HP, WP), jnp.int32)],
        interpret=interpret,
    )(base, sro, ls, lro, refp)
    return unpack_rowpairs(out, H, W)


def _visit_scalars_packed(mv_h, mv_v, S, H, W, HP):
    """XLA-side precompute for the packed (4 px/word) chroma kernel
    with the pre-shifted stack: base = (d*4 + k)*HP + y0a (slice row),
    war = word-granular lane roll, sl/sh2 = byte-funnel shifts, m =
    all-ones mask when the funnel's second word contributes (x0 not
    word-aligned), else 0."""
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    cs = (jnp.arange(mbw, dtype=jnp.int32) * (2 * S))[None, None, :]
    rs = (jnp.arange(mbh, dtype=jnp.int32) * (2 * S))[None, :, None]
    xh = mv_h + cs
    yh = mv_v + rs
    x0 = jnp.clip(xh >> 1, 0, W - S)
    y0 = jnp.clip(yh >> 1, 0, H - S)
    k = (yh & 1) * 2 + (xh & 1)
    y0a = (y0 >> 3) << 3
    d = y0 - y0a
    base = (d * 4 + k) * HP + y0a
    q = x0 >> 2
    s = x0 & 3
    war = jnp.where(q == 0, 0, 128 - q)
    sl = s << 3
    sh2 = (32 - sl) & 31
    m = jnp.where(s == 0, 0, -1)
    return base, war, sl, sh2, m


def _packedp_kernel(base_ref, war_ref, sl_ref, sh2_ref, m_ref,
                    ref_ref, out_ref, stk, *, S, H, W, mbh, mbw, HP,
                    dual, accum=False):
    """_packed_kernel (preshift form) with every per-visit scalar
    precomputed on the XLA side (_visit_scalars_packed), and the
    funnel's second lane roll made STATIC: wb = roll(wa, 127) ==
    roll(slab, 127 - q), replacing the second dynamic roll (the
    expensive per-visit op class) with a constant rotate.  A visit is
    five SMEM reads, one aligned slice, one dynamic + one static lane
    roll, the funnel or/and, and the store(s).

    accum=True replaces the per-visit narrow (S, WB) stores -- 2*mbw
    of them per MB row at WB=2 lanes each -- with a register
    accumulator: each visit masks its u|v output words and ORs them
    into place with one STATIC lane rotate (u and v share the rotate
    amount c*WB), and the row writes ONCE as a full (S, 128) store."""
    _M7 = np.uint32(0x7F7F7F7F)
    _ME = np.uint32(0x00FF00FF)
    _R2 = np.uint32(0x00020002)
    _U1 = np.uint32(1)
    _U2 = np.uint32(2)
    _U8 = np.uint32(8)
    _U24 = np.uint32(24)
    A = ref_ref[0]
    An = pltpu.roll(A, 127, 1)
    Ax = (A >> _U8) | (An << _U24)
    Ay = pltpu.roll(A, HP - 1, 0)
    Ayn = pltpu.roll(Ay, 127, 1)
    Axy = (Ay >> _U8) | (Ayn << _U24)

    def ceil_avg(a, b):
        return (a | b) - (((a ^ b) >> _U1) & _M7)

    stk[0:HP, :] = A
    stk[HP:2 * HP, :] = ceil_avg(A, Ax)
    stk[2 * HP:3 * HP, :] = ceil_avg(A, Ay)
    se = (A & _ME) + (Ax & _ME) + (Ay & _ME) + (Axy & _ME) + _R2
    so = ((A >> _U8) & _ME) + ((Ax >> _U8) & _ME) \
        + ((Ay >> _U8) & _ME) + ((Axy >> _U8) & _ME) + _R2
    stk[3 * HP:4 * HP, :] = ((se >> _U2) & _ME) \
        | (((so >> _U2) & _ME) << _U8)
    for d in range(1, 8):
        stk[d * 4 * HP:(d + 1) * 4 * HP, :] = pltpu.roll(
            stk[0:4 * HP, :], 4 * HP - d, 0)

    WB = S // 4
    VOW = 48

    if accum:
        li = jax.lax.broadcasted_iota(jnp.uint32, (S, 128), 1)
        sel = (li < WB) | ((li >= VOW) & (li < VOW + WB)) if dual \
            else li < WB
        msel = jnp.where(sel, np.uint32(0xFFFFFFFF), np.uint32(0))

    def mb_row(r, _):
        def one_col(c):
            b = base_ref[0, r, c]
            ar = war_ref[0, r, c]
            sl = sl_ref[0, r, c].astype(jnp.uint32)
            sh2 = sh2_ref[0, r, c].astype(jnp.uint32)
            m = m_ref[0, r, c].astype(jnp.uint32)
            slab = stk[pl.ds(pl.multiple_of(b, 8), S), :]
            wa = pltpu.roll(slab, ar, 1)
            wb = pltpu.roll(wa, 127, 1)
            outw = (wa >> sl) | ((wb << sh2) & m)
            if accum:
                w = outw & msel
                return pltpu.roll(w, c * WB, 1) if c else w
            out_ref[0, pl.ds(pl.multiple_of(r * S, 8), S),
                    c * WB:(c + 1) * WB] = outw[:, 0:WB]
            if dual:
                out_ref[0, pl.ds(pl.multiple_of(r * S, 8), S),
                        VOW + c * WB:VOW + (c + 1) * WB] = \
                    outw[:, VOW:VOW + WB]
        if accum:
            acc = one_col(0)
            for c in range(1, mbw):
                acc = acc | one_col(c)
            out_ref[0, pl.ds(pl.multiple_of(r * S, 8), S), :] = acc
        else:
            for c in range(mbw):
                one_col(c)
        return 0

    jax.lax.fori_loop(0, mbh, mb_row, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "accum"))
def predict_chroma_pair_packedp(ref_u, ref_v, mv_h, mv_v,
                                interpret: bool = False,
                                accum: bool = False):
    """predict_chroma_pair_packed with XLA-precomputed visit scalars
    and a static second funnel roll (bit-identical; see
    _packedp_kernel).  accum=True additionally replaces the narrow
    per-visit stores with a per-MB-row register accumulator."""
    N, H, W = ref_u.shape
    mbh, mbw = mv_h.shape[1], mv_h.shape[2]
    S = 8
    assert mbh * S == H and mbw * S == W and W + S + 1 <= 192
    HP = _round_up(H + 1, 8)
    refp = _pack_words([(ref_u, 0), (ref_v, 192)], HP)
    base, war, sl, sh2, m = _visit_scalars_packed(mv_h, mv_v, S, H, W,
                                                  HP)
    smem = functools.partial(pl.BlockSpec, (1, mbh, mbw),
                             lambda n: (n, 0, 0),
                             memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        functools.partial(_packedp_kernel, S=S, H=H, W=W, mbh=mbh,
                          mbw=mbw, HP=HP, dual=True, accum=accum),
        grid=(N,),
        in_specs=[
            smem(), smem(), smem(), smem(), smem(),
            pl.BlockSpec((1, HP, 128), lambda n: (n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, 128), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((32 * HP, 128), jnp.uint32)],
        interpret=interpret,
    )(base, war, sl, sh2, m, refp)
    return _unpack_words(out, W), _unpack_words(out, W, 192)


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
        out_shape=jax.ShapeDtypeStruct((N, H, WP), jnp.uint8),
        interpret=interpret,
    )(mv_h, mv_v, refp)
    return out[:, :, :W]

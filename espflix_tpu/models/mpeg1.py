"""Batched MPEG-1 video decoder model (the flagship pipeline stage).

Host side: cheap byte-level picture/slice segmentation of elementary
streams (the per-stream analogue of the reference's start-code scan loop,
/root/reference/src/player.cpp:1355-1367).  Device side: one jitted call
decodes ONE PICTURE PER LANE for N lanes:

    scan  (ops/vlc_scan.py)  -- lane-parallel FSM: levels + MB records
    dense (ops/idct.py)      -- batched dequant + exact IDCT
    dense (ops/mocomp.py)    -- gathered half-pel prediction
    compose                  -- per-pixel select by MB kind + PIN

Frame state is HBM-resident [N, 2, H, W] double-buffered planes with a
per-lane parity (the contiguous replacement for the reference's
strip-chunked Frame pair, player.h:37-39, SURVEY.md "memory layout").
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from espflix_tpu.core import vlc_tables as V
from espflix_tpu.core.bitio import BitReader, bytes_to_words_be
from espflix_tpu.ops import idct as idct_ops
from espflix_tpu.ops import mocomp as mocomp_ops
from espflix_tpu.ops import vlc_scan


# ---------------------------------------------------------------------------
# Host-side ES segmentation
# ---------------------------------------------------------------------------

@dataclass
class SequenceInfo:
    width: int
    height: int
    intra_q: np.ndarray
    non_intra_q: np.ndarray

    @property
    def mb_width(self):
        return (self.width + 15) >> 4

    @property
    def mb_height(self):
        return (self.height + 15) >> 4


@dataclass
class PictureData:
    """One picture's payload, device-ready."""
    pic_type: int            # 1=I, 2=P (others are presented-but-skipped)
    full_pel: int
    r_size: int
    seq: SequenceInfo
    payload: bytes = b""     # slice region (start codes included)
    slice_offsets: list = field(default_factory=list)  # bit offsets
    slice_rows: list = field(default_factory=list)
    pts: int = -1


def find_start_codes(data: bytes):
    """All (byte_pos, code) of 00 00 01 xx prefixes, numpy-fast."""
    a = np.frombuffer(data, np.uint8)
    if len(a) < 4:
        return []
    hits = np.where((a[:-3] == 0) & (a[1:-2] == 0) & (a[2:-1] == 1))[0]
    return [(int(p), int(a[p + 3])) for p in hits]


def parse_es(data: bytes, pts_of=None) -> tuple[SequenceInfo, list]:
    """Segment an MPEG-1 video ES into PictureData records.

    Returns (sequence_info, pictures).  Non-I/P pictures produce records
    with no slices (lane presents/flips with unchanged content upstream).
    """
    codes = find_start_codes(data)
    seq: SequenceInfo | None = None
    pics: list[PictureData] = []
    cur: PictureData | None = None
    cur_start = None  # byte pos of first slice start code

    def close(end_byte):
        nonlocal cur, cur_start
        if cur is not None:
            if cur_start is not None:
                base = cur_start
                cur.payload = data[base:end_byte]
                cur.slice_offsets = [
                    (off - base) * 8 + 32 for off in cur.slice_offsets]
            cur = None
            cur_start = None

    npic = 0
    for pos, code in codes:
        if code == 0xB3:  # sequence header
            close(pos)
            r = BitReader(data[pos + 4:pos + 4 + 140])
            w, h = r.get(12), r.get(12)
            r.get(4 + 4 + 18 + 12)
            if r.get(1):
                iq = np.array([r.get(8) for _ in range(64)], np.int32)
            else:
                iq = V.DEFAULT_INTRA_Q.copy()
            if r.get(1):
                nq = np.array([r.get(8) for _ in range(64)], np.int32)
            else:
                nq = V.DEFAULT_NON_INTRA_Q.copy()
            seq = SequenceInfo(w, h, iq, nq)
        elif code == 0x00:  # picture
            close(pos)
            assert seq is not None, "picture before sequence header"
            r = BitReader(data[pos + 4:pos + 4 + 8])
            r.get(10)
            ptype = r.get(3)
            full_pel = r_size = 0
            if ptype == 2:
                r.get(16)
                full_pel = r.get(1)
                r_size = r.get(3) - 1
            pts = pts_of(npic) if pts_of else npic
            npic += 1
            cur = PictureData(ptype, full_pel, r_size, seq, pts=pts)
            pics.append(cur)
        elif 0x01 <= code <= 0xAF:  # slice
            if cur is not None and cur.pic_type in (1, 2):
                if cur_start is None:
                    cur_start = pos
                cur.slice_offsets.append(pos)
                cur.slice_rows.append(code - 1)
        elif code in (0xB7,):  # sequence end
            close(pos)
        # GOP (0xB8), user data, extensions: no action needed
    close(len(data))
    return seq, pics


# ---------------------------------------------------------------------------
# Batch assembly
# ---------------------------------------------------------------------------

def make_picture_batch(pictures: list, words_per_lane: int | None = None,
                       max_slices: int | None = None,
                       geometry: tuple | None = None):
    """Pack one PictureData per lane into device arrays.

    pictures may contain None entries (starved lane: no picture, lane
    keeps its frame and does not flip).  An ALL-None tick is legal when
    `geometry` (mb_width, mb_height) is given -- every lane masks out
    (an idle fleet must not crash the chunked dispatch).
    """
    real = [p for p in pictures if p is not None]
    if real:
        seq = real[0].seq
        mbw_g, mbh = seq.mb_width, seq.mb_height
    else:
        assert geometry is not None and words_per_lane is not None, \
            "empty batch needs explicit geometry + words_per_lane"
        mbw_g, mbh = geometry
    S = max_slices or max(
        max((len(p.slice_offsets) for p in real), default=1), 1)
    if words_per_lane is None:
        words_per_lane = max(
            (len(p.payload) + 3) // 4 + 4 for p in real)

    N = len(pictures)
    words = np.zeros((N, words_per_lane), np.uint32)
    n_words = np.zeros(N, np.int32)
    slice_starts = np.zeros((N, S), np.int32)
    slice_rows = np.zeros((N, S), np.int32)
    n_slices = np.zeros(N, np.int32)
    pic_type = np.ones(N, np.int32)
    full_pel = np.zeros(N, np.int32)
    r_size = np.zeros(N, np.int32)
    intra_q = np.tile(V.DEFAULT_INTRA_Q, (N, 1)).astype(np.int32)
    non_intra_q = np.tile(V.DEFAULT_NON_INTRA_Q, (N, 1)).astype(np.int32)
    active = np.zeros(N, bool)

    # word packing is vectorized across lanes: raw payload bytes land
    # directly in the words buffer (2 slice-assigns per lane), then ONE
    # in-place byteswap over the used prefix converts to the device's
    # big-endian packing.  The per-lane bytes_to_words_be chain (~8
    # numpy calls each) measured ~20 of the 32 ms batch-assembly cost
    # at 1024 lanes.
    u8 = words.view(np.uint8).reshape(N, words_per_lane * 4)
    EOS = BitReader.EOS  # 00 00 01 B7 x2
    maxw = 0
    for i, p in enumerate(pictures):
        if p is None:
            continue
        pl = p.payload
        n = len(pl)
        pad = (-n) % 4
        nw = (n + pad) // 4 + 4     # payload + 2x EOS pad (8B pattern)
        assert nw <= words_per_lane, (nw, words_per_lane)
        u8[i, :n] = np.frombuffer(pl, np.uint8)
        u8[i, n:n + pad + 16] = np.frombuffer(
            EOS[:pad] + EOS * 2, np.uint8)
        n_words[i] = nw
        maxw = max(maxw, nw)
        k = len(p.slice_offsets)
        assert k <= S
        slice_starts[i, :k] = p.slice_offsets
        slice_rows[i, :k] = p.slice_rows
        n_slices[i] = k
        pic_type[i] = p.pic_type
        full_pel[i] = p.full_pel
        r_size[i] = max(p.r_size, 0)
        intra_q[i] = p.seq.intra_q
        non_intra_q[i] = p.seq.non_intra_q
        active[i] = True
    if maxw:
        words[:, :maxw].byteswap(inplace=True)

    return dict(
        words=words, slice_starts=slice_starts, slice_rows=slice_rows,
        n_slices=n_slices, pic_type=pic_type, full_pel=full_pel,
        r_size=r_size, intra_q=intra_q, non_intra_q=non_intra_q,
        active=active, n_words=n_words,
        mb_width=mbw_g, mb_height=mbh,
    )


def init_frame_state(n_lanes: int, width: int, height: int):
    """HBM-resident double-buffered planes + per-lane parity."""
    return dict(
        y=jnp.zeros((n_lanes, 2, height, width), jnp.uint8),
        u=jnp.zeros((n_lanes, 2, height // 2, width // 2), jnp.uint8),
        v=jnp.zeros((n_lanes, 2, height // 2, width // 2), jnp.uint8),
        parity=jnp.zeros((n_lanes,), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Device decode
# ---------------------------------------------------------------------------

def _sext12(x):
    x = x & 0xFFF
    return jnp.where(x >= 0x800, x - 0x1000, x)


def _take_parity(planes, parity):
    # planes [N,2,H,W]; parity [N] -> [N,H,W].  Pure select (a gather
    # along a 2-wide axis is pathologically slow on some TPU runtimes).
    return jnp.where(parity[:, None, None] == 0, planes[:, 0],
                     planes[:, 1])


def _pin(x):
    return jnp.clip(x, 0, 248)


def decode_picture_impl(words, slice_starts, slice_rows, n_slices,
                        pic_type, full_pel, r_size, intra_q, non_intra_q,
                        active, frames, *, mb_width: int, mb_height: int,
                        max_steps: int, use_pallas_idct=None,
                        slice_parallel: bool = False,
                        peek: str = "gather",
                        max_symbols: int = 20000):
    """Decode one picture per lane; returns (new_frames, presented, info).

    presented: dict(y,u,v) uint8 planes of the just-decoded pictures
    (lanes not active return their previous current plane).

    slice_parallel runs each SLICE as its own scan row (slices are
    independent decode units: DC/MV predictors and qscale reset at each
    slice header, player.cpp:1239-1259), cutting while-loop trip count
    by ~the slice count; the per-step cost of this runtime is nearly
    row-count-independent so this is a near-S-fold scan win.  max_steps
    then bounds the LONGEST SLICE's symbol count, not the picture's.

    Pure lane-local function: safe to run whole (single shard) or inside
    shard_map over a 'streams' mesh axis (each shard decodes its local
    lanes; no cross-lane communication exists anywhere in the decoder).
    """
    N = words.shape[0]
    mb_count = mb_width * mb_height
    H, W = mb_height * 16, mb_width * 16

    if slice_parallel:
        S = slice_starts.shape[1]
        NS = N * S
        sub_alive = jnp.arange(S)[None, :] < n_slices[:, None]
        st0 = vlc_scan.initial_state(
            NS,
            slice_starts.reshape(NS, 1),
            slice_rows.reshape(NS, 1),
            sub_alive.astype(jnp.int32).reshape(NS),
            jnp.repeat(pic_type, S), jnp.repeat(full_pel, S),
            jnp.repeat(r_size, S))
        coeffs, recs, nfinal, st, iters = vlc_scan.run_scan(
            jnp.repeat(words, S, axis=0), st0, mb_width, mb_count,
            max_steps, out_groups=S, peek=peek,
            max_symbols=max_symbols)
        err_sub = st["error"] | (st["state"] != vlc_scan.ST_DONE)
        err = err_sub.reshape(N, S).any(axis=1)
    else:
        st0 = vlc_scan.initial_state(
            N, slice_starts, slice_rows, n_slices, pic_type, full_pel,
            r_size)
        coeffs, recs, nfinal, st, iters = vlc_scan.run_scan(
            words, st0, mb_width, mb_count, max_steps, peek=peek,
            max_symbols=max_symbols)
        err = st["error"] | (st["state"] != vlc_scan.ST_DONE)

    new_frames, presented = dense_compose(
        coeffs, recs, nfinal, intra_q, non_intra_q, active, frames,
        mb_width=mb_width, mb_height=mb_height,
        use_pallas_idct=use_pallas_idct)
    ok = active & ~err
    info = dict(error=err, ok=ok,
                iters=jnp.broadcast_to(iters, (N,)))
    return new_frames, presented, info


def dense_compose(coeffs, recs, nfinal, intra_q, non_intra_q, active,
                  frames, *, mb_width: int, mb_height: int,
                  use_pallas_idct=None, use_pallas_mocomp=None,
                  ref_planes=None, row0_mb: int = 0,
                  coeffs_T=None):
    """Shared dense phase: dequant+IDCT + mocomp + per-pixel compose.

    Consumes the scanner-format buffers (from the device FSM scan OR the
    native tokenizer fast path) and produces (new_frames, presented).
    use_pallas_idct selects the fused VMEM-resident Pallas kernel for
    dequant+IDCT (bit-identical; 2.5x the jnp path standalone on a real
    v5e, but in-graph at N=1024 its marshalling -- 64->128 lane padding
    plus materialized operand layouts, ~830MB/operand -- costs more
    than the kernel saves: 56.9 vs 29.9 rt streams/chip measured
    back-to-back.  jnp therefore stays the default; the kernel is the
    round-2 fusion target with a sublane-major layout)."""
    if use_pallas_idct is None:
        use_pallas_idct = False
    N = recs.shape[0]
    mb_count = mb_width * mb_height
    H, W = mb_height * 16, mb_width * 16

    kind = (recs & 3).reshape(N, mb_height, mb_width)
    qs_mb = ((recs >> 2) & 31).reshape(N, mb_height, mb_width)
    mv_h = _sext12(recs >> 7).reshape(N, mb_height, mb_width)
    mv_v = _sext12(recs >> 19).reshape(N, mb_height, mb_width)

    parity = frames["parity"]
    cur_y = _take_parity(frames["y"], parity)
    cur_u = _take_parity(frames["u"], parity)
    cur_v = _take_parity(frames["v"], parity)
    ref_y = _take_parity(frames["y"], 1 - parity)
    ref_u = _take_parity(frames["u"], 1 - parity)
    ref_v = _take_parity(frames["v"], 1 - parity)

    # fused mocomp+compose Pallas path: prediction windows, residual
    # add, kind select and pin happen inside one VMEM-resident kernel
    # (ops/mocomp_pallas.py compose_plane_pallas) -- no predicted or
    # composed int32 planes ever hit HBM.  Measured on a real v5e it
    # LOSES 3x to the unfused path (150 vs 456 rt streams/chip
    # full-path): feeding the kernel requires materializing [N,H,W]
    # residual PLANES via the 7-D transpose the flat-64 assembly was
    # built to avoid, and the per-MB pl.when branches serialize
    # (~440ns each, 264 MB x 1024 lanes).  Kept opt-in
    # (use_pallas_mocomp="fused") as a bit-exact alternative and a
    # recorded negative result, like use_pallas_idct above.
    fused = (coeffs_T is not None and ref_planes is None
             and use_pallas_mocomp == "fused")
    if fused:
        from espflix_tpu.ops.mocomp_pallas import compose_plane_pallas
        interp = jax.default_backend() != "tpu"
        intra_mb = (recs & 3) == vlc_scan.MB_INTRA
        BL = mb_count * 6
        intra_bl = jnp.repeat(intra_mb, 6, axis=1)
        qs_bl = jnp.repeat((recs >> 2) & 31, 6, axis=1)
        qmat_T = jnp.where(intra_bl[:, None, :],
                           intra_q[:, :, None],
                           non_intra_q[:, :, None])
        res_T = idct_ops.block_residuals_T(
            coeffs_T.astype(jnp.int32), intra_bl, qs_bl, qmat_T,
            nfinal).astype(jnp.int16)                # [N, 64, BL]
        rT = res_T.reshape(N, 8, 8, mb_height, mb_width, 6)
        ry = rT[..., :4].reshape(
            N, 8, 8, mb_height, mb_width, 2, 2) \
            .transpose(0, 3, 5, 1, 4, 6, 2).reshape(N, H, W)
        ru = rT[..., 4].transpose(0, 3, 1, 4, 2) \
            .reshape(N, H // 2, W // 2)
        rv = rT[..., 5].transpose(0, 3, 1, 4, 2) \
            .reshape(N, H // 2, W // 2)
        new_y = compose_plane_pallas(
            ref_y, cur_y, ry, kind, mv_h, mv_v, active, 16,
            interpret=interp)
        new_u = compose_plane_pallas(
            ref_u, cur_u, ru, kind, mv_h >> 1, mv_v >> 1, active, 8,
            interpret=interp)
        new_v = compose_plane_pallas(
            ref_v, cur_v, rv, kind, mv_h >> 1, mv_v >> 1, active, 8,
            interpret=interp)
        new_frames = dict(
            y=frames["y"].at[jnp.arange(N), parity].set(new_y),
            u=frames["u"].at[jnp.arange(N), parity].set(new_u),
            v=frames["v"].at[jnp.arange(N), parity].set(new_v),
            parity=jnp.where(active, 1 - parity, parity),
        )
        return new_frames, dict(y=new_y, u=new_u, v=new_v)

    # ---- prediction (skip + inter MBs; zero MV elsewhere is harmless)
    if ref_planes is not None:
        # 'space'-sharded caller (parallel/mesh.py): this shard holds
        # MB rows [row0_mb, row0_mb + mb_height) while prediction may
        # read anywhere in the MV range, so the FULL reference planes
        # arrive separately (all-gathered along the space axis) and
        # mocomp uses the band form.
        rf_y, rf_u, rf_v = ref_planes
        pred_y = mocomp_ops.predict_plane_rows(
            rf_y, mv_h, mv_v, 16, row0_mb)
        pred_u = mocomp_ops.predict_plane_rows(
            rf_u, mv_h >> 1, mv_v >> 1, 8, row0_mb)
        pred_v = mocomp_ops.predict_plane_rows(
            rf_v, mv_h >> 1, mv_v >> 1, 8, row0_mb)
        use_pallas_mocomp = False
    else:
        if use_pallas_mocomp is None:
            if jax.default_backend() == "tpu":
                # ESPFLIX_MOCOMP selects the TPU production variant:
                # "hybrid2p" (row-pair phase-stack luma + packed dual
                # chroma with all per-visit scalars precomputed in XLA
                # and read from SMEM -- the round-5 measured default:
                # luma 8.4 vs 10.7, chroma pair 9.8 vs 11.2 ms
                # isolated at 1024 lanes), "hybrid2" (in-kernel visit
                # scalars), "hybrid" (unpacked phase luma, round-4
                # default), "phase" (phase-stacked both), "packed"
                # (packed SWAR both), "pallas" (roll-window predict
                # kernel + XLA compose) or "fused2" (branch-free
                # fused mocomp+compose)
                v = os.environ.get("ESPFLIX_MOCOMP", "hybrid2p")
                use_pallas_mocomp = True if v == "pallas" else v
            else:
                use_pallas_mocomp = False
        if use_pallas_mocomp == "fused2":
            # branch-free fused mocomp+compose: prediction, residual
            # add, pin and the kind/active select all happen inside
            # compose_plane_pallas2 after residual-plane assembly;
            # no predicted plane is ever materialized
            pred_y = pred_u = pred_v = None
        elif use_pallas_mocomp == "phase":
            # phase-stacked kernel: the four half-pel interpolations
            # precompute once per lane, each MB visit is pure data
            # movement, and u|v pack into one dual-plane call
            # (ops/mocomp_pallas._phase_kernel)
            from espflix_tpu.ops.mocomp_pallas import (
                predict_chroma_pair_phase, predict_plane_phase)
            interp = jax.default_backend() != "tpu"
            pred_y = predict_plane_phase(ref_y, mv_h, mv_v, 16,
                                         interpret=interp)
            pred_u, pred_v = predict_chroma_pair_phase(
                ref_u, ref_v, mv_h >> 1, mv_v >> 1, interpret=interp)
        elif use_pallas_mocomp == "packed":
            # packed SWAR phase stack: 4 px/uint32 word + 8
            # pre-shifted sublane copies -- a visit is one (S, 128)
            # slice, two lane rolls and a byte funnel
            # (ops/mocomp_pallas._packed_kernel)
            from espflix_tpu.ops.mocomp_pallas import (
                predict_chroma_pair_packed, predict_plane_packed)
            interp = jax.default_backend() != "tpu"
            pred_y = predict_plane_packed(ref_y, mv_h, mv_v, 16,
                                          interpret=interp)
            pred_u, pred_v = predict_chroma_pair_packed(
                ref_u, ref_v, mv_h >> 1, mv_v >> 1, interpret=interp)
        elif use_pallas_mocomp in ("hybrid", "hybrid2", "hybrid2p",
                                   "hybrid4"):
            # measured split decision (docs/PERF.md round 4): luma
            # prefers a phase stack (the 8 pre-shifted packed copies
            # cost more than packing saves on the big plane), chroma
            # prefers the packed dual kernel (~8.3 vs ~12.5 ms for
            # the u+v pair).  hybrid2 uses the row-pair phase-stacked
            # luma kernel (_phase2_kernel): the dynamic lane roll --
            # the dominant per-visit op -- touches half the rows.
            # hybrid2p moves every per-visit scalar (clip/phase/roll
            # address chain) out of the kernel into one vectorized
            # XLA precompute read back via SMEM (_phase2p_kernel /
            # _packedp_kernel)
            from espflix_tpu.ops.mocomp_pallas import (
                predict_chroma_pair_packed, predict_chroma_pair_packedp,
                predict_plane_phase, predict_plane_phase2,
                predict_plane_phase2p, predict_plane_phase4)
            interp = jax.default_backend() != "tpu"
            luma = {"hybrid": predict_plane_phase,
                    "hybrid2": predict_plane_phase2,
                    "hybrid2p": predict_plane_phase2p,
                    "hybrid4": predict_plane_phase4}[use_pallas_mocomp]
            if use_pallas_mocomp == "hybrid4" and mb_height % 2:
                luma = predict_plane_phase2
            pred_y = luma(ref_y, mv_h, mv_v, 16, interpret=interp)
            if use_pallas_mocomp == "hybrid2p":
                # accum=True: one full-width store per chroma MB row
                # instead of 2*mbw narrow 2-lane stores (9.44 vs 9.82
                # ms isolated pair at 1024 lanes)
                pred_u, pred_v = predict_chroma_pair_packedp(
                    ref_u, ref_v, mv_h >> 1, mv_v >> 1,
                    interpret=interp, accum=True)
            else:
                pred_u, pred_v = predict_chroma_pair_packed(
                    ref_u, ref_v, mv_h >> 1, mv_v >> 1,
                    interpret=interp)
        elif use_pallas_mocomp:
            # VMEM-resident roll-based window extraction: bit-identical,
            # 2.7x the one-hot MXU path at 1024 lanes (ops/mocomp_pallas)
            from espflix_tpu.ops.mocomp_pallas import \
                predict_plane_pallas
            interp = jax.default_backend() != "tpu"
            pred_y = predict_plane_pallas(ref_y, mv_h, mv_v, 16,
                                          interpret=interp)
            pred_u = predict_plane_pallas(ref_u, mv_h >> 1, mv_v >> 1,
                                          8, interpret=interp)
            pred_v = predict_plane_pallas(ref_v, mv_h >> 1, mv_v >> 1,
                                          8, interpret=interp)
        else:
            pred_y = mocomp_ops.predict_plane_mxu(ref_y, mv_h, mv_v, 16)
            pred_u = mocomp_ops.predict_plane_mxu(ref_u, mv_h >> 1,
                                                  mv_v >> 1, 8)
            pred_v = mocomp_ops.predict_plane_mxu(ref_v, mv_h >> 1,
                                                  mv_v >> 1, 8)

    # ---- residuals
    intra_mb = (recs & 3) == vlc_scan.MB_INTRA           # [N, MB]
    if coeffs_T is not None:
        # transposed orientation (positions on sublanes, blocks on
        # lanes): dequant/IDCT run on densely packed vregs
        # (ops/idct.py block_residuals_T); the lane-minor form below
        # pays ~16x padded layouts on its 8-wide slices
        BL = mb_count * 6
        intra_bl = jnp.repeat(intra_mb, 6, axis=1)       # [N, BL]
        qs_bl = jnp.repeat((recs >> 2) & 31, 6, axis=1)
        # int16 from here on: residuals are bounded well inside int16
        # (post-IDCT samples; the reference clamps them to 0..248
        # right after the add, player.cpp:183-236), and the halved
        # vreg traffic pays through the plane transpose AND compose
        # default flipped to the one-pass VMEM kernel after round-4
        # hardware measurement: 541-552 vs 471 rt streams/chip full
        # path at 1024 lanes (docs/PERF.md round 4); ESPFLIX_IDCT=jnp
        # restores the XLA chain
        if (jax.default_backend() == "tpu"
                and os.environ.get("ESPFLIX_IDCT",
                                   "pallasT") == "pallasT"):
            # one VMEM-resident pass: the jnp chain's butterfly
            # concats and position transposes are HBM relayouts
            from espflix_tpu.ops.idct_pallas import \
                block_residuals_T_pallas
            res_T = block_residuals_T_pallas(
                coeffs_T, intra_bl, qs_bl, intra_q, non_intra_q,
                nfinal)                                  # [N, 64, BL]
        else:
            qmat_T = jnp.where(intra_bl[:, None, :],
                               intra_q[:, :, None],
                               non_intra_q[:, :, None])
            res_T = idct_ops.block_residuals_T(
                coeffs_T.astype(jnp.int32), intra_bl, qs_bl, qmat_T,
                nfinal).astype(jnp.int16)                # [N, 64, BL]
        rT = res_T.reshape(N, 8, 8, mb_height, mb_width, 6)
        ry = rT[..., :4].reshape(
            N, 8, 8, mb_height, mb_width, 2, 2) \
            .transpose(0, 3, 5, 1, 4, 6, 2).reshape(N, H, W)
        ru = rT[..., 4].transpose(0, 3, 1, 4, 2) \
            .reshape(N, H // 2, W // 2)
        rv = rT[..., 5].transpose(0, 3, 1, 4, 2) \
            .reshape(N, H // 2, W // 2)
    else:
        levels = coeffs.astype(jnp.int32).reshape(N, mb_count, 6, 64)
        intra_blk = jnp.broadcast_to(intra_mb[:, :, None],
                                     (N, mb_count, 6))
        qs_blk = jnp.broadcast_to(
            ((recs >> 2) & 31)[:, :, None], (N, mb_count, 6))
        qmat = jnp.where(intra_blk[..., None],
                         intra_q[:, None, None, :],
                         non_intra_q[:, None, None, :])
        if use_pallas_idct:
            from espflix_tpu.ops.idct_pallas import \
                block_residuals_pallas
            res = block_residuals_pallas(
                levels, intra_blk, qs_blk, qmat,
                nfinal.reshape(N, mb_count, 6))          # [N,MB,6,8,8]
            res = res.reshape(N, mb_count, 6, 64)
        else:
            res = idct_ops.block_residuals_flat(
                levels, intra_blk, qs_blk, qmat,
                nfinal.reshape(N, mb_count, 6))          # [N,MB,6,64]
        res = res.astype(jnp.int16)

        # ---- assemble residual planes (flat layout: each plane row
        # is a contiguous [2, 8] / [8] lane slice per MB, so assembly
        # is slices + one stack instead of a 7-D transpose)
        res = res.reshape(N, mb_height, mb_width, 6, 64)
        yrows = []
        for a in range(2):
            for r in range(8):
                s = res[:, :, :, 2 * a:2 * a + 2, 8 * r:8 * r + 8]
                yrows.append(s.reshape(N, mb_height, W))
        ry = jnp.stack(yrows, axis=2).reshape(N, H, W)
        ru = jnp.stack([res[:, :, :, 4, 8 * r:8 * r + 8]
                        .reshape(N, mb_height, W // 2)
                        for r in range(8)], axis=2) \
            .reshape(N, H // 2, W // 2)
        rv = jnp.stack([res[:, :, :, 5, 8 * r:8 * r + 8]
                        .reshape(N, mb_height, W // 2)
                        for r in range(8)], axis=2) \
            .reshape(N, H // 2, W // 2)

    # ---- compose by MB kind (int16 active chain; MB masks expand by
    # broadcast-reshape, never a materialized int32 [N,H,W] kind map)
    def compose(cur, pred, resid, kind_mb, reps):
        mh, mw = kind_mb.shape[1], kind_mb.shape[2]

        def up(m):                       # bool[N,mbh,mbw] -> [N,H,W]
            return jnp.broadcast_to(
                m[:, :, None, :, None],
                (N, mh, reps, mw, reps)).reshape(
                    N, mh * reps, mw * reps)

        stale = up(kind_mb == vlc_scan.MB_STALE)
        intra = up(kind_mb == vlc_scan.MB_INTRA)
        p = pred.astype(jnp.int16)
        out = jnp.where(intra, _pin(resid), _pin(p + resid))
        return jnp.where(stale, cur, out.astype(jnp.uint8))

    if pred_y is None:       # use_pallas_mocomp == "fused2"
        from espflix_tpu.ops.mocomp_pallas import compose_plane_pallas2
        interp = jax.default_backend() != "tpu"
        new_y = compose_plane_pallas2(
            ref_y, cur_y, ry, kind, mv_h, mv_v, active, 16,
            interpret=interp)
        new_u = compose_plane_pallas2(
            ref_u, cur_u, ru, kind, mv_h >> 1, mv_v >> 1, active, 8,
            interpret=interp)
        new_v = compose_plane_pallas2(
            ref_v, cur_v, rv, kind, mv_h >> 1, mv_v >> 1, active, 8,
            interpret=interp)
    else:
        new_y = compose(cur_y, pred_y, ry, kind, 16)
        new_u = compose(cur_u, pred_u, ru, kind, 8)
        new_v = compose(cur_v, pred_v, rv, kind, 8)

    live = active  # errored lanes keep partial decode (reference behavior)

    def put(planes, new, cur, parity):
        # scatter each lane's new plane into ITS parity slot: one
        # [N,H,W] write instead of a where over both buffers (which
        # rewrote 2x the plane bytes every tick)
        upd = jnp.where(live[:, None, None], new, cur)
        return planes.at[jnp.arange(planes.shape[0]), parity].set(upd)

    new_frames = dict(
        y=put(frames["y"], new_y, cur_y, parity),
        u=put(frames["u"], new_u, cur_u, parity),
        v=put(frames["v"], new_v, cur_v, parity),
        parity=jnp.where(live, 1 - parity, parity),
    )
    presented = dict(
        y=jnp.where(live[:, None, None], new_y, cur_y),
        u=jnp.where(live[:, None, None], new_u, cur_u),
        v=jnp.where(live[:, None, None], new_v, cur_v),
    )
    return new_frames, presented


dense_compose_jit = functools.partial(
    jax.jit, static_argnames=("mb_width", "mb_height",
                              "use_pallas_idct",
                              "use_pallas_mocomp"))(dense_compose)

decode_picture_batch = functools.partial(
    jax.jit, static_argnames=("mb_width", "mb_height", "max_steps",
                              "use_pallas_idct", "slice_parallel",
                              "peek", "max_symbols"))(decode_picture_impl)


@functools.partial(
    jax.jit, static_argnames=("mb_width", "mb_height", "max_steps",
                              "out_groups", "block_rows",
                              "use_pallas_idct", "interpret"))
def _decode_sliced_impl(words, start_bits, rows, alive, pic_type,
                        full_pel, r_size, intra_q, non_intra_q, active,
                        frames, *, mb_width: int, mb_height: int,
                        max_steps: int, out_groups: int,
                        block_rows: int = 1024, use_pallas_idct=None,
                        interpret: bool = False):
    from espflix_tpu.ops import vlc_scan_pallas as VP
    coeffs, recs, nfinal, err, iters = VP.run_scan_pallas_sliced(
        words, start_bits, rows, alive, pic_type, full_pel, r_size,
        mb_width=mb_width, mb_count=mb_width * mb_height,
        max_steps=max_steps, out_groups=out_groups,
        block_rows=block_rows, interpret=interpret)
    new_frames, presented = dense_compose(
        coeffs, recs, nfinal, intra_q, non_intra_q, active, frames,
        mb_width=mb_width, mb_height=mb_height,
        use_pallas_idct=use_pallas_idct)
    N = recs.shape[0]
    ok = active & ~err
    info = dict(error=err, ok=ok, iters=jnp.broadcast_to(iters, (N,)))
    return new_frames, presented, info


def _quantize_pow2(x: int, lo: int, hi: int) -> int:
    """Round x up to a power of two, clamped to [lo, hi] (bounds the
    number of distinct jit shapes the bucketed scan sees)."""
    p = lo
    while p < x and p < hi:
        p *= 2
    return min(max(p, lo), hi)


def decode_picture_batch_sliced(batch: dict, frames, *, mb_width: int,
                                mb_height: int, max_steps: int = 2048,
                                steps_short: int = 512,
                                block_rows: int = 1024,
                                use_pallas_idct=None,
                                scatter: str = "matmul",
                                interpret: bool = False):
    """Decode via the slice-parallel Pallas scan kernel.

    Takes a make_picture_batch dict (host side packs per-slice word
    windows -- vlc_scan_pallas.pack_slice_rows); same outputs as
    decode_picture_batch, bit-exact.  Lanes whose slice span overflows
    the window are reported as errors (callers resync them like any
    corrupt lane).

    Rows are span-sorted and scanned in TWO symbol-budget buckets (the
    post-scan scatter is linear in rows x budget): rows whose bit span
    fits `steps_short` take the short budget -- safe, since one symbol
    consumes >= 1 bit -- and the rest (I slices, mostly) take
    `max_steps`.  The split point is quantized to powers of two so the
    jit cache stays small."""
    from espflix_tpu.ops import vlc_scan_pallas as VP
    sl = VP.pack_slice_rows(batch, sort_rows=True)
    NS = sl["span"].shape[0]
    need_long = int((sl["span"] * 32 > steps_short).sum())
    long_rows = _quantize_pow2(max(need_long, 1), 8, max(NS - 8, 8))
    if need_long > NS - 8 or NS < 16:
        # degenerate geometry (tiny fleets / mostly-long rows): uniform
        # budget path over unsorted rows
        sl = VP.pack_slice_rows(batch)
        new_frames, presented, info = _decode_sliced_impl(
            jnp.asarray(sl["words"]), jnp.asarray(sl["start_bits"]),
            jnp.asarray(sl["rows"]), jnp.asarray(sl["alive"]),
            jnp.asarray(sl["pic_type"]), jnp.asarray(sl["full_pel"]),
            jnp.asarray(sl["r_size"]), jnp.asarray(batch["intra_q"]),
            jnp.asarray(batch["non_intra_q"]),
            jnp.asarray(batch["active"]),
            frames, mb_width=mb_width, mb_height=mb_height,
            max_steps=max_steps, out_groups=sl["out_groups"],
            block_rows=block_rows, use_pallas_idct=use_pallas_idct,
            interpret=interpret)
    else:
        if scatter == "matmul":
            from espflix_tpu.ops import scan_dense as SD
            n_lanes = len(batch["active"])
            perm, dup = SD.row_perm(sl["lane_of_row"], sl["rows"],
                                    sl["alive"], n_lanes, mb_height)
            coeffs, recs, nfinal, err, iters = \
                VP.run_scan_pallas_bucketed_dense(
                    jnp.asarray(sl["words"]),
                    jnp.asarray(sl["start_bits"]),
                    jnp.asarray(sl["rows"]), jnp.asarray(sl["alive"]),
                    jnp.asarray(sl["pic_type"]),
                    jnp.asarray(sl["full_pel"]),
                    jnp.asarray(sl["r_size"]),
                    jnp.asarray(sl["lane_of_row"]), jnp.asarray(perm),
                    mb_width=mb_width, mb_height=mb_height,
                    n_lanes=n_lanes, long_rows=long_rows,
                    steps_long=max_steps, steps_short=steps_short,
                    chunk=128, block_rows=block_rows,
                    interpret=interpret, transposed=True)
            coeffs_T, coeffs = coeffs, None
            if dup.any():
                err = err | jnp.asarray(dup)
        else:
            coeffs, recs, nfinal, err, iters = \
                VP.run_scan_pallas_bucketed(
                    jnp.asarray(sl["words"]),
                    jnp.asarray(sl["start_bits"]),
                    jnp.asarray(sl["rows"]), jnp.asarray(sl["alive"]),
                    jnp.asarray(sl["pic_type"]),
                    jnp.asarray(sl["full_pel"]),
                    jnp.asarray(sl["r_size"]),
                    jnp.asarray(sl["lane_of_row"]),
                    mb_width=mb_width, mb_count=mb_width * mb_height,
                    n_lanes=len(batch["active"]), long_rows=long_rows,
                    steps_long=max_steps, steps_short=steps_short,
                    chunk=128, block_rows=block_rows,
                    interpret=interpret)
            coeffs_T = None
        new_frames, presented = dense_compose(
            coeffs, recs, nfinal, jnp.asarray(batch["intra_q"]),
            jnp.asarray(batch["non_intra_q"]),
            jnp.asarray(batch["active"]), frames,
            mb_width=mb_width, mb_height=mb_height,
            use_pallas_idct=use_pallas_idct, coeffs_T=coeffs_T)
        act = jnp.asarray(batch["active"])
        info = dict(error=err, ok=act & ~err,
                    iters=jnp.broadcast_to(iters, (len(batch["active"]),)))
    if sl["overflow"].any():
        ov = jnp.asarray(sl["overflow"])
        info = dict(error=info["error"] | ov, ok=info["ok"] & ~ov,
                    iters=info["iters"])
    return new_frames, presented, info


# ---------------------------------------------------------------------------
# Native tokenizer fast path (hybrid pipeline): C++ entropy decode ->
# device dense phase.  Same buffers, same dense_compose, bit-exact.
# ---------------------------------------------------------------------------

def tokenize_batch_native(pictures: list, mb_width: int, mb_height: int):
    """Entropy-decode one picture per lane with the native tokenizer
    (oracle/mpeg1_oracle.cpp mpeg1_tokenize_picture).

    Returns numpy (coeffs int16[N, MB*384], recs int32[N, MB],
    nfinal int32[N, MB*6], active bool[N], errors bool[N])."""
    import ctypes

    from espflix_tpu.tools import oracle as _oracle

    L = _oracle.lib()
    if not hasattr(L, "_tok_ready"):
        L.mpeg1_tokenize_picture.restype = ctypes.c_int
        L.mpeg1_tokenize_picture.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
        L._tok_ready = True

    N = len(pictures)
    mb_count = mb_width * mb_height
    coeffs = np.zeros((N, mb_count * 384), np.int16)
    recs = np.zeros((N, mb_count), np.int32)
    nfinal = np.zeros((N, mb_count * 6), np.uint8)
    active = np.zeros(N, bool)
    errors = np.zeros(N, bool)
    for i, p in enumerate(pictures):
        if p is None or not p.slice_offsets:
            continue
        active[i] = True
        offs = np.asarray(p.slice_offsets, np.int64)
        rows = np.asarray(p.slice_rows, np.int32)
        rc = L.mpeg1_tokenize_picture(
            p.payload, len(p.payload),
            offs.ctypes.data, rows.ctypes.data, len(offs),
            mb_width, mb_height, p.pic_type, p.full_pel,
            max(p.r_size, 0),
            coeffs[i].ctypes.data, recs[i].ctypes.data,
            nfinal[i].ctypes.data)
        errors[i] = rc != 0
    return coeffs, recs, nfinal.astype(np.int32), active, errors


DEFAULT_MAX_EMIT = 16384  # covers >5x the 1.5Mb/s I-frame symbol budget


def tokenize_batch_compact(pictures: list, mb_width: int, mb_height: int,
                           max_emit: int = DEFAULT_MAX_EMIT):
    """Compact native tokenize: coefficient emissions as packed
    (pos<<12 | level) int32 words -- ~4x less host->device transfer
    than the dense buffer.  Returns numpy (emit int32[N, max_emit],
    n_emit int32[N], recs, nfinal, active, errors)."""
    import ctypes

    from espflix_tpu.tools import oracle as _oracle

    L = _oracle.lib()
    if not hasattr(L, "_tokc_ready"):
        L.mpeg1_tokenize_picture_compact.restype = ctypes.c_int
        L.mpeg1_tokenize_picture_compact.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
            ctypes.c_void_p]
        L._tokc_ready = True

    N = len(pictures)
    mb_count = mb_width * mb_height
    emit = np.zeros((N, max_emit), np.int32)
    n_emit = np.zeros(N, np.int32)
    recs = np.zeros((N, mb_count), np.int32)
    nfinal = np.zeros((N, mb_count * 6), np.uint8)
    active = np.zeros(N, bool)
    errors = np.zeros(N, bool)
    for i, p in enumerate(pictures):
        if p is None or not p.slice_offsets:
            continue
        active[i] = True
        offs = np.asarray(p.slice_offsets, np.int64)
        rows = np.asarray(p.slice_rows, np.int32)
        rc = L.mpeg1_tokenize_picture_compact(
            p.payload, len(p.payload),
            offs.ctypes.data, rows.ctypes.data, len(offs),
            mb_width, mb_height, p.pic_type, p.full_pel,
            max(p.r_size, 0),
            emit[i].ctypes.data, max_emit, recs[i].ctypes.data,
            nfinal[i].ctypes.data)
        if rc < 0:
            errors[i] = True
        else:
            n_emit[i] = rc
    return emit, n_emit, recs, nfinal.astype(np.int32), active, errors


def unpack_emissions(emit, n_emit, mb_count: int):
    """Device-side: packed emissions -> dense int16 coeff buffer with
    one bulk batched scatter.  Padding entries land in a trash slot."""
    N, E = emit.shape
    C = mb_count * 384
    pos = (emit >> 12) & 0x1FFFF
    val = emit & 0xFFF
    val = jnp.where(val >= 0x800, val - 0x1000, val)
    k = jnp.arange(E, dtype=jnp.int32)[None, :]
    pos = jnp.where(k < n_emit[:, None], pos, C)
    buf = jnp.zeros((N, C + 1), jnp.int16)
    buf = jnp.put_along_axis(buf, pos, val.astype(jnp.int16), axis=1,
                             inplace=False)
    return buf[:, :C]


@functools.partial(jax.jit, static_argnames=("mb_width", "mb_height"))
def _dense_from_emissions(emit, n_emit, recs, nfinal, intra_q,
                          non_intra_q, active, frames, *,
                          mb_width: int, mb_height: int):
    coeffs = unpack_emissions(emit, n_emit, mb_width * mb_height)
    return dense_compose(coeffs, recs, nfinal, intra_q, non_intra_q,
                         active, frames, mb_width=mb_width,
                         mb_height=mb_height)


def decode_picture_batch_hybrid(pictures: list, intra_q, non_intra_q,
                                frames, *, mb_width: int, mb_height: int,
                                compact: bool = True):
    """Hybrid decode step: native entropy decode on the host feeding the
    jitted device dense phase.  Returns (new_frames, presented, info)."""
    if compact:
        emit, n_emit, recs, nfinal, active, errors = \
            tokenize_batch_compact(pictures, mb_width, mb_height)
        new_frames, presented = _dense_from_emissions(
            jnp.asarray(emit), jnp.asarray(n_emit), jnp.asarray(recs),
            jnp.asarray(nfinal), jnp.asarray(intra_q),
            jnp.asarray(non_intra_q), jnp.asarray(active), frames,
            mb_width=mb_width, mb_height=mb_height)
    else:
        coeffs, recs, nfinal, active, errors = tokenize_batch_native(
            pictures, mb_width, mb_height)
        new_frames, presented = dense_compose_jit(
            jnp.asarray(coeffs), jnp.asarray(recs), jnp.asarray(nfinal),
            jnp.asarray(intra_q), jnp.asarray(non_intra_q),
            jnp.asarray(active), frames,
            mb_width=mb_width, mb_height=mb_height)
    info = dict(error=jnp.asarray(errors),
                ok=jnp.asarray(active & ~errors),
                iters=jnp.zeros(len(pictures), jnp.int32))
    return new_frames, presented, info


# ---------------------------------------------------------------------------
# Convenience: full-ES batched decode (testing / small jobs)
# ---------------------------------------------------------------------------

def decode_es_batched(streams: list[bytes], words_per_lane=None,
                      max_steps=None, check_errors: bool = True):
    """Decode N elementary streams in lock-step; returns per-lane frame
    lists.  Streams must share dimensions; lanes shorter than the longest
    stream are starved (present their last frame).

    This is the validation/offline path: the symbol budget is set to the
    payload's bit count (a hard upper bound -- every symbol consumes at
    least one bit) so no picture can be silently truncated by the
    serving runtime's bounded budget, and lane errors raise unless
    check_errors=False."""
    parsed = [parse_es(s) for s in streams]
    seq = parsed[0][0]
    for sq, _ in parsed:
        assert (sq.width, sq.height) == (seq.width, seq.height)
    npics = max(len(p) for _, p in parsed)
    N = len(streams)
    frames = init_frame_state(N, seq.mb_width * 16, seq.mb_height * 16)
    outs = [[] for _ in range(N)]
    # uniform shapes across the whole run -> one XLA compilation
    all_pics = [p for _, ps in parsed for p in ps]
    if words_per_lane is None:
        words_per_lane = max(
            (len(p.payload) + 3) // 4 + 4 for p in all_pics)
    uniform_slices = max(
        max((len(p.slice_offsets) for p in all_pics), default=1), 1)
    for k in range(npics):
        batch_pics = [p[k] if k < len(p) else None for _, p in parsed]
        b = make_picture_batch(batch_pics, words_per_lane=words_per_lane,
                               max_slices=uniform_slices)
        ms = max_steps or b["words"].shape[1] * 32
        frames, presented, info = decode_picture_batch(
            jnp.asarray(b["words"]), jnp.asarray(b["slice_starts"]),
            jnp.asarray(b["slice_rows"]), jnp.asarray(b["n_slices"]),
            jnp.asarray(b["pic_type"]), jnp.asarray(b["full_pel"]),
            jnp.asarray(b["r_size"]), jnp.asarray(b["intra_q"]),
            jnp.asarray(b["non_intra_q"]), jnp.asarray(b["active"]),
            frames, mb_width=b["mb_width"], mb_height=b["mb_height"],
            max_steps=int(ms), max_symbols=int(ms))
        if check_errors:
            bad = np.asarray(info["error"]) & np.asarray(b["active"])
            if bad.any():
                raise ValueError(
                    f"picture {k}: lane decode errors at {np.nonzero(bad)[0]}")
        py = np.asarray(presented["y"])
        pu = np.asarray(presented["u"])
        pv = np.asarray(presented["v"])
        for i in range(N):
            if batch_pics[i] is not None:
                outs[i].append((py[i], pu[i], pv[i]))
    return outs

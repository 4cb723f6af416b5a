"""Matmul scatter: emission logs -> dense decode buffers on the MXU.

The FSM scan (ops/vlc_scan*.py) emits one (flat_index, value) pair per
lane per step into a [T, NS] log; the dense phase wants lane-major
dense buffers (coeffs [N, MB*384], recs [N, MB], nfinal [N, MB*6]).
Round 2 built them with one bulk XLA scatter -- which lowers to a
serial per-element loop on TPU (~7 ns/slot) and at ~6M log slots was
~40 ms of the 123 ms tick, the single largest stage (docs/PERF.md).

This module replaces the scatter with dense MXU algebra.  Key fact:
each scan row is ONE SLICE, and a slice owns one macroblock row
(mb_width MBs -- the reference's first-MB quirk pins slices to their
row, player.cpp:1266 via vlc_scan's eff_inc==1).  So each row's
emissions target a SMALL dense window (mb_width * (6*64 coeff + rec +
6 nfinal) slots), and a scatter into a small window factorizes into
two one-hot contractions:

    out[tile, pos] = sum_t  [tile == tile_t] * [pos == pos_t] * val_t
                   = M @ P,   M[tile,t] 0/1,  P[t,pos] = onehot*val

with tile = local_mb*6+blk (coeffs) or local_mb (rec/nfinal aux) and
pos = coefficient position 0..63 (coeffs) or a slot in an 8-wide aux
row.  Both matmuls run on the MXU; f32 with HIGHEST precision is
EXACT here (0/1 splits exactly into bf16 passes; values stay under
2^17 per channel -- rec's packed 31-bit word rides as lo/hi 16-bit
halves).  Per-row outputs then land in lane-major order with ONE
row-permutation gather (the permutation is known on the host from
pack_slice_rows' sort order).

Row targets are unique on well-formed streams (coefficient positions
within a block are distinct zigzag slots; one record per MB; one
nfinal per coded block), so the sum reproduces the scatter's last-
write-wins exactly.  Emissions OUTSIDE a row's window (slices that
legally walk past their MB row, or corrupt address runs) are dropped
and flag the lane's error, which callers already treat as
resync-the-lane (same containment as a budget overflow).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def row_perm(lane_of_row: np.ndarray, rows: np.ndarray,
             alive: np.ndarray, n_lanes: int, mb_height: int):
    """Host-side: (lane, mb_row) -> scan-row index permutation.

    Returns (perm int32[n_lanes*mb_height], dup bool[n_lanes]): perm
    maps each lane's MB row to the scan row that decodes it, or to
    NS (a guaranteed-zero pad row appended by the caller) when no scan
    row covers it.  dup flags lanes where two alive scan rows claim
    the same MB row (outside the supported profile; the lane errors).
    """
    NS = len(lane_of_row)
    perm = np.full(n_lanes * mb_height, NS, np.int32)
    dup = np.zeros(n_lanes, bool)
    r = np.asarray(rows)
    l = np.asarray(lane_of_row)
    a = np.asarray(alive).astype(bool)
    ok = a & (r >= 0) & (r < mb_height)
    slots = l[ok].astype(np.int64) * mb_height + r[ok]
    idxs = np.nonzero(ok)[0].astype(np.int32)
    # first claim wins; any further claim on a slot flags its lane
    # (two slices covering one MB row is outside the supported
    # profile -- the reference's first-MB quirk garbles it too)
    uniq, first, counts = np.unique(slots, return_index=True,
                                    return_counts=True)
    perm[uniq] = idxs[first]
    if (counts > 1).any():
        dup[(uniq[counts > 1] // mb_height).astype(np.int64)] = True
    return perm, dup


def pack_slice_rows_sharded(batch: dict, n_shards: int,
                            mb_height: int,
                            device_windows: bool = False):
    """Host-side packing for the shard_map'ed Pallas parser.

    Splits the lane axis into n_shards contiguous groups, span-sorts
    each group's slice rows INDEPENDENTLY (so every shard's row block
    is self-contained: local lane_of_row, local row permutation), and
    concatenates along axis 0.  With every row array sharded
    P('streams') on axis 0, each shard scans exactly its own lanes'
    rows -- zero data-path ICI, same as the XLA parser.

    device_windows=True ships per-LANE words ('lane_words' [N, Wm],
    shard-local 'row_base', static 'win') instead of the pre-built
    [NS, Wp] row windows, for on-device window gathering
    (vlc_scan_pallas.gather_scan_rows) -- ~12x fewer host->device
    bytes, same as the unsharded packer.

    Returns (sl dict with concatenated row arrays + 'perm', dup
    bool[N]).
    """
    from espflix_tpu.ops import vlc_scan_pallas as VP
    N = len(batch["active"])
    assert N % n_shards == 0
    ln = N // n_shards
    parts = []
    perms = []
    dups = []
    keys = (("lane_words", "row_base") if device_windows
            else ("words",)) + (
        "start_bits", "rows", "alive", "pic_type",
        "full_pel", "r_size", "lane_of_row")
    for s in range(n_shards):
        sub = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.ndim >= 1 and \
                    len(v) == N:
                sub[k] = v[s * ln:(s + 1) * ln]
            else:
                sub[k] = v
        sl = VP.pack_slice_rows(sub, sort_rows=True,
                                device_windows=device_windows)
        perm, dup = row_perm(sl["lane_of_row"], sl["rows"],
                             sl["alive"], ln, mb_height)
        parts.append(sl)
        perms.append(perm)
        dups.append(dup)
    wk = "lane_words" if device_windows else "words"
    Wp = max(p[wk].shape[1] for p in parts)
    for p in parts:
        w = p[wk]
        if w.shape[1] < Wp:
            p[wk] = np.pad(w, ((0, 0), (0, Wp - w.shape[1])))
    out = {k: np.concatenate([p[k] for p in parts]) for k in keys}
    out["perm"] = np.concatenate(perms)
    out["overflow"] = np.concatenate([p["overflow"] for p in parts])
    if device_windows:
        # the on-device gather window must be uniform across shards
        out["win"] = max(p["win"] for p in parts)
    out["ns_local"] = parts[0]["start_bits"].shape[0]  # rows per shard
    return out, np.concatenate(dups)


def _decode_slots(liT, rowbase_mb, mb_width: int, mb_count: int):
    """Elementwise decode of flat log indices -> (row-local tile ids,
    positions, masks).  liT [R, T] int32; rowbase_mb [R] int32."""
    MB6 = mb_count * 6
    base_c = mb_count + MB6
    TRASH = base_c + mb_count * 384
    rb = rowbase_mb[:, None]

    is_coef = (liT >= base_c) & (liT < TRASH)
    idx2 = liT - base_c
    mbg = idx2 // 384
    r384 = idx2 - mbg * 384
    mbl = mbg - rb
    tile_c = mbl * 6 + (r384 >> 6)
    ok_c = is_coef & (mbl >= 0) & (mbl < mb_width)
    pos_c = r384 & 63

    is_nfin = (liT >= mb_count) & (liT < base_c)
    idxn = liT - mb_count
    mbn = idxn // 6
    slot_n = idxn - mbn * 6
    mbln = mbn - rb
    ok_n = is_nfin & (mbln >= 0) & (mbln < mb_width)

    is_rec = (liT >= 0) & (liT < mb_count)
    mblr = liT - rb
    ok_r = is_rec & (mblr >= 0) & (mblr < mb_width)

    tile_a = jnp.where(is_rec, mblr, mbln)
    ok_a = ok_r | ok_n
    real = liT < TRASH
    dropped = real & ~(ok_c | ok_a)
    return (tile_c, pos_c, ok_c, tile_a, slot_n, ok_r, ok_n, ok_a,
            dropped)


def log_to_dense_rows(log_idx, log_val, rowbase_mb, *, mb_width: int,
                      mb_count: int, transposed: bool = False):
    """[T, R] logs -> per-row dense windows via two one-hot matmuls.

    Returns (coef_rows int16[R, mb_width*6*64],
             aux_rows int32[R, mb_width, 8],  (cols 0-5 nfinal,
                                               col 6 rec lo, 7 rec hi)
             dropped bool[R]).

    transposed=True emits coef_rows as int16[R, 64, mb_width*6]
    instead (position axis leading): the dense phase's vreg-friendly
    orientation (ops/idct.py block_residuals_T), produced for free by
    swapping the contraction operands.
    """
    liT = log_idx.T
    lvT = log_val.T
    R, T = liT.shape
    TC = mb_width * 6

    (tile_c, pos_c, ok_c, tile_a, slot_n, ok_r, ok_n, ok_a,
     dropped) = _decode_slots(liT, rowbase_mb, mb_width, mb_count)

    # All contractions run as SINGLE-PASS bf16 matmuls with f32
    # accumulation, exact by 8-bit value splitting: the one-hot
    # operands are 0/1 (bf16-exact), every value rides as v = hi*256
    # + lo with |hi| <= 128 and lo in [0, 256) (ints <= 256 are
    # bf16-exact), and each output slot receives at most one emission
    # (unique targets), so no sum ever leaves the exact range.  This
    # replaces the round-3 f32 Precision.HIGHEST form: ~3x fewer MXU
    # passes and half the operand HBM traffic (the [R, TC, T] one-hot
    # is the biggest materialized operand of the tick).  An int8
    # 3-digit MXU form (s8 x s8 -> s32, 25% less operand traffic at 2x
    # MXU rate) measured WORSE on hardware (12.9 vs 10.0 ms at bench
    # shapes) -- XLA's s8 path loses more to layout/accumulation than
    # the traffic saves; recorded as a negative in docs/PERF.md.
    bf = jnp.bfloat16
    f = jnp.float32

    def dot(a, b, dims):
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=f)

    # ---- coefficient window: [R, TC, T] @ [R, T, 64] ----------------
    iota_tc = jnp.arange(TC, dtype=jnp.int32)
    Mc = ((tile_c[:, None, :] == iota_tc[None, :, None]) &
          ok_c[:, None, :]).astype(bf)
    iota64 = jnp.arange(64, dtype=jnp.int32)
    onehot_c = (pos_c[:, :, None] == iota64[None, None, :]) & \
        ok_c[:, :, None]
    v16 = lvT.astype(jnp.int16)
    vlo = (v16 & 255).astype(bf)
    vhi = (v16 >> 8).astype(bf)
    Pc_lo = jnp.where(onehot_c, vlo[:, :, None], bf(0))
    Pc_hi = jnp.where(onehot_c, vhi[:, :, None], bf(0))
    # (measured negative, round 5: concatenating lo|hi into ONE dot on
    # a 128-wide position axis -- to read Mc once instead of twice --
    # measured 20.1 vs 9.6 ms at bench shapes: the [R, T, 128] concat
    # materializes a third P-sized operand and the wider dot loses the
    # narrow-N layout; two dots stay.)
    if transposed:
        dims = (((1,), (2,)), ((0,), (0,)))
        out_c = dot(Pc_lo, Mc, dims) + 256.0 * dot(Pc_hi, Mc, dims)
        coef = out_c.astype(jnp.int32).astype(jnp.int16)  # [R,64,TC]
    else:
        dims = (((2,), (1,)), ((0,), (0,)))
        out_c = dot(Mc, Pc_lo, dims) + 256.0 * dot(Mc, Pc_hi, dims)
        coef = out_c.astype(jnp.int32).astype(jnp.int16) \
            .reshape(R, TC * 64)

    # ---- aux window: rec (four 8-bit quarters) + nfinal -------------
    iota_a = jnp.arange(mb_width, dtype=jnp.int32)
    Ma = ((tile_a[:, None, :] == iota_a[None, :, None]) &
          ok_a[:, None, :]).astype(bf)
    cols = []
    for s in range(6):
        # nfinal <= 64: bf16-exact directly
        cols.append(jnp.where(ok_n & (slot_n == s),
                              lvT.astype(bf), bf(0)))
    for sh in (0, 8, 16, 24):
        q = ((lvT >> sh) & 0xFF).astype(bf)
        cols.append(jnp.where(ok_r, q, bf(0)))
    Pa = jnp.stack(cols, axis=2)                      # [R, T, 10]
    out_a = dot(Ma, Pa, (((2,), (1,)), ((0,), (0,))))  # [R, mbw, 10]
    oi = out_a.astype(jnp.int32)
    rec = (oi[..., 6] | (oi[..., 7] << 8) | (oi[..., 8] << 16)
           | (oi[..., 9] << 24))
    aux = jnp.concatenate(
        [oi[..., :6], (rec & 0xFFFF)[..., None],
         ((rec >> 16) & 0x7FFF)[..., None]], axis=2)

    return coef, aux, dropped.any(axis=1)


def assemble_dense_T(coef_rows_T, aux_rows, perm, *, n_lanes: int,
                     mb_width: int, mb_height: int):
    """assemble_dense for transposed coef rows ([NS, 64, TC]):
    returns (coeffs_T int16[N, 64, mb_count*6], recs, nfinal)."""
    mb_count = mb_width * mb_height
    TC = mb_width * 6
    cz = jnp.zeros((1,) + coef_rows_T.shape[1:], coef_rows_T.dtype)
    az = jnp.zeros((1,) + aux_rows.shape[1:], aux_rows.dtype)
    coef_p = jnp.concatenate([coef_rows_T, cz], axis=0)
    aux_p = jnp.concatenate([aux_rows, az], axis=0)
    coeffs_T = jnp.take(coef_p, perm, axis=0) \
        .reshape(n_lanes, mb_height, 64, TC) \
        .transpose(0, 2, 1, 3) \
        .reshape(n_lanes, 64, mb_count * 6)
    aux = jnp.take(aux_p, perm, axis=0).reshape(
        n_lanes, mb_count, 8)
    recs = aux[:, :, 6] | (aux[:, :, 7] << 16)
    nfinal = aux[:, :, 0:6].reshape(n_lanes, mb_count * 6)
    return coeffs_T, recs, nfinal


def assemble_dense(coef_rows, aux_rows, perm, *, n_lanes: int,
                   mb_width: int, mb_height: int):
    """Per-row windows -> lane-major dense buffers via one gather.

    coef_rows [NS, mbw*384] int16 and aux_rows [NS, mbw, 8] int32 are
    in scan-row order; perm [n_lanes*mb_height] selects the scan row
    for each (lane, mb_row) slot, with NS meaning "no row" (a zero pad
    row is appended here).  Returns (coeffs, recs, nfinal) in the
    scatter path's exact layout.
    """
    mb_count = mb_width * mb_height
    cz = jnp.zeros((1,) + coef_rows.shape[1:], coef_rows.dtype)
    az = jnp.zeros((1,) + aux_rows.shape[1:], aux_rows.dtype)
    coef_p = jnp.concatenate([coef_rows, cz], axis=0)
    aux_p = jnp.concatenate([aux_rows, az], axis=0)
    coeffs = jnp.take(coef_p, perm, axis=0).reshape(
        n_lanes, mb_count * 384)
    aux = jnp.take(aux_p, perm, axis=0).reshape(
        n_lanes, mb_count, 8)
    recs = aux[:, :, 6] | (aux[:, :, 7] << 16)
    nfinal = aux[:, :, 0:6].reshape(n_lanes, mb_count * 6)
    return coeffs, recs, nfinal

"""Pallas TPU kernels: the FSM scan VMEM-resident.

The XLA while-loop scanner (ops/vlc_scan.run_scan) pays a fixed
~12.5us/iteration runtime overhead plus HBM round-trips for state and
window fetches -- ~47us/step at N=1024 on this runtime, making the scan
the dominant pipeline stage (docs/PERF.md).  These kernels run the SAME
step function (make_scan_step(layout="rows") -- shared code, so
bit-exactness is structural) inside Pallas where:

  * bitstream words live in VMEM transposed (W, N): the window peek is
    one-hot masked reductions over the sublane axis (TPU has no vector
    gather);
  * per-lane state is (1, N) int32 rows carried through a fori_loop;
  * emissions stage in a VMEM scratch chunk, DMA'd to the HBM log every
    `chunk` steps; all-DONE chunks skip the step math;
  * `run_scan_pallas`: whole-payload scan, one block (small payloads --
    words must fit VMEM);
  * `run_scan_pallas_sliced`: the production form.  Each SLICE scans as
    its own row over a words window REBASED to its slice start (slices
    are independent decode units, player.cpp:1239-1259), so the VMEM
    window stays small for arbitrarily large payloads AND the loop trip
    count drops to the longest slice.  A grid walks row groups; the
    bulk scatter merges each lane's slice rows (disjoint MB ranges).

Output format and the post-scan bulk scatter are identical to run_scan;
callers get bit-identical (coeffs, recs, nfinal, state).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from espflix_tpu.ops import vlc_scan as VS

# state rows, fixed order (bool error carried as int32)
STATE_KEYS = (
    "state", "bitpos", "slice_idx", "n_slices", "pic_type", "full_pel",
    "r_size", "mb_x", "mb_y", "qscale", "y_dc", "u_dc", "v_dc",
    "mv_h", "mv_v", "mb_type", "cbp", "blk", "n", "pending_skip",
    "inc_acc", "first_mb", "error",
)
K = len(STATE_KEYS)


PEEK_STRIP = 32     # words per strip in the windowed peek reduce
SUB = 8             # sublane rows: lane vectors are (SUB, NB // SUB)


def _make_kernel(mb_width, mb_count, W, n_chunks, chunk, NB, trash):
    consts = VS.scanner_constants()
    LN = NB // SUB          # minor (lane) extent of every state tile

    def peek_fn(words_ref, bitpos):
        """Strip-mined one-hot reduce straight off the VMEM ref.

        Loading the whole word window as a value would pin W*NB/8192
        vregs and thrash the spiller; reading PEEK_STRIP-row strips
        keeps the live set bounded (statically unrolled -- W/STRIP
        strips of a handful of vector ops each).  words_ref is
        (W, 1, SUB, LN); bitpos (SUB, LN)."""
        w_idx = bitpos >> 5
        off = (bitpos & 31).astype(jnp.uint32)
        z = jnp.zeros_like(bitpos)
        w0 = z
        w1 = z
        for k in range(0, W, PEEK_STRIP):
            rows = min(PEEK_STRIP, W - k)
            strip = jax.lax.bitcast_convert_type(
                words_ref[pl.ds(k, rows), 0], jnp.int32)
            iota = k + jax.lax.broadcasted_iota(
                jnp.int32, (rows, 1, 1), 0)
            w0 = w0 + jnp.where(iota == w_idx, strip, 0).sum(
                axis=0, dtype=jnp.int32)
            w1 = w1 + jnp.where(iota == w_idx + 1, strip, 0).sum(
                axis=0, dtype=jnp.int32)
        w0 = jax.lax.bitcast_convert_type(w0, jnp.uint32)
        w1 = jax.lax.bitcast_convert_type(w1, jnp.uint32)
        hi = (w0 << off)
        lo = jnp.where(off == 0, jnp.uint32(0),
                       w1 >> (jnp.uint32(32) - off))
        return hi | lo

    step = VS.make_scan_step(consts, mb_width, mb_count, W,
                             layout="rows8", peek_fn=peek_fn)

    def kernel(words_ref, state_ref, ss_ref, sr_ref,
               out_state_ref, li_ref, lv_ref, iters_ref,
               sc_i, sc_v, sem):
        g = pl.program_id(0)
        words = words_ref
        st = {k: state_ref[i, 0] for i, k in enumerate(STATE_KEYS)}
        st["slice_starts"] = ss_ref[:, 0]
        st["slice_rows"] = sr_ref[:, 0]

        # the loop carry keeps `error` as int32 (Mosaic cannot carry
        # i1 vectors through scf.for); it is a bool only inside the
        # step body
        def as_tuple(d):
            return tuple(d[k] for k in STATE_KEYS)

        def as_dict(t):
            d = dict(zip(STATE_KEYS, t))
            d["error"] = d["error"] != 0
            d["slice_starts"] = ss_ref[:, 0]
            d["slice_rows"] = sr_ref[:, 0]
            return d

        def one_step(j, carry):
            stt, iters = carry
            std = as_dict(stt)
            active = jnp.any(std["state"] != VS.ST_DONE)
            (_, new), (i1, v1) = step((words, std))
            new["error"] = new["error"].astype(jnp.int32)
            sc_i[pl.ds(j, 1), :, :] = i1[None]
            sc_v[pl.ds(j, 1), :, :] = v1[None]
            return (as_tuple(new),
                    iters + jnp.where(active, 1, 0).astype(jnp.int32))

        def chunk_body(ci, carry):
            stt, iters = carry
            all_done = jnp.all(stt[0] == VS.ST_DONE)

            def run(args):
                return jax.lax.fori_loop(0, chunk, one_step, args)

            def skip(args):
                sc_i[...] = jnp.full((chunk, SUB, LN), trash, jnp.int32)
                sc_v[...] = jnp.zeros((chunk, SUB, LN), jnp.int32)
                return args

            stt, iters = jax.lax.cond(all_done, skip, run, (stt, iters))
            # write this block's stripe of the (T, G, SUB, LN) log --
            # which flattens to the row-major [T, N] layout for free
            cp_i = pltpu.make_async_copy(
                sc_i, li_ref.at[pl.ds(ci * chunk, chunk), g], sem)
            cp_i.start()
            cp_i.wait()
            cp_v = pltpu.make_async_copy(
                sc_v, lv_ref.at[pl.ds(ci * chunk, chunk), g], sem)
            cp_v.start()
            cp_v.wait()
            return (stt, iters)

        stt, iters = jax.lax.fori_loop(
            0, n_chunks, chunk_body, (as_tuple(st), jnp.int32(0)))

        final = dict(zip(STATE_KEYS, stt))
        for i, k in enumerate(STATE_KEYS):
            out_state_ref[i, 0] = final[k]
        iters_ref[0, g] = iters

    return kernel


def _launch(words_t, packed, ss, sr, *, mb_width, mb_count, max_steps,
            chunk, NB, interpret):
    """words_t (Wp, N) uint32; packed (K, N); ss/sr (S, N).  Grid over
    N // NB row groups; inside a block every lane vector is an
    (8, NB/8) tile (one vreg at NB=1024).  Returns (out_state [K,N],
    log_idx [T,N], log_val [T,N], iters [G])."""
    Wp, N = words_t.shape
    G = N // NB
    LN = NB // SUB
    n_chunks = -(-max_steps // chunk)
    T = n_chunks * chunk
    S = ss.shape[0]

    MB6 = mb_count * 6
    TRASH = mb_count + MB6 + mb_count * 384

    kernel = _make_kernel(mb_width, mb_count, Wp, n_chunks, chunk, NB,
                          TRASH)
    # (X, N) -> (X, G, SUB, LN): pure reshape, same memory layout
    words4 = words_t.reshape(Wp, G, SUB, LN)
    packed4 = packed.reshape(K, G, SUB, LN)
    ss4 = ss.reshape(S, G, SUB, LN)
    sr4 = sr.reshape(S, G, SUB, LN)
    grid = (G,)
    out_state, log_idx, log_val, iters = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Wp, 1, SUB, LN), lambda g: (0, g, 0, 0)),
            pl.BlockSpec((K, 1, SUB, LN), lambda g: (0, g, 0, 0)),
            pl.BlockSpec((S, 1, SUB, LN), lambda g: (0, g, 0, 0)),
            pl.BlockSpec((S, 1, SUB, LN), lambda g: (0, g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((K, 1, SUB, LN), lambda g: (0, g, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K, G, SUB, LN), jnp.int32),
            jax.ShapeDtypeStruct((T, G, SUB, LN), jnp.int32),
            jax.ShapeDtypeStruct((T, G, SUB, LN), jnp.int32),
            jax.ShapeDtypeStruct((1, G), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((chunk, SUB, LN), jnp.int32),
            pltpu.VMEM((chunk, SUB, LN), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(words4, packed4, ss4, sr4)
    return (out_state.reshape(K, N), log_idx.reshape(T, N),
            log_val.reshape(T, N), iters[0])


def _scatter(log_idx, log_val, mb_count, out_groups=1):
    T, N = log_idx.shape
    MB6 = mb_count * 6
    C_TOTAL = mb_count + MB6 + mb_count * 384
    Gr = N // out_groups
    idx = log_idx.T.reshape(Gr, out_groups * T)
    val = log_val.T.reshape(Gr, out_groups * T)
    buf = jnp.zeros((Gr, C_TOTAL + 1), jnp.int32)
    buf = jnp.put_along_axis(buf, idx, val, axis=1, inplace=False)
    recs = buf[:, :mb_count]
    nfinal = buf[:, mb_count:mb_count + MB6]
    coeffs = buf[:, mb_count + MB6:C_TOTAL].astype(jnp.int16)
    return coeffs, recs, nfinal


@functools.partial(
    jax.jit, static_argnames=("mb_width", "mb_count", "max_steps",
                              "chunk", "interpret"))
def run_scan_pallas(words, init_state, mb_width: int, mb_count: int,
                    max_steps: int, chunk: int = 256,
                    interpret: bool = False):
    """Drop-in for vlc_scan.run_scan (sequential-slice form, one grid
    block -- words must fit VMEM: N * W * 4 plus temps under ~8MB).

    words uint32[N, W]; init_state from vlc_scan.initial_state.
    N must be a multiple of 128 (pad with n_slices==0 lanes)."""
    N, W = words.shape
    assert N % 128 == 0, "pad lanes to a multiple of 128"
    Wp = -(-W // 8) * 8
    max_steps = min(max_steps, 20000)
    # the launch needs NB a multiple of SUB*128 (see _row_geometry);
    # pad small batches with dead (ST_DONE) lanes
    NP = -(-N // (SUB * 128)) * (SUB * 128)

    st = dict(init_state)
    st["error"] = st["error"].astype(jnp.int32)
    packed = jnp.stack([st[k].astype(jnp.int32) for k in STATE_KEYS])
    if NP != N:
        pad = NP - N
        # zero padding parks the extra lanes: ST_DONE == 0
        packed = jnp.pad(packed, ((0, 0), (0, pad)))
        words = jnp.pad(words, ((0, pad), (0, 0)))
        st["slice_starts"] = jnp.pad(st["slice_starts"],
                                     ((0, pad), (0, 0)))
        st["slice_rows"] = jnp.pad(st["slice_rows"],
                                   ((0, pad), (0, 0)))
    words_t = jnp.pad(words, ((0, 0), (0, Wp - W))).T
    ss = st["slice_starts"].T.astype(jnp.int32)
    sr = st["slice_rows"].T.astype(jnp.int32)

    out_state, log_idx, log_val, iters = _launch(
        words_t, packed, ss, sr, mb_width=mb_width, mb_count=mb_count,
        max_steps=max_steps, chunk=chunk, NB=NP, interpret=interpret)
    out_state = out_state[:, :N]
    log_idx, log_val = log_idx[:, :N], log_val[:, :N]
    coeffs, recs, nfinal = _scatter(log_idx, log_val, mb_count)
    fin = {k: out_state[i] for i, k in enumerate(STATE_KEYS)}
    fin["error"] = fin["error"] != 0
    return coeffs, recs, nfinal, fin, jnp.max(iters)


# ---------------------------------------------------------------------------
# slice-parallel form (production)
# ---------------------------------------------------------------------------

def _row_geometry(NS, block_rows):
    """Kernel row-group geometry for an arbitrary row count.

    The launch tiles rows into (SUB, NB/SUB) vregs over a grid of
    NS/NB blocks, so NS must be padded up until some NB <= block_rows
    that is a multiple of SUB divides it.  Returns (NS_padded, NB).
    Padding rows are dead (alive=0 -> ST_DONE at init) and their grid
    blocks hit the all-done chunk skip immediately, so they cost ~zero
    kernel time."""
    assert block_rows % SUB == 0
    # Mosaic requires VMEM slices on the lane dimension be 128-aligned,
    # and the launch reshapes a block's rows into (SUB, NB/SUB) lane
    # tiles -- so NB must be a MULTIPLE of SUB*128 (LN a multiple of
    # 128; the chunk-stripe DMA into the log slices the lane dim), not
    # just a multiple of SUB.  block_rows is a perf knob: clamp it to
    # the nearest usable value.  Smaller row counts pad up with dead
    # rows (they start ST_DONE and their grid blocks hit the all-done
    # skip).
    min_nb = SUB * 128
    block_rows = max(min_nb, block_rows // min_nb * min_nb)
    NS8 = -(-NS // min_nb) * min_nb
    if NS8 > block_rows:
        return -(-NS8 // block_rows) * block_rows, block_rows
    return NS8, NS8


def _pad_rows(pad, words, start_bits, rows, alive, pic_type, full_pel,
              r_size):
    if pad == 0:
        return words, start_bits, rows, alive, pic_type, full_pel, r_size
    return (jnp.pad(words, ((0, pad), (0, 0))),
            jnp.pad(start_bits, (0, pad)), jnp.pad(rows, (0, pad)),
            jnp.pad(alive, (0, pad)), jnp.pad(pic_type, (0, pad)),
            jnp.pad(full_pel, (0, pad)), jnp.pad(r_size, (0, pad)))

def gather_scan_rows(lane_words, base, lane_of_row, win: int):
    """Device-side scan-row windowing: build the [NS, win] per-slice
    word windows with ONE gather from the per-lane payload words.

    Replaces the host sliding-view copy + shipping [NS, win] over
    host->device (the windows overlap ~12x per lane: rows share their
    lane's words).  Overruns past a lane's words read the next lane's
    payload (or clamp at the very end) -- don't-care bytes beyond a
    row's span+EOS pad, which the FSM never consumes (the span bound
    already guarantees the stop codes are in-window).
    """
    N, Wm = lane_words.shape
    flat = lane_words.reshape(-1)
    idx = (lane_of_row.astype(jnp.int32) * Wm + base.astype(jnp.int32)
           )[:, None] + jnp.arange(win, dtype=jnp.int32)[None, :]
    return flat[jnp.clip(idx, 0, N * Wm - 1)]


def pack_slice_rows(batch: dict, words_window: int | None = None,
                    sort_rows: bool = False,
                    device_windows: bool = False):
    """Host-side: expand a make_picture_batch dict into per-SLICE scan
    rows with words rebased to each slice's word offset.

    Returns dict(words [NS, Wp] uint32, start_bits/rows/alive [NS],
    pic_type/full_pel/r_size [NS]) with NS = N * S, plus out_groups=S.
    Rows whose slice span exceeds words_window are marked dead and the
    lane flagged (callers may fall back to the XLA scan); spans are
    payload-bounded so this only triggers on huge single-slice
    pictures.

    sort_rows=True additionally orders rows by descending slice span so
    each kernel grid block holds similar-length slices (blocks of short
    slices hit the all-done early exit sooner); the returned
    lane_of_row [NS] array routes the scatter (pass it to
    run_scan_pallas_sliced instead of out_groups)."""
    words = np.asarray(batch["words"])
    starts = np.asarray(batch["slice_starts"])
    rows = np.asarray(batch["slice_rows"])
    n_slices = np.asarray(batch["n_slices"])
    n_words = np.asarray(batch.get(
        "n_words", np.full(len(words), words.shape[1], np.int32)))
    N, W = words.shape
    S = starts.shape[1]
    NS = N * S

    # fully vectorized (this sits on the pallas pipeline's host path):
    # per (lane, slice): base word, end bit, span
    sidx = np.arange(S)[None, :]
    live = sidx < n_slices[:, None]                       # [N, S]
    base = (starts >> 5) * live                           # [N, S]
    nxt = np.concatenate([starts[:, 1:],
                          np.zeros((N, 1), np.int32)], axis=1)
    last = sidx == (n_slices[:, None] - 1)
    end_bit = np.where(last, n_words[:, None] * 32, nxt)
    span = np.where(live, -(-(end_bit - base * 32) // 32) + 2, 0)
    span = np.minimum(span, W - base)

    if words_window is None:
        # auto-size to the longest slice span, bucketed to multiples of
        # 128 words so the jit cache sees few distinct shapes
        words_window = min(-(-max(int(span.max()), 1) // 128) * 128, W)
    Wp = min(words_window, W)

    overflow = (span > Wp).any(axis=1)
    ok = live & ~overflow[:, None]                        # [N, S]

    # per-row metadata first ([NS] vectors, cheap); the big [NS, Wp]
    # window gather runs ONCE, already in sorted order -- gathering
    # unsorted and re-gathering after argsort doubled the dominant
    # memcpy (measured ~55 ms/tick at 1024 lanes on one host core)
    base_c = np.clip(base, 0, W - Wp)
    start_bits = np.where(ok, starts - (base_c << 5), 0) \
        .astype(np.int32).reshape(NS)
    d = dict(start_bits=start_bits,
             rows=np.where(ok, rows, 0).astype(np.int32).reshape(NS),
             alive=ok.astype(np.int32).reshape(NS),
             pic_type=np.repeat(np.asarray(batch["pic_type"]), S),
             full_pel=np.repeat(np.asarray(batch["full_pel"]), S),
             r_size=np.repeat(np.asarray(batch["r_size"]), S),
             out_groups=S, overflow=overflow,
             lane_of_row=np.repeat(np.arange(N, dtype=np.int32), S))
    d["span"] = (span.reshape(NS) * d["alive"]).astype(np.int32)
    lane_r = d["lane_of_row"]
    base_r = base_c.astype(np.intp).reshape(NS)
    if sort_rows:
        order = np.argsort(-d["span"], kind="stable")
        for k in ("start_bits", "rows", "alive", "pic_type",
                  "full_pel", "r_size", "lane_of_row", "span"):
            d[k] = np.ascontiguousarray(d[k][order])
        lane_r = d["lane_of_row"]
        base_r = base_r[order]

    if device_windows:
        # ship per-LANE words + per-row bases; the [NS, win] windows
        # are built on device by gather_scan_rows inside the decode
        # step.  Rows overlap ~12x per lane, so this cuts host->device
        # bytes ~12x and skips the host window copy entirely.  Wm
        # covers every live row's span (+2 margin words past end_bit,
        # matching the span formula); reads past Wm land in don't-care
        # territory the FSM never consumes (its own EOS pad stops it).
        Wm = min(W, -(-max(int(n_words.max()) + 2, Wp) // 128) * 128)
        lw = np.ascontiguousarray(words[:, :Wm])
        if np.shares_memory(lw, words):
            # Wm == W: make the shipped words independent of the
            # caller's buffer (the packed gather reuses its batch
            # buffers every tick; a chunked caller stacks several)
            lw = lw.copy()
        d["lane_words"] = lw
        d["row_base"] = base_r.astype(np.int32)
        d["win"] = Wp + (-Wp) % 8
        return d

    # one contiguous row copy per (lane, slice) via a sliding view.
    # Windows near the payload end clamp left (coverage is preserved:
    # span <= Wp was already checked); the extra tail bytes a clamped
    # or unmasked window exposes are exactly the real next-slice bytes
    # the sequential scanner would see -- the FSM stops at the next
    # start code's 23 zero bits either way.
    from numpy.lib.stride_tricks import sliding_window_view
    view = sliding_window_view(words, Wp, axis=1)        # [N, W-Wp+1, Wp]
    out = view[lane_r, base_r]
    if Wp % 8:
        # the kernel requires word windows padded to sublane multiples
        out = np.pad(out, ((0, 0), (0, 8 - Wp % 8)))
    d["words"] = out
    return d


@functools.partial(
    jax.jit, static_argnames=("mb_width", "mb_count", "max_steps",
                              "out_groups", "chunk", "block_rows",
                              "interpret"))
def run_scan_pallas_sliced(words, start_bits, rows, alive, pic_type,
                           full_pel, r_size, *, mb_width: int,
                           mb_count: int, max_steps: int,
                           out_groups: int, chunk: int = 256,
                           block_rows: int = 1024,
                           interpret: bool = False):
    """Slice-parallel Pallas scan: one scan row per slice.

    Inputs from pack_slice_rows (words [NS, Wp] rebased per slice).
    Any NS is accepted: rows are padded internally to the kernel's
    tiling (see _row_geometry) and the padding is dropped before the
    scatter.  Returns (coeffs, recs, nfinal, err [N], iters) with dense
    outputs grouped back to N = NS // out_groups lanes."""
    NS, Wp = words.shape
    assert Wp % 8 == 0
    NSp, NB = _row_geometry(NS, block_rows)
    (words, start_bits, rows, alive, pic_type, full_pel,
     r_size) = _pad_rows(NSp - NS, words, start_bits, rows, alive,
                         pic_type, full_pel, r_size)

    st = VS.initial_state(
        NSp, start_bits[:, None], rows[:, None], alive,
        pic_type, full_pel, r_size)
    st["error"] = st["error"].astype(jnp.int32)
    # single-slice rows: bitpos starts at the rebased offset
    packed = jnp.stack([st[k].astype(jnp.int32) for k in STATE_KEYS])
    ss = start_bits[None, :].astype(jnp.int32)
    sr = rows[None, :].astype(jnp.int32)

    out_state, log_idx, log_val, iters = _launch(
        words.T, packed, ss, sr, mb_width=mb_width, mb_count=mb_count,
        max_steps=max_steps, chunk=chunk, NB=NB, interpret=interpret)
    out_state = out_state[:, :NS]
    coeffs, recs, nfinal = _scatter(log_idx[:, :NS], log_val[:, :NS],
                                    mb_count, out_groups=out_groups)
    err_sub = (out_state[STATE_KEYS.index("error")] != 0) | \
        (out_state[STATE_KEYS.index("state")] != VS.ST_DONE)
    err = err_sub.reshape(NS // out_groups, out_groups).any(axis=1)
    return coeffs, recs, nfinal, err, jnp.max(iters)


@functools.partial(
    jax.jit, static_argnames=("mb_width", "mb_count", "n_lanes",
                              "long_rows", "steps_long", "steps_short",
                              "chunk", "block_rows", "interpret"))
def run_scan_pallas_bucketed(words, start_bits, rows, alive, pic_type,
                             full_pel, r_size, lane_of_row, *,
                             mb_width: int, mb_count: int, n_lanes: int,
                             long_rows: int, steps_long: int,
                             steps_short: int, chunk: int = 256,
                             block_rows: int = 1024,
                             interpret: bool = False):
    """Two-budget scan for span-SORTED rows (pack_slice_rows with
    sort_rows=True): the first `long_rows` rows (the longest slices --
    I-picture rows in a mixed-phase fleet) scan with a `steps_long`
    symbol budget, the rest with `steps_short`.

    Motivation: the post-scan bulk scatter is linear in TOTAL LOG SLOTS
    (rows x budget) and measured ~8-12ns/element, so giving every row
    the I-slice budget wastes ~80% of the scatter on trash slots.  Rows
    whose symbol count exceeds their bucket's budget finish with
    state != DONE and flag their lane's error (the caller resyncs, same
    policy as any corrupt lane).

    Returns (coeffs, recs, nfinal, err [n_lanes], iters)."""
    NS, Wp = words.shape
    assert Wp % 8 == 0 and 0 < long_rows < NS
    MB6 = mb_count * 6
    C1 = mb_count + MB6 + mb_count * 384 + 1

    def half(lo, hi, steps):
        NSb = hi - lo
        NSp, NB = _row_geometry(NSb, block_rows)
        (w, sb, rw, al, pt, fp, rs) = _pad_rows(
            NSp - NSb, words[lo:hi], start_bits[lo:hi], rows[lo:hi],
            alive[lo:hi], pic_type[lo:hi], full_pel[lo:hi],
            r_size[lo:hi])
        st = VS.initial_state(NSp, sb[:, None], rw[:, None], al, pt,
                              fp, rs)
        st["error"] = st["error"].astype(jnp.int32)
        packed = jnp.stack([st[k].astype(jnp.int32)
                            for k in STATE_KEYS])
        ss = sb[None, :].astype(jnp.int32)
        sr = rw[None, :].astype(jnp.int32)
        out_state, li, lv, iters = _launch(
            w.T, packed, ss, sr, mb_width=mb_width, mb_count=mb_count,
            max_steps=steps, chunk=min(chunk, steps), NB=NB,
            interpret=interpret)
        out_state = out_state[:, :NSb]
        flat = lane_of_row[lo:hi][None, :] * C1 + li[:, :NSb]
        bad = (out_state[STATE_KEYS.index("error")] != 0) | \
            (out_state[STATE_KEYS.index("state")] != VS.ST_DONE)
        return flat.reshape(-1), lv[:, :NSb].reshape(-1), bad, iters

    fl, vl, badl, itl = half(0, long_rows, steps_long)
    fs, vs, bads, its = half(long_rows, NS, steps_short)

    buf = jnp.zeros((n_lanes * C1,), jnp.int32) \
        .at[fl].set(vl).at[fs].set(vs)
    buf = buf.reshape(n_lanes, C1)
    recs = buf[:, :mb_count]
    nfinal = buf[:, mb_count:mb_count + MB6]
    coeffs = buf[:, mb_count + MB6:C1 - 1].astype(jnp.int16)

    bad = jnp.concatenate([badl, bads])
    err = jnp.zeros((n_lanes,), bool).at[lane_of_row].max(bad)
    return coeffs, recs, nfinal, err, jnp.maximum(jnp.max(itl),
                                                  jnp.max(its))


@functools.partial(
    jax.jit, static_argnames=("mb_width", "mb_height", "n_lanes",
                              "long_rows", "steps_long", "steps_short",
                              "chunk", "block_rows", "interpret",
                              "transposed"))
def run_scan_pallas_bucketed_dense(
        words, start_bits, rows, alive, pic_type, full_pel, r_size,
        lane_of_row, perm, *, mb_width: int, mb_height: int,
        n_lanes: int, long_rows: int, steps_long: int,
        steps_short: int, chunk: int = 128, block_rows: int = 1024,
        interpret: bool = False, transposed: bool = False):
    """Two-budget scan + MATMUL scatter (ops/scan_dense.py).

    Same inputs as run_scan_pallas_bucketed plus `perm` (int32
    [n_lanes*mb_height] from scan_dense.row_perm, mapping each lane's
    MB row to its scan-row index in the span-sorted order).  The
    emission logs never see the serial XLA scatter: each bucket's
    [T, R] log factorizes per row into two one-hot MXU contractions
    over its slice's MB-row window, and one permutation gather lands
    the rows lane-major.  Bit-exact vs the scatter on well-formed
    streams; slices that escape their MB row flag the lane error
    (callers resync, same policy as a budget overflow)."""
    from espflix_tpu.ops import scan_dense as SD
    NS, Wp = words.shape
    assert Wp % 8 == 0 and 0 < long_rows < NS
    mb_count = mb_width * mb_height

    def half(lo, hi, steps):
        NSb = hi - lo
        NSp, NB = _row_geometry(NSb, block_rows)
        (w, sb, rw, al, pt, fp, rs) = _pad_rows(
            NSp - NSb, words[lo:hi], start_bits[lo:hi], rows[lo:hi],
            alive[lo:hi], pic_type[lo:hi], full_pel[lo:hi],
            r_size[lo:hi])
        st = VS.initial_state(NSp, sb[:, None], rw[:, None], al, pt,
                              fp, rs)
        st["error"] = st["error"].astype(jnp.int32)
        packed = jnp.stack([st[k].astype(jnp.int32)
                            for k in STATE_KEYS])
        ss = sb[None, :].astype(jnp.int32)
        sr = rw[None, :].astype(jnp.int32)
        out_state, li, lv, iters = _launch(
            w.T, packed, ss, sr, mb_width=mb_width, mb_count=mb_count,
            max_steps=steps, chunk=min(chunk, steps), NB=NB,
            interpret=interpret)
        out_state = out_state[:, :NSb]
        coef, aux, dropped = SD.log_to_dense_rows(
            li[:, :NSb], lv[:, :NSb],
            rows[lo:hi] * mb_width, mb_width=mb_width,
            mb_count=mb_count, transposed=transposed)
        bad = (out_state[STATE_KEYS.index("error")] != 0) | \
            (out_state[STATE_KEYS.index("state")] != VS.ST_DONE) | \
            dropped
        return coef, aux, bad, iters

    cl, al_, badl, itl = half(0, long_rows, steps_long)
    cs, as_, bads, its = half(long_rows, NS, steps_short)
    coef_rows = jnp.concatenate([cl, cs], axis=0)
    aux_rows = jnp.concatenate([al_, as_], axis=0)
    asm = SD.assemble_dense_T if transposed else SD.assemble_dense
    coeffs, recs, nfinal = asm(
        coef_rows, aux_rows, perm, n_lanes=n_lanes,
        mb_width=mb_width, mb_height=mb_height)
    bad = jnp.concatenate([badl, bads])
    err = jnp.zeros((n_lanes,), bool).at[lane_of_row].max(bad)
    return coeffs, recs, nfinal, err, jnp.maximum(jnp.max(itl),
                                                  jnp.max(its))


@functools.partial(
    jax.jit, static_argnames=("mb_width", "mb_count", "max_steps",
                              "n_lanes", "chunk", "block_rows",
                              "interpret"))
def run_scan_pallas_sorted(words, start_bits, rows, alive, pic_type,
                           full_pel, r_size, lane_of_row, *,
                           mb_width: int, mb_count: int, max_steps: int,
                           n_lanes: int, chunk: int = 256,
                           block_rows: int = 1024,
                           interpret: bool = False):
    """run_scan_pallas_sliced for span-sorted rows: scan rows may be in
    any order; lane_of_row routes each row's emissions to its lane with
    one flat scatter.  Sorting (pack_slice_rows(sort_rows=True)) groups
    similar-length slices per grid block so short blocks hit the
    all-done early exit sooner."""
    NS, Wp = words.shape
    assert Wp % 8 == 0
    NSp, NB = _row_geometry(NS, block_rows)
    (words, start_bits, rows, alive, pic_type, full_pel,
     r_size) = _pad_rows(NSp - NS, words, start_bits, rows, alive,
                         pic_type, full_pel, r_size)

    st = VS.initial_state(
        NSp, start_bits[:, None], rows[:, None], alive,
        pic_type, full_pel, r_size)
    st["error"] = st["error"].astype(jnp.int32)
    packed = jnp.stack([st[k].astype(jnp.int32) for k in STATE_KEYS])
    ss = start_bits[None, :].astype(jnp.int32)
    sr = rows[None, :].astype(jnp.int32)

    out_state, log_idx, log_val, iters = _launch(
        words.T, packed, ss, sr, mb_width=mb_width, mb_count=mb_count,
        max_steps=max_steps, chunk=chunk, NB=NB, interpret=interpret)
    out_state = out_state[:, :NS]
    log_idx = log_idx[:, :NS]
    log_val = log_val[:, :NS]

    MB6 = mb_count * 6
    C1 = mb_count + MB6 + mb_count * 384 + 1
    flat = lane_of_row[None, :] * C1 + log_idx            # [T, NS]
    buf = jnp.zeros((n_lanes * C1,), jnp.int32) \
        .at[flat.reshape(-1)].set(log_val.reshape(-1))
    buf = buf.reshape(n_lanes, C1)
    recs = buf[:, :mb_count]
    nfinal = buf[:, mb_count:mb_count + MB6]
    coeffs = buf[:, mb_count + MB6:C1 - 1].astype(jnp.int16)

    err_sub = (out_state[STATE_KEYS.index("error")] != 0) | \
        (out_state[STATE_KEYS.index("state")] != VS.ST_DONE)
    err = jnp.zeros((n_lanes,), bool).at[lane_of_row].max(err_sub)
    return coeffs, recs, nfinal, err, jnp.max(iters)

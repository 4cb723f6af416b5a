"""Batched SBC audio decoder model (device-side).

Decodes F frames per lane per jitted call for N lanes, 8-subband
16-block frames, mono (mode 0) or two-channel (modes 1/2 -- the
reference treats dual-channel and stereo identically: per-channel bit
allocation with the full bitpool, /root/reference/src/sbc_decoder.cpp:
149-151,273-341).  Bit allocation, unpacking, inverse quantization and
the synthesis filterbank are dense batched integer ops
(ops/sbc_ops.py); the only sequential dimension is the
16-block-per-frame synthesis recurrence, run as one lax.scan over
F*16 steps with the per-channel [10, 16] V-history as carry (channels
fold into the batch axis -- they are independent filterbanks,
sbc_decoder.cpp:356-364).

PCM layout matches the reference exactly: NOT interleaved; within each
frame all of channel 0's blocks*8 samples precede channel 1's
(sbc_decoder.h:28, the `for ch { for blk }` order at
sbc_decoder.cpp:356-364).

`channels` is a static argument (separately jitted mono/stereo
variants); the fleet scheduler groups lanes by the probed frame mode.
Bit-exact against audio/sbc.py and oracle/sbc_oracle.cpp
(tests/test_sbc_batched.py, incl. stereo).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from espflix_tpu.ops import sbc_ops

BLOCKS = 16
SUBBANDS = 8
PCM_PER_FRAME = BLOCKS * SUBBANDS  # 128 per channel


def init_state(n_lanes: int):
    """Per-lane synthesis V-history, one [10, 16] bank per channel
    (mono uses channel 0; channel 1 carries through untouched)."""
    return jnp.zeros((n_lanes, 2, 10, 16), jnp.int32)


def frames_to_words(frames: np.ndarray) -> np.ndarray:
    """uint8[N, F, L] -> uint32[N, F, ceil(L/4)+1] big-endian words."""
    N, F, L = frames.shape
    pad = (-L) % 4 + 4
    b = np.zeros((N, F, L + pad), np.uint8)
    b[..., :L] = frames
    w = b.view(np.uint32)
    w.byteswap(inplace=True)
    return w


def _byte(words, k: int):
    return (words[..., k >> 2] >> (8 * (3 - (k & 3)))) & 0xFF


def _synthesis_conv(samples, fvalid, h0, *, N, F, CH):
    """Synthesis filterbank as a 10-tap convolution over per-block V
    vectors (see decode_frames_batched).  samples int32[N, F, BLOCKS,
    CH, SUBBANDS]; fvalid bool[N, F]; h0 int32[N*CH, 10, 16] (row j =
    V of the j+1-th most recent PAST block).  Returns
    (pcm int16[N, F, CH, BLOCKS, SUBBANDS] in original frame slots,
    new_hist int32[N*CH, 10, 16]) -- bit-identical to the per-block
    scan over sbc_ops.synthesis_step with per-frame validity masking.
    """
    from espflix_tpu.core import sbc_tables as ST
    B = N * CH
    T_ = F * BLOCKS
    syn = jnp.asarray(ST.SYN_8, jnp.int32)            # [16, 8]
    proto = jnp.asarray(ST.PROTO_8, jnp.int32)        # [8, 10]

    # V for every block, channels folded into batch: [B, F, BLOCKS, 16]
    V = jnp.einsum("ks,nfbcs->ncfbk", syn, samples,
                   preferred_element_type=jnp.int32) >> 15
    V = V.reshape(B, F, BLOCKS, 16)

    # frame compaction: valid frames first (stable), invalid at the
    # end.  F is tiny (~13), so gathers are compare+select sums.
    order = jnp.argsort(~fvalid, axis=1, stable=True)  # [N, F]
    nv = fvalid.sum(axis=1).astype(jnp.int32)          # [N]
    iota_f = jnp.arange(F, dtype=jnp.int32)
    ohc = order[:, :, None] == iota_f[None, None, :]   # [N, k, f]
    ohc2 = jnp.repeat(ohc, CH, axis=0) if CH == 2 else ohc
    Vc = jnp.sum(jnp.where(ohc2[:, :, :, None, None],
                           V[:, None, :, :, :], 0),
                 axis=2)                               # [B, F, BLK, 16]

    # Vext[:, 10 + t] = compacted block t; Vext[:, 10 - m] = h0 row
    # m-1 (the block m steps in the past)
    s = Vc.reshape(B, T_, 16)
    Vext = jnp.concatenate([h0[:, ::-1, :], s], axis=1)

    # pcm[t, i] = sum_a Vext[10+t-2a, i]      * proto[i, 2a]
    #           + sum_a Vext[10+t-2a-1, 8+i]  * proto[i, 2a+1]
    # (the scan's even/odd hist rows; odd taps read columns 8..15)
    acc = jnp.zeros((B, T_, SUBBANDS), jnp.int32)
    for a in range(5):
        we = jax.lax.dynamic_slice_in_dim(Vext, 10 - 2 * a, T_, 1)
        wo = jax.lax.dynamic_slice_in_dim(Vext, 10 - 2 * a - 1, T_, 1)
        acc = acc + we[:, :, :8] * proto[None, None, :, 2 * a] \
            + wo[:, :, 8:] * proto[None, None, :, 2 * a + 1]
    pcm_c = jnp.clip(acc >> 15, -0x7FFF, 0x7FFF)       # [B, T_, 8]

    # mask compacted padding (k >= nv) and scatter back to original
    # frame slots; invalid frames emit zero PCM
    pcm_c = pcm_c.reshape(B, F, BLOCKS, SUBBANDS)
    kvalid = iota_f[None, :] < nv[:, None]             # [N, k]
    kv2 = jnp.repeat(kvalid, CH, axis=0) if CH == 2 else kvalid
    sel = ohc2 & kv2[:, :, None]                       # [B, k, f]
    pcm = jnp.sum(jnp.where(sel[:, :, :, None, None],
                            pcm_c[:, :, None, :, :], 0),
                  axis=1)                              # [B, f, BLK, 8]
    pcm = pcm.reshape(N, CH, F, BLOCKS, SUBBANDS) \
        .transpose(0, 2, 1, 3, 4)                      # [N,F,CH,BLK,8]

    # final history: the last 10 blocks of the compacted stream all
    # live in the last valid frame (16 >= 10); nv == 0 keeps h0
    lastf = (order * kvalid).max(axis=1) * \
        jnp.minimum(nv, 1)                             # [N] orig index
    lf2 = jnp.repeat(lastf, CH, axis=0) if CH == 2 else lastf
    tail = jnp.sum(jnp.where(
        (lf2[:, None] == iota_f[None, :])[:, :, None, None],
        V[:, :, 6:16, :], 0), axis=1)                  # [B, 10, 16]
    h1 = tail[:, ::-1, :]                              # row j = blk 15-j
    nv2 = jnp.repeat(nv, CH, axis=0) if CH == 2 else nv
    h1 = jnp.where((nv2 > 0)[:, None, None], h1, h0)
    return pcm, h1


@functools.partial(jax.jit, static_argnames=("n_frames", "channels"))
def decode_frames_batched(words, hist, active=None, n_valid=None, *,
                          n_frames: int, channels: int = 1):
    """words: uint32[N, F, W]; hist: int32[N, 2, 10, 16] synthesis
    state (init_state).  active: optional bool[N]; inactive lanes keep
    their state and emit zero PCM (the fleet scheduler masks starved
    lanes).  n_valid: optional int32[N] per-lane valid frame count;
    frames >= n_valid are padding (no state update, zero PCM, no error)
    so lanes with partial tails batch with full ones.  channels: 1
    decodes mode-0 frames, 2 decodes mode-1/2 frames (lanes whose
    header mode disagrees are flagged).  Error frames do not touch the
    V-history (the scalar model skips synthesis on a bad header).

    Returns (pcm int16[N, F*channels*128], new_hist,
    error bool[N, F], frame_bits int32[N, F])."""
    N, F, W = words.shape
    CH = channels
    assert F == n_frames and CH in (1, 2)
    hist_in = hist
    b0 = _byte(words, 0)
    b1 = _byte(words, 1)
    bitpool = _byte(words, 2).astype(jnp.int32)
    frequency = ((b1 >> 6) & 3).astype(jnp.int32)
    blocks_idx = (b1 >> 4) & 3
    mode = (b1 >> 2) & 3
    allocation = ((b1 >> 1) & 1).astype(jnp.int32)
    sb8 = (b1 & 1) == 1
    hdr_channels = jnp.where(mode == 0, 1, 2)
    error = (b0 != 0x9C) | (blocks_idx != 3) | ~sb8 | (mode == 3) | \
        (hdr_channels != CH)

    # scale factors: bytes 4 .. 4+CH*4, channel-major, two nibbles each
    sf = jnp.stack(
        [jnp.where(k % 2 == 0, _byte(words, 4 + k // 2) >> 4,
                   _byte(words, 4 + k // 2) & 0xF)
         for k in range(CH * 8)], axis=-1).astype(jnp.int32)
    sf = sf.reshape(N, F, CH, 8)

    # per-channel independent allocation, full bitpool each (the
    # reference's per-ch loop, sbc_decoder.cpp:149-233)
    bits = sbc_ops.bit_allocation_batched(
        sf, bitpool[..., None], frequency[..., None],
        allocation[..., None])                          # [N, F, CH, 8]

    # bit unpack order is (blk, ch, sb) (sbc_decoder.cpp:313-318)
    widths = jnp.broadcast_to(bits[:, :, None, :, :],
                              (N, F, BLOCKS, CH, SUBBANDS))
    wflat = widths.reshape(N, F, BLOCKS * CH * SUBBANDS)
    ends = jnp.cumsum(wflat, axis=-1)
    base_bits = (4 + CH * 4) * 8                   # header + sf bytes
    offsets = base_bits + ends - wflat
    raw = sbc_ops.extract_bits(words, offsets, wflat)
    raw = raw.reshape(N, F, BLOCKS, CH, SUBBANDS)
    scale = jnp.broadcast_to(sf[:, :, None, :, :], raw.shape)
    level = widths
    samples = jnp.where(
        level > 0, sbc_ops.iquant_exact(raw, level, scale), 0)

    # per-frame validity: padding frames and error frames are masked
    # out of the synthesis recurrence
    fvalid = ~error                                     # [N, F]
    if n_valid is not None:
        fvalid = fvalid & (jnp.arange(F)[None, :] < n_valid[:, None])
        error = error & (jnp.arange(F)[None, :] < n_valid[:, None])

    # synthesis: the V-history recurrence is really a sliding WINDOW
    # over the per-block V vectors (V = SYN_8 @ src depends only on
    # the block's samples), so instead of a 208-step lax.scan the
    # whole tick computes as a 10-tap convolution over the block
    # timeline -- fully parallel, bit-identical (int32 sums are
    # order-independent mod 2^32).  Invalid frames must be SKIPPED by
    # the window (the scan froze the carry), so frames compact
    # valid-first per lane before the convolution and PCM scatters
    # back to original frame slots.  ~3x the old scan on hardware.
    pcm_c, h1 = _synthesis_conv(
        samples, fvalid, hist[:, :CH].reshape(N * CH, 10, 16),
        N=N, F=F, CH=CH)
    pcm = pcm_c.reshape(N, F * CH * PCM_PER_FRAME)
    new_hist = hist_in.at[:, :CH].set(h1.reshape(N, CH, 10, 16))
    frame_bits = base_bits + ends[..., -1]
    if active is not None:
        new_hist = jnp.where(active[:, None, None, None],
                             new_hist, hist_in)
        pcm = jnp.where(active[:, None], pcm, 0)
        error = error & active[:, None]
    return pcm.astype(jnp.int16), new_hist, error, frame_bits


def decode_stream_batched(frame_bytes_per_lane: list, frame_len: int = 64,
                          channels: int = 1):
    """Convenience: decode per-lane lists of equal-size frames.

    Returns list of int16 arrays (one per lane)."""
    N = len(frame_bytes_per_lane)
    F = max(len(f) for f in frame_bytes_per_lane)
    arr = np.zeros((N, F, frame_len), np.uint8)
    for i, frames in enumerate(frame_bytes_per_lane):
        for j, f in enumerate(frames):
            assert len(f) == frame_len
            arr[i, j] = np.frombuffer(f, np.uint8)
    words = jnp.asarray(frames_to_words(arr))
    pcm, hist, err, fb = decode_frames_batched(
        words, init_state(N), n_frames=F, channels=channels)
    pcm = np.asarray(pcm)
    per = channels * PCM_PER_FRAME
    return [pcm[i, :len(frame_bytes_per_lane[i]) * per]
            for i in range(N)]

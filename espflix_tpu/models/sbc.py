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

    # synthesis scan over all blocks of all frames in order; the CH
    # filterbanks are independent -> fold channels into the batch axis
    xs = samples.transpose(1, 2, 0, 3, 4) \
        .reshape(F * BLOCKS, N * CH, SUBBANDS)
    vm = jnp.broadcast_to(fvalid[:, :, None, None],
                          (N, F, BLOCKS, CH)) \
        .transpose(1, 2, 0, 3).reshape(F * BLOCKS, N * CH)

    def step(h, x):
        src, m = x
        h2, pcm = sbc_ops.synthesis_step(h, src)
        h2 = jnp.where(m[:, None, None], h2, h)
        return h2, jnp.where(m[:, None], pcm, 0)

    h0 = hist[:, :CH].reshape(N * CH, 10, 16)
    h1, pcm = jax.lax.scan(step, h0, (xs, vm))     # pcm [T, N*CH, 8]
    # [T=F*16, N*CH, 8] -> per frame, channel-major runs of 128
    pcm = pcm.reshape(F, BLOCKS, N, CH, SUBBANDS) \
        .transpose(2, 0, 3, 1, 4) \
        .reshape(N, F * CH * PCM_PER_FRAME)
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

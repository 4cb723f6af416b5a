"""Batched SBC audio decoder model (device-side).

Decodes F frames per lane per jitted call for N lanes, mono 8-subband
16-block frames (the service operating point: 48 kHz, 64-byte frames,
/root/reference/indexer/indexer.cpp:307).  Bit allocation, unpacking,
inverse quantization and the synthesis filterbank are dense batched
integer ops (ops/sbc_ops.py); the only sequential dimension is the
16-block-per-frame synthesis recurrence, run as one lax.scan over
F*16 steps with the [10, 16] V-history as carry.

Bit-exact against audio/sbc.py and oracle/sbc_oracle.cpp
(tests/test_sbc_batched.py).  Dual-channel streams currently decode on
the host scalar path (runtime/scheduler routes by mode).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from espflix_tpu.ops import sbc_ops

BLOCKS = 16
SUBBANDS = 8
PCM_PER_FRAME = BLOCKS * SUBBANDS  # 128 (mono)


def init_state(n_lanes: int):
    return jnp.zeros((n_lanes, 10, 16), jnp.int32)


def frames_to_words(frames: np.ndarray) -> np.ndarray:
    """uint8[N, F, L] -> uint32[N, F, ceil(L/4)+1] big-endian words."""
    N, F, L = frames.shape
    pad = (-L) % 4 + 4
    b = np.concatenate(
        [frames, np.zeros((N, F, pad), np.uint8)], axis=-1)
    w = b.reshape(N, F, -1, 4).astype(np.uint32)
    return (w[..., 0] << 24) | (w[..., 1] << 16) | (w[..., 2] << 8) \
        | w[..., 3]


def _byte(words, k: int):
    return (words[..., k >> 2] >> (8 * (3 - (k & 3)))) & 0xFF


@functools.partial(jax.jit, static_argnames=("n_frames",))
def decode_frames_batched(words, hist, active=None, *, n_frames: int):
    """words: uint32[N, F, W]; hist: int32[N, 10, 16] synthesis state.
    active: optional bool[N]; inactive lanes keep their state and emit
    zero PCM (the fleet scheduler masks starved lanes).

    Returns (pcm int16[N, F*128], new_hist, error bool[N, F],
    frame_bits int32[N, F])."""
    N, F, W = words.shape
    assert F == n_frames
    hist_in = hist
    b0 = _byte(words, 0)
    b1 = _byte(words, 1)
    bitpool = _byte(words, 2).astype(jnp.int32)
    frequency = ((b1 >> 6) & 3).astype(jnp.int32)
    blocks_idx = (b1 >> 4) & 3
    mode = (b1 >> 2) & 3
    allocation = ((b1 >> 1) & 1).astype(jnp.int32)
    sb8 = (b1 & 1) == 1
    error = (b0 != 0x9C) | (blocks_idx != 3) | (mode != 0) | ~sb8

    # scale factors: bytes 4..7, two nibbles each
    sf = jnp.stack(
        [jnp.where(k % 2 == 0, _byte(words, 4 + k // 2) >> 4,
                   _byte(words, 4 + k // 2) & 0xF)
         for k in range(8)], axis=-1).astype(jnp.int32)     # [N, F, 8]

    bits = sbc_ops.bit_allocation_batched(
        sf, bitpool, frequency, allocation)                  # [N, F, 8]

    widths = jnp.broadcast_to(bits[:, :, None, :],
                              (N, F, BLOCKS, SUBBANDS))
    wflat = widths.reshape(N, F, BLOCKS * SUBBANDS)
    ends = jnp.cumsum(wflat, axis=-1)
    offsets = 64 + ends - wflat                              # 8 bytes hdr+sf
    raw = sbc_ops.extract_bits(words, offsets, wflat)
    raw = raw.reshape(N, F, BLOCKS, SUBBANDS)
    scale = jnp.broadcast_to(sf[:, :, None, :], raw.shape)
    level = widths
    samples = jnp.where(
        level > 0, sbc_ops.iquant_exact(raw, level, scale), 0)

    # synthesis scan over all blocks of all frames in order
    xs = samples.reshape(N, F * BLOCKS, SUBBANDS).transpose(1, 0, 2)

    def step(h, src):
        h, pcm = sbc_ops.synthesis_step(h, src)
        return h, pcm

    hist, pcm = jax.lax.scan(step, hist, xs)                 # [T, N, 8]
    pcm = pcm.transpose(1, 0, 2).reshape(N, F * PCM_PER_FRAME)
    frame_bits = 64 + ends[..., -1]
    if active is not None:
        hist = jnp.where(active[:, None, None], hist, hist_in)
        pcm = jnp.where(active[:, None], pcm, 0)
        error = error & active[:, None]
    return pcm.astype(jnp.int16), hist, error, frame_bits


def decode_stream_batched(frame_bytes_per_lane: list, frame_len: int = 64):
    """Convenience: decode per-lane lists of equal-size mono frames.

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
        words, init_state(N), n_frames=F)
    pcm = np.asarray(pcm)
    return [pcm[i, :len(frame_bytes_per_lane[i]) * PCM_PER_FRAME]
            for i in range(N)]

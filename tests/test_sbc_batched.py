"""Batched device SBC decoder vs scalar golden model: bit-exact PCM."""

import numpy as np

from espflix_tpu.audio.sbc import SbcDecoder
from espflix_tpu.models import sbc as dsbc
from espflix_tpu.tools.sbc_encode import make_frame


def test_batched_multi_lane_bit_exact():
    rng = np.random.default_rng(11)
    lanes, golden = [], []
    for _ in range(3):
        frames = [make_frame(rng.integers(0, 16, (1, 8)), rng=rng,
                             bitpool=28,
                             allocation=int(rng.random() < 0.5))
                  for _ in range(10)]
        assert all(len(f) == 64 for f in frames)
        lanes.append(frames)
        d = SbcDecoder()
        golden.append(np.concatenate(
            [d.decode_frame(f)[0] for f in frames]))
    outs = dsbc.decode_stream_batched(lanes)
    for i in range(3):
        assert np.array_equal(outs[i].astype(np.int64),
                              golden[i].astype(np.int64)), f"lane {i}"


def test_state_carries_across_calls():
    rng = np.random.default_rng(12)
    frames = [make_frame(rng.integers(0, 16, (1, 8)), rng=rng, bitpool=28)
              for _ in range(8)]
    d = SbcDecoder()
    golden = np.concatenate([d.decode_frame(f)[0] for f in frames])

    import jax.numpy as jnp
    hist = dsbc.init_state(1)
    out = []
    for k in range(0, 8, 4):
        arr = np.stack([np.frombuffer(f, np.uint8)
                        for f in frames[k:k + 4]])[None]
        words = jnp.asarray(dsbc.frames_to_words(arr))
        pcm, hist, err, _ = dsbc.decode_frames_batched(
            words, hist, n_frames=4)
        assert not np.asarray(err).any()
        out.append(np.asarray(pcm)[0])
    assert np.array_equal(np.concatenate(out).astype(np.int64),
                          golden.astype(np.int64))


def test_inactive_lane_state_frozen():
    import jax.numpy as jnp
    rng = np.random.default_rng(13)
    f = make_frame(rng.integers(0, 16, (1, 8)), rng=rng, bitpool=28)
    arr = np.stack([np.frombuffer(f, np.uint8)] * 2)[:, None]
    words = jnp.asarray(dsbc.frames_to_words(arr))
    hist = dsbc.init_state(2)
    active = jnp.asarray(np.array([True, False]))
    pcm, hist2, err, _ = dsbc.decode_frames_batched(
        words, hist, active, n_frames=1)
    assert np.asarray(pcm)[1].sum() == 0
    assert np.array_equal(np.asarray(hist2)[1], np.asarray(hist)[1])
    assert not np.array_equal(np.asarray(hist2)[0], np.asarray(hist)[0])


def test_batched_stereo_bit_exact():
    """Device stereo decode (modes 1 and 2) matches the scalar golden
    model: per-channel allocation with the full bitpool, channel-major
    non-interleaved PCM (sbc_decoder.cpp:149-233,356-364)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(21)
    for mode in (1, 2):
        lanes, golden, flen = [], [], None
        for _ in range(3):
            frames = [make_frame(rng.integers(0, 16, (2, 8)), rng=rng,
                                 mode=mode, bitpool=28,
                                 allocation=int(rng.random() < 0.5))
                      for _ in range(6)]
            assert len({len(f) for f in frames}) == 1
            flen = len(frames[0])
            lanes.append(frames)
            d = SbcDecoder()
            golden.append(np.concatenate(
                [d.decode_frame(f)[0] for f in frames]))
        outs = dsbc.decode_stream_batched(lanes, frame_len=flen,
                                          channels=2)
        for i in range(3):
            assert np.array_equal(outs[i].astype(np.int64),
                                  golden[i].astype(np.int64)), \
                f"mode {mode} lane {i}"


def test_stereo_state_carries_across_calls():
    import jax.numpy as jnp
    rng = np.random.default_rng(22)
    frames = [make_frame(rng.integers(0, 16, (2, 8)), rng=rng,
                         mode=2, bitpool=40) for _ in range(8)]
    flen = len(frames[0])
    d = SbcDecoder()
    golden = np.concatenate([d.decode_frame(f)[0] for f in frames])

    hist = dsbc.init_state(1)
    out = []
    for k in range(0, 8, 4):
        arr = np.stack([np.frombuffer(f, np.uint8)
                        for f in frames[k:k + 4]])[None]
        words = jnp.asarray(dsbc.frames_to_words(arr))
        pcm, hist, err, _ = dsbc.decode_frames_batched(
            words, hist, n_frames=4, channels=2)
        assert not np.asarray(err).any()
        out.append(np.asarray(pcm)[0])
    assert np.array_equal(np.concatenate(out).astype(np.int64),
                          golden.astype(np.int64))


def test_n_valid_partial_tail_masking():
    """Decoding F frames with n_valid=k equals decoding the first k:
    padding frames leave the V-history untouched and emit zero PCM."""
    import jax.numpy as jnp
    rng = np.random.default_rng(23)
    frames = [make_frame(rng.integers(0, 16, (1, 8)), rng=rng,
                         bitpool=28) for _ in range(4)]
    arr4 = np.stack([np.frombuffer(f, np.uint8) for f in frames])[None]
    arr4[0, 2:] = 0  # garbage padding beyond n_valid
    words4 = jnp.asarray(dsbc.frames_to_words(arr4))
    pcm4, hist4, err4, _ = dsbc.decode_frames_batched(
        words4, dsbc.init_state(1), n_valid=jnp.asarray([2]),
        n_frames=4)
    arr2 = np.stack([np.frombuffer(f, np.uint8)
                     for f in frames[:2]])[None]
    words2 = jnp.asarray(dsbc.frames_to_words(arr2))
    pcm2, hist2, err2, _ = dsbc.decode_frames_batched(
        words2, dsbc.init_state(1), n_frames=2)
    assert not np.asarray(err4).any() and not np.asarray(err2).any()
    assert np.array_equal(np.asarray(pcm4)[0, :256], np.asarray(pcm2)[0])
    assert np.asarray(pcm4)[0, 256:].sum() == 0
    assert np.array_equal(np.asarray(hist4), np.asarray(hist2))


def test_mode_mismatch_flags_error():
    import jax.numpy as jnp
    rng = np.random.default_rng(24)
    mono = make_frame(rng.integers(0, 16, (1, 8)), rng=rng, bitpool=28)
    arr = np.frombuffer(mono, np.uint8)[None, None]
    words = jnp.asarray(dsbc.frames_to_words(np.ascontiguousarray(arr)))
    hist = dsbc.init_state(1)
    pcm, hist2, err, _ = dsbc.decode_frames_batched(
        words, hist, n_frames=1, channels=2)
    assert np.asarray(err).all()
    # error frames must not touch the V-history
    assert np.array_equal(np.asarray(hist2), np.asarray(hist))

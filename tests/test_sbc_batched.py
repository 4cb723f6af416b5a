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

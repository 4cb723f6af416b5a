"""Foreign-bitstream validation: the reference's own known-good media.

Every other bit-exactness test decodes streams produced by this repo's
encoder (tools/mpeg1_encode.py), so a shared encoder/decoder misreading
of ISO 11172 would be invisible.  The reference ships two real MPEG-TS
fixtures the builder did NOT author -- the boot splash
(/root/reference/src/splash.h:12, 247 KB, ffmpeg-encoded per
indexer.cpp:302-330) and a test/media stream (vmedia.h:1, 524 KB).
Here both decode through our TS demux -> device decoder and the C++
oracle, frame-by-frame bit-equal; the splash also replays through the
full PlayerSession/Fleet boot pathway (espflix.cpp:699,1043-1058) and
its SBC audio decodes batched-vs-scalar bit-equal.

(vmedia is the stress fixture: 26 KB multi-row-slice P-pictures that
exceed the serving runtime's default 20k-symbol budget; decoding it
caught the silent-truncation bug this suite now guards.)
"""

import numpy as np
import pytest

from espflix_tpu.models import mpeg1 as M
from espflix_tpu.streaming.ts import demux_ts_numpy
from espflix_tpu.tools import oracle, refdata

pytestmark = pytest.mark.skipif(
    not (refdata.available() and oracle.available()),
    reason="reference fixtures or native oracle unavailable")


@pytest.fixture(scope="module")
def splash():
    return demux_ts_numpy(refdata.load("splash"))


@pytest.fixture(scope="module")
def vmedia():
    return demux_ts_numpy(refdata.load("vmedia"))


def _assert_device_matches_oracle(demuxed, label):
    es = demuxed.video
    seq, pics = M.parse_es(es)
    assert (seq.width, seq.height) == (352, 192)
    outs = M.decode_es_batched([es])          # raises on any lane error
    frames, pts = oracle.decode_mpeg1(
        es, max_frames=len(pics) + 2, width=seq.width, height=seq.height)
    assert len(outs[0]) == len(frames) > 0, label
    for k, ((gy, gu, gv), (oy, ou, ov)) in enumerate(zip(outs[0], frames)):
        assert np.array_equal(gy, oy), f"{label} frame {k} Y"
        assert np.array_equal(gu, ou), f"{label} frame {k} U"
        assert np.array_equal(gv, ov), f"{label} frame {k} V"


def test_splash_device_decode_bit_exact(splash):
    _assert_device_matches_oracle(splash, "splash")


def test_vmedia_device_decode_bit_exact(vmedia):
    # covers multi-row slices and >20k-symbol pictures from a foreign
    # encoder (ffmpeg), end to end through the device FSM scan
    _assert_device_matches_oracle(vmedia, "vmedia")


def test_splash_audio_batched_bit_exact(splash):
    """SBC frames from the real splash TS: device batched decoder ==
    scalar golden model, state carried across chunked calls."""
    from espflix_tpu.audio.sbc import SbcDecoder
    from espflix_tpu.models import sbc as dsbc

    blob = b"".join(a.data for a in splash.audio)
    d = SbcDecoder()
    parsed = d.parse_frame(blob)
    assert parsed is not None
    flen = parsed[1]
    ch = d.channels
    n_frames = min(len(blob) // flen, 120)
    frames = [blob[k * flen:(k + 1) * flen] for k in range(n_frames)]
    assert all(f[0] == 0x9C for f in frames)

    dd = SbcDecoder()
    golden = np.concatenate([dd.decode_frame(f)[0] for f in frames])

    import jax.numpy as jnp
    hist = dsbc.init_state(1)
    out = []
    F = 8
    for k in range(0, n_frames - n_frames % F, F):
        arr = np.stack([np.frombuffer(f, np.uint8)
                        for f in frames[k:k + F]])[None]
        words = jnp.asarray(dsbc.frames_to_words(arr))
        pcm, hist, err, _ = dsbc.decode_frames_batched(
            words, hist, n_frames=F, channels=ch)
        assert not np.asarray(err).any()
        out.append(np.asarray(pcm)[0])
    got = np.concatenate(out)
    assert np.array_equal(got.astype(np.int64),
                          golden[:len(got)].astype(np.int64))


def test_splash_fleet_replay_bit_exact(splash):
    """The real splash plays through the boot pathway (play_rom ->
    Fleet) and every presented frame equals the oracle's decode."""
    from espflix_tpu.runtime.player import PlayerSession, State
    from espflix_tpu.runtime.scheduler import Fleet

    es = splash.video
    seq, pics = M.parse_es(es)
    frames, _ = oracle.decode_mpeg1(
        es, max_frames=len(pics) + 2, width=seq.width, height=seq.height)

    s = PlayerSession("file:///nonexistent")
    s.play_rom(refdata.load("splash"))
    fleet = Fleet(1, words_per_lane=8192)
    fleet.attach(0, s)
    got = 0
    for _ in range(3 * len(frames)):
        r = fleet.tick(decode_audio=False)
        assert not r.errors.any()
        if r.video_lanes[0]:
            oy, ou, ov = frames[got]
            assert np.array_equal(r.y[0], oy), f"frame {got} Y"
            assert np.array_equal(r.u[0], ou), f"frame {got} U"
            assert np.array_equal(r.v[0], ov), f"frame {got} V"
            got += 1
        if s.state == State.DONE:
            break
    assert got == len(frames)
    assert s.state == State.DONE

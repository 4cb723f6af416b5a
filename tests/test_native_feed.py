"""Native session feed (native/session_feed.cpp) vs the Python
StreamFeed/EsSegmenter/SbcRing: bit-identical pictures and audio over
the same TS bytes, across randomized chunk fragmentation (including
chunks that split start codes, PES headers, and the sequence header).

The native feed is the production host control plane (the reference
dedicates a CPU core to this pump, espflix.cpp:723-737); the Python
path stays as the portable fallback and as this test's golden model.
"""

import os

import numpy as np
import pytest

from espflix_tpu.audio.sbc import SbcDecoder
from espflix_tpu.runtime.session import StreamFeed
from espflix_tpu.streaming import native_feed as NF
from espflix_tpu.tools import serve_scenario as SS

pytestmark = pytest.mark.skipif(not NF.available(),
                                reason="native lib not built")


def _service_ts(tmp_path, seed=11, n_gops=3, gop=6):
    root = tmp_path / "svc"
    SS.generate_service(str(root), ["t"], seed=seed, n_gops=n_gops,
                        gop=gop)
    return (root / "media" / "t" / "video.ts").read_bytes()


def _probe(data: bytes):
    d = SbcDecoder()
    r = d.parse_frame(data)
    if not r:
        return 0
    return r[1], d.channels, d.blocks


def _drain(feed, ts: bytes, chunks, audio_every=3, max_audio=8):
    """Feed `ts` in the given chunk sizes, popping pictures eagerly
    (mirrors PlayerSession.next_picture's pump loop) and audio every
    few chunks; returns (pictures, audio_arrays, final_state)."""
    pics, audio = [], []
    pos = 0
    k = 0
    for c in chunks:
        feed.feed(ts[pos:pos + c])
        pos += c
        while True:
            p = feed.pop_picture()
            if p is None:
                break
            pics.append(p)
        k += 1
        if k % audio_every == 0 and \
                feed.audio.discover(_probe) and feed.audio.frame_size:
            fa = feed.audio.pop_frames_array(max_audio)
            if fa is not None:
                audio.append(fa.copy())
    assert pos == len(ts)
    feed.eos()
    while True:
        p = feed.pop_picture()
        if p is None:
            break
        pics.append(p)
    if feed.audio.discover(_probe) and feed.audio.frame_size:
        fa = feed.audio.pop_frames_array(4096)
        if fa is not None:
            audio.append(fa.copy())
    return pics, audio


def _compare(ts, chunks):
    os.environ["ESPFLIX_NATIVE_FEED"] = "1"
    want = _drain(StreamFeed(), ts, chunks)
    got = _drain(NF.NativeStreamFeed(), ts, chunks)
    wp, wa = want
    gp, ga = got
    assert len(wp) == len(gp), (len(wp), len(gp))
    for i, (a, b) in enumerate(zip(wp, gp)):
        assert a.pic_type == b.pic_type, i
        assert a.full_pel == b.full_pel, i
        assert a.r_size == b.r_size, i
        assert a.pts == b.pts, i
        assert a.payload == b.payload, i
        assert a.slice_offsets == b.slice_offsets, i
        assert a.slice_rows == b.slice_rows, i
        assert a.seq.width == b.seq.width and \
            a.seq.height == b.seq.height, i
        assert np.array_equal(a.seq.intra_q, b.seq.intra_q), i
        assert np.array_equal(a.seq.non_intra_q, b.seq.non_intra_q), i
    wa = np.concatenate([x.reshape(-1) for x in wa]) if wa else \
        np.zeros(0, np.uint8)
    ga = np.concatenate([x.reshape(-1) for x in ga]) if ga else \
        np.zeros(0, np.uint8)
    assert np.array_equal(wa, ga)
    assert len(wp) > 0


def test_bulk_chunks(tmp_path):
    ts = _service_ts(tmp_path)
    _compare(ts, [len(ts)])


def test_packet_sized_chunks(tmp_path):
    ts = _service_ts(tmp_path)
    n = len(ts)
    chunks = [188 * 4] * (n // (188 * 4))
    rem = n - sum(chunks)
    if rem:
        chunks.append(rem)
    _compare(ts, chunks)


def test_ragged_chunks_split_everything(tmp_path):
    """Chunk sizes prime-ish and tiny: TS packets, PES headers, start
    codes and the sequence header all get split across feeds."""
    ts = _service_ts(tmp_path, seed=5)
    rng = np.random.default_rng(3)
    chunks = []
    left = len(ts)
    while left > 0:
        c = min(int(rng.integers(1, 601)), left)
        chunks.append(c)
        left -= c
    _compare(ts, chunks)


def test_pool_recycles_lanes_under_churn():
    """Continuous batching replaces a session's feed on every
    play()/nav(); pool lanes must recycle (no leak) and a recycled
    lane must start clean."""
    import gc
    pool = NF.get_pool()
    free0 = len(pool._free)
    for _ in range(3):
        feeds = [NF.NativeStreamFeed() for _ in range(128)]
        for fd in feeds:
            fd.feed(b"\x47" + b"\x00" * 187)  # arbitrary TS packet
        del feeds, fd
        gc.collect()
        assert len(pool._free) == free0
    f = NF.NativeStreamFeed()
    assert f.pop_picture() is None            # clean state
    assert not f.sync_lost
    del f
    gc.collect()
    assert len(pool._free) == free0


def test_batched_pop_matches_per_lane(tmp_path):
    """Fleet._gather_pictures' batched sf_pop_pictures fast path must
    deliver the identical picture sequence (per-lane op order: pop,
    pump on miss, pop, DONE at EOS) as the per-lane path."""
    root = tmp_path / "svcb"
    SS.generate_service(str(root), ["a", "b"], seed=9, n_gops=2,
                        gop=6)
    url = "file://" + str(root)

    def run(batched):
        os.environ["ESPFLIX_BATCHED_POP"] = "1" if batched else "0"
        try:
            fleet = SS_build(url)
            seqs = []
            for _ in range(20):
                pics, pts, pre = fleet._gather_pictures()
                seqs.append([
                    (p.pic_type, p.pts, p.payload, s.state.name)
                    if p else (None, s.state.name)
                    for p, s in zip(pics, fleet.sessions)])
            return seqs
        finally:
            os.environ.pop("ESPFLIX_BATCHED_POP", None)

    def SS_build(url):
        from espflix_tpu.tools.serve_scenario import build_fleet
        return build_fleet(url, 8, 2, words_per_lane=8192)

    assert run(True) == run(False)


def test_packed_gather_matches_classic_batch(tmp_path):
    """_gather_batch_packed (pops land directly in the device batch
    layout via sf_pop_pictures_packed) must produce bit-identical
    batches to the classic _gather_pictures + make_picture_batch path,
    tick for tick, including pts, containment flags and session
    states."""
    from espflix_tpu.models import mpeg1 as M
    from espflix_tpu.tools.serve_scenario import build_fleet
    root = tmp_path / "svcp"
    SS.generate_service(str(root), ["a", "b"], seed=17, n_gops=2,
                        gop=6)
    url = "file://" + str(root)

    def run(packed):
        os.environ["ESPFLIX_PACKED_POP"] = "1" if packed else "0"
        try:
            fleet = build_fleet(url, 8, 2, words_per_lane=8192)
            out = []
            for _ in range(20):
                g = fleet._gather_batch_packed()
                if g is not None:
                    b, pts, pre = g
                else:
                    pics, pts, pre = fleet._gather_pictures()
                    b = M.make_picture_batch(
                        pics, words_per_lane=fleet.words_per_lane,
                        max_slices=fleet.mb_h,
                        geometry=(fleet.mb_w, fleet.mb_h))
                states = [s.state.name if s else None
                          for s in fleet.sessions]
                # the packed batch views the fleet's PERSISTENT
                # buffers (production consumes them within the tick);
                # holding ticks for comparison requires copies
                b = {k: (v.copy() if isinstance(v, np.ndarray) else v)
                     for k, v in b.items()}
                out.append((b, np.asarray(pts).copy(), pre.copy(),
                            states))
            return out
        finally:
            os.environ.pop("ESPFLIX_PACKED_POP", None)

    A = run(True)
    B = run(False)
    saw_active = False
    for t, ((ba, ptsa, prea, sta), (bb, ptsb, preb, stb)) in \
            enumerate(zip(A, B)):
        assert sta == stb, t
        assert np.array_equal(ptsa, ptsb), t
        assert np.array_equal(prea, preb), t
        act_a, act_b = np.asarray(ba["active"]), np.asarray(bb["active"])
        assert np.array_equal(act_a, act_b), t
        for k in ("pic_type", "full_pel", "r_size", "n_slices",
                  "n_words"):
            assert np.array_equal(np.asarray(ba[k]),
                                  np.asarray(bb[k])), (t, k)
        act = act_a
        if act.any():
            saw_active = True
            # active rows must match EXACTLY, including the zero tails
            # (the native side re-zeroes each row's stale region)
            assert np.array_equal(ba["words"][act], bb["words"][act]), t
            for k in ("slice_starts", "slice_rows", "intra_q",
                      "non_intra_q"):
                assert np.array_equal(np.asarray(ba[k])[act],
                                      np.asarray(bb[k])[act]), (t, k)
    assert saw_active


def test_player_session_uses_native(tmp_path):
    """The factory returns the native feed and a session plays
    through it end to end."""
    from espflix_tpu.runtime.player import PlayerSession
    root = tmp_path / "svc2"
    SS.generate_service(str(root), ["t"], seed=2, n_gops=2, gop=6)
    os.environ.pop("ESPFLIX_NATIVE_FEED", None)
    s = PlayerSession("file://" + str(root))
    assert s.init_service()
    s.nav(0)
    s.play_pause()
    assert isinstance(s.feed, NF.NativeStreamFeed)
    got = 0
    for _ in range(64):
        p = s.next_picture()
        if p is None:
            break
        got += 1
    assert got >= 6

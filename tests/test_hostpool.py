"""Host worker pool (runtime/hostpool.py): the session control plane
sharded across processes must drive the same device chain results as
in-process sessions (SURVEY.md 2.3 comm backend; the reference's
pump-per-core topology, espflix.cpp:723-737)."""

import numpy as np
import pytest

from espflix_tpu.runtime.hostpool import HostPool
from espflix_tpu.runtime.player import PlayerSession
from espflix_tpu.runtime.scheduler import Fleet
from espflix_tpu.tools.indexer import make_service
from espflix_tpu.tools.sbc_encode import random_frame


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("svcpool"))
    rng = np.random.default_rng(9)
    audio = [(random_frame(rng, mode=0, bitpool=28), k * 240)
             for k in range(200)]
    make_service(d, ["one"], seed=9, n_gops=3, gop=4,
                 audio_frames=audio)
    return d


def test_pooled_full_chain_matches_inprocess(service):
    url = "file://" + service
    n = 2

    # in-process reference fleet
    f1 = Fleet(n, words_per_lane=8192, parser="pallas", output=True)
    for i in range(n):
        s = PlayerSession(url)
        assert s.init_service()
        s.nav(0)
        s.play_pause()
        f1.attach(i, s)
    ref = f1.run_chunk_full(3, tap_lanes=(0,))

    # pooled fleet: 2 workers x 1 lane
    f2 = Fleet(n, words_per_lane=8192, parser="pallas", output=True)
    pool = HostPool(n, 2, 8192, f2.mb_w, f2.mb_h)
    try:
        for i in range(n):
            assert pool.attach(i, url)
            pool.call(i, "nav", 0)
            pool.call(i, "play_pause")
            assert pool.state(i) == "PLAYING"
        got = pool_res = f2.run_chunk_full_pooled(pool, 3,
                                                 tap_lanes=(0,))
        assert len(got) == 3
        for a, b in zip(ref, got):
            assert np.array_equal(a.video_lanes, b.video_lanes)
            assert np.array_equal(a.pts, b.pts)
            assert np.array_equal(a.errors, b.errors)
            assert np.array_equal(a.field_sum, b.field_sum)
            assert np.array_equal(a.pdm_sum, b.pdm_sum)
            assert np.array_equal(np.asarray(a.tap_fields),
                                  np.asarray(b.tap_fields))
            assert np.array_equal(np.asarray(a.tap_pdm),
                                  np.asarray(b.tap_pdm))
        # snapshot/restore round-trips through the pool
        snaps = pool.snapshot()
        assert len(snaps) == n and all(s is not None for s in snaps)
        assert pool.restore(snaps) == n
    finally:
        pool.close()

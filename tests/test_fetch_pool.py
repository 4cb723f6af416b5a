"""FetchPool: pooled prefetch with bounded queues and EOS semantics."""

import os

import numpy as np

from espflix_tpu.streaming.fetch_pool import FetchPool
from espflix_tpu.tools.indexer import make_service


def test_fetch_pool_file_streams(tmp_path):
    root = str(tmp_path / "svc")
    make_service(root, ["t"], seed=5, n_gops=1, gop=4)
    path = os.path.join(root, "media/t/video.ts")
    want = open(path, "rb").read()

    pool = FetchPool(workers=4)
    assert pool.open(1, "file://" + path)
    assert pool.open(2, "file://" + path, offset=188 * 4)

    def drain(key):
        out = b""
        for _ in range(100000):
            c = pool.poll(key)
            if c is None:
                continue
            if c == b"":
                break
            out += c
        return out

    assert drain(1) == want
    assert drain(2) == want[188 * 4:]
    pool.close(1)
    pool.shutdown()


def test_fetch_pool_missing_file():
    pool = FetchPool(workers=1)
    assert not pool.open(1, "file:///nonexistent/xyz.ts")
    pool.shutdown()


def test_streamer_retries_transient_failures(tmp_path, monkeypatch):
    """get() retries with backoff: a path that appears on the second
    attempt succeeds (SURVEY.md 5.3 host fetch retry)."""
    from espflix_tpu.streaming.streamer import Streamer

    target = tmp_path / "late.bin"
    calls = {"n": 0}
    st = Streamer(retries=3, backoff=0.01)
    orig = st._get_once

    def flaky(url, offset=0, length=0):
        calls["n"] += 1
        if calls["n"] == 2:
            target.write_bytes(b"hello world")
        return orig(url, offset, length)

    st._get_once = flaky
    assert st.get("file://" + str(target)) == 0
    assert calls["n"] == 2
    assert st.read(11) == b"hello world"
    st.close()


def test_streamer_gives_up_after_retries(tmp_path):
    from espflix_tpu.streaming.streamer import Streamer
    st = Streamer(retries=2, backoff=0.01)
    assert st.get("file://" + str(tmp_path / "missing.bin")) == -1

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

"""Regression: a sequence header split across feed chunks must parse
correctly (both feeds).

BitReader pads reads past the end with the EOS pattern, so the old
segmenter, on seeing the 00 00 01 B3 code with fewer than 8 bytes of
header behind it, parsed EOS bytes as geometry and cached the garbage
(seq parsed once per absolute position).  Both the Python EsSegmenter
and the native feed now defer the parse until the load-flag-dependent
header length has arrived.
"""

import numpy as np
import pytest

from espflix_tpu.runtime.session import StreamFeed
from espflix_tpu.streaming import native_feed as NF
from espflix_tpu.tools import serve_scenario as SS


def _ts(tmp_path):
    root = tmp_path / "svc"
    SS.generate_service(str(root), ["t"], seed=11, n_gops=1, gop=6)
    return (root / "media" / "t" / "video.ts").read_bytes()


FEEDS = [StreamFeed] + ([NF.NativeStreamFeed] if NF.available() else [])


@pytest.mark.parametrize("mk", FEEDS)
def test_seq_header_split_mid_header(tmp_path, mk):
    ts = _ts(tmp_path)
    # the first sequence header's B3 code starts at TS offset 18; cut
    # the first chunk a few bytes into the header so width/height and
    # the quant-matrix load flags are NOT in the first feed
    for cut in (23, 24, 26, 29):
        feed = mk()
        feed.feed(ts[:cut])
        assert feed.pop_picture() is None
        feed.feed(ts[cut:])
        p = feed.pop_picture()
        assert p is not None
        assert (p.seq.width, p.seq.height) != (0, 0)
        # the generator's content geometry
        assert p.seq.width % 16 == 0 or p.seq.width > 0
        assert 16 <= p.seq.width <= 4095 and 16 <= p.seq.height <= 4095
        # golden: same stream in one feed
        ref = mk()
        ref.feed(ts)
        q = ref.pop_picture()
        assert (p.seq.width, p.seq.height) == (q.seq.width,
                                               q.seq.height)
        assert np.array_equal(p.seq.intra_q, q.seq.intra_q)
        assert np.array_equal(p.seq.non_intra_q, q.seq.non_intra_q)
        assert p.payload == q.payload

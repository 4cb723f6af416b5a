"""SBC decode: scalar golden model vs native oracle vs batched device.

The scalar model (audio/sbc.py) and the native oracle
(oracle/sbc_oracle.cpp) are independent implementations of the reference
semantics (/root/reference/src/sbc_decoder.cpp); the batched device
decoder (models/sbc.py) must match them bit-for-bit.
"""

import numpy as np
import pytest

from espflix_tpu.audio.sbc import SbcDecoder, bit_allocation
from espflix_tpu.tools import oracle
from espflix_tpu.tools.sbc_encode import make_frame, random_frame

needs_oracle = pytest.mark.skipif(
    not oracle.available(), reason="oracle lib not buildable")


def test_frame_size_matches_service_operating_point():
    # 48kHz mono loudness bitpool 28 -> 64-byte frames (README.md:58,
    # video.cpp:952-955: 192kb/s = 64B per 128 samples)
    rng = np.random.default_rng(0)
    f = make_frame(np.full((1, 8), 8), rng=rng, bitpool=28)
    assert len(f) == 64
    pcm, ln = SbcDecoder().decode_frame(f)
    assert ln == 64 and pcm.shape == (128,)


@needs_oracle
@pytest.mark.parametrize("mode", [0, 2])
def test_scalar_vs_oracle_random_frames(mode):
    rng = np.random.default_rng(100 + mode)
    py = SbcDecoder()
    oc = oracle.SbcOracle()
    for k in range(60):
        f = random_frame(rng, mode=mode)
        pa, la = py.decode_frame(f)
        pb, lb = oc.decode_frame(f)
        assert la == lb == len(f)
        assert np.array_equal(pa, pb), k


@needs_oracle
def test_scalar_vs_oracle_streamed_state():
    # state (v ring) carries across frames; decode a long frame sequence
    rng = np.random.default_rng(7)
    py = SbcDecoder()
    oc = oracle.SbcOracle()
    for k in range(200):
        f = random_frame(rng, mode=0, bitpool=int(rng.integers(8, 64)))
        pa, _ = py.decode_frame(f)
        pb, _ = oc.decode_frame(f)
        assert np.array_equal(pa, pb), k


def test_bit_allocation_snr_and_loudness_sum_to_bitpool_bound():
    rng = np.random.default_rng(5)
    for _ in range(50):
        sf = rng.integers(0, 16, (1, 8))
        bp = int(rng.integers(2, 120))
        for alloc in (0, 1):
            bits = bit_allocation(sf, bp, 1, 3, alloc, 8)
            assert (bits >= 0).all() and (bits <= 16).all()
            assert bits.sum() <= bp

"""Batched device decoder vs scalar golden model: bit-exact YUV.

Every lane of the batched decoder (vlc_scan FSM + dense IDCT/mocomp)
must reproduce core/refdec.py exactly on randomized streams.
"""

import numpy as np
import pytest

from espflix_tpu.core.refdec import Mpeg1Decoder
from espflix_tpu.models import mpeg1 as M
from espflix_tpu.tools import mpeg1_encode as E


def ref_decode(es):
    return Mpeg1Decoder().decode_es(es)


def check_lanes(streams):
    outs = M.decode_es_batched(streams)
    for lane, es in enumerate(streams):
        ref = ref_decode(es)
        got = outs[lane]
        assert len(got) == len(ref), f"lane {lane} frame count"
        for k, (rf, (gy, gu, gv)) in enumerate(zip(ref, got)):
            assert np.array_equal(rf.y, gy), f"lane {lane} frame {k} Y"
            assert np.array_equal(rf.u, gu), f"lane {lane} frame {k} U"
            assert np.array_equal(rf.v, gv), f"lane {lane} frame {k} V"


# Small frames keep XLA compile times reasonable on the 1-core CPU host;
# decode semantics are resolution-independent.  One full-size test below.
SMALL = dict(width=96, height=64)


def test_single_lane_ip_full_size():
    rng = np.random.default_rng(22)
    sc = E.random_script(rng, n_pictures=3, max_coeffs=8)
    check_lanes([E.encode_es(sc)])


def test_four_lanes_divergent_streams():
    streams = []
    for seed in (31, 32, 33, 34):
        rng = np.random.default_rng(seed)
        sc = E.random_script(rng, n_pictures=4, max_coeffs=10, **SMALL)
        streams.append(E.encode_es(sc))
    check_lanes(streams)


def test_lanes_with_different_lengths():
    rng = np.random.default_rng(44)
    a = E.encode_es(E.random_script(rng, n_pictures=4, **SMALL))
    b = E.encode_es(E.random_script(rng, n_pictures=2, **SMALL))
    check_lanes([a, b])


@pytest.mark.parametrize("seed", [101, 202])
def test_dense_coefficients(seed):
    rng = np.random.default_rng(seed)
    sc = E.random_script(rng, n_pictures=2, max_coeffs=30, **SMALL)
    check_lanes([E.encode_es(sc)])

"""C++ oracle vs Python scalar decoder: bit-exact YUV agreement.

Two independent implementations of the reference decode semantics
(native C++ in oracle/mpeg1_oracle.cpp, numpy in core/refdec.py) must
produce identical planes on randomized streams covering every VLC table,
escapes, skips, half-pel phases and custom quant matrices.
"""

import numpy as np
import pytest

from espflix_tpu.core.refdec import Mpeg1Decoder
from espflix_tpu.tools import mpeg1_encode as E
from espflix_tpu.tools import oracle

pytestmark = pytest.mark.skipif(
    not oracle.available(), reason="oracle lib not buildable")


def assert_oracle_matches(script, label=""):
    es = E.encode_es(script)
    ref_frames = Mpeg1Decoder().decode_es(es)
    orc_frames, pts = oracle.decode_mpeg1(
        es, max_frames=len(ref_frames) + 2,
        width=script["width"], height=script["height"])
    assert len(orc_frames) == len(ref_frames), label
    for k, (rf, (oy, ou, ov)) in enumerate(zip(ref_frames, orc_frames)):
        assert np.array_equal(rf.y, oy), f"{label} frame {k} Y mismatch"
        assert np.array_equal(rf.u, ou), f"{label} frame {k} U mismatch"
        assert np.array_equal(rf.v, ov), f"{label} frame {k} V mismatch"
        assert rf.pts == pts[k]


@pytest.mark.parametrize("seed", range(8))
def test_random_streams_bit_exact(seed):
    rng = np.random.default_rng(seed + 1000)
    sc = E.random_script(rng, n_pictures=4, max_coeffs=12)
    assert_oracle_matches(sc, f"seed{seed}")


def test_dense_coefficients_bit_exact():
    rng = np.random.default_rng(7)
    sc = E.random_script(rng, n_pictures=2, max_coeffs=40, p_frames=True)
    assert_oracle_matches(sc, "dense")


def test_full_pel_and_high_fcode():
    rng = np.random.default_rng(11)
    for _ in range(6):
        sc = E.random_script(rng, n_pictures=3)
        if any(p.get("full_pel") for p in sc["pictures"]):
            break
    assert_oracle_matches(sc, "full_pel")


def test_tiny_quant_oddification_bit_exact():
    """Custom all-ones quant matrices with qscale 1: dequant truncates
    small coefficients to zero and the reference oddification maps them
    to +1 (player.cpp:1114-1115).  Oracle and scalar must agree on a
    stream built to exercise that path (ADVICE r1)."""
    from tests.test_decode_batched import _tiny_quant_script
    assert_oracle_matches(_tiny_quant_script(), "tiny_quant")

"""Exhaustive unit tests of C-semantics helpers vs a ctypes C compilation.

These helpers carry the bit-exactness contract (SURVEY.md "hard parts" #2):
truncating division, (int8_t) casts, oddification, DC delta trick.
"""

import numpy as np

from espflix_tpu.utils import strict_int as si


def test_div_trunc_scalar_and_array():
    for a in range(-1000, 1000, 7):
        for b in (1, 2, 16, 31):
            expect = int(a / b) if b else 0  # python trunc division
            assert si.div_trunc(a, b) == expect
    a = np.arange(-5000, 5000, dtype=np.int32)
    got = si.div_trunc(a, 16)
    want = (np.abs(a) // 16) * np.sign(a)
    assert np.array_equal(got, want)


def test_as_int8():
    assert si.as_int8(0x7F) == 127
    assert si.as_int8(0x80) == -128
    assert si.as_int8(0x1FF) == -1
    a = np.arange(0, 512, dtype=np.int32)
    got = si.as_int8(a)
    want = ((a & 0xFF).astype(np.int8)).astype(np.int32)
    assert np.array_equal(got, want)


def test_dc_delta_matches_reference_semantics():
    # player.cpp:1053-1057 scalar model
    def ref(prev, dc_size, delta):
        if dc_size == 0:
            return prev
        if delta & (1 << (dc_size - 1)):
            return prev + delta
        return prev + ((-1 << dc_size) | (delta + 1))

    for dc_size in range(0, 9):
        for delta in range(0, 1 << max(dc_size, 1)):
            assert si.dc_delta(128, dc_size, delta) == ref(128, dc_size, delta)
    # array path
    ds = np.array([3, 3, 0, 8], dtype=np.int32)
    de = np.array([5, 2, 0, 255], dtype=np.int32)
    got = si.dc_delta(np.full(4, 128, np.int32), ds, de)
    want = np.array([ref(128, int(a), int(b)) for a, b in zip(ds, de)])
    assert np.array_equal(got, want)


def test_dequant_exact_vs_scalar_model():
    # scalar C model of player.cpp:1110-1121
    def ref(level, intra, qs, q):
        v = level * 2
        if not intra:
            v += -1 if v < 0 else (1 if v > 0 else 0)
        num = v * qs * q
        v = -((-num) // 16) if num < 0 else num // 16
        # player.cpp:1114-1115 `v -= v>0 ? 1 : -1`: a truncated-to-zero
        # v becomes +1.  level==0 (absent coefficient) stays 0.
        if (v & 1) == 0 and level != 0:
            v -= 1 if v > 0 else -1
        return max(-2048, min(2047, v))

    rng = np.random.default_rng(1)
    levels = rng.integers(-255, 256, 4096).astype(np.int32)
    intra = rng.integers(0, 2, 4096).astype(bool)
    qs = rng.integers(1, 32, 4096).astype(np.int32)
    q = rng.integers(1, 128, 4096).astype(np.int32)
    got = si.dequant_array(levels, intra, qs, q)
    want = np.array(
        [ref(int(l), bool(i), int(s), int(m))
         for l, i, s, m in zip(levels, intra, qs, q)],
        dtype=np.int32,
    )
    assert np.array_equal(got, want)
    # scalar path agrees
    for k in range(0, 4096, 517):
        assert si.dequant_array(
            int(levels[k]), bool(intra[k]), int(qs[k]), int(q[k])
        ) == int(want[k])


def test_dequant_jax_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    levels = rng.integers(-255, 256, 512).astype(np.int32)
    intra = rng.integers(0, 2, 512).astype(bool)
    qs = rng.integers(1, 32, 512).astype(np.int32)
    q = rng.integers(1, 128, 512).astype(np.int32)
    np_out = si.dequant_array(levels, intra, qs, q)
    jx_out = si.dequant_array(
        jnp.asarray(levels), jnp.asarray(intra), jnp.asarray(qs),
        jnp.asarray(q))
    assert np.array_equal(np.asarray(jx_out), np_out)


def test_pin_248():
    a = np.array([-300, -1, 0, 100, 248, 249, 511], dtype=np.int32)
    assert np.array_equal(si.pin_248(a), [0, 0, 0, 100, 248, 248, 248])

"""The Pallas field-pair kernel is byte-exact vs the XLA composite
chain (ops/composite.py), which is itself pinned byte-for-byte to the
reference's video ISR semantics (reference video.cpp:1122-1198,
806-934) by tests/test_composite.py."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from espflix_tpu.ops import composite as CO
from espflix_tpu.ops import composite_pallas as CP

# interpret=True runs the kernel logic on CPU in CI; flips to
# compiled Mosaic on real hardware when ESPFLIX_TEST_TPU=1 (the
# recorded TPU suite run).
INTERP = not bool(os.environ.get("ESPFLIX_TEST_TPU"))


@pytest.mark.parametrize("pal", [False, True])
def test_field_pair_packed_matches_xla(rng, pal):
    N = 3
    y = jnp.asarray(rng.integers(0, 256, (N, 192, 352), dtype=np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (N, 96, 176), dtype=np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (N, 96, 176), dtype=np.uint8))
    par = jnp.asarray(rng.integers(0, 2, (N,), dtype=np.int32))
    osd = jnp.asarray(rng.integers(0, 256, (N, 16, 80), dtype=np.uint8))
    # blend covers: hidden (0), fading (<32), full (-1/33+)
    blend = jnp.asarray(np.array([-1, 0, 17], dtype=np.int32))
    prog = jnp.asarray(np.array([0, 100, 240], dtype=np.int32))
    ref = np.asarray(CO.synthesize_field_pair(
        y, u, v, par, osd, blend, prog, pal=pal))
    got = np.asarray(CP.synthesize_field_pair_pallas(
        y, u, v, par, osd, blend, prog, pal=pal, interpret=INTERP))
    assert got.dtype == ref.dtype and got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("pal", [False, True])
def test_parts_form_matches_full_canvas(rng, pal):
    """The production parts form (per-field active pairs + shared OSD
    strip, runtime/chain.py) reconstructs the exact full canvas and
    reproduces packed_byte_sum via the template constants."""
    N = 3
    y = jnp.asarray(rng.integers(0, 256, (N, 192, 352), dtype=np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (N, 96, 176), dtype=np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (N, 96, 176), dtype=np.uint8))
    par = jnp.asarray(rng.integers(0, 2, (N,), dtype=np.int32))
    osd = jnp.asarray(rng.integers(0, 256, (N, 16, 80), dtype=np.uint8))
    blend = jnp.asarray(np.array([-1, 0, 17], dtype=np.int32))
    prog = jnp.asarray(np.array([0, 100, 240], dtype=np.int32))
    ref = np.asarray(CO.synthesize_field_pair(
        y, u, v, par, osd, blend, prog, pal=pal))
    act, strip, chk = CP.synthesize_field_pair_parts(
        y, u, v, par, osd, blend, prog, pal=pal, interpret=INTERP)
    canvas = CP.assemble_canvas_packed(act, strip, pal=pal)
    np.testing.assert_array_equal(np.asarray(CP.unpack_fields(canvas)),
                                  ref)
    np.testing.assert_array_equal(
        np.asarray(CP.field_parts_byte_sum(act, strip, pal=pal)),
        ref.astype(np.int64).sum(axis=(1, 2, 3)))
    # the in-kernel per-lane byte sum (the chain's field_sum) equals
    # the post-hoc reduction over the parts
    np.testing.assert_array_equal(
        np.asarray(chk), ref.astype(np.int64).sum(axis=(1, 2, 3)))


def test_packed_byte_sum_matches_unpacked(rng):
    N = 2
    y = jnp.asarray(rng.integers(0, 256, (N, 192, 352), dtype=np.uint8))
    u = jnp.asarray(rng.integers(0, 256, (N, 96, 176), dtype=np.uint8))
    v = jnp.asarray(rng.integers(0, 256, (N, 96, 176), dtype=np.uint8))
    par = jnp.zeros((N,), jnp.int32)
    osd = jnp.zeros((N, 16, 80), jnp.uint8)
    blend = jnp.zeros((N,), jnp.int32)
    prog = jnp.zeros((N,), jnp.int32)
    packed = CP.synthesize_field_pair_packed(
        y, u, v, par, osd, blend, prog, pal=False, interpret=INTERP)
    want = np.asarray(CP.unpack_fields(packed)).astype(np.int64)
    got = np.asarray(CP.packed_byte_sum(packed))
    np.testing.assert_array_equal(got, want.sum(axis=(1, 2, 3)))

"""Pallas fused dequant+IDCT kernel: bit-exact vs the jnp path."""

import os

import numpy as np

# compiled Mosaic on real hardware when ESPFLIX_TEST_TPU=1 (the
# recorded per-round TPU suite run); interpret mode on the CPU mesh
INTERP = not bool(os.environ.get("ESPFLIX_TEST_TPU"))
import jax.numpy as jnp

from espflix_tpu.ops import idct as J
from espflix_tpu.ops.idct_pallas import block_residuals_pallas


def test_pallas_idct_bit_exact_interpret():
    rng = np.random.default_rng(3)
    N, MB = 2, 12
    levels = rng.integers(-255, 256, (N, MB, 6, 64)).astype(np.int32)
    levels[..., 0] = rng.integers(0, 256, (N, MB, 6))
    intra = rng.integers(0, 2, (N, MB, 6)).astype(bool)
    qscale = rng.integers(1, 32, (N, MB, 6)).astype(np.int32)
    qmat = rng.integers(1, 128, (N, MB, 6, 64)).astype(np.int32)
    nfinal = rng.integers(0, 65, (N, MB, 6)).astype(np.int32)

    want = np.asarray(J.block_residuals(
        jnp.asarray(levels), jnp.asarray(intra), jnp.asarray(qscale),
        jnp.asarray(qmat), jnp.asarray(nfinal)))
    got = np.asarray(block_residuals_pallas(
        jnp.asarray(levels), jnp.asarray(intra), jnp.asarray(qscale),
        jnp.asarray(qmat), jnp.asarray(nfinal), interpret=INTERP))
    assert np.array_equal(want, got)


def test_flat_idct_and_residuals_bit_exact():
    """idct_8x8_flat / block_residuals_flat must match the [.., 8, 8]
    forms bit-exactly (same dequant, rounding, shortcut paths)."""
    from espflix_tpu.ops import idct as I

    rng = np.random.default_rng(9)
    B = 257
    levels = jnp.asarray(rng.integers(-300, 300, (B, 64), np.int32))
    intra = jnp.asarray(rng.random(B) < 0.5)
    qs = jnp.asarray(rng.integers(1, 31, B, dtype=np.int32))
    qmat = jnp.asarray(rng.integers(8, 80, (B, 64), dtype=np.int32))
    nf = jnp.asarray(rng.integers(0, 64, B, dtype=np.int32))

    b = I.dequant_levels(levels, intra, qs, qmat)
    want = np.asarray(I.idct_8x8(b.reshape(B, 8, 8))).reshape(B, 64)
    got = np.asarray(I.idct_8x8_flat(b))
    assert np.array_equal(got, want)

    wr = np.asarray(I.block_residuals(
        levels, intra, qs, qmat, nf)).reshape(B, 64)
    gr = np.asarray(I.block_residuals_flat(levels, intra, qs, qmat, nf))
    assert np.array_equal(gr, wr)


def test_transposed_residuals_pallas_bit_exact():
    """block_residuals_T_pallas (the one-pass VMEM-resident transposed
    kernel) must match idct.block_residuals_T + int16 cast bit-exactly
    over random levels/intra/qscale/nfinal, including the nfinal==0
    (uncoded) and nfinal==1 non-intra (DC shortcut) paths."""
    import jax.numpy as jnp
    from espflix_tpu.ops import idct as J
    from espflix_tpu.ops.idct_pallas import block_residuals_T_pallas

    rng = np.random.default_rng(21)
    for (N, BL) in ((2, 36), (1, 1584)):
        coeffs = rng.integers(-300, 300, (N, 64, BL)).astype(np.int16)
        coeffs[:, 0] = rng.integers(0, 256, (N, BL))
        intra = rng.random((N, BL)) < 0.5
        qs = rng.integers(1, 32, (N, BL)).astype(np.int32)
        iq = rng.integers(1, 128, (N, 64)).astype(np.int32)
        nq = rng.integers(1, 128, (N, 64)).astype(np.int32)
        nf = rng.integers(0, 65, (N, BL)).astype(np.int32)

        qmat_T = np.where(intra[:, None, :], iq[:, :, None],
                          nq[:, :, None])
        want = np.asarray(J.block_residuals_T(
            jnp.asarray(coeffs).astype(jnp.int32), jnp.asarray(intra),
            jnp.asarray(qs), jnp.asarray(qmat_T),
            jnp.asarray(nf))).astype(np.int16)
        got = np.asarray(block_residuals_T_pallas(
            jnp.asarray(coeffs), jnp.asarray(intra), jnp.asarray(qs),
            jnp.asarray(iq), jnp.asarray(nq), jnp.asarray(nf),
            interpret=INTERP))
        assert np.array_equal(want, got), (N, BL)

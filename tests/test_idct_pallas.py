"""Pallas fused dequant+IDCT kernel: bit-exact vs the jnp path."""

import numpy as np
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
        jnp.asarray(qmat), jnp.asarray(nfinal), interpret=True))
    assert np.array_equal(want, got)

"""Pallas TPU kernel: the second-order delta-sigma modulator.

The lax.scan form (ops/delta_sigma.py) is latency-bound on its serial
bit recurrence -- 53k dependent iterations per 13-frame tick -- and
pays scan-step overheads (operand slicing, carry marshalling) on top:
~9 ms of the 1024-lane tick for <1 ms of arithmetic.  This kernel runs
the whole recurrence inside one Pallas program with the three state
integers (i0, i1, i2; espflix.ino:75-77) living in vector registers:

  * PCM arrives transposed to [T, 8, 128] so ONE time step is exactly
    one (8, 128) int32 vreg covering 1024 lanes -- every bit iteration
    is a handful of full-width VPU ops with no layout change;
  * everything is fully unrolled at compile time: the grid walks the
    sample axis in C-sample chunks whose ref indices are all static
    (a fori_loop with dynamic leading-dim indexing measured ~200 us
    PER ITERATION on Mosaic), with the carried state in VMEM scratch
    across the sequential grid;
  * output words are written once each; the carried modulator state
    goes out as a second ref so streams chunk arbitrarily (bit-exact
    state handoff, same contract as delta_sigma.modulate).

Bit semantics are exactly the reference's pdm_second_order
(/root/reference/espflix.ino:73-107): i0=(i0+s)>>1 per modulator tick,
i1 += i0 -+ a1 - (i2>>7), i2 += i1 -+ a2, MSB-first packing; pinned
byte-identical to delta_sigma.modulate by tests/test_pdm_pallas.py.

MEASURED OUTCOME (real v5e, recorded negative result): this kernel is
NOT the production path.  A Mosaic micro-benchmark of the underlying
dependent vector chain runs at ~38.6 us per dependent-pair iteration
serially and ~1.5 us/iter with 26-way ILP -- both orders of magnitude
above XLA's effective ~170 ns/iter on the same recurrence (the
4-sample-batched lax.scan in ops/delta_sigma.py, ~9 ms per 1024-lane
tick).  Mosaic appears to serialize long loop-carried vector chains
through VMEM rather than keeping them in vregs.  The kernel stays as a
bit-exact alternative backend and documentation of that finding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from espflix_tpu.ops.delta_sigma import A1, A2


def _half_tick(i0, i1, i2, s):
    i0 = (i0 + s) >> 1
    bits = jnp.zeros_like(i0)
    for _ in range(16):
        pos = i2 >= 0
        i1 = i1 + i0 + jnp.where(pos, -A1, A1) - (i2 >> 7)
        i2 = i2 + i1 + jnp.where(pos, -A2, A2)
        bits = (bits << 1) | pos.astype(jnp.int32)
    return i0, i1, i2, bits


def _kernel(pcm_ref, st_ref, out_ref, stout_ref, acc_ref, *, C,
            n_chunks):
    """One grid step = C samples, all indices STATIC (a fori_loop with
    dynamic ref indexing measured ~200us/iteration on Mosaic; the
    fully unrolled static form is ~3 orders faster).  The modulator
    state rides across the sequential grid in the acc_ref scratch."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        acc_ref[...] = st_ref[...]

    i0 = acc_ref[0]
    i1 = acc_ref[1]
    i2 = acc_ref[2]
    for t in range(C):
        s = pcm_ref[t]
        # two modulator ticks per sample, the sample loads on both
        # (write_pcm_16, espflix.ino:123-145)
        i0, i1, i2, b0 = _half_tick(i0, i1, i2, s)
        i0, i1, i2, b1 = _half_tick(i0, i1, i2, s)
        out_ref[2 * t] = b0
        out_ref[2 * t + 1] = b1
    acc_ref[0] = i0
    acc_ref[1] = i1
    acc_ref[2] = i2

    @pl.when(g == n_chunks - 1)
    def _():
        stout_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("n_samples", "interpret"))
def modulate_pallas(pcm, state, *, n_samples: int,
                    interpret: bool = False):
    """Same contract as delta_sigma.modulate: pcm int16/int32[N, T],
    state int32[N, 3] -> (pdm uint16-in-int32[N, 2T], state').

    N must be a multiple of 8 (sublane packing); T is static."""
    N, Tn = pcm.shape
    assert Tn == n_samples
    assert N % 8 == 0, N
    R = N // 8
    # chunk the sample axis: each grid step handles C samples with
    # fully static ref indices.  C must divide T exactly (the state
    # readout happens at the last chunk); audio shapes are multiples
    # of 32 (SBC frames are 128 samples), so C is 32 in practice.
    C = next(c for c in range(min(32, Tn), 0, -1) if Tn % c == 0)
    n_chunks = Tn // C
    # [T, R, 8] with lanes on the minor axes: one (8, R<=128-lane)
    # vreg row per time step
    pcm32 = (pcm.astype(jnp.int32) * 2).T.reshape(Tn, R, 8)
    pcm32 = jnp.swapaxes(pcm32, 1, 2)                  # [T, 8, R]
    st = state.T.reshape(3, R, 8)
    st = jnp.swapaxes(st, 1, 2)                        # [3, 8, R]
    out, st2 = pl.pallas_call(
        functools.partial(_kernel, C=C, n_chunks=n_chunks),
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((C, 8, R), lambda g: (g, 0, 0)),
                  pl.BlockSpec((3, 8, R), lambda g: (0, 0, 0))],
        out_specs=[pl.BlockSpec((2 * C, 8, R), lambda g: (g, 0, 0)),
                   pl.BlockSpec((3, 8, R), lambda g: (0, 0, 0))],
        out_shape=[jax.ShapeDtypeStruct((2 * Tn, 8, R), jnp.int32),
                   jax.ShapeDtypeStruct((3, 8, R), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((3, 8, R), jnp.int32)],
        interpret=interpret,
    )(pcm32, st)
    pdm = jnp.swapaxes(out, 1, 2).reshape(2 * Tn, N).T
    state2 = jnp.swapaxes(st2, 1, 2).reshape(3, N).T
    return pdm, state2

"""Batched second-order delta-sigma (PDM) audio modulator.

Exact semantics of the reference's software modulator
(/root/reference/espflix.ino:73-107): per 48 kHz PCM sample, two
modulator ticks of 16 PDM bits each (32x oversampling, 1.536 Mb/s
1-bit stream); CRFB loop with a1=floor(0x7FFF*1.18940)=38973,
a2=floor(0x7FFF*2.12340)=69577, low-pass i0=(i0+s)>>1, feedback
i1 += i0 -+ a1 - (i2>>7); i2 += i1 -+ a2; bit = i2 >= 0.

The recurrence is tiny (3 ints) but strictly sequential per lane; lanes
vectorize on the VPU.  A lax.scan carries (i0, i1, i2) across calls so
streams chunk arbitrarily (the "context parallel" story for the sample
timeline, SURVEY.md 5.7).  PDM silence is the 0xAAAA pattern
(espflix.ino:139).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

A1 = int(0x7FFF * 1.18940)   # 38973
A2 = int(0x7FFF * 2.12340)   # 69577
SILENCE_WORD = 0xAAAA


def init_state(n_lanes: int):
    return jnp.zeros((n_lanes, 3), jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_samples",
                                             "samples_per_step"))
def modulate(pcm, state, *, n_samples: int,
             samples_per_step: int | None = None):
    """pcm: int16/int32[N, T] -> (pdm uint16-in-int32[N, 2*T], state).

    Each PCM sample yields two 16-bit PDM words (MSB-first bit order,
    matching the reference's b<<=1 packing).

    samples_per_step batches the lax.scan: the recurrence is a tiny
    serial chain, and per-step dispatch overhead (operand slicing +
    small DMAs) dominated at one half-sample per step (measured
    ~1.2us/step on a v5e); unrolling samples into each step body cuts
    the step count with bit-identical output.  Default: 4 (8x fewer
    steps) at production lane counts, 1 for small N on CPU -- XLA
    CPU's codegen goes superlinear on the unrolled serial chain at
    SMALL vector widths (measured: N=8 sps=4 takes MINUTES to compile
    while N=8 sps=1 is 0.5s and N=1024 sps=4 is seconds; this is what
    blew the round-4 multichip dryrun's time budget)."""
    N, Tn = pcm.shape
    assert Tn == n_samples
    pcm32 = pcm.astype(jnp.int32) * 2
    if samples_per_step is None:
        samples_per_step = 4 if (N >= 128 or
                                 jax.default_backend() == "tpu") else 1
    sps = samples_per_step
    if Tn % sps:
        sps = 1          # padding would advance the carried state
    steps = Tn // sps

    def half_tick(i0, i1, i2, s):
        i0 = (i0 + s) >> 1
        bits = jnp.zeros((N,), jnp.int32)
        for _ in range(16):
            pos = i2 >= 0
            i1 = i1 + i0 + jnp.where(pos, -A1, A1) - (i2 >> 7)
            i2 = i2 + i1 + jnp.where(pos, -A2, A2)
            bits = (bits << 1) | pos.astype(jnp.int32)
        return i0, i1, i2, bits

    xs = pcm32.T.reshape(steps, sps, N)

    def step(carry, sv):
        i0, i1, i2 = carry
        out = []
        # two modulator ticks per sample; the sample loads on BOTH
        # (the reference reloads s each pdm_second_order call,
        # espflix.ino:86-88,123-145)
        for j in range(sps):
            i0, i1, i2, b0 = half_tick(i0, i1, i2, sv[j])
            i0, i1, i2, b1 = half_tick(i0, i1, i2, sv[j])
            out.append(b0)
            out.append(b1)
        return (i0, i1, i2), jnp.stack(out)

    st = (state[:, 0], state[:, 1], state[:, 2])
    st, words = jax.lax.scan(step, st, xs)
    pdm = words.reshape(2 * Tn, N).T
    return pdm, jnp.stack(st, axis=1)


@functools.partial(jax.jit, static_argnames=("n_samples",
                                             "samples_per_step"))
def modulate_spec(pcm, state, *, n_samples: int,
                  samples_per_step: int | None = None):
    """Speculative two-path formulation of `modulate` (bit-identical).

    The plain recurrence's per-bit critical path runs compare ->
    select -> i1 adds -> i2 adds (~5-6 dependent VPU ops).  Here BOTH
    branch outcomes of every bit are computed as candidate states
    hanging off the PREVIOUS bit's candidates (select commutes with
    the update, so f_x(select(p, a, b)) == select(p, f_x(a), f_x(b))),
    and the only serial chains are (a) the candidate update itself
    (~3 dependent ops: shift, add, add) and (b) a 1-op boolean select
    chain resolving each bit from precomputed candidate signs --
    ~2x shorter critical path for ~4x the ALU work (lanes are one
    (8,128) vreg at N=1024, so the extra ops are cheap next to the
    chain latency).  int32 adds wrap, so the reassociation is exact.

    Kept as an opt-in measured variant per the round-3 roadmap
    (docs/PERF.md); semantics identical to `modulate`
    (espflix.ino:73-107)."""
    N, Tn = pcm.shape
    assert Tn == n_samples
    pcm32 = pcm.astype(jnp.int32) * 2
    if samples_per_step is None:
        samples_per_step = 4 if (N >= 128 or
                                 jax.default_backend() == "tpu") else 1
    sps = samples_per_step
    if Tn % sps:
        sps = 1
    steps = Tn // sps

    def fstep(i1x, i2x, i0, neg: bool):
        """One bit update assuming the branch sign (neg == i2 >= 0,
        i.e. the 'subtract the DAC feedback' path)."""
        d1 = -A1 if neg else A1
        d2 = -A2 if neg else A2
        i1n = i1x + i0 + d1 - (i2x >> 7)
        i2n = i2x + i1n + d2
        return i1n, i2n

    def half_tick(i0, i1, i2, s):
        i0 = (i0 + s) >> 1
        # bit 0 resolves directly off the concrete entry state
        p = i2 >= 0
        bits = p.astype(jnp.int32)
        i1a, i2a = fstep(i1, i2, i0, True)
        i1b, i2b = fstep(i1, i2, i0, False)
        for _ in range(15):
            # candidate signs (parallel, off the serial chain)
            sa = i2a >= 0
            sb = i2b >= 0
            pos = jnp.where(p, sa, sb)          # this bit's output
            # next candidates from BOTH current candidates, then
            # collapse with p (the branch bit resolved last step)
            n1aa, n2aa = fstep(i1a, i2a, i0, True)
            n1ab, n2ab = fstep(i1a, i2a, i0, False)
            n1ba, n2ba = fstep(i1b, i2b, i0, True)
            n1bb, n2bb = fstep(i1b, i2b, i0, False)
            i1a = jnp.where(p, n1aa, n1ba)
            i2a = jnp.where(p, n2aa, n2ba)
            i1b = jnp.where(p, n1ab, n1bb)
            i2b = jnp.where(p, n2ab, n2bb)
            p = pos
            bits = (bits << 1) | pos.astype(jnp.int32)
        i1 = jnp.where(p, i1a, i1b)
        i2 = jnp.where(p, i2a, i2b)
        return i0, i1, i2, bits

    xs = pcm32.T.reshape(steps, sps, N)

    def step(carry, sv):
        i0, i1, i2 = carry
        out = []
        for j in range(sps):
            i0, i1, i2, b0 = half_tick(i0, i1, i2, sv[j])
            i0, i1, i2, b1 = half_tick(i0, i1, i2, sv[j])
            out.append(b0)
            out.append(b1)
        return (i0, i1, i2), jnp.stack(out)

    st = (state[:, 0], state[:, 1], state[:, 2])
    st, words = jax.lax.scan(step, st, xs)
    pdm = words.reshape(2 * Tn, N).T
    return pdm, jnp.stack(st, axis=1)


def silence(n_lanes: int, n_words: int):
    return jnp.full((n_lanes, n_words), SILENCE_WORD, jnp.int32)

"""The full per-tick device chain: decode -> composite -> PDM.

This is the PRODUCT form of the reference's always-on loop -- decode
on core 0 while the scanline ISR synthesizes the signal and the audio
thread modulates PDM (espflix.cpp:886-1010, video.cpp:1122-1198,
espflix.ino:73-145) -- as ONE jitted lax.scan over K display ticks:

    per tick: bucketed Pallas slice scan -> matmul scatter -> dense
    dequant/IDCT/mocomp/compose -> BOTH composite fields (with real
    per-lane OSD/progress/blend/beep/starved state) -> batched SBC
    decode -> delta-sigma PDM

Frame planes, SBC filter history and the delta-sigma modulator state
are the scan carry, so one dispatch + one host sync covers the whole
chunk.  Both Fleet.run_chunk(output=True) (runtime/scheduler.py) and
bench.py --stage full drive THIS function -- the benchmark measures
the same code path serving runs.

Signal sinks: materializing every lane's DAC samples is ~500 MB/tick
at 1024 lanes, so the chain reduces fields and PDM to per-lane int32
checksums (the device-resident consumer interface) and optionally
"taps" a small static number of lanes whose full fields/PDM words are
returned for delivery (tools/serve_scenario.py dumps them; a real
deployment would DMA them to the egress NIC).

Audio in the chain handles one SBC operating point (frame_size,
channels) per chunk -- the service encoder emits a single op-point
(tools/indexer.py); lanes outside it fall back to the per-tick host
path in the Fleet.  Starved lanes get the literal 0xAAAA silence
pattern with their modulator state untouched (video.cpp:997-1001);
beeping lanes play the key-feedback sine for beep_frames*128 samples
(espflix.ino:109-145).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from espflix_tpu.models import mpeg1 as M
from espflix_tpu.models import sbc as dsbc
from espflix_tpu.ops import composite as CO
from espflix_tpu.ops import composite_pallas as CP
from espflix_tpu.ops import delta_sigma as DS

# per-tick xs keys (stacked [K, ...] by the caller)
DECODE_KEYS = ("words", "start_bits", "rows", "alive", "pic_type",
               "full_pel", "r_size", "lane_of_row", "perm",
               "intra_q", "non_intra_q", "active")
# device-window mode (win > 0): per-LANE words + per-row bases replace
# the pre-built [NS, win] row windows (~12x fewer host->device bytes;
# windows are gathered on device by VP.gather_scan_rows)
DECODE_KEYS_DW = ("lane_words", "row_base") + DECODE_KEYS[1:]
OUTPUT_KEYS = ("osd", "blend", "progress", "parity", "aud_words",
               "aud_act", "aud_nval", "beep_left", "starved")
SCROLL_KEYS = ("hscroll",)


def beep_wave(n_samples: int) -> np.ndarray:
    """The key-feedback sine at >>2 amplitude (espflix.ino:109-120)."""
    from espflix_tpu.runtime.output import _SIN32
    return (_SIN32[np.arange(n_samples) & 31] >> 2).astype(np.int16)


def _chunk_scan(xs, frames, sbc_state, ds_state, tap_idx, slide,
                *, mb_width: int, mb_height: int, n_lanes: int,
                long_rows: int, steps_long: int, steps_short: int,
                n_aud_frames: int, channels: int, pal: bool,
                scrolled: bool, tap: int, interpret: bool,
                return_planes: bool = True, win: int = 0,
                chunk: int = 128,
                lane0=0, psum_axis: str | None = None):
    """The chain core: K full decode->signal ticks as one lax.scan.

    Called directly by run_full_chunk (single device) and per shard by
    make_sharded_full_chunk (n_lanes = LOCAL lanes, lane0 = this
    shard's first global lane, psum_axis = the 'streams' mesh axis --
    the only cross-shard traffic is the tapped lanes' signal, gathered
    with a masked psum).
    """
    from espflix_tpu.ops import vlc_scan_pallas as VP

    F = n_aud_frames
    wave = jnp.asarray(beep_wave(F * 128 * max(channels, 1)))

    def body(carry, x):
        frames, sbc_state, ds_state = carry
        if win:
            words = VP.gather_scan_rows(
                x["lane_words"], x["row_base"], x["lane_of_row"], win)
        else:
            words = x["words"]
        coeffs_T, recs, nfinal, err, _it = \
            VP.run_scan_pallas_bucketed_dense(
                words, *[x[k] for k in DECODE_KEYS[1:8]], x["perm"],
                mb_width=mb_width, mb_height=mb_height,
                n_lanes=n_lanes, long_rows=long_rows,
                steps_long=steps_long, steps_short=steps_short,
                chunk=chunk, interpret=interpret, transposed=True)
        frames, p = M.dense_compose(
            None, recs, nfinal, x["intra_q"], x["non_intra_q"],
            x["active"], frames, mb_width=mb_width,
            mb_height=mb_height, coeffs_T=coeffs_T)

        # ---- composite: both fields of the frame pair ---------------
        if scrolled:
            sy, su, sv = slide
            ye, ue, ve = CO.apply_hscroll(
                p["y"], p["u"], p["v"], sy, su, sv, x["hscroll"])
        else:
            ye, ue, ve = p["y"], p["u"], p["v"]
        # VMEM-resident field-pair kernel, byte-exact vs the XLA
        # chain; the signal stays PACKED (one int16 = two DAC bytes)
        # and in PARTS form -- per-field active pairs + the shared OSD
        # strip; the ~71% constant template bytes are never written
        # per lane (ops/composite_pallas.py; taps assemble the full
        # canvas on demand)
        f_act, f_strip, f_sum = CP.synthesize_field_pair_parts(
            ye, ue, ve, x["parity"], x["osd"], x["blend"],
            x["progress"], pal=pal, interpret=interpret)

        # ---- audio: SBC decode + beep/starve + delta-sigma ----------
        pcm, sbc_state, aerr, _ = dsbc.decode_frames_batched(
            x["aud_words"], sbc_state, active=x["aud_act"],
            n_valid=x["aud_nval"], n_frames=F, channels=channels)
        S = F * 128 * max(channels, 1)
        pcm = pcm[:, :S]
        t = jnp.arange(S, dtype=jnp.int32)[None, :]
        beeping = t < (x["beep_left"] * 128)[:, None]
        pcm = jnp.where(beeping, wave[None, :], pcm)
        pdm, ds2 = DS.modulate(pcm, ds_state, n_samples=S)
        silent = x["starved"] | ~(x["aud_act"] | (x["beep_left"] > 0))
        pdm = jnp.where(silent[:, None], DS.SILENCE_WORD, pdm)
        ds_state = jnp.where(silent[:, None], ds_state, ds2)

        out = dict(
            err=err,
            audio_err=aerr.any(axis=tuple(range(1, aerr.ndim))),
            field_sum=f_sum,
            pdm_sum=pdm.sum(axis=1, dtype=jnp.int32),
        )
        if return_planes:
            out.update(y=p["y"], u=p["u"], v=p["v"])
        else:
            # the planes are consumed by the output stage above; a
            # per-lane checksum keeps a content witness without
            # materializing [K, N, H, W] per chunk
            out["ysum"] = p["y"].astype(jnp.int32).sum(
                axis=(1, 2), dtype=jnp.int32)
        if tap:
            if psum_axis is None:
                tf_p = CP.assemble_canvas_packed(
                    jnp.take(f_act, tap_idx[:tap], axis=0),
                    jnp.take(f_strip, tap_idx[:tap], axis=0), pal=pal)
                out["tap_fields"] = CP.unpack_fields(tf_p)
                out["tap_pdm"] = jnp.take(pdm, tap_idx[:tap], axis=0)
            else:
                # tap_idx is GLOBAL under the mesh: each shard
                # contributes its own lanes (masked), psum over the
                # streams axis assembles the full tap set on every
                # shard -- the only data-path ICI in the chain, sized
                # by the (small, static) tap count
                li = tap_idx[:tap] - lane0
                inside = (li >= 0) & (li < n_lanes)
                lc = jnp.clip(li, 0, n_lanes - 1)
                tf_p = CP.assemble_canvas_packed(
                    jnp.take(f_act, lc, axis=0),
                    jnp.take(f_strip, lc, axis=0), pal=pal)
                tf = CP.unpack_fields(tf_p).astype(jnp.int32)
                tf = jnp.where(inside[:, None, None, None], tf, 0)
                out["tap_fields"] = jax.lax.psum(
                    tf, psum_axis).astype(jnp.uint8)
                tp = jnp.where(inside[:, None],
                               jnp.take(pdm, lc, axis=0), 0)
                out["tap_pdm"] = jax.lax.psum(tp, psum_axis)
        return (frames, sbc_state, ds_state), out

    (frames, sbc_state, ds_state), outs = jax.lax.scan(
        body, (frames, sbc_state, ds_state), xs)
    return frames, sbc_state, ds_state, outs


@functools.partial(
    jax.jit, static_argnames=("mb_width", "mb_height", "n_lanes",
                              "long_rows", "steps_long", "steps_short",
                              "n_aud_frames", "channels", "pal",
                              "scrolled", "tap", "interpret",
                              "return_planes", "win", "chunk"))
def run_full_chunk(xs, frames, sbc_state, ds_state, tap_idx, slide,
                   *, mb_width: int, mb_height: int, n_lanes: int,
                   long_rows: int, steps_long: int, steps_short: int,
                   n_aud_frames: int, channels: int, pal: bool,
                   scrolled: bool, tap: int, interpret: bool,
                   return_planes: bool = True, win: int = 0,
                   chunk: int = 128):
    """One dispatch: K full decode->signal ticks.

    xs: dict of [K, ...] per-tick inputs (DECODE_KEYS + OUTPUT_KEYS,
    plus hscroll when scrolled).  tap_idx: int32[max(tap,1)] lanes to
    return full signal for.  slide: (y,u,v) outgoing-frame snapshots
    for the scroll animation (zeros when unused).

    Returns (frames, sbc_state, ds_state, outs) with outs per tick:
    pres y/u/v [K,N,H,W], err [K,N], field_sum/pdm_sum [K,N] int32,
    audio_err [K,N], tap_fields [K,tap,2,L,W] u8, tap_pdm [K,tap,S].
    """
    return _chunk_scan(
        xs, frames, sbc_state, ds_state, tap_idx, slide,
        mb_width=mb_width, mb_height=mb_height, n_lanes=n_lanes,
        long_rows=long_rows, steps_long=steps_long,
        steps_short=steps_short, n_aud_frames=n_aud_frames,
        channels=channels, pal=pal, scrolled=scrolled, tap=tap,
        interpret=interpret, return_planes=return_planes, win=win,
        chunk=chunk)


_SHARDED_CACHE: dict = {}


def make_sharded_full_chunk(mesh, *, mb_width: int, mb_height: int,
                            n_lanes: int, long_rows: int,
                            steps_long: int, steps_short: int,
                            n_aud_frames: int, channels: int,
                            pal: bool, scrolled: bool, tap: int,
                            interpret: bool,
                            return_planes: bool = False,
                            win: int = 0,
                            chunk: int = 128,
                            xs_keys: tuple = ()):
    """The full chain under the mesh: run_full_chunk's body
    shard_map'ed over the 'streams' axis (SURVEY.md 2.3 DP; zero
    data-path ICI except the masked-psum tap gather).  n_lanes is the
    GLOBAL lane count; long_rows and the step budgets are per SHARD
    (callers size them for the worst shard, scheduler.bucket_policy).

    Every xs leaf is [K, lanes-or-rows, ...] with the lane/row axis
    sharded P(None, 'streams'); rows come pre-packed per shard
    (scan_dense.pack_slice_rows_sharded: shard-local lane_of_row /
    perm / span sort).  Carries (frames, sbc, pdm state) shard on
    axis 0.  Same returns as run_full_chunk.
    """
    xs_keys = tuple(sorted(xs_keys)) or (
        (DECODE_KEYS_DW[:9] if win else DECODE_KEYS[:9])
        + DECODE_KEYS[9:] + OUTPUT_KEYS
        + (SCROLL_KEYS if scrolled else ()))
    key = (mesh, mb_width, mb_height, n_lanes, long_rows, steps_long,
           steps_short, n_aud_frames, channels, pal, scrolled, tap,
           interpret, return_planes, win, chunk, xs_keys)
    fn = _SHARDED_CACHE.get(key)
    if fn is not None:
        return fn

    import inspect

    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map          # jax >= 0.8
    except ImportError:
        from jax.experimental.shard_map import shard_map
    _params = inspect.signature(shard_map).parameters
    _check = {"check_vma": False} if "check_vma" in _params \
        else {"check_rep": False}

    n_sh = mesh.shape["streams"]
    assert n_lanes % n_sh == 0
    n_loc = n_lanes // n_sh

    def body(xs, frames, sbc_state, ds_state, tap_idx, slide):
        lane0 = jax.lax.axis_index("streams") * n_loc
        return _chunk_scan(
            xs, frames, sbc_state, ds_state, tap_idx, slide,
            mb_width=mb_width, mb_height=mb_height, n_lanes=n_loc,
            long_rows=long_rows, steps_long=steps_long,
            steps_short=steps_short, n_aud_frames=n_aud_frames,
            channels=channels, pal=pal, scrolled=scrolled, tap=tap,
            interpret=interpret, return_planes=return_planes,
            win=win, chunk=chunk, lane0=lane0, psum_axis="streams")

    ls = P("streams")                      # lane-major carries
    ks = P(None, "streams")                # [K, lanes/rows, ...] xs
    xs_spec = {k: ks for k in xs_keys}
    frames_spec = dict(y=ls, u=ls, v=ls, parity=ls)
    slide_spec = (ls, ls, ls) if scrolled else (P(), P(), P())
    in_specs = (xs_spec, frames_spec, ls, ls, P(), slide_spec)
    outs_spec = dict(err=ks, audio_err=ks, field_sum=ks, pdm_sum=ks)
    if return_planes:
        outs_spec.update(y=ks, u=ks, v=ks)
    else:
        outs_spec["ysum"] = ks
    if tap:
        outs_spec.update(tap_fields=P(), tap_pdm=P())
    out_specs = (frames_spec, ls, ls, outs_spec)
    fn = jax.jit(shard_map(body, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs, **_check))
    _SHARDED_CACHE[key] = fn
    return fn

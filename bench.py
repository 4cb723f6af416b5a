#!/usr/bin/env python3
"""Benchmark: concurrent real-time 352x192 MPEG-1 streams per chip.

Decodes realistic ~1.5 Mb/s GOP content (I+P, half-pel MVs, divergent
per-lane streams, per-lane random GOP phase) and reports how many
30 fps streams one chip sustains.  Baseline: the reference decodes
exactly 1 stream per ESP32 chip (BASELINE.md).

Stages (--stage):
  full (default): the reference's complete per-tick work on device --
      bitstream decode + TWO composite NTSC field syntheses (the ISR
      runs 60 fields/s per 30 fps stream, video.cpp:1122-1198) + SBC
      audio decode (13 frames >= 1600 samples/tick) + delta-sigma PDM
      modulation, all chained inside one jitted lax.scan per GOP.
  decode: video decode only (round-1's headline, for comparison).

Phases (--phase): mixed (default) gives every lane a random GOP phase,
so every tick carries I-frame lanes and pays the I-frame symbol
budget -- the realistic fleet steady state; aligned reproduces the
round-1 favorable phasing.

Timing is wall-clock over K chained GOP decodes with a hard host sync
at the end (device-only block_until_ready is unreliable through this
environment's TPU tunnel).

Pipelines:
  --pipeline auto (default): use the Pallas pipeline (the production
      path); a pallas build/compile failure -- or a non-TPU backend --
      falls back to the all-device XLA pipeline.
  --pipeline device: lane-parallel FSM scan on device + dense
      dequant+IDCT + MXU one-hot mocomp + compose (the BASELINE
      north-star config).
  --pipeline pallas: the VMEM-resident slice-parallel Pallas scan
      kernel feeding the same dense phase.
  --pipeline hybrid: native C++ entropy decode feeding the device
      dense phase (includes host tokenize + host->device upload per
      call; wins on hosts with fast interconnect + many cores;
      decode stage only).

Prints one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import argparse
import json
import os
import sys
import time

import numpy as np

# persistent XLA compile cache: first-compile of the decode graphs takes
# minutes through this environment's remote-compile service
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jaxcache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=0)
    ap.add_argument("--pictures", type=int, default=12)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--distinct", type=int, default=8,
                    help="distinct content streams tiled across lanes")
    ap.add_argument("--pipeline",
                    choices=["auto", "hybrid", "device", "pallas"],
                    default="auto")
    ap.add_argument("--stage", choices=["full", "decode"],
                    default="full")
    ap.add_argument("--phase", choices=["mixed", "aligned"],
                    default="mixed")
    ap.add_argument("--standard", choices=["ntsc", "pal"],
                    default="ntsc",
                    help="composite standard for the output stage "
                    "(the reference treats PAL as an equal citizen, "
                    "video.cpp:607-644)")
    ap.add_argument("--scatter", choices=["matmul", "serial"],
                    default="matmul",
                    help="emission-log densification: one-hot MXU "
                    "contractions (ops/scan_dense.py) or the serial "
                    "XLA bulk scatter")
    ap.add_argument("--idct", choices=["auto", "pallas", "jnp"],
                    default="auto",
                    help="dequant+IDCT kernel (auto: jnp)")
    ap.add_argument("--scrolled", action="store_true",
                    help="include the buffer-flip hscroll slide path "
                    "in the full chain (a nav-transition cost, off in "
                    "steady-state serving)")
    ap.add_argument("--realtime", action=argparse.BooleanOptionalAction,
                    default=os.environ.get(
                        "ESPFLIX_BENCH_REALTIME", "1") != "0",
                    help="also find the deadline-true operating point: "
                    "max lanes with tick p50 <= 33.33ms, with jitter "
                    "percentiles (costs 1-2 extra compiles, cached)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from espflix_tpu.models import mpeg1 as M
    from espflix_tpu.tools import mpeg1_encode as E
    from espflix_tpu.tools.content import realistic_gop_script

    devs = jax.devices()
    platform = devs[0].platform
    n_chips = len(devs)
    lanes = args.lanes or (1024 if platform in ("tpu",) else 8)

    def log(*a):
        if args.verbose:
            print(*a, file=sys.stderr, flush=True)

    log(f"platform={platform} chips={n_chips} lanes={lanes} "
        f"pipeline={args.pipeline}")

    # distinct per-lane content; mixed phase rotates each lane's GOP
    # position so every tick carries I-frame lanes (the realistic
    # fleet steady state -- ticks are phase-heterogeneous)
    streams = []
    for s in range(args.distinct):
        rng = np.random.default_rng(1000 + s)
        streams.append(M.parse_es(
            E.encode_es(realistic_gop_script(
                rng, n_pictures=args.pictures)))[1])
    seq = streams[0][0].seq
    mbw, mbh = seq.mb_width, seq.mb_height
    wpl = max(max((len(p.payload) + 3) // 4 + 4 for p in ps)
              for ps in streams)
    total_bytes = sum(len(p.payload) for p in streams[0])
    log(f"content: {args.pictures} pics/GOP, "
        f"{total_bytes * 8 * 30 / args.pictures / 1e6:.2f} Mb/s @30fps")

    def make_builders(lanes):
        """Content + pipeline builders at a given lane count (the
        realtime probe re-instantiates them at smaller N)."""
        prng = np.random.default_rng(7)
        if args.phase == "mixed":
            phase = prng.integers(0, args.pictures, lanes)
        else:
            phase = np.zeros(lanes, np.int64)
        per_pic = []
        for k in range(args.pictures):
            per_pic.append(
                [streams[i % args.distinct][(k + phase[i]) % args.pictures]
                 for i in range(lanes)])
        idct = {"auto": None, "pallas": True, "jnp": False}[args.idct]

        # ---- output-stage content + step (the --stage full tail) -------------
        # per tick and lane: two composite fields (60/50 fields/s) + 13 SBC
        # frames (1664 >= 1600 PCM samples/tick at 48 kHz) + delta-sigma PDM
        F_A = 13
        PAL = args.standard == "pal"

        def build_output_step():
            from espflix_tpu.models import sbc as dsbc
            from espflix_tpu.ops import composite as Co
            from espflix_tpu.ops import delta_sigma as DS
            from espflix_tpu.tools.sbc_encode import random_frame

            arng = np.random.default_rng(17)
            frames_a = np.stack(
                [np.frombuffer(random_frame(arng, mode=0, bitpool=28),
                               np.uint8) for _ in range(F_A)])
            aud = np.broadcast_to(frames_a, (lanes, F_A, 64))
            aud_words = jnp.asarray(dsbc.frames_to_words(
                np.ascontiguousarray(aud)))
            # realistic per-lane output-stage state (all fixed-shape, so
            # cost is value-independent -- nonzero values document that
            # the stage is NOT measured at a degenerate configuration):
            # live OSD text, mid-fade blends, scattered progress bars,
            # mixed field parity
            orng = np.random.default_rng(23)
            osd = jnp.asarray(orng.integers(0, 256, (lanes, 16, 80),
                                            dtype=np.uint8))
            blend = jnp.asarray(orng.integers(0, 256, lanes,
                                              dtype=np.int32))
            prog = jnp.asarray(orng.integers(0, 352, lanes,
                                             dtype=np.int32))
            par0 = jnp.asarray(orng.integers(0, 2, lanes, dtype=np.int32))

            def init_carry():
                return (dsbc.init_state(lanes), DS.init_state(lanes))

            def output_tick(p, carry):
                sbc_hist, ds_state = carry
                # both fields of the frame pair in one call (shared
                # chroma QAM; the ISR's 60 fields/s per 30 fps stream)
                ff = Co.synthesize_field_pair(p["y"], p["u"], p["v"], par0,
                                              osd, blend, prog, pal=PAL)
                pcm, sbc_hist, _aerr, _ = dsbc.decode_frames_batched(
                    aud_words, sbc_hist, n_frames=F_A)
                pdm, ds_state = DS.modulate(pcm, ds_state,
                                            n_samples=F_A * 128)
                chk = ff.astype(jnp.int32).sum() + pdm.sum()
                return (sbc_hist, ds_state), chk
            return init_carry, output_tick

        if args.stage == "full":
            out_init, out_tick = build_output_step()
        else:
            def out_init():
                return ()

            def out_tick(p, carry):
                return carry, jnp.int32(0)

        # ---- pipeline runners ------------------------------------------------
        # Both device pipelines decode the WHOLE GOP inside one jitted
        # lax.scan (frame state carried on device, one host sync per GOP):
        # per-call dispatch through this environment's tunnel costs
        # 0.4-2s, so per-picture dispatch measures the tunnel, not the
        # chip.  Presented planes reduce to per-picture checksums inside
        # the scan (materializing [K, N, H, W] would be 1.2GB; production
        # consumes frames on-device in the output stage).
        def build_device():
            from espflix_tpu.models.mpeg1 import decode_picture_impl

            # symbol budget: measured content peaks at ~8.6k symbols per
            # I picture; the emission log + bulk scatter scale linearly
            # with this budget, so keep margin bounded
            keys = ("words", "slice_starts", "slice_rows", "n_slices",
                    "pic_type", "full_pel", "r_size", "intra_q",
                    "non_intra_q", "active")
            bats = [M.make_picture_batch(sel, words_per_lane=wpl,
                                         max_slices=mbh)
                    for sel in per_pic]
            stacked = {k: jnp.asarray(np.stack([b[k] for b in bats]))
                       for k in keys}

            @jax.jit
            def decode_gop(st, frames, ocarry):
                def body(carry, xs):
                    frames, ocarry = carry
                    frames, p, info = decode_picture_impl(
                        *[xs[k] for k in keys], frames,
                        mb_width=mbw, mb_height=mbh,
                        max_steps=min(wpl * 32, 12000),
                        use_pallas_idct=idct)
                    ocarry, ochk = out_tick(p, ocarry)
                    chk = (p["y"].astype(jnp.int32).sum()
                           + info["error"].sum() + ochk)
                    return (frames, ocarry), chk
                (frames, ocarry), chk = jax.lax.scan(
                    body, (frames, ocarry), st)
                return frames, ocarry, chk

            def run(reps):
                frames = M.init_frame_state(lanes, mbw * 16, mbh * 16)
                frames, oc, chk = decode_gop(stacked, frames, out_init())
                _ = np.asarray(chk)           # compile + warm
                n = 0
                frames = M.init_frame_state(lanes, mbw * 16, mbh * 16)
                oc = out_init()
                ts = []
                for _r in range(reps):
                    t0 = time.time()
                    frames, oc, chk = decode_gop(stacked, frames, oc)
                    _ = np.asarray(chk)       # sync per chunk (the
                    # serving runtime syncs once per chunk too)
                    ts.append(time.time() - t0)
                    n += args.pictures
                return n, ts
            return run

        def build_chain():
            """--stage full production path: the SAME jitted chunk the
            Fleet serves with (runtime/chain.py run_full_chunk) -- decode
            + both composite fields + SBC + PDM in one lax.scan, with the
            bench's synthetic OSD/audio content as the per-tick state."""
            from espflix_tpu.models import sbc as dsbc
            from espflix_tpu.ops import scan_dense as SD
            from espflix_tpu.ops import vlc_scan_pallas as VP
            from espflix_tpu.runtime import chain as CH
            from espflix_tpu.tools.sbc_encode import random_frame

            sls = []
            bats = []
            perms = []
            for sel in per_pic:
                b = M.make_picture_batch(sel, words_per_lane=wpl,
                                         max_slices=mbh)
                sl = VP.pack_slice_rows(b, words_window=None,
                                        sort_rows=True)
                assert not sl["overflow"].any()
                perm, dup = SD.row_perm(sl["lane_of_row"], sl["rows"],
                                        sl["alive"], lanes, mbh)
                assert not dup.any()
                sls.append(sl)
                bats.append(b)
                perms.append(perm)
            Wp = max(sl["words"].shape[1] for sl in sls)
            for sl in sls:
                w = sl["words"]
                if w.shape[1] < Wp:
                    sl["words"] = np.pad(w, ((0, 0), (0, Wp - w.shape[1])))
            K = len(per_pic)
            xs = {k: np.stack([sl[k] for sl in sls])
                  for k in CH.DECODE_KEYS[:8]}
            xs["perm"] = np.stack(perms)
            for k in ("intra_q", "non_intra_q", "active"):
                xs[k] = np.stack([b[k] for b in bats])
            arng = np.random.default_rng(17)
            frames_a = np.stack(
                [np.frombuffer(random_frame(arng, mode=0, bitpool=28),
                               np.uint8) for _ in range(F_A)])
            aw = dsbc.frames_to_words(np.ascontiguousarray(
                np.broadcast_to(frames_a, (lanes, F_A, 64))))
            # realistic nonzero per-lane output state (fixed shapes: cost
            # is value-independent; nonzero pins that the stage is not
            # measured at a degenerate all-zeros configuration)
            orng = np.random.default_rng(23)
            xs.update(
                osd=orng.integers(0, 256, (K, lanes, 16, 80),
                                  dtype=np.uint8).astype(np.uint8),
                blend=orng.integers(0, 256, (K, lanes)).astype(np.int32),
                progress=orng.integers(0, 352, (K, lanes)).astype(
                    np.int32),
                parity=orng.integers(0, 2, (K, lanes)).astype(np.int32),
                beep_left=orng.integers(0, 3, (K, lanes)).astype(np.int32),
                aud_words=np.broadcast_to(aw, (K,) + aw.shape).copy(),
                aud_act=np.ones((K, lanes), bool),
                aud_nval=np.full((K, lanes), F_A, np.int32),
                starved=(orng.random((K, lanes)) < 0.01),
            )
            if args.scrolled:
                xs["hscroll"] = orng.integers(
                    0, 352, (K, lanes)).astype(np.int32)
            xs = {k: jnp.asarray(v) for k, v in xs.items()}
            tap_idx = jnp.zeros((1,), jnp.int32)
            zz = jnp.zeros((1, 1, 1), jnp.uint8)
            if args.scrolled:
                slide_planes = tuple(jnp.asarray(orng.integers(
                    0, 249, (lanes, h_, w_), dtype=np.uint8))
                    for h_, w_ in ((192, 352), (96, 176), (96, 176)))
            else:
                slide_planes = (zz, zz, zz)
            interp = platform != "tpu"
            NS = lanes * mbh
            long_rows = min(2 * lanes, NS // 2)

            def gop(frames, sbc, ds):
                frames, sbc, ds, outs = CH.run_full_chunk(
                    xs, frames, sbc, ds, tap_idx, slide_planes,
                    mb_width=mbw, mb_height=mbh, n_lanes=lanes,
                    long_rows=long_rows, steps_long=1024,
                    steps_short=384, n_aud_frames=F_A, channels=1,
                    pal=PAL, scrolled=args.scrolled, tap=0,
                    interpret=interp, return_planes=False)
                chk = (outs["ysum"].sum() + outs["field_sum"].sum()
                       + outs["pdm_sum"].sum() + outs["err"].sum())
                return frames, sbc, ds, chk

            def init():
                return (M.init_frame_state(lanes, mbw * 16, mbh * 16),
                        dsbc.init_state(lanes),
                        jnp.zeros((lanes, 3), jnp.int32))

            def run(reps):
                frames, sbc, ds = init()
                frames, sbc, ds, chk = gop(frames, sbc, ds)
                _ = np.asarray(chk)           # compile + warm
                n = 0
                frames, sbc, ds = init()
                ts = []
                for _r in range(reps):
                    t0 = time.time()
                    frames, sbc, ds, chk = gop(frames, sbc, ds)
                    _ = np.asarray(chk)       # sync per chunk, as the
                    # serving runtime does (run_chunk_full host_sync)
                    ts.append(time.time() - t0)
                    n += args.pictures
                return n, ts
            return run

        def build_pallas():
            if args.stage == "full" and args.scatter == "matmul":
                return build_chain()
            from espflix_tpu.models.mpeg1 import dense_compose
            from espflix_tpu.ops import vlc_scan_pallas as VP

            sls = []
            bats = []
            for sel in per_pic:
                b = M.make_picture_batch(sel, words_per_lane=wpl,
                                         max_slices=mbh)
                sl = VP.pack_slice_rows(b, words_window=None,
                                        sort_rows=True)
                assert not sl["overflow"].any()
                sls.append(sl)
                bats.append(b)
            Wp = max(sl["words"].shape[1] for sl in sls)
            for sl in sls:                    # common window for stacking
                w = sl["words"]
                if w.shape[1] < Wp:
                    sl["words"] = np.pad(w, ((0, 0), (0, Wp - w.shape[1])))
            skeys = ("words", "start_bits", "rows", "alive", "pic_type",
                     "full_pel", "r_size", "lane_of_row")
            bkeys = ("intra_q", "non_intra_q", "active")
            stacked = {k: jnp.asarray(np.stack([sl[k] for sl in sls]))
                       for k in skeys}
            stacked.update({k: jnp.asarray(np.stack([b[k] for b in bats]))
                            for k in bkeys})
            interp = platform != "tpu"        # Mosaic only lowers on TPU
            # two-budget buckets: rows are span-sorted, so the long bucket
            # absorbs every I slice (content peak ~720 steps +35%) and the
            # short bucket runs the P slices; both the emission log and its
            # densification are linear in rows x budget
            NS = lanes * mbh
            long_rows = min(2 * lanes, NS // 2)
            if args.scatter == "matmul":
                from espflix_tpu.ops import scan_dense as SD
                perms = []
                for sl in sls:
                    perm, dup = SD.row_perm(sl["lane_of_row"], sl["rows"],
                                            sl["alive"], lanes, mbh)
                    assert not dup.any()
                    perms.append(perm)
                stacked["perm"] = jnp.asarray(np.stack(perms))

            @jax.jit
            def decode_gop(st, frames, ocarry):
                def body(carry, xs):
                    frames, ocarry = carry
                    if args.scatter == "matmul":
                        coeffs, recs, nfinal, err, _it = \
                            VP.run_scan_pallas_bucketed_dense(
                                *[xs[k] for k in skeys], xs["perm"],
                                mb_width=mbw, mb_height=mbh,
                                n_lanes=lanes, long_rows=long_rows,
                                steps_long=1024, steps_short=384,
                                chunk=128, interpret=interp)
                    else:
                        coeffs, recs, nfinal, err, _it = \
                            VP.run_scan_pallas_bucketed(
                                *[xs[k] for k in skeys],
                                mb_width=mbw, mb_count=mbw * mbh,
                                n_lanes=lanes, long_rows=long_rows,
                                steps_long=1024, steps_short=384,
                                chunk=128, interpret=interp)
                    frames, p = dense_compose(
                        coeffs, recs, nfinal, xs["intra_q"],
                        xs["non_intra_q"], xs["active"], frames,
                        mb_width=mbw, mb_height=mbh,
                        use_pallas_idct=idct)
                    ocarry, ochk = out_tick(p, ocarry)
                    chk = p["y"].astype(jnp.int32).sum() + err.sum() + ochk
                    return (frames, ocarry), chk
                (frames, ocarry), chk = jax.lax.scan(
                    body, (frames, ocarry), st)
                return frames, ocarry, chk

            def run(reps):
                frames = M.init_frame_state(lanes, mbw * 16, mbh * 16)
                frames, oc, chk = decode_gop(stacked, frames, out_init())
                _ = np.asarray(chk)           # compile + warm
                n = 0
                frames = M.init_frame_state(lanes, mbw * 16, mbh * 16)
                oc = out_init()
                ts = []
                for _r in range(reps):
                    t0 = time.time()
                    frames, oc, chk = decode_gop(stacked, frames, oc)
                    _ = np.asarray(chk)       # sync per chunk (the
                    # serving runtime syncs once per chunk too)
                    ts.append(time.time() - t0)
                    n += args.pictures
                return n, ts
            return run

        def build_hybrid():
            iqs = [np.stack([p.seq.intra_q for p in sel])
                   for sel in per_pic]
            nqs = [np.stack([p.seq.non_intra_q for p in sel])
                   for sel in per_pic]

            def run(reps):
                frames = M.init_frame_state(lanes, mbw * 16, mbh * 16)
                frames, p, _ = M.decode_picture_batch_hybrid(
                    per_pic[0], iqs[0], nqs[0], frames, mb_width=mbw,
                    mb_height=mbh)
                _ = np.asarray(p["y"])
                n = 0
                ts = []
                for _r in range(reps):
                    t0 = time.time()
                    for k, sel in enumerate(per_pic):
                        frames, p, _i = M.decode_picture_batch_hybrid(
                            sel, iqs[k], nqs[k], frames, mb_width=mbw,
                            mb_height=mbh)
                        n += 1
                    _ = np.asarray(p["y"])
                    ts.append(time.time() - t0)
                return n, ts
            return run

        return dict(device=build_device, pallas=build_pallas,
                    hybrid=build_hybrid)

    builders = make_builders(lanes)

    # pipeline attribution: the emitted JSON records what actually ran
    # (and why, if auto fell back) so a silent Mosaic regression can
    # never masquerade as a mere perf delta.  An explicit --pipeline
    # choice fails LOUDLY on any build/compile error.
    pipeline_used = args.pipeline
    fallback_reason = None
    if args.pipeline == "auto":
        # pallas is the production pipeline (consistently the faster
        # of the two across rounds); build it first and keep the XLA
        # device pipeline purely as the fallback if the Pallas compile
        # path is unavailable (compile service, Mosaic, non-TPU).
        # Compiling both just to probe doubled wall time on tunneled
        # compile services.
        run = None
        if platform == "tpu":
            try:
                t0 = time.time()
                run = builders["pallas"]()
                n, ts0 = run(1)
                pipeline_used = "pallas"
                log(f"auto -> pallas: {sum(ts0) / n * 1000:.0f}ms/call "
                    f"(setup+compile {time.time() - t0:.0f}s)")
            except Exception as e:  # noqa: BLE001 - fall back to device
                fallback_reason = f"pallas: {type(e).__name__}: {e}"
                log(f"pallas unavailable: {fallback_reason}")
                run = None
        else:
            fallback_reason = f"platform={platform} (no Mosaic)"
        if run is None:
            run = builders["device"]()
            pipeline_used = "device"
            log("auto -> device")
    else:
        run = builders[args.pipeline]()

    n, ts = run(args.reps)
    dt = sum(ts)
    fps = lanes * n / dt
    streams_per_chip = fps / 30.0 / n_chips
    # variance across the reps' chunk timings (each chunk = one
    # dispatch + one sync over args.pictures ticks)
    per_chunk = [lanes * (n / len(ts)) / t / 30.0 / n_chips
                 for t in ts]
    value_std = float(np.std(per_chunk)) if len(ts) > 1 else 0.0
    log(f"{n} pictures x {lanes} lanes in {dt:.2f}s -> {fps:.0f} fps, "
        f"{streams_per_chip:.1f} rt streams/chip "
        f"(stage={args.stage} phase={args.phase})")

    # ---- deadline-true operating point (VERDICT r3 #4) ------------------
    # The headline above is a throughput extrapolation; the reference's
    # bar is HARD real time (the ISR never overruns 63.555us,
    # video.cpp:51-56).  Find the max lane count whose tick fits one
    # display-frame interval (33.33ms) and report its jitter: model
    # tick(N) = a + b*N from two measured points, verify at the
    # predicted N, step down until the measured p50 fits.
    realtime = {}
    want_rt = (args.realtime and args.stage == "full"
               and platform == "tpu" and not fallback_reason)
    if want_rt:
        try:
            deadline = 1.0 / 30.0
            k = args.pictures
            tick1 = dt / n                        # s/tick at `lanes`
            n2 = max(128, (lanes // 2) // 128 * 128)
            run2 = make_builders(n2)[pipeline_used]()
            _n2, ts2 = run2(2)
            tick2 = min(ts2) / k
            b = (tick1 - tick2) / max(lanes - n2, 1)
            a = tick1 - b * lanes
            cand = int((deadline - a) / b) if b > 0 else lanes
            # 32-lane quantum: the old 128 floor could under-report by
            # up to 127 lanes (637 -> 512); kernels grid over N freely
            cand = min(max(cand // 32 * 32, 128), 8192)
            rt_lanes, p50, p99 = None, None, None
            for _try in range(6):
                if cand == lanes:
                    tcks = [t / k for t in ts]
                else:
                    runc = make_builders(cand)[pipeline_used]()
                    _nc, tsc = runc(max(args.reps, 8))
                    tcks = [t / k for t in tsc]
                tcks.sort()
                q50 = tcks[len(tcks) // 2]
                q99 = tcks[min(len(tcks) - 1,
                               int(len(tcks) * 0.99))]
                log(f"realtime probe N={cand}: p50 "
                    f"{q50 * 1000:.1f}ms p99 {q99 * 1000:.1f}ms")
                if q50 <= deadline or cand <= 128:
                    rt_lanes, p50, p99 = cand, q50, q99
                    break
                # refit on the measured point and JUMP to the new
                # candidate -- every candidate is a fresh full-pipeline
                # compile on this rig (minutes via the remote-compile
                # tunnel), so a -32 crawl can cost several compiles
                if b > 0:
                    nxt = int((deadline - (q50 - b * cand)) / b)
                else:
                    nxt = cand - 32
                cand = max(min(nxt // 32 * 32, cand - 32), 128)
            realtime = {
                "realtime_lanes": rt_lanes,
                "tick_p50_ms": round(p50 * 1000, 2) if p50 else None,
                "tick_p99_ms": round(p99 * 1000, 2) if p99 else None,
            }
        except Exception as e:  # noqa: BLE001 - keep the headline
            realtime = {"realtime_lanes": None,
                        "realtime_error": f"{type(e).__name__}: {e}"}

    print(json.dumps({
        "metric": "realtime_352x192_mpeg1_streams_per_chip",
        "value": round(streams_per_chip, 2),
        "unit": "30fps streams/chip",
        "vs_baseline": round(streams_per_chip / 1.0, 2),
        "value_std": round(value_std, 2),
        "lanes": lanes,
        "tick_ms": round(dt / n * 1000, 2),
        "stage": args.stage,
        "phase": args.phase,
        "standard": args.standard,
        "pipeline": pipeline_used,
        "scatter": args.scatter,
        "mocomp": os.environ.get("ESPFLIX_MOCOMP", "hybrid2p"),
        "idct": os.environ.get("ESPFLIX_IDCT", "pallasT"),
        "fallback_reason": fallback_reason,
        **realtime,
    }))


if __name__ == "__main__":
    main()

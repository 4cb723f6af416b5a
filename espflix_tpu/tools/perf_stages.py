"""Per-stage device attribution for the full-tick pipeline.

Times each stage of the decode->composite->PDM tick in ISOLATION on
the current backend (docs/PERF.md stage tables): dequant+IDCT,
residual plane assembly, mocomp prediction, the per-pixel compose
(split further into select / parity-put / presented), the composite
field pair, SBC decode and delta-sigma PDM.  The VLC scan stage is
content-dependent and is measured by bench.py; everything here is
cost-shape-dependent only, so inputs are random at the production
geometry (352x192, mbw=22, mbh=12).

Methodology (docs/PERF.md "Environment pathologies"): each stage runs
ITERS times inside ONE jitted lax.scan whose per-iteration inputs are
salted from the loop carry (defeats CSE/hoisting -- same-input timing
loops lie under XLA), every measurement ends in a host transfer
(block_until_ready does not reliably block through the axon tunnel),
and reps report min/median.

Usage:
    python -m espflix_tpu.tools.perf_stages --lanes 1024 --iters 8 \
        --reps 3 [--stages idct_pallasT,compose,...] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jaxcache")


def build_inputs(n: int, mbw: int = 22, mbh: int = 12, seed: int = 11):
    import jax.numpy as jnp

    from espflix_tpu.models import sbc as dsbc
    from espflix_tpu.ops import vlc_scan
    from espflix_tpu.tools.sbc_encode import random_frame

    rng = np.random.default_rng(seed)
    mbc = mbw * mbh
    BL = mbc * 6
    H, W = mbh * 16, mbw * 16
    d = {}
    d["coeffs_T"] = jnp.asarray(rng.integers(
        -64, 64, (n, 64, BL)).astype(np.int16))
    intra = rng.random((n, mbc)) < 0.4
    kind = np.where(intra, vlc_scan.MB_INTRA,
                    rng.choice([vlc_scan.MB_STALE, vlc_scan.MB_SKIP,
                                vlc_scan.MB_INTER], (n, mbc)))
    d["kind"] = jnp.asarray(kind.reshape(n, mbh, mbw).astype(np.int32))
    d["intra_bl"] = jnp.asarray(np.repeat(intra, 6, axis=1))
    d["qs_bl"] = jnp.asarray(np.repeat(
        rng.integers(1, 32, (n, mbc)), 6, axis=1).astype(np.int32))
    from espflix_tpu.core.vlc_tables import DEFAULT_INTRA_Q
    d["iq"] = jnp.asarray(np.broadcast_to(
        np.asarray(DEFAULT_INTRA_Q).reshape(64),
        (n, 64)).astype(np.int32))
    d["nq"] = jnp.asarray(np.full((n, 64), 16, np.int32))
    d["nfinal"] = jnp.asarray(rng.integers(
        0, 64, (n, BL)).astype(np.int32))
    d["res_T"] = jnp.asarray(rng.integers(
        -255, 256, (n, 64, BL)).astype(np.int16))
    for p, (h, w) in (("y", (H, W)), ("u", (H // 2, W // 2)),
                      ("v", (H // 2, W // 2))):
        d["ref_" + p] = jnp.asarray(rng.integers(
            0, 249, (n, h, w), dtype=np.uint8))
        d["cur_" + p] = jnp.asarray(rng.integers(
            0, 249, (n, h, w), dtype=np.uint8))
        d["pred_" + p] = jnp.asarray(rng.integers(
            0, 249, (n, h, w), dtype=np.uint8))
        d["res_" + p] = jnp.asarray(rng.integers(
            -255, 256, (n, h, w)).astype(np.int16))
    d["mv_h"] = jnp.asarray(rng.integers(
        -30, 31, (n, mbh, mbw)).astype(np.int32))
    d["mv_v"] = jnp.asarray(rng.integers(
        -30, 31, (n, mbh, mbw)).astype(np.int32))
    d["active"] = jnp.asarray(np.ones(n, bool))
    d["parity"] = jnp.asarray(rng.integers(0, 2, n).astype(np.int32))
    d["frames"] = dict(
        y=jnp.asarray(rng.integers(0, 249, (n, 2, H, W),
                                   dtype=np.uint8)),
        u=jnp.asarray(rng.integers(0, 249, (n, 2, H // 2, W // 2),
                                   dtype=np.uint8)),
        v=jnp.asarray(rng.integers(0, 249, (n, 2, H // 2, W // 2),
                                   dtype=np.uint8)),
        parity=d["parity"])
    # output-stage inputs (bench.py's realistic nonzero state)
    d["osd"] = jnp.asarray(rng.integers(0, 256, (n, 16, 80),
                                        dtype=np.uint8))
    d["blend"] = jnp.asarray(rng.integers(0, 256, n).astype(np.int32))
    d["progress"] = jnp.asarray(rng.integers(0, W, n).astype(np.int32))
    F = 13
    fr = np.stack([np.frombuffer(random_frame(rng, mode=0, bitpool=28),
                                 np.uint8) for _ in range(F)])
    d["aud_words"] = jnp.asarray(dsbc.frames_to_words(
        np.ascontiguousarray(np.broadcast_to(fr, (n, F, 64)))))
    d["sbc_hist"] = dsbc.init_state(n)
    d["pcm"] = jnp.asarray(rng.integers(
        -32768, 32768, (n, F * 128)).astype(np.int16))
    d["ds_state"] = jnp.zeros((n, 3), jnp.int32)
    d["F"] = F
    d["geom"] = (mbw, mbh)
    # emission logs at the bench's bucket shapes (densify cost is
    # shape-dependent only -- the one-hot matmuls are dense regardless
    # of values): long bucket 2N rows x 1024 steps, short the rest x
    # 384.  Indices span the real flat-index space incl. trash.
    mbc = mbw * mbh
    TRASH = mbc + mbc * 6 + mbc * 384
    for nm, R, T in (("long", 2 * n, 1024),
                     ("short", n * mbh - 2 * n, 384)):
        d[f"li_{nm}"] = jnp.asarray(rng.integers(
            0, TRASH + 8, (T, R)).astype(np.int32))
        d[f"lv_{nm}"] = jnp.asarray(rng.integers(
            -2048, 2048, (T, R)).astype(np.int32))
        d[f"rb_{nm}"] = jnp.asarray(
            (rng.integers(0, mbh, R) * mbw).astype(np.int32))
    return d


def make_stages(d, interp: bool):
    """{name: fn(salt) -> int32 checksum} per stage.  Every fn mixes
    the salt into a large operand so XLA cannot hoist the body out of
    the timing scan."""
    import jax.numpy as jnp

    from espflix_tpu.models import mpeg1 as M
    from espflix_tpu.models import sbc as dsbc
    from espflix_tpu.ops import delta_sigma as DS
    from espflix_tpu.ops import idct as idct_ops
    from espflix_tpu.ops import vlc_scan
    from espflix_tpu.ops.composite_pallas import (
        field_parts_byte_sum, packed_byte_sum,
        synthesize_field_pair_packed, synthesize_field_pair_parts)
    from espflix_tpu.ops.idct_pallas import block_residuals_T_pallas
    from espflix_tpu.ops.mocomp_pallas import (compose_plane_pallas2,
                                               predict_plane_pallas)

    mbw, mbh = d["geom"]
    N = int(d["active"].shape[0])
    F = int(d["F"])
    H, W = mbh * 16, mbw * 16

    def s8(salt):                      # uint8 salt
        return (salt & 0x3F).astype(jnp.uint8)

    def s16(salt):                     # small int16 salt
        return (salt & 0x7).astype(jnp.int16)

    def isum(x):
        return x.astype(jnp.int32).sum(dtype=jnp.int32)

    def idct_pallasT(dd, salt):
        r = block_residuals_T_pallas(
            dd["coeffs_T"] ^ s16(salt), dd["intra_bl"], dd["qs_bl"],
            dd["iq"], dd["nq"], dd["nfinal"], interpret=interp)
        return isum(r)

    def idct_jnp(dd, salt):
        qmat_T = jnp.where(dd["intra_bl"][:, None, :],
                           dd["iq"][:, :, None], dd["nq"][:, :, None])
        r = idct_ops.block_residuals_T(
            (dd["coeffs_T"] ^ s16(salt)).astype(jnp.int32),
            dd["intra_bl"], dd["qs_bl"], qmat_T,
            dd["nfinal"]).astype(jnp.int16)
        return isum(r)

    def assemble(dd, salt):
        # the rT reshape/transpose chain (models/mpeg1.py dense_compose)
        rT = (dd["res_T"] ^ s16(salt)).reshape(N, 8, 8, mbh, mbw, 6)
        ry = rT[..., :4].reshape(N, 8, 8, mbh, mbw, 2, 2) \
            .transpose(0, 3, 5, 1, 4, 6, 2).reshape(N, H, W)
        ru = rT[..., 4].transpose(0, 3, 1, 4, 2) \
            .reshape(N, H // 2, W // 2)
        rv = rT[..., 5].transpose(0, 3, 1, 4, 2) \
            .reshape(N, H // 2, W // 2)
        return isum(ry) + isum(ru) + isum(rv)

    def mocomp(dd, salt):
        py = predict_plane_pallas(dd["ref_y"] ^ s8(salt), dd["mv_h"],
                                  dd["mv_v"], 16, interpret=interp)
        pu = predict_plane_pallas(dd["ref_u"] ^ s8(salt),
                                  dd["mv_h"] >> 1, dd["mv_v"] >> 1, 8,
                                  interpret=interp)
        pv = predict_plane_pallas(dd["ref_v"] ^ s8(salt),
                                  dd["mv_h"] >> 1, dd["mv_v"] >> 1, 8,
                                  interpret=interp)
        return isum(py) + isum(pu) + isum(pv)

    def mocomp_phase(dd, salt):
        from espflix_tpu.ops.mocomp_pallas import (
            predict_chroma_pair_phase, predict_plane_phase)
        py = predict_plane_phase(dd["ref_y"] ^ s8(salt), dd["mv_h"],
                                 dd["mv_v"], 16, interpret=interp)
        pu, pv = predict_chroma_pair_phase(
            dd["ref_u"] ^ s8(salt), dd["ref_v"], dd["mv_h"] >> 1,
            dd["mv_v"] >> 1, interpret=interp)
        return isum(py) + isum(pu) + isum(pv)

    def mocomp_phase_luma(dd, salt):
        from espflix_tpu.ops.mocomp_pallas import predict_plane_phase
        py = predict_plane_phase(dd["ref_y"] ^ s8(salt), dd["mv_h"],
                                 dd["mv_v"], 16, interpret=interp)
        return isum(py)

    def mocomp_phase2_luma(dd, salt):
        from espflix_tpu.ops.mocomp_pallas import predict_plane_phase2
        py = predict_plane_phase2(dd["ref_y"] ^ s8(salt), dd["mv_h"],
                                  dd["mv_v"], 16, interpret=interp)
        return isum(py)

    def mocomp_phase2p_luma(dd, salt):
        from espflix_tpu.ops.mocomp_pallas import predict_plane_phase2p
        py = predict_plane_phase2p(dd["ref_y"] ^ s8(salt), dd["mv_h"],
                                   dd["mv_v"], 16, interpret=interp)
        return isum(py)

    def mocomp_chroma_packedp(dd, salt):
        from espflix_tpu.ops.mocomp_pallas import \
            predict_chroma_pair_packedp
        pu, pv = predict_chroma_pair_packedp(
            dd["ref_u"] ^ s8(salt), dd["ref_v"], dd["mv_h"] >> 1,
            dd["mv_v"] >> 1, interpret=interp)
        return isum(pu) + isum(pv)

    def mocomp_chroma_packedpa(dd, salt):
        from espflix_tpu.ops.mocomp_pallas import \
            predict_chroma_pair_packedp
        pu, pv = predict_chroma_pair_packedp(
            dd["ref_u"] ^ s8(salt), dd["ref_v"], dd["mv_h"] >> 1,
            dd["mv_v"] >> 1, interpret=interp, accum=True)
        return isum(pu) + isum(pv)

    def mocomp_phase4_luma(dd, salt):
        from espflix_tpu.ops.mocomp_pallas import predict_plane_phase4
        py = predict_plane_phase4(dd["ref_y"] ^ s8(salt), dd["mv_h"],
                                  dd["mv_v"], 16, interpret=interp)
        return isum(py)

    def mocomp_luma(dd, salt):
        py = predict_plane_pallas(dd["ref_y"] ^ s8(salt), dd["mv_h"],
                                  dd["mv_v"], 16, interpret=interp)
        return isum(py)

    def mocomp_packed(dd, salt):
        from espflix_tpu.ops.mocomp_pallas import (
            predict_chroma_pair_packed, predict_plane_packed)
        py = predict_plane_packed(dd["ref_y"] ^ s8(salt), dd["mv_h"],
                                  dd["mv_v"], 16, interpret=interp)
        pu, pv = predict_chroma_pair_packed(
            dd["ref_u"] ^ s8(salt), dd["ref_v"], dd["mv_h"] >> 1,
            dd["mv_v"] >> 1, interpret=interp)
        return isum(py) + isum(pu) + isum(pv)

    def mocomp_hybrid(dd, salt):
        # the measured-best split: phase-stack luma + packed chroma
        from espflix_tpu.ops.mocomp_pallas import (
            predict_chroma_pair_packed, predict_plane_phase)
        py = predict_plane_phase(dd["ref_y"] ^ s8(salt), dd["mv_h"],
                                 dd["mv_v"], 16, interpret=interp)
        pu, pv = predict_chroma_pair_packed(
            dd["ref_u"] ^ s8(salt), dd["ref_v"], dd["mv_h"] >> 1,
            dd["mv_v"] >> 1, interpret=interp)
        return isum(py) + isum(pu) + isum(pv)

    def mocomp_packed_luma(dd, salt):
        from espflix_tpu.ops.mocomp_pallas import predict_plane_packed
        py = predict_plane_packed(dd["ref_y"] ^ s8(salt), dd["mv_h"],
                                  dd["mv_v"], 16, interpret=interp)
        return isum(py)

    def mocomp_chroma_packed(dd, salt):
        from espflix_tpu.ops.mocomp_pallas import \
            predict_chroma_pair_packed
        pu, pv = predict_chroma_pair_packed(
            dd["ref_u"] ^ s8(salt), dd["ref_v"], dd["mv_h"] >> 1,
            dd["mv_v"] >> 1, interpret=interp)
        return isum(pu) + isum(pv)

    def mocomp_chroma_packed4(dd, salt):
        from espflix_tpu.ops.mocomp_pallas import \
            predict_chroma_pair_packed
        pu, pv = predict_chroma_pair_packed(
            dd["ref_u"] ^ s8(salt), dd["ref_v"], dd["mv_h"] >> 1,
            dd["mv_v"] >> 1, interpret=interp, preshift=False)
        return isum(pu) + isum(pv)

    # -- the compose stage, split three ways ---------------------------
    def _compose_one(cur, pred, resid, kind_mb, reps):
        # twin of models/mpeg1.dense_compose compose() (kept in sync)
        mh, mw = kind_mb.shape[1], kind_mb.shape[2]

        def up(m):
            return jnp.broadcast_to(
                m[:, :, None, :, None],
                (N, mh, reps, mw, reps)).reshape(
                    N, mh * reps, mw * reps)

        stale = up(kind_mb == vlc_scan.MB_STALE)
        intra = up(kind_mb == vlc_scan.MB_INTRA)
        p = pred.astype(jnp.int16)
        out = jnp.where(intra, M._pin(resid), M._pin(p + resid))
        return jnp.where(stale, cur, out.astype(jnp.uint8))

    def compose_select(dd, salt):
        acc = jnp.int32(0)
        for p, reps in (("y", 16), ("u", 8), ("v", 8)):
            acc += isum(_compose_one(
                dd["cur_" + p], dd["pred_" + p] ^ s8(salt),
                dd["res_" + p], dd["kind"], reps))
        return acc

    def parity_put(dd, salt):
        acc = jnp.int32(0)
        live = dd["active"]
        for p in ("y", "u", "v"):
            new = dd["pred_" + p] ^ s8(salt)
            cur = dd["cur_" + p]
            upd = jnp.where(live[:, None, None], new, cur)
            planes = dd["frames"][p].at[
                jnp.arange(N), dd["parity"]].set(upd)
            acc += isum(planes[:, 0, 0, 0])
        return acc

    def presented_where(dd, salt):
        acc = jnp.int32(0)
        live = dd["active"]
        for p in ("y", "u", "v"):
            pres = jnp.where(live[:, None, None],
                             dd["pred_" + p] ^ s8(salt), dd["cur_" + p])
            acc += isum(pres)
        return acc

    def compose_fused2(dd, salt):
        acc = jnp.int32(0)
        for p, reps in (("y", 16), ("u", 8), ("v", 8)):
            sh = 0 if reps == 16 else 1
            acc += isum(compose_plane_pallas2(
                dd["ref_" + p] ^ s8(salt), dd["cur_" + p],
                dd["res_" + p], dd["kind"], dd["mv_h"] >> sh,
                dd["mv_v"] >> sh, dd["active"], reps,
                interpret=interp))
        return acc

    def dense_all(dd, salt):
        frames = dict(dd["frames"])
        frames["y"] = frames["y"] ^ s8(salt)[None]
        recs = (dd["kind"].reshape(N, -1)
                | (dd["qs_bl"][:, ::6] << 2)
                | ((dd["mv_h"].reshape(N, -1) & 0xFFF) << 7)
                | ((dd["mv_v"].reshape(N, -1) & 0xFFF) << 19))
        nf, pres = M.dense_compose(
            None, recs, dd["nfinal"], dd["iq"], dd["nq"], dd["active"],
            frames, mb_width=mbw, mb_height=mbh,
            coeffs_T=dd["coeffs_T"])
        return isum(pres["y"]) + isum(pres["u"]) + isum(pres["v"])

    def fieldpair(dd, salt):
        # the production parts form (chain.py): per-field active pairs
        # + shared OSD strip + in-kernel checksum, no full-canvas
        # writes and no act re-read for the sum
        act, strip, chk = synthesize_field_pair_parts(
            dd["cur_y"] ^ s8(salt), dd["cur_u"], dd["cur_v"],
            dd["parity"], dd["osd"], dd["blend"], dd["progress"],
            pal=False, interpret=interp)
        return chk.sum(dtype=jnp.int32) + act[0, 0, 0, 0] \
            .astype(jnp.int32) + strip[0, 0, 0].astype(jnp.int32)

    def fieldpair_full(dd, salt):
        # compat surface: full-canvas assembly included
        fp = synthesize_field_pair_packed(
            dd["cur_y"] ^ s8(salt), dd["cur_u"], dd["cur_v"],
            dd["parity"], dd["osd"], dd["blend"], dd["progress"],
            pal=False, interpret=interp)
        return packed_byte_sum(fp).sum(dtype=jnp.int32)

    def sbc(dd, salt):
        w = dd["aud_words"] ^ (salt & 0).astype(jnp.uint32)  # header-safe
        pcm, hist, _err, _ = dsbc.decode_frames_batched(
            w, dd["sbc_hist"] + (salt & 1), n_frames=F)
        return isum(pcm)

    def densify(dd, salt):
        # both buckets' log->dense-window matmuls, bench shapes
        from espflix_tpu.ops import scan_dense as SD
        acc = jnp.int32(0)
        for nm in ("long", "short"):
            c, a, drop = SD.log_to_dense_rows(
                dd[f"li_{nm}"] ^ (salt & 7), dd[f"lv_{nm}"] ^ salt,
                dd[f"rb_{nm}"], mb_width=mbw, mb_count=mbw * mbh,
                transposed=True)
            acc = acc + isum(c) + isum(a) + drop.sum().astype(jnp.int32)
        return acc

    def pdm(dd, salt):
        pcm = dd["pcm"] ^ s16(salt)
        out, st = DS.modulate(pcm, dd["ds_state"],
                              n_samples=F * 128)
        return isum(out) + isum(st)

    def pdm_spec(dd, salt):
        pcm = dd["pcm"] ^ s16(salt)
        out, st = DS.modulate_spec(pcm, dd["ds_state"],
                                   n_samples=F * 128)
        return isum(out) + isum(st)

    return dict(idct_pallasT=idct_pallasT, idct_jnp=idct_jnp,
                assemble=assemble, mocomp=mocomp,
                mocomp_phase=mocomp_phase,
                mocomp_phase_luma=mocomp_phase_luma,
                mocomp_phase2_luma=mocomp_phase2_luma,
                mocomp_phase2p_luma=mocomp_phase2p_luma,
                mocomp_chroma_packedp=mocomp_chroma_packedp,
                mocomp_chroma_packedpa=mocomp_chroma_packedpa,
                mocomp_phase4_luma=mocomp_phase4_luma,
                mocomp_packed=mocomp_packed,
                mocomp_packed_luma=mocomp_packed_luma,
                mocomp_chroma_packed=mocomp_chroma_packed,
                mocomp_chroma_packed4=mocomp_chroma_packed4,
                mocomp_hybrid=mocomp_hybrid,
                densify=densify,
                mocomp_luma=mocomp_luma,
                compose_select=compose_select, parity_put=parity_put,
                presented_where=presented_where,
                compose_fused2=compose_fused2, dense_all=dense_all,
                fieldpair=fieldpair, fieldpair_full=fieldpair_full,
                sbc=sbc, pdm=pdm,
                pdm_spec=pdm_spec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stages", type=str, default="")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    interp = jax.default_backend() != "tpu"
    d = build_inputs(args.lanes)
    stages = make_stages(d, interp)
    names = [s for s in args.stages.split(",") if s] or list(stages)

    out = {}
    for name in names:
        fn = stages[name]

        dd = {k: v for k, v in d.items()
              if k not in ("F", "geom")}

        @jax.jit
        def run(dd, salt0, _fn=fn):
            def body(c, _):
                salt, acc = c
                return (salt + 1, acc + _fn(dd, salt)), None
            (s, acc), _ = jax.lax.scan(
                body, (salt0, jnp.int32(0)), None, length=args.iters)
            return acc
        try:
            _ = np.asarray(run(dd, jnp.int32(0)))  # compile + warm
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:>16}: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr)
            continue
        ts = []
        for r in range(args.reps):
            t0 = time.time()
            _ = np.asarray(run(dd, jnp.int32(1 + r * args.iters)))
            ts.append((time.time() - t0) / args.iters * 1000)
        out[name] = dict(ms_min=round(min(ts), 3),
                         ms_med=round(sorted(ts)[len(ts) // 2], 3))
        print(f"{name:>16}: {out[name]['ms_min']:8.3f} ms/iter (min) "
              f"{out[name]['ms_med']:8.3f} (med)", flush=True)
    if args.json:
        print(json.dumps(dict(lanes=args.lanes, iters=args.iters,
                              stages=out)))


if __name__ == "__main__":
    main()

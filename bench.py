#!/usr/bin/env python3
"""Benchmark: concurrent real-time 352x192 MPEG-1 streams per chip.

Decodes realistic ~1.5 Mb/s GOP content (I + P, half-pel MVs) with the
batched device decoder over a 'streams' mesh and reports how many 30 fps
streams one chip sustains.  Baseline: the reference decodes exactly 1
stream per ESP32 chip (BASELINE.md).

Prints one JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=0,
                    help="batch lanes (0 = auto by platform)")
    ap.add_argument("--pictures", type=int, default=12)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from espflix_tpu.models import mpeg1 as M
    from espflix_tpu.parallel import mesh as pmesh
    from espflix_tpu.tools import mpeg1_encode as E
    from espflix_tpu.tools.content import realistic_gop_script

    devs = jax.devices()
    platform = devs[0].platform
    n_chips = len(devs)
    lanes = args.lanes or (1024 if platform == "tpu" else 8)
    lanes = max(lanes, n_chips)
    lanes -= lanes % n_chips

    def log(*a):
        if args.verbose:
            print(*a, file=sys.stderr)

    log(f"platform={platform} chips={n_chips} lanes={lanes}")

    rng = np.random.default_rng(7)
    es = E.encode_es(
        realistic_gop_script(rng, n_pictures=args.pictures))
    seq, pics = M.parse_es(es)
    words_per_lane = max((len(p.payload) + 3) // 4 + 4 for p in pics)
    max_slices = max(len(p.slice_offsets) for p in pics)
    total_bytes = sum(len(p.payload) for p in pics)
    log(f"content: {len(pics)} pictures, "
        f"{total_bytes * 8 * 30 / len(pics) / 1e6:.2f} Mb/s @30fps")

    mesh = pmesh.make_mesh(n_chips)
    decode = pmesh.make_sharded_decoder(
        mesh, mb_width=seq.mb_width, mb_height=seq.mb_height,
        max_steps=words_per_lane * 32)

    frames = M.init_frame_state(lanes, seq.mb_width * 16,
                                seq.mb_height * 16)
    frames = pmesh.shard_lane_tree(mesh, frames)

    batches = []
    for p in pics:
        b = M.make_picture_batch([p] * lanes, words_per_lane=words_per_lane,
                                 max_slices=max_slices)
        arrs = tuple(
            jnp.asarray(b[k]) for k in (
                "words", "slice_starts", "slice_rows", "n_slices",
                "pic_type", "full_pel", "r_size", "intra_q",
                "non_intra_q", "active"))
        batches.append(pmesh.shard_lane_tree(mesh, arrs))

    # warmup/compile
    t0 = time.time()
    frames, presented, info = decode(*batches[0], frames)
    jax.block_until_ready(presented["y"])
    log(f"compile+first picture: {time.time() - t0:.1f}s")

    t0 = time.time()
    npics = 0
    for _ in range(args.reps):
        for bt in batches:
            frames, presented, info = decode(*bt, frames)
            npics += 1
    jax.block_until_ready(presented["y"])
    dt = time.time() - t0
    fps = lanes * npics / dt
    streams_per_chip = fps / 30.0 / n_chips
    log(f"{npics} pictures x {lanes} lanes in {dt:.2f}s -> "
        f"{fps:.0f} fps total, {streams_per_chip:.1f} rt streams/chip")

    print(json.dumps({
        "metric": "realtime_352x192_mpeg1_streams_per_chip",
        "value": round(streams_per_chip, 2),
        "unit": "30fps streams/chip",
        "vs_baseline": round(streams_per_chip / 1.0, 2),
    }))


if __name__ == "__main__":
    main()

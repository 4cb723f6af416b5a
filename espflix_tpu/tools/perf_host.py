"""Host-tick microbenchmark: the per-tick HOST cost of feeding
Fleet.run_chunk_full at N lanes on this machine's cores.

Measures exactly the host section of one fused-chain tick (the work
that runs between device dispatches, runtime/scheduler.run_chunk_full):

  gather      -- session pump + native packed pop straight into the
                 device batch layout (_gather_batch_packed), or the
                 classic _gather_pictures + make_picture_batch
  pack        -- pack_slice_rows (+ row_perm) in device-window or
                 row-window mode
  audio       -- _gather_audio_arrays (SBC ring pops -> word arrays)
  stack       -- the per-chunk np.stack of the xs dict (upload excluded:
                 this tool measures the HOST, not the tunnel)

The reference's analogue is the zero-copy pump on its own core
(espflix.cpp:655-658, 723-737 -> player.cpp:459-493).  Prints one JSON
line; run with --classic to measure the pre-fusion path for the same
ticks.

Usage:  python -m espflix_tpu.tools.perf_host --lanes 1024 --ticks 8
"""
from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=1024)
    ap.add_argument("--ticks", type=int, default=8)
    ap.add_argument("--titles", type=int, default=4)
    ap.add_argument("--gops", type=int, default=6)
    ap.add_argument("--classic", action="store_true",
                    help="force the classic per-picture gather "
                    "(PictureData marshalling + make_picture_batch)")
    ap.add_argument("--no-device-windows", action="store_true",
                    help="pack full row windows on the host instead "
                    "of per-lane words (pre-round-3 layout)")
    ap.add_argument("--service", default=None)
    args = ap.parse_args(argv)

    if args.classic:
        os.environ["ESPFLIX_PACKED_POP"] = "0"

    from espflix_tpu.models import mpeg1 as M
    from espflix_tpu.ops import scan_dense as SD
    from espflix_tpu.ops import vlc_scan_pallas as VP
    from espflix_tpu.tools.serve_scenario import (build_fleet,
                                                  generate_service)

    tmp = None
    if args.service:
        root = args.service
    else:
        tmp = tempfile.TemporaryDirectory()
        root = tmp.name
        generate_service(root, [f"t{i}" for i in range(args.titles)],
                         seed=11, n_gops=args.gops, gop=12)
    fleet = build_fleet("file://" + root, args.lanes, args.titles,
                        words_per_lane=8192, stage="full")
    dev_win = not args.no_device_windows
    fleet._dev_win = dev_win

    t_gather = []
    t_pack = []
    t_audio = []
    t_stack = []
    used_packed = 0
    for _ in range(args.ticks):
        t0 = time.perf_counter()
        g = fleet._gather_batch_packed()
        if g is not None:
            b, pts, pre = g
            used_packed += 1
        else:
            pics, pts, pre = fleet._gather_pictures()
            b = M.make_picture_batch(
                pics, words_per_lane=fleet.words_per_lane,
                max_slices=fleet.mb_h,
                geometry=(fleet.mb_w, fleet.mb_h))
        t1 = time.perf_counter()
        sl = VP.pack_slice_rows(b, sort_rows=True,
                                device_windows=dev_win)
        perm, dup = SD.row_perm(sl["lane_of_row"], sl["rows"],
                                sl["alive"], fleet.n, fleet.mb_h)
        t2 = time.perf_counter()
        aud = fleet._gather_audio_arrays(fleet.audio_F)
        t3 = time.perf_counter()
        # the per-chunk xs assembly cost, amortized at K=1 (worst case)
        x = {k: v for k, v in sl.items()
             if isinstance(v, np.ndarray)}
        x["perm"] = perm
        x["aud_words"] = aud[0]
        xs = {k: np.stack([v]) for k, v in x.items()}
        del xs
        t4 = time.perf_counter()
        t_gather.append(t1 - t0)
        t_pack.append(t2 - t1)
        t_audio.append(t3 - t2)
        t_stack.append(t4 - t3)

    def ms(v):
        return round(float(np.median(v)) * 1000, 2)

    out = {
        "lanes": args.lanes,
        "ticks": args.ticks,
        "mode": "classic" if args.classic else "packed",
        "device_windows": dev_win,
        "packed_ticks": used_packed,
        "gather_ms": ms(t_gather),
        "pack_ms": ms(t_pack),
        "audio_ms": ms(t_audio),
        "stack_ms": ms(t_stack),
        "host_tick_ms": round(
            (np.median(t_gather) + np.median(t_pack)
             + np.median(t_audio) + np.median(t_stack)) * 1000, 2),
        "nproc": os.cpu_count(),
    }
    print(json.dumps(out))
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()

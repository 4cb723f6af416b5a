"""Device-side scan-row windowing (gather_scan_rows) vs host-built
windows: identical scan outputs, and the full-chunk decode path is
bit-exact in both modes.

The device mode ships [N, Wm] per-lane words instead of [NS, win]
overlapping row windows (~12x fewer host->device bytes per tick).
"""

import numpy as np
import jax.numpy as jnp

from espflix_tpu.models import mpeg1 as M
from espflix_tpu.ops import scan_dense as SD
from espflix_tpu.ops import vlc_scan_pallas as VP
from espflix_tpu.tools import mpeg1_encode as E


def _batch(seed, lanes=4, pictures=2):
    rng = np.random.default_rng(seed)
    streams = [E.encode_es(E.random_script(
        rng, n_pictures=pictures, max_coeffs=10, width=96, height=64))
        for _ in range(lanes)]
    parsed = [M.parse_es(s)[1] for s in streams]
    pics = [p[0] for p in parsed]
    wpl = max((len(p.payload) + 3) // 4 + 4 for p in pics) + 32
    mbh = pics[0].seq.mb_height
    return M.make_picture_batch(pics, words_per_lane=wpl,
                                max_slices=mbh), pics[0].seq


def test_scan_outputs_identical_both_window_modes():
    b, seq = _batch(31)
    mbw, mbh = seq.mb_width, seq.mb_height
    lanes = b["words"].shape[0]
    host = VP.pack_slice_rows(b, sort_rows=True)
    dev = VP.pack_slice_rows(b, sort_rows=True, device_windows=True)
    # row metadata must agree exactly
    for k in ("start_bits", "rows", "alive", "pic_type", "full_pel",
              "r_size", "lane_of_row", "span"):
        assert np.array_equal(host[k], dev[k]), k
    win = dev["win"]
    assert host["words"].shape[1] == win
    rows_dev = np.asarray(VP.gather_scan_rows(
        jnp.asarray(dev["lane_words"]), jnp.asarray(dev["row_base"]),
        jnp.asarray(dev["lane_of_row"]), win))

    perm, dup = SD.row_perm(host["lane_of_row"], host["rows"],
                            host["alive"], lanes, mbh)
    assert not dup.any()
    outs = []
    for words in (host["words"], rows_dev):
        c, r, nf, err, _ = VP.run_scan_pallas_bucketed_dense(
            jnp.asarray(words), *[jnp.asarray(host[k]) for k in
                                  ("start_bits", "rows", "alive",
                                   "pic_type", "full_pel", "r_size",
                                   "lane_of_row")],
            jnp.asarray(perm), mb_width=mbw, mb_height=mbh,
            n_lanes=lanes, long_rows=8, steps_long=1024,
            steps_short=1024, chunk=128, interpret=True,
            transposed=True)
        outs.append((np.asarray(c), np.asarray(r), np.asarray(nf),
                     np.asarray(err)))
    for a, b_ in zip(outs[0], outs[1]):
        assert np.array_equal(a, b_)
    assert not outs[0][3].any()

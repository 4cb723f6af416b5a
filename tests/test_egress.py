"""Egress delivery (runtime/egress.py): tapped lanes' DAC fields +
PDM drained by a paced consumer with underrun/drop accounting -- the
measured consumer story for the signal the reference DMAs out for
real (video.cpp:218-225)."""

import time

import numpy as np
import pytest

from espflix_tpu.runtime.egress import EgressPump, EgressRing


def test_ring_bounded_and_fifo():
    r = EgressRing(depth=2)
    a = np.zeros((1, 2, 4, 8), np.uint8)
    p = np.zeros((1, 16), np.int32)
    r.push(a + 1, p)
    r.push(a + 2, p)
    r.push(a + 3, p)           # evicts oldest
    assert r.dropped == 1
    f, _ = r.pop()
    assert f[0, 0, 0, 0] == 2  # FIFO after the eviction
    assert len(r) == 1


def test_pump_delivers_at_pace_and_accounts():
    got = []

    def sink(f, p):
        got.append((f.copy(), p.copy()))

    pump = EgressPump(tick_interval=0.005, depth=64, sink=sink)
    pump.start()
    fields = np.arange(2 * 4 * 8, dtype=np.uint8).reshape(1, 2, 4, 8)
    pdm = np.arange(16, dtype=np.int32)[None]
    for k in range(20):
        pump.push(fields + k, pdm + k)
        time.sleep(0.003)
    st = pump.finish()
    assert st.pushed_ticks == 20
    assert st.consumed_ticks == 20 and st.dropped_ticks == 0
    assert st.delivered_field_bytes == 20 * fields.size
    assert st.delivered_pdm_words == 20 * pdm.size
    # delivery preserved content and order
    assert np.array_equal(got[0][0], fields)
    assert np.array_equal(got[19][1], pdm + 19)


def test_pump_underruns_when_starved():
    pump = EgressPump(tick_interval=0.004, depth=4)
    pump.start()
    fields = np.ones((1, 2, 4, 8), np.uint8)
    pdm = np.ones((1, 16), np.int32)
    pump.push(fields, pdm)
    time.sleep(0.1)            # consumer ticks ~25x with one entry
    st = pump.finish()
    assert st.consumed_ticks == 1
    assert st.underrun_ticks >= 5   # the starvation is visible
    assert st.checksum == int(fields.sum()) + int(pdm.sum())


def test_scenario_egress_full_stage(tmp_path):
    """--stage full --egress: the scenario drains every tapped tick
    through the pump; delivered bytes match the tap geometry."""
    from espflix_tpu.tools import serve_scenario as SS

    root = str(tmp_path / "svc")
    SS.generate_service(root, ["one"], seed=3, n_gops=2, gop=4)
    out = SS.main(["--lanes", "2", "--ticks", "8", "--titles", "1",
                   "--service", root, "--transport", "file",
                   "--stage", "full", "--egress", "2"])
    eg = out["egress"]
    assert eg["tapped_lanes"] == 2
    assert eg["pushed_ticks"] == out["full_ticks"]
    # the tail drain delivered everything that was pushed
    assert eg["consumed_ticks"] + eg["dropped_ticks"] \
        == eg["pushed_ticks"]
    per_tick = 2 * 2 * 262 * 912          # tap x fields x L x W (NTSC)
    assert eg["delivered_field_bytes"] == \
        eg["consumed_ticks"] * per_tick
    assert eg["delivered_pdm_words"] > 0

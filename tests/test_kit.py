"""Concurrency kit, nanolog, profilers."""

import io
import threading
import time

from espflix_tpu.utils import concurrency as C
from espflix_tpu.utils import nanolog
from espflix_tpu.runtime.prof import SamplingProfiler, TaskProfiler


def test_q_fifo_and_backpressure():
    q = C.Q(depth=2)
    assert q.push(1) and q.push(2)
    assert not q.push(3, timeout=0.01)      # full: backpressure
    assert q.pop() == 1 and q.pop() == 2
    assert q.pop_nowait() is None


def test_q_cross_thread():
    q = C.Q()
    got = []
    t = C.start_thread(lambda: got.append(q.pop(timeout=2)))
    q.push("x")
    t.join(timeout=2)
    assert got == ["x"]


def test_event_group_any_all_clear():
    eg = C.EventGroup()
    eg.set_bits(0b01)
    assert eg.wait(0b11, timeout=0.01) == 0b01          # any
    assert eg.wait(0b11, all_bits=True, timeout=0.01) == 0b01  # not all
    eg.set_bits(0b10)
    assert eg.wait(0b11, all_bits=True, clear=True) == 0b11
    assert eg.get_bits() == 0


def test_event_group_wakes_waiter():
    eg = C.EventGroup()
    got = []
    t = C.start_thread(lambda: got.append(eg.wait(0b100, timeout=2)))
    time.sleep(0.02)
    eg.set_bits(0b100)
    t.join(timeout=2)
    assert got == [0b100]


def test_nanolog_format_subset():
    f = nanolog._format
    assert f("x=%d y=%04d", (7, 9)) == "x=7 y=0009"
    assert f("%x/%X", (255, 255)) == "ff/FF"
    assert f("%08X", (0xBEEF,)) == "0000BEEF"
    assert f("[%s] %c", ("hi", 65)) == "[hi] A"
    assert f("100%% done", ()) == "100% done"
    assert f("neg %d", (-5,)) == "neg -5"


def test_nanolog_threaded_lines_atomic():
    buf = io.StringIO()
    old = nanolog.set_sink(buf)
    try:
        def worker(k):
            for i in range(50):
                nanolog.nprintf("t%d:%04d\n", k, i)
        ts = [C.start_thread(worker, k) for k in range(4)]
        for t in ts:
            t.join(timeout=5)
    finally:
        nanolog.set_sink(old)
    lines = buf.getvalue().splitlines()
    assert len(lines) == 200
    assert all(len(line) == 7 for line in lines)    # no interleaving
    assert any(line == "t2:0031" for line in lines)
    assert "t2:0031\n" in nanolog.tail(300)


def test_sampling_profiler_finds_hot_function():
    def hot():
        x = 0
        for i in range(200000):
            x += i * i
        return x

    with SamplingProfiler(interval=0.0005) as p:
        for _ in range(20):
            hot()
    sites = p.flush()
    assert sites, "no samples"
    assert any("hot" in k for k, _ in sites[:3])


def test_task_profiler_sees_threads():
    stop = threading.Event()

    def spin():
        while not stop.is_set():
            sum(range(1000))

    t = threading.Thread(target=spin, name="spinner", daemon=True)
    t.start()
    with TaskProfiler(interval=0.0005) as p:
        time.sleep(0.1)
    stop.set()
    d = p.dump()
    assert "spinner" in d


def test_tracecat_formats_and_roundtrips(tmp_path):
    import json
    from espflix_tpu.runtime.events import EventLog, Ev, Timers
    from espflix_tpu.tools import tracecat

    log = EventLog()
    log.log(Ev.DECODE_BATCH, lane=3, value=42)
    log.log(Ev.LANE_ERROR, lane=7)
    timers = Timers()
    with timers.measure("scan"):
        pass
    with timers.measure("dense"):
        pass

    txt = tracecat.format_events(log)
    assert "DECODE_BATCH" in txt and "LANE_ERROR" in txt
    assert "scan" in tracecat.format_timers(timers)
    assert "DECODE_BATCH" in tracecat.format_counts(log)

    p = tmp_path / "trace.json"
    tracecat.dump_json(str(p), log, timers)
    doc = json.loads(p.read_text())
    assert len(doc["events"]) == 2 and "scan" in doc["timers"]
    ch = tracecat.to_chrome(doc["events"])
    assert ch[0]["tid"] == 4 and ch[0]["ph"] == "i"
    assert tracecat.main([str(p)]) == 0

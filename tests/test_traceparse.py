"""Trace-capture + parse roundtrip for per-phase device-time attribution."""

import time

import jax
import jax.numpy as jnp

from streamchat_tpu.utils.profiling import PhaseTimer
from streamchat_tpu.utils.traceparse import (
    device_op_table,
    device_seconds_by_phase,
    find_trace_file,
    host_events_in_phase,
)
from streamchat_tpu.utils.traceparse import load_trace_events


def test_phase_windows_roundtrip(tmp_path):
    timer = PhaseTimer(annotate=True)
    x = jnp.ones((256, 256))

    f = jax.jit(lambda a: a @ a)
    f(x).block_until_ready()          # compile outside the trace

    jax.profiler.start_trace(str(tmp_path))
    try:
        with timer.phase("compute"):
            for _ in range(3):
                x = f(x)
            x.block_until_ready()
        with timer.phase("hostwait"):
            time.sleep(0.05)
    finally:
        jax.profiler.stop_trace()

    path = find_trace_file(str(tmp_path))
    events = load_trace_events(path)
    assert events, "empty trace"

    phases = device_seconds_by_phase(str(tmp_path))
    assert "compute" in phases and "hostwait" in phases, phases
    # Wall times from the trace must roughly match the host-side timer.
    assert abs(phases["hostwait"]["wall_s"] - timer.totals["hostwait"]) < 0.05
    assert phases["compute"]["wall_s"] > 0
    # Pure host sleep must attribute (almost) no device time.
    assert phases["hostwait"]["device_s"] <= phases["hostwait"]["wall_s"]
    for rec in phases.values():
        assert rec["device_s"] <= rec["wall_s"] + 0.01
        assert rec["host_gap_s"] >= 0

    # Per-dispatch host accounting: events land inside the compute phase,
    # are sorted by total duration, and never include the window itself.
    rows = host_events_in_phase(str(tmp_path), "compute", top=5)
    assert isinstance(rows, list)
    for r in rows:
        assert set(r) == {"name", "total_s", "count"}
        assert not r["name"].startswith("phase=")
        assert r["count"] >= 1 and r["total_s"] >= 0
    totals = [r["total_s"] for r in rows]
    assert totals == sorted(totals, reverse=True)

    # Per-op device table: sorted desc, well-formed, and its grand total
    # stays within the per-pid busy-union bound (ops on ONE lane per pid
    # can't exceed union-across-lanes only if lanes overlap; they must at
    # least be finite and non-negative).
    ops = device_op_table(str(tmp_path), top=8)
    assert isinstance(ops, list)
    for r in ops:
        assert set(r) == {"name", "total_s", "count"}
        assert r["count"] >= 1 and r["total_s"] >= 0
    tots = [r["total_s"] for r in ops]
    assert tots == sorted(tots, reverse=True)

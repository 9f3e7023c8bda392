"""Parse jax.profiler trace-viewer dumps into per-phase device seconds.

VERDICT r3 next #2: the e2e projection's host-attached/dp4 factors were
asserted; this module turns a captured trace (`jax.profiler.start_trace` ->
TensorBoard `*.trace.json.gz`) into measured numbers:

  - device-lane busy seconds per pipeline phase (phases are host-side
    `jax.profiler.TraceAnnotation` windows named ``phase=<name>``, emitted by
    utils.profiling.PhaseTimer(annotate=True)), and
  - the host gap (wall - device busy) per phase — the relay-dispatch tax a
    host-attached deployment mostly does not pay.

The trace viewer JSON puts host and device events on one µs timeline, so a
device event is attributed to the phase window(s) its midpoint falls in.
Phase nesting mirrors the wall-clock semantics ("caption" is a subset of
"memory_update").
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from typing import Dict, List, Tuple


def find_trace_file(trace_dir: str) -> str:
    """Newest trace-viewer JSON under a jax.profiler output dir."""
    pats = [
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json"),
    ]
    hits: List[str] = []
    for p in pats:
        hits += glob.glob(p, recursive=True)
    if not hits:
        raise FileNotFoundError(f"no *.trace.json(.gz) under {trace_dir}")
    return max(hits, key=os.path.getmtime)


def load_trace_events(path: str) -> List[dict]:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt", encoding="utf-8") as f:
        doc = json.load(f)
    return doc.get("traceEvents", doc if isinstance(doc, list) else [])


def _device_pids(events) -> set:
    """pids whose process_name metadata names a device (TPU/GPU) lane."""
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = (e.get("args") or {}).get("name", "")
            low = name.lower()
            if "tpu" in low or "gpu" in low or "/device:" in low:
                pids.add(e.get("pid"))
    return pids


def _phase_windows(events, prefix: str) -> Dict[str, List[Tuple[float, float]]]:
    wins: Dict[str, List[Tuple[float, float]]] = {}
    for e in events:
        if e.get("ph") == "X" and str(e.get("name", "")).startswith(prefix):
            name = e["name"][len(prefix):]
            ts, dur = float(e.get("ts", 0.0)), float(e.get("dur", 0.0))
            wins.setdefault(name, []).append((ts, ts + dur))
    return wins


def device_seconds_by_phase(
    trace_dir: str, prefix: str = "phase="
) -> Dict[str, dict]:
    """-> {phase: {"wall_s", "device_s", "host_gap_s", "device_events"}}.

    device_s sums complete ('X') events on device pids whose midpoints fall
    inside the phase's host-annotation windows. Device lanes stack nested
    events (module -> op); double-counting is avoided by taking the UNION of
    event intervals per (pid, tid) lane — busy time, not summed event time.
    """
    path = find_trace_file(trace_dir)
    events = load_trace_events(path)
    dev_pids = _device_pids(events)
    windows = _phase_windows(events, prefix)

    # Busy intervals per device PID, unioned across all of its lanes (a pid
    # often carries mirrored "XLA Modules"/"XLA Ops" tids — summing per-tid
    # unions would double-count the same busy microseconds).
    lanes: Dict[Tuple, List[Tuple[float, float]]] = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            key = (e.get("pid"),)
            ts, dur = float(e.get("ts", 0.0)), float(e.get("dur", 0.0))
            lanes.setdefault(key, []).append((ts, ts + dur))
    outer: List[Tuple[float, float]] = []
    for evs in lanes.values():
        evs.sort()
        last_end = -1.0
        for ts, end in evs:
            start = max(ts, last_end)
            if end > start:
                outer.append((start, end))
                last_end = end

    out: Dict[str, dict] = {}
    for phase, wins in windows.items():
        wall = sum(e - s for s, e in wins)
        dev = 0.0
        ndev = 0
        for ts, end in outer:
            mid = 0.5 * (ts + end)
            if any(s <= mid < e for s, e in wins):
                dev += end - ts
                ndev += 1
        out[phase] = {
            "wall_s": round(wall / 1e6, 3),
            "device_s": round(dev / 1e6, 3),
            "host_gap_s": round(max(0.0, wall - dev) / 1e6, 3),
            "device_events": ndev,
        }
    return out


def device_op_table(trace_dir: str, top: int = 25) -> List[dict]:
    """Top device ops by summed duration: [{"name", "total_s", "count"}].

    Per device pid, only the tid carrying the MOST complete events is
    tabulated — that is the per-op lane; module-level lanes mirror one
    whole-program event per launch and would dwarf every op. Rows sorted by
    total_s descending.
    """
    path = find_trace_file(trace_dir)
    events = load_trace_events(path)
    dev_pids = _device_pids(events)
    by_lane: Dict[Tuple, List[dict]] = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            by_lane.setdefault((e.get("pid"), e.get("tid")), []).append(e)
    agg: Dict[str, List[float]] = {}
    by_pid: Dict[object, List[Tuple[Tuple, List[dict]]]] = {}
    for key, evs in by_lane.items():
        by_pid.setdefault(key[0], []).append((key, evs))
    for lanes in by_pid.values():
        _, evs = max(lanes, key=lambda kv: len(kv[1]))
        for e in evs:
            rec = agg.setdefault(str(e.get("name", "")), [0.0, 0])
            rec[0] += float(e.get("dur", 0.0))
            rec[1] += 1
    rows = [
        {"name": n, "total_s": round(t / 1e6, 5), "count": c}
        for n, (t, c) in agg.items()
    ]
    rows.sort(key=lambda r: -r["total_s"])
    return rows[:top]


def host_events_in_phase(
    trace_dir: str, phase: str, top: int = 20, prefix: str = "phase="
) -> List[dict]:
    """Top host-lane events (by summed duration) inside a phase's windows.

    The per-dispatch accounting for the relay tax: host events are complete
    ('X') events on NON-device pids whose midpoints fall inside the phase
    window, excluding the window event itself. Returns
    [{"name", "total_s", "count"}] sorted by total_s desc.
    """
    path = find_trace_file(trace_dir)
    events = load_trace_events(path)
    dev_pids = _device_pids(events)
    wins = _phase_windows(events, prefix).get(phase, [])
    agg: Dict[str, List[float]] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") in dev_pids:
            continue
        name = str(e.get("name", ""))
        if name.startswith(prefix):
            continue
        ts, dur = float(e.get("ts", 0.0)), float(e.get("dur", 0.0))
        mid = ts + 0.5 * dur
        if any(s <= mid < end for s, end in wins):
            rec = agg.setdefault(name, [0.0, 0])
            rec[0] += dur
            rec[1] += 1
    rows = [
        {"name": n, "total_s": round(t / 1e6, 4), "count": c}
        for n, (t, c) in agg.items()
    ]
    rows.sort(key=lambda r: -r["total_s"])
    return rows[:top]

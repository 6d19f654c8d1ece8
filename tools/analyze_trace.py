#!/usr/bin/env python
"""Summarize a JAX profiler trace without tensorboard.

The tensorboard_plugin_profile convert path is broken in this image
(pywrap ABI mismatch), so this reads the Chrome-format trace the profiler
also emits (*.trace.json.gz) and prints the top ops by total duration per
process/device — enough to see what the latency chain is made of.

Usage: python tools/analyze_trace.py <profile_dir> [top_n] [name_filter]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def find_traces(root):
    if root.endswith(".json.gz"):
        return [root]
    return sorted(
        glob.glob(
            os.path.join(root, "**", "*.trace.json.gz"), recursive=True
        )
    )


def summarize(path, top_n=30, name_filter=""):
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # pid -> process name from metadata events
    pnames = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pnames[ev["pid"]] = ev.get("args", {}).get("name", "")
    per_proc = defaultdict(lambda: (defaultdict(float), defaultdict(int)))
    for ev in events:
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "?")
        if name_filter and name_filter not in name:
            continue
        totals, counts = per_proc[ev.get("pid", -1)]
        totals[name] += ev.get("dur", 0)  # microseconds
        counts[name] += 1
    print(f"== {os.path.basename(path)}")
    for pid, (totals, counts) in sorted(per_proc.items()):
        total_ms = sum(totals.values()) / 1e3
        print(
            f"\n-- pid {pid} ({pnames.get(pid, '?')}): "
            f"{sum(counts.values())} events, {total_ms:.2f} ms total"
        )
        for name, us in sorted(totals.items(), key=lambda kv: -kv[1])[
            :top_n
        ]:
            print(f"  {us / 1e3:9.3f} ms  x{counts[name]:<7} {name[:110]}")


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    name_filter = sys.argv[3] if len(sys.argv) > 3 else ""
    paths = find_traces(root)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    for p in paths:
        summarize(p, top_n, name_filter)


if __name__ == "__main__":
    main()

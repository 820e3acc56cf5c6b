"""Summarize a jax.profiler device trace: per-op time, grouped and ranked.

Reads the ``*.trace.json.gz`` Perfetto export under a profile directory
(written by ``tools/mfu_probe.py --profile`` / ``bench_tagger --profile``)
and prints total device-stream time by op name so MFU gaps can be attributed
to specific fusions instead of guessed at.
"""

from __future__ import annotations

import argparse
import collections
import gzip
import json
import re
import sys
from pathlib import Path


def load_trace(profile_dir: Path) -> dict:
    paths = sorted(profile_dir.rglob("*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {profile_dir}")
    with gzip.open(paths[-1], "rt") as fh:
        return json.load(fh)


def device_events(trace: dict) -> list[dict]:
    """Complete ('X') events on device-side tracks (TensorCore / XLA Ops)."""
    # pid -> process name from metadata
    proc_names: dict[int, str] = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            proc_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in proc_names.items()
        if re.search(r"TPU|Device|/device", name or "", re.I)
    }
    out = []
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "X" and ev.get("pid") in device_pids:
            out.append(ev)
    return out


def _group(name: str) -> str:
    """Collapse fusion instances: 'fusion.123' -> 'fusion', keep op kind."""
    return re.sub(r"[.\d]+$", "", name)


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("profile_dir", type=Path)
    parser.add_argument("--top", type=int, default=25)
    parser.add_argument("--raw", action="store_true", help="no name grouping")
    args = parser.parse_args(argv)

    trace = load_trace(args.profile_dir)
    events = device_events(trace)
    if not events:
        print("no device events found; track names in trace:", file=sys.stderr)
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                print("  ", ev.get("pid"), ev.get("args", {}).get("name"), file=sys.stderr)
        return 1

    total_us = collections.Counter()
    count = collections.Counter()
    for ev in events:
        key = ev.get("name", "?") if args.raw else _group(ev.get("name", "?"))
        total_us[key] += ev.get("dur", 0)
        count[key] += 1
    grand = sum(total_us.values())
    print(f"device events: {len(events)}, total {grand / 1e3:.2f} ms")
    for name, us in total_us.most_common(args.top):
        print(f"{us / 1e3:9.2f} ms  {100 * us / grand:5.1f}%  x{count[name]:<5d} {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

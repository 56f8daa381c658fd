#!/usr/bin/env python
"""Diff two bench JSON lines (e.g. BENCH_r01.json vs a fresh run):
per-query delta, sorted by regression.  Throttle caveat: only compare
runs taken on a quiet host (see BASELINE.md); a 1.3x global drift is
host noise, a single query drifting alone is a real regression.

Usage: python BENCH/diff_bench.py BENCH_r01.json new_bench.json
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    try:  # whole-file JSON (pretty-printed driver records)
        return json.loads(text)
    except json.JSONDecodeError:
        pass
    for line in reversed(text.splitlines()):  # last JSON line (bench.py)
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"no JSON found in {path}")


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    a, b = load(sys.argv[1]), load(sys.argv[2])
    # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
    a, b = a.get("parsed", a), b.get("parsed", b)
    qa, qb = a["queries"], b["queries"]
    rows = []
    for name in sorted(set(qa) & set(qb)):
        va, vb = qa[name], qb[name]
        if not isinstance(va, (int, float)) or not isinstance(vb, (int, float)):
            continue
        if va <= 0:
            continue
        rows.append((vb / va, name, va, vb))
    rows.sort(reverse=True)
    print(f"{'ratio':>7}  {'old':>9}  {'new':>9}  query")
    for ratio, name, va, vb in rows:
        # seconds/latency: bigger is worse; counters and *_per_sec are
        # informational (bigger is better or size-dependent)
        info = name.endswith(("_per_sec", "_rows", "_batches"))
        flag = "  <-- regression?" if ratio > 1.3 and not info else ""
        print(f"{ratio:7.2f}  {va:9.3f}  {vb:9.3f}  {name}{flag}")
    only_new = sorted(set(qb) - set(qa))
    if only_new:
        print("new-only:", ", ".join(only_new))


if __name__ == "__main__":
    main()

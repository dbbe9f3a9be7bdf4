"""Calibration-normalized bench comparison.

The shared host's throughput drifts 1.3-1.9x between sessions, and the
single-core and parallel-scan probes drift INDEPENDENTLY (SCALE.md
caveat), so raw cross-round deltas are meaningless. This tool compares
two bench records (BENCH_rNN.json driver files — with their "parsed"
wrapper — or raw bench.py JSON lines) after dividing each query's
timing by the parallel-scan calibration ratio, and flags queries whose
normalized ratio leaves a band.

Usage: python tools/bench_compare.py OLD NEW [--band 1.25]
"""

from __future__ import annotations

import json
import statistics
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    try:
        d = json.loads(text)
    except json.JSONDecodeError:
        d = json.loads(text.splitlines()[-1])  # bench.py stdout tail
    if "parsed" in d:  # driver BENCH_rNN.json wrapper
        d = d["parsed"]
    return d


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    band = 1.25
    for a in sys.argv[1:]:
        if a.startswith("--band"):
            band = float(a.split("=", 1)[1] if "=" in a else args.pop())
    old, new = _load(args[0]), _load(args[1])
    co, cn = old["calib"], new["calib"]
    scan_ratio = cn["scan_count_sec"] / co["scan_count_sec"]
    loop_ratio = cn["py_loop_sec"] / co["py_loop_sec"]
    print(
        f"calib: scan {co['scan_count_sec']} -> {cn['scan_count_sec']} "
        f"({scan_ratio:.2f}x), py_loop {co['py_loop_sec']} -> "
        f"{cn['py_loop_sec']} ({loop_ratio:.2f}x)"
    )
    qo, qn = old["queries"], new["queries"]
    shared = sorted(k for k in qn if k in qo and qo[k] > 0)
    rows = []
    for k in shared:
        raw = qn[k] / qo[k]
        rows.append((k, qo[k], qn[k], raw, raw / scan_ratio))
    norm = [r[4] for r in rows]
    print(
        f"{len(shared)} shared queries | raw total "
        f"{sum(qn[k] for k in shared):.1f} vs {sum(qo[k] for k in shared):.1f} "
        f"({sum(qn[k] for k in shared) / sum(qo[k] for k in shared):.2f}x) | "
        f"median normalized {statistics.median(norm):.2f}x"
    )
    flagged = [r for r in rows if r[4] > band or r[4] < 1 / band]
    if flagged:
        print(f"\noutside the {band:.2f}x band (normalized):")
        for k, o, n, raw, nm in sorted(flagged, key=lambda r: -r[4]):
            print(f"  {k:40s} {o:7.2f} -> {n:7.2f}  raw {raw:.2f}x  norm {nm:.2f}x")
    else:
        print(f"no query outside the {band:.2f}x normalized band")
    only_new = sorted(k for k in qn if k not in qo)
    only_old = sorted(k for k in qo if k not in qn)
    if only_new:
        print("new entries:", ", ".join(f"{k} ({qn[k]:.2f}s)" for k in only_new))
    if only_old:
        print("dropped entries:", ", ".join(only_old))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Bench regression gate: compare two bench artifacts, fail on regression.

The reference's CI alerts at 200% of the previous run on every push
(/root/reference/.github/workflows/bench.yml:20-33, criterion continuous
benchmarking with alert-threshold '200%'); this is the same gate over the
driver's BENCH_r{N}.json snapshots (or raw bench.py JSON lines).

Usage:
    python scripts/bench_compare.py BENCH_r05.json BENCH_r04.json
    python scripts/bench_compare.py new.json old.json --fail-ratio 2.0

Exit code 1 if any shared metric regressed by more than --fail-ratio
(default 2.0x, the reference's threshold); >10% drops are flagged as
warnings but do not fail. Higher-is-better vs lower-is-better is decided
by the unit ("s" and "bytes" are lower-better; rates are higher-better).
"""
from __future__ import annotations

import argparse
import json
import sys


LOWER_BETTER_UNITS = {"s", "ms", "bytes"}


def load_metrics(path: str) -> dict[str, dict]:
    """Flatten a bench artifact (driver snapshot or raw bench.py line)
    into {metric_name: entry}."""
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)
    except json.JSONDecodeError:
        # raw bench.py output: take the last JSON line
        obj = None
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                obj = json.loads(line)
        if obj is None:
            raise
    if "parsed" in obj:            # driver BENCH_r{N}.json snapshot
        obj = obj["parsed"]
    out: dict[str, dict] = {}

    def add(entry):
        if not isinstance(entry, dict) or "metric" not in entry:
            return
        if isinstance(entry.get("value"), (int, float)):
            out[entry["metric"]] = entry  # keep zeros: a collapse must FAIL
        for sub in entry.get("extras", []) or []:
            add(sub)

    add(obj)
    return out


def compare(new: dict[str, dict], old: dict[str, dict],
            fail_ratio: float, warn_drop: float):
    """Returns (failures, warnings, report_lines)."""
    failures, warnings, lines = [], [], []
    for name in sorted(set(new) & set(old)):
        nv, ov = float(new[name]["value"]), float(old[name]["value"])
        if ov <= 0:
            continue  # no usable reference point
        if nv <= 0:
            lines.append(f"{name:40s} {ov:>14.2f} -> {nv:>14.2f} "
                         f"COLLAPSED")
            failures.append((name, 0.0))
            continue
        unit = new[name].get("unit", "")
        lower_better = unit in LOWER_BETTER_UNITS
        # ratio > 1 means improvement in both orientations
        ratio = (ov / nv) if lower_better else (nv / ov)
        arrow = "better" if ratio >= 1.0 else "worse"
        lines.append(f"{name:40s} {ov:>14.2f} -> {nv:>14.2f} {unit:14s}"
                     f" {ratio:6.3f}x {arrow}")
        if ratio < 1.0 / fail_ratio:
            failures.append((name, ratio))
        elif ratio < 1.0 - warn_drop:
            warnings.append((name, ratio))
    for name in sorted(set(old) - set(new)):
        lines.append(f"{name:40s} DROPPED (present in old, missing in new)")
        failures.append((name, 0.0))  # a vanished metric must not pass
    return failures, warnings, lines


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("new", help="newer bench artifact (JSON)")
    ap.add_argument("old", help="older bench artifact (JSON)")
    ap.add_argument("--fail-ratio", type=float, default=2.0,
                    help="fail when a metric is this many times worse "
                         "(reference CI: 2.0)")
    ap.add_argument("--warn-drop", type=float, default=0.10,
                    help="warn when a metric drops by more than this "
                         "fraction (default 10%%)")
    args = ap.parse_args()

    new, old = load_metrics(args.new), load_metrics(args.old)
    failures, warnings, lines = compare(new, old, args.fail_ratio,
                                        args.warn_drop)
    print("\n".join(lines))
    for name, ratio in warnings:
        print(f"WARNING: {name} regressed to {ratio:.3f}x "
              f"(>{args.warn_drop:.0%} drop)" if ratio else
              f"WARNING: {name} disappeared from the new artifact")
    for name, ratio in failures:
        print(f"FAILURE: {name} regressed to {ratio:.3f}x "
              f"(threshold {1.0/args.fail_ratio:.3f}x)")
    if not (set(new) & set(old)):
        print("FAILURE: no shared metrics between the two artifacts")
        return 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python3
"""mt-adjusted trend analysis of a StreamSoak JSONL artifact.

The r13 lesson: raw first10->last10 wall ratios read host steal as sink
growth (the box got QUIETER across that soak while cellLabel's raw wall
rose — the mt-adjusted trend was ~1.35 where the notes claimed 1.10).
This script adjusts each line's wall by its own calib_mt stamp
(wall_adj = wall * (mt_ref / calib_mt)), DROPS lines whose wall
overlapped a probe spin (mt_overlap, recorded since r14), and reports
first-N vs last-N medians per flow, raw and adjusted.

  python3 tools/soak_trend.py docs/soak_r14.jsonl [window=15] [mt_ref=0.120]
"""
import json
import statistics
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "docs/soak_r14.jsonl"
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    mt_ref = float(sys.argv[3]) if len(sys.argv) > 3 else 0.120
    flows = {}
    for line in open(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "wall_ms" not in e:
            continue
        flows.setdefault(e["flow"], []).append(e)
    print(f"{'flow':16s} {'n':>4s} {'drop':>4s} "
          f"{'raw f/l':>9s} {'adj f/l':>9s} {'ratio_raw':>9s} {'ratio_adj':>9s}")
    for flow, lines in flows.items():
        lines.sort(key=lambda e: e["batch"])
        kept = [e for e in lines if not e.get("mt_overlap", False)]
        dropped = len(lines) - len(kept)
        if len(kept) < 2 * window:
            kept = lines  # too few clean lines: fall back, report it
        def med(ls, key):
            return statistics.median(key(e) for e in ls)
        first, last = kept[:window], kept[-window:]
        raw_f = med(first, lambda e: e["wall_ms"])
        raw_l = med(last, lambda e: e["wall_ms"])
        adj = lambda e: e["wall_ms"] * (mt_ref / e["calib_mt"]) \
            if e.get("calib_mt", 0) > 0 else e["wall_ms"]
        adj_f, adj_l = med(first, adj), med(last, adj)
        print(f"{flow:16s} {len(kept):4d} {dropped:4d} "
              f"{raw_f:4.0f}/{raw_l:4.0f} {adj_f:4.0f}/{adj_l:4.0f} "
              f"{raw_l / raw_f:9.2f} {adj_l / adj_f:9.2f}")
    # Matched-contention trend: linear mt-adjustment over- or
    # under-corrects when steal ramps during a flow (Spark wall does not
    # scale 1:1 with the spin). Within the QUIET band (calib_mt <= 1.5x
    # ref, the contended threshold) raw walls need no adjustment at all:
    # compare the earliest vs latest quiet window directly.
    print("\nquiet-band (calib_mt <= 1.5x ref) early vs late, raw:")
    for flow, lines in flows.items():
        lines.sort(key=lambda e: e["batch"])
        quiet = [e for e in lines
                 if not e.get("mt_overlap", False)
                 and 0 < e.get("calib_mt", 0) <= 1.5 * mt_ref]
        if len(quiet) < 2 * window:
            print(f"{flow:16s} insufficient quiet lines ({len(quiet)})")
            continue
        first, last = quiet[:window], quiet[-window:]
        f = statistics.median(e["wall_ms"] for e in first)
        l = statistics.median(e["wall_ms"] for e in last)
        span = last[-1]["batch"] - first[0]["batch"]
        print(f"{flow:16s} n={len(quiet):3d} span={span:3d} drops "
              f"{f:5.0f} -> {l:5.0f} ms  ratio {l / f:5.2f}")


if __name__ == "__main__":
    main()

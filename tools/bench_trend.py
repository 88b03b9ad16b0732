#!/usr/bin/env python3
"""Cross-round per-query bench trend over BENCH_r*.json.

Each driver round file keeps only a TAIL fragment of the bench stdout, so
a query's series covers the rounds where its pair survived truncation.
Parses every visible "q_*": seconds pair, prints a per-query trend table
(markdown, for PERF.md) and flags queries that grew >FLAG_RATIO between
their earliest and latest visible round among the last WINDOW rounds —
the slow creep a last-two-runs diff (BenchDiff) structurally misses.

Usage: python3 tools/bench_trend.py [--flag-ratio 1.5] [--window 3] [--all]
  --all prints the full table; default prints flagged + the 15 slowest.
"""
import glob
import json
import re
import sys

PAIR = re.compile(r'"(q_[a-z0-9_]+)":(-?[0-9.]+)')


def load():
    rounds = {}
    for path in sorted(glob.glob("BENCH_r*.json")):
        with open(path) as f:
            doc = json.load(f)
        n = doc.get("n")
        tail = doc.get("tail", "")
        # a pair bisected by the truncation boundary can surface a bogus
        # shortened name; drop the first match unless the tail starts
        # exactly at a pair boundary
        pairs = [(m.group(1), float(m.group(2)), m.start()) for m in PAIR.finditer(tail)]
        if pairs and pairs[0][2] > 0 and tail[pairs[0][2] - 1] != ",":
            pairs = pairs[1:]
        rounds[n] = {q: v for q, v, _ in pairs if v >= 0}
    return rounds


def main():
    flag_ratio = 1.5
    window = 3
    show_all = "--all" in sys.argv
    if "--flag-ratio" in sys.argv:
        flag_ratio = float(sys.argv[sys.argv.index("--flag-ratio") + 1])
    if "--window" in sys.argv:
        window = int(sys.argv[sys.argv.index("--window") + 1])

    rounds = load()
    if not rounds:
        print("no BENCH_r*.json found")
        return
    ns = sorted(rounds)
    queries = sorted({q for r in rounds.values() for q in r})

    flagged, table = [], []
    for q in queries:
        series = [(n, rounds[n][q]) for n in ns if q in rounds[n]]
        cells = ["%.2f" % rounds[n][q] if q in rounds[n] else "·" for n in ns]
        recent = [(n, v) for n, v in series if n >= ns[-1] - window + 1]
        trend = ""
        if len(recent) >= 2 and recent[0][1] >= 0.2:
            ratio = recent[-1][1] / max(recent[0][1], 1e-9)
            trend = "%.2fx" % ratio
            if ratio >= flag_ratio and recent[-1][1] >= 0.5:
                flagged.append((q, recent[0], recent[-1], ratio))
        table.append((q, cells, trend, series[-1][1] if series else 0.0))

    print("| query | " + " | ".join("r%d" % n for n in ns) + " | trend (last %d) |" % window)
    print("|---" * (len(ns) + 2) + "|")
    shown = table if show_all else sorted(table, key=lambda t: -t[3])[:15]
    for q, cells, trend, _ in sorted(shown, key=lambda t: t[0]):
        print(f"| {q} | " + " | ".join(cells) + f" | {trend} |")

    print()
    if flagged:
        print(f"FLAGGED (> {flag_ratio}x across last {window} visible rounds, latest >= 0.5s):")
        for q, (n0, v0), (n1, v1), r in sorted(flagged, key=lambda t: -t[3]):
            print(f"  {q}: r{n0} {v0:.2f}s -> r{n1} {v1:.2f}s ({r:.2f}x)")
    else:
        print(f"FLAGGED: none (> {flag_ratio}x across last {window} visible rounds)")


if __name__ == "__main__":
    main()

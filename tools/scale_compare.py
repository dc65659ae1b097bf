#!/usr/bin/env python
"""Per-query scaling-factor table from two bench CSVs (sf0.1 vs sf1).

Usage: python tools/scale_compare.py BENCH_STATS.csv BENCH_STATS_SF1.csv [N]

Prints a markdown table of the N worst scalers (time ratio at 10x data),
plus distribution stats — the evidence rows PERFORMANCE.md's scale section
cites. Reads the reference-style CSV bench.py writes (Query,Millis,...).
"""

from __future__ import annotations

import csv
import sys


def load(path: str) -> dict[str, dict]:
    out = {}
    with open(path) as f:
        for row in csv.DictReader(f):
            out[row["Query"]] = {
                "ms": int(row["Millis"]),
                "rows": int(row["Rows"]),
                "shuffles": int(row["ShuffleCnt"]),
                "spill": int(row["SpillBytes"]),
            }
    return out


def main() -> None:
    base, big = load(sys.argv[1]), load(sys.argv[2])
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    common = sorted(set(base) & set(big))
    rows = []
    for q in common:
        b, g = base[q], big[q]
        ratio = g["ms"] / max(b["ms"], 1)
        rows.append((ratio, q, b, g))
    rows.sort(reverse=True)
    t_base = sum(base[q]["ms"] for q in common) / 1000
    t_big = sum(big[q]["ms"] for q in common) / 1000
    spills = [q for q in common if big[q]["spill"] > 0]
    sub10 = sum(1 for r, *_ in rows if r <= 10)
    print(f"common queries: {len(common)}; total {t_base:.1f}s -> {t_big:.1f}s "
          f"({t_big / t_base:.2f}x at 10x data)")
    print(f"<=10x (at-or-below-linear): {sub10}/{len(rows)}; spilling at sf1: {spills or 'none'}")
    print()
    print("| query | sf0.1 ms | sf1 ms | ratio | sf1 rows | sf1 shuffles |")
    print("|---|---|---|---|---|---|")
    for ratio, q, b, g in rows[:n]:
        print(f"| {q} | {b['ms']} | {g['ms']} | {ratio:.1f}x | {g['rows']} | {g['shuffles']} |")


if __name__ == "__main__":
    main()

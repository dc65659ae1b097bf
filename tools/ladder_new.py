#!/usr/bin/env python
"""Time a named subset of registry entries at one SF dir — the per-session
ladder harness behind PERFORMANCE.md's sf1/sf10 tables for new entries.

Usage: python tools/ladder_new.py <sf_dir> <name1,name2,...> [reps]

Prints one JSON line per entry: {"name", "sec", "rows"} (best of reps,
steady-state: families/memos warm after the first run).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from skinnerdb_spark.plans.metrics import run_and_count
    from skinnerdb_spark.registry import all_specs
    from skinnerdb_spark.session import get_spark

    spark = get_spark(app_name="ladder-new")
    specs = all_specs()
    for name in names:
        spec = specs[name]
        best, rows = None, None
        for _ in range(reps):
            t0 = time.monotonic()
            # run_and_count, NEVER .count(): a bare .count() plans a separate
            # count-aggregate and Catalyst prunes the expensive output
            # columns, so the timing measures a hollowed-out plan (proven:
            # 3.9 s pruned vs 18.2 s real on stats_bootstrap_ci at sf0.1).
            rows = run_and_count(spec.spark(spark, sf_dir))
            sec = time.monotonic() - t0
            best = sec if best is None else min(best, sec)
        print(json.dumps({"name": name, "sec": round(best, 2), "rows": rows}),
              flush=True)


if __name__ == "__main__":
    main()

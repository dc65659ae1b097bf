#!/usr/bin/env python
"""Spot-verify named registry entries against the DuckDB oracle at a given
SF dir, with the driver-faithful comparison from tests/test_oracle.py
(exact values + canonical-text on numeric-ish columns).

Usage: python tools/oracle_spot.py SF_DIR name [name ...]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import duckdb  # noqa: E402

from skinnerdb_spark.registry import all_specs  # noqa: E402
from skinnerdb_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "partsupp",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    from test_oracle import assert_frames_match  # the driver-faithful compare

    specs = all_specs()
    spark = get_spark(app_name="oracle-spot")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    rc = 0
    for name in names:
        spec = specs[name]
        if spec.oracle is None:
            print(f"{name}: NO ORACLE (rows-only)")
            continue
        try:
            s = spec.spark(spark, sf_dir).toPandas()
            o = con.execute(spec.oracle).df()
            assert_frames_match(s, o, name)
            print(f"{name}: OK ({len(s)} rows)")
        except AssertionError as exc:
            print(f"{name}: MISMATCH — {exc}")
            rc = 1
        except Exception as exc:
            print(f"{name}: ERROR — {type(exc).__name__}: {exc}")
            rc = 1
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())

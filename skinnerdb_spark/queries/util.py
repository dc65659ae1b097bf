"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from skinnerdb_spark.catalog import read_table  # noqa: F401  (re-export)


def ts(s: str) -> Column:
    """TIMESTAMP_NTZ literal (test data stores dates as timestamp_ntz)."""
    if len(s) == 10:
        s = s + " 00:00:00"
    return F.expr(f"TIMESTAMP_NTZ '{s}'")

"""Shared helpers for query modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from skinnerdb_spark.catalog import read_table  # noqa: F401  (re-export)


def adaptive(df: DataFrame) -> DataFrame:
    """Route a built query through runtime-adaptive join ordering
    (plans/graph.py): the join graph is extracted from the analyzed plan,
    a UCB1 bandit picks the order from sampled episodes, and the learned
    order is cached per graph signature. Ineligible shapes return the input
    plan unchanged — wrapping is always semantics-preserving."""
    from skinnerdb_spark.plans.graph import adaptive_reorder

    return adaptive_reorder(df).df


def ts(s: str) -> Column:
    """TIMESTAMP_NTZ literal (test data stores dates as timestamp_ntz)."""
    if len(s) == 10:
        s = s + " 00:00:00"
    return F.expr(f"TIMESTAMP_NTZ '{s}'")

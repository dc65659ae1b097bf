"""Driver contract for the spark-graft builder (PySpark target).

Thin wrapper over skinnerdb_spark.registry — every implemented operator from
SURVEY.md §2 (plus the beyond-reference pipeline tier) registers a Spark
implementation and, where SQL-expressible, a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from skinnerdb_spark.registry import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H q03 shape —
    3-way join + group + order/limit, the full NONE->GROUPS pipeline of the
    reference's query lifecycle (SURVEY §3.1)."""
    specs = all_specs()
    return specs["tpch_q03"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""
    return {name: spec.spark for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each queries() entry.

    Entries without an oracle (genuinely non-SQL-expressible ops) are omitted
    -> the driver records a weaker rows-only check for those.
    """
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}

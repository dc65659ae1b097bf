"""Catalog: map the test warehouse (parquet-per-table directories) to Spark.

Replaces the reference's CatalogManager/DbInfo (src/catalog/CatalogManager.java:71-79,
src/catalog/info/TableInfo.java) — Spark's own catalog + lazy Parquet scans
subsume the Java-serialized schema file and the eager RAM load
(src/buffer/BufferManager.java:79-104).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: every table the driver generates (TESTDATA.md)
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

#: dimension tables small enough to always broadcast in star joins
BROADCAST_DIMS = {"region", "nation", "supplier", "part"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy columnar scan; Catalyst pushes filters/projections into it.

    events.ts is TIMESTAMP(NANOS) in parquet — Spark reads it as long
    (spark.sql.legacy.parquet.nanosAsLong) and we truncate to microseconds,
    exactly like DuckDB's ns->us conversion, yielding TIMESTAMP_NTZ under the
    UTC session.

    The config is set here at runtime (it is session-settable), not only in
    session.py, because callers — including the verification driver — may
    hand us a SparkSession built without our factory; a plain session throws
    PARQUET_TYPE_ILLEGAL on the events table otherwise.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos -> NTZ without any timezone dependency: epoch-NTZ + exact
        # decimal-second interval. (timestamp_micros + CAST AS TIMESTAMP_NTZ
        # would shift wall-clock under a non-UTC caller session.)
        df = df.withColumn(
            "ts",
            F.expr(
                "CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ) + "
                "make_dt_interval(0, 0, 0, CAST(ts DIV 1000 AS DECIMAL(20,0)) / 1000000)"
            ),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str, prefix: str = "") -> None:
    """Register every table as a temp view so ``spark.sql`` works directly —
    the equivalent of the reference console session having a loaded DB."""
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(prefix + t)

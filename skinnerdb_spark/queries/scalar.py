"""Scalar expression surface — one golden query per construct family.

Covers the reference's complete scalar surface (SURVEY §2.8): arithmetic,
comparisons, boolean logic, BETWEEN, IN-list, IS [NOT] NULL, LIKE/NOT LIKE,
CASE WHEN, CAST, CONCAT, EXTRACT, interval arithmetic. The reference compiles
these to JVM bytecode via ASM (src/expressions/compilation/
ExpressionCompiler.java, 2012 LoC); Spark's whole-stage codegen does the same
job natively.

Cross-engine notes baked in below:
- CAST(double AS BIGINT): Spark truncates, DuckDB rounds -> always go through
  FLOOR explicitly.
- EXTRACT returns int (Spark) vs bigint (DuckDB) -> oracle casts to INTEGER.
- test data has no NULLs -> NULLIF manufactures them so IS NULL paths and
  null-skipping aggregates are actually exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skinnerdb_spark.queries.util import read_table, ts
from skinnerdb_spark.registry import register


@register(
    "scalar_surface",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 40000 THEN 'big'
                WHEN o_totalprice > 15000 THEN 'mid'
                ELSE 'small' END AS size_class,
           CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
           o_totalprice * 1.07 + 5.0 AS price_taxed,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS o_month,
           o_orderstatus || '-' || o_orderpriority AS status_priority,
           (o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00') AS in_window,
           o_orderpriority IN ('1-URGENT', '2-HIGH') AS is_high,
           (o_orderpriority LIKE '%URGENT%') AS like_urgent,
           (o_orderpriority NOT LIKE '1%') AS not_like_one,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           (NULLIF(o_orderstatus, 'O') IS NULL) AS is_open,
           (NULLIF(o_orderstatus, 'O') IS NOT NULL) AS is_closed
    FROM orders
    WHERE o_orderkey % 7 = 0
    """,
    tags=("scalar",),
)
def scalar_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    status_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 40000, "big")
        .when(F.col("o_totalprice") > 15000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.floor(F.col("o_totalprice")).cast("bigint").alias("price_floor"),
        (F.col("o_totalprice") * 1.07 + 5.0).alias("price_taxed"),
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.concat(F.col("o_orderstatus"), F.lit("-"), F.col("o_orderpriority")).alias(
            "status_priority"
        ),
        F.col("o_orderdate").between(ts("1996-01-01"), ts("1997-12-31")).alias("in_window"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_high"),
        F.col("o_orderpriority").like("%URGENT%").alias("like_urgent"),
        (~F.col("o_orderpriority").like("1%")).alias("not_like_one"),
        status_null.alias("status_or_null"),
        status_null.isNull().alias("is_open"),
        status_null.isNotNull().alias("is_closed"),
    )


@register(
    "scalar_interval_arith",
    """
    SELECT l_linenumber,
           COUNT(*) AS n_rows,
           MIN(l_shipdate + INTERVAL 90 DAY)  AS min_ship_plus90,
           MAX(l_shipdate - INTERVAL 1 MONTH) AS max_ship_minus1m
    FROM lineitem
    WHERE l_shipdate + INTERVAL 30 DAY < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linenumber
    """,
    tags=("scalar", "interval"),
)
def scalar_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date +/- interval arithmetic (reference: TypeVisitor interval addition,
    ExpressionCompiler.java:1872-...)."""
    l = read_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") + F.expr("INTERVAL 30 DAY") < ts("1998-01-01"))
        .groupBy("l_linenumber")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.col("l_shipdate") + F.expr("INTERVAL 90 DAY")).alias("min_ship_plus90"),
            F.max(F.col("l_shipdate") - F.expr("INTERVAL 1 MONTH")).alias("max_ship_minus1m"),
        )
    )


@register(
    "scalar_null_ordering",
    """
    SELECT c_custkey, c_name,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_or_null
    FROM customer
    ORDER BY bal_or_null ASC NULLS LAST, c_custkey
    LIMIT 50
    """,
    tags=("scalar", "null", "sort"),
)
def scalar_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULLS LAST on ASC — the reference's sort convention
    (src/operators/OrderBy.java:136-143); Spark's ASC default is nulls-first,
    so the ordering must be explicit."""
    c = read_table(spark, sf_dir, "customer")
    bal = F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double")).otherwise(F.col("c_acctbal"))
    return (
        c.select("c_custkey", "c_name", bal.alias("bal_or_null"))
        .orderBy(F.asc_nulls_last("bal_or_null"), F.asc("c_custkey"))
        .limit(50)
    )

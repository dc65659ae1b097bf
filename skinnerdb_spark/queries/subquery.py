"""Subquery semantics — the reference's unnesting surface, done the Spark way.

The reference rewrites `x IN (SELECT ...)` into a plain inner equi-join
(src/unnesting/UnnestingVisitor.java:440-456), which multiplies duplicates;
standard SQL IN is a semi-join. We implement *standard* semantics (LEFT SEMI),
and the oracle uses real IN so the duplicate-bearing case is verified
(SURVEY §3.1 caveat). Catalyst's RewritePredicateSubquery replaces the
reference's 577-line UnnestingVisitor wholesale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skinnerdb_spark.functions.exact import DS, dsum
from skinnerdb_spark.queries.util import read_table, ts
from skinnerdb_spark.registry import register


@register(
    "subq_in_semijoin",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
    GROUP BY o_orderpriority
    """,
    tags=("subquery", "semijoin"),
)
def subq_in_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN over a duplicate-bearing subquery (many lineitems per order) — the
    semi-join must NOT multiply orders."""
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        o.join(l.select("l_orderkey"), o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "subq_not_in_antijoin",
    """
    SELECT c_mktsegment, COUNT(*) AS cust_count
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00')
    GROUP BY c_mktsegment
    """,
    tags=("subquery", "antijoin", "surplus"),
)
def subq_not_in_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN -> anti join (beyond the reference's surface — it rejects NOT IN
    subqueries; surplus capability via Spark LEFT ANTI). No NULL keys in the
    data, so NOT IN == anti-join here."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= ts("1997-01-01"))
    return (
        c.join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cust_count"))
    )


@register(
    "subq_not_in_null_trap",
    """
    SELECT COUNT(*) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT NULLIF(o_custkey, 3) FROM orders WHERE o_custkey < 10)
    """,
    tags=("subquery", "null", "surplus"),
)
def subq_not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN NULL trap: the subquery contains a NULL, so three-valued
    logic makes `x NOT IN (...)` never TRUE -> zero rows. A plain left-anti
    join would WRONGLY return rows here; only a null-aware anti join (which
    Catalyst plans for NOT IN) is correct — so this path goes through the
    engine's SQL surface deliberately."""
    for t in ("customer", "orders"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT COUNT(*) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT NULLIF(o_custkey, 3) FROM orders WHERE o_custkey < 10)
        """
    )


@register(
    "subq_scalar_compare",
    f"""
    SELECT c_nationkey, COUNT(*) AS rich_customers
    FROM customer
    WHERE c_acctbal > (SELECT {DS('c_acctbal')} / COUNT(*) FROM customer)
    GROUP BY c_nationkey
    """,
    tags=("subquery", "scalar"),
)
def subq_scalar_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery as filter threshold (global mean)."""
    c = read_table(spark, sf_dir, "customer")
    mean = c.agg((dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("mean_bal"))
    return (
        c.join(F.broadcast(mean))
        .filter(F.col("c_acctbal") > F.col("mean_bal"))
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("rich_customers"))
    )


@register(
    "subq_from_derived",
    f"""
    SELECT o_year, COUNT(*) AS n_orders, {DS('order_rev')} AS year_rev
    FROM (
        SELECT o.o_orderkey,
               CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
               {DS('l_extendedprice * (1 - l_discount)')} AS order_rev
        FROM orders o, lineitem l
        WHERE l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o_year) per_order
    GROUP BY o_year
    """,
    tags=("subquery", "derived"),
)
def subq_from_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FROM-clause subquery (two-level aggregation) — the reference unnests
    these into its flat-query sequence (UnnestingVisitor.java:141-174).

    Aggregation is pushed BELOW the join (Catalyst does not do this
    rewrite): lineitem pre-aggregates per l_orderkey first, so the shuffle
    carries one skinny row per order instead of the fat join output, and
    the (2-column) orders side joins onto the aggregated table. Equivalent
    because the join is a key-preserving inner join on the group key and
    o_year is functionally dependent on it — at 100 TB this is the
    difference between shuffling lineitem-width and order-count rows. The
    join strategy is deliberately left to AQE: the pruned orders projection
    auto-broadcasts at bench scale, while at 100 TB (where orders itself is
    too big to broadcast) both sides hash-partition on the key — a forced
    broadcast hint here would be a scale bug."""
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem")
    per_order = l.groupBy("l_orderkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("order_rev")
    )
    with_year = per_order.join(
        o.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
        per_order.l_orderkey == F.col("o_orderkey"),
    )
    return with_year.groupBy("o_year").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("order_rev")).alias("year_rev"),
    )


@register(
    "lateral_top1_order",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_custkey <= 500
                              ORDER BY o_totalprice DESC, o_orderkey
                              LIMIT 1) t
    WHERE c.c_custkey <= 500
    """,
    tags=("subquery", "lateral", "surplus"),
)
def lateral_top1_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY + LIMIT — top-1-per-key as
    the SQL standard writes it. Catalyst decorrelates the per-row subquery
    into a join + per-key limit rather than re-executing it per customer row
    (the reference's unnesting visitor has no lateral support at all —
    SURVEY §3.1); customers with no orders drop, per inner-lateral
    semantics. Runs through the engine's spark.sql surface.

    Scale note (r11): Catalyst DOES infer `o_custkey <= 500` from the
    decorrelated equality, but places the inferred filter ABOVE the
    WindowGroupLimit stack — so the top-1 window ran over ALL orders
    (48.8 s at sf10) before the 500-key cut. Stating the key bound inside
    the lateral body, where it is uncorrelated, lets it reach the parquet
    scan (`PushedFilters: LessThanOrEqual(o_custkey,500)`); semantics are
    identical because the correlation equality already implies it. The
    general lesson for selective-outer laterals at 100 TB: restate outer
    key bounds on the inner correlation column."""
    for t in ("customer", "orders"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c, LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                                  WHERE o.o_custkey = c.c_custkey
                                    AND o.o_custkey <= 500
                                  ORDER BY o_totalprice DESC, o_orderkey
                                  LIMIT 1) t
        WHERE c.c_custkey <= 500
        """
    )

"""Adaptive-join-ordered query — the reference's headline feature exercised
inside the correctness gate.

The bandit (plans/joinorder.py) learns a left-deep order from sampled
episodes, then the winning order executes as a plain join chain. Inner joins
commute, so the result must be — and is, oracle-verified — identical to
Catalyst's own choice; only the physical plan differs. bench=False: this entry
demonstrates the planner, the equivalent static plan is timed as tpch_q05.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skinnerdb_spark.functions.exact import DS, dsum
from skinnerdb_spark.plans.joinorder import JoinEdge, adaptive_join
from skinnerdb_spark.queries.util import read_table, ts
from skinnerdb_spark.registry import register


@register(
    "adaptive_star_join",
    f"""
    SELECT n_name, COUNT(*) AS n_rows, {DS('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem, orders, supplier, nation
    WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name
    """,
    bench=False,
    tags=("adaptive", "join"),
)
def adaptive_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    dfs = {
        "lineitem": read_table(spark, sf_dir, "lineitem"),
        "orders": read_table(spark, sf_dir, "orders").filter(
            F.col("o_orderdate") >= ts("1996-01-01")
        ),
        "supplier": read_table(spark, sf_dir, "supplier"),
        "nation": read_table(spark, sf_dir, "nation"),
    }
    edges = [
        JoinEdge("lineitem", "l_orderkey", "orders", "o_orderkey"),
        JoinEdge("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        JoinEdge("supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    res = adaptive_join(
        dfs, edges, fact="lineitem", episodes=4, sample_fraction=0.1, max_orders=8
    )
    return res.df.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
    )

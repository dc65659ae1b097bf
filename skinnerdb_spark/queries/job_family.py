"""Generated JOB-style query family.

The reference's primary benchmark is 113 instantiations of a handful of
star-join templates over IMDB (imdb/queries/*.sql: same join graph, varying
unary predicates per dimension). This module mirrors that structure: one
template — lineitem fact joined to part/supplier/nation/region + orders —
instantiated over a parameter grid (brand x region x quantity band x type),
each instance registered with its own generated oracle.

This is what makes the bench suite resemble the reference's workload shape:
many queries, same plan family, different selectivities — exactly where
adaptive join ordering (plans/joinorder.py) and AQE earn their keep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skinnerdb_spark.functions.exact import DS, dsum
from skinnerdb_spark.queries.util import adaptive, read_table
from skinnerdb_spark.registry import register

B = F.broadcast

#: (suffix, brand, region, qty_lo, qty_hi, p_type)
_VARIANTS = [
    ("01", "Brand#2", "ASIA", 1, 20, None),
    ("02", "Brand#4", "EUROPE", 10, 35, None),
    ("03", "Brand#19", "AMERICA", 25, 50, None),
    ("04", None, "AFRICA", 5, 45, "PROMO"),
    ("05", None, "MIDDLE EAST", 1, 30, "ECONOMY"),
    ("06", "Brand#17", None, 15, 40, "STANDARD"),
    ("07", "Brand#8", None, 1, 15, None),
    ("08", None, "ASIA", 30, 50, "SMALL"),
    ("09", "Brand#23", "EUROPE", 5, 25, "LARGE"),
]


def _make(suffix: str, brand: str | None, region: str | None, qlo: int, qhi: int, ptype: str | None):
    conds_sql = [f"l_quantity BETWEEN {qlo} AND {qhi}"]
    if brand:
        conds_sql.append(f"p_brand = '{brand}'")
    if region:
        conds_sql.append(f"r_name = '{region}'")
    if ptype:
        conds_sql.append(f"p_type = '{ptype}'")
    oracle = f"""
    SELECT MIN(p_name) AS min_pname, MIN(s_name) AS min_sname,
           COUNT(*) AS n_rows, {DS('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM lineitem, part, supplier, nation, region, orders
    WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND l_orderkey = o_orderkey
      AND {' AND '.join(conds_sql)}
    """

    def impl(spark: SparkSession, sf_dir: str) -> DataFrame:
        l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(qlo, qhi))
        p = read_table(spark, sf_dir, "part")
        if brand:
            p = p.filter(F.col("p_brand") == brand)
        if ptype:
            p = p.filter(F.col("p_type") == ptype)
        s = read_table(spark, sf_dir, "supplier")
        n = read_table(spark, sf_dir, "nation")
        r = read_table(spark, sf_dir, "region")
        if region:
            r = r.filter(F.col("r_name") == region)
        o = read_table(spark, sf_dir, "orders")
        return adaptive(
            l.join(B(p), l.l_partkey == p.p_partkey)
            .join(B(s), l.l_suppkey == s.s_suppkey)
            .join(B(n), s.s_nationkey == n.n_nationkey)
            .join(B(r), n.n_regionkey == r.r_regionkey)
            .join(o, l.l_orderkey == o.o_orderkey)
            .agg(
                F.min("p_name").alias("min_pname"),
                F.min("s_name").alias("min_sname"),
                F.count(F.lit(1)).alias("n_rows"),
                dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            )
        )

    impl.__name__ = f"job_v{suffix}"
    impl.__doc__ = (
        f"JOB-family instance {suffix}: brand={brand} region={region} "
        f"qty=[{qlo},{qhi}] type={ptype}"
    )
    register(f"job_v{suffix}", oracle, tags=("job", "family", "join"))(impl)


for _v in _VARIANTS:
    _make(*_v)

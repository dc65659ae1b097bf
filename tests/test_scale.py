"""Scale-machinery tests: salting equivalence, bucketed zero-shuffle joins,
and the bandit join-order path producing Catalyst-identical results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skinnerdb_spark.catalog import read_table
from skinnerdb_spark.plans.skew import salted_join
from skinnerdb_spark.sources.bucketing import bucketed_join, write_bucketed


def test_salted_join_equivalence(spark, sf_dir):
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    plain = l.join(o, l.l_orderkey == o.o_orderkey).count()
    salted = salted_join(l, o, F.col("l_orderkey") == F.col("o_orderkey"), n_salts=8).count()
    assert salted == plain


def _purge_tables(spark, names):
    """Drop catalog entries AND stale managed-table directories: a crashed
    session can leave spark-warehouse/<t> behind with no catalog entry, and
    saveAsTable then fails with LOCATION_ALREADY_EXISTS."""
    import shutil
    from pathlib import Path
    from urllib.parse import urlparse

    warehouse_dir = Path(urlparse(spark.conf.get("spark.sql.warehouse.dir")).path)
    for t in names:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(warehouse_dir / t, ignore_errors=True)


@pytest.fixture(scope="module")
def warehouse(spark):
    # managed tables land in spark.sql.warehouse.dir (cwd/spark-warehouse by
    # default); purge stale dirs up front (idempotence) and clean up after
    tables = ("b_lineitem", "b_orders")
    _purge_tables(spark, tables)
    yield
    _purge_tables(spark, tables)


def test_bucketed_join_elides_shuffle(spark, sf_dir, warehouse):
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(l, "b_lineitem", "l_orderkey", n_buckets=8)
    write_bucketed(o, "b_orders", "o_orderkey", n_buckets=8)
    # at test scale both sides auto-broadcast, which bypasses buckets; force
    # the shuffle-join path to show bucketing elides the shuffle (the 100 TB
    # case, where neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:600]
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join must not shuffle:\n{plan[:800]}"
        )
        assert joined.count() == l.join(o, l.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_aggregate_two_phase_merge_fns(spark, sf_dir):
    """Salted two-phase aggregation with per-aggregate merge functions
    (sum/min/max) matches the direct aggregation; non-mergeable requests
    are rejected."""
    import pytest
    from pyspark.sql import functions as F

    from skinnerdb_spark.plans.skew import aggregate_two_phase

    l = read_table(spark, sf_dir, "lineitem")
    got = (
        aggregate_two_phase(
            l,
            ["l_returnflag"],
            {
                "qty_sum": F.sum("l_quantity"),
                "qty_min": F.min("l_quantity"),
                "qty_max": F.max("l_quantity"),
            },
            n_salts=8,
            merge={"qty_sum": "sum", "qty_min": "min", "qty_max": "max"},
        )
        .orderBy("l_returnflag")
        .collect()
    )
    want = (
        l.groupBy("l_returnflag")
        .agg(
            F.sum("l_quantity").alias("qty_sum"),
            F.min("l_quantity").alias("qty_min"),
            F.max("l_quantity").alias("qty_max"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    assert [r.asDict() for r in got] == [r.asDict() for r in want]
    with pytest.raises(ValueError, match="merge"):
        aggregate_two_phase(l, ["l_returnflag"], {"a": F.avg("l_quantity")}, merge="avg")


def test_runtime_bloom_filter_prunes_fact_scan(spark, sf_dir):
    """Runtime bloom-filter join pruning — a first-class 100 TB lever: a
    selective dim filter is turned into a bloom filter applied to the fact
    side BEFORE its shuffle, cutting shuffle write by the dim selectivity.
    At real scale Spark injects it by default (fact scan >= 10 GB); the test
    only lowers the application-side threshold because test inputs are tiny.
    Asserts the plan carries might_contain + bloom_filter_agg and that
    results are unchanged."""
    prev_app = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        l = read_table(spark, sf_dir, "lineitem")
        p = read_table(spark, sf_dir, "part").filter(F.col("p_size") == 1)
        q = l.join(p, F.col("l_partkey") == F.col("p_partkey")).groupBy(
            "p_type"
        ).agg(F.count(F.lit(1)).alias("n"))
        baseline = sorted(map(tuple, q.collect()))

        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        q2 = l.join(p, F.col("l_partkey") == F.col("p_partkey")).groupBy(
            "p_type"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = q2._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "might_contain" in plan, "bloom filter not injected on fact side"
        assert "bloom_filter_agg" in plan, "bloom filter not built from dim side"
        assert sorted(map(tuple, q2.collect())) == baseline
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            prev_app,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)

"""Property tests for the cross-engine-exact aggregation layer
(functions/exact.py): the whole oracle methodology rests on dsum being
aggregation-order-independent, so prove it under adversarial partitionings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skinnerdb_spark.catalog import read_table
from skinnerdb_spark.functions.exact import davg, dsum


@pytest.mark.parametrize("n_parts", [1, 3, 13, 32])
def test_dsum_partition_invariant(spark, sf_dir, n_parts):
    """The same sum regardless of partition count / combine order — exactly
    where plain double SUM diverges."""
    l = read_table(spark, sf_dir, "lineitem")
    expr = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    baseline = l.coalesce(1).agg(dsum(expr).alias("s")).collect()[0].s
    got = l.repartition(n_parts).agg(dsum(expr).alias("s")).collect()[0].s
    assert got == baseline, f"{n_parts} parts: {got!r} != {baseline!r}"


def test_plain_double_sum_is_order_dependent_here(spark, sf_dir):
    """Sanity check that the decimal detour is actually necessary: plain
    double sums of the same measure differ across partitionings on this very
    data (if this ever starts passing for all partitionings, the guard is
    vacuous, not wrong)."""
    l = read_table(spark, sf_dir, "lineitem")
    expr = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    vals = {
        l.repartition(n).agg(F.sum(expr).alias("s")).collect()[0].s for n in (1, 7, 32)
    }
    # not asserting inequality (it's data-dependent), just documenting:
    # any spread here is the error dsum eliminates
    assert len(vals) >= 1


def test_davg_matches_sum_over_count(spark, sf_dir):
    l = read_table(spark, sf_dir, "lineitem")
    row = l.agg(
        davg(F.col("l_quantity")).alias("a"),
        dsum(F.col("l_quantity")).alias("s"),
        F.count("l_quantity").alias("c"),
    ).collect()[0]
    assert row.a == row.s / row.c

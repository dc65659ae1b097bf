"""Distributed exact k-th selection (operators/quantiles.py) — VERDICT r7
item 2: exact percentiles with no per-group full sort and no value
buffering, verified value-for-value against a Python sorted oracle and
plan-pinned on the two registry entries that use it."""

from __future__ import annotations

import random
import re
from collections import defaultdict
from decimal import Decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from skinnerdb_spark.operators.quantiles import exact_value_at_ranks

_SCHEMA = T.StructType(
    [T.StructField("g", T.StringType()), T.StructField("v", T.DecimalType(12, 2))]
)


def _median_ranks(n):
    return F.array(F.floor((n + 1) / 2).cast("long"), F.floor((n + 2) / 2).cast("long"))


def test_exact_value_at_ranks_matches_sorted_oracle(spark):
    """Grouped medians + global deciles on data with heavy ties and a
    skew spike (3000 copies of one value) — a single-distinct-value cell
    must resolve without recursing."""
    random.seed(7)
    rows = [
        (random.choice("AB"), Decimal(f"{random.randint(1, 500) / 10:.2f}"))
        for _ in range(5000)
    ]
    rows += [("A", Decimal("13.37"))] * 3000
    df = spark.createDataFrame(rows, _SCHEMA)

    # small bins/leaf force multi-level descent on 8k rows
    ans = exact_value_at_ranks(df, ["g"], "v", _median_ranks, bins=16, leaf_limit=50)
    got = {(r["g"], r["qi"]): r["value"] for r in ans.collect()}
    byg = defaultdict(list)
    for g, v in rows:
        byg[g].append(v)
    for g, vs in byg.items():
        vs.sort()
        n = len(vs)
        for qi, r in enumerate([(n + 1) // 2, (n + 2) // 2]):
            assert got[(g, qi)] == vs[r - 1], (g, qi)

    deciles = exact_value_at_ranks(
        df,
        [],
        "v",
        lambda n: F.array(*[F.floor((i * n + 9) / 10).cast("long") for i in range(1, 10)]),
        bins=16,
        leaf_limit=50,
    )
    got2 = {r["qi"]: r["value"] for r in deciles.collect()}
    allv = sorted(v for _, v in rows)
    n = len(allv)
    for i in range(1, 10):
        assert got2[i - 1] == allv[(i * n + 9) // 10 - 1], i


def test_exact_value_at_ranks_edges(spark):
    """Empty input, all-NULL values, single row, out-of-range ranks."""
    empty = spark.createDataFrame([], _SCHEMA)
    assert exact_value_at_ranks(empty, ["g"], "v", _median_ranks).count() == 0

    nulls = spark.createDataFrame([("A", None), ("A", None)], _SCHEMA)
    assert exact_value_at_ranks(nulls, ["g"], "v", _median_ranks).count() == 0

    one = spark.createDataFrame([("A", Decimal("5.00"))], _SCHEMA)
    got = exact_value_at_ranks(
        one, ["g"], "v", lambda n: F.array(F.lit(1).cast("long"), F.lit(99).cast("long"))
    ).collect()
    # rank 99 > n is dropped; rank 1 resolves
    assert [(r["qi"], r["value"]) for r in got] == [(0, Decimal("5.00"))]


def test_percentile_entries_plan_has_no_full_sort(spark, sf_dir):
    """The r8/r11 restructure's contract: neither entry may plan the old
    full-input shapes — a row_number window over raw lineitem rows
    (median_manual) or the value-buffering `percentile` aggregate
    (orders_equidepth_hist). median_manual is back on the selection kernel
    (the r11 quantized-domain variant measured SLOWER at sf10 and was
    reverted — see its docstring); if a grouped window ever reappears it
    is allowed ONLY above the (flag, quantity) COUNT aggregate: the tree
    printout lists parents first, so the aggregate must print after the
    window spec."""
    from skinnerdb_spark.operators.analytics import orders_equidepth_hist
    from skinnerdb_spark.queries.extensions import median_manual

    mplan = median_manual(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    assert "row_number" not in mplan
    if "windowspecdefinition(l_returnflag" in mplan:
        m = re.search(r"Aggregate \[l_returnflag#\d+, l_quantity#\d+\]", mplan)
        assert m, "window must sit above the (flag, quantity) count aggregate"
        assert mplan.find("windowspecdefinition(l_returnflag") < m.start()

    hplan = (
        orders_equidepth_hist(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "percentile(" not in hplan

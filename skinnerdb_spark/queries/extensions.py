"""Surplus SQL capability beyond the reference's surface.

The reference explicitly rejects set operations and CTEs
(src/unnesting/UnnestingVisitor.java:518-527), has no window functions
(TypeVisitor.java:780-790 empty stubs), no DISTINCT aggregates and no
ROLLUP/CUBE (PostProcessor.java:158-161). All are native in Spark — each gets
an oracle-checked query so the capability is *verified*, not just claimed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from skinnerdb_spark.functions.exact import DS, dsum
from skinnerdb_spark.queries.util import read_table, ts
from skinnerdb_spark.registry import register


@register(
    "setop_union",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
    tags=("setop", "surplus"),
)
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "setop_intersect_except",
    """
    SELECT nationkey, 'both' AS side FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey FROM supplier)
    UNION ALL
    SELECT nationkey, 'cust_only' AS side FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey FROM supplier)
    """,
    tags=("setop", "surplus"),
)
def setop_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = c.intersect(s).withColumn("side", F.lit("both"))
    cust_only = c.subtract(s).withColumn("side", F.lit("cust_only"))
    return both.unionAll(cust_only)


@register(
    "setop_bag_semantics",
    """
    SELECT 'intersect_all' AS op, nationkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT c_nationkey AS nationkey FROM customer
          INTERSECT ALL
          SELECT s_nationkey FROM supplier)
    GROUP BY nationkey
    UNION ALL
    SELECT 'except_all' AS op, nationkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT c_nationkey AS nationkey FROM customer
          EXCEPT ALL
          SELECT s_nationkey FROM supplier)
    GROUP BY nationkey
    """,
    tags=("setop", "surplus"),
)
def setop_bag_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BAG (ALL) set-operation semantics — the multiplicity rules the
    DISTINCT variants hide: INTERSECT ALL keeps min(m_left, m_right) copies
    per value, EXCEPT ALL keeps max(0, m_left - m_right). Verified by
    counting the surviving copies per nationkey against the oracle's
    standard-SQL evaluation — any engine that implements the ALL variants
    via dedup + join would hash-mismatch immediately.

    Scale shape: Spark plans both as aggregate-then-replicate on the value
    key (one shuffle each, map-side partial counts) — no row-level
    pairing; the copy counts travel, not the copies."""
    c = read_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = read_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    ia = (
        c.intersectAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "nationkey", "n")
    )
    ea = (
        c.exceptAll(s)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.lit("except_all").alias("op"), "nationkey", "n")
    )
    return ia.unionAll(ea)


@register(
    "window_rank_topn",
    """
    SELECT c_mktsegment, c_custkey, c_acctbal, rnk
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                    ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rnk
        FROM customer)
    WHERE rnk <= 3
    """,
    tags=("window", "surplus"),
)
def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via ROW_NUMBER — no reference counterpart (§2.5)."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("bigint").alias("rnk"),
        ).filter(F.col("rnk") <= 3)
    )


@register(
    "window_running_sum",
    f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend
    FROM orders
    WHERE o_custkey % 10 = 0
    """,
    tags=("window", "surplus"),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").alias(
            "running_spend"
        ),
    )


@register(
    "rollup_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows, {DS('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    tags=("rollup", "surplus"),
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum(F.col("l_quantity")).alias("sum_qty")
    )


# second moments (sum of squares / products) reach magnitudes where the
# generic scale-6 decimal's scaled integer exceeds 2^53 and the
# decimal->double cast stops being bit-identical across engines (DuckDB
# double-rounds). These inputs carry <= 2 true decimals (quantity is
# integral, prices have cents), so scale 2 is still an exact cast IN and
# stays exactly convertible OUT up to ~9e13.
_DS2 = "CAST(SUM(CAST({expr} AS DECIMAL(28,2))) AS DOUBLE)"


def _ds2(expr: str) -> str:
    return _DS2.format(expr=expr)


def _dsum2(c):
    return F.sum(c.cast("decimal(28,2)")).cast("double")


@register(
    "stats_agg",
    f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           ({_ds2('l_quantity * l_quantity')} - {_ds2('l_quantity')} * {_ds2('l_quantity')} / COUNT(*))
             / (COUNT(*) - 1) AS var_qty,
           SQRT(({_ds2('l_quantity * l_quantity')} - {_ds2('l_quantity')} * {_ds2('l_quantity')} / COUNT(*))
             / (COUNT(*) - 1)) AS stddev_qty,
           ({_ds2('l_quantity * l_extendedprice')} - {_ds2('l_quantity')} * {_ds2('l_extendedprice')} / COUNT(*))
             / (COUNT(*) - 1) AS cov_qty_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats", "surplus"),
)
def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample variance / stddev / covariance from decimal-exact component
    sums (sum, sum of squares, sum of products). Native stddev/covar use
    Welford-style streaming updates whose float results differ across
    engines and partitionings; the component-sum formulation is exactly
    reproducible everywhere — the same trick the reference's AVG->SUM/COUNT
    rewrite uses (SimplificationVisitor.java:163-184), extended to second
    moments."""
    l = read_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    n = F.count(F.lit(1))
    sq = _dsum2(q)
    sqq = _dsum2(q * q)
    sp = _dsum2(p)
    sqp = _dsum2(q * p)
    var = (sqq - sq * sq / n) / (n - 1)
    cov = (sqp - sq * sp / n) / (n - 1)
    return l.groupBy("l_returnflag").agg(
        n.alias("n"),
        var.alias("var_qty"),
        F.sqrt(var).alias("stddev_qty"),
        cov.alias("cov_qty_price"),
    )


@register(
    "median_manual",
    """
    WITH ranked AS (
        SELECT l_returnflag, l_quantity,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
               COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem)
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(26,8))) AS DOUBLE) / COUNT(*) AS median_qty
    FROM ranked
    WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
    GROUP BY l_returnflag
    """,
    tags=("agg", "stats", "surplus"),
)
def median_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median by rank selection (middle one or two elements averaged
    with exact arithmetic). Native percentile_cont interpolation arithmetic
    is not guaranteed bit-identical across engines; rank selection is.

    Scale shape (r8, VERDICT r7 item 2; re-adjudicated r11): the middle
    elements come from distributed value-domain k-th selection
    (operators/quantiles.py) — map-side-combined histogram scans plus a
    cumulative count over the distinct values of one leaf cell — never a
    per-group sort of the input. r11 tried the quantized-domain one-scan
    shape here (ev_mad_outliers design (3): a (flag, quantity) count
    aggregate + windows over the distinct frame) on the strength of
    l_quantity's 50-value domain at sf<=0.1 — and MEASURED it 47.1 s vs
    the kernel's 35.1 s at sf10, because the scale generator draws
    l_quantity continuously (28.5M distinct at sf10) and the windows then
    sort a near-unique 29M-row frame on |l_returnflag| = 3 partitions.
    The kernel is domain-agnostic: small domains resolve at level 1 and
    (since r11) skip the leaf scan outright; continuous domains descend
    with O(bins) state. The quantized shape stays where the domain is
    quantized BY CONSTRUCTION at every scale (ev_winsorize's cents)."""
    from skinnerdb_spark.operators.quantiles import exact_value_at_ranks

    l = read_table(spark, sf_dir, "lineitem")
    mid = exact_value_at_ranks(
        l,
        ["l_returnflag"],
        "l_quantity",
        lambda n: F.array(
            F.floor((n + 1) / 2).cast("long"), F.floor((n + 2) / 2).cast("long")
        ),
    )
    # odd n requests the same rank twice -> avg of two identical values ==
    # the oracle's single-row SUM/COUNT (both exact decimal paths)
    return mid.groupBy("l_returnflag").agg(
        (dsum(F.col("value")) / F.count(F.lit(1))).alias("median_qty")
    )


@register(
    "distinct_agg",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_distinct_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "surplus"),
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column exact DISTINCT aggregation as STACKED TWO-LEVEL
    aggregates instead of one multi-distinct agg (VERDICT r6 item 5): Spark
    plans n distinct children as an Expand that replicates every input row
    n times through a single shuffle — measured 20x at the sf1 10x point.
    Here each distinct column runs its own dedup pipeline — partial
    map-side dedup on (group, col), shuffle bounded by the DISTINCT
    cardinality (not the row count), then a 3-row-per-group count/sum —
    and the three tiny per-group results broadcast-join back on the group
    key. Linear in input at any scale; results identical (exact paths,
    NULLs skipped by count/sum as in the single-agg form)."""
    l = read_table(spark, sf_dir, "lineitem")

    def per_group(col: str, agg: Column, alias: str) -> DataFrame:
        return (
            l.select("l_returnflag", col)
            .distinct()
            .groupBy("l_returnflag")
            .agg(agg.alias(alias))
        )

    parts = per_group("l_partkey", F.count("l_partkey"), "distinct_parts")
    supps = per_group("l_suppkey", F.count("l_suppkey"), "distinct_supps")
    qty = (
        l.select("l_returnflag", F.col("l_quantity").cast("decimal(18,4)").alias("q"))
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.sum("q").cast("double").alias("sum_distinct_qty"))
    )
    return parts.join(supps, "l_returnflag").join(qty, "l_returnflag").select(
        "l_returnflag", "distinct_parts", "distinct_supps", "sum_distinct_qty"
    )


@register(
    "edge_empty_and_null_aggs",
    f"""
    SELECT 'empty' AS probe,
           COUNT(*) AS cnt,
           {DS('l_quantity')} AS sum_qty,
           MIN(l_returnflag) AS mn
    FROM lineitem WHERE l_quantity > 1e9
    UNION ALL
    SELECT 'nulls' AS probe,
           COUNT(NULLIF(l_quantity, l_quantity)) AS cnt,
           {DS('NULLIF(l_quantity, l_quantity)')} AS sum_qty,
           MIN(NULLIF(l_returnflag, l_returnflag)) AS mn
    FROM lineitem
    """,
    tags=("edge", "null", "surplus"),
)
def edge_empty_and_null_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pins aggregate semantics at the boundaries both engines must agree on:
    aggregates over ZERO rows (COUNT->0, SUM/MIN->NULL) and over all-NULL
    inputs (COUNT(x)->0, SUM/MIN->NULL) — the reference's empty-group rule
    (SumAggregate.java empty group -> NULL; COUNT rewrite zero case,
    SimplificationVisitor.java:129-162)."""
    l = read_table(spark, sf_dir, "lineitem")
    empty = l.filter(F.col("l_quantity") > 1e9).agg(
        F.lit("empty").alias("probe"),
        F.count(F.lit(1)).alias("cnt"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
        F.min("l_returnflag").alias("mn"),
    ).select("probe", "cnt", "sum_qty", "mn")
    null_qty = F.nullif(F.col("l_quantity"), F.col("l_quantity"))
    null_flag = F.nullif(F.col("l_returnflag"), F.col("l_returnflag"))
    nulls = l.agg(
        F.lit("nulls").alias("probe"),
        F.count(null_qty).alias("cnt"),
        dsum(null_qty).alias("sum_qty"),
        F.min(null_flag).alias("mn"),
    ).select("probe", "cnt", "sum_qty", "mn")
    return empty.unionAll(nulls)


@register(
    "cube_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows, {DS('l_extendedprice')} AS sum_price
    FROM lineitem
    WHERE l_quantity < 10
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    tags=("rollup", "surplus"),
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 10)
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"), dsum(F.col("l_extendedprice")).alias("sum_price")
    )


@register(
    "window_rank_lag",
    """
    SELECT o_custkey, o_orderkey,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           LAG(o_totalprice, 1) OVER w AS prev_price,
           LEAD(o_totalprice, 1) OVER w AS next_price
    FROM orders
    WHERE o_custkey % 20 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    tags=("window", "surplus"),
)
def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
    )


@register(
    "approx_distinct_sketch",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_suppkey) AS exact_supps,
           (ABS(approx_count_distinct(l_partkey) - COUNT(DISTINCT l_partkey))
              <= 0.06 * COUNT(DISTINCT l_partkey)) AS parts_within_bound,
           (ABS(approx_count_distinct(l_suppkey) - COUNT(DISTINCT l_suppkey))
              <= 0.06 * COUNT(DISTINCT l_suppkey)) AS supps_within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("sketch", "surplus"),
)
def approx_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per group — the sketch path for
    cardinality at 100 TB, where exact COUNT(DISTINCT) would shuffle every
    key.

    Raw HLL estimates are engine-specific by construction, so the verifiable
    contract is emitted instead: each engine computes its own sketch AND the
    exact count, and asserts |approx - exact| <= 3*rsd*exact (rsd = 0.02).
    The booleans and exact counts hash-match cross-engine; the estimates
    themselves stay engine-internal."""
    l = read_table(spark, sf_dir, "lineitem")
    # two COUNT(DISTINCT x) in one aggregate would plan an Expand (3x the
    # input through the shuffle); instead each exact count is its own
    # two-level aggregation (distinct pairs -> count, partial-aggregated
    # map-side) joined back on the 3-row group key — the 100 TB shape
    approx = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_ap"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("_as"),
    )

    def exact(col: str, out: str) -> DataFrame:
        return (
            l.select("l_returnflag", col)
            .distinct()
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias(out))
        )

    bound = lambda approx_c, exact_c: (  # noqa: E731
        F.abs(F.col(approx_c) - F.col(exact_c)) <= 0.06 * F.col(exact_c)
    )
    return (
        approx.join(exact("l_partkey", "exact_parts"), "l_returnflag")
        .join(exact("l_suppkey", "exact_supps"), "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            "exact_supps",
            bound("_ap", "exact_parts").alias("parts_within_bound"),
            bound("_as", "exact_supps").alias("supps_within_bound"),
        )
    )


@register(
    "cte_query",
    f"""
    WITH seg_stats AS (
        SELECT c_mktsegment, {DS('c_acctbal')} AS seg_bal, COUNT(*) AS seg_cnt
        FROM customer GROUP BY c_mktsegment)
    SELECT c_mktsegment, seg_bal, seg_cnt, seg_bal / seg_cnt AS avg_bal
    FROM seg_stats
    WHERE seg_cnt > 5
    """,
    tags=("cte", "surplus"),
)
def cte_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE — rejected by the reference (UnnestingVisitor.java:524-527); here via
    the engine's spark.sql surface (engine.execute)."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        f"""
        WITH seg_stats AS (
            SELECT c_mktsegment, {DS('c_acctbal')} AS seg_bal, COUNT(*) AS seg_cnt
            FROM customer GROUP BY c_mktsegment)
        SELECT c_mktsegment, seg_bal, seg_cnt, seg_bal / seg_cnt AS avg_bal
        FROM seg_stats
        WHERE seg_cnt > 5
        """
    )


@register(
    "window_frames",
    """
    WITH o AS (
        SELECT o_custkey, o_orderkey,
               CAST(o_totalprice AS DECIMAL(18,2)) AS price,
               CAST(datediff('day', TIMESTAMP '1992-01-01', o_orderdate) AS BIGINT)
                   AS day_nr
        FROM orders WHERE o_custkey <= 200)
    SELECT o_custkey, o_orderkey, day_nr,
           CAST(SUM(price) OVER (PARTITION BY o_custkey ORDER BY day_nr
                RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS spend_30d,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                ORDER BY day_nr, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS first_ok,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey
                ORDER BY day_nr, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_ok
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY price, o_orderkey)
    """,
    tags=("window", "surplus"),
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-frame surface beyond the ranking basics: a RANGE frame over a
    numeric day offset (30-day trailing spend), the distribution functions
    PERCENT_RANK / CUME_DIST / NTILE, and FIRST/LAST_VALUE over an explicit
    full frame (the default frame stops at CURRENT ROW — the classic
    LAST_VALUE trap).

    Exactness: the frame SUM runs over DECIMAL(18,2) (bounded 30-day frames,
    scaled magnitude far under 2^53) and casts to DOUBLE only at the end;
    PERCENT_RANK/CUME_DIST are exact small-integer ratios — bit-identical
    across engines. All window specs share the one partition key, so the
    whole entry is a single hash shuffle on o_custkey."""
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 200)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
            # NTZ literal: a plain cast("timestamp") would build an LTZ
            # literal and shift day boundaries under a non-UTC session
            F.datediff("o_orderdate", ts("1992-01-01")).cast("long").alias("day_nr"),
        )
    )
    w_range = (
        Window.partitionBy("o_custkey").orderBy("day_nr").rangeBetween(-30, 0)
    )
    w_dist = Window.partitionBy("o_custkey").orderBy("price", "o_orderkey")
    w_full = (
        Window.partitionBy("o_custkey")
        .orderBy("day_nr", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "day_nr",
        F.sum("price").over(w_range).cast("double").alias("spend_30d"),
        F.percent_rank().over(w_dist).alias("pr"),
        F.cume_dist().over(w_dist).alias("cd"),
        F.ntile(4).over(w_dist).cast("long").alias("quartile"),
        F.first("o_orderkey").over(w_full).alias("first_ok"),
        F.last("o_orderkey").over(w_full).alias("last_ok"),
    )


# --------------------------------------------------------------------------
# KMV (bottom-k) distinct sketch (r9 cont.): the DETERMINISTIC, mergeable
# companion to approx_distinct_sketch. HLL estimates are engine-internal
# (that entry verifies an error-bound contract, not the estimate); KMV over
# a keyed md5 is pure relational algebra, so the ESTIMATE ITSELF is
# cross-engine bit-exact — the property an incremental 100 TB pipeline
# needs when yesterday's sketch must merge with today's on any engine
# (union of bottom-k sets = bottom-k of the union; k-1 over the k-th
# minimum uniform is the textbook KMV estimator).
# --------------------------------------------------------------------------
KMV_K = 256  # bottom-k size: rsd ~ 1/sqrt(k-2) ~ 6.3%
_KMV_DOMAIN = 1 << 60  # 15 md5 hex chars


@register(
    "approx_distinct_kmv",
    f"""
    WITH dk AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
    h AS (SELECT l_returnflag,
                 CAST(('0x' || SUBSTR(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
                      ::UBIGINT AS BIGINT) AS h
          FROM dk),
    r AS (SELECT l_returnflag, h,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
          FROM h),
    bot AS (SELECT l_returnflag, CAST(MAX(h) AS BIGINT) AS kth_min,
                   CAST(COUNT(*) AS BIGINT) AS in_sketch
            FROM r WHERE rn <= {KMV_K} GROUP BY l_returnflag),
    ex AS (SELECT l_returnflag,
                  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts
           FROM lineitem GROUP BY l_returnflag)
    SELECT b.l_returnflag, e.exact_parts, b.kth_min,
           CASE WHEN b.in_sketch < {KMV_K} THEN CAST(b.in_sketch AS DOUBLE)
                ELSE CAST({KMV_K - 1} AS DOUBLE) * {_KMV_DOMAIN} / b.kth_min
           END AS est_kmv,
           ABS((CASE WHEN b.in_sketch < {KMV_K} THEN CAST(b.in_sketch AS DOUBLE)
                     ELSE CAST({KMV_K - 1} AS DOUBLE) * {_KMV_DOMAIN} / b.kth_min
                END) - e.exact_parts) / e.exact_parts AS rel_err
    FROM bot b JOIN ex e USING (l_returnflag)
    ORDER BY l_returnflag
    """,
    tags=("sketch", "surplus", "pipeline"),
)
def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) distinct-count sketch of l_partkey per return flag —
    estimate = (k-1) * H / h_(k), H = 2^60 (15 md5 hex chars), falling back
    to the exact in-sketch count when a group has fewer than k distinct
    keys. Deterministic md5 keying means the k-th minimum — and therefore
    the ESTIMATE — hash-matches DuckDB exactly (est is two IEEE ops on
    exact integers, identical expression both engines).

    Scale shape: distinct (flag, key) first (map-side combinable), then
    bottom-k in two phases — a per-(group, input-partition) window prunes
    each task's stream to <= k rows BEFORE the exchange (the per-partition
    bottom-k of a bottom-k union is exact, the TakeOrderedAndProject idea
    applied per group), so the final group window sees <= k * n_partitions
    rows however large the key space grows. The exact count (the report's
    honesty column) derives from the SAME cached distinct-key frame (r11:
    it previously re-ran the corpus scan + distinct as its own subtree —
    2 scans in the before-plan, 1 after), joined on the 3-row group key.
    The cache is tracked by the dedup ``_memo`` LRU (r12, ADVICE r11): a
    raw ``.cache()`` here was never unpersisted, so a multi-SF session
    stranded one distinct-key frame per sf_dir in the JVM CacheManager;
    the memo's cap/eviction unpersists evicted frames."""
    from skinnerdb_spark.operators.dedup import _memo

    l = read_table(spark, sf_dir, "lineitem")
    dk = _memo(
        spark, sf_dir, "kmv_dk",
        lambda: l.select("l_returnflag", "l_partkey").distinct(),
    )
    h = dk.select(
        "l_returnflag",
        F.expr(
            "CAST(conv(substring(md5(CAST(CAST(l_partkey AS STRING) AS BINARY)),"
            " 1, 15), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    pre_w = Window.partitionBy(
        "l_returnflag", F.spark_partition_id()
    ).orderBy("h")
    pruned = (
        h.withColumn("prn", F.row_number().over(pre_w))
        .filter(F.col("prn") <= KMV_K)
        .drop("prn")
    )
    fin_w = Window.partitionBy("l_returnflag").orderBy("h")
    bot = (
        pruned.withColumn("rn", F.row_number().over(fin_w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("l_returnflag")
        .agg(
            F.max("h").cast("bigint").alias("kth_min"),
            F.count(F.lit(1)).cast("bigint").alias("in_sketch"),
        )
    )
    ex = dk.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_parts")
    )
    est = (
        f"CASE WHEN in_sketch < {KMV_K} THEN CAST(in_sketch AS DOUBLE)"
        f" ELSE CAST({KMV_K - 1} AS DOUBLE) * {_KMV_DOMAIN} / kth_min END"
    )
    return (
        bot.join(ex, "l_returnflag")
        .select(
            "l_returnflag",
            "exact_parts",
            "kth_min",
            F.expr(est).alias("est_kmv"),
            F.expr(f"ABS(({est}) - exact_parts) / exact_parts").alias("rel_err"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "window_ntile_dist",
    """
    SELECT c_custkey, c_mktsegment,
           CAST(NTILE(4) OVER w AS BIGINT) AS balance_quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           FIRST_VALUE(c_custkey) OVER w AS poorest_in_segment,
           CAST(NTH_VALUE(c_custkey, 2) OVER (PARTITION BY c_mktsegment
                ORDER BY c_acctbal, c_custkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS second_poorest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    ORDER BY c_mktsegment, c_acctbal, c_custkey
    """,
    tags=("window", "surplus"),
)
def window_ntile_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window surface: NTILE / PERCENT_RANK / CUME_DIST /
    FIRST_VALUE / NTH_VALUE per market segment — the remaining standard
    window functions the extension tier had not yet verified (rank/lag/
    frames/session entries cover the others).

    Exactness: the window orders by (c_acctbal, c_custkey) — a total order,
    so tie-dependent semantics never fire; PERCENT_RANK ((rank-1)/(n-1))
    and CUME_DIST (rank/n) are single IEEE divisions of exact integers and
    both engines implement the same SQL-standard NTILE remainder rule
    (larger buckets first). All windows are PARTITIONED (|segment| groups)
    — no unpartitioned exchange; NTH_VALUE needs the full-frame variant,
    declared explicitly."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        c.select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w).cast("bigint").alias("balance_quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.first("c_custkey").over(w).alias("poorest_in_segment"),
            F.nth_value("c_custkey", 2).over(wf).cast("bigint").alias(
                "second_poorest"
            ),
            "c_acctbal",
        )
        .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
        .drop("c_acctbal")
    )


@register(
    "approx_kmv_merge",
    f"""
    WITH dk AS (SELECT DISTINCT l_returnflag, l_linestatus, l_partkey
                FROM lineitem),
    h AS (SELECT l_returnflag, l_linestatus,
                 CAST(('0x' || SUBSTR(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
                      ::UBIGINT AS BIGINT) AS h
          FROM dk),
    part_bot AS (
        SELECT l_returnflag, l_linestatus, h FROM (
            SELECT l_returnflag, l_linestatus, h,
                   ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                        ORDER BY h) AS rn
            FROM h) WHERE rn <= {KMV_K}),
    merged AS (
        SELECT l_returnflag, CAST(MAX(h) AS BIGINT) AS kth_min_merged
        FROM (SELECT l_returnflag, h,
                     ROW_NUMBER() OVER (PARTITION BY l_returnflag
                          ORDER BY h) AS rn
              FROM (SELECT DISTINCT l_returnflag, h FROM part_bot))
        WHERE rn <= {KMV_K} GROUP BY l_returnflag),
    direct AS (
        SELECT l_returnflag, CAST(MAX(h) AS BIGINT) AS kth_min_direct
        FROM (SELECT l_returnflag, h,
                     ROW_NUMBER() OVER (PARTITION BY l_returnflag
                          ORDER BY h) AS rn
              FROM (SELECT DISTINCT l_returnflag, h FROM h))
        WHERE rn <= {KMV_K} GROUP BY l_returnflag)
    SELECT m.l_returnflag, d.kth_min_direct, m.kth_min_merged,
           (m.kth_min_merged = d.kth_min_direct) AS merge_exact,
           CAST({KMV_K - 1} AS DOUBLE) * {_KMV_DOMAIN} / m.kth_min_merged
               AS est_kmv
    FROM merged m JOIN direct d USING (l_returnflag)
    ORDER BY m.l_returnflag
    """,
    tags=("sketch", "surplus", "pipeline"),
)
def approx_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KMV MERGE receipt: per-(flag, status) bottom-k sketches merged
    per flag must equal the sketch computed directly over the flag — the
    algebraic property (bottom-k of a union = bottom-k of the union of
    bottom-k's) that lets a 100 TB pipeline sketch each ingestion
    partition independently and fold results upward without re-reading
    data. merge_exact is emitted per group and must be uniformly true;
    the oracle re-derives both sides.

    Scale shape: the partitioned sketches are (groups x statuses x k) rows;
    the merge re-ranks THAT bounded frame (distinct-by-hash first — the
    same key under two statuses hashes identically); the direct side
    reuses the entry-level bottom-k shape. Every window is group-keyed.
    The hashed distinct-key frame is CACHED (r11): it feeds the
    partitioned and the direct sketch with different prunings, so without
    materialization the corpus scan + 3-column distinct + md5 re-executed
    per side (2 scans in the before-plan; the dbt story) — three narrow
    columns per distinct key, stats-bearing. The direct side must stay an
    independent computation over the full key frame (deriving it from
    part_bot would assume the very merge property the entry verifies).
    r12 (ADVICE r11): the cache is tracked by the dedup ``_memo`` LRU so
    eviction unpersists it — a raw ``.cache()`` grew executor storage
    unbounded across a multi-SF session."""
    from skinnerdb_spark.operators.dedup import _memo

    l = read_table(spark, sf_dir, "lineitem")
    dk = l.select("l_returnflag", "l_linestatus", "l_partkey").distinct()
    h = _memo(
        spark, sf_dir, "kmv_merge_h",
        lambda: dk.select(
            "l_returnflag",
            "l_linestatus",
            F.expr(
                "CAST(conv(substring(md5(CAST(CAST(l_partkey AS STRING) AS BINARY)),"
                " 1, 15), 16, 10) AS BIGINT)"
            ).alias("h"),
        ),
    )

    def bottom_k(df: DataFrame, keys: list[str]) -> DataFrame:
        w = Window.partitionBy(*keys).orderBy("h")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= KMV_K)
            .drop("rn")
        )

    part_bot = bottom_k(h, ["l_returnflag", "l_linestatus"])
    merged = (
        bottom_k(part_bot.select("l_returnflag", "h").distinct(), ["l_returnflag"])
        .groupBy("l_returnflag")
        .agg(F.max("h").cast("bigint").alias("kth_min_merged"))
    )
    direct = (
        bottom_k(h.select("l_returnflag", "h").distinct(), ["l_returnflag"])
        .groupBy("l_returnflag")
        .agg(F.max("h").cast("bigint").alias("kth_min_direct"))
    )
    return (
        merged.join(direct, "l_returnflag")
        .select(
            "l_returnflag",
            "kth_min_direct",
            "kth_min_merged",
            (F.col("kth_min_merged") == F.col("kth_min_direct")).alias(
                "merge_exact"
            ),
            F.expr(
                f"CAST({KMV_K - 1} AS DOUBLE) * {_KMV_DOMAIN} / kth_min_merged"
            ).alias("est_kmv"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "orders_percentile_disc",
    """
    WITH pct AS (
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(quantile_disc(CAST(o_totalprice AS DECIMAL(12,2)), 0.5)
                    AS DOUBLE) AS p50_disc,
               CAST(quantile_disc(CAST(o_totalprice AS DECIMAL(12,2)), 0.9)
                    AS DOUBLE) AS p90_disc
        FROM orders GROUP BY o_orderpriority),
    mon AS (
        SELECT o_orderpriority, mo AS busiest_month FROM (
            SELECT o_orderpriority, mo,
                   ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                        ORDER BY COUNT(*) DESC, mo) AS rn
            FROM (SELECT o_orderpriority,
                         CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo
                  FROM orders)
            GROUP BY o_orderpriority, mo) WHERE rn = 1)
    SELECT p.o_orderpriority, p.n, p.p50_disc, p.p90_disc, m.busiest_month
    FROM pct p JOIN mon m USING (o_orderpriority)
    ORDER BY p.o_orderpriority
    """,
    tags=("agg", "surplus"),
)
def orders_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENTILE_DISC (exact discrete quantiles) + a DETERMINISTIC mode —
    the selection-quantile surface the quantile tier had not yet verified
    (median_manual/equidepth are value-domain rebuilds; percentile/
    quantile_cont interpolate). DISC quantiles SELECT an actual value
    (first value with CDF >= p in both engines), so the result is exact
    with no interpolation arithmetic to align — the decimal-in/double-out
    cast is the only cross-engine surface. Mode is computed MANUALLY
    ((count DESC, value ASC) rank — native mode() tie-breaks are
    engine-internal) over the 12-value month domain.

    Scale path (VERDICT r10 item 6): Spark's native percentile_disc buffers
    each group's values on one executor — measured 83.6 s at sf10 (15M rows
    per priority) and a genuine OOM hazard at 100 TB. The DISC ranks are
    therefore selected by the repo's value-domain k-th selection kernel
    (operators/quantiles.py exact_value_at_ranks — O(bins) executor state,
    no sort, no buffering): PERCENTILE_DISC(p) = value at rank ceil(p*n),
    computed in exact integer arithmetic ((n+1) DIV 2 / (9n+9) DIV 10 —
    never p*n in floats, whose rounding can cross an integer boundary).
    The oracle keeps DuckDB's native quantile_disc: same selection, two
    independent implementations."""
    from skinnerdb_spark.operators.quantiles import exact_value_at_ranks

    o = read_table(spark, sf_dir, "orders")
    ranks = exact_value_at_ranks(
        o.select(
            "o_orderpriority",
            F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        ),
        ["o_orderpriority"],
        "price",
        # ceil(p*n) in integer-safe form: ceil(n/2) = floor((n+1)/2),
        # ceil(9n/10) = floor((9n+9)/10). The numerators are exact bigints
        # in double; /2 is exact and /10 of an integer numerator only
        # rounds when the true quotient is non-integral (fraction >= 0.1,
        # ulp ~1e-9 at sf10 magnitudes), so floor never crosses a boundary
        # — unlike floor(p*n) with p=0.9, which can.
        lambda n: F.array(
            F.floor((n + 1) / 2).cast("long"),
            F.floor((9 * n + 9) / 10).cast("long"),
        ),
    )
    pct = ranks.groupBy("o_orderpriority").agg(
        F.max(F.when(F.col("qi") == 0, F.col("value")))
        .cast("double")
        .alias("p50_disc"),
        F.max(F.when(F.col("qi") == 1, F.col("value")))
        .cast("double")
        .alias("p90_disc"),
    )
    mo = (
        o.select("o_orderpriority", F.month("o_orderdate").cast("bigint").alias("mo"))
        .groupBy("o_orderpriority", "mo")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # n per priority folds out of the month histogram (60 rows) — no third
    # scan of orders for a bare COUNT
    counts = mo.groupBy("o_orderpriority").agg(
        F.sum("cnt").cast("bigint").alias("n")
    )
    pct = counts.join(pct, "o_orderpriority")
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("cnt"), F.asc("mo"))
    busiest = (
        mo.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderpriority", F.col("mo").alias("busiest_month"))
    )
    return (
        pct.join(busiest, "o_orderpriority")
        .select("o_orderpriority", "n", "p50_disc", "p90_disc", "busiest_month")
        .orderBy("o_orderpriority")
    )


def kmv_sketch(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group, h) bottom-k sketch rows — the reusable KMV kernel behind
    approx_distinct_kmv / approx_kmv_merge and the streaming monitor
    (streaming/windows.py::stream_kmv_monitor), kept in one place so the
    batch and stream paths cannot drift arithmetically. Same two-phase
    bottom-k as the entries: per-(group, input-partition) pre-prune, then
    the group-keyed final window."""
    dk = df.select(
        F.col(group_col).alias("grp"), F.col(key_col).alias("k")
    ).distinct()
    h = dk.select(
        "grp",
        F.expr(
            "CAST(conv(substring(md5(CAST(CAST(k AS STRING) AS BINARY)),"
            " 1, 15), 16, 10) AS BIGINT)"
        ).alias("h"),
    )
    pre = Window.partitionBy("grp", F.spark_partition_id()).orderBy("h")
    fin = Window.partitionBy("grp").orderBy("h")
    return (
        h.withColumn("prn", F.row_number().over(pre))
        .filter(F.col("prn") <= KMV_K)
        .withColumn("rn", F.row_number().over(fin))
        .filter(F.col("rn") <= KMV_K)
        .select("grp", "h")
    )


# --------------------------------------------------------------------------
# Bloom-filter semi-join pruning (r9 cont.): the RUNTIME ROW FILTER made
# explicit, deterministic, and measurable. Spark's own
# spark.sql.optimizer.runtime.bloomFilter.enabled injects exactly this plan
# (build a bloom over the dim keys, prune the fact scan before the join) but
# its filter is engine-internal and probabilistic per run; here the bloom is
# pure relational algebra over salted md5 buckets, so the PASS SET ITSELF —
# including every false positive — is cross-engine hash-exact, and the entry
# reports the measured false-positive rate next to the (1 - load)-free
# textbook bound (load^k with identical expression shape in both engines).
# --------------------------------------------------------------------------
BLOOM_M = 8192  # bucket count (the bloom's bit-domain)
BLOOM_K = 3  # salted hash functions per key


def _bloom_bucket_spark(i: int) -> str:
    return (
        f"CAST(conv(substring(md5(CAST(concat(CAST(k AS STRING), '#{i}')"
        f" AS BINARY)), 1, 15), 16, 10) % {BLOOM_M} AS BIGINT)"
    )


def _bloom_bucket_duck(i: str) -> str:
    return (
        f"CAST(('0x' || SUBSTR(md5(CAST(k AS VARCHAR) || '#' || {i}), 1, 15))"
        f"::UBIGINT AS BIGINT) % {BLOOM_M}"
    )


@register(
    "approx_bloom_semijoin",
    f"""
    WITH build AS (
        SELECT DISTINCT o_orderkey AS k FROM orders
        WHERE o_orderpriority = '1-URGENT'
          AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'),
    bits AS (
        SELECT DISTINCT {_bloom_bucket_duck("1")} AS b FROM build
        UNION
        SELECT DISTINCT {_bloom_bucket_duck("2")} FROM build
        UNION
        SELECT DISTINCT {_bloom_bucket_duck("3")} FROM build),
    rows_probe AS (
        SELECT l_orderkey AS k FROM lineitem
        WHERE l_shipdate >= DATE '1995-07-01' AND l_shipdate < DATE '1996-01-01'),
    probe AS (SELECT DISTINCT k FROM rows_probe),
    pe AS (
        SELECT k, i, CAST(('0x' || SUBSTR(md5(CAST(k AS VARCHAR) || '#'
                   || CAST(i AS VARCHAR)), 1, 15))::UBIGINT AS BIGINT)
                   % {BLOOM_M} AS b
        FROM probe, (VALUES (1), (2), (3)) AS t(i)),
    pass_keys AS (
        SELECT k FROM pe JOIN bits USING (b) GROUP BY k HAVING COUNT(*) = {BLOOM_K}),
    truth AS (SELECT k FROM probe WHERE k IN (SELECT k FROM build)),
    agg AS (
        SELECT (SELECT COUNT(*) FROM build)      AS n_build,
               (SELECT COUNT(*) FROM bits)       AS n_bits,
               (SELECT COUNT(*) FROM probe)      AS n_probe,
               (SELECT COUNT(*) FROM pass_keys)  AS n_pass,
               (SELECT COUNT(*) FROM truth)      AS n_true_keys,
               (SELECT COUNT(*) FROM rows_probe) AS n_rows_probe,
               (SELECT COUNT(*) FROM rows_probe
                WHERE k IN (SELECT k FROM pass_keys)) AS n_rows_pass,
               (SELECT COUNT(*) FROM rows_probe
                WHERE k IN (SELECT k FROM truth))     AS n_rows_true)
    SELECT CAST(n_build AS BIGINT) AS n_build,
           CAST(n_bits AS BIGINT) AS n_bits,
           CAST(n_probe AS BIGINT) AS n_probe,
           CAST(n_pass AS BIGINT) AS n_pass,
           CAST(n_true_keys AS BIGINT) AS n_true_keys,
           CAST(n_pass - n_true_keys AS BIGINT) AS n_false_pos,
           CAST(n_pass - n_true_keys AS DOUBLE)
               / NULLIF(n_probe - n_true_keys, 0) AS key_fp_rate,
           CAST(n_bits AS DOUBLE) / {BLOOM_M} AS bits_load,
           (CAST(n_bits AS DOUBLE) / {BLOOM_M})
               * (CAST(n_bits AS DOUBLE) / {BLOOM_M})
               * (CAST(n_bits AS DOUBLE) / {BLOOM_M}) AS fp_bound,
           CAST(n_rows_probe AS BIGINT) AS n_rows_probe,
           CAST(n_rows_pass AS BIGINT) AS n_rows_pass,
           CAST(n_rows_true AS BIGINT) AS n_rows_true
    FROM agg
    """,
    tags=("sketch", "join", "surplus", "pipeline"),
)
def approx_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bloom-filter semi-join pruning receipt: urgent-1995
    order keys build a {BLOOM_K}-hash bloom over {BLOOM_M} buckets (salted
    md5, the KMV keying recipe); H2-1995 shipment keys probe it. A probe key
    passes iff ALL {BLOOM_K} of its buckets are set. The report pins the
    build/probe/pass/truth cardinalities, the exact false-positive count and
    rate, the filter load, the load^k textbook bound, and the row-granular
    scan-pruning value (rows the fact scan would skip vs ground truth).

    Scale shape: the set-bit relation is AT MOST {BLOOM_M} rows whatever the
    build side grows to — it is the broadcastable runtime filter Spark's own
    InjectRuntimeFilter would synthesize, except reproducible. The probe
    side reduces to distinct keys first (map-side combinable), expands to
    exactly {BLOOM_K} rows per key, and meets the bits relation in a
    broadcast hash join — no shuffle of the fact table at any scale. Every
    count is an exact integer; the two rates are single fixed-shape IEEE
    divisions, identical text in both engines.

    Reference analogue: none (the reference prunes via in-RAM key indexes,
    src/indexing/Index.java — this is the distributed, bounded-memory
    equivalent a 100 TB fact scan actually ships)."""
    from skinnerdb_spark.operators.dedup import _memo

    o = read_table(spark, sf_dir, "orders")
    # build / probe / bits are each read by 2-5 consumers below (bits x3
    # union branches, the flags fold, the cardinality columns) with
    # different prunings — uncached, the filtered scan + distinct
    # re-executed per consumer (11 scans in the r11 before-plan, 3 after).
    # All three are bounded: build and probe are distinct KEY sets (the
    # selective filters applied first), bits is <= BLOOM_M rows. r12
    # (ADVICE r11): caches tracked by the dedup _memo LRU so eviction
    # unpersists them instead of stranding blocks across a multi-SF run.
    build = _memo(
        spark, sf_dir, "bloom_build",
        lambda: o.filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= "1995-01-01")
            & (F.col("o_orderdate") < "1996-01-01")
        )
        .select(F.col("o_orderkey").alias("k"))
        .distinct(),
    )

    def _bits() -> DataFrame:
        acc = None
        for i in (1, 2, 3):
            part = build.select(F.expr(_bloom_bucket_spark(i)).alias("b"))
            acc = part if acc is None else acc.unionAll(part)
        return acc.distinct()

    bits = _memo(spark, sf_dir, "bloom_bits", _bits)

    li = read_table(spark, sf_dir, "lineitem")
    rows_probe = li.filter(
        (F.col("l_shipdate") >= "1995-07-01") & (F.col("l_shipdate") < "1996-01-01")
    ).select(F.col("l_orderkey").alias("k"))
    # r12 (guide §2.3 "aggregate before you shuffle"): the probe side is
    # reduced to per-key ROW COUNTS in one map-side-combinable aggregate —
    # the same corpus pass the old DISTINCT paid, but carrying cnt means
    # every row-level statistic folds out of the key frame, so the old
    # second corpus pass (rows_probe |><| flags join) and the 3x Expand
    # the multi-countDistinct aggregate planned over it disappear. k is
    # unique in this frame, so COUNT(*) == COUNT(DISTINCT k) and the
    # distinct counts become plain conditional sums. sf10 (downstream of
    # the shared frames): 5.3/3.8 -> 1.6/1.8 s, output identical.
    kc = _memo(
        spark, sf_dir, "bloom_probe_cnt",
        lambda: rows_probe.groupBy("k").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        ),
    )
    probe = kc.select("k")
    pe = probe.select(
        "k",
        F.explode(
            F.array(*[F.expr(_bloom_bucket_spark(i)) for i in (1, 2, 3)])
        ).alias("b"),
    )
    pass_keys = (
        pe.join(F.broadcast(bits), "b")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("nset"))
        .filter(F.col("nset") == BLOOM_K)
        .select("k")
    )
    # one flag frame, one counting pass: every key/row statistic folds out
    # of the per-key count frame (flags carries (cnt, is_true, is_pass)
    # per key; the first ladder cut this entry 54 s -> see PERFORMANCE.md
    # — the naive 8-aggregate layout re-scanned the fact table and
    # re-computed the probe distinct per count)
    flags = (
        kc.join(
            build.withColumn("is_true", F.lit(True)), "k", "left"
        )
        .join(pass_keys.withColumn("is_pass", F.lit(True)), "k", "left")
        .select(
            "k",
            "cnt",
            F.coalesce("is_true", F.lit(False)).alias("is_true"),
            F.coalesce("is_pass", F.lit(False)).alias("is_pass"),
        )
    )
    counts = flags.agg(
        F.sum("cnt").cast("bigint").alias("n_rows_probe"),
        F.sum(F.when(F.col("is_pass"), F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_rows_pass"),
        F.sum(F.when(F.col("is_true"), F.col("cnt")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("n_rows_true"),
        F.count(F.lit(1)).cast("bigint").alias("n_probe"),
        F.sum(F.when(F.col("is_pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pass"),
        F.sum(F.when(F.col("is_true"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true_keys"),
    )

    def c1(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias(name))

    out = (
        c1(build, "n_build")
        .crossJoin(F.broadcast(c1(bits, "n_bits")))
        .crossJoin(F.broadcast(counts))
    )
    return out.select(
        "n_build",
        "n_bits",
        "n_probe",
        "n_pass",
        "n_true_keys",
        (F.col("n_pass") - F.col("n_true_keys")).cast("bigint").alias("n_false_pos"),
        F.expr(
            "CAST(n_pass - n_true_keys AS DOUBLE)"
            " / NULLIF(n_probe - n_true_keys, 0)"
        ).alias("key_fp_rate"),
        F.expr(f"CAST(n_bits AS DOUBLE) / {BLOOM_M}").alias("bits_load"),
        F.expr(
            f"(CAST(n_bits AS DOUBLE) / {BLOOM_M})"
            f" * (CAST(n_bits AS DOUBLE) / {BLOOM_M})"
            f" * (CAST(n_bits AS DOUBLE) / {BLOOM_M})"
        ).alias("fp_bound"),
        "n_rows_probe",
        "n_rows_pass",
        "n_rows_true",
    )

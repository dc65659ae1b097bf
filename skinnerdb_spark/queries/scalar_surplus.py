"""Scalar surplus: math / string / datetime / grouping-sets / null-join
coverage the reference lacks entirely (SURVEY §2.8 "Not supported" list).

Oracle-portability rules applied:
- math: only exactly-defined ops (abs/ceil/floor/sign/sqrt/mod, x*x for
  power) — exp/log/pow can differ in the last ulp between JVM Math and libm.
- strings: ASCII-safe ops with identical semantics in both engines.
- datetime: day-granularity functions; dayofweek conventions differ across
  engines so weekday is derived portably from epoch days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skinnerdb_spark.functions.exact import DS
from skinnerdb_spark.queries.util import read_table
from skinnerdb_spark.registry import register


@register(
    "scalar_math",
    """
    SELECT l_orderkey, l_linenumber,
           ABS(l_quantity - 25.0) AS abs_dev,
           CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS price_k_ceil,
           CAST(FLOOR(l_quantity / 7.0) AS BIGINT) AS qty_weeks,
           CAST(SIGN(l_discount - 0.05) AS INTEGER) AS disc_sign,
           SQRT(l_quantity) AS qty_sqrt,
           l_quantity * l_quantity AS qty_sq,
           CAST(l_orderkey % 97 AS BIGINT) AS key_mod
    FROM lineitem
    WHERE l_orderkey % 11 = 0
    """,
    tags=("scalar", "surplus"),
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 11 == 0)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_quantity") - 25.0).alias("abs_dev"),
        F.ceil(F.col("l_extendedprice") / 1000.0).cast("bigint").alias("price_k_ceil"),
        F.floor(F.col("l_quantity") / 7.0).cast("bigint").alias("qty_weeks"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_orderkey") % 97).cast("bigint").alias("key_mod"),
    )


@register(
    "scalar_string",
    """
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           TRIM('  ' || c_name || ' ') AS name_trim,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           REVERSE(c_mktsegment) AS seg_rev,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           CONCAT_WS('|', c_mktsegment, c_name) AS seg_name,
           CAST(LENGTH(c_name) AS BIGINT) AS name_len
    FROM customer
    """,
    tags=("scalar", "surplus"),
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("seg_name"),
        F.length("c_name").cast("bigint").alias("name_len"),
    )


@register(
    "scalar_datetime",
    """
    SELECT o_orderkey,
           o_orderdate + INTERVAL 45 DAY AS due_ts,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_start,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr,
           CAST(EXTRACT(doy FROM o_orderdate) AS INTEGER) AS day_of_year
    FROM orders
    WHERE o_orderkey % 13 = 0
    """,
    tags=("scalar", "surplus"),
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime surplus surface. Outputs stay TIMESTAMP (not DATE): Spark
    DATE arrives in pandas as python date objects while DuckDB yields
    datetime64, which can break strict value comparison downstream."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 45 DAY")).alias("due_ts"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp_ntz").alias("month_end"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("bigint").alias("days_since_start"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofyear("o_orderdate").alias("day_of_year"),
    )


@register(
    "grouping_sets_agg",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           COUNT(*) AS n_rows, {DS('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    tags=("agg", "surplus"),
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with GROUPING() markers (via the engine's SQL
    surface — the DataFrame API covers only rollup/cube)."""
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS INT) AS g_status,
               COUNT(*) AS n_rows, {DS('l_quantity')} AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "null_join_semantics",
    """
    SELECT o_orderpriority, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unmatched
    FROM (
        SELECT o.o_orderpriority, c.c_name
        FROM (SELECT o_orderkey, o_orderpriority,
                     NULLIF(o_custkey % 50, 0) AS join_key FROM orders) o
        LEFT JOIN (SELECT NULLIF(c_custkey % 50, 0) AS join_key,
                          c_name FROM customer WHERE c_custkey < 50) c
          ON o.join_key = c.join_key)
    GROUP BY o_orderpriority
    """,
    tags=("scalar", "null", "surplus"),
)
def null_join_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL keys never match in equi-joins (in either engine); rows with NULL
    join keys survive only via the LEFT join's unmatched path. Pins the
    three-valued-logic behavior that silently corrupts pipelines when
    assumed away."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.nullif(F.col("o_custkey") % 50, F.lit(0)).alias("join_key"),
    )
    c = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 50)
        .select(F.nullif(F.col("c_custkey") % 50, F.lit(0)).alias("join_key"), "c_name")
    )
    return (
        o.join(c, "join_key", "left")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("c_name").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("unmatched"),
        )
    )


@register(
    "outer_join_full",
    """
    WITH cu AS (SELECT c_nationkey AS k, COUNT(*) AS nc
                FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 60),
         su AS (SELECT s_nationkey AS k, COUNT(*) AS ns
                FROM supplier GROUP BY s_nationkey HAVING COUNT(*) >= 5)
    SELECT COALESCE(cu.k, su.k) AS nationkey, cu.nc, su.ns,
           CASE WHEN cu.k IS NULL THEN 'supplier_only'
                WHEN su.k IS NULL THEN 'customer_only'
                ELSE 'both' END AS side
    FROM cu FULL OUTER JOIN su ON cu.k = su.k
    """,
    tags=("join", "outer", "surplus"),
)
def outer_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with genuinely unmatched rows on BOTH sides (the
    HAVING cuts keep different nation subsets), COALESCE'd key + side tag.
    Outer joins are the only §2.3 join shape the surface lacked an entry
    for; both aggregate inputs are tiny, so AQE broadcast-ranges the join."""
    cu = (
        read_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("nc"))
        .filter(F.col("nc") >= 60)
    )
    su = (
        read_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("ns"))
        .filter(F.col("ns") >= 5)
    )
    j = cu.alias("cu").join(su.alias("su"), F.col("cu.k") == F.col("su.k"), "full")
    return j.select(
        F.coalesce("cu.k", "su.k").alias("nationkey"),
        "nc",
        "ns",
        F.when(F.col("cu.k").isNull(), "supplier_only")
        .when(F.col("su.k").isNull(), "customer_only")
        .otherwise("both")
        .alias("side"),
    )


@register(
    "outer_join_on_filter",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS cust_without_urgent
    FROM customer c
    LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority = '1-URGENT'
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "outer", "surplus"),
)
def outer_join_on_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ON-vs-WHERE outer-join trap: a predicate in the LEFT JOIN's ON
    clause filters the RIGHT side only — customers with no urgent order
    survive as null-extended rows (the same predicate in WHERE would silently
    turn the join inner). Catalyst must NOT push an ON-clause right-side
    predicate below the preserved side; this entry pins that."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    j = c.join(
        o,
        (c.c_custkey == o.o_custkey) & (o.o_orderpriority == "1-URGENT"),
        "left",
    )
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("cust_without_urgent"),
    )


@register(
    "scalar_higher_order",
    """
    WITH base AS (
      SELECT c_custkey, CAST(c_custkey % 5 + 3 AS BIGINT) AS n,
             list_transform(range(1, CAST(c_custkey % 5 + 3 AS BIGINT) + 1),
                            x -> CAST(x AS BIGINT)) AS arr
      FROM customer)
    SELECT c_custkey,
           array_to_string(list_transform(arr, x -> x * x), ',') AS sq_csv,
           CAST(len(list_filter(arr, x -> x % 2 = 0)) AS BIGINT) AS n_evens,
           CAST(list_sum(list_transform(arr, x -> x * x)) AS BIGINT) AS sum_sq,
           len(list_filter(arr, x -> x > 4)) > 0 AS has_gt4,
           array_to_string(
             list_transform(range(1, n + 1),
                            i -> arr[CAST(i AS INTEGER)]
                               + list_reverse(arr)[CAST(i AS INTEGER)]), ',')
             AS zip_csv,
           array_to_string(list_sort(arr, 'DESC'), ',') AS desc_csv
    FROM base
    """,
    tags=("scalar", "surplus", "higher-order"),
)
def scalar_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function sweep: transform / filter / exists /
    aggregate (fold) / zip_with / sort_array over per-row integer sequences —
    the lambda surface Catalyst evaluates entirely JVM-side (no Python, no
    shuffle; one codegen'd projection). Array-valued results are emitted as
    joined strings (like embed_quantize's scalar summaries) so the driver's
    hash compare stays array-free; integer arithmetic keeps it exact. DuckDB
    mirrors with list_transform/list_filter/list_sum and an index-lambda
    emulation of zip_with (no native zip_with there)."""
    c = read_table(spark, sf_dir, "customer")
    n = (F.col("c_custkey") % 5 + 3).cast("bigint")
    arr = F.sequence(F.lit(1).cast("bigint"), n)
    base = c.select("c_custkey", arr.alias("arr"))
    a = F.col("arr")
    return base.select(
        "c_custkey",
        F.array_join(F.transform(a, lambda x: x * x), ",").alias("sq_csv"),
        F.size(F.filter(a, lambda x: x % 2 == 0)).cast("bigint").alias("n_evens"),
        F.aggregate(a, F.lit(0).cast("bigint"), lambda acc, x: acc + x * x).alias("sum_sq"),
        F.exists(a, lambda x: x > 4).alias("has_gt4"),
        F.array_join(F.zip_with(a, F.reverse(a), lambda x, y: x + y), ",").alias("zip_csv"),
        F.array_join(F.sort_array(a, asc=False), ",").alias("desc_csv"),
    )


@register(
    "scalar_try_surface",
    """
    WITH t AS (
        SELECT o_orderkey,
               TRY_CAST(CASE WHEN o_orderkey % 3 = 0
                             THEN CAST(o_orderkey AS VARCHAR)
                             ELSE o_orderstatus END AS BIGINT) AS mixed_int,
               TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS prio_digit,
               o_totalprice / NULLIF(o_orderkey % 5, 0) AS safe_div,
               CASE WHEN o_orderkey % 1000 = 0 AND o_orderkey > 0 THEN NULL
                    ELSE 1000 + o_orderkey END AS guarded_add
        FROM orders)
    SELECT COUNT(*) AS n_rows,
           COUNT(mixed_int) AS cast_ok,
           CAST(SUM(CASE WHEN mixed_int IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS cast_null,
           CAST(SUM(prio_digit) AS BIGINT) AS prio_digit_sum,
           COUNT(safe_div) AS div_ok,
           MIN(safe_div) AS div_min,
           MAX(safe_div) AS div_max,
           COUNT(guarded_add) AS add_ok,
           CAST(SUM(guarded_add % 1000000007) AS BIGINT) AS add_mod_sum
    FROM t
    """,
    tags=("scalar", "try", "dirty-data"),
)
def scalar_try_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRY_* dirty-data surface: at 100 TB some fraction of every raw
    feed fails to parse, and the difference between TRY_CAST/try_divide/
    try_add (NULL) and their throwing forms (job abort at 99%% progress) is
    operational. Every expression has BOTH classes firing by construction:
    mixed_int casts a string that is numeric on every third row and a
    status letter otherwise; try_divide sees a zero divisor on every fifth
    row; try_add overflows int64 on every thousandth orderkey. The oracle
    mirrors semantics, not syntax — DuckDB has TRY_CAST but no try_divide/
    try_add, so it guards with NULLIF and an explicit CASE, proving the
    NULL-on-error contract equal from both directions. div_min/div_max
    are single IEEE divisions of identical inputs (deterministic); all
    sums are exact integers (the overflow sum compares modulo 1e9+7 to
    stay in range).

    ERROR-PATH DENSITY is the operational lesson (measured): Spark's
    try_add NULL-on-overflow is implemented by catching the per-row
    ArithmeticException, and Java exception construction costs ~microseconds
    — the error path is ~100x the happy path. The first cut overflowed on
    ~EVERY row and ran 118 s at sf10 (15M orders); with the error class at
    0.1% density (this version — the realistic dirty-data shape TRY_* is
    for) the same entry runs in seconds. At 100 TB, TRY_* guards a small
    dirty fraction; a predicate-dense error class belongs in an explicit
    CASE guard instead."""
    o = read_table(spark, sf_dir, "orders")
    t = o.select(
        "o_orderkey",
        F.expr(
            "TRY_CAST(CASE WHEN o_orderkey % 3 = 0 "
            "THEN CAST(o_orderkey AS STRING) "
            "ELSE o_orderstatus END AS BIGINT)"
        ).alias("mixed_int"),
        F.expr("TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT)").alias(
            "prio_digit"
        ),
        F.expr("try_divide(o_totalprice, o_orderkey % 5)").alias("safe_div"),
        F.expr(
            "CASE WHEN o_orderkey % 1000 = 0 AND o_orderkey > 0 "
            "THEN try_add(9223372036854775807, o_orderkey) "
            "ELSE try_add(1000, o_orderkey) END"
        ).alias("guarded_add"),
    )
    return t.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("mixed_int").alias("cast_ok"),
        F.sum(F.when(F.col("mixed_int").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("cast_null"),
        F.sum("prio_digit").cast("bigint").alias("prio_digit_sum"),
        F.count("safe_div").alias("div_ok"),
        F.min("safe_div").alias("div_min"),
        F.max("safe_div").alias("div_max"),
        F.count("guarded_add").alias("add_ok"),
        F.sum(F.col("guarded_add") % 1000000007).cast("bigint").alias("add_mod_sum"),
    )


@register(
    "scalar_map_surface",
    """
    WITH c AS (SELECT o_custkey, o_orderstatus AS st,
                      CAST(COUNT(*) AS BIGINT) AS cnt
               FROM orders WHERE o_custkey <= 200
               GROUP BY o_custkey, o_orderstatus)
    SELECT o_custkey,
           CAST(COUNT(*) AS INTEGER) AS n_statuses,
           CAST(COALESCE(MAX(CASE WHEN st = 'O' THEN cnt END), 0) AS BIGINT)
               AS n_open,
           CAST(COALESCE(MAX(CASE WHEN st = 'F' THEN cnt END), 0) AS BIGINT)
               AS n_done,
           array_to_string(list(st ORDER BY st), ',') AS keys_csv,
           array_to_string(
               list(st || '=' || CAST(cnt * 2 AS VARCHAR) ORDER BY st), '|')
               AS doubled,
           COALESCE(array_to_string(
               list(st || '=' || CAST(cnt AS VARCHAR) ORDER BY st)
                   FILTER (WHERE cnt >= 3), '|'), '') AS busy,
           CAST(SUM(cnt) AS BIGINT) AS total_orders,
           array_to_string(
               list(st || '=' || CAST(cnt AS VARCHAR) ORDER BY st), '|')
               || '|~total=' || CAST(SUM(cnt) AS VARCHAR) AS full_render
    FROM c GROUP BY o_custkey
    """,
    tags=("scalar", "surplus", "map-type"),
)
def scalar_map_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MAP-type surface: per customer (custkey <= 200) a
    status -> order-count map is BUILT (map_from_entries over a sorted
    entry array — insertion order is the iteration order, so every
    downstream rendering is deterministic), then read back and transformed
    with the full map-function family: element_at (missing key -> NULL,
    coalesced to 0), size, map_keys, transform_values, map_filter,
    map_values folded with aggregate(), and map_concat appending a
    '~total' summary entry.

    Map-valued intermediates never reach the output: every column is a
    scalar or a canonical 'k=v|k=v' string (the scalar_higher_order
    precedent — keeps the driver's hash compare array/map-free). DuckDB
    has no Spark-shaped map aggregate, so the oracle mirrors each output
    relationally (conditional MAX for element_at, ordered list() renders
    for the entry strings) — semantics, not syntax, like
    scalar_try_surface.

    Shape: ONE shuffle on (custkey, status) for the count partial, then the
    per-customer map build rides a second exchange down to |statuses| rows
    per customer; everything after is a codegen'd projection. Integers and
    strings only — bit-identical across engines."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    cnt = o.groupBy("o_custkey", F.col("o_orderstatus").alias("st")).agg(
        F.count("*").alias("cnt")
    )
    m = F.map_from_entries(F.sort_array(F.collect_list(F.struct("st", "cnt"))))
    base = cnt.groupBy("o_custkey").agg(m.alias("m"))
    mm = F.col("m")

    def render(mp):
        return F.array_join(
            F.transform(
                F.map_entries(mp),
                lambda e: F.concat_ws("=", e["key"], e["value"].cast("string")),
            ),
            "|",
        )

    total = F.aggregate(
        F.map_values(mm), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )
    return base.select(
        "o_custkey",
        F.size(mm).alias("n_statuses"),
        F.coalesce(F.element_at(mm, "O"), F.lit(0).cast("bigint")).alias("n_open"),
        F.coalesce(F.element_at(mm, "F"), F.lit(0).cast("bigint")).alias("n_done"),
        F.array_join(F.map_keys(mm), ",").alias("keys_csv"),
        render(F.transform_values(mm, lambda k, v: v * 2)).alias("doubled"),
        render(F.map_filter(mm, lambda k, v: v >= 3)).alias("busy"),
        total.alias("total_orders"),
        render(
            F.map_concat(
                mm, F.create_map(F.lit("~total"), total)
            )
        ).alias("full_render"),
    )


@register(
    "scalar_bitwise_surface",
    """
    SELECT o_orderkey,
           k,
           k & 2654435761 AS band,
           k | 255 AS bor,
           xor(k, 2654435761) AS bxor,
           ~k AS bnot,
           k << 3 AS shl3,
           k >> 2 AS shr2,
           CAST(bit_count(k) AS BIGINT) AS popcnt,
           (k >> 5) & 1 AS bit5,
           xor(k, k >> 1) AS gray,
           k & (k - 1) AS drop_low,
           k & (-k) AS low_bit
    FROM (SELECT o_orderkey,
                 CAST(o_orderkey * 2654435761 % 4294967296 AS BIGINT) AS k
          FROM orders WHERE o_orderkey % 257 = 0)
    ORDER BY o_orderkey
    """,
    tags=("scalar", "bitwise", "surplus"),
)
def scalar_bitwise_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression surface sweep: AND/OR/XOR/NOT, left/right shifts,
    popcount, single-bit extraction, Gray coding, and the two classic
    lowest-set-bit identities (k & (k-1) clears it, k & -k isolates it) —
    over Knuth-hash-mixed order keys so every word shape (dense, sparse,
    high-bit-set) appears. Completes §2.8's integer-expression coverage
    next to scalar_math's arithmetic ops; these are the primitives the
    bitmap tier (ev_bitmap_rollup) and every hash/sketch entry compile to.

    Dialect note: XOR spells `^` in Spark and `xor()` in DuckDB; NOT/shift
    semantics on BIGINT are two's-complement-identical in both. All columns
    exact integers — nothing float anywhere.

    Reference analogue: none (the reference's expression surface has no
    bitwise operators, SURVEY §2.8)."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 257 == 0)
    k = (F.col("o_orderkey") * F.lit(2654435761)) % F.lit(4294967296)
    base = o.select("o_orderkey", k.cast("bigint").alias("k"))
    return base.select(
        "o_orderkey",
        "k",
        F.expr("k & 2654435761").alias("band"),
        F.expr("k | 255").alias("bor"),
        F.expr("k ^ 2654435761").alias("bxor"),
        F.expr("~k").alias("bnot"),
        F.expr("shiftleft(k, 3)").alias("shl3"),
        F.expr("shiftright(k, 2)").alias("shr2"),
        F.expr("CAST(bit_count(k) AS BIGINT)").alias("popcnt"),
        F.expr("shiftright(k, 5) & 1").alias("bit5"),
        F.expr("k ^ shiftright(k, 1)").alias("gray"),
        F.expr("k & (k - 1)").alias("drop_low"),
        F.expr("k & (-k)").alias("low_bit"),
    ).orderBy("o_orderkey")

"""Modern-SQL surface entries (Spark 4.x features the reference predates).

The reference engine's SQL surface is the SELECT-FROM-WHERE fragment its
parser accepts (src/query/SQLanalyzer.java — no WITH RECURSIVE, no
semi-structured type); these entries claim the two Spark-4-native surfaces a
user migrating TO this engine gains:

- rcte_order_chains : ``WITH RECURSIVE`` iterative traversal executed by the
  engine itself (Spark 4's recursive CTE), oracle = DuckDB's own
  ``WITH RECURSIVE`` — the first registry entry where BOTH engines run a
  recursion natively rather than an unrolled loop (contrast
  ``graph_pagerank`` / ``dedup_clusters``, which unroll rounds in the plan).
- events_variant_props : the VARIANT semi-structured type
  (``parse_json`` → ``variant_get``): parse once into the shredded binary
  encoding, extract typed fields JVM-side — the Spark-4 upgrade over the
  per-path string re-parse of ``get_json_object`` used by
  ``events_json_extract``.
  (Known boundary, probed: Spark 4.1 supports only UNION ALL recursion —
  UNION-dedup recursion, the cycle-safe form for graph reachability, raises
  UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE. Cyclic-graph traversals therefore
  stay on the unrolled-rounds path (dedup_clusters' min-label loop), and
  the recursive entry here walks an acyclic chain with a by-construction
  depth cap.)
- text_word_offsets_udtf : a Python user-defined TABLE function
  (``@udtf``, Arrow-optimized) driven through ``LATERAL`` — the reference's
  UDF surface is an unreachable stub (SURVEY §2.10); this completes OUR
  UDF surface (scalar Pandas UDFs + ``mapInPandas`` + UDTF) with the one
  shape the others can't express: a per-row generator carrying running
  state across the rows it emits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from skinnerdb_spark.queries.util import read_table
from skinnerdb_spark.registry import register

__all__ = ["rcte_order_chains", "events_variant_props", "text_word_offsets_udtf"]

#: recursion depth bound for the order-chain walk — a BY-CONSTRUCTION cap
#: (`pos <= CHAIN_CAP` in the seed frame), not a runtime limit: at any scale
#: factor the recursion runs exactly CHAIN_CAP rounds, each a frontier join
#: of one-row-per-customer against the seed. TPC-H grows customers, not
#: orders-per-customer, so wall clock is (fixed rounds) x (linear frontier).
CHAIN_CAP = 8

#: Spark bounds total rows PRODUCED by a recursion (default 1e6) as a
#: runaway guard; the chain produces ~CHAIN_CAP rows per customer, so the
#: default trips around sf1. The depth cap above is the real guard — raise
#: the row limit out of the way, but ONLY inside a dedicated child session
#: (ADVICE r8: setting it on the caller's session disabled the runaway
#: guard for every subsequent query in the session).
_ROW_LIMIT = 2_000_000_000

#: one recursion-scoped child session per SparkContext (applicationId keys
#: it — id(spark) can be recycled after GC). newSession() shares the
#: SparkContext, table cache, and builder-time confs but owns its SQLConf
#: and temp-view namespace, so the raised cteRecursionRowLimit (and the
#: recursion's temp view) never leak into the caller's session.
_RCTE_SESSIONS: dict[str, SparkSession] = {}


def _recursion_session(spark: SparkSession) -> SparkSession:
    key = spark.sparkContext.applicationId
    s2 = _RCTE_SESSIONS.get(key)
    if s2 is None:
        if len(_RCTE_SESSIONS) >= 4:  # dead-context hygiene, not a hot path
            _RCTE_SESSIONS.clear()
        s2 = spark.newSession()
        s2.conf.set("spark.sql.cteRecursionRowLimit", str(_ROW_LIMIT))
        _RCTE_SESSIONS[key] = s2
    return s2

# Both engines evaluate the identical recursion: anchor = each customer's
# first order, step = join the frontier to the customer's next order by
# chain position, accumulating spend in DECIMAL(18,2) (exact, and the
# accumulation ORDER is pinned by the chain itself, so cross-engine results
# are bit-identical). MAX_BY(x, depth) is deterministic because depth is
# unique within a customer's chain. The FINAL chain_spend is cast to DOUBLE
# per the repo's money-column convention (tpch_q01 oracle precedent): the
# accumulation stays DECIMAL-exact, but emitted decimals render differently
# through the driver's fetch layer ('1987976.20' vs '1987976.2' — the r8
# hash-only gate miss), so final selects emit DOUBLE on both sides.
_RCTE_CHAIN = """
chain(o_custkey, okey, depth, acc) AS (
  SELECT o_custkey, o_orderkey, 1, CAST(price AS DECIMAL(18,2))
  FROM {seq} WHERE pos = 1
  UNION ALL
  SELECT s.o_custkey, s.o_orderkey, c.depth + 1,
         CAST(c.acc + s.price AS DECIMAL(18,2))
  FROM chain c JOIN {seq} s
    ON s.o_custkey = c.o_custkey AND s.pos = c.depth + 1)
SELECT o_custkey,
       CAST(MAX(depth) AS INT) AS n_orders,
       MAX_BY(okey, depth) AS last_orderkey,
       CAST(MAX_BY(acc, depth) AS DOUBLE) AS chain_spend
FROM chain
GROUP BY o_custkey
"""

_RCTE_ORACLE = (
    """
WITH RECURSIVE
seq AS (
  SELECT * FROM (
    SELECT o_custkey, o_orderkey,
           CAST(o_totalprice AS DECIMAL(12,2)) AS price,
           CAST(ROW_NUMBER() OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS INT) AS pos
    FROM orders) t
  WHERE pos <= """
    + str(CHAIN_CAP)
    + "),\n"
    + _RCTE_CHAIN.format(seq="seq")
)


@register(
    "rcte_order_chains",
    _RCTE_ORACLE,
    tags=("sql", "recursive-cte"),
)
def rcte_order_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE executed natively by Spark 4: walk each customer's
    first CHAIN_CAP orders in date order as a linked chain (anchor = first
    order, step = successor join on chain position), accumulating spend in
    exact DECIMAL along the walk; report per customer the chain length,
    terminal order, and accumulated spend.

    Scale design: recursion depth is CHAIN_CAP BY CONSTRUCTION (the seed
    frame keeps only pos <= CHAIN_CAP), so the number of sequential rounds
    is data-independent; each round's frontier is one row per customer and
    the per-round join is frontier x seed on (custkey, pos) — linear work
    per round, CHAIN_CAP rounds total. The seed frame (one window over a
    2-column projection of orders) is computed ONCE and cached; Spark's
    recursive-CTE executor re-references it each round, and without the
    cache each of the CHAIN_CAP rounds would re-scan + re-window orders.
    The recursion-row-limit conf (a runaway guard, default 1e6 total rows)
    is raised out of the way — the depth cap is the real bound here — in a
    DEDICATED child session (:func:`_recursion_session`), so the guard
    stays at its default for everything else the caller runs (ADVICE r8).
    """
    spark = _recursion_session(spark)
    o = read_table(spark, sf_dir, "orders")
    seq = (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
            F.row_number()
            .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
            .cast("int")
            .alias("pos"),
        )
        .filter(F.col("pos") <= CHAIN_CAP)
    )
    view = "skinner_rcte_seq8"
    seq.cache().createOrReplaceTempView(view)
    return spark.sql("WITH RECURSIVE\n" + _RCTE_CHAIN.format(seq=view))


@register(
    "events_variant_props",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_even_k,
           MAX(k) AS max_k
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
          FROM events) t
    WHERE k IS NOT NULL
    GROUP BY event_type
    """,
    tags=("sql", "variant", "json"),
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction through Spark 4's VARIANT type:
    ``parse_json(props)`` shreds the JSON string ONCE into the binary
    VARIANT encoding, then ``variant_get(v, '$.k', 'int')`` reads the typed
    field from the shredded form — versus ``events_json_extract``, which
    re-parses the string per JSON path with ``get_json_object``. Same
    rollup shape on purpose: the pair documents the two extraction paths
    side by side, and at 100 TB the parse-once VARIANT path is the one a
    props column with many accessed fields should take (each extra field is
    a cheap shredded read, not another full parse). The filter on the
    extracted field (`k IS NOT NULL`) also exercises VARIANT in a
    predicate, not just a projection. Oracle: DuckDB's native JSON
    extraction — the VARIANT encoding is engine-internal, the extracted
    VALUES are the contract."""
    e = read_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_even_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "text_word_offsets_udtf",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
               FROM documents),
    idx AS (SELECT doc_id, words,
                   UNNEST(generate_series(1, len(words))) AS widx
            FROM w)
    SELECT doc_id, CAST(widx AS INT) AS widx, words[widx] AS word,
           CAST(COALESCE(length(array_to_string(words[1:widx-1], '')), 0)
                + (widx - 1) AS INT) AS start_off
    FROM idx
    """,
    bench=False,
    tags=("udf", "udtf", "text"),
)
def text_word_offsets_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 ``@udtf``,
    Arrow-optimized) applied via ``LATERAL``: each document row expands to
    one row per word carrying a RUNNING character offset — per-row
    generator state the scalar-UDF and ``mapInPandas`` surfaces can't
    express row-by-row. The reference's UDF surface is a stub that throws
    (SURVEY §2.10); this entry completes ours with the table-function
    shape, exactly value-verified: the oracle recomputes every offset
    relationally (prefix character sums + separator count).

    Honest scale note: a Python UDTF IS the slow path — the generator runs
    in the Python worker per input row (Arrow moves the batches, not the
    loop). The production path for this exact transform is the JVM-side
    explode family (text_chunking, text_token_ids); the entry exists for
    API-surface parity and stays out of the headline bench set
    (bench=False, like the adaptive A/B entry) so the headline numbers
    keep measuring the recommended path.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="widx int, word string, start_off int", useArrow=True)
    class WordOffsets:
        def eval(self, text: str):
            off = 0
            for i, w in enumerate(text.split(" ")):
                yield i + 1, w, off
                off += len(w) + 1

    spark.udtf.register("skinner_word_offsets", WordOffsets)
    d = read_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("skinner_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.widx, t.word, t.start_off
        FROM skinner_udtf_docs d,
             LATERAL skinner_word_offsets(d.text) t
        """
    )


# --------------------------------------------------------------------------
# r9 batch: the remaining Spark-4 SQL authoring surfaces — SQL-body UDFs
# (scalar + table-valued), SQL scripting (BEGIN/DECLARE/WHILE/SET VARIABLE),
# string collations, and GROUP BY ALL / ORDER BY ALL resolution.
# --------------------------------------------------------------------------

@register(
    "scalar_sql_udf",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(24,4)))
               AS DOUBLE) AS disc_sum,
           CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(24,4))
                * (1 + CAST(l_tax AS DECIMAL(12,2))) AS DECIMAL(30,6)))
               AS DOUBLE) AS taxed_sum
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag
    """,
    tags=("sql", "udf", "sql-udf"),
)
def scalar_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-body UDFs (Spark 4 ``CREATE FUNCTION ... RETURN <expr>``): a
    scalar ``skinner_disc`` (exact-decimal discounted price) and a second
    UDF ``skinner_taxed`` COMPOSED on top of it, both used inside an
    aggregate — the declarative UDF surface where the function body inlines
    into the plan (Catalyst sees the expression, so codegen/pushdown still
    apply; contrast the Python UDTF entry, which is an honest slow path).
    The oracle inlines the identical decimal expression chain; finals cast
    to DOUBLE per the money-column convention."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION skinner_disc(p DOUBLE, d DOUBLE) "
        "RETURNS DECIMAL(24,4) RETURN CAST(CAST(p AS DECIMAL(12,2)) "
        "* (1 - CAST(d AS DECIMAL(12,2))) AS DECIMAL(24,4))"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION skinner_taxed(p DOUBLE, d DOUBLE, t DOUBLE) "
        "RETURNS DECIMAL(30,6) RETURN CAST(skinner_disc(p, d) "
        "* (1 + CAST(t AS DECIMAL(12,2))) AS DECIMAL(30,6))"
    )
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("skinner_sqludf_li")
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM(skinner_disc(l_extendedprice, l_discount)) AS DOUBLE)
                   AS disc_sum,
               CAST(SUM(skinner_taxed(l_extendedprice, l_discount, l_tax)) AS DOUBLE)
                   AS taxed_sum
        FROM skinner_sqludf_li
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag
        """
    )


@register(
    "scalar_sql_table_udf",
    """
    WITH buckets AS (
        SELECT o_orderkey, o_totalprice, g.i AS bucket
        FROM orders, UNNEST(generate_series(1, 3)) g(i)
        WHERE CAST(o_totalprice AS DECIMAL(12,2)) >= g.i * 100000)
    SELECT bucket, COUNT(*) AS n_orders,
           CAST(MIN(o_orderkey) AS BIGINT) AS min_okey
    FROM buckets GROUP BY bucket
    """,
    tags=("sql", "udf", "sql-udf"),
)
def scalar_sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLE-VALUED SQL UDF (``CREATE FUNCTION ... RETURNS TABLE``) driven
    through a LATERAL correlation: each order expands to one row per
    100k-spend bucket it clears. The body is pure SQL, so unlike the
    Python UDTF the expansion stays JVM-side (explode over a sequence —
    Catalyst inlines the function body as a lateral subquery)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION skinner_spend_buckets(price DOUBLE) "
        "RETURNS TABLE(bucket INT) RETURN "
        "SELECT b AS bucket FROM (SELECT explode(sequence(1, 3)) AS b) "
        "WHERE CAST(price AS DECIMAL(12,2)) >= b * 100000"
    )
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("skinner_sqltudf_o")
    return spark.sql(
        """
        SELECT t.bucket, COUNT(*) AS n_orders,
               CAST(MIN(o.o_orderkey) AS BIGINT) AS min_okey
        FROM skinner_sqltudf_o o,
             LATERAL skinner_spend_buckets(o.o_totalprice) t
        GROUP BY t.bucket
        """
    )


@register(
    "sql_script_chain_report",
    f"""
    WITH seq AS (
        SELECT o_custkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
               CAST(ROW_NUMBER() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS INT) AS pos
        FROM orders),
    ks AS (SELECT UNNEST(generate_series(1, 4)) AS k)
    SELECT ks.k AS k,
           CAST((SELECT COUNT(*) FROM seq WHERE pos = ks.k) AS BIGINT)
               AS n_customers,
           CAST((SELECT CAST(SUM(price) AS DOUBLE) FROM seq WHERE pos <= ks.k)
               AS DOUBLE) AS spend_k
    FROM ks ORDER BY k
    """,
    tags=("sql", "scripting"),
)
def sql_script_chain_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL SCRIPTING (Spark 4 ``BEGIN ... END``): a DECLAREd loop variable,
    a WHILE loop, and an array-of-struct accumulator built with
    ``SET <var> = (scalar subquery)`` per iteration — the procedural
    authoring surface the reference's console never had. Each iteration
    aggregates the cached order-position view (customers having a k-th
    order, cumulative spend of first-k orders); the final SELECT explodes
    the 4-row accumulator. Driver state is the accumulator array — 4
    structs, bounded by the loop constant, never data-sized. The oracle
    computes the same report with a generate_series cross join."""
    o = read_table(spark, sf_dir, "orders")
    seq = o.select(
        "o_custkey",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .cast("int")
        .alias("pos"),
    )
    seq.cache().createOrReplaceTempView("skinner_script_seq")
    return spark.sql(
        """
        BEGIN
          DECLARE k INT DEFAULT 1;
          DECLARE acc ARRAY<STRUCT<k: INT, n_customers: BIGINT, spend_k: DOUBLE>>
              DEFAULT ARRAY();
          WHILE k <= 4 DO
            SET acc = array_append(acc, named_struct(
                'k', k,
                'n_customers',
                (SELECT COUNT(*) FROM skinner_script_seq WHERE pos = k),
                'spend_k',
                (SELECT CAST(SUM(price) AS DOUBLE) FROM skinner_script_seq
                 WHERE pos <= k)));
            SET k = k + 1;
          END WHILE;
          SELECT t.k AS k, t.n_customers AS n_customers, t.spend_k AS spend_k
          FROM (SELECT explode(acc) AS t) ORDER BY k;
        END
        """
    )


@register(
    "scalar_collation_surface",
    """
    WITH cased AS (
        SELECT CASE WHEN c_custkey % 3 = 0 THEN upper(c_mktsegment)
                    WHEN c_custkey % 3 = 1 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS seg,
               c_custkey
        FROM customer)
    SELECT lower(seg) AS seg_ci,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_case_variants,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key
    FROM cased GROUP BY lower(seg) ORDER BY seg_ci
    """,
    tags=("sql", "collation"),
)
def scalar_collation_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String COLLATIONS (Spark 4 ``COLLATE(expr, 'UTF8_LCASE')``):
    case-perturbed market segments grouped under a case-insensitive
    collation — the engine-level answer to ad-hoc lower() wrapping (a
    collated column compares case-insensitively in joins, GROUP BY, and
    DISTINCT without rewriting every predicate). The emitted group key is
    lower(seg) — deterministic where the collated group's member order is
    not — and the oracle mirrors with lower() grouping, value-identical on
    this ASCII domain (collation vs lower() diverges only on Unicode
    case-folding edge cases, which TPC-H segments cannot contain)."""
    c = read_table(spark, sf_dir, "customer")
    cased = c.select(
        F.when(F.col("c_custkey") % 3 == 0, F.upper("c_mktsegment"))
        .when(F.col("c_custkey") % 3 == 1, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        "c_custkey",
    )
    coll = F.expr("COLLATE(seg, 'UTF8_LCASE')")
    return (
        cased.groupBy(coll.alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("seg").cast("bigint").alias("n_case_variants"),
            F.min("c_custkey").cast("bigint").alias("min_key"),
        )
        .select(
            F.lower(F.col("k")).cast("string").alias("seg_ci"),
            "n", "n_case_variants", "min_key",
        )
        .orderBy("seg_ci")
    )


@register(
    "orders_group_by_all",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
    FROM orders
    WHERE o_orderdate < DATE '1996-07-01'
    GROUP BY ALL
    ORDER BY ALL
    """,
    tags=("sql", "group-by-all"),
)
def orders_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` / ``ORDER BY ALL`` resolution (Spark 4 and DuckDB
    both implement the shorthand, so the ORACLE IS THE IDENTICAL QUERY
    TEXT): every non-aggregate select item — including the computed year —
    becomes a grouping key, and ORDER BY ALL sorts by the full output
    column list. Surface-parity entry: a user migrating DuckDB notebooks
    onto this engine keeps the shorthand."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("skinner_gba_o")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
        FROM skinner_gba_o
        WHERE o_orderdate < DATE '1996-07-01'
        GROUP BY ALL
        ORDER BY ALL
        """
    )

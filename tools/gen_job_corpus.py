#!/usr/bin/env python
"""Generate the committed JOB-style SQL corpus (queries_sql/*.sql).

The reference's primary benchmark is a directory of 113 template
instantiations (imdb/queries/01a.sql ... 33c.sql) run via the `bench`
console command (src/console/SkinnerCmd.java:67-99 ->
src/benchmark/BenchUtil.readAllQueries, src/benchmark/BenchUtil.java:40-60).
This script mirrors that corpus structure on the driver warehouse: five
join-graph templates x a deterministic parameter grid = 100+ .sql files,
each runnable by Engine.bench_dir (plain or adaptive) and by DuckDB
(portable ANSI SQL, TIMESTAMP literals only — the session pins UTC).

Deterministic by construction — re-running regenerates byte-identical files.
"""

from __future__ import annotations

import os

OUT = os.path.join(os.path.dirname(__file__), "..", "queries_sql")

queries: dict[str, str] = {}


def add(name: str, sql: str) -> None:
    assert name not in queries
    queries[name] = sql.strip() + "\n"


# ---------------------------------------------------------------- T1: star5
# lineitem x part x supplier x nation x region — brand x region x qty grid
# (the 01a/06a JOB families: MIN aggregates over a filtered star)
_T1 = [
    ("Brand#2", "ASIA", 1, 20),
    ("Brand#4", "EUROPE", 10, 35),
    ("Brand#7", "AMERICA", 20, 45),
    ("Brand#11", "AFRICA", 5, 30),
    ("Brand#13", "MIDDLE EAST", 15, 40),
    ("Brand#17", "ASIA", 25, 50),
    ("Brand#19", "EUROPE", 1, 15),
    ("Brand#23", "AMERICA", 30, 50),
    ("Brand#29", "AFRICA", 10, 25),
    ("Brand#31", "MIDDLE EAST", 5, 45),
    ("Brand#37", "ASIA", 12, 33),
    ("Brand#41", "EUROPE", 8, 28),
]
for i, (brand, region, qlo, qhi) in enumerate(_T1, 1):
    add(
        f"t1_star_{i:02d}",
        f"""
SELECT MIN(p_name) AS min_pname, MIN(s_name) AS min_sname, COUNT(*) AS n_rows
FROM lineitem, part, supplier, nation, region
WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND p_brand = '{brand}' AND r_name = '{region}'
  AND l_quantity BETWEEN {qlo} AND {qhi}
""",
    )

# ------------------------------------------------------------- T2: chain4
# customer -> orders -> lineitem + nation — mktsegment x date band x priority
_SEGS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
_BANDS = [("1995-01-01", "1997-01-01"), ("1996-06-01", "1998-06-01"),
          ("1997-01-01", "1999-01-01"), ("1998-01-01", "2000-01-01")]
for i, seg in enumerate(_SEGS):
    for k, (lo, hi) in enumerate(_BANDS):
        add(
            f"t2_chain_{i * len(_BANDS) + k + 1:02d}",
            f"""
SELECT MIN(c_name) AS min_cname, MAX(o_orderdate) AS max_odate,
       COUNT(*) AS n_rows
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
  AND c_nationkey = n_nationkey
  AND c_mktsegment = '{seg}'
  AND o_orderdate >= TIMESTAMP '{lo} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{hi} 00:00:00'
""",
        )

# ------------------------------------------------------------- T3: theta3
# lineitem x orders x supplier with a cross-table inequality — ratio x qty cap
_T3 = [(r, q) for r in ("0.3", "0.4", "0.5", "0.6") for q in (20, 35, 50)]
for i, (ratio, qcap) in enumerate(_T3, 1):
    add(
        f"t3_theta_{i:02d}",
        f"""
SELECT MIN(s_name) AS min_sname, COUNT(*) AS n_rows
FROM lineitem, orders, supplier
WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND l_extendedprice > o_totalprice * {ratio}
  AND l_quantity <= {qcap}
""",
    )

# -------------------------------------------------------------- T4: wide6
# 6-way snowflake — p_size band x orderstatus x discount cap
_T4 = [
    (1, 15, "F", "0.05"), (10, 25, "O", "0.07"), (20, 35, "F", "0.09"),
    (30, 45, "O", "0.04"), (5, 40, "F", "0.08"), (15, 50, "O", "0.06"),
    (1, 30, "O", "0.10"), (25, 50, "F", "0.03"), (8, 22, "O", "0.09"),
    (12, 38, "F", "0.06"), (18, 44, "O", "0.05"), (3, 27, "F", "0.10"),
    (22, 48, "O", "0.08"), (6, 19, "F", "0.04"), (28, 50, "O", "0.07"),
    (2, 36, "F", "0.05"),
]
for i, (slo, shi, status, dcap) in enumerate(_T4, 1):
    add(
        f"t4_wide_{i:02d}",
        f"""
SELECT MIN(p_name) AS min_pname, MIN(n_name) AS min_nname,
       MIN(r_name) AS min_rname, COUNT(*) AS n_rows
FROM lineitem, part, supplier, nation, region, orders
WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND l_orderkey = o_orderkey
  AND p_size BETWEEN {slo} AND {shi}
  AND o_orderstatus = '{status}'
  AND l_discount < {dcap}
""",
    )

# -------------------------------------------------------------- T5: like3
# lineitem x part x orders — stacked LIKE / NOT LIKE patterns (JOB's string
# predicate family; the reference compiles LIKE to a DFA)
_T5 = [
    ("%re%", "%blue%", "1-%"), ("%an%", "%red%", "2-%"), ("%ol%", "%green%", "3-%"),
    ("%ch%", "%white%", "4-%"), ("%ro%", "%black%", "5-%"), ("%la%", "%pink%", "1-%"),
    ("%en%", "%ivory%", "2-%"), ("%ra%", "%azure%", "3-%"), ("%le%", "%plum%", "4-%"),
    ("%ar%", "%coral%", "5-%"), ("%in%", "%linen%", "1-%"), ("%or%", "%khaki%", "2-%"),
]
for i, (like1, notlike, prio) in enumerate(_T5, 1):
    add(
        f"t5_like_{i:02d}",
        f"""
SELECT MIN(p_name) AS min_pname, MIN(o_orderpriority) AS min_prio,
       COUNT(*) AS n_rows
FROM lineitem, part, orders
WHERE l_partkey = p_partkey AND l_orderkey = o_orderkey
  AND p_name LIKE '{like1}' AND p_name NOT LIKE '{notlike}'
  AND o_orderpriority LIKE '{prio}'
""",
    )

# ------------------------------------------------------------ T6: revenue5
# orders-rooted star with a grouped decimal-exact revenue — priority x year
for i, (prio, year) in enumerate(
    [(p, y) for p in ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
     for y in (1995, 1996, 1997, 1998)],
    1,
):
    add(
        f"t6_rev_{i:02d}",
        f"""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_rows
FROM lineitem, orders, supplier, nation
WHERE l_orderkey = o_orderkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey
  AND o_orderpriority = '{prio}'
  AND o_orderdate >= TIMESTAMP '{year}-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '{year + 1}-01-01 00:00:00'
GROUP BY n_name
""",
    )


# ------------------------------------------------------------ T7: group3
# grouped star with HAVING — type x region x min-count threshold
_T7 = [
    ("PROMO", "ASIA", 5), ("ECONOMY", "EUROPE", 10), ("STANDARD", "AMERICA", 3),
    ("SMALL", "AFRICA", 8), ("LARGE", "MIDDLE EAST", 2), ("MEDIUM", "ASIA", 12),
    ("PROMO", "EUROPE", 7), ("ECONOMY", "AMERICA", 4), ("STANDARD", "AFRICA", 9),
    ("SMALL", "MIDDLE EAST", 6), ("LARGE", "ASIA", 11), ("MEDIUM", "EUROPE", 1),
]
for i, (ptype, region, thresh) in enumerate(_T7, 1):
    add(
        f"t7_group_{i:02d}",
        f"""
SELECT p_brand, COUNT(*) AS n_rows, MIN(s_name) AS min_sname
FROM lineitem, part, supplier, nation, region
WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND p_type = '{ptype}' AND r_name = '{region}'
GROUP BY p_brand
HAVING COUNT(*) >= {thresh}
""",
    )


# ------------------------------------------------------------- T8: deep8
# 8-leaf snowflake with nation in TWO roles (customer's and supplier's) —
# the JOB pattern of one dim table joined through different FK paths
# (imdb/queries/29a.sql family joins name/title/company through role tables).
_T8 = [
    ("ASIA", 1, 15, "F"), ("EUROPE", 10, 25, "O"), ("AMERICA", 20, 35, "F"),
    ("AFRICA", 30, 45, "O"), ("MIDDLE EAST", 5, 20, "F"), ("ASIA", 15, 30, "O"),
    ("EUROPE", 25, 40, "F"), ("AMERICA", 35, 50, "O"), ("AFRICA", 1, 25, "F"),
    ("MIDDLE EAST", 12, 38, "O"), ("ASIA", 22, 48, "F"), ("EUROPE", 3, 18, "O"),
]
for i, (region, slo, shi, status) in enumerate(_T8, 1):
    add(
        f"t8_deep8_{i:02d}",
        f"""
SELECT MIN(p.p_name) AS min_pname, MIN(c.c_name) AS min_cname,
       MIN(n2.n_name) AS min_suppnation, COUNT(*) AS n_rows
FROM lineitem l, orders o, customer c, nation n1, region r1,
     supplier s, nation n2, part p
WHERE l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
  AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r1.r_regionkey
  AND l.l_suppkey = s.s_suppkey AND s.s_nationkey = n2.n_nationkey
  AND l.l_partkey = p.p_partkey
  AND r1.r_name = '{region}' AND p.p_size BETWEEN {slo} AND {shi}
  AND o.o_orderstatus = '{status}'
""",
    )

# ------------------------------------------------------------- T9: deep10
# 10-leaf: lineitem SELF-JOIN (pairs of items in one order, linenumber theta)
# + each item's part, one item's supplier chain — up-to-17-way JOB territory.
_T9 = [
    ("Brand#12", "PROMO", "1-URGENT"), ("Brand#23", "ECONOMY", "2-HIGH"),
    ("Brand#34", "STANDARD", "3-MEDIUM"), ("Brand#45", "SMALL", "4-NOT SPECIFIED"),
    ("Brand#15", "LARGE", "5-LOW"), ("Brand#21", "MEDIUM", "1-URGENT"),
    ("Brand#32", "PROMO", "2-HIGH"), ("Brand#43", "ECONOMY", "3-MEDIUM"),
]
for i, (brand, ptype, prio) in enumerate(_T9, 1):
    add(
        f"t9_deep10_{i:02d}",
        f"""
SELECT MIN(p1.p_name) AS min_p1, MIN(p2.p_name) AS min_p2,
       MIN(n2.n_name) AS min_suppnation, COUNT(*) AS n_rows
FROM lineitem l1, lineitem l2, orders o, customer c, nation n1, region r1,
     supplier s1, nation n2, part p1, part p2
WHERE l1.l_orderkey = o.o_orderkey AND l2.l_orderkey = o.o_orderkey
  AND o.o_custkey = c.c_custkey AND c.c_nationkey = n1.n_nationkey
  AND n1.n_regionkey = r1.r_regionkey
  AND l1.l_suppkey = s1.s_suppkey AND s1.s_nationkey = n2.n_nationkey
  AND l1.l_partkey = p1.p_partkey AND l2.l_partkey = p2.p_partkey
  AND l1.l_linenumber < l2.l_linenumber
  AND p1.p_brand = '{brand}' AND p2.p_type = '{ptype}'
  AND o.o_orderpriority = '{prio}'
""",
    )

# ------------------------------------------------------------ T10: deep12
# 12-leaf: the full two-item snowflake — both items carry their own
# part -> supplier -> nation chain, customer side carries nation -> region.
_T10 = [
    ("Brand#13", "Brand#42", "ASIA"), ("Brand#24", "Brand#31", "EUROPE"),
    ("Brand#35", "Brand#22", "AMERICA"), ("Brand#41", "Brand#14", "AFRICA"),
    ("Brand#12", "Brand#33", "MIDDLE EAST"), ("Brand#25", "Brand#44", "ASIA"),
    ("Brand#33", "Brand#11", "EUROPE"), ("Brand#44", "Brand#25", "AMERICA"),
]
for i, (b1, b2, region) in enumerate(_T10, 1):
    add(
        f"t10_deep12_{i:02d}",
        f"""
SELECT MIN(p1.p_name) AS min_p1, MIN(p2.p_name) AS min_p2,
       MIN(n2.n_name) AS min_n2, MIN(n3.n_name) AS min_n3, COUNT(*) AS n_rows
FROM lineitem l1, lineitem l2, orders o, customer c, nation n1, region r1,
     part p1, supplier s1, nation n2, part p2, supplier s2, nation n3
WHERE l1.l_orderkey = o.o_orderkey AND l2.l_orderkey = o.o_orderkey
  AND o.o_custkey = c.c_custkey AND c.c_nationkey = n1.n_nationkey
  AND n1.n_regionkey = r1.r_regionkey
  AND l1.l_partkey = p1.p_partkey AND l1.l_suppkey = s1.s_suppkey
  AND s1.s_nationkey = n2.n_nationkey
  AND l2.l_partkey = p2.p_partkey AND l2.l_suppkey = s2.s_suppkey
  AND s2.s_nationkey = n3.n_nationkey
  AND l1.l_linenumber < l2.l_linenumber
  AND p1.p_brand = '{b1}' AND p2.p_brand = '{b2}' AND r1.r_name = '{region}'
""",
    )


# ------------------------------------------------------------ T11: deep15
# 15-leaf, the reference's deepest-shape family (imdb/queries/29a.sql: 17
# relations, alias reuse, stacked LIKE + range predicates). Two items of one
# order, each with its FULL part -> supplier -> nation -> region chain, the
# customer's nation -> region chain, plus a repeat-purchase orders alias
# (o2 by the same customer, strictly later) — multiple LIKE / NOT LIKE and a
# date band, exactly the 29a predicate mix.
_T11 = [
    ("%re%", "%blue%", "ASIA", "1995-01-01", "1997-01-01"),
    ("%an%", "%red%", "EUROPE", "1996-01-01", "1998-01-01"),
    ("%ol%", "%green%", "AMERICA", "1995-06-01", "1998-06-01"),
    ("%id%", "%white%", "AFRICA", "1996-06-01", "1999-01-01"),
    ("%in%", "%pink%", "MIDDLE EAST", "1995-01-01", "1998-01-01"),
    ("%ge%", "%ivory%", "ASIA", "1996-01-01", "1999-01-01"),
]
for i, (like1, nlike2, region, dlo, dhi) in enumerate(_T11, 1):
    add(
        f"t11_deep15_{i:02d}",
        f"""
SELECT MIN(p1.p_name) AS min_p1, MIN(p2.p_name) AS min_p2,
       MIN(n2.n_name) AS min_suppnation1, MIN(r3.r_name) AS min_suppregion2,
       COUNT(*) AS n_rows
FROM lineitem l1, lineitem l2, orders o, orders o2, customer c,
     nation n1, region r1, part p1, supplier s1, nation n2, region r2,
     part p2, supplier s2, nation n3, region r3
WHERE l1.l_orderkey = o.o_orderkey AND l2.l_orderkey = o.o_orderkey
  AND o.o_custkey = c.c_custkey AND o2.o_custkey = c.c_custkey
  AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r1.r_regionkey
  AND l1.l_partkey = p1.p_partkey AND l1.l_suppkey = s1.s_suppkey
  AND s1.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
  AND l2.l_partkey = p2.p_partkey AND l2.l_suppkey = s2.s_suppkey
  AND s2.s_nationkey = n3.n_nationkey AND n3.n_regionkey = r3.r_regionkey
  AND l1.l_linenumber < l2.l_linenumber
  AND o2.o_orderdate > o.o_orderdate
  AND p1.p_name LIKE '{like1}' AND p2.p_name NOT LIKE '{nlike2}'
  AND c.c_name LIKE 'Customer#%'
  AND o.o_orderdate >= TIMESTAMP '{dlo} 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '{dhi} 00:00:00'
  AND r1.r_name = '{region}'
""",
    )

# ------------------------------------------------------------ T12: deep17
# 17-leaf — matches the widest reference shape (29a.sql's 17 relations):
# THREE items of one order (linenumber-ordered triple), each with its own
# part, the first two with supplier -> nation chains, customer side with
# nation -> region, repeat-purchase o2, stacked LIKEs + date band.
_T12 = [
    ("%re%", "%blue%", "PROMO%", "ASIA", "1995-01-01", "1998-01-01"),
    ("%an%", "%red%", "ECONOMY%", "EUROPE", "1995-06-01", "1998-06-01"),
    ("%ea%", "%green%", "STANDARD%", "AMERICA", "1996-01-01", "1999-01-01"),
    ("%ar%", "%white%", "SMALL%", "AFRICA", "1995-01-01", "1999-01-01"),
]
for i, (like1, nlike2, tlike3, region, dlo, dhi) in enumerate(_T12, 1):
    add(
        f"t12_deep17_{i:02d}",
        f"""
SELECT MIN(p1.p_name) AS min_p1, MIN(p2.p_name) AS min_p2,
       MIN(p3.p_name) AS min_p3, MIN(n2.n_name) AS min_suppnation1,
       COUNT(*) AS n_rows
FROM lineitem l1, lineitem l2, lineitem l3, orders o, orders o2, customer c,
     nation n1, region r1, part p1, supplier s1, nation n2,
     part p2, supplier s2, nation n3, part p3, supplier s3, nation n4
WHERE l1.l_orderkey = o.o_orderkey AND l2.l_orderkey = o.o_orderkey
  AND l3.l_orderkey = o.o_orderkey
  AND o.o_custkey = c.c_custkey AND o2.o_custkey = c.c_custkey
  AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r1.r_regionkey
  AND l1.l_partkey = p1.p_partkey AND l1.l_suppkey = s1.s_suppkey
  AND s1.s_nationkey = n2.n_nationkey
  AND l2.l_partkey = p2.p_partkey AND l2.l_suppkey = s2.s_suppkey
  AND s2.s_nationkey = n3.n_nationkey
  AND l3.l_partkey = p3.p_partkey AND l3.l_suppkey = s3.s_suppkey
  AND s3.s_nationkey = n4.n_nationkey
  AND l1.l_linenumber < l2.l_linenumber AND l2.l_linenumber < l3.l_linenumber
  AND o2.o_orderdate > o.o_orderdate
  AND p1.p_name LIKE '{like1}' AND p2.p_name NOT LIKE '{nlike2}'
  AND p3.p_type LIKE '{tlike3}'
  AND o.o_orderdate >= TIMESTAMP '{dlo} 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '{dhi} 00:00:00'
  AND r1.r_name = '{region}'
""",
    )


# ------------------------------------------------------------ T13: orchain
# disjunction-heavy predicates (JOB's `mi.info like A or mi.info like B`
# family, e.g. imdb/queries/29a.sql) — OR across columns AND across LIKEs,
# which stresses predicate pushdown (no single-column pushdown possible).
_T13 = [
    ("%re%", "%an%", "ASIA", "EUROPE", 10),
    ("%ol%", "%in%", "AMERICA", "AFRICA", 25),
    ("%id%", "%ge%", "MIDDLE EAST", "ASIA", 40),
    ("%ea%", "%ot%", "EUROPE", "AMERICA", 15),
    ("%sm%", "%bo%", "AFRICA", "MIDDLE EAST", 30),
    ("%ho%", "%re%", "ASIA", "AMERICA", 20),
]
for i, (l1, l2, r1, r2, qcap) in enumerate(_T13, 1):
    add(
        f"t13_orchain_{i:02d}",
        f"""
SELECT MIN(p_name) AS min_pname, MIN(r_name) AS min_rname, COUNT(*) AS n_rows
FROM lineitem, part, supplier, nation, region
WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND (p_name LIKE '{l1}' OR p_name LIKE '{l2}')
  AND (r_name = '{r1}' OR r_name = '{r2}')
  AND (l_quantity <= {qcap} OR l_discount >= 0.08)
""",
    )

# ------------------------------------------------------------ T14: nullsem
# three-valued-logic shapes: IS (NOT) NULL guards, NULL-safe comparisons, and
# COALESCE in predicates — the semantics corner the reference's compiled
# predicates handle via explicit null flags (SURVEY §2.8).
_T14 = [
    ("F", 5), ("O", 10), ("F", 20), ("O", 30),
]
for i, (status, qcap) in enumerate(_T14, 1):
    add(
        f"t14_nullsem_{i:02d}",
        f"""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o_comment_null IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_flag,
       MIN(o_orderpriority) AS min_prio
FROM (
    SELECT o.o_orderpriority,
           CASE WHEN o.o_totalprice > 100000 THEN NULL ELSE o.o_orderstatus END
             AS o_comment_null
    FROM lineitem l, orders o
    WHERE l.l_orderkey = o.o_orderkey
      AND o.o_orderstatus = '{status}'
      AND COALESCE(l.l_quantity, 0) >= {qcap}) t
""",
    )


# ------------------------------------------------------------ T15: exists
# correlated EXISTS / NOT EXISTS (the reference's IN-subquery semi-join
# surface, src/query/QueryInfo.java IN handling, generalized): semi/anti
# shapes Catalyst plans as SemiJoin/AntiJoin — outside the adaptive
# extractor's top-level-inner-chain scope, so bench_dir exercises the
# documented fallback path on these.
_T15 = [
    ("BUILDING", 150000, "1996-01-01"),
    ("MACHINERY", 120000, "1995-06-01"),
    ("AUTOMOBILE", 180000, "1997-01-01"),
    ("FURNITURE", 100000, "1996-06-01"),
    ("HOUSEHOLD", 160000, "1995-01-01"),
]
for i, (seg, cap, d) in enumerate(_T15, 1):
    add(
        f"t15_exists_{i:02d}",
        f"""
SELECT COUNT(*) AS n_custs, MIN(c_name) AS min_name
FROM customer c
WHERE c.c_mktsegment = '{seg}'
  AND EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_totalprice > {cap}
        AND o.o_orderdate >= TIMESTAMP '{d} 00:00:00')
  AND NOT EXISTS (
      SELECT 1 FROM orders o2
      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
        AND o2.o_totalprice < 5000)
""",
    )


# ------------------------------------------------------------ T16: outer
# LEFT JOIN with the filter in the ON clause (null-extends non-matching
# customers) — the semantics corner where moving the predicate to WHERE
# silently turns the join inner; the unmatched-count column makes any such
# planner/translation slip hash-visible. Reference context: outer joins are
# rejected by the reference parser (SURVEY §2.3 surplus tier here).
_T16 = [
    ("BUILDING", "O", 150000),
    ("MACHINERY", "F", 120000),
    ("AUTOMOBILE", "O", 180000),
    ("FURNITURE", "F", 100000),
    ("HOUSEHOLD", "O", 50000),
]
for i, (seg, st, cap) in enumerate(_T16, 1):
    add(
        f"t16_outer_{i:02d}",
        f"""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_no_order,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_matched,
       MIN(c.c_name) AS min_name
FROM customer c
LEFT JOIN orders o
  ON o.o_custkey = c.c_custkey
 AND o.o_orderstatus = '{st}'
 AND o.o_totalprice > {cap}
WHERE c.c_mktsegment = '{seg}'
""",
    )


# ------------------------------------------------------------ T17: window
# analytic functions over a join — rank-in-group, running totals and lag
# deltas in one statement. Outside the adaptive extractor's inner-chain
# scope (documented fallback), and a dialect surface the corpus didn't
# exercise: per-file differential proves window semantics end to end.
_T17 = [
    ("O", 3, "1995-01-01"),
    ("F", 2, "1994-01-01"),
    ("O", 5, "1996-01-01"),
    ("F", 4, "1993-06-01"),
    ("O", 2, "1997-01-01"),
]
for i, (st, topn, d) in enumerate(_T17, 1):
    add(
        f"t17_window_{i:02d}",
        f"""
SELECT c_custkey, o_orderkey, rnk,
       CAST(run_cnt AS BIGINT) AS run_cnt, prio_delta
FROM (
    SELECT c.c_custkey, o.o_orderkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY c.c_custkey
                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS BIGINT) AS rnk,
           COUNT(*) OVER (PARTITION BY c.c_custkey
                ORDER BY o.o_orderdate, o.o_orderkey
                ROWS UNBOUNDED PRECEDING) AS run_cnt,
           CASE WHEN LAG(o.o_orderpriority) OVER (PARTITION BY c.c_custkey
                     ORDER BY o.o_orderdate, o.o_orderkey)
                     = o.o_orderpriority
                THEN 0 ELSE 1 END AS prio_delta
    FROM customer c, orders o
    WHERE c.c_custkey = o.o_custkey
      AND o.o_orderstatus = '{st}'
      AND o.o_orderdate >= TIMESTAMP '{d} 00:00:00') t
WHERE rnk <= {topn}
""",
    )


# ------------------------------------------------------------ T18: scalar
# subqueries in the SELECT list, correlated per outer row — the remaining
# subquery class the corpus didn't exercise (WHERE-side IN/EXISTS/scalar
# compares are t15 + registry entries). Both engines must decorrelate to an
# outer-join + aggregate; COUNT-subqueries must come back 0 (not NULL) for
# customers with no qualifying order, and the MAX subquery NULL-extends —
# the exact semantics a naive decorrelation gets wrong. Bounded output via
# the segment + balance filter.
_T18 = [
    ("BUILDING", "O", 6000),
    ("MACHINERY", "F", 7000),
    ("AUTOMOBILE", "O", 8000),
    ("FURNITURE", "F", 6500),
    ("HOUSEHOLD", "O", 7500),
]
for i, (seg, st, bal) in enumerate(_T18, 1):
    add(
        f"t18_scalarsubq_{i:02d}",
        f"""
SELECT c.c_custkey,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
         WHERE o.o_custkey = c.c_custkey
           AND o.o_orderstatus = '{st}') AS n_status,
       (SELECT MAX(o2.o_totalprice) FROM orders o2
         WHERE o2.o_custkey = c.c_custkey) AS max_spend
FROM customer c
WHERE c.c_mktsegment = '{seg}'
  AND c.c_acctbal > {bal}
""",
    )


def main(out: str | None = None) -> None:
    out = out or OUT
    os.makedirs(out, exist_ok=True)
    for name, sql in sorted(queries.items()):
        with open(os.path.join(out, f"{name}.sql"), "w") as f:
            f.write(sql)
    print(f"wrote {len(queries)} queries to {os.path.abspath(out)}")


if __name__ == "__main__":
    main()

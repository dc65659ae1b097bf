"""Property-based differential testing: randomized queries, Spark vs DuckDB.

Extends the fixed-query oracle suite with generated queries over lineitem:
random conjunctions of range/equality/IN/LIKE predicates, random group keys,
random aggregate sets. Every generated query is built twice — DataFrame API
for Spark, ANSI SQL for DuckDB — from the same little AST, so a mismatch
indicates an engine-semantics bug, not a test artifact.

The reference's oracle methodology (BenchAndVerify vs Postgres) only ever ran
fixed workloads; this closes the coverage gap between "the 22 shapes pass"
and "the operator semantics are right".
"""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from skinnerdb_spark.catalog import read_table
from skinnerdb_spark.functions.exact import DS, dsum

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]

STR_VALUES = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["F", "O"]}
NUM_RANGES = {
    "l_quantity": (1.0, 50.0),
    "l_extendedprice": (900.0, 100000.0),
    "l_discount": (0.0, 0.1),
    "l_tax": (0.0, 0.08),
}


def gen_predicate(rng: random.Random):
    kind = rng.choice(["num_range", "num_cmp", "str_eq", "str_in", "int_mod", "like"])
    if kind == "num_range":
        col = rng.choice(NUM_COLS)
        lo, hi = NUM_RANGES[col]
        a = round(rng.uniform(lo, hi), 2)
        b = round(rng.uniform(a, hi), 2)
        return (F.col(col).between(a, b), f"{col} BETWEEN {a} AND {b}")
    if kind == "num_cmp":
        col = rng.choice(NUM_COLS)
        lo, hi = NUM_RANGES[col]
        v = round(rng.uniform(lo, hi), 2)
        op = rng.choice(["<", "<=", ">", ">=", "<>"])
        spark_ops = {
            "<": F.col(col) < v, "<=": F.col(col) <= v, ">": F.col(col) > v,
            ">=": F.col(col) >= v, "<>": F.col(col) != v,
        }
        return (spark_ops[op], f"{col} {op} {v}")
    if kind == "str_eq":
        col = rng.choice(STR_COLS)
        v = rng.choice(STR_VALUES[col])
        return (F.col(col) == v, f"{col} = '{v}'")
    if kind == "str_in":
        col = rng.choice(STR_COLS)
        vs = rng.sample(STR_VALUES[col], k=min(2, len(STR_VALUES[col])))
        inlist = ", ".join(f"'{v}'" for v in vs)
        return (F.col(col).isin(*vs), f"{col} IN ({inlist})")
    if kind == "int_mod":
        col = rng.choice(INT_COLS)
        m = rng.choice([2, 3, 5, 7])
        r = rng.randrange(m)
        return (F.col(col) % m == r, f"{col} % {m} = {r}")
    # like
    col = rng.choice(STR_COLS)
    v = rng.choice(STR_VALUES[col])
    neg = rng.random() < 0.5
    c = ~F.col(col).like(f"%{v}%") if neg else F.col(col).like(f"%{v}%")
    return (c, f"{col} {'NOT ' if neg else ''}LIKE '%{v}%'")


def gen_query(rng: random.Random):
    n_preds = rng.randint(0, 3)
    preds = [gen_predicate(rng) for _ in range(n_preds)]
    group_cols = rng.sample(STR_COLS + ["l_linenumber"], k=rng.randint(0, 2))
    agg_pool = [
        (dsum(F.col("l_extendedprice")).alias("s_price"), f"{DS('l_extendedprice')} AS s_price"),
        (dsum(F.col("l_quantity")).alias("s_qty"), f"{DS('l_quantity')} AS s_qty"),
        (F.min("l_extendedprice").alias("mn"), "MIN(l_extendedprice) AS mn"),
        (F.max("l_quantity").alias("mx"), "MAX(l_quantity) AS mx"),
        (F.count(F.lit(1)).alias("cnt"), "COUNT(*) AS cnt"),
        (
            F.count_distinct(F.col("l_suppkey")).alias("cd"),
            "COUNT(DISTINCT l_suppkey) AS cd",
        ),
    ]
    aggs = rng.sample(agg_pool, k=rng.randint(1, 3))
    return preds, group_cols, aggs


def run_both(spark, oracle_con, sf_dir, seed: int):
    rng = random.Random(seed)
    preds, group_cols, aggs = gen_query(rng)
    df = read_table(spark, sf_dir, "lineitem")
    where_parts = []
    for cond, sql in preds:
        df = df.filter(cond)
        where_parts.append(sql)
    if group_cols:
        sdf = df.groupBy(*group_cols).agg(*[a for a, _ in aggs])
    else:
        sdf = df.agg(*[a for a, _ in aggs])
    select = (", ".join(group_cols) + ", " if group_cols else "") + ", ".join(
        s for _, s in aggs
    )
    sql = f"SELECT {select} FROM lineitem"
    if where_parts:
        sql += " WHERE " + " AND ".join(where_parts)
    if group_cols:
        sql += " GROUP BY " + ", ".join(group_cols)
    return sdf.toPandas(), oracle_con.execute(sql).df(), sql


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


@pytest.mark.parametrize("seed", range(40))
def test_random_query_matches_oracle(spark, oracle_con, sf_dir, seed):
    spark_pdf, oracle_pdf, sql = run_both(spark, oracle_con, sf_dir, seed)
    _assert_equal(spark_pdf, oracle_pdf, sql)


def _assert_equal(spark_pdf, oracle_pdf, sql):
    assert len(spark_pdf) == len(oracle_pdf), f"row count differs for: {sql}"
    s, o = normalize(spark_pdf), normalize(oracle_pdf)
    assert list(s.columns) == list(o.columns), sql
    for col in s.columns:
        for i, (a, b) in enumerate(zip(s[col], o[col])):
            if pd.isna(a) and pd.isna(b):
                continue
            if isinstance(a, float) or isinstance(b, float):
                assert float(a) == float(b) or math.isclose(
                    float(a), float(b), rel_tol=0, abs_tol=0
                ), f"{col}[{i}]: {a!r} != {b!r} for: {sql}"
            else:
                assert a == b, f"{col}[{i}]: {a!r} != {b!r} for: {sql}"


# --------------------------------------------------------------------------
# randomized multi-table joins: lineitem [⋈ orders [⋈ customer]] [⋈ part]
# with random per-side predicates, random join subset, random group/aggs
# --------------------------------------------------------------------------
ORDER_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def run_join_both(spark, oracle_con, sf_dir, seed: int):
    from skinnerdb_spark.catalog import read_table as rt

    rng = random.Random(10_000 + seed)
    with_customer = rng.random() < 0.5
    with_part = rng.random() < 0.5

    l = rt(spark, sf_dir, "lineitem")
    tables_sql = ["lineitem", "orders"]
    join_sql = ["l_orderkey = o_orderkey"]
    where = []

    lp, lsql = gen_predicate(rng)
    l = l.filter(lp)
    where.append(lsql)

    o = rt(spark, sf_dir, "orders")
    if rng.random() < 0.7:
        prio = rng.choice(ORDER_PRIOS)
        o = o.filter(F.col("o_orderpriority") == prio)
        where.append(f"o_orderpriority = '{prio}'")
    df = l.join(o, l.l_orderkey == o.o_orderkey)

    if with_customer:
        c = rt(spark, sf_dir, "customer")
        seg = rng.choice(SEGMENTS)
        c = c.filter(F.col("c_mktsegment") == seg)
        where.append(f"c_mktsegment = '{seg}'")
        df = df.join(c, F.col("o_custkey") == F.col("c_custkey"))
        tables_sql.append("customer")
        join_sql.append("o_custkey = c_custkey")
    if with_part:
        p = rt(spark, sf_dir, "part")
        size_lo = rng.randint(1, 40)
        p = p.filter(F.col("p_size") >= size_lo)
        where.append(f"p_size >= {size_lo}")
        df = df.join(p, F.col("l_partkey") == F.col("p_partkey"))
        tables_sql.append("part")
        join_sql.append("l_partkey = p_partkey")

    group_col = rng.choice(["l_returnflag", "o_orderstatus", None])
    aggs_df = [
        dsum(F.col("l_extendedprice")).alias("s_price"),
        F.count(F.lit(1)).alias("cnt"),
        F.max("o_totalprice").alias("mx_total"),
    ]
    aggs_sql = [f"{DS('l_extendedprice')} AS s_price", "COUNT(*) AS cnt",
                "MAX(o_totalprice) AS mx_total"]
    if group_col:
        sdf = df.groupBy(group_col).agg(*aggs_df)
    else:
        sdf = df.agg(*aggs_df)
    sql = "SELECT " + (f"{group_col}, " if group_col else "") + ", ".join(aggs_sql)
    sql += " FROM " + ", ".join(tables_sql)
    sql += " WHERE " + " AND ".join(join_sql + where)
    if group_col:
        sql += f" GROUP BY {group_col}"
    return sdf.toPandas(), oracle_con.execute(sql).df(), sql


@pytest.mark.parametrize("seed", range(20))
def test_random_join_matches_oracle(spark, oracle_con, sf_dir, seed):
    spark_pdf, oracle_pdf, sql = run_join_both(spark, oracle_con, sf_dir, seed)
    _assert_equal(spark_pdf, oracle_pdf, sql)


# --------------------------------------------------------------------------
# scalar-expression fuzz: random integer expression trees, Spark vs DuckDB
# --------------------------------------------------------------------------
M = 1000003  # prime modulus keeps every node's magnitude < 1e12 (no overflow)


def gen_int_expr(rng: random.Random, depth: int):
    """Random integer expression AST built twice (Column, SQL). Integer-only
    keeps cross-engine comparison exact; every arithmetic node reduces
    mod M so bigint never overflows at any depth."""
    if depth == 0:
        if rng.random() < 0.3:
            v = rng.randrange(1, 1000)
            return (F.lit(v).cast("bigint"), f"CAST({v} AS BIGINT)")
        col = rng.choice(INT_COLS)
        return (F.col(col).cast("bigint"), f"CAST({col} AS BIGINT)")
    kind = rng.choice(["add", "sub", "mul", "mod", "case", "coalesce"])
    a_c, a_s = gen_int_expr(rng, depth - 1)
    b_c, b_s = gen_int_expr(rng, depth - 1)
    if kind in ("add", "sub", "mul"):
        op = {"add": "+", "sub": "-", "mul": "*"}[kind]
        c = {"add": a_c + b_c, "sub": a_c - b_c, "mul": a_c * b_c}[kind]
        return ((c % M), f"(({a_s} {op} {b_s}) % {M})")
    if kind == "mod":
        d = rng.randrange(2, 97)
        return (a_c % d, f"({a_s} % {d})")
    if kind == "case":
        t = rng.randrange(0, M)
        return (
            F.when(a_c < t, b_c).otherwise(a_c),
            f"(CASE WHEN {a_s} < {t} THEN {b_s} ELSE {a_s} END)",
        )
    v = rng.randrange(0, 1000)
    return (
        F.coalesce(F.nullif(a_c, F.lit(v).cast("bigint")), b_c),
        f"COALESCE(NULLIF({a_s}, {v}), {b_s})",
    )


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_scalar_expressions(spark, oracle_con, sf_dir, seed):
    """Random depth-3 integer expression trees (+, -, *, %, CASE, COALESCE/
    NULLIF) evaluated per lineitem row must agree bit-for-bit across engines
    — the scalar-compiler analogue of the reference's expression tests
    (its ASM ExpressionCompiler is replaced by Catalyst codegen; this pins
    the semantics the swap must preserve: % sign, CASE eval order,
    NULLIF/COALESCE null propagation)."""
    rng = random.Random(1000 + seed)
    col_expr, sql_expr = gen_int_expr(rng, 3)
    l = read_table(spark, sf_dir, "lineitem")
    s = (
        l.select("l_orderkey", "l_linenumber", col_expr.alias("e"))
        .toPandas()
        .sort_values(["l_orderkey", "l_linenumber"], ignore_index=True)
    )
    o = (
        oracle_con.execute(
            f"SELECT l_orderkey, l_linenumber, {sql_expr} AS e FROM lineitem"
        )
        .df()
        .sort_values(["l_orderkey", "l_linenumber"], ignore_index=True)
    )
    assert len(s) == len(o)
    se, oe = s["e"], o["e"]
    mism = [
        (i, a, b)
        for i, (a, b) in enumerate(zip(se, oe))
        if not (pd.isna(a) and pd.isna(b)) and a != b
    ]
    assert not mism, f"seed {seed}: {sql_expr}\nfirst mismatches: {mism[:3]}"

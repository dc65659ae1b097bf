#!/usr/bin/env python
"""Deterministic scale-up generator for the bench warehouse.

Purpose: SCALE VALIDATION (VERDICT r5 item 1) — produce an sf1-sized (or
larger) warehouse with the driver's exact schema so the full registry +
corpus can be re-benched at 10x+ data and per-query scaling factors
published. This data is NOT the driver's (seed-42) data and is never used
for correctness gating; distributions are sampled empirically from a source
SF dir (default /root/testdata/sf0.1) so plan shapes, selectivities and
join fan-outs carry over approximately.

Design:
- Fully deterministic: every random draw is xxhash64(id, tag) — no rand(),
  no Date.now; re-running reproduces the bytes.
- Distributed: generation is spark.range -> column algebra (JVM-side); no
  driver-side loops over data. Generating 100x (sf10) is the same plan.
- Numeric columns sample the source's empirical quantile sketch (101-point
  inverse CDF, linear interpolation); categoricals sample the source's
  exact frequency table; FKs are uniform over the scaled key ranges.
- documents embed a controlled duplicate structure (exact dups + one-word
  near-dups at source-like rates) so the dedup/LSH families scale
  linearly instead of degenerating.

Usage:
    python tools/datagen_scale.py --sf 1 [--out DIR] [--source DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F


def u01(*cols) -> F.Column:
    """Deterministic uniform [0,1) from the row's id + a tag."""
    h = F.xxhash64(*cols)
    return (F.pmod(h, F.lit(1_000_000_007))).cast("double") / 1_000_000_007.0


def from_quantiles(u: F.Column, qs: list[float]) -> F.Column:
    """Inverse-CDF sample: linear interpolation over a 101-point sketch."""
    arr = F.array(*[F.lit(float(q)) for q in qs])
    pos = u * 100.0
    lo = F.floor(pos).cast("int")
    frac = pos - lo
    a = F.element_at(arr, lo + 1)
    b = F.element_at(arr, F.least(lo + F.lit(2), F.lit(101)))
    return a + frac * (b - a)


def from_freqs(u: F.Column, pairs: list[tuple[str, int]]) -> F.Column:
    """Weighted categorical sample from an exact (value, count) table."""
    total = sum(n for _, n in pairs)
    expr = F.lit(pairs[-1][0])
    acc = 0.0
    branches = []
    for v, n in pairs[:-1]:
        acc += n / total
        branches.append((acc, v))
    for cum, v in reversed(branches):
        expr = F.when(u < cum, v).otherwise(expr)
    return expr


class SourceStats:
    """Empirical samplers read once from the source warehouse (tiny)."""

    def __init__(self, spark, source: str):
        self.spark = spark
        self.source = source

    def table(self, name: str) -> DataFrame:
        from skinnerdb_spark.catalog import read_table

        return read_table(self.spark, self.source, name)

    def quantiles(self, table: str, col: str) -> list[float]:
        row = (
            self.table(table)
            .agg(F.expr(f"percentile({col}, array({','.join(str(i / 100) for i in range(101))}))").alias("q"))
            .collect()[0]
        )
        return [float(x) for x in row["q"]]

    def freqs(self, table: str, col: str) -> list[tuple[str, int]]:
        rows = self.table(table).groupBy(col).count().orderBy(col).collect()
        return [(r[col], r["count"]) for r in rows]

    def count(self, table: str) -> int:
        return self.table(table).count()


def generate(spark, source: str, out: str, sf_mult: int) -> None:
    st = SourceStats(spark, source)
    os.makedirs(out, exist_ok=True)

    def write(df: DataFrame, name: str, n_files: int) -> None:
        path = os.path.join(out, f"{name}.parquet")
        df.repartition(n_files).write.mode("overwrite").parquet(path)
        print(f"  wrote {name} -> {path}")

    # region / nation: fixed small dims — copy verbatim
    for dim in ("region", "nation"):
        write(st.table(dim), dim, 1)

    n_cust = st.count("customer") * sf_mult
    n_supp = st.count("supplier") * sf_mult
    n_part = st.count("part") * sf_mult
    n_orders = st.count("orders") * sf_mult
    n_events = st.count("events") * sf_mult
    n_docs = st.count("documents") * sf_mult
    n_vecs = st.count("embeddings") * sf_mult

    # ---- customer ----
    cq = st.quantiles("customer", "c_acctbal")
    seg = st.freqs("customer", "c_mktsegment")
    c = spark.range(n_cust).select(
        (F.col("id") + 1).alias("c_custkey"),
        F.concat(F.lit("Customer#"), F.lpad((F.col("id") + 1).cast("string"), 9, "0")).alias("c_name"),
        F.pmod(F.xxhash64("id", F.lit("cnat")), F.lit(25)).cast("int").alias("c_nationkey"),
        from_quantiles(u01("id", F.lit("cbal")), cq).alias("c_acctbal"),
        from_freqs(u01("id", F.lit("cseg")), seg).alias("c_mktsegment"),
    )
    write(c, "customer", 4 * sf_mult)

    # ---- supplier ----
    sq = st.quantiles("supplier", "s_acctbal")
    s = spark.range(n_supp).select(
        (F.col("id") + 1).alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.lpad((F.col("id") + 1).cast("string"), 9, "0")).alias("s_name"),
        F.pmod(F.xxhash64("id", F.lit("snat")), F.lit(25)).cast("int").alias("s_nationkey"),
        from_quantiles(u01("id", F.lit("sbal")), sq).alias("s_acctbal"),
    )
    write(s, "supplier", 1)

    # ---- part ----
    pq_ = st.quantiles("part", "p_retailprice")
    brands = st.freqs("part", "p_brand")
    types = st.freqs("part", "p_type")
    sizes = st.freqs("part", "p_size")
    names = st.freqs("part", "p_name")
    p = spark.range(n_part).select(
        (F.col("id") + 1).alias("p_partkey"),
        from_freqs(u01("id", F.lit("pname")), names).alias("p_name"),
        from_freqs(u01("id", F.lit("pbrand")), brands).alias("p_brand"),
        from_freqs(u01("id", F.lit("ptype")), types).alias("p_type"),
        from_freqs(u01("id", F.lit("psize")), sizes).cast("int").alias("p_size"),
        from_quantiles(u01("id", F.lit("pprice")), pq_).alias("p_retailprice"),
    )
    write(p, "part", 4 * sf_mult)

    # ---- orders ----
    oq = st.quantiles("orders", "o_totalprice")
    status = st.freqs("orders", "o_orderstatus")
    prio = st.freqs("orders", "o_orderpriority")
    dmin, dmax = (
        st.table("orders").agg(F.min("o_orderdate"), F.max("o_orderdate")).collect()[0]
    )
    span_s = int((dmax - dmin).total_seconds())
    o = spark.range(n_orders).select(
        (F.col("id") + 1).alias("o_orderkey"),
        (F.pmod(F.xxhash64("id", F.lit("ocust")), F.lit(n_cust)) + 1).alias("o_custkey"),
        from_freqs(u01("id", F.lit("ostat")), status).alias("o_orderstatus"),
        from_quantiles(u01("id", F.lit("oprice")), oq).alias("o_totalprice"),
        (
            F.lit(dmin)
            + F.make_dt_interval(
                F.lit(0), F.lit(0), F.lit(0),
                # day-granular order dates, like the source
                (F.floor(u01("id", F.lit("odate")) * (span_s // 86400)) * 86400).cast("decimal(18,6)"),
            )
        ).alias("o_orderdate"),
        from_freqs(u01("id", F.lit("oprio")), prio).alias("o_orderpriority"),
    )
    write(o, "orders", 8 * sf_mult)

    # ---- lineitem: per-order fan-out 1..7 (source mean ~4.07) ----
    lq_qty = st.quantiles("lineitem", "l_quantity")
    lq_price = st.quantiles("lineitem", "l_extendedprice")
    lq_disc = st.quantiles("lineitem", "l_discount")
    lq_tax = st.quantiles("lineitem", "l_tax")
    rflag = st.freqs("lineitem", "l_returnflag")
    lstat = st.freqs("lineitem", "l_linestatus")
    smin, smax = (
        st.table("lineitem").agg(F.min("l_shipdate"), F.max("l_shipdate")).collect()[0]
    )
    sspan_d = int((smax - smin).total_seconds()) // 86400
    li = (
        spark.range(n_orders)
        .select(
            (F.col("id") + 1).alias("l_orderkey"),
            F.explode(
                F.sequence(F.lit(1), (F.pmod(F.xxhash64("id", F.lit("lfan")), F.lit(7)) + 1).cast("int"))
            ).alias("l_linenumber"),
        )
        .select(
            "l_orderkey",
            (F.pmod(F.xxhash64("l_orderkey", "l_linenumber", F.lit("lpart")), F.lit(n_part)) + 1).alias("l_partkey"),
            (F.pmod(F.xxhash64("l_orderkey", "l_linenumber", F.lit("lsupp")), F.lit(n_supp)) + 1).alias("l_suppkey"),
            "l_linenumber",
            from_quantiles(u01("l_orderkey", "l_linenumber", F.lit("lqty")), lq_qty).alias("l_quantity"),
            from_quantiles(u01("l_orderkey", "l_linenumber", F.lit("lprice")), lq_price).alias("l_extendedprice"),
            from_quantiles(u01("l_orderkey", "l_linenumber", F.lit("ldisc")), lq_disc).alias("l_discount"),
            from_quantiles(u01("l_orderkey", "l_linenumber", F.lit("ltax")), lq_tax).alias("l_tax"),
            from_freqs(u01("l_orderkey", "l_linenumber", F.lit("lrf")), rflag).alias("l_returnflag"),
            from_freqs(u01("l_orderkey", "l_linenumber", F.lit("lls")), lstat).alias("l_linestatus"),
            (
                F.lit(smin)
                + F.make_dt_interval(
                    F.lit(0), F.lit(0), F.lit(0),
                    (F.floor(u01("l_orderkey", "l_linenumber", F.lit("lship")) * sspan_d) * 86400).cast("decimal(18,6)"),
                )
            ).alias("l_shipdate"),
        )
    )
    write(li, "lineitem", 16 * sf_mult)

    # ---- events: same 30-day window, sf_mult x density ----
    etypes = st.freqs("events", "event_type")
    vq = st.quantiles("events", "value")
    n_users = st.table("events").select("user_id").distinct().count()
    tmin, tmax = st.table("events").agg(F.min("ts"), F.max("ts")).collect()[0]
    tspan = int((tmax - tmin).total_seconds())
    e = spark.range(n_events).select(
        (F.col("id") + 1).alias("event_id"),
        (
            F.lit(tmin)
            + F.make_dt_interval(
                F.lit(0), F.lit(0), F.lit(0),
                (u01("id", F.lit("ets")) * tspan).cast("decimal(18,6)"),
            )
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit("euser")), F.lit(n_users * sf_mult)).alias("user_id"),
        from_freqs(u01("id", F.lit("etype")), etypes).alias("event_type"),
        F.round(from_quantiles(u01("id", F.lit("eval")), vq), 2).alias("value"),
        F.concat(F.lit('{"k": '), F.pmod(F.xxhash64("id", F.lit("ek")), F.lit(100)).cast("string"), F.lit("}")).alias("props"),
    )
    write(e, "events", 8 * sf_mult)

    # ---- documents: source vocab, empirical lengths, seeded dup structure ----
    langs = st.freqs("documents", "lang")
    sources = st.freqs("documents", "source")
    lenq = st.quantiles(
        "documents", "len(string_split(text, ' '))".replace("string_split", "split")
        if False else "size(split(text, ' '))"
    )
    vocab_rows = (
        st.table("documents")
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w").count().orderBy(F.desc("count"), "w")
        .collect()
    )
    # 1024-slot alias table proportional to source word frequencies
    total_w = sum(r["count"] for r in vocab_rows)
    slots: list[str] = []
    for r in vocab_rows:
        k = max(1, round(1024 * r["count"] / total_w))
        slots.extend([r["w"]] * k)
    slots = slots[:1024] or ["word"]
    vocab_arr = F.array(*[F.lit(w) for w in slots])
    nslots = len(slots)

    # seed for word choice AND length: exact dups reuse the PREVIOUS doc's
    # stream wholesale (every 500th doc); near-dups reuse it but perturb
    # word 1 (every 200th) — both need the seed doc's length or the copy
    # truncates and stops being a duplicate
    is_exact0 = F.col("id") % 500 == 499
    is_near0 = (F.col("id") % 200 == 199) & ~is_exact0
    seed0 = F.when(is_exact0 | is_near0, F.col("id") - 1).otherwise(F.col("id"))
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        seed0.alias("seed_doc"),
        is_near0.alias("is_near"),
        F.floor(from_quantiles(u01(seed0, F.lit("dlen")), lenq)).cast("int").alias("n_words"),
        from_freqs(u01("id", F.lit("dlang")), langs).alias("lang"),
        from_freqs(u01("id", F.lit("dsrc")), sources).alias("source"),
    )
    docs = base.select(
        "doc_id",
        "lang",
        "source",
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.col("n_words"), F.lit(3))),
                lambda i: F.when(
                    F.col("is_near") & (i == 1), F.lit("perturbed")
                ).otherwise(
                    F.element_at(
                        vocab_arr,
                        (F.pmod(F.xxhash64(F.col("seed_doc"), i, F.lit("dword")), F.lit(nslots)) + 1).cast("int"),
                    )
                ),
            ),
        ).alias("text"),
    ).select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
    )
    write(docs, "documents", 4 * sf_mult)

    # ---- embeddings: 64-dim deterministic uniforms in [-1, 1] ----
    dim = st.table("embeddings").select(F.size("embedding").alias("d")).first()["d"]
    labels = st.freqs("embeddings", "label")
    emb = spark.range(n_vecs).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: (u01("id", i, F.lit("edim")) * 2.0 - 1.0).cast("float"),
        ).alias("embedding"),
        from_freqs(u01("id", F.lit("elabel")), labels).cast("int").alias("label"),
    )
    write(emb, "embeddings", 2 * sf_mult)


def generate_documents_realvocab(
    spark, source: str, out: str, sf_mult: int, vocab_size: int = 200_000
) -> None:
    """Documents-only variant with a REALISTIC (Zipf-shaped) vocabulary.

    The default corpus samples words from a 1024-slot alias table of the
    tiny source vocabulary, which makes every 3-shingle common across many
    documents — per-shingle density real corpora do not have, and exactly
    the regime where prefix-filter joins (Σ bucket²) degenerate (VERDICT r7
    item 1: dedup_prefix_filter's 100x point was excluded, not measured,
    because the dense-vocab synthetic misrepresents the workload the
    operator claims). Here word ranks are drawn log-uniformly over a
    ``vocab_size`` vocabulary — P(rank) ∝ 1/rank, the Zipf s=1 law real
    text follows — so a few words are very common and the long tail is
    rare, making most shingles near-unique: the sparsity the rarity-prefix
    exploits. The duplicate seeding (exact dup every 500th doc, one-word
    near-dup every 200th) and empirical length distribution are identical
    to :func:`generate`, so dedup semantics are comparable.
    """
    st = SourceStats(spark, source)
    os.makedirs(out, exist_ok=True)
    n_docs = st.count("documents") * sf_mult
    langs = st.freqs("documents", "lang")
    sources = st.freqs("documents", "source")
    lenq = st.quantiles("documents", "size(split(text, ' '))")

    is_exact0 = F.col("id") % 500 == 499
    is_near0 = (F.col("id") % 200 == 199) & ~is_exact0
    seed0 = F.when(is_exact0 | is_near0, F.col("id") - 1).otherwise(F.col("id"))
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        seed0.alias("seed_doc"),
        is_near0.alias("is_near"),
        F.floor(from_quantiles(u01(seed0, F.lit("dlen")), lenq)).cast("int").alias("n_words"),
        from_freqs(u01("id", F.lit("dlang")), langs).alias("lang"),
        from_freqs(u01("id", F.lit("dsrc")), sources).alias("source"),
    )
    import math

    lnv = math.log(float(vocab_size))
    # log-uniform rank draw: rank = floor(exp(u * ln V)) in [1, V),
    # P(rank = r) ~ 1/(r ln V) — truncated Zipf s=1
    docs = base.select(
        "doc_id",
        "lang",
        "source",
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.col("n_words"), F.lit(3))),
                lambda i: F.when(
                    F.col("is_near") & (i == 1), F.lit("perturbed")
                ).otherwise(
                    F.concat(
                        F.lit("w"),
                        F.floor(
                            F.exp(u01(F.col("seed_doc"), i, F.lit("dwordz")) * lnv)
                        ).cast("bigint").cast("string"),
                    )
                ),
            ),
        ).alias("text"),
    ).select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
    )
    path = os.path.join(out, "documents.parquet")
    docs.repartition(4 * sf_mult).write.mode("overwrite").parquet(path)
    print(f"  wrote documents (realvocab, V={vocab_size}) -> {path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=int, default=1, help="target SF (x10 of sf0.1 per unit)")
    ap.add_argument("--source", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--realvocab-docs",
        action="store_true",
        help="write ONLY a documents table with a Zipf-shaped vocabulary "
        "(realistic shingle sparsity) to OUT (default .scale_data/sf{SF}rv)",
    )
    ap.add_argument("--vocab-size", type=int, default=200_000)
    args = ap.parse_args()
    mult = args.sf * 10  # source is sf0.1
    suffix = f"sf{args.sf}rv" if args.realvocab_docs else f"sf{args.sf}"
    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_data", suffix,
    )
    from skinnerdb_spark.session import get_spark

    spark = get_spark(app_name="skinnerdb-datagen-scale")
    if args.realvocab_docs:
        print(f"generating realvocab documents sf{args.sf} ({mult}x) -> {out}")
        generate_documents_realvocab(spark, args.source, out, mult, args.vocab_size)
    else:
        print(f"generating sf{args.sf} ({mult}x {args.source}) -> {out}")
        generate(spark, args.source, out, mult)
    spark.stop()


if __name__ == "__main__":
    main()

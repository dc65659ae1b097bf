"""Spectral analysis over embeddings: linear algebra as relational algebra.

Principal-direction extraction (power iteration on the centered second-moment
matrix) with the engine's cross-engine-exactness recipe: the corpus-wide
moment aggregation is decimal-exact (order-independent), every scalar step is
the same IEEE-double expression shape on identical inputs, and the
normalization between iterations is max-abs (exact under IEEE; sqrt/libm is
never used, it is not bit-reproducible across engines).

Scale story: the ONLY corpus-sized work is building the DIM x DIM moment
matrix — one outer-product explode with map-side partial aggregation into
DIM^2 groups (the classic distributed covariance). The iterations then run on
that 4096-row frame with a broadcast 64-row vector: at 100 TB the eigensolve
costs the same as at 1 GB.

Corpus-sized moment sums use the kmeans int64-quantization recipe (r7 —
replaced the original DECIMAL(28,12) sums, which don't vectorize in codegen
and dominated the entry's wall time): every component is quantized ONCE at
1e-6 by the identical ROUND(x*1e6, 0) expression in both engines, so each
moment is an EXACT, associative int64 sum of int64 products. Overflow bound:
|q| <= ~6e5 here, so per-pair products are <= ~3.4e11 and the sum stays
inside int64 up to ~2.7e7 vectors per (i,j) cell — beyond that, split
hi/lo-word sums (documented, not needed at tested scales). The int64->double
conversion and the /1e12, /n divisions are correctly rounded identically in
both engines at ANY magnitude, so cross-engine exactness never degrades even
past 2^53. The matrix is normalized to covariance scale (s/n) before
iteration so per-entry magnitudes stay O(component variance) at ANY corpus
size; the tiny DIM^2-row iteration stages keep the original decimal rounds.

Reference analogue: none — the reference engine has no linear algebra; this
extends the surface for embedding QA / dimensionality diagnostics (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skinnerdb_spark.queries.util import read_table
from skinnerdb_spark.registry import register

DIM = 64
POWER_ITERS = 3

def _power_oracle() -> str:
    body = f"""
    WITH x AS (
        SELECT vec_id, CAST(g.i AS BIGINT) AS i,
               CAST(ROUND(CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) * 1e6,
                          0) AS BIGINT) AS xq
        FROM embeddings CROSS JOIN generate_series(1, {DIM}) g(i)),
    nrow AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
    mu AS (SELECT i, CAST(SUM(xq) AS DOUBLE) / 1e6 / (SELECT n FROM nrow) AS m
           FROM x GROUP BY i),
    s2 AS (SELECT a.i AS i, b.i AS j,
                  CAST(SUM(a.xq * b.xq) AS DOUBLE) / 1e12 AS s
           FROM x a JOIN x b USING (vec_id) GROUP BY a.i, b.i),
    c AS (SELECT s2.i, s2.j,
                 s2.s / (SELECT n FROM nrow) - mi.m * mj.m AS cv
          FROM s2 JOIN mu mi ON mi.i = s2.i JOIN mu mj ON mj.i = s2.j),
    v0 AS (SELECT CAST(g.i AS BIGINT) AS j, CAST(1.0 AS DOUBLE) AS v
           FROM generate_series(1, {DIM}) g(i))"""
    prev = "v0"
    for k in range(1, POWER_ITERS + 1):
        body += f""",
    w{k} AS (SELECT c.i AS j,
                    CAST(ROUND(SUM(CAST(c.cv * v.v AS DECIMAL(28,12))), 6)
                         AS DOUBLE) AS w
             FROM c JOIN {prev} v ON v.j = c.j GROUP BY c.i),
    v{k} AS (SELECT j, w / (SELECT MAX(ABS(w)) FROM w{k}) AS v FROM w{k})"""
        prev = f"v{k}"
    body += f"""
    SELECT j AS pos, v AS loading FROM {prev}
    """
    return body


@register(
    "embed_power_iteration",
    _power_oracle(),
    tags=("similarity", "pipeline", "iterative", "spectral"),
)
def embed_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Principal direction of the embedding cloud: {POWER_ITERS} power
    iterations on the centered second-moment matrix C = X'X - n*mu*mu',
    max-abs-normalized between iterations, returning the 64-row loading
    vector (pos, loading) — the one-pass PCA diagnostic a pipeline uses to
    detect collapsed/anisotropic embedding spaces before ANN indexing.

    Plan shape (r7 restructure — one corpus pass, measured 4.3 s -> ~1 s warm
    at sf0.1): every row emits the upper triangle of its AUGMENTED outer
    product [1; q][1; q]' — cell (0,0) counts rows, cells (i,0) sum the
    quantized components, cells (i,j>=i) sum the products — so n, mu, and
    X'X all come out of ONE explode + ONE map-side-combined aggregate into
    DIM*(DIM+2)/2+1 groups (the classic augmented-moment-matrix trick; the
    corpus never shuffles at all). Components are quantized ONCE to exact
    int64 at 1e-6 (the kmeans _Q recipe), so the corpus-sized sums are
    primitive-long — vectorized in codegen, exact, associative — not 128-bit
    decimal. The 65 count/mean cells (BOUNDED: DIM+1 rows, the ivf.py
    bounded-collect precedent) fold into the centering as double literals —
    computed with the identical IEEE ops the oracle uses, so bit-equality
    holds. Each iteration is then a broadcast join of the 64-row vector
    against the eagerly-materialized 4096-row matrix (lineage cut per round:
    without it the plan doubles per iteration — the embed_kmeans pattern).
    No libm (normalization is max-abs, not L2), so every value is
    bit-identical to the DuckDB oracle's unrolled CTEs."""
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # fan_out: a small parquet scan arrives on 1-2 partitions — spread the
    # CPU-heavy outer product across cores (size-conditional no-op at scale).
    from skinnerdb_spark.operators.textprims import fan_out

    aug = fan_out(e).select(
        F.expr(
            "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT))"
        ).alias("q")
    ).select(
        F.explode(
            F.expr(
                "concat("
                "flatten(transform(sequence(1, size(q)), i -> "
                "transform(sequence(i, size(q)), j -> named_struct("
                "'i', CAST(i AS BIGINT), 'j', CAST(j AS BIGINT), "
                "'p', element_at(q, i) * element_at(q, j))))), "
                "transform(sequence(1, size(q)), i -> named_struct("
                "'i', CAST(i AS BIGINT), 'j', CAST(0 AS BIGINT), "
                "'p', element_at(q, i))), "
                "array(named_struct('i', CAST(0 AS BIGINT), "
                "'j', CAST(0 AS BIGINT), 'p', CAST(1 AS BIGINT))))"
            )
        ).alias("t")
    ).select("t.i", "t.j", F.col("t.p").alias("pq"))
    # the single corpus-sized aggregate; materialized once (the iterations
    # below must not re-execute the corpus pipeline)
    a = (
        aug.groupBy("i", "j")
        .agg(F.sum("pq").cast("bigint").alias("sp"))
        .localCheckpoint(eager=True)
    )
    # n and the component sums: DIM+1 bounded rows -> driver; mean doubles
    # via the SAME IEEE expression shape as the oracle (sum/1e6/n)
    stats = {(r.i, r.j): r.sp for r in a.filter(F.col("j") == 0).collect()}
    n = stats[(0, 0)]
    m = {i: float(stats[(i, 0)]) / 1e6 / float(n) for i in range(1, DIM + 1)}
    m_arr = F.array(*[F.lit(m[i]) for i in range(1, DIM + 1)])
    tri = a.filter(F.col("j") >= 1).select(
        "i", "j", (F.col("sp").cast("double") / F.lit(1e12)).alias("s")
    )
    s2 = tri.unionAll(
        tri.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "s"
        )
    )
    c = s2.select(
        "i",
        "j",
        (
            F.col("s") / F.lit(n)
            - F.element_at(m_arr, F.col("i").cast("int"))
            * F.element_at(m_arr, F.col("j").cast("int"))
        ).alias("cv"),
    ).localCheckpoint(eager=True)
    spark_dim = spark.range(1, DIM + 1).select(
        F.col("id").cast("bigint").alias("j"), F.lit(1.0).alias("v")
    )
    v = spark_dim
    for _ in range(POWER_ITERS):
        w = (
            c.join(F.broadcast(v), "j")
            .groupBy(F.col("i").alias("j"))
            .agg(
                F.expr(
                    "CAST(ROUND(SUM(CAST(cv * v AS DECIMAL(28,12))), 6) AS DOUBLE)"
                ).alias("w")
            )
            # 64 rows, consumed by BOTH mx and the next v — cut the branch
            .localCheckpoint(eager=True)
        )
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("mx"))
        v = w.join(F.broadcast(mx)).select("j", (F.col("w") / F.col("mx")).alias("v"))
    return v.select(F.col("j").alias("pos"), F.col("v").alias("loading"))

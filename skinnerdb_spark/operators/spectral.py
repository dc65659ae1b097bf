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

Moment sums are re-rounded to scale 6 (ROUND on BOTH engines — DuckDB's bare
downscale cast truncates — then cast): a decimal whose scaled integer exceeds
2^53 double-rounds differently in DuckDB's decimal->double conversion, and
corpus-sized second-moment sums cross that line around n ~ 1e3 at scale 12.
Scale 6 keeps the scaled integer under 2^53 up to ~9e9-magnitude sums (the
same trade stats_linear_fit makes with its scale-2 second moments), and the
matrix is normalized to covariance scale (s/n) before iteration so per-entry
magnitudes stay O(component variance) at ANY corpus size.

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

#: one component value, rounded once into decimal space (the dot_exact cast)
_DEC = "CAST(CAST({x} AS DOUBLE) AS DECIMAL(28,12))"


def _power_oracle() -> str:
    body = f"""
    WITH x AS (
        SELECT vec_id, CAST(g.i AS BIGINT) AS i,
               CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) AS xi
        FROM embeddings CROSS JOIN generate_series(1, {DIM}) g(i)),
    nrow AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
    mu AS (SELECT i, CAST(ROUND(SUM(CAST(xi AS DECIMAL(28,12))), 6) AS DOUBLE)
                      / (SELECT n FROM nrow) AS m
           FROM x GROUP BY i),
    s2 AS (SELECT a.i AS i, b.i AS j,
                  CAST(ROUND(SUM(CAST(a.xi * b.xi AS DECIMAL(28,12))), 6)
                       AS DOUBLE) AS s
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

    Plan shape: one outer-product explode of the corpus with MAP-SIDE
    partial aggregation into DIM^2 = {DIM}*{DIM} groups builds C (the only
    corpus-sized stage, decimal-exact and order-independent); each iteration
    is then a broadcast join of the 64-row vector against the 4096-row
    matrix + a 64-group aggregate. Nothing ever reaches the driver; no libm
    (normalization is max-abs, not L2), so every value is bit-identical to
    the DuckDB oracle's unrolled CTEs."""
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n1 = e.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # long form (vec_id, i, xi), 1-based to match the oracle's list indexing
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("i0", "xf")
    ).select(
        "vec_id",
        (F.col("i0") + 1).cast("bigint").alias("i"),
        F.col("xf").cast("double").alias("xi"),
    )
    mu = (
        x.groupBy("i")
        .agg(
            F.expr(
                f"CAST(ROUND(SUM({_DEC.format(x='xi')}), 6) AS DOUBLE)"
            ).alias("ms")
        )
        .join(F.broadcast(n1))
        .select("i", (F.col("ms") / F.col("n")).alias("m"))
    )
    # second moments via an IN-ROW outer product: each vector emits its
    # upper-triangle (i <= j) products directly (symmetry halves the work;
    # the strict-lower half is mirrored after aggregation — identical
    # decimal sums by commutativity, so the mirror is hash-exact). No
    # self-join, so the corpus never shuffles at all: scan -> explode ->
    # map-side partial aggregate into DIM*(DIM+1)/2 groups -> tiny exchange.
    # Products stay DOUBLE inside the nested lambdas (the transform-lambda
    # codegen dropout documented in similarity.py) and are rounded into
    # decimal ONCE at projection top level, right before the aggregate.
    # fan_out: a small parquet scan arrives on 1-2 partitions — spread the
    # CPU-heavy outer product across cores (size-conditional no-op at scale).
    from skinnerdb_spark.operators.textprims import fan_out

    prods = fan_out(e).select(
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, size(embedding)), i -> "
                "transform(sequence(i, size(embedding)), j -> named_struct("
                "'i', CAST(i AS BIGINT), 'j', CAST(j AS BIGINT), "
                "'p', CAST(element_at(embedding, i) AS DOUBLE)"
                " * CAST(element_at(embedding, j) AS DOUBLE)))))"
            )
        ).alias("t")
    ).select("t.i", "t.j", F.expr("CAST(t.p AS DECIMAL(28,12))").alias("pd"))
    tri = prods.groupBy("i", "j").agg(
        F.expr("CAST(ROUND(SUM(pd), 6) AS DOUBLE)").alias("s")
    )
    s2 = tri.unionAll(
        tri.filter(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "s"
        )
    )
    mi = mu.select(F.col("i"), F.col("m").alias("mi"))
    mj = mu.select(F.col("i").alias("j"), F.col("m").alias("mj"))
    c = (
        s2.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .join(F.broadcast(n1))
        .select(
            "i",
            "j",
            (F.col("s") / F.col("n") - F.col("mi") * F.col("mj")).alias("cv"),
        )
    )
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
        )
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("mx"))
        v = w.join(F.broadcast(mx)).select("j", (F.col("w") / F.col("mx")).alias("v"))
    return v.select(F.col("j").alias("pos"), F.col("v").alias("loading"))

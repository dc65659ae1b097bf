"""Spectral analysis over embeddings: linear algebra as relational algebra.

Principal-direction extraction (power iteration on the centered second-moment
matrix) with the engine's cross-engine-exactness recipe: the corpus-wide
moment aggregation is decimal-exact (order-independent), every scalar step is
the same IEEE-double expression shape on identical inputs, and the
normalization between iterations is max-abs (exact under IEEE; sqrt/libm is
never used, it is not bit-reproducible across engines).

Scale story: the ONLY corpus-sized work is building the DIM x DIM moment
matrix — per-task int64 numpy accumulation (G += Q'Q) emitting one fixed-size
partial triangle per task, merged by one DIM^2-group aggregate (the classic
distributed covariance, with the map-side combine vectorized). The iterations
then run on that 4096-row frame with a broadcast 64-row vector: at 100 TB the
eigensolve costs the same as at 1 GB.

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


def _aug_moments_np(it):
    """Per-partition augmented moment accumulation (Arrow batches -> one
    partial-triangle frame per task): G += Q'Q in exact int64 via one numpy
    matmul per batch, plus component sums and the row count. Emits
    DIM*(DIM+1)/2 + DIM + 1 rows per task regardless of input size — the
    map-side combine, done in a vectorized kernel instead of a
    2145-struct-per-row explode (guide §4: the boundary crosses only the
    (qa) column in and the fixed-size triangle out)."""
    import numpy as np
    import pandas as pd

    tot = None
    s1 = None
    n = 0
    for pdf in it:
        q = np.stack(pdf["qa"].to_numpy()).astype(np.int64)
        g = q.T @ q  # DIM x DIM, exact int64 (|q| <= ~6e5: see module note)
        tot = g if tot is None else tot + g
        s1 = q.sum(axis=0) if s1 is None else s1 + q.sum(axis=0)
        n += len(pdf)
    if tot is None:
        return
    dim = tot.shape[0]
    iu, ju = np.triu_indices(dim)
    yield pd.DataFrame(
        {
            "i": np.concatenate([iu + 1, np.arange(1, dim + 1), [0]]),
            "j": np.concatenate([ju + 1, np.zeros(dim, dtype=np.int64), [0]]),
            "sp": np.concatenate([tot[iu, ju], s1, [n]]),
        }
    )

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

    Plan shape (r11 restructure — the r7 augmented-outer-product explode
    emitted DIM*(DIM+2)/2+1 = 2145 struct rows PER VECTOR before the
    aggregate; replacing that row blowup with a per-task numpy matmul
    measured 13.1 -> 3.4 s at sf10): each Arrow task accumulates G += Q'Q
    in exact int64 (`_aug_moments_np`) and emits ONE fixed-size partial
    triangle — cell (0,0) counts rows, cells (i,0) sum the quantized
    components, cells (i,j>=i) sum the products — so n, mu, and X'X still
    come out of one corpus pass, with the map-side combine done in the
    vectorized kernel and the only shuffle the DIM^2-group merge of
    per-task partials. Components are quantized ONCE to exact int64 at 1e-6
    (the kmeans _Q recipe) JVM-side before the boundary, so the partial
    sums are primitive-long — exact, associative — and int64 matmul in
    numpy computes the identical values the SQL explode did (pinned by
    tests). The 65 count/mean cells (BOUNDED: DIM+1 rows, the ivf.py
    bounded-collect precedent) fold into the centering as double literals —
    computed with the identical IEEE ops the oracle uses, so bit-equality
    holds. Each iteration is then a broadcast join of the 64-row vector
    against the eagerly-materialized 4096-row matrix (lineage cut per round:
    without it the plan doubles per iteration — the embed_kmeans pattern).
    No libm (normalization is max-abs, not L2), so every value is
    bit-identical to the DuckDB oracle's unrolled CTEs."""
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # fan_out: a small parquet scan arrives on 1-2 partitions — spread the
    # CPU-heavy moment matmul across cores (size-conditional no-op at scale).
    from skinnerdb_spark.operators.textprims import fan_out

    qa = fan_out(e).select(
        F.expr(
            "transform(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1e6, 0) AS BIGINT))"
        ).alias("qa")
    )
    part = qa.mapInPandas(_aug_moments_np, "i bigint, j bigint, sp bigint")
    # the single corpus-sized aggregate (now over per-task partials);
    # materialized once (the iterations below must not re-execute the
    # corpus pipeline)
    a = (
        part.groupBy("i", "j")
        .agg(F.sum("sp").cast("bigint").alias("sp"))
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

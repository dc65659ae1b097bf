"""Distributed k-means over the embeddings table (beyond-reference tier).

The IVF family (operators/ivf.py) trains its centroids on a BOUNDED sample
collected to the driver — the right call for index building, but it leaves
the engine without a fully distributed clustering primitive. This module is
that primitive: Lloyd's algorithm where every step is relational algebra —
assignment is a broadcast join + argmin aggregate, the centroid update is a
posexplode + per-(cell, dim) partial aggregate — so the SAME plan that runs
at sf0.01 runs on a 1000-executor cluster with no driver-side matrix at all.

Cross-engine exactness (the graph_pagerank recipe, analytics.py):
  - every per-element product/value is rounded ONCE into DECIMAL(28,12)
    (identical double->decimal cast on both engines — the dot_exact
    precedent, hash-green since round 4),
  - sums of those decimals are exact and associative, so Spark's partial
    aggregation tree and DuckDB's serial SUM agree bitwise,
  - the only scalar float steps (centroid mean = decimal-sum cast to DOUBLE
    divided by the member count) are the same IEEE expression shape on
    identical inputs.
Assignment therefore needs NO floating comparisons: the argmin key
(||c||^2 - 2*x.c) stays in decimal space end to end.

Reference analogue: none — the reference engine (SkinnerDB) has no
clustering; this extends its surface for training-data curation (SURVEY §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skinnerdb_spark.queries.util import read_table
from skinnerdb_spark.registry import register

#: number of clusters; centroids are seeded from vec_id 0..K-1 (deterministic,
#: no RNG — the bench/testdata embeddings are shuffled at generation time).
KMEANS_K = 8
#: full (assign, update) rounds before the final assignment.
KMEANS_ITERS = 2
DIM = 64

#: decimal dot product of two array expressions (elements float/double).
#: Stays DECIMAL — no trailing double cast — so argmin keys compare exactly.
def _dot_dec(a: str, b: str) -> str:
    return (
        f"CAST(aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,12))), "
        f"CAST(0 AS DECIMAL(30,12)), (acc, v) -> CAST(acc + v AS DECIMAL(30,12)))"
        f" AS DECIMAL(30,12))"
    )


#: DuckDB mirror (1-based list indexing, lateral sum over generate_series).
def _oracle_dot_dec(a: str, b: str) -> str:
    return (
        f"(SELECT CAST(SUM(CAST(CAST({a}[g.i] AS DOUBLE) * CAST({b}[g.i] AS DOUBLE)"
        f" AS DECIMAL(28,12))) AS DECIMAL(30,12))"
        f" FROM generate_series(1, {DIM}) g(i))"
    )


def _init_centroids(e: DataFrame) -> DataFrame:
    """(cell, carr): seed centroids = the first K vectors, as double arrays."""
    return e.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cell"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("carr"),
    )


def _assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cell, score): nearest centroid per vector, ties -> lowest cell.

    score = ||c||^2 - 2*x.c (the vector's own norm is argmin-invariant), in
    decimal. The centroid table is K rows — an explicit broadcast — so the
    "join" is map-side: |rows| * K in-row dot products, then one argmin
    aggregate keyed on vec_id. No shuffle of the embeddings themselves.
    """
    score = f"CAST({_dot_dec('carr', 'carr')} - 2 * {_dot_dec('embedding', 'carr')} AS DECIMAL(32,12))"
    scored = e.join(F.broadcast(cents)).select(
        "vec_id", "cell", F.expr(score).alias("score")
    )
    return scored.groupBy("vec_id").agg(
        F.min(F.struct("score", "cell")).alias("m")
    ).select("vec_id", F.col("m.cell").alias("cell"), F.col("m.score").alias("score"))


def _update(e: DataFrame, asn: DataFrame, prev: DataFrame) -> DataFrame:
    """New (cell, carr): per-dimension member means. The explode never leaves
    the mapper (partial aggregation on (cell, pos) before the K*DIM-row
    shuffle); empty cells keep their previous centroid (deterministic at any
    scale, even though the seed-from-data init makes them rare)."""
    m = asn.join(e, "vec_id").select(
        "cell", F.posexplode("embedding").alias("pos", "v")
    )
    comp = m.groupBy("cell", "pos").agg(
        (
            F.sum(F.expr("CAST(CAST(v AS DOUBLE) AS DECIMAL(28,12))")).cast("double")
            / F.count(F.lit(1))
        ).alias("cv")
    )
    arrs = comp.groupBy("cell").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, cv))), s -> s.cv)").alias(
            "new_carr"
        )
    )
    return prev.join(arrs, "cell", "left").select(
        "cell", F.coalesce("new_carr", "carr").alias("carr")
    )


def _kmeans_oracle() -> str:
    k, dim = KMEANS_K, DIM
    body = f"""
    WITH emb AS (SELECT vec_id, embedding FROM embeddings),
    c0 AS (SELECT vec_id AS cell,
                  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS carr
           FROM embeddings WHERE vec_id < {k})"""
    prev = "c0"
    for i in range(1, KMEANS_ITERS + 1):
        body += f""",
    s{i} AS (SELECT e.vec_id, c.cell,
               CAST({_oracle_dot_dec('c.carr', 'c.carr')}
                    - 2 * {_oracle_dot_dec('e.embedding', 'c.carr')}
                    AS DECIMAL(32,12)) AS score
             FROM emb e CROSS JOIN {prev} c),
    a{i} AS (SELECT vec_id, cell FROM (
               SELECT vec_id, cell,
                      ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY score, cell) AS rn
               FROM s{i}) WHERE rn = 1),
    u{i} AS (SELECT a.cell, g.i AS pos,
               CAST(SUM(CAST(CAST(e.embedding[g.i] AS DOUBLE)
                             AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS cv
             FROM a{i} a JOIN emb e USING (vec_id)
             CROSS JOIN generate_series(1, {dim}) g(i)
             GROUP BY a.cell, g.i),
    n{i} AS (SELECT cell, list(cv ORDER BY pos) AS carr
             FROM u{i} GROUP BY cell),
    c{i} AS (SELECT p.cell, COALESCE(n{i}.carr, p.carr) AS carr
             FROM {prev} p LEFT JOIN n{i} USING (cell))"""
        prev = f"c{i}"
    f = KMEANS_ITERS + 1
    body += f""",
    sf AS (SELECT e.vec_id, c.cell,
             CAST({_oracle_dot_dec('c.carr', 'c.carr')}
                  - 2 * {_oracle_dot_dec('e.embedding', 'c.carr')}
                  AS DECIMAL(32,12)) AS score,
             {_oracle_dot_dec('e.embedding', 'e.embedding')} AS xn
           FROM emb e CROSS JOIN {prev} c)
    SELECT vec_id, cell, CAST(xn + score AS DOUBLE) AS dist2
    FROM (SELECT vec_id, cell, score, xn,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY score, cell) AS rn
          FROM sf) WHERE rn = 1
    """
    return body


@register(
    "embed_kmeans",
    _kmeans_oracle(),
    tags=("similarity", "pipeline", "iterative", "clustering"),
)
def embed_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fully distributed Lloyd's k-means: {KMEANS_ITERS} (assign, update)
    rounds from a deterministic seed, then the final assignment
    (vec_id, cell, dist2) — dist2 the exact squared Euclidean distance to
    the final centroid (decimal dot algebra, cast to double once at the end).

    Scale shape per iteration: ONE broadcast of the K x DIM centroid table
    (a few KB), |rows| * K map-side decimal dots + an argmin aggregate, and
    ONE (cell, pos)-keyed partial aggregate for the update (K * DIM rows out
    of the shuffle). Nothing is collected to the driver — contrast with
    operators/ivf.py's bounded-sample train, which is the INDEX-build path;
    this is the model-training path a 100 TB curation pipeline runs.
    The fixed {KMEANS_ITERS}-round loop stays fully LAZY — one end-to-end
    plan, every round's cost billed to this query's own execution; only
    iteration-count-unbounded loops like dedup_clusters need the
    localCheckpoint lineage cut. The DuckDB oracle unrolls the same rounds
    as CTEs — feasible at test scale only, which is the point of the
    distributed path."""
    e = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = _init_centroids(e)
    for _ in range(KMEANS_ITERS):
        asn = _assign(e, cents).select("vec_id", "cell")
        cents = _update(e, asn, cents)
    final = _assign(e, cents)
    xn = _dot_dec("embedding", "embedding")
    return final.join(e, "vec_id").select(
        "vec_id",
        "cell",
        F.expr(f"CAST({xn} + score AS DOUBLE)").alias("dist2"),
    )

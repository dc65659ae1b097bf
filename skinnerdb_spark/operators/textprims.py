"""Portable text primitives shared by the text/dedup operators.

Everything here is engineered to produce *bit-identical* results in Spark and
in the DuckDB oracle:

- tokenization: literal single-space split (same semantics in both engines;
  the synthetic documents are single-space separated).
- hashing: md5 hex strings only. Both engines implement RFC-1321 md5 over
  UTF-8 and print lowercase hex, so MIN() over hex strings (lexicographic,
  ASCII) and substring tricks are portable. Engine-native hash() functions
  are NOT portable (Spark xxhash/murmur vs DuckDB) and are never used in
  oracle-checked paths.
- word-shingles: contiguous k-grams built with 1-based element indexing
  (Spark element_at == DuckDB list[i]).

Scale notes: all of this is built-in-function column algebra — JVM-side,
whole-stage-codegen'd, no Python UDFs — so it distributes trivially; the only
shuffles are the explicit groupBys in the operators that use these.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: words column expression (array<string>) from a text column name
def words(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


#: conf key: estimated bytes of input per core above which fan_out is a no-op
FAN_OUT_BYTES_PER_CORE = "skinnerdb.fanout.bytesPerCore"
_FAN_OUT_DEFAULT = 32 * 1024 * 1024
#: conf key: 'auto' (stats-conditional, default) | 'always' | 'never'.
#: The explicit override for environments where the stats probe is wrong or
#: unavailable: under Spark Connect ``df._jdf`` does not exist, so 'auto'
#: degrades to ALWAYS repartitioning (safe on small inputs, a gratuitous
#: full-corpus shuffle at real scale — set 'never' there); conversely a plan
#: with no reliable stats can report a huge sizeInBytes and wrongly skip the
#: fan-out for a small input — set 'always' to force it.
FAN_OUT_MODE = "skinnerdb.fanout.mode"


def fan_out(df):
    """Repartition to cluster parallelism before CPU-heavy per-row hash folds
    — but ONLY when the input is too small to already occupy the cluster.

    A small parquet file scans as 1-2 partitions, which would serialize the
    hash folds onto one core; the round-robin shuffle is then one cheap pass
    over data that is about to be hash-folded anyway. At real scale the scan
    is already wide and the same call must NOT inject a gratuitous full
    shuffle of the corpus, so the helper is size-conditional: when the
    optimizer's size estimate says the input already carries >=
    ``skinnerdb.fanout.bytesPerCore`` (default 32 MiB) per core — i.e. the
    natural scan partitioning feeds every core — the input is returned
    unchanged. Stats come from the optimized logical plan (no job runs).

    The stats probe uses the classic-mode ``df._jdf`` handle. Where that is
    unavailable (Spark Connect) or untrustworthy, ``skinnerdb.fanout.mode``
    overrides the decision outright: 'never' => identity, 'always' =>
    unconditional repartition, 'auto' (default) => stats-conditional with
    fan-out as the failure fallback.
    """
    spark = df.sparkSession
    mode = "auto"
    try:
        mode = str(spark.conf.get(FAN_OUT_MODE, "auto")).lower()
    except Exception:
        pass
    if mode == "never":
        return df
    cores = spark.sparkContext.defaultParallelism
    if mode != "always":
        try:
            per_core = int(spark.conf.get(FAN_OUT_BYTES_PER_CORE, str(_FAN_OUT_DEFAULT)))
            size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
            if size >= cores * per_core:
                return df
        except Exception:
            pass  # stats unavailable (e.g. Spark Connect) -> fan out
    return df.repartition(cores)


def shingles_expr(words_col: str, k: int = 3) -> Column:
    """Contiguous k-word shingles as array<string> (empty if < k words).

    Guarded CASE because Spark's sequence(1, n) steps *backwards* when n < 1.
    """
    joined = " || ' ' || ".join(f"element_at({words_col}, i + {j})" for j in range(k))
    return F.expr(
        f"CASE WHEN size({words_col}) < {k} THEN array() "
        f"ELSE transform(sequence(1, size({words_col}) - {k - 1}), i -> {joined}) END"
    )


def oracle_shingles_cte(k: int = 3, table: str = "documents") -> str:
    """DuckDB CTE producing (doc_id, s) word-k-shingles — mirror of
    :func:`shingles_expr`.

    Uses the *list-returning* generate_series + unnest (DuckDB's table
    function form rejects lateral column arguments); inclusive bounds match
    Spark's sequence()."""
    joined = " || ' ' || ".join(f"w[i + {j}]" for j in range(k))
    return f"""
    ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}),
    idx AS (SELECT doc_id, w, UNNEST(generate_series(1, len(w) - {k - 1})) AS i
            FROM ws WHERE len(w) >= {k}),
    sh AS (SELECT doc_id, {joined} AS s FROM idx)
    """


#: portable hex-nibble high-bit test: md5 hex char in [8-f] <=> top bit set.
HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")


def hex_high_sql(char_expr: str) -> str:
    quoted = ", ".join(f"'{c}'" for c in HEX_HIGH)
    return f"({char_expr} IN ({quoted}))"

"""HTML boilerplate extraction — the first stage of every web-crawl
training-data pipeline (VERDICT r7 item 5).

Trafilatura-shaped main-content extraction in the portable-regex subset
(patterns valid and identical in Java regex AND RE2, so Spark and the
DuckDB oracle execute the same automaton): split the page into block-level
segments, strip script bodies and tags, and keep a block when it reads like
content — long enough and not link-dense — dropping navigation, share bars
and footers. The keep rule is the classic text-density heuristic
(boilerplate is short and link-heavy; content is long and link-light) used
by trafilatura/jusText-style extractors, reduced to exact integer
arithmetic so both engines agree bit-for-bit.

The `documents` table has no HTML column, so — exactly like the multimodal
tier synthesizes binary payloads — each document's text is wrapped in a
DETERMINISTIC page template (head + script, link-dense nav, h1, the text as
the content block, a share bar, a footer) with the same string expression
on both engines. Every page therefore contains both keep-class and
drop-class blocks, and the extraction itself is what is verified: per-doc
block counts, main/boilerplate char tallies, an md5 over the extracted
main text (order-sensitive, char-exact), and the doc-level keep/drop label
that feeds docs_curation_gate downstream.

Scale shape: ONE map-side projection per document — split / transform /
filter / aggregate higher-order functions over the block array, zero
shuffles, zero UDFs, whole-stage codegen; extraction throughput is scan
throughput at any corpus size. (A real crawl pipeline swaps the synthetic
template for the fetched HTML column; the operator body is unchanged.)

Reference analogue: none — the reference has no text-pipeline tier; this
extends SURVEY §6's curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from skinnerdb_spark.queries.util import read_table
from skinnerdb_spark.registry import register

#: block-level boundaries the page is segmented on
_BLOCK_SPLIT = r"</(?:div|p|h1|footer)>"
#: keep a block when clean length >= this ...
MIN_BLOCK_CHARS = 40
#: ... and link density < 0.4 (integer form: 5*link_chars <= 2*clean_chars)
#: docs with >= this much extracted main text pass the doc-level gate
MIN_MAIN_CHARS = 100

_SCRIPT_RE = r"<script[^>]*>.*?</script>"
_ANCHOR_RE = r"<a [^>]*>.*?</a>"
_TAG_RE = r"<[^>]*>"

#: the deterministic page template (see module docstring) — kept as the
#: (prefix, mid, suffix) around the two data splices (source+doc_id, text)
_PAGE_PRE = (
    '<html><head><title>Doc</title><script>var x=1;</script></head><body>'
    '<div class="nav"><a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/login">Login</a></div><h1>'
)
_PAGE_MID = "</h1><p>"
_PAGE_POST = (
    '</p><p>Share: <a href="/s">Tweet</a> <a href="/f">Like</a></p>'
    '<footer><a href="/tos">Terms of Service</a> '
    '<a href="/priv">Privacy</a> (c) corp</footer></body></html>'
)

_HTML_ORACLE = f"""
    WITH h AS (
        SELECT doc_id,
               '{_PAGE_PRE}' || source || ' ' || CAST(doc_id AS VARCHAR)
               || '{_PAGE_MID}' || text || '{_PAGE_POST}' AS html
        FROM documents WHERE text IS NOT NULL AND LENGTH(text) > 0),
    s AS (SELECT doc_id,
                 string_split_regex(html, '{_BLOCK_SPLIT}') AS bl
          FROM h),
    b AS (SELECT doc_id, CAST(g.i AS BIGINT) AS i, bl[CAST(g.i AS INT)] AS blk
          FROM s, UNNEST(generate_series(1, len(bl))) g(i)),
    f AS (SELECT doc_id, i,
                 TRIM(regexp_replace(regexp_replace(regexp_replace(
                     blk, '{_SCRIPT_RE}', ' ', 'g'),
                     '{_TAG_RE}', ' ', 'g'), ' +', ' ', 'g')) AS c,
                 TRIM(regexp_replace(regexp_replace(regexp_replace(
                     regexp_replace(blk, '{_SCRIPT_RE}', ' ', 'g'),
                     '{_ANCHOR_RE}', ' ', 'g'),
                     '{_TAG_RE}', ' ', 'g'), ' +', ' ', 'g')) AS cn
          FROM b),
    k AS (SELECT doc_id, i, c,
                 CAST(LENGTH(c) AS BIGINT) AS lc,
                 (LENGTH(c) >= {MIN_BLOCK_CHARS}
                  AND 5 * (LENGTH(c) - LENGTH(cn)) <= 2 * LENGTH(c)) AS keep
          FROM f)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(COALESCE(SUM(CASE WHEN keep THEN lc END), 0) AS BIGINT)
               AS main_chars,
           CAST(COALESCE(SUM(CASE WHEN NOT keep THEN lc END), 0) AS BIGINT)
               AS boiler_chars,
           md5(COALESCE(string_agg(CASE WHEN keep THEN c END, ' '
                                   ORDER BY i), '')) AS main_md5,
           CASE WHEN COALESCE(SUM(CASE WHEN keep THEN lc END), 0)
                     >= {MIN_MAIN_CHARS}
                THEN 'keep' ELSE 'drop' END AS label
    FROM k GROUP BY doc_id
"""


@register("docs_html_extract", _HTML_ORACLE, tags=("text", "pipeline", "curation", "html"))
def docs_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction from an HTML column (module docstring):
    per-doc block counts, main/boilerplate char tallies, char-exact md5 of
    the extracted text, and the keep/drop gate label feeding
    docs_curation_gate."""
    d = read_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    html = F.concat(
        F.lit(_PAGE_PRE),
        F.col("source"),
        F.lit(" "),
        F.col("doc_id").cast("string"),
        F.lit(_PAGE_MID),
        F.col("text"),
        F.lit(_PAGE_POST),
    )
    # all per-block work happens inside ONE row via higher-order functions —
    # the lambda bodies mirror the oracle's f/k CTEs expression-for-expression
    clean = (
        "trim(regexp_replace(regexp_replace(regexp_replace("
        f"b, '{_SCRIPT_RE}', ' '), '{_TAG_RE}', ' '), ' +', ' '))"
    )
    clean_noa = (
        "trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        f"b, '{_SCRIPT_RE}', ' '), '{_ANCHOR_RE}', ' '), '{_TAG_RE}', ' '), ' +', ' '))"
    )
    feats = (
        f"transform(split(html, '{_BLOCK_SPLIT}'), b -> "
        f"named_struct('c', {clean}, "
        f"'lk', CAST(length({clean}) - length({clean_noa}) AS BIGINT)))"
    )
    keep = (
        f"f -> length(f.c) >= {MIN_BLOCK_CHARS} AND 5 * f.lk <= 2 * length(f.c)"
    )
    drop = (
        f"f -> NOT (length(f.c) >= {MIN_BLOCK_CHARS} AND 5 * f.lk <= 2 * length(f.c))"
    )
    return d.select("doc_id", html.alias("html")).select(
        "doc_id",
        F.expr(f"CAST(size(split(html, '{_BLOCK_SPLIT}')) AS BIGINT)").alias("n_blocks"),
        F.expr(f"CAST(size(filter({feats}, {keep})) AS BIGINT)").alias("n_kept"),
        F.expr(
            f"aggregate(filter({feats}, {keep}), CAST(0 AS BIGINT), "
            "(a, f) -> a + length(f.c))"
        ).alias("main_chars"),
        F.expr(
            f"aggregate(filter({feats}, {drop}), CAST(0 AS BIGINT), "
            "(a, f) -> a + length(f.c))"
        ).alias("boiler_chars"),
        F.expr(
            f"md5(array_join(transform(filter({feats}, {keep}), f -> f.c), ' '))"
        ).alias("main_md5"),
        F.expr(
            f"CASE WHEN aggregate(filter({feats}, {keep}), CAST(0 AS BIGINT), "
            f"(a, f) -> a + length(f.c)) >= {MIN_MAIN_CHARS} "
            "THEN 'keep' ELSE 'drop' END"
        ).alias("label"),
    )
